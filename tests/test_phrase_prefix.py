"""match_phrase_prefix (operators/phrase.phrase_prefix_match_shard):
the trailing query token expands against the dictionary, the fixed
tokens must be followed immediately by any expanded term, and a doc
scores as the MAX over its matching variants of the variant's phrase
score. All three tiers (Spark IndexSearcher, no-Spark LocalSearcher,
pure-python oracle) must agree rank- and score-identically."""

from __future__ import annotations

import math

import pytest


@pytest.fixture(scope="module")
def pp_index(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("pprefix") / "idx")
    build_index(spark, small_transcripts, root, n_shards=4)
    return root


@pytest.fixture(scope="module")
def rows(small_transcripts_pd):
    return list(zip(small_transcripts_pd["conv_id"],
                    small_transcripts_pd["turn_idx"],
                    small_transcripts_pd["text"]))


QUERIES = [
    "the sp",          # hot fixed token + prefix
    "spark jo",        # common bigram shape
    "deploy the s",    # two fixed tokens
    "sp",              # no fixed tokens: bare-prefix presence semantics
    "the spark",       # full term as the "prefix" (still expands)
    "w1",              # numeric-ish vocabulary prefix
]


def _assert_same(got, expected, label):
    assert [d for d, _ in got] == [d for d, _ in expected], label
    for (_, g), (_, e) in zip(got, expected):
        assert math.isclose(g, e, rel_tol=1e-9), label


def test_three_tier_parity(spark, pp_index, rows, small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, pp_index)
    ls = LocalSearcher(pp_index)
    for q in QUERIES:
        expected = small_oracle.search_phrase_prefix(rows, q, 10)
        _assert_same(ss.search_phrase_prefix(q, 10), expected, q)
        _assert_same(ls.search_phrase_prefix(q, 10), expected, q)


def test_expansion_cap_binds_identically(spark, pp_index, rows,
                                         small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, pp_index)
    ls = LocalSearcher(pp_index)
    for cap in (1, 2, 3):
        expected = small_oracle.search_phrase_prefix(rows, "the s", 10,
                                                     max_expansions=cap)
        _assert_same(ss.search_phrase_prefix("the s", 10, cap),
                     expected, f"cap={cap}")
        _assert_same(ls.search_phrase_prefix("the s", 10, cap),
                     expected, f"cap={cap}")


def test_no_match_paths(spark, pp_index):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, pp_index)
    ls = LocalSearcher(pp_index)
    # prefix expands to nothing
    assert ss.search_phrase_prefix("the qqqqzz", 10) == []
    assert ls.search_phrase_prefix("the qqqqzz", 10) == []
    # a fixed term absent corpus-wide can never match
    assert ss.search_phrase_prefix("qqqqzz the", 10) == []
    assert ls.search_phrase_prefix("qqqqzz the", 10) == []
    # empty query
    assert ss.search_phrase_prefix("", 10) == []
    assert ls.search_phrase_prefix("", 10) == []


def test_variant_max_not_sum(rows, small_oracle):
    """A doc matching two variants must score as the better variant,
    never the sum — pinned against the oracle by construction."""
    got = small_oracle.search_phrase_prefix(rows, "the s", 10)
    assert got
    # every score must equal SOME single variant's phrase score
    from geospatial_spark.functions.tokenize import tokenize_py
    from geospatial_spark.operators.expand import pick_top_py

    dfs = {t: len(p) for t, p in small_oracle.postings.items()
           if t.startswith("s")}
    exp = pick_top_py(dfs, 64)
    variant_scores: dict[str, set] = {}
    for e in exp:
        for d, sc, _m in small_oracle.search_phrase(
                rows, f"the {e}", k=len(rows) + 1):
            variant_scores.setdefault(d, set()).add(round(sc, 9))
    for d, sc in got:
        assert round(sc, 9) in variant_scores[d]
        assert round(sc, 9) == max(variant_scores[d])


def test_oracle_sql_matches_engine(spark, small_transcripts_pd,
                                   tmp_path_factory):
    """The DuckDB form (functions/oracle_sql.bm25_phrase_prefix_sql)
    must agree with the engine on a docs-shaped table — the catalog
    gate's exact comparison, replicated here."""
    import duckdb

    from geospatial_spark.plans import catalog as cat

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    q = cat.queries()["bm25_phrase_prefix"]
    got = sorted(tuple(r) for r in q(spark, sf).collect())
    want = sorted(tuple(r) for r in con.execute(
        cat.oracle_sql()["bm25_phrase_prefix"]).fetchall())
    assert got == want
    assert got  # non-empty at this sf — the gate row actually exercises
