"""Prefix/fuzzy query expansion (operators/expand.py): the three tiers
(Spark IndexSearcher, no-Spark LocalSearcher, pure-python oracle) must
produce the IDENTICAL expansion set under the pinned cap contract
(df desc, term asc, max_expansions), and the rewritten BM25 should-OR
must score exactly like the oracle."""

from __future__ import annotations

import math

import pytest

from geospatial_spark.operators.expand import (
    expand_fuzzy, expand_prefix, levenshtein_py, pick_top_py)


@pytest.fixture(scope="module")
def exp_index(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("expand") / "idx")
    build_index(spark, small_transcripts, root, n_shards=4)
    return root


def _oracle_expand_prefix(oracle, prefix: str, max_expansions: int = 64):
    dfs = {t: len(p) for t, p in oracle.postings.items()
           if t.startswith(prefix)}
    return pick_top_py(dfs, max_expansions)


def _oracle_expand_fuzzy(oracle, term: str, max_edits: int = 1,
                         prefix_length: int = 0, max_expansions: int = 64):
    pfx = term[:prefix_length] if prefix_length > 0 else ""
    dfs = {t: len(p) for t, p in oracle.postings.items()
           if abs(len(t) - len(term)) <= max_edits
           and (not pfx or t.startswith(pfx))
           and levenshtein_py(t, term) <= max_edits}
    return pick_top_py(dfs, max_expansions)


# -- kernel units -------------------------------------------------------

def test_levenshtein_matches_spark(spark):
    from pyspark.sql import functions as F

    pairs = [("kitten", "sitting"), ("flaw", "lawn"), ("", "abc"),
             ("spark", "spark"), ("table", "tables"), ("a", "b"),
             ("merge", "purge"), ("row", "sow"), ("slow", "sow")]
    df = spark.createDataFrame(pairs, ["a", "b"]).select(
        "a", "b", F.levenshtein("a", "b").alias("d"))
    for r in df.collect():
        assert levenshtein_py(r["a"], r["b"]) == r["d"], (r["a"], r["b"])


def test_pick_top_cap_and_ties():
    dfs = {"banana": 5, "apple": 5, "cherry": 9, "date": 1}
    # cap binds: highest-df first, df-ties broken term-asc; output sorted
    assert pick_top_py(dfs, 2) == ["apple", "cherry"]
    assert pick_top_py(dfs, 3) == ["apple", "banana", "cherry"]
    # cap not binding: every match
    assert pick_top_py(dfs, 64) == sorted(dfs)


def test_dataframe_expansion_matches_py(spark):
    rows = [("scan", 7), ("spark", 7), ("slow", 3), ("sow", 1),
            ("table", 9), ("row", 4), ("saw", 2)]
    dict_df = spark.createDataFrame(rows, ["term", "df"])
    dfs = dict(rows)
    for cap in (2, 3, 64):
        want = pick_top_py({t: d for t, d in dfs.items()
                            if t.startswith("s")}, cap)
        assert expand_prefix(dict_df, "s", cap) == want
    want = pick_top_py({t: d for t, d in dfs.items()
                        if levenshtein_py(t, "sow") <= 1}, 64)
    assert expand_fuzzy(dict_df, "sow", 1) == want == ["row", "saw", "slow", "sow"]
    # prefix_length pins the first char: 'row' drops out
    assert expand_fuzzy(dict_df, "sow", 1, prefix_length=1) == \
        ["saw", "slow", "sow"]


# -- three-tier parity on a real index ----------------------------------

def test_expansion_three_tiers(spark, exp_index, small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, exp_index)
    ls = LocalSearcher(exp_index)
    for pfx in ["s", "th", "w1", "zz"]:
        want = _oracle_expand_prefix(small_oracle, pfx)
        assert ss.expand_prefix(pfx) == want, pfx
        assert ls.expand_prefix(pfx) == want, pfx
    for q, me, pl in [("w100", 1, 0), ("w100", 1, 2), ("spark", 1, 0),
                      ("tble", 1, 1), ("merge", 2, 0), ("sow", 1, 0)]:
        want = _oracle_expand_fuzzy(small_oracle, q, me, pl)
        assert ss.expand_fuzzy(q, me, pl) == want, q
        assert ls.expand_fuzzy(q, me, pl) == want, q


def test_expansion_cap_binds_identically(spark, exp_index, small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, exp_index)
    ls = LocalSearcher(exp_index)
    full = _oracle_expand_prefix(small_oracle, "s", 10_000)
    cap = max(1, len(full) // 2)
    want = _oracle_expand_prefix(small_oracle, "s", cap)
    assert len(want) == cap < len(full)
    assert ss.expand_prefix("s", cap) == want
    assert ls.expand_prefix("s", cap) == want


def test_local_streaming_dict_tier(exp_index, small_oracle):
    """Past the dict cache cap the LocalSearcher streams dictionary
    batches (arrow-filtered) — same expansion as the merged-dict tier."""
    from geospatial_spark.plans.serve import LocalSearcher

    lazy = LocalSearcher(exp_index, dict_cache_max=1)
    assert lazy.expand_prefix("s") == _oracle_expand_prefix(small_oracle, "s")
    assert lazy.expand_fuzzy("w100", 1) == \
        _oracle_expand_fuzzy(small_oracle, "w100", 1)
    # fuzzy with a pinned prefix pushes a starts_with arrow filter
    assert lazy.expand_fuzzy("tble", 1, prefix_length=1) == \
        _oracle_expand_fuzzy(small_oracle, "tble", 1, 1)


# -- rewritten scoring ---------------------------------------------------

def test_search_prefix_matches_oracle(spark, exp_index, small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, exp_index)
    ls = LocalSearcher(exp_index)
    for pfx in ["s", "w1"]:
        terms = _oracle_expand_prefix(small_oracle, pfx)
        expected = small_oracle.search(" ".join(terms), 10)
        for got in (ss.search_prefix(pfx, 10), ls.search_prefix(pfx, 10)):
            assert [d for d, _ in got] == [d for d, _ in expected], pfx
            for (_, g), (_, e) in zip(got, expected):
                assert math.isclose(g, e, rel_tol=1e-9)


def test_search_fuzzy_matches_oracle(spark, exp_index, small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, exp_index)
    ls = LocalSearcher(exp_index)
    terms = _oracle_expand_fuzzy(small_oracle, "w100", 1)
    assert len(terms) > 10, "fixture must contain 1-edit neighbours of 'w100'"
    expected = small_oracle.search(" ".join(terms), 10)
    for got in (ss.search_fuzzy("w100", 10, 1), ls.search_fuzzy("w100", 10, 1)):
        assert [d for d, _ in got] == [d for d, _ in expected]
        for (_, g), (_, e) in zip(got, expected):
            assert math.isclose(g, e, rel_tol=1e-9)


def _oracle_expand_wildcard(oracle, pattern: str, max_expansions: int = 64):
    import re

    from geospatial_spark.operators.expand import wildcard_regex

    rx = re.compile(wildcard_regex(pattern))
    dfs = {t: len(p) for t, p in oracle.postings.items() if rx.match(t)}
    return pick_top_py(dfs, max_expansions)


def test_wildcard_three_tiers(spark, exp_index, small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, exp_index)
    ls = LocalSearcher(exp_index)
    for pat in ["s*k", "s?an", "*ow", "w1?0", "t*le", "spark"]:
        want = _oracle_expand_wildcard(small_oracle, pat)
        assert ss.expand_wildcard(pat) == want, pat
        assert ls.expand_wildcard(pat) == want, pat
    # all-wildcard patterns refuse to expand (match-all guard)
    for pat in ["*", "?*", "", "***"]:
        assert ss.expand_wildcard(pat) == []
        assert ls.expand_wildcard(pat) == []


def test_search_wildcard_matches_oracle(spark, exp_index, small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, exp_index)
    ls = LocalSearcher(exp_index)
    terms = _oracle_expand_wildcard(small_oracle, "s*")
    assert terms
    expected = small_oracle.search(" ".join(terms), 10)
    for got in (ss.search_wildcard("s*", 10), ls.search_wildcard("s*", 10)):
        assert [d for d, _ in got] == [d for d, _ in expected]
        for (_, g), (_, e) in zip(got, expected):
            assert math.isclose(g, e, rel_tol=1e-9)


def _oracle_expand_regexp(oracle, pattern: str, max_expansions: int = 64):
    import re

    rx = re.compile(pattern)
    dfs = {t: len(p) for t, p in oracle.postings.items() if rx.fullmatch(t)}
    return pick_top_py(dfs, max_expansions)


def test_regexp_three_tiers(spark, exp_index, small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, exp_index)
    ls = LocalSearcher(exp_index)
    for pat in ["s[a-z]+", "[a-z]+er[a-z]*", "w[0-9]+", "(row|slow|flow)",
                "t.b?le", "spark", "s(low|park)"]:
        want = _oracle_expand_regexp(small_oracle, pat)
        assert ss.expand_regexp(pat) == want, pat
        assert ls.expand_regexp(pat) == want, pat
    # anchoring: a mid-term match is NOT a term match
    assert "window" not in ss.expand_regexp("indo")
    # degenerate/universal patterns refuse to expand
    for pat in ["", ".*", ".+", ".?"]:
        assert ss.expand_regexp(pat) == []
        assert ls.expand_regexp(pat) == []


def test_regexp_lazy_dict_tier(exp_index, small_oracle):
    from geospatial_spark.plans.serve import LocalSearcher

    lazy = LocalSearcher(exp_index, dict_cache_max=1)
    # leading literal run pushes a starts_with arrow filter
    assert lazy.expand_regexp("s[a-z]+") == \
        _oracle_expand_regexp(small_oracle, "s[a-z]+")
    # classes up front: full dictionary stream, no pushdown
    assert lazy.expand_regexp("[a-z]+er[a-z]*") == \
        _oracle_expand_regexp(small_oracle, "[a-z]+er[a-z]*")


def test_search_regexp_matches_oracle(spark, exp_index, small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, exp_index)
    ls = LocalSearcher(exp_index)
    terms = _oracle_expand_regexp(small_oracle, "[a-z]+er[a-z]*")
    assert len(terms) >= 2
    expected = small_oracle.search(" ".join(terms), 10)
    for got in (ss.search_regexp("[a-z]+er[a-z]*", 10),
                ls.search_regexp("[a-z]+er[a-z]*", 10)):
        assert [d for d, _ in got] == [d for d, _ in expected]
        for (_, g), (_, e) in zip(got, expected):
            assert math.isclose(g, e, rel_tol=1e-9)
    assert ss.search_regexp("zzz[0-9]+", 10) == []
    assert ls.search_regexp("zzz[0-9]+", 10) == []


def test_mixed_batch_expansion_specs(spark, exp_index):
    """search_many_mixed rewrites expansion entries driver-side — the
    batched result must equal the singleton expansion queries, and an
    empty expansion must yield [] (never match-all)."""
    from geospatial_spark.plans.query import IndexSearcher

    ss = IndexSearcher(spark, exp_index)
    out = ss.search_many_mixed({
        "p": {"type": "prefix", "q": "sp"},
        "f": {"type": "fuzzy", "q": "w100", "max_edits": 1},
        "w": {"type": "wildcard", "q": "s*k"},
        "r": {"type": "regexp", "q": "[a-z]+er[a-z]*"},
        "none": {"type": "fuzzy", "q": "qqqqqqqqqqq"},
        "m": {"type": "match", "q": "the spark"},
    }, k=10)
    assert out["none"] == []
    assert out["p"] == ss.search_prefix("sp", 10)
    assert out["f"] == ss.search_fuzzy("w100", 10, 1)
    assert out["w"] == ss.search_wildcard("s*k", 10)
    assert out["r"] == ss.search_regexp("[a-z]+er[a-z]*", 10)
    assert out["m"] == ss.search("the spark", 10)


def test_no_match_paths(spark, exp_index):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, exp_index)
    ls = LocalSearcher(exp_index)
    assert ss.search_prefix_df("zzzz-none", 10) is None
    assert ss.search_prefix("zzzz-none", 10) == []
    assert ls.search_prefix("zzzz-none", 10) == []
    assert ss.search_fuzzy("qqqqqqqqqqq", 10, 1) == []
    assert ls.search_fuzzy("qqqqqqqqqqq", 10, 1) == []
    # empty inputs are a no-op expansion, not a full-dictionary scan
    assert ss.expand_prefix("") == []
    assert ls.expand_prefix("") == []
    assert ss.expand_fuzzy("") == []
    assert ls.expand_fuzzy("") == []
