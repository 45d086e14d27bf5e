"""M4+M5 gates: real compressed index build + block-max WAND query path.

Three-way agreement (SURVEY.md §7.1 M5): pure-Python oracle == naive
relational scorer (tested in test_bm25_e2e) == WAND over compressed
segments — rank-identical, scores within 1e-9 relative."""

from __future__ import annotations

import math

import pytest

from tests.conftest import QUERIES


@pytest.fixture(scope="module")
def built_index(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("index") / "idx")
    manifest = build_index(spark, small_transcripts, root, n_shards=8)
    return root, manifest


@pytest.fixture(scope="module")
def searcher(spark, built_index):
    from geospatial_spark.plans.query import IndexSearcher

    root, _ = built_index
    return IndexSearcher(spark, root)


def test_manifest_contents(built_index, small_oracle):
    _, m = built_index
    assert m["state"] == "AVAILABLE"
    assert m["n_docs"] == small_oracle.n_docs
    assert math.isclose(m["avgdl"], small_oracle.avgdl, rel_tol=1e-12)
    assert m["n_shards"] == 8
    assert len(m["shards"]) == 8
    for s in m["shards"]:
        assert s["skipped"] == 0
        assert s["fingerprint"]
        # metrics per partition: docs tokenized, postings, bytes (north rule)
        assert s["docs_tokenized"] >= 0
        assert s["postings_written"] >= 0
        assert s["bytes_compressed"] >= 0
    assert sum(s["docs_tokenized"] for s in m["shards"]) == m["n_docs"]


@pytest.mark.parametrize("query", QUERIES)
def test_wand_rank_and_score_identical(searcher, small_oracle, query):
    k = 10
    expected = small_oracle.search(query, k)
    got = searcher.search(query, k)
    assert [d for d, _ in got] == [d for d, _ in expected], query
    for (_, gs), (_, es) in zip(got, expected):
        assert math.isclose(gs, es, rel_tol=1e-9), (query, gs, es)


def test_wand_big_k(searcher, small_oracle):
    expected = small_oracle.search("spark table", 500)
    got = searcher.search("spark table", 500)
    assert [d for d, _ in got] == [d for d, _ in expected]


def test_wand_pruning_actually_skips(spark, built_index):
    """The hottest-term query must exercise the block-skip path."""
    import numpy as np
    from pyspark.sql import functions as F

    from geospatial_spark.operators.wand import wand_shard
    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.build import ORD_SHARD_SHIFT
    from geospatial_spark.plans.query import IndexSearcher

    root, m = built_index
    s = IndexSearcher(spark, root)
    terms = ["the", "w1", "w2"]
    seg = s._segments().where(F.col("term").isin(terms))
    df_global = {r["term"]: int(r["df"]) for r in
                 seg.groupBy("term").agg(F.sum("df").alias("df")).collect()}
    one = seg.where(F.col("shard") == 0).toPandas()
    stats = {}
    n_local = s.shard_docs[(m["generation"], 0)]
    wand_shard(one.to_dict("records"), n_local, 0 << ORD_SHARD_SHIFT,
               df_global, s.n_docs, s.avgdl, 3, stats=stats)
    assert stats["blocks_read"] > 0
    # with k=3 and a dominant hot term, some pruning should occur
    assert stats["blocks_skipped"] >= 0  # smoke (fixture is small)


def test_wand_pruning_effective_on_large_shard(spark, tmp_path):
    """On a single large shard with k=1 and a dominant hot term, the
    pruning rule must actually skip blocks — and results must stay
    exact vs the oracle."""
    import numpy as np
    from pyspark.sql import functions as F

    from fixtures.datagen import gen_transcripts
    from geospatial_spark.operators.wand import wand_shard
    from geospatial_spark.plans.build import ORD_SHARD_SHIFT, build_index
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.sources.transcripts import read_transcripts
    from oracle.oracle import OracleIndex

    pdf = gen_transcripts(1200, seed=11)
    p = tmp_path / "t.parquet"
    pdf.to_parquet(p, index=False)
    tx = read_transcripts(spark, str(p))

    oracle = OracleIndex.build(list(zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"])))

    def make(root, **kw):
        m = build_index(spark, tx, root, n_shards=1, **kw)
        return m, IndexSearcher(spark, root)

    def run(s, m, qtext):
        terms = sorted(set(qtext.split()))
        seg = s._segments().where(F.col("term").isin(terms)).toPandas()
        df_global = s._df_for(terms)
        stats = {}
        wand_shard(seg.to_dict("records"),
                   s.shard_docs[(m["generation"], 0)],
                   0 << ORD_SHARD_SHIFT, df_global,
                   s.n_docs, s.avgdl, 1, stats=stats)
        expected = oracle.search(qtext, 5)
        got = s.search(qtext, 5)
        assert [d for d, _ in got] == [d for d, _ in expected], qtext
        return stats

    # -- cold path (impact copies disabled): classic BMW --------------
    m, s = make(str(tmp_path / "idx_cold"), hot_df_copy=0)
    # rare+hot mix: the rare term sets θ high, then most of the hot
    # term's doc-ordered blocks are skipped
    stats = run(s, m, "w2000 the")
    assert stats["hot_terms"] == 0
    assert stats["blocks_skipped"] > 0, stats
    # hot-only single term: tf saturation makes every block bound ≈ idf
    # — exactness holds but decode is linear in df (the round-1 gap)
    run(s, m, "the")

    # -- hot path (impact-ordered copies, low threshold) --------------
    m, s = make(str(tmp_path / "idx_hot"), hot_df_copy=64)
    df_the = s._df_for(["the"])["the"]
    nblocks_the = -(-df_the // 128)
    stats = run(s, m, "the")
    assert stats["hot_terms"] == 1, stats
    touched = stats["hot_blocks_read"] + stats["completion_blocks"]
    # early termination: the saturated term's decode must be SUBLINEAR —
    # a small prefix of impact blocks, never the whole posting
    assert touched < nblocks_the / 2, (stats, nblocks_the)
    stats = run(s, m, "w2000 the")
    assert stats["hot_terms"] == 1, stats
    assert (stats["hot_blocks_read"] + stats["completion_blocks"]
            < nblocks_the / 2), (stats, nblocks_the)
    # multi-hot queries stay exact too
    run(s, m, "the a to")


def test_wand_boundary_ties_keep_lowest_ordinals(spark, tmp_path):
    """Regression: >k docs tying at the k-th score within one shard must
    be cut by ascending doc ordinal (argpartition alone cuts arbitrarily)."""
    import pandas as pd

    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher
    from geospatial_spark.sources.transcripts import read_transcripts

    rows = [("c%02d" % i, 0, "user", "identical spark text", None) for i in range(15)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    pdf["tool"] = pd.Series([None] * 15, dtype="string")
    pdf["ts"] = pd.Timestamp("2026-01-01")
    p = tmp_path / "t.parquet"
    pdf.to_parquet(p, index=False)
    tx = read_transcripts(spark, str(p))
    root = str(tmp_path / "idx")
    build_index(spark, tx, root, n_shards=1)
    expected = [f"c{i:02d}:0" for i in range(10)]
    got_spark = [d for d, _ in IndexSearcher(spark, root).search("spark", 10)]
    got_local = [d for d, _ in LocalSearcher(root).search("spark", 10)]
    assert got_spark == expected
    assert got_local == expected


def test_segment_compression_sane(spark, built_index):
    """Compressed postings must be much smaller than raw 8-byte encoding."""
    from pyspark.sql import functions as F

    root, m = built_index
    from geospatial_spark.plans import lifecycle as lc

    gdir = lc.gen_dir(root, m["generation"])
    seg = spark.read.parquet(str(gdir / "segments-*.parquet"))
    row = seg.agg(
        F.sum("df").alias("postings"),
        F.sum(F.expr(
            "aggregate(transform(doc_blocks, x -> int(length(x))), 0L, (a, x) -> a + x)"
            " + aggregate(transform(tf_blocks, x -> int(length(x))), 0L, (a, x) -> a + x)"
        )).alias("bytes"),
    ).first()
    bytes_per_posting = row["bytes"] / row["postings"]
    assert bytes_per_posting < 6.0, bytes_per_posting  # vs 16B uncompressed
