"""Property-style robustness: random seeds, batched search, shard
balance under hot-term skew."""

from __future__ import annotations

import math

import pytest

from tests.conftest import QUERIES


@pytest.mark.parametrize("seed", [7, 123, 999])
def test_random_seed_corpora_match_oracle(spark, tmp_path, seed):
    """The randomized-oracle pattern of the reference
    (GeoHexGridAggregatorTests.testWithSeveralDocs) across fresh seeds."""
    from fixtures.datagen import gen_transcripts
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.sources.transcripts import read_transcripts
    from oracle.oracle import OracleIndex

    pdf = gen_transcripts(60, seed=seed)
    p = tmp_path / "t.parquet"
    pdf.to_parquet(p, index=False)
    tx = read_transcripts(spark, str(p))
    root = str(tmp_path / "idx")
    build_index(spark, tx, root, n_shards=4)
    oracle = OracleIndex.build(list(zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"])))
    s = IndexSearcher(spark, root)
    for q in ["the spark job", "w10 w20", "deploy test run"]:
        expected = oracle.search(q, 10)
        got = s.search(q, 10)
        assert [d for d, _ in got] == [d for d, _ in expected], (seed, q)
        for (_, gs), (_, es) in zip(got, expected):
            assert math.isclose(gs, es, rel_tol=1e-9)


def test_search_many_matches_single(spark, small_transcripts, small_oracle, tmp_path):
    """Batched multi-query search ≡ per-query search ≡ oracle."""
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path / "idx")
    build_index(spark, small_transcripts, root, n_shards=6)
    s = IndexSearcher(spark, root)
    batch = {f"q{i}": q for i, q in enumerate(QUERIES)}
    got = s.search_many(batch, k=10)
    for qid, qtext in batch.items():
        expected = small_oracle.search(qtext, 10)
        assert [d for d, _ in got[qid]] == [d for d, _ in expected], qtext
        for (_, gs), (_, es) in zip(got[qid], expected):
            assert math.isclose(gs, es, rel_tol=1e-9)


def test_hot_term_shard_balance(spark, small_transcripts, tmp_path):
    """Skew check (north rule): the hottest term's postings must spread
    ~uniformly over doc shards — no shard holds a hot term's full
    posting list."""
    from pyspark.sql import functions as F

    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path / "idx")
    m = build_index(spark, small_transcripts, root, n_shards=8)
    gdir = lc.gen_dir(root, m["generation"])
    seg = spark.read.parquet(str(gdir / "segments-*.parquet"))
    hot = (seg.groupBy("term").agg(F.sum("df").alias("df"))
           .orderBy(F.desc("df")).first())
    per_shard = (seg.where(F.col("term") == hot["term"])
                 .select("shard", "df").collect())
    dfs = [r["df"] for r in per_shard]
    assert len(dfs) == 8  # present in every shard
    assert max(dfs) / max(1, min(dfs)) < 2.0, dfs
    # per-shard total postings also balanced
    tot = [s["postings_written"] for s in m["shards"]]
    assert max(tot) / max(1, min(tot)) < 2.0, tot
