"""ST1 analogue: incremental index build via Structured Streaming
foreachBatch → delta generations; multi-generation search must be
score-identical to a full rebuild (and to the oracle)."""

from __future__ import annotations

import math

from tests.conftest import QUERIES


def test_incremental_generations_match_oracle(spark, small_transcripts_pd, tmp_path):
    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.streaming.incremental import start_incremental_index
    from oracle.oracle import OracleIndex

    # two file drops → at least two micro-batches (maxFilesPerTrigger=4)
    src = tmp_path / "stream_src"
    src.mkdir()
    half = len(small_transcripts_pd) // 2
    p1, p2 = small_transcripts_pd.iloc[:half], small_transcripts_pd.iloc[half:]
    p1.to_parquet(src / "part-0.parquet", index=False)
    p2.to_parquet(src / "part-1.parquet", index=False)

    root = str(tmp_path / "idx")
    q = start_incremental_index(
        spark, str(src), root, checkpoint=str(tmp_path / "ckpt"), n_shards=4
    )
    q.awaitTermination(120)

    m = lc.read_manifest(root)
    assert m["state"] == "AVAILABLE"
    assert len(m["generations"]) >= 1
    assert m["n_docs"] == len(small_transcripts_pd)

    oracle = OracleIndex.build(list(zip(
        small_transcripts_pd["conv_id"], small_transcripts_pd["turn_idx"],
        small_transcripts_pd["text"])))
    s = IndexSearcher(spark, root)
    for query in QUERIES[:6]:
        expected = oracle.search(query, 10)
        got = s.search(query, 10)
        assert [d for d, _ in got] == [d for d, _ in expected], query
        for (_, gs), (_, es) in zip(got, expected):
            assert math.isclose(gs, es, rel_tol=1e-9), (query, gs, es)


def test_incremental_second_drop_appends(spark, tiny_transcripts_pd, tmp_path):
    """New files after a first run → new generations appended, doc count
    grows, old generations keep serving."""
    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.streaming.incremental import start_incremental_index

    src = tmp_path / "src"
    src.mkdir()
    half = len(tiny_transcripts_pd) // 2
    tiny_transcripts_pd.iloc[:half].to_parquet(src / "a.parquet", index=False)
    root = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")

    start_incremental_index(spark, str(src), root, ck, n_shards=2).awaitTermination(120)
    n1 = lc.read_manifest(root)["n_docs"]

    tiny_transcripts_pd.iloc[half:].to_parquet(src / "b.parquet", index=False)
    start_incremental_index(spark, str(src), root, ck, n_shards=2).awaitTermination(120)
    m = lc.read_manifest(root)
    assert m["n_docs"] == len(tiny_transcripts_pd)
    assert m["n_docs"] > n1
    assert len(m["generations"]) >= 2


def test_compaction_collapses_generations(spark, small_transcripts_pd, tmp_path):
    """Force-merge analogue: compacting the delta chain into one
    generation preserves search results exactly."""
    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.build import compact_index
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.sources.transcripts import read_transcripts
    from geospatial_spark.streaming.incremental import start_incremental_index

    src = tmp_path / "src"
    src.mkdir()
    half = len(small_transcripts_pd) // 2
    small_transcripts_pd.iloc[:half].to_parquet(src / "a.parquet", index=False)
    small_transcripts_pd.iloc[half:].to_parquet(src / "b.parquet", index=False)
    root = str(tmp_path / "idx")
    start_incremental_index(spark, str(src), root, str(tmp_path / "ck"),
                            n_shards=3).awaitTermination(120)
    before = IndexSearcher(spark, root).search("the spark job", 10)

    tx = read_transcripts(spark, str(src))
    compact_index(spark, tx, root, n_shards=4)
    m = lc.read_manifest(root)
    assert len(m["generations"]) == 1
    after = IndexSearcher(spark, root).search("the spark job", 10)
    assert after == before
    deleted = lc.delete_unused_generations(root, grace_seconds=0.0)
    assert deleted  # the old delta generations were reclaimed
    assert IndexSearcher(spark, root).search("the spark job", 10) == before


def test_windowed_event_counts_stream_matches_batch(spark, tmp_path):
    import pandas as pd

    from geospatial_spark.streaming.incremental import windowed_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in windowed_event_counts(events, "1 hour").collect()
    }

    src = tmp_path / "ev"
    events.coalesce(1).write.parquet(str(src))
    stream = (
        spark.readStream.schema(events.schema)
        .parquet(str(src))
    )
    out = windowed_event_counts(stream, "1 hour")
    q = (
        out.writeStream.format("memory").queryName("winagg")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.sql("select * from winagg").collect()
    }
    assert got == batch


def test_stream_then_scheduled_merge_lifecycle(spark, small_transcripts_pd,
                                               tmp_path):
    """Full lifecycle at scale-shape: streaming drops produce delta
    generations → a scheduled maintenance tick force-merges them via
    segment merge (no source re-read) → the collapsed index still
    answers match AND phrase queries oracle-exactly, and generation
    cleanup reclaims the superseded deltas."""
    import math

    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.compact import merge_generations
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.streaming.incremental import start_incremental_index
    from geospatial_spark.streaming.scheduler import RefreshLoop, RefreshPolicy
    from oracle.oracle import OracleIndex

    src = tmp_path / "src"
    src.mkdir()
    third = len(small_transcripts_pd) // 3
    for i in range(3):
        lo = i * third
        hi = None if i == 2 else (i + 1) * third
        small_transcripts_pd.iloc[lo:hi].to_parquet(
            src / f"drop-{i}.parquet", index=False)
    root = str(tmp_path / "idx")
    q = start_incremental_index(spark, str(src), root,
                                checkpoint=str(tmp_path / "ck"), n_shards=2)
    q.awaitTermination(120)
    n_gens_before = len(lc.read_manifest(root)["generations"])
    assert n_gens_before >= 1

    clock_t = [0.0]
    loop = RefreshLoop(lambda: merge_generations(spark, root, n_shards=4),
                       RefreshPolicy(interval_seconds=60.0),
                       clock=lambda: clock_t[0],
                       sleep=lambda s: clock_t.__setitem__(0, clock_t[0] + s))
    hist = loop.run(max_runs=1)
    assert hist[0].ok, hist[0].error

    m = lc.read_manifest(root)
    assert len(m["generations"]) == 1
    assert m["n_docs"] == len(small_transcripts_pd)

    rows = list(zip(small_transcripts_pd["conv_id"],
                    small_transcripts_pd["turn_idx"],
                    small_transcripts_pd["text"]))
    oracle = OracleIndex.build(rows)
    s = IndexSearcher(spark, root)
    for query in ["deploy the spark job", "the"]:
        want = oracle.search(query, 10)
        got = s.search(query, 10)
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), query
    got = s.search_phrase("deploy the", 10)
    want = [(d, sc) for d, sc, _ in oracle.search_phrase(rows, "deploy the", 10)]
    assert [d for d, _ in got] == [d for d, _ in want]

    deleted = lc.delete_unused_generations(root, grace_seconds=0.0)
    assert set(deleted) >= {g for g in lc.list_generations(root)
                            if g != m["generation"]} or deleted
    assert lc.list_generations(root) == [m["generation"]]
