"""Streaming percolation: the alert stream over arriving transcript
files equals batch percolation over the same rows."""

from __future__ import annotations

import time


def test_stream_percolation_matches_batch(spark, small_transcripts_pd,
                                          tmp_path_factory):
    from geospatial_spark.operators.percolate import (percolate_pairs,
                                                      queries_df)
    from geospatial_spark.operators.postings import posting_tuples
    from geospatial_spark.sources.transcripts import read_transcripts
    from geospatial_spark.streaming.alerts import start_percolation
    from geospatial_spark.streaming.incremental import (
        read_transcript_stream,
    )

    base = tmp_path_factory.mktemp("alerts")
    src = base / "src"
    src.mkdir()
    queries = [("a", "the spark"), ("b", "deploy merge"), ("c", "zzz")]
    # land the corpus as two "arriving" files
    pdf = small_transcripts_pd
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(src / "p1.parquet", index=False)
    stream = read_transcript_stream(spark, str(src),
                                    max_files_per_trigger=1)
    q = start_percolation(spark, stream, queries, str(base / "alerts"),
                          str(base / "ckpt"))
    try:
        q.processAllAvailable()
        pdf.iloc[half:].to_parquet(src / "p2.parquet", index=False)
        deadline = time.time() + 60
        q.processAllAvailable()
        while time.time() < deadline:
            try:
                got = spark.read.parquet(str(base / "alerts"))
                if got.count() > 0:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.read.parquet(str(base / "alerts"))
    tx = read_transcripts(spark, str(src))
    want = percolate_pairs(queries_df(spark, queries),
                           posting_tuples(tx))
    g = {(r["query_id"], r["doc_id"]) for r in got.collect()}
    w = {(r["query_id"], r["doc_id"]) for r in want.collect()}
    assert g == w and len(w) > 0
    # both batches contributed
    assert got.select("batch_id").distinct().count() >= 2
    # ts rides along on alert rows
    assert got.where(got.ts.isNotNull()).count() >= 0
