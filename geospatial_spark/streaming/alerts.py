"""Streaming percolation: continuous alerting over a transcript stream.

The percolate-on-ingest pattern (register queries once, get an alert
row for every arriving doc that matches one) — the monitoring/alerting
use the reference's scheduled-refresh machinery exists to serve, here
in its Spark-idiomatic form: a file/Kafka transcript stream +
foreachBatch percolation against the BROADCAST stored-query set.

Per micro-batch the work is exactly operators/percolate.percolate_pairs
over that batch's posting tuples: tokenize (codegen) → explode →
broadcast-join the (query_id, term) pairs → per-(doc, query)
matched-term count == the query's term count. The stored queries never
shuffle, the batch never cross-joins, and a batch re-runs idempotently
(pure function of its input rows), so Spark's streaming checkpoint
semantics hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def percolation_writer(spark: SparkSession,
                       queries: list[tuple[str, str]],
                       sink_path: str):
    """foreachBatch sink: append (query_id, doc_id, ts, batch_id)
    alert rows to ``sink_path`` (parquet) for every stream doc matching
    a stored query."""
    from geospatial_spark.operators.percolate import (percolate_pairs,
                                                      queries_df)
    from geospatial_spark.operators.postings import posting_tuples
    from geospatial_spark.sources.transcripts import with_doc_id

    qdf = queries_df(spark, queries)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        post = posting_tuples(batch_df)
        hits = percolate_pairs(qdf, post)
        ts = (with_doc_id(batch_df)
              .select("doc_id", "ts"))
        (hits.join(ts, "doc_id", "left")
         .select("query_id", "doc_id", "ts",
                 F.lit(int(epoch_id)).alias("batch_id"))
         .write.mode("append").parquet(sink_path))

    return write_batch


def start_percolation(spark: SparkSession, stream_df: DataFrame,
                      queries: list[tuple[str, str]], sink_path: str,
                      checkpoint: str):
    """Wire a transcript stream into the percolation sink; returns the
    StreamingQuery (caller stops it)."""
    return (stream_df.writeStream
            .foreachBatch(percolation_writer(spark, queries, sink_path))
            .option("checkpointLocation", checkpoint)
            .start())
