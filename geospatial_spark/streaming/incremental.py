"""Structured-Streaming front ends.

Reference analogue (SURVEY.md §2.9): the job-scheduler's periodic
datasource refresh — acquire lock, build a new generation, swap,
reschedule (ip2geo/jobscheduler/DatasourceRunner.java:87-188). Spark's
idiomatic equivalent is a streaming source + foreachBatch: each
micro-batch builds a NEW index generation over the accumulated corpus
(or a delta-generation in append-only mode) and atomically swaps the
manifest — readers always see a complete, frozen generation.

Also provides the watermarked windowed aggregation over event streams
(the streaming counterpart of the hourly rollup in the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_spark.schemas import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 4) -> DataFrame:
    """File-based transcript stream (new parquet files appear under
    `path`). On a real deployment this is the Iceberg/Kafka source; the
    contract (schema + micro-batch) is identical."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def incremental_index_writer(index_root: str, n_shards: int = 8):
    """foreachBatch sink: every micro-batch builds generation
    gen-b<epoch> over that batch's rows and swaps the manifest.

    Generations are append-only deltas here (one per batch); a compact
    step (rebuild over the union) is the force-merge analogue
    (GeoIpDataDao.freezeIndex:123-133). Each batch build is itself
    checkpoint-resumable, and the swap is atomic, so a crashed batch
    leaves the previous generation serving (DatasourceRunner's
    lock/renew semantics are inherited from Spark's streaming
    checkpoint: a batch re-runs idempotently — same generation id,
    fingerprint-matched shards skip).
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from geospatial_spark.plans.build import build_index

        if batch_df.isEmpty():
            return
        build_index(
            batch_df.sparkSession, batch_df, index_root,
            n_shards=n_shards, generation=f"b{epoch_id:06d}", append=True,
        )

    return write_batch


def start_incremental_index(spark: SparkSession, src_path: str,
                            index_root: str, checkpoint: str,
                            n_shards: int = 8):
    """Wire the stream: transcript files → per-batch index generations."""
    stream = read_transcript_stream(spark, src_path)
    return (
        stream.writeStream
        .foreachBatch(incremental_index_writer(index_root, n_shards))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup for late-arriving events —
    the streaming counterpart of the batch hourly rollup (works on both
    batch and streaming DataFrames)."""
    src = events
    if dict((f.name, f.dataType.simpleString()) for f in src.schema.fields).get("ts") == "timestamp_ntz":
        # watermarks require TIMESTAMP (session TZ pinned UTC)
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
