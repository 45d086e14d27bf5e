"""Transcript table source: read + strict-validate + doc identity.

Reference analogue: the upload source validates and normalizes inbound
documents before indexing (action/upload/geojson/UploadGeoJSONRequestContent.java:72-95
caps + validates; GeospatialParser.java:82-92 flattens to per-doc maps).
Here: schema validation + deterministic doc_id = conv_id || ':' || turn_idx.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_spark.schemas import TRANSCRIPT_SCHEMA, validate_schema

def doc_id_col():
    """doc_id = conv_id || ':' || turn_idx (built lazily: Column creation
    needs an active SparkContext)."""
    return F.concat_ws(":", F.col("conv_id"), F.col("turn_idx").cast("string"))


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    # int64 parquet turn_idx tolerated: downcast explicitly (the reference
    # downcasts double→float explicitly too, XYShapeConverter.java:121-124 —
    # precision contracts must be visible, not implicit).
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if types.get("turn_idx") == "bigint":
        df = df.withColumn("turn_idx", F.col("turn_idx").cast("int"))
    if types.get("ts") == "timestamp_ntz":
        # pandas-written parquet has no TZ; session TZ is pinned UTC
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return validate_schema(df, TRANSCRIPT_SCHEMA, "transcripts")


def flatten_conversations(conv_df: DataFrame) -> DataFrame:
    """S2 analogue (GeospatialParser.getFeatures flattens a
    FeatureCollection into per-feature docs, GeospatialParser.java:82-92):
    nested conversation rows (conv_id, turns: array<struct<turn_idx,
    role, text, tool, ts>>) → one row per turn, transcript schema."""
    ex = conv_df.select("conv_id", F.explode("turns").alias("t"))
    return ex.select(
        "conv_id",
        F.col("t.turn_idx").cast("int").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
        F.col("t.tool").alias("tool"),
        F.col("t.ts").cast("timestamp").alias("ts"),
    )


def with_doc_id(df: DataFrame) -> DataFrame:
    """Stable document identity (FeatureProcessor's stable _id analogue,
    action/upload/geojson/ContentBuilder.java:63-67)."""
    return df.withColumn("doc_id", doc_id_col())
