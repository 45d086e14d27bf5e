"""Fixed StructType schemas for every table the engine touches.

The reference declares schema per-index via strict mappings
(src/main/resources/mappings/ip2geo_geoip.json:2 pins "dynamic": false;
index/mapper/xypoint/XYPointFieldMapper.java:35-42 declares field types).
Our equivalent: one module of explicit StructTypes, validated on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input: Iceberg-style transcript table (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# (term, doc, tf) tuples emitted by the tokenize stage — the analogue of
# the reference's indexable fields (XYPointIndexer.java:67-69).
POSTING_TUPLE_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("tf", IntegerType(), False),
    ]
)

# Per-doc side table (doc values analogue: XYPointFieldMapper.java:65-69).
DOCLEN_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("dl", IntegerType(), False),
    ]
)

# Compressed posting segment rows: one row per (term) per partition-run,
# FOR-block varint payloads with block-max metadata (the plugin's BKD
# leaf-block analogue; XYShapeFieldMapper.java:38-45 packs 7-dim blocks).
SEGMENT_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("df", IntegerType(), False),
        StructField("max_tf", IntegerType(), False),
        # upper bound of BM25 score for this term over the whole posting
        StructField("max_score", DoubleType(), False),
        # delta-gap + varint encoded doc ordinals, one binary per block
        StructField("doc_blocks", ArrayType(BinaryType()), False),
        # varint encoded tfs, aligned with doc_blocks
        StructField("tf_blocks", ArrayType(BinaryType()), False),
        # per-block metadata for block-max WAND
        StructField("block_max_tf", ArrayType(IntegerType()), False),
        StructField("block_max_score", ArrayType(DoubleType()), False),
        StructField("block_last_doc", ArrayType(LongType()), False),
    ]
)

# Query result rows.
HIT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("score", DoubleType(), False),
    ]
)


def validate_schema(df: DataFrame, expected: StructType, name: str) -> DataFrame:
    """Strict-parse analogue (XYPointParser.java:26-27 rejects bad input).

    Checks column presence and type names; raises ValueError on mismatch.
    """
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for f in expected.fields:
        if f.name not in have:
            raise ValueError(f"{name}: missing column {f.name!r}; have {sorted(have)}")
        if have[f.name] != f.dataType.simpleString():
            raise ValueError(
                f"{name}: column {f.name!r} has type {have[f.name]}, "
                f"expected {f.dataType.simpleString()}"
            )
    return df.select(*[f.name for f in expected.fields])
