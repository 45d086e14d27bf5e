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

# Compressed posting segment rows: one row per (shard, term), FOR-block
# varint payloads with block-max metadata (the plugin's BKD leaf-block
# analogue; XYShapeFieldMapper.java:38-45 packs 7-dim blocks).
# Shards partition the DOC space by (conv_id, turn_idx) range — the
# OpenSearch shard model: each shard holds complete postings for its
# own docs, queries fan out and reduce (coordinator merge).
# df here is SHARD-LOCAL; global df(term) = sum over shards.
# Block score bounds are derived at query time from (block_max_tf,
# block_min_dl) + global stats, so segments need no rebuild when other
# shards change df.
SEGMENT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("term", StringType(), False),
        StructField("df", IntegerType(), False),
        StructField("max_tf", IntegerType(), False),
        StructField("min_dl", IntegerType(), False),
        # delta-gap + varint encoded doc ordinals, one binary per block
        StructField("doc_blocks", ArrayType(BinaryType()), False),
        # varint encoded tfs, aligned with doc_blocks
        StructField("tf_blocks", ArrayType(BinaryType()), False),
        # varint encoded per-posting doc lengths (impact storage: scoring
        # never touches the docmap, so queries shuffle no per-doc table)
        StructField("dl_blocks", ArrayType(BinaryType()), False),
        # per-block metadata for block-max WAND
        StructField("block_max_tf", ArrayType(IntegerType()), False),
        StructField("block_min_dl", ArrayType(IntegerType()), False),
        StructField("block_last_doc", ArrayType(LongType()), False),
        # flattened per-block (tf, dl) skyline pairs → EXACT block-max
        # score bounds at query time (offsets: len nblocks+1)
        StructField("sky_tf", ArrayType(IntegerType()), False),
        StructField("sky_dl", ArrayType(IntegerType()), False),
        StructField("sky_off", ArrayType(IntegerType()), False),
    ]
)

# Per-doc side table per shard (doc-values analogue): local ordinal →
# identity + length. doc_ord = (shard << 40) | local_idx preserves the
# global (conv_id, turn_idx) order across range-partitioned shards.
DOCMAP_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("doc_ord", LongType(), False),
        StructField("doc_id", StringType(), False),
        StructField("dl", IntegerType(), False),
    ]
)

# Per-shard build metrics / checkpoint rows (UploadMetric analogue,
# stats/upload/UploadMetric.java:44-65).
BUILD_METRIC_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("docs_tokenized", LongType(), False),
        StructField("postings_written", LongType(), False),
        StructField("bytes_compressed", LongType(), False),
        StructField("total_tokens", LongType(), False),
        StructField("fingerprint", StringType(), False),
        StructField("skipped", IntegerType(), False),
        # actual landed file names (storage adapter: put-mode names are
        # content-tokenized; readers resolve from the manifest)
        StructField("segment_file", StringType(), False),
        StructField("docmap_file", StringType(), False),
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
