"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with
metadata structs; decode / feature-extract run as Arrow-batched
mapInPandas kernels. The actual media codecs are NOT in this container,
so the decode step is stubbed (NotImplementedError) behind a
deterministic fake — the Spark-side plumbing (schema, batching, UDF
signature, partitioning) is real and oracle-tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes int, content_md5 string, head_hex string"


def with_payload(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Test harness: synthesize a deterministic binary payload column
    from text (stands in for image/audio bytes)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes):
    """Real decoder stub — media libs absent in this container.
    Replace with PIL/libvips/ffmpeg bindings on a full cluster."""
    raise NotImplementedError("image/audio decode requires media libs not present here")


def _fake_features(payload: bytes) -> dict:
    """Deterministic stand-in for decode+feature-extract."""
    return {
        "n_bytes": len(payload),
        "content_md5": hashlib.md5(payload).hexdigest(),
        "head_hex": payload[:4].hex().upper(),
    }


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    multimodal pipeline shape: per-batch bytes in, fixed feature schema
    out. Swap _fake_features for a real decoder on a media-enabled
    cluster; partitioning/batching/schema stay identical."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [_fake_features(p if p is not None else b"") for p in b["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", b["doc_id"].to_numpy())
            yield out

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)
