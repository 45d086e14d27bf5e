"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with
metadata structs; decode / feature-extract run as Arrow-batched
mapInPandas kernels. Uncompressed formats decode for REAL in pure
Python + numpy (PPM P6 images, RIFF/WAVE PCM audio — header parse +
raster/sample view, see decode_ppm / decode_wav); compressed codecs
(JPEG/MP3/H.264) stay stubbed behind NotImplementedError because the
media libs are absent in this container — the Spark-side plumbing
(schema, batching, UDF signature, partitioning) is identical either
way and oracle-tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes int, content_md5 string, head_hex string"

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, kind string, width int, height int, sample_rate int, "
    "n_samples long, mean_r double, mean_g double, mean_b double, "
    "rms double")


def with_payload(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Test harness: synthesize a deterministic binary payload column
    from text (stands in for image/audio bytes)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8").alias("payload"),
    )


def decode_ppm(payload: bytes) -> dict:
    """Pure-Python binary PPM (P6) decode: header tokens (width,
    height, maxval; '#' comments legal anywhere in the header) followed
    by a single whitespace byte and the raw RGB raster. Returns
    {kind, width, height, pixels: (h, w, 3) uint8 ndarray} — the pixel
    array is a zero-copy view over the payload bytes."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates header and raster
    w, h, maxval = vals
    if not (0 < maxval < 256):
        raise NotImplementedError("16-bit PPM rasters not supported")
    need = w * h * 3
    raster = payload[pos:pos + need]
    if len(raster) < need:
        raise ValueError(f"truncated PPM raster: {len(raster)} < {need}")
    px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    return {"kind": "image/ppm", "width": w, "height": h, "pixels": px}


def decode_wav(payload: bytes) -> dict:
    """Pure-Python RIFF/WAVE PCM decode: chunk walk (fmt then data;
    unknown chunks skipped, word-aligned), PCM integer samples only.
    Returns {kind, sample_rate, n_channels, samples: int16/uint8
    ndarray of shape (n_frames, n_channels)} — zero-copy view."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt or data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(
            f"compressed WAVE (format {audio_fmt}) requires codecs not "
            "present here")
    if bits == 16:
        samples = np.frombuffer(data[:len(data) - len(data) % (2 * n_ch)],
                                dtype="<i2")
    elif bits == 8:
        samples = np.frombuffer(data[:len(data) - len(data) % n_ch],
                                dtype=np.uint8)
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    return {"kind": "audio/wav", "sample_rate": int(rate),
            "n_channels": int(n_ch),
            "samples": samples.reshape(-1, n_ch)}


def decode_media(payload: bytes) -> dict:
    """Magic-byte dispatch to a real decoder. Compressed formats remain
    the one documented stub (JPEG/PNG/MP3/H.264 need media libs absent
    in this container — swap in PIL/ffmpeg bindings on a full cluster;
    callers and schemas are unchanged)."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"RIFF"):
        return decode_wav(payload)
    if payload[:3] == b"\xff\xd8\xff" or payload[:4] == b"\x89PNG":
        raise NotImplementedError(
            "compressed image decode requires media libs not present here")
    raise ValueError("unrecognized media payload")


def decode_image(payload: bytes):
    """Back-compat alias: real decode for uncompressed formats via
    decode_media; compressed formats raise as before."""
    return decode_media(payload)


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


def _media_features(payload: bytes) -> dict:
    """Decode one payload and compute its real features; undecodable
    payloads degrade to kind='unknown' with NULL features (a curation
    pipeline must not fail the stage on one bad blob)."""
    import numpy as np

    base = {"kind": "unknown", "width": None, "height": None,
            "sample_rate": None, "n_samples": None, "mean_r": None,
            "mean_g": None, "mean_b": None, "rms": None}
    import struct

    try:
        d = decode_media(payload)
    except (ValueError, NotImplementedError, struct.error):
        # struct.error: a truncated fmt/data chunk fails unpack_from
        # before any explicit validation — still one bad blob, still
        # must not fail the stage
        return base
    base["kind"] = d["kind"]
    if d["kind"] == "image/ppm":
        px = d["pixels"].astype(np.float64)
        base.update(width=d["width"], height=d["height"],
                    mean_r=float(px[:, :, 0].mean()),
                    mean_g=float(px[:, :, 1].mean()),
                    mean_b=float(px[:, :, 2].mean()))
    else:
        s = d["samples"].astype(np.float64)
        base.update(sample_rate=d["sample_rate"],
                    n_samples=int(d["samples"].shape[0]),
                    rms=float(np.sqrt((s * s).mean())) if s.size else 0.0)
    return base


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas REAL decode + feature extraction (PPM pixel means,
    WAV sample RMS) over (doc_id, payload) — the non-stub path for
    uncompressed media; same batching/partitioning shape as
    extract_features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [_media_features(p if p is not None else b"")
                     for p in b["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", b["doc_id"].to_numpy())
            yield out

    return df.mapInPandas(kernel, schema=MEDIA_FEATURE_SCHEMA)
