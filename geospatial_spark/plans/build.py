"""Resumable inverted-index build job.

Pipeline (SURVEY.md §3.1 lifecycle equivalent):

  read transcripts → validate → range-partition docs into shards by
  (conv_id, turn_idx) → per-shard kernel (mapInPandas, Arrow batches):
  fingerprint → [skip if checkpointed] → vectorized tokenize →
  tf via pandas groupby → delta-gap + varint FOR-block encode with
  block-max metadata → atomic parquet write + checkpoint JSON →
  metrics row → driver aggregates stats → publish manifest LAST.

Scale design (10^12 turns / 100 TB):
  * Shards partition DOCS, not terms — the OpenSearch shard model. A
    hot term's postings are spread uniformly over all shards, so no
    single executor ever materializes a global posting list: term-key
    skew is eliminated structurally (the north rule's salted-key
    handling; an explicit salted agg utility also exists in
    operators/grid.py for term-keyed shuffles like the dictionary).
  * One wide shuffle total (the range repartition); tokenize/tf/encode
    are shard-local. Shard count is the operator's memory knob: size so
    a shard's text fits a worker (~docs_per_shard × avg_text).
  * Checkpoint fingerprint = hash of shard content in stable order;
    re-run after a kill skips finished shards
    (DatasourceUpdateService.shouldUpdate sha256 analogue, :282-292).
  * All files land in gen-<id>/; root manifest.json swaps last
    (setupIndex/updateDatasourceAsSucceeded analogue).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator
from pathlib import Path

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_spark.functions.codec import encode_posting, varint_encode
from geospatial_spark.functions.tokenize import tokenize_pandas
from geospatial_spark.plans import lifecycle as lc
from geospatial_spark.schemas import BUILD_METRIC_SCHEMA
from geospatial_spark.sources.transcripts import with_doc_id

ORD_SHARD_SHIFT = 40  # doc_ord = (shard << 40) | local_idx


def _fingerprint(doc_ids: pd.Series, texts: pd.Series) -> str:
    """Stable content hash of a shard (order-sensitive; shards arrive
    sorted by (conv_id, turn_idx))."""
    h = hashlib.sha256()
    h.update(pd.util.hash_pandas_object(doc_ids, index=False).values.tobytes())
    h.update(pd.util.hash_pandas_object(texts.fillna(""), index=False).values.tobytes())
    return h.hexdigest()


def _encode_shard(shard: int, doc_ids: pd.Series, texts: pd.Series):
    """Tokenize + posting encode one shard. Returns (segments_df,
    docmap_df, stats dict). All hot paths vectorized."""
    tokens = tokenize_pandas(texts)
    dl = tokens.map(len).to_numpy(dtype=np.int64)
    n = len(doc_ids)
    doc_ords = (np.int64(shard) << ORD_SHARD_SHIFT) | np.arange(n, dtype=np.int64)

    # flatten (doc, term) pairs
    counts = dl
    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in tokens]) \
        if n else np.empty(0, dtype=object)
    flat_docs = np.repeat(doc_ords, counts) if n else np.empty(0, dtype=np.int64)
    flat_dls = np.repeat(dl, counts) if n else np.empty(0, dtype=np.int64)

    if len(flat_terms):
        tf = (
            pd.DataFrame({"term": flat_terms, "doc": flat_docs, "dl": flat_dls})
            .groupby(["term", "doc"], sort=True)
            .agg(tf=("term", "size"), dl=("dl", "first"))
            .reset_index()
        )
    else:
        tf = pd.DataFrame({"term": [], "doc": [], "tf": [], "dl": []})

    seg_rows = []
    n_postings = 0
    n_bytes = 0
    if len(tf):
        terms_arr = tf["term"].to_numpy()
        docs_arr = tf["doc"].to_numpy(dtype=np.uint64)
        tfs_arr = tf["tf"].to_numpy(dtype=np.uint64)
        dls_arr = tf["dl"].to_numpy(dtype=np.int64)
        # groupby sorted by (term, doc): term boundaries
        change = np.flatnonzero(terms_arr[1:] != terms_arr[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(terms_arr)]))
        for s, e in zip(starts, ends):
            d, t, l = docs_arr[s:e], tfs_arr[s:e], dls_arr[s:e]
            db, tb, bmax_tf, blast = encode_posting(d, t)
            # per-block min dl for score upper bounds + per-posting dls
            # (impact storage: queries score without the docmap)
            bmin_dl = [int(l[i : i + 128].min()) for i in range(0, len(l), 128)]
            lb = [varint_encode(l[i : i + 128].astype(np.uint64))
                  for i in range(0, len(l), 128)]
            nb = sum(len(x) for x in db) + sum(len(x) for x in tb) + sum(len(x) for x in lb)
            n_postings += int(e - s)
            n_bytes += nb
            seg_rows.append(
                {
                    "shard": shard,
                    "term": str(terms_arr[s]),
                    "df": int(e - s),
                    "max_tf": int(t.max()),
                    "min_dl": int(l.min()),
                    "doc_blocks": db,
                    "tf_blocks": tb,
                    "dl_blocks": lb,
                    "block_max_tf": bmax_tf,
                    "block_min_dl": bmin_dl,
                    "block_last_doc": blast,
                }
            )

    segments = pd.DataFrame(
        seg_rows,
        columns=["shard", "term", "df", "max_tf", "min_dl", "doc_blocks",
                 "tf_blocks", "dl_blocks", "block_max_tf", "block_min_dl",
                 "block_last_doc"],
    )
    docmap = pd.DataFrame(
        {
            "shard": np.full(n, shard, dtype=np.int32),
            "doc_ord": doc_ords,
            "doc_id": doc_ids.to_numpy(dtype=object),
            "dl": dl.astype(np.int32),
        }
    )
    stats = {
        "docs_tokenized": int(n),
        "postings_written": int(n_postings),
        "bytes_compressed": int(n_bytes),
        "total_tokens": int(dl.sum()),
    }
    return segments, docmap, stats


def _atomic_parquet(df: pd.DataFrame, path: Path) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    schema = None
    if "doc_blocks" in df.columns:
        schema = pa.schema(
            [
                ("shard", pa.int32()),
                ("term", pa.string()),
                ("df", pa.int32()),
                ("max_tf", pa.int32()),
                ("min_dl", pa.int32()),
                ("doc_blocks", pa.list_(pa.binary())),
                ("tf_blocks", pa.list_(pa.binary())),
                ("dl_blocks", pa.list_(pa.binary())),
                ("block_max_tf", pa.list_(pa.int32())),
                ("block_min_dl", pa.list_(pa.int32())),
                ("block_last_doc", pa.list_(pa.int64())),
            ]
        )
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _make_shard_builder(gdir_str: str):
    """Returns the mapInPandas kernel. gdir passed by value (no driver
    globals captured by reference)."""

    def build_shard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        shard = TaskContext.get().partitionId()
        gdir = Path(gdir_str)

        parts = [b[["doc_id", "text"]] for b in batches]
        if parts:
            data = pd.concat(parts, ignore_index=True)
        else:
            data = pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                                 "text": pd.Series([], dtype=object)})

        fp = _fingerprint(data["doc_id"], data["text"])
        cp_path = lc.checkpoint_path(gdir, shard)
        seg_path = lc.segment_path(gdir, shard)
        dm_path = lc.docmap_path(gdir, shard)

        cp = lc.read_json(cp_path)
        if cp and cp.get("fingerprint") == fp and seg_path.exists() and dm_path.exists():
            # resume fast path: fingerprint-matched shard, skip rebuild
            yield pd.DataFrame([{**cp["stats"], "shard": shard,
                                 "fingerprint": fp, "skipped": 1}])
            return

        segments, docmap, stats = _encode_shard(shard, data["doc_id"], data["text"])
        _atomic_parquet(segments, seg_path)
        _atomic_parquet(docmap, dm_path)
        # checkpoint written LAST: its presence implies complete files
        lc.atomic_write_json(cp_path, {"fingerprint": fp, "stats": stats})
        yield pd.DataFrame([{**stats, "shard": shard, "fingerprint": fp, "skipped": 0}])

    return build_shard


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_root: str,
    n_shards: int | None = None,
    generation: str = "g0001",
) -> dict:
    """Build (or resume) the index; returns the published manifest."""
    if n_shards is None:
        n_shards = int(spark.conf.get("spark.sql.shuffle.partitions"))
    gdir = lc.gen_dir(index_root, generation)

    try:
        gdir.mkdir(parents=True, exist_ok=True)
        docs = with_doc_id(transcripts).select("conv_id", "turn_idx", "doc_id", "text")
        parts = docs.repartitionByRange(n_shards, "conv_id", "turn_idx") \
                    .sortWithinPartitions("conv_id", "turn_idx")
        metrics_df = parts.mapInPandas(_make_shard_builder(str(gdir)),
                                       schema=BUILD_METRIC_SCHEMA)
        metrics = [r.asDict() for r in metrics_df.collect()]

        n_docs = sum(m["docs_tokenized"] for m in metrics)
        total_tokens = sum(m["total_tokens"] for m in metrics)
        avgdl = (total_tokens / n_docs) if n_docs else 0.0
        manifest = {
            "state": lc.STATE_AVAILABLE,
            "generation": generation,
            "n_shards": n_shards,
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "bm25": {"k1": 1.2, "b": 0.75},
            "shards": sorted(metrics, key=lambda m: m["shard"]),
        }
        lc.publish_manifest(index_root, manifest)
        return manifest
    except Exception as exc:  # mark CREATE_FAILED, keep prior manifest serving
        lc.mark_create_failed(index_root, generation, repr(exc))
        raise
