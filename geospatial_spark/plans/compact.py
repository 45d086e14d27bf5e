"""Segment-level merge compaction: collapse delta generations into ONE
generation WITHOUT re-reading or re-tokenizing the source corpus.

Reference analogue: freeze/force-merge before serving
(ip2geo/dao/GeoIpDataDao.java:123-133 `freezeIndex` merges to one
segment). The streaming writer appends one delta generation per
micro-batch; queries stay exact across generations, but per-query cost
grows with generation count (one segment read + one kernel per (gen,
shard)). `compact_index` (plans/build.py) already rebuilds from raw
transcripts; THIS path merges from the index itself — at scale the
decisive difference, because posting bytes are a small fraction of raw
text bytes (the 100 TB corpus is never re-scanned, never re-tokenized).

Plan shape (2 wide shuffles, both ∝ index size, not corpus text size):
  A. docmaps of all generations → hash-bucket to new shards →
     per-shard sort by (conv_id, turn_idx) → new docmap files
     (doc ordinals re-based; the tie-break contract is preserved).
  B. segments of all generations → per (gen, old shard) bulk decode
     (doc/tf/dl/position streams) + old-docmap join (shard-local file
     read) → posting rows keyed by the SAME hash bucket → per new
     shard: map doc_id → new ordinal via the phase-A docmap, rebuild
     (term, doc) runs, re-encode through the shared
     encode_runs_to_segments (identical format, impact copies
     re-derived for the merged df).

Scores after merge are identical to a full rebuild: N, avgdl, dl and
tf are preserved exactly; df(term) re-sums in the new dictionary.
"""

from __future__ import annotations

import hashlib
import time
from pathlib import Path

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from geospatial_spark.plans import lifecycle as lc
from geospatial_spark.plans.build import (
    HOT_DF_COPY,
    ORD_SHARD_SHIFT,
    _build_dictionary,
    _write_parquet,
    encode_runs_to_segments,
)

_DOCMAP_METRIC = ("shard int, docs long, total_tokens long, "
                  "docmap_file string, fingerprint string")
# append-mode delta generations may carry the SAME doc_id more than
# once (append never dedupes); ordinal mapping therefore keys on the
# (source generation, source ordinal) pair, which is unique by
# construction, never on doc_id
_SEG_METRIC = ("shard int, postings long, bytes long, segment_file string")

_CONV_EXPR = ("substring(doc_id, 1, length(doc_id) - "
              "length(substring_index(doc_id, ':', -1)) - 1)")


def _make_docmap_writer(gdir_str: str, storage: str):
    def write_docmap(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        gdir = Path(gdir_str)
        d = pdf.sort_values(["conv", "turn", "src_gen", "src_ord"],
                            kind="mergesort").reset_index(drop=True)
        n = len(d)
        doc_ords = (np.int64(shard) << ORD_SHARD_SHIFT) | np.arange(n, dtype=np.int64)
        fp = hashlib.sha256(
            pd.util.hash_pandas_object(d["doc_id"], index=False).values.tobytes()
        ).hexdigest()
        token = fp[:10] if storage == lc.STORAGE_PUT else None
        name = lc.docmap_file(shard, token)
        docmap = pd.DataFrame({
            "shard": np.full(n, shard, dtype=np.int32),
            "doc_ord": doc_ords,
            "doc_id": d["doc_id"].to_numpy(dtype=object),
            "dl": d["dl"].to_numpy(dtype=np.int32),
            # provenance: the merge ordinal-mapping key (doc_id may dup)
            "src_gen": d["src_gen"].to_numpy(dtype=object),
            "src_ord": d["src_ord"].to_numpy(dtype=np.int64),
        })
        _write_parquet(docmap, gdir / name, storage)
        return pd.DataFrame([{
            "shard": shard, "docs": n,
            "total_tokens": int(d["dl"].sum()),
            "docmap_file": name, "fingerprint": fp,
        }])

    return write_docmap


def _make_posting_decoder(gdirs: dict[str, str],
                          docmap_files: dict[tuple[str, int], str]):
    def decode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        from geospatial_spark.operators.phrase import _decode_full_posting

        gen, shard = str(key[0]), int(key[1])
        base = shard << ORD_SHARD_SHIFT
        ids = np.array(pq.read_table(
            Path(gdirs[gen]) / docmap_files[(gen, shard)],
            columns=["doc_id"]).column("doc_id").to_pylist(), dtype=object)
        # vectorized doc_id → (conv, turn) split for the whole docmap
        sp = pd.Series(ids).str.rpartition(":")
        conv_all = sp[0].to_numpy(dtype=object)
        turn_all = sp[2].to_numpy(dtype="int64")
        terms, convs, turns, ords_o, tfs_o, dls_o, poss_o = [], [], [], [], [], [], []
        for rec in pdf.to_dict("records"):
            docs, tfs, dls, poss = _decode_full_posting(rec, base)
            tok_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
            terms.append(np.full(len(docs), rec["term"], dtype=object))
            convs.append(conv_all[docs])
            turns.append(turn_all[docs])
            ords_o.append(docs + base)  # source GLOBAL ordinal
            tfs_o.append(tfs.astype(np.int64))
            dls_o.append(dls.astype(np.int64))
            poss_o.extend(
                poss[s: s + int(t)].astype(np.int64)
                for s, t in zip(tok_starts, tfs))
        if not terms:
            return pd.DataFrame({
                "term": pd.Series([], dtype=object),
                "conv": pd.Series([], dtype=object),
                "turn": pd.Series([], dtype="int64"),
                "src_gen": pd.Series([], dtype=object),
                "src_ord": pd.Series([], dtype="int64"),
                "tf": pd.Series([], dtype="int64"),
                "dl": pd.Series([], dtype="int64"),
                "positions": pd.Series([], dtype=object)})
        nrows = sum(len(t) for t in terms)
        return pd.DataFrame({
            "term": np.concatenate(terms),
            "conv": np.concatenate(convs),
            "turn": np.concatenate(turns),
            "src_gen": np.full(nrows, gen, dtype=object),
            "src_ord": np.concatenate(ords_o),
            "tf": np.concatenate(tfs_o),
            "dl": np.concatenate(dls_o),
            "positions": pd.Series(poss_o, dtype=object),
        })

    return decode


def _make_shard_encoder(gdir_str: str, dm_names: dict[int, str],
                        storage: str, hot_df_copy: int):
    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        shard = int(key[0])
        gdir = Path(gdir_str)
        dm = pq.read_table(gdir / dm_names[shard],
                           columns=["dl", "src_gen", "src_ord"])
        doc_index = pd.MultiIndex.from_arrays(
            [dm.column("src_gen").to_pylist(),
             dm.column("src_ord").to_numpy()])
        avgdl_local = (float(np.mean(dm.column("dl").to_numpy()))
                       if len(doc_index) else 0.0)

        local = doc_index.get_indexer(
            pd.MultiIndex.from_arrays(
                [pdf["src_gen"].tolist(),
                 pdf["src_ord"].to_numpy(dtype=np.int64)]))
        if (local < 0).any():
            raise RuntimeError("merge: posting doc missing from new docmap")
        ords = ((np.int64(shard) << ORD_SHARD_SHIFT)
                | local.astype(np.int64))
        uniq_terms, codes = np.unique(pdf["term"].to_numpy(dtype="U"),
                                      return_inverse=True)
        order = np.lexsort((ords, codes))
        tc = codes[order]
        docs_arr = ords[order].astype(np.uint64)
        tfs_arr = pdf["tf"].to_numpy(dtype=np.int64)[order].astype(np.uint64)
        dls_arr = pdf["dl"].to_numpy(dtype=np.int64)[order].astype(np.uint64)
        pos_cells = pdf["positions"].to_numpy(dtype=object)[order]
        pos_flat = (np.concatenate([np.asarray(p, dtype=np.int64)
                                    for p in pos_cells])
                    if len(pos_cells) else np.empty(0, dtype=np.int64))
        rtb = np.concatenate(([0], np.cumsum(tfs_arr))).astype(np.int64)
        tchange = np.flatnonzero(tc[1:] != tc[:-1]) + 1
        starts = np.concatenate(([0], tchange)).astype(np.int64)
        ends = np.concatenate((tchange, [len(tc)])).astype(np.int64)
        terms_sorted = uniq_terms[tc[starts]]

        segments, n_postings, n_bytes = encode_runs_to_segments(
            shard, terms_sorted, starts, ends, docs_arr, tfs_arr, dls_arr,
            pos_flat, rtb, avgdl_local, hot_df_copy)
        fp = hashlib.sha256(b"merge" + bytes(str(n_postings), "ascii")
                            + dm_names[shard].encode()).hexdigest()
        token = fp[:10] if storage == lc.STORAGE_PUT else None
        name = lc.segment_file(shard, token)
        _write_parquet(segments, gdir / name, storage)
        return pd.DataFrame([{"shard": shard, "postings": int(n_postings),
                              "bytes": int(n_bytes), "segment_file": name}])

    return encode


def merge_generations(spark: SparkSession, index_root: str,
                      n_shards: int | None = None,
                      generation: str | None = None,
                      hot_df_copy: int = HOT_DF_COPY,
                      storage: str | None = None) -> dict:
    """Merge all live generations into one new generation and swap the
    manifest. No-op (returns the manifest) when ≤1 generation is live.
    Raises ConcurrentBuildError if a build/merge is already running."""
    storage = lc.storage_mode(storage)
    with lc.BuildLock(index_root, owner="merge"):
        m = lc.read_manifest(index_root)
        if not m or m.get("state") != lc.STATE_AVAILABLE:
            raise ValueError(f"index at {index_root} not AVAILABLE")
        if not m.get("positions", True):
            raise ValueError("segment merge requires a positions index "
                             "(store_positions=True builds)")
        gens = m.get("generations", [])
        if len(gens) <= 1:
            return m
        started = time.time()
        if n_shards is None:
            n_shards = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if generation is None:
            existing = set(lc.list_generations(index_root))
            i = 1
            while f"merge-{i:04d}" in existing:
                i += 1
            generation = f"merge-{i:04d}"
        gdir = lc.gen_dir(index_root, generation)
        gdir.mkdir(parents=True, exist_ok=True)

        gdirs = {g["id"]: str(lc.gen_dir(index_root, g["id"])) for g in gens}
        seg_files: list[str] = []
        docmap_files: dict[tuple[str, int], str] = {}
        seg_by_gen: dict[str, list[str]] = {}
        for g in gens:
            segs, dms = lc.gen_shard_files(g)
            seg_by_gen[g["id"]] = [f"{gdirs[g['id']]}/{s}" for s in segs]
            for sh, name in dms.items():
                docmap_files[(g["id"], sh)] = name

        shard_key = F.pmod(F.xxhash64(F.expr(_CONV_EXPR).alias("c"),
                                      F.substring_index("doc_id", ":", -1)
                                      .cast("int")), F.lit(n_shards)).cast("int")

        # ---- phase A: merged docmaps ---------------------------------
        dmaps = None
        for g in gens:
            part = (spark.read.parquet(
                *[f"{gdirs[g['id']]}/{docmap_files[(g['id'], int(s['shard']))]}"
                  for s in g["shards"]])
                .select("doc_id", "dl",
                        F.lit(g["id"]).alias("src_gen"),
                        F.col("doc_ord").alias("src_ord")))
            dmaps = part if dmaps is None else dmaps.unionByName(part)
        keyed = dmaps.select(
            "doc_id", "dl", "src_gen", "src_ord",
            F.expr(_CONV_EXPR).alias("conv"),
            F.substring_index("doc_id", ":", -1).cast("int").alias("turn"),
            shard_key.alias("shard_key"))
        dm_metrics = [r.asDict() for r in keyed.groupBy("shard_key").applyInPandas(
            _make_docmap_writer(str(gdir), storage),
            schema=_DOCMAP_METRIC).collect()]
        dm_names = {int(r["shard"]): r["docmap_file"] for r in dm_metrics}

        # ---- phase B: decode → re-bucket → re-encode -----------------
        segs = None
        for g in gens:
            part = (spark.read.parquet(*seg_by_gen[g["id"]])
                    .select("shard", "term", "df", "doc_blocks", "tf_blocks",
                            "dl_blocks", "pos_blocks", "block_last_doc")
                    .withColumn("gen", F.lit(g["id"])))
            segs = part if segs is None else segs.unionByName(
                part, allowMissingColumns=True)
        rows = segs.groupBy("gen", "shard").applyInPandas(
            _make_posting_decoder(gdirs, docmap_files),
            schema=("term string, conv string, turn long, src_gen string, "
                    "src_ord long, tf long, dl long, positions array<long>"))
        rekeyed = rows.withColumn(
            "shard_key",
            F.pmod(F.xxhash64(F.col("conv"), F.col("turn").cast("int")),
                   F.lit(n_shards)).cast("int"))
        seg_metrics = [r.asDict() for r in rekeyed.groupBy("shard_key").applyInPandas(
            _make_shard_encoder(str(gdir), dm_names, storage, hot_df_copy),
            schema=_SEG_METRIC).collect()]
        seg_names = {int(r["shard"]): r["segment_file"] for r in seg_metrics}

        # a docmap shard can exist with zero postings (all-empty texts);
        # give it an empty segment file so readers resolve every name
        for sh, dm_name in dm_names.items():
            if sh not in seg_names:
                from geospatial_spark.plans.build import _seg_schema

                name = lc.segment_file(sh, dm_name.split("-")[-1].split(".")[0]
                                       if storage == lc.STORAGE_PUT else None)
                _write_parquet(_seg_schema().empty_table(), gdir / name, storage)
                seg_names[sh] = name

        n_terms, dict_files = _build_dictionary(spark, gdir, n_shards,
                                                list(seg_names.values()),
                                                mode=storage)

        shards = []
        for r in sorted(dm_metrics, key=lambda r: r["shard"]):
            sh = int(r["shard"])
            sm = next((s for s in seg_metrics if int(s["shard"]) == sh), None)
            shards.append({
                "shard": sh,
                "docs_tokenized": int(r["docs"]),
                "postings_written": int(sm["postings"]) if sm else 0,
                "bytes_compressed": int(sm["bytes"]) if sm else 0,
                "total_tokens": int(r["total_tokens"]),
                "fingerprint": r["fingerprint"],
                "skipped": 0,
                "segment_file": seg_names[sh],
                "docmap_file": r["docmap_file"],
            })
        n_docs = sum(s["docs_tokenized"] for s in shards)
        total_tokens = sum(s["total_tokens"] for s in shards)
        gen_entry = {"id": generation, "n_shards": n_shards,
                     "n_docs": n_docs, "total_tokens": total_tokens,
                     "n_terms": n_terms, "shards": shards}
        if dict_files is not None:
            gen_entry["dictionary_files"] = dict_files
        finished = time.time()
        history = list(m.get("build_history", []))
        history.append({
            "generation": generation, "append": False,
            "merged_from": [g["id"] for g in gens],
            "started_at_unix": started, "finished_at_unix": finished,
            "duration_sec": finished - started,
            "n_docs": n_docs, "shards_total": len(shards),
            "shards_skipped": 0, "shards_rebuilt": len(shards),
            "error": None,
        })
        manifest = {
            **m,
            "built_at_unix": finished,
            "build_history": history[-50:],
            "generation": generation,
            "generations": [gen_entry],
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "storage": storage,
            "n_shards": n_shards,
            "n_terms": n_terms,
            "shards": shards,
        }
        lc.publish_manifest(index_root, manifest, storage)
        return manifest
