"""Low-latency serving path: query the frozen index WITHOUT launching a
Spark job.

Reference analogue: the shard-local preference + request cache that makes
ip2geo lookups cheap at serve time (GeoIpDataDao.java:254-255,
Ip2GeoCachedDao.java). A Spark job per query costs ~seconds of
scheduling; a *serving* process only needs the manifest + dictionary +
the matched row groups. Segments are term-sorted with small row groups,
so pyarrow's predicate pushdown reads only the row groups containing the
query's terms — I/O stays ∝ matched postings even for a huge index (on
object stores these are range reads).

Exactness contract is identical to plans/query.IndexSearcher: same
segments, same wand_shard kernel, same stats, same tie-break.
The batch engine (IndexSearcher) remains the path for query WORKLOADS
(search_many fan-out across executors); LocalSearcher is the
interactive/serving path.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from geospatial_spark.functions.tokenize import tokenize_py
from geospatial_spark.operators.wand import wand_shard
from geospatial_spark.plans import lifecycle as lc
from geospatial_spark.plans.build import ORD_SHARD_SHIFT


class LocalSearcher:
    """Driver/serving-process searcher over a published index. No Spark
    session required."""

    def __init__(self, index_root: str, max_age_seconds: float | None = None,
                 preload_docmaps: bool = False):
        self.root = index_root
        m = lc.read_manifest(index_root)
        if not m or m.get("state") != lc.STATE_AVAILABLE:
            raise ValueError(f"index at {index_root} not AVAILABLE: {m and m.get('state')}")
        missing = lc.missing_generations(index_root)
        if missing:
            raise ValueError(
                f"index_generations_missing: {missing} listed in manifest "
                "but absent on disk — force rebuild required")
        if max_age_seconds is not None:
            import time as _time

            age = _time.time() - float(m.get("built_at_unix", 0))
            if age > max_age_seconds:
                raise ValueError(f"index_data_expired: built {age:.0f}s ago")
        self.manifest = m
        # empty list is a valid (empty-corpus) generation set
        self.gens = (m["generations"] if "generations" in m else [
            {"id": m["generation"], "n_shards": m["n_shards"],
             "n_docs": m["n_docs"], "shards": m["shards"]}
        ])
        self.n_docs = int(m["n_docs"])
        self.avgdl = float(m["avgdl"])
        self.gdirs = {g["id"]: Path(lc.gen_dir(index_root, g["id"])) for g in self.gens}
        self.shard_docs = {
            (g["id"], int(s["shard"])): int(s["docs_tokenized"])
            for g in self.gens for s in g["shards"]
        }
        self._dict: dict[str, int] | None = None
        self._seg_ds = None  # lazy pyarrow dataset over all generations
        self._docmap_cache: dict[tuple[str, int], object] = {}  # frozen index → safe
        if preload_docmaps:
            import pyarrow.parquet as pq

            for g in self.gens:
                for s in g["shards"]:
                    shard = int(s["shard"])
                    self._docmap_cache[(g["id"], shard)] = pq.read_table(
                        lc.docmap_path(self.gdirs[g["id"]], shard),
                        columns=["doc_id"]).column("doc_id")

    # -- dictionary (loaded once; the frozen index makes this sound) ---

    def _df_for(self, terms: list[str]) -> dict[str, int]:
        import pyarrow.dataset as ds

        if self._dict is None:
            self._dict = {}
            for g in self.gens:
                d = ds.dataset(str(self.gdirs[g["id"]] / "dictionary"), format="parquet")
                t = d.to_table(columns=["term", "df"])
                for term, df in zip(t.column("term").to_pylist(),
                                    t.column("df").to_pylist()):
                    self._dict[term] = self._dict.get(term, 0) + int(df)
        return {t: self._dict[t] for t in terms if t in self._dict}

    # -- search --------------------------------------------------------

    def _segments_dataset(self):
        """One pyarrow dataset over every generation's segment files —
        footers parse once, scans are multithreaded, and the term filter
        prunes row groups via statistics."""
        import pyarrow.dataset as ds

        if self._seg_ds is None:
            parts = []
            for g in self.gens:
                gdir = self.gdirs[g["id"]]
                files = sorted(str(p) for p in gdir.glob("segments-*.parquet"))
                if files:
                    parts.append((g["id"], ds.dataset(files, format="parquet")))
            self._seg_ds = parts
        return self._seg_ds

    def search(self, query: str, k: int = 10) -> list[tuple[str, float]]:
        import pyarrow.dataset as ds
        import pyarrow.parquet as pq

        norm = self.manifest.get("normalization") or {}
        terms = sorted({norm.get(t, t) for t in tokenize_py(query)})
        if not terms or self.n_docs == 0:
            return []
        df_global = self._df_for(terms)
        if not df_global:
            return []
        flt = ds.field("term").isin(list(df_global))

        candidates: list[tuple[float, str, int, str]] = []  # (-score, conv, turn, doc_id)
        for gen_id, dset in self._segments_dataset():
            gdir = self.gdirs[gen_id]
            tbl = dset.to_table(filter=flt)
            if tbl.num_rows == 0:
                continue
            rows = tbl.to_pylist()
            by_shard: dict[int, list[dict]] = {}
            for r in rows:
                by_shard.setdefault(int(r["shard"]), []).append(r)
            for shard, seg_rows in by_shard.items():
                base = shard << ORD_SHARD_SHIFT
                local, scores = wand_shard(
                    seg_rows, self.shard_docs[(gen_id, shard)], base,
                    df_global, self.n_docs, self.avgdl, k,
                )
                if len(local) == 0:
                    continue
                key = (gen_id, shard)
                col = self._docmap_cache.get(key)
                if col is None:
                    col = pq.read_table(lc.docmap_path(gdir, shard),
                                        columns=["doc_id"]).column("doc_id")
                    self._docmap_cache[key] = col
                ids = col.take(local.tolist()).to_pylist()
                for doc_id, sc in zip(ids, scores):
                    conv, _, turn = doc_id.rpartition(":")
                    candidates.append((-float(sc), conv, int(turn), doc_id))

        candidates.sort()
        return [(d, -neg) for neg, _, _, d in candidates[:k]]
