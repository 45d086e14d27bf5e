"""Query-side plan: parse → plan (driver) → per-shard WAND → merge.

Reference lifecycle analogue (SURVEY.md §3.2): coordinator parses the
query and rewrites builders, shards execute, coordinator reduces.

Scale shape per query (independent of corpus size N):
  * segments scan filtered by term — parquet predicate pushdown +
    row-group stats (segments are written sorted by term within each
    shard file), so I/O ∝ matched postings, not the index;
  * global df(term) for the query's terms: driver-side lookup from the
    tiny matched-segment aggregate (broadcast to the scorers);
  * one applyInPandas over shard groups → k rows per shard;
  * driver merges n_shards × k rows; doc_id resolution is a semi-join
    of k ordinals against the docmap (file-pruned by doc_ord ranges).
Empty/unknown query terms short-circuit without launching a job
(MatchNoDocsQuery analogue, XYShapeQueryProcessor.java:49-53).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_spark.functions.tokenize import tokenize_py
from geospatial_spark.operators.wand import wand_shard
from geospatial_spark.plans import lifecycle as lc
from geospatial_spark.plans.build import ORD_SHARD_SHIFT


class IndexSearcher:
    """Immutable view over one published generation (the frozen-index
    read path: freeze + immutability is what makes caching sound in the
    reference, Ip2GeoCachedDao.java:263-267)."""

    def __init__(self, spark: SparkSession, index_root: str):
        self.spark = spark
        self.root = index_root
        m = lc.read_manifest(index_root)
        if not m or m.get("state") != lc.STATE_AVAILABLE:
            raise ValueError(f"index at {index_root} not AVAILABLE: {m and m.get('state')}")
        self.manifest = m
        self.gdir = lc.gen_dir(index_root, m["generation"])
        self.n_docs = int(m["n_docs"])
        self.avgdl = float(m["avgdl"])
        self.shard_docs = {int(s["shard"]): int(s["docs_tokenized"])
                           for s in m["shards"]}
        # driver-cached term dictionary (the LRU-cache-in-front-of-
        # lookup analogue, Ip2GeoCachedDao.java:119-138; sound because
        # the generation is frozen/immutable). Only when the vocabulary
        # is metadata-sized; giant vocabularies fall back to a filtered
        # dictionary scan per query.
        self._dict: dict[str, int] | None = None
        self._dict_small = int(m.get("n_terms", 0)) <= self.DICT_CACHE_MAX

    DICT_CACHE_MAX = 2_000_000

    def _df_for(self, terms: list[str]) -> dict[str, int]:
        dpath = str(self.gdir / "dictionary")
        if self._dict_small:
            if self._dict is None:
                rows = self.spark.read.parquet(dpath).select("term", "df").collect()
                self._dict = {r["term"]: int(r["df"]) for r in rows}
            return {t: self._dict[t] for t in terms if t in self._dict}
        rows = (
            self.spark.read.parquet(dpath)
            .where(F.col("term").isin(terms)).select("term", "df").collect()
        )
        return {r["term"]: int(r["df"]) for r in rows}

    def _segments(self) -> DataFrame:
        return self.spark.read.parquet(str(self.gdir / "segments-*.parquet"))

    def _docmap(self) -> DataFrame:
        return self.spark.read.parquet(str(self.gdir / "docmap-*.parquet"))

    def search(self, query: str, k: int = 10) -> list[tuple[str, float]]:
        """Top-k (doc_id, score), exact BM25, rank/score-identical to the
        oracle; tie-break (conv_id, turn_idx) asc via doc_ord."""
        terms = sorted(set(tokenize_py(query)))
        if not terms or self.n_docs == 0:
            return []

        # global df per query term from the build-time dictionary
        # (driver-cached for small vocabularies → zero extra jobs)
        df_global = self._df_for(terms)
        if not df_global:
            return []

        matched = self._segments().where(F.col("term").isin(list(df_global)))
        n_docs, avgdl, shard_docs = self.n_docs, self.avgdl, self.shard_docs
        kk = int(k)
        gdir_str = str(self.gdir)

        def run_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            from geospatial_spark.plans import lifecycle as lc_w

            shard = int(pdf["shard"].iloc[0])
            base = shard << ORD_SHARD_SHIFT
            local, scores = wand_shard(
                pdf.to_dict("records"), shard_docs.get(shard, 0), base,
                df_global, n_docs, avgdl, kk,
            )
            if len(local) == 0:
                return pd.DataFrame({"doc_ord": pd.Series([], dtype="int64"),
                                     "doc_id": pd.Series([], dtype=object),
                                     "score": pd.Series([], dtype="float64")})
            # resolve doc_ids shard-locally from the docmap file — no
            # third Spark job, no docmap shuffle
            import pyarrow.parquet as pq

            ids = pq.read_table(
                lc_w.docmap_path(lc_w.Path(gdir_str), shard), columns=["doc_id"]
            ).column("doc_id").take(local.tolist()).to_pylist()
            return pd.DataFrame(
                {"doc_ord": (local + base).astype(np.int64),
                 "doc_id": ids,
                 "score": scores.astype(np.float64)}
            )

        per_shard = matched.groupBy("shard").applyInPandas(
            run_shard, schema="doc_ord long, doc_id string, score double"
        )
        hits = per_shard.orderBy(F.desc("score"), F.asc("doc_ord")).limit(kk).collect()
        return [(r["doc_id"], float(r["score"])) for r in hits]
