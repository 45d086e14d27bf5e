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

        matched = self._segments().where(F.col("term").isin(terms))
        # global df per query term (sum of shard-local dfs) — tiny collect
        df_rows = matched.groupBy("term").agg(F.sum("df").alias("df")).collect()
        df_global = {r["term"]: int(r["df"]) for r in df_rows}
        if not df_global:
            return []

        n_docs, avgdl, shard_docs = self.n_docs, self.avgdl, self.shard_docs
        kk = int(k)

        def run_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            base = shard << ORD_SHARD_SHIFT
            rows = pdf.to_dict("records")
            local, scores = wand_shard(
                rows, shard_docs.get(shard, 0), base, df_global,
                n_docs, avgdl, kk,
            )
            return pd.DataFrame(
                {"doc_ord": (local + base).astype(np.int64),
                 "score": scores.astype(np.float64)}
            )

        per_shard = matched.groupBy("shard").applyInPandas(
            run_shard, schema="doc_ord long, score double"
        )
        top = per_shard.orderBy(F.desc("score"), F.asc("doc_ord")).limit(kk)
        hits = top.collect()
        if not hits:
            return []

        ords = [int(r["doc_ord"]) for r in hits]
        idmap = {
            int(r["doc_ord"]): r["doc_id"]
            for r in self._docmap().where(F.col("doc_ord").isin(ords))
                     .select("doc_ord", "doc_id").collect()
        }
        return [(idmap[int(r["doc_ord"])], float(r["score"])) for r in hits]
