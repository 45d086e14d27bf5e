"""Hybrid lexical+vector retrieval via reciprocal-rank fusion (the
OpenSearch hybrid-query / RRF processor analogue).

Two independent rankings — BM25 over the text and exact cosine over
the embedding column — fuse by

    rrf(d) = Σ_r 1 / (k0 + rank_r(d))        (k0 = 60, the RRF paper's
                                              and OpenSearch's default)

summed over the rankings in which d appears within the fusion depth.
Rank-based fusion needs NO score normalization across spaces (the
reason RRF beats weighted-sum fusion operationally), and both ranks
are deterministic under the engine's rounded-ordering contracts, so
the fused ranking is oracle-checkable bit-for-bit.

Plan shape: each ranking is its own bounded top-depth plan (the BM25
relational scorer / the broadcast cosine probe); fusion is a union of
two ≤depth-row frames + one tiny agg — the fusion step never touches
the corpus.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geospatial_spark.functions.oracle_sql import ORDER_DP

RRF_K0 = 60


def ranking_of(scored: DataFrame, depth: int, score_col: str = "score",
               id_col: str = "doc_id") -> DataFrame:
    """(id, rank) under the pinned ordering (score rounded to ORDER_DP
    desc, id asc), cut at ``depth`` — the rank every fusion consumer
    shares with the oracle."""
    from pyspark.sql.window import Window

    # bound BEFORE the unpartitioned window: orderBy+limit is a
    # distributed take-ordered, so the single-partition row_number only
    # ever sees <= depth rows even when a caller hands a corpus-sized
    # frame (e.g. an adaptive-overfetch 0.0-score plateau). Identical
    # output: the same total order (ids unique per ranking) selects the
    # same depth-prefix the rank filter kept.
    key = [F.round(F.col(score_col), ORDER_DP).desc(), F.asc(id_col)]
    w = Window.orderBy(*key)
    return (scored.orderBy(*key).limit(int(depth))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(depth))
            .select(F.col(id_col).alias("doc_id"), "rank"))


def rrf_fuse(rankings: list[DataFrame], k: int = 10,
             k0: int = RRF_K0) -> DataFrame:
    """Fuse (doc_id, rank) frames → (doc_id, rrf) top-k."""
    parts = [r.select("doc_id",
                      (F.lit(1.0) / (F.lit(float(k0)) + F.col("rank")))
                      .alias("c"))
             for r in rankings]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    return (u.groupBy("doc_id").agg(F.sum("c").alias("rrf"))
            .orderBy(F.round(F.col("rrf"), ORDER_DP).desc(),
                     F.asc("doc_id"))
            .limit(int(k)))
