"""Driver-facing query catalog: name -> (spark, sf_dir) -> DataFrame, with
a matching DuckDB oracle SQL per name (the driver correctness gate).

Each entry exercises one operator family from SURVEY.md §2 over the
driver-provided testdata tables. Scores are rounded to ROUND_DP on both
sides (driver value-hashes results); ranking ties break on doc_id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_spark.functions import oracle_sql as osql
from geospatial_spark.functions.oracle_sql import ORDER_DP, ROUND_DP
from geospatial_spark.operators import postings as P
from geospatial_spark.operators.scorer import bm25_topk


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_index(spark: SparkSession, sf_dir: str):
    tok = P.tokenized_generic(_docs(spark, sf_dir))
    dl = tok.select("doc_id", "dl")
    post = P.posting_tuples_from(tok)
    n, avgdl = P.corpus_stats(dl)
    return post, dl, n, avgdl


def _bm25(query: str, k: int = 10):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        post, dl, n, avgdl = _doc_index(spark, sf_dir)
        hits = bm25_topk(spark, post, dl, n, avgdl, query, k)
        # same rounding/ordering contract as the oracle SQL
        return (
            hits.select("doc_id", F.col("score").alias("raw"))
            .orderBy(F.round(F.col("raw"), ORDER_DP).desc(), F.asc("doc_id"))
            .select("doc_id", F.round("raw", ROUND_DP).alias("score"))
            .limit(k)
        )

    return run


def _term_buckets(limit: int = 50):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        post, *_ = _doc_index(spark, sf_dir)
        return (
            post.groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("df"),
                 F.max("tf").cast("int").alias("max_tf"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(limit)
        )

    return run


def _doclens(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = P.tokenized_generic(_docs(spark, sf_dir))
    return tok.select("doc_id", F.col("dl").cast("int").alias("dl"))


def _corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = P.tokenized_generic(_docs(spark, sf_dir))
    return tok.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg(F.col("dl").cast("double")), ROUND_DP).alias("avgdl"),
    )


def _postings_of(terms: list[str]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        post, *_ = _doc_index(spark, sf_dir)
        return post.where(F.col("term").isin(terms)).select("term", "doc_id", "tf")

    return run


BM25_Q_MULTI = "spark merge table scan"
BM25_Q_SINGLE = "spark"
BM25_Q_MISSING = "qqqqzzz"
POSTING_TERMS = ["spark", "window", "vector"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk_multi": _bm25(BM25_Q_MULTI, 10),
        "bm25_topk_single": _bm25(BM25_Q_SINGLE, 10),
        "bm25_topk_missing": _bm25(BM25_Q_MISSING, 10),
        "term_buckets_top50": _term_buckets(50),
        "doclens": _doclens,
        "corpus_stats": _corpus_stats,
        "postings_sample": _postings_of(POSTING_TERMS),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk_multi": osql.bm25_topk_sql(BM25_Q_MULTI, 10),
        "bm25_topk_single": osql.bm25_topk_sql(BM25_Q_SINGLE, 10),
        "bm25_topk_missing": osql.bm25_topk_sql(BM25_Q_MISSING, 10),
        "term_buckets_top50": osql.term_buckets_sql(50),
        "doclens": osql.doclens_sql(),
        "corpus_stats": osql.corpus_stats_sql(),
        "postings_sample": osql.postings_sql(POSTING_TERMS),
    }
