"""Bucket aggregations — the geohex_grid family re-expressed.

Reference: geo_point doc values → H3 cell → per-shard partial buckets →
coordinator reduce, order by count desc, truncate
(GeoHexGridAggregationBuilder.java:32-135, GeoHexGridAggregator.java:23-47).
Our cell function is term/bucket hashing instead of H3; partial+final
hash aggregation is Spark-native (map-side combine), top-k truncation is
TakeOrderedAndProject.

salted_agg is the explicit two-stage skew guard for hot keys (north
rule): stage 1 on (key, salt) spreads a hot key over `salts` reducers,
stage 2 merges partials — use for term-keyed shuffles whose partial
aggregation alone can't bound a reducer's load.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_topk(df: DataFrame, cell: Column, size: int = 10_000,
                cell_name: str = "cell") -> DataFrame:
    """geohex_grid shape: bucket by cell expression, count desc, top-N;
    ties broken by cell for determinism (the reference's yamlRestTest
    pins exact bucket order, 20_geohex_grid.yml:44-61)."""
    return (
        df.select(cell.alias(cell_name))
        .groupBy(cell_name)
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc(cell_name))
        .limit(size)
    )


def salted_agg(df: DataFrame, key: str, agg_col: str, salts: int = 16,
               salt_source: str | None = None) -> DataFrame:
    """Two-stage salted sum: groupBy(key, salt).sum → groupBy(key).sum.
    salt_source: a column whose hash spreads rows (defaults to a
    per-partition id, which is already uniform)."""
    salt = (F.pmod(F.hash(F.col(salt_source)), F.lit(salts))
            if salt_source else F.pmod(F.spark_partition_id(), F.lit(salts)))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(agg_col).alias("_psum"))
    )
    return partial.groupBy(key).agg(F.sum("_psum").alias(f"sum_{agg_col}"))
