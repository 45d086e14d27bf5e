"""Enrichment lookup joins — the ip2geo family re-expressed.

Reference: per-document dictionary lookup with shard-local preference +
LRU cache (GeoIpDataDao.getGeoIpData:250-265, Ip2GeoCachedDao.java:119-138),
multi-value lookups (Ip2GeoProcessor.java:206-234).

Spark-first: the dictionary is the BROADCAST side of a hash join —
Spark's torrent broadcast is the cluster-wide cache (immutable, like
the frozen ip2geo index). Multi-value = explode → join → re-aggregate
in stable order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_join(facts: DataFrame, dim: DataFrame, key: str,
                payload_cols: list[str] | None = None) -> DataFrame:
    """Broadcast enrichment join (J1/J2). dim must be dictionary-sized;
    a left join preserves facts with no dictionary hit (the reference
    leaves the doc unenriched on miss)."""
    d = dim if payload_cols is None else dim.select(key, *payload_cols)
    return facts.join(F.broadcast(d), key, "left")


def range_lookup(facts: DataFrame, dim: DataFrame, value_col: str,
                 lo_col: str = "lo", hi_col: str = "hi",
                 payload_cols: list[str] | None = None,
                 chunk: float | None = None) -> DataFrame:
    """Broadcast CONTAINMENT lookup: enrich each fact whose value falls
    in a dictionary interval [lo, hi) — the literal shape of the
    reference's CIDR lookup (`termQuery(_cidr, ip)` resolves an ip into
    a stored range row, ip2geo/dao/GeoIpDataDao.java:250-265), where
    lookup_join above is the equality degeneration.

    Left join: facts outside every interval keep NULL payloads (the
    reference leaves the doc unenriched on miss). Intervals are assumed
    disjoint — overlaps emit one row per matching interval.

    chunk=None: broadcast non-equi join (BroadcastNestedLoopJoin) —
    right for dictionary-sized dims, the common case (a CIDR table is
    dictionary-sized by construction). chunk=B: the scale path — every
    interval explodes to the coarse cells it covers, facts key by
    value div B, and the join becomes a broadcast HASH equi-join on the
    cell with a residual range filter: per-fact probe cost drops from
    O(|dim|) to O(intervals per cell). Pick B near the median interval
    width so each interval covers O(1) cells."""
    d = dim if payload_cols is None else dim.select(lo_col, hi_col,
                                                    *payload_cols)
    v = F.col(value_col)
    if chunk is None:
        cond = (v >= F.col(lo_col)) & (v < F.col(hi_col))
        return facts.join(F.broadcast(d), cond, "left") \
                    .drop(lo_col, hi_col)
    cells = d.withColumn(
        "_cell",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / F.lit(chunk)).cast("long"),
            F.floor((F.col(hi_col) - F.lit(1e-9)) / F.lit(chunk))
            .cast("long"))))
    keyed = facts.withColumn("_cell",
                             F.floor(v / F.lit(chunk)).cast("long"))
    cond = (keyed["_cell"] == cells["_cell"]) \
        & (v >= F.col(lo_col)) & (v < F.col(hi_col))
    return (keyed.join(F.broadcast(cells), cond, "left")
            .drop(cells["_cell"]).drop(lo_col, hi_col, "_cell"))


def multi_value_lookup(facts: DataFrame, id_col: str, arr_col: str,
                       dim: DataFrame, key: str, payload: str) -> DataFrame:
    """J3: array column of keys → sorted array of payloads per row.
    explode → broadcast join → collect with a pinned order (sort_array,
    so results are deterministic — collect_list alone is not)."""
    ex = facts.select(F.col(id_col), F.explode_outer(arr_col).alias(key))
    joined = ex.join(F.broadcast(dim.select(key, payload)), key, "left")
    return joined.groupBy(id_col).agg(
        F.sort_array(F.collect_list(payload)).alias("payloads")
    )
