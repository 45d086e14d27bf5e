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
