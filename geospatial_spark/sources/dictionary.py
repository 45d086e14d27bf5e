"""Reference-dictionary CSV source — the GeoIP-CSV analogue.

Reference contract (ip2geo/dao/GeoIpDataDao.java:169-241 +
DatasourceUpdateService.validateHeader:219-227): first column is the
key, remaining columns are payload, header row mandatory, ≥2 fields.
Here the dictionary is the tokenizer's normalization table
(token → canonical form, FIXTURES.md §4). Only local synthetic files —
no external downloads in this sandbox (the deny-list/redirect
validation of the reference is out of scope by construction).
"""

from __future__ import annotations

import csv
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def validate_header(header: list[str]) -> None:
    """≥2 fields, non-empty names (validateHeader analogue)."""
    if header is None or len(header) < 2:
        raise ValueError(f"dictionary header must have >= 2 fields, got {header}")
    if any(not h.strip() for h in header):
        raise ValueError(f"dictionary header has empty field names: {header}")


def read_normalization_csv(path: str) -> dict[str, str]:
    """token → canonical mapping from a 2+-column CSV (driver-side:
    dictionaries are metadata-sized and get broadcast/closured)."""
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader, None)
        validate_header(header)
        mapping: dict[str, str] = {}
        for row in reader:
            if len(row) < 2:
                raise ValueError(f"dictionary row needs >= 2 fields: {row}")
            mapping[row[0]] = row[1]
    return mapping


def normalization_df(spark: SparkSession, mapping: dict[str, str]) -> DataFrame:
    """The same dictionary as a DataFrame (broadcast-join form for
    relational pipelines)."""
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(mapping.items())], ["token", "canonical"]
    )
