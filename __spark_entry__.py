"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship BM25 top-k over sf0.001 documents.
queries()      — one entry per implemented operator (SURVEY.md §2),
                 delegated to geospatial_spark.plans.catalog.
oracle_sql()   — matching DuckDB SQL per query name.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from geospatial_spark.plans import catalog

    return catalog.queries()["bm25_wand_multi"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geospatial_spark.plans import catalog

    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    from geospatial_spark.plans import catalog

    return catalog.oracle_sql()
