"""SparkSession factory with the settings the engine relies on.

Local-mode testing proxy for a multi-executor cluster; partitioning
decisions in the engine (repartition by salted term, per-partition
segment build) are what carry to a real cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip the geospatial_spark package for worker distribution — the
    spark-submit --py-files mechanism, used automatically so Python
    workers can unpickle our kernels regardless of driver cwd."""
    pkg_dir = Path(__file__).resolve().parent
    fd, path = tempfile.mkstemp(suffix=".zip", prefix="geospatial_spark_")
    os.close(fd)
    with zipfile.ZipFile(path, "w") as z:
        for p in sorted(pkg_dir.rglob("*.py")):
            z.write(p, f"geospatial_spark/{p.relative_to(pkg_dir)}")
    return path


def get_spark(
    app_name: str = "geospatial_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    # scan split size: the driver's testdata tables are single ~5-130MB
    # parquet files, which the 128MB default turns into ONE scan task
    # regardless of core count. 16MB restores scan parallelism locally;
    # production deployments with properly sized many-file tables should
    # raise it back toward 128MB-1GB (guide §6) via the env knob.
    max_part = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", max_part)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(package_zip())
    return spark
