"""HLL cardinality sketch gates (operators/sketch.py): DuckDB
bit-parity on BOTH estimator branches, partitioning invariance (the
register sum is integer-exact, so the estimate cannot depend on
partition order), and the advertised ~1.6% (p=12) accuracy."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from geospatial_spark.operators.sketch import (M_REG, hll_distinct,
                                               hll_distinct_sql)

N_BIG = 50_000  # >> 2.5·m = 10240: raw harmonic branch
N_SMALL = 700   # << 10240 with empty registers: linear-counting branch


@pytest.fixture(scope="module")
def big(spark):
    # two groups: one on each estimator branch
    a = spark.range(N_BIG).select(
        F.lit("big").alias("g"), F.col("id").alias("v"))
    b = spark.range(N_SMALL).select(
        F.lit("small").alias("g"), (F.col("id") + 1_000_000).alias("v"))
    return a.unionByName(b)


def _duck(rows_df):
    con = duckdb.connect()
    con.register("t", rows_df.toPandas())
    sql = hll_distinct_sql("t", "v", "g", "approx")
    return dict(con.execute(sql + " ORDER BY g").fetchall())


def test_both_branches_match_duckdb_exactly(spark, big):
    got = {r["g"]: float(r["approx"]) for r in
           hll_distinct(big, "v", ["g"], "raw")
           .select("g", F.round("raw", 4).alias("approx")).collect()}
    want = {g: float(v) for g, v in _duck(big).items()}
    assert got == want  # bit-for-bit after the shared 4-dp round
    # and the branches really differ: big is raw-harmonic (no empty-
    # register correction), small is linear counting
    assert got["big"] > 2.5 * M_REG
    assert got["small"] < 2.5 * M_REG


def test_accuracy_within_bound(spark, big):
    got = {r["g"]: float(r["raw"]) for r in
           hll_distinct(big, "v", ["g"], "raw").collect()}
    assert abs(got["big"] - N_BIG) / N_BIG < 0.05   # 3σ at 1.6%
    assert abs(got["small"] - N_SMALL) / N_SMALL < 0.05


def test_partitioning_invariance(spark, big):
    """Shuffled/odd partitionings must give the SAME bits — the whole
    point of the integer-exact register sum."""
    base = {r["g"]: float(r["raw"]) for r in
            hll_distinct(big, "v", ["g"], "raw").collect()}
    weird = big.repartition(17, "v")
    again = {r["g"]: float(r["raw"]) for r in
             hll_distinct(weird, "v", ["g"], "raw").collect()}
    assert base == again


def test_duplicates_do_not_move_estimate(spark):
    one = spark.range(2_000).select(F.lit("g").alias("g"),
                                    F.col("id").alias("v"))
    three = one.unionByName(one).unionByName(one)
    a = hll_distinct(one, "v", ["g"], "raw").collect()[0]["raw"]
    b = hll_distinct(three, "v", ["g"], "raw").collect()[0]["raw"]
    assert a == b


def test_nulls_ignored(spark):
    df = (spark.range(1_000)
          .select(F.lit("g").alias("g"),
                  F.when(F.col("id") % 2 == 0, F.col("id")).alias("v")))
    est = hll_distinct(df, "v", ["g"], "raw").collect()[0]["raw"]
    assert abs(est - 500) / 500 < 0.08
