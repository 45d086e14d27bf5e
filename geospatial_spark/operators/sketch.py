"""Deterministic HyperLogLog cardinality sketch.

The reference's `cardinality` aggregation is Lucene/OpenSearch
HyperLogLog++ (the plugin exposes it through the agg extension point,
GeospatialPlugin.java:135-140 registers aggs beside geohex_grid). This
is the Spark-first analogue with one extra property the reference does
NOT have: the estimate is **bit-reproducible across engines and
partitionings**, so it sits under the DuckDB gate like every exact
operator.

How determinism is engineered (the usual HLL pitfalls are float ones):

* the hash is md5 of the value's decimal string — identical bytes in
  Spark and DuckDB, no engine-native hash;
* bucket = first 3 hex chars (p = 12, m = 4096 registers,
  rel. err ≈ 1.04/√m ≈ 1.6%); rho = leading zeros in the next 60 bits
  + 1, computed as 61 - length(bin(w)) — both engines' `bin` drops
  leading zeros;
* the harmonic sum Σ 2^-M_j is NOT a float sum (a distributed float
  sum of 2^-61-granularity terms needs 73 mantissa bits — its rounding
  would depend on partition order). Each term is the INTEGER
  2^(61-M_j), summed exactly as DECIMAL(38,0) (DuckDB: HUGEINT);
  empty registers contribute 2^61 each. ONE int→double conversion at
  the end (round-to-nearest, identical everywhere), then the constant
  numerator α·m²·2^61 divides it;
* the small-range correction (E ≤ 2.5m and empty registers exist →
  linear counting m·ln(m/V)) branches on that deterministic double, so
  both engines take the same branch.

At 100 TB this is the right shape: one shuffle to (group, bucket) —
4096·|groups| rows of state — then a tiny per-group reduce; no
count-distinct shuffle of the raw value domain. The map side combines
per-partition maxima before the shuffle (Spark partial aggregation on
MAX), so executor traffic is O(m) per partition regardless of row
count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P_BITS = 12
M_REG = 1 << P_BITS            # 4096 registers = 3 hex chars
W_BITS = 60                    # 15 hex chars of md5 after the bucket
_SCALE = 1 << (W_BITS + 1)     # integer unit: one register's 2^0 slot
ALPHA = 0.7213 / (1.0 + 1.079 / M_REG)   # HLL bias constant for m ≥ 128
_NUM = ALPHA * M_REG * M_REG * _SCALE    # constant numerator (double)
_LINEAR_BAR = 2.5 * M_REG


def hll_register_cols(value: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one value — md5-based, engine-portable."""
    h = F.md5(value.cast("string"))
    bucket = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    w = F.conv(F.substring(h, 4, W_BITS // 4), 16, 10).cast("long")
    rho = (F.when(w == 0, F.lit(W_BITS + 1))
           .otherwise(F.lit(W_BITS + 1) - F.length(F.bin(w))))
    return bucket, rho


def hll_distinct(df: DataFrame, value_col: str,
                 group_cols: list[str] | None = None,
                 out_col: str = "approx_distinct") -> DataFrame:
    """Per-group HLL estimate of distinct ``value_col`` values.

    Returns one row per group: (*group_cols, out_col DOUBLE) — the raw
    (unrounded) estimate; callers round for display/gates. Groupless
    call returns a single row.
    """
    group_cols = list(group_cols or [])
    bucket, rho = hll_register_cols(F.col(value_col))
    regs = (df.where(F.col(value_col).isNotNull())
            .select(*group_cols, bucket.alias("hll_bucket"),
                    rho.alias("hll_rho"))
            .groupBy(*group_cols, "hll_bucket")
            .agg(F.max("hll_rho").alias("mr")))
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(
            f"CAST(shiftleft(CAST(1 AS BIGINT), {W_BITS + 1} - mr) "
            f"AS DECIMAL(38,0))")).alias("s_int"),
        F.count(F.lit(1)).alias("nb"))
    total = (F.col("s_int")
             + (F.lit(M_REG) - F.col("nb")).cast("decimal(38,0)")
             * F.lit(_SCALE).cast("decimal(38,0)"))
    e_raw = F.lit(_NUM) / total.cast("double")
    v_empty = F.lit(M_REG) - F.col("nb")
    est = F.when(
        (e_raw <= F.lit(_LINEAR_BAR)) & (v_empty > 0),
        F.lit(float(M_REG)) * F.log(F.lit(float(M_REG))
                                    / v_empty.cast("double"))
    ).otherwise(e_raw)
    return agg.select(*group_cols, est.alias(out_col))


def hll_distinct_sql(table: str, value_col: str, group_col: str,
                     out_col: str = "approx_distinct",
                     round_dp: int = 4) -> str:
    """The DuckDB-dialect twin of hll_distinct for oracle gates —
    same hash, same integer-exact register sum (HUGEINT), same
    correction branch; hex→int spelled as a strpos polynomial (DuckDB
    has no conv())."""
    hexd = "'0123456789abcdef'"

    def nib(i: int) -> str:  # 1-based hex char i → 0..15
        return f"(strpos({hexd}, substr(hx, {i}, 1)) - 1)"

    bucket = " + ".join(f"{16 ** (2 - j)} * {nib(1 + j)}" for j in range(3))
    w = " + ".join(
        f"CAST({16 ** (14 - j)} AS BIGINT) * {nib(4 + j)}"
        for j in range(15))
    return f"""
WITH hv AS (
  SELECT {group_col} AS g, md5(CAST({value_col} AS VARCHAR)) AS hx
  FROM {table} WHERE {value_col} IS NOT NULL
), br AS (
  SELECT g, ({bucket}) AS bucket, ({w}) AS w FROM hv
), regs AS (
  SELECT g, bucket,
         MAX(CASE WHEN w = 0 THEN {W_BITS + 1}
             ELSE {W_BITS + 1} - length(bin(w)) END) AS mr
  FROM br GROUP BY 1, 2
), agg AS (
  SELECT g,
         SUM(CAST((CAST(1 AS BIGINT) << ({W_BITS + 1} - mr)) AS HUGEINT))
           AS s_int,
         COUNT(*) AS nb
  FROM regs GROUP BY 1
), est AS (
  SELECT g, nb,
         {_NUM!r} / CAST(s_int + ({M_REG} - nb) * CAST({_SCALE} AS HUGEINT)
                         AS DOUBLE) AS e_raw
  FROM agg
)
SELECT g AS {group_col},
       round(CASE WHEN e_raw <= {_LINEAR_BAR!r} AND ({M_REG} - nb) > 0
             THEN {float(M_REG)!r} * ln({float(M_REG)!r} / ({M_REG} - nb))
             ELSE e_raw END, {round_dp}) AS {out_col}
FROM est
""".strip()
