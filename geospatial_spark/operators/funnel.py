"""Ordered funnel analysis over an event stream.

The step-conversion question every event pipeline asks: of the users
who did step 1, how many later did step 2, then step 3 — "later"
meaning at-or-after their FIRST qualifying time for the previous step
(inclusive, pinned). One row per step: (step_idx, step, n_users).

Scale shape: one filter + user-keyed min-agg per step, chained by a
user-keyed join against the previous step's (user, first_ts) — all
shuffles hash on the high-cardinality user key (no skew), partials
combine map-side, and only |steps| aggregate rows reach the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """(step_idx, step, n_users) for the ordered funnel ``steps``."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    prev: DataFrame | None = None
    outs = []
    for i, step in enumerate(steps):
        cur = events.where(F.col(type_col) == step)
        if prev is not None:
            cur = (cur.join(
                prev.select(F.col(user_col), F.col("_t").alias("_pt")),
                user_col)
                .where(F.col(ts_col) >= F.col("_pt")))
        cur = (cur.groupBy(user_col)
               .agg(F.min(ts_col).alias("_t")))
        outs.append(
            cur.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
            .select(F.lit(i + 1).cast("int").alias("step_idx"),
                    F.lit(step).alias("step"), "n_users"))
        prev = cur
    return reduce(lambda a, b: a.unionByName(b), outs).orderBy("step_idx")
