"""ranking_of must bound its input before the unpartitioned window."""


def test_ranking_of_bounds_oversized_frame(spark):
    from geospatial_spark.operators.hybrid import ranking_of

    big = spark.range(0, 20000).selectExpr(
        "cast(id as string) as doc_id",
        "cast(id % 97 as double) / 7 as score")
    out = ranking_of(big, depth=15)
    plan = out._jdf.queryExecution().executedPlan().toString()
    rows = out.collect()
    assert len(rows) == 15
    assert [r["rank"] for r in rows] == list(range(1, 16))
    # the single-partition window must sit above a take-ordered limit,
    # never above the raw scan
    assert "TakeOrderedAndProject" in plan or "GlobalLimit" in plan, plan
