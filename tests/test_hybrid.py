"""Hybrid RRF fusion invariants."""

from __future__ import annotations

import math


def test_rrf_fuse_invariants(spark):
    from geospatial_spark.operators.hybrid import RRF_K0, rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank int")
    rows = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b], 10).collect()}
    # doc 2 appears in both rankings → highest fused score
    assert max(rows, key=rows.get) == 2
    assert math.isclose(rows[2], 1 / (RRF_K0 + 2) + 1 / (RRF_K0 + 1),
                        rel_tol=1e-12)
    assert math.isclose(rows[1], 1 / (RRF_K0 + 1), rel_tol=1e-12)
    assert set(rows) == {1, 2, 3, 4}
    # single-ranking fusion preserves the ranking's order
    solo = [r["doc_id"] for r in rrf_fuse([a], 10).collect()]
    assert solo == [1, 2, 3]


def test_ranking_of_rounded_contract(spark):
    from geospatial_spark.operators.hybrid import ranking_of

    scored = spark.createDataFrame(
        [(5, 0.3000004), (3, 0.3000001), (9, 0.1)],
        "doc_id long, score double")
    # first two round equal at 6dp → tie broken doc_id asc
    ranks = {r["doc_id"]: r["rank"]
             for r in ranking_of(scored, 10).collect()}
    assert ranks == {3: 1, 5: 2, 9: 3}
    assert len(ranking_of(scored, 2).collect()) == 2
