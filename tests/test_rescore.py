"""Rescore window: tier parity, brute-force recompute, and that the
secondary query actually reorders within the window."""

from __future__ import annotations

import math

import pytest

from geospatial_spark.functions.oracle_sql import ORDER_DP


@pytest.fixture(scope="module")
def rescore_index(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("rescore") / "idx")
    build_index(spark, small_transcripts, root, n_shards=4)
    return root


def _brute(ls, q, rq, k, window, qw, rw):
    base = ls.search(q, ls.n_docs)
    win = sorted(base, key=lambda h: (-round(h[1], ORDER_DP), h[0]))[:window]
    sec = dict(ls.search(rq, ls.n_docs))
    comb = [(d, qw * s + rw * sec.get(d, 0.0)) for d, s in win]
    comb.sort(key=lambda h: (-round(h[1], ORDER_DP), h[0]))
    return comb[:k]


def test_rescore_tier_parity(spark, rescore_index):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, rescore_index)
    ls = LocalSearcher(rescore_index)
    q, rq = "the spark job", "deploy"
    want = _brute(ls, q, rq, 10, 20, 1.0, 2.0)
    a = ss.search_rescored(q, rq, 10, 20, 1.0, 2.0)
    b = ls.search_rescored(q, rq, 10, 20, 1.0, 2.0)
    assert [d for d, _ in a] == [d for d, _ in want]
    assert [d for d, _ in b] == [d for d, _ in want]
    for (_, x), (_, w) in zip(a, want):
        assert math.isclose(x, w, rel_tol=1e-9)
    for (_, x), (_, w) in zip(b, want):
        assert math.isclose(x, w, rel_tol=1e-9)
    # the secondary must actually reorder the window for this fixture
    plain = [d for d, _ in ls.search(q, 10)]
    assert plain != [d for d, _ in a]
    # rescore query matching nothing → pure weighted base order
    none = ss.search_rescored(q, "zzznotaterm", 5, 20, 1.0, 2.0)
    base5 = _brute(ls, q, "zzznotaterm", 5, 20, 1.0, 2.0)
    assert [d for d, _ in none] == [d for d, _ in base5]


def test_daemon_rescore(rescore_index):
    from geospatial_spark.plans.daemon import IndexService
    from geospatial_spark.plans.serve import LocalSearcher

    svc = IndexService(rescore_index, request_cache_size=2)
    ls = LocalSearcher(rescore_index)
    rows = svc.handle({"type": "rescore", "q": "the spark job",
                       "rescore_q": "deploy", "k": 5, "window": 20,
                       "rescore_weight": 2.0})
    want = ls.search_rescored("the spark job", "deploy", 5, 20, 1.0, 2.0)
    assert [r[0] for r in rows] == [d for d, _ in want]
