"""Score explanation (operators/explain.py): the decomposition IS the
score, identical across the Spark and serving tiers, and robust to
resharded (merged) generations where the hash-routing fast path no
longer applies."""

from __future__ import annotations

import math

import pytest

from tests.conftest import QUERIES


@pytest.fixture(scope="module")
def explain_index(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("explain") / "idx")
    build_index(spark, small_transcripts, root, n_shards=6)
    return root


def test_explain_sums_to_score_both_tiers(spark, explain_index):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, explain_index)
    ls = LocalSearcher(explain_index)
    for q in QUERIES[:4]:
        for doc_id, score in ss.search(q, 5):
            ex_s = ss.explain(q, doc_id)
            ex_l = ls.explain(q, doc_id)
            assert ex_s is not None and ex_l is not None
            assert math.isclose(ex_s["score"], score, rel_tol=1e-9), (q, doc_id)
            assert ex_s["entries"] == ex_l["entries"], (q, doc_id)
            assert math.isclose(
                sum(e["contribution"] for e in ex_s["entries"]), score,
                rel_tol=1e-9)
            # entries are term-ascending and each factor is plausible
            terms = [e["term"] for e in ex_s["entries"]]
            assert terms == sorted(terms)
            for e in ex_s["entries"]:
                assert e["tf"] >= 1 and e["dl"] >= e["tf"] >= 1
                assert e["df"] >= 1 and e["idf"] > 0.0


def test_explain_quantized(spark, explain_index):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, explain_index)
    ls = LocalSearcher(explain_index)
    q = QUERIES[0]
    for doc_id, score in ss.search(q, 3, quantized=True):
        ex = ss.explain(q, doc_id, quantized=True)
        assert math.isclose(ex["score"], score, rel_tol=1e-9)
        assert ls.explain(q, doc_id, quantized=True)["entries"] == ex["entries"]


def test_explain_unindexed_and_no_match(spark, explain_index):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, explain_index)
    ls = LocalSearcher(explain_index)
    assert ss.explain("the", "no_such_conv:99") is None
    assert ls.explain("the", "no_such_conv:99") is None
    # indexed doc, but no query term matches: located, empty breakdown
    some_doc = ss.search("the", 1)[0][0]
    ex = ss.explain("zzzunknown qqqunknown", some_doc)
    assert ex is not None and ex["entries"] == [] and ex["score"] == 0.0
    exl = ls.explain("zzzunknown qqqunknown", some_doc)
    assert exl is not None and exl["entries"] == []


def test_explain_survives_reshard_merge(spark, small_transcripts,
                                        tmp_path_factory):
    """merge_generations reshards — the xxhash fast path may route to
    the wrong shard, so locate_doc's fallback scan must still find the
    doc and the decomposition must still equal the merged index's
    scores."""
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.compact import merge_generations
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path_factory.mktemp("explain_merged") / "idx")
    build_index(spark, small_transcripts, root, n_shards=6)
    merge_generations(spark, root, n_shards=2)
    ss = IndexSearcher(spark, root)
    q = QUERIES[0]
    for doc_id, score in ss.search(q, 5):
        ex = ss.explain(q, doc_id)
        assert ex is not None
        assert math.isclose(ex["score"], score, rel_tol=1e-9), doc_id


def test_daemon_explain(explain_index):
    from geospatial_spark.plans.daemon import IndexService
    from geospatial_spark.plans.serve import LocalSearcher

    svc = IndexService(explain_index, request_cache_size=8)
    ls = LocalSearcher(explain_index)
    q = QUERIES[0]
    doc_id, score = ls.search(q, 1)[0]
    rows = svc.handle({"type": "explain", "q": q, "doc_id": doc_id})
    assert rows and math.isclose(sum(r[5] for r in rows), score,
                                 rel_tol=1e-9)
    with pytest.raises(ValueError):
        svc.handle({"type": "explain", "q": q, "doc_id": "missing:0"})
