"""Percolator (reverse search): distributed counts ≡ single-doc API,
broadcast plan, daemon form."""

from __future__ import annotations


def test_percolate_pairs_match_single_doc_api(spark, small_transcripts):
    from geospatial_spark.operators import postings as P
    from geospatial_spark.operators.percolate import (percolate_doc,
                                                      percolate_pairs,
                                                      queries_df)

    queries = [("a", "the spark"), ("b", "deploy merge job"),
               ("c", "zzznope"), ("d", "the")]
    post = P.posting_tuples(small_transcripts)
    pairs = percolate_pairs(queries_df(spark, queries), post).collect()
    got = {}
    for r in pairs:
        got.setdefault(r["doc_id"], set()).add(r["query_id"])
    from geospatial_spark.sources.transcripts import with_doc_id

    rows = with_doc_id(small_transcripts).select("doc_id", "text").collect()
    checked = 0
    for r in rows:
        want = set(percolate_doc(queries, r["text"] or ""))
        assert got.get(r["doc_id"], set()) == want, r["doc_id"]
        checked += 1
    assert checked > 100
    # "c" can never fire
    assert all("c" not in s for s in got.values())


def test_percolate_counts_keep_zero_and_plan(spark, small_transcripts):
    from geospatial_spark.operators import postings as P
    from geospatial_spark.operators.percolate import (percolate_counts,
                                                      queries_df)

    queries = [("q0", "the"), ("q1", "zzznope")]
    post = P.posting_tuples(small_transcripts)
    df = percolate_counts(queries_df(spark, queries), post)
    rows = {r["query_id"]: r["n_matches"] for r in df.collect()}
    assert rows["q1"] == 0 and rows["q0"] > 0
    # the stored-query side must broadcast — postings never reshuffle
    # onto a query key
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_daemon_percolate(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.daemon import IndexService

    root = str(tmp_path_factory.mktemp("perc") / "idx")
    build_index(spark, small_transcripts, root, n_shards=2)
    svc = IndexService(root, request_cache_size=2)
    rows = svc.handle({"type": "percolate", "text": "the spark job ran",
                       "queries": [["a", "spark the"], ["b", "zzz"]]})
    assert rows == [["a"]]
    import pytest

    with pytest.raises(ValueError):
        svc.handle({"type": "percolate", "text": "x", "queries": "bad"})
