"""Small-k searches dispatch to the serving-tier LocalSearcher (no
Spark job); the distributed plan remains for k beyond the cap, for
federated roots, and for searchers whose frozen generation view has
been superseded on disk. Every dispatched path must be row- and
score-identical to the distributed plan it replaces."""

import pytest

from geospatial_spark.plans.query import IndexSearcher


@pytest.fixture(scope="module")
def idx_root(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("localdisp") / "idx")
    build_index(spark, small_transcripts, root, n_shards=4)
    return root


def _pair(spark, root):
    s_local = IndexSearcher(spark, root)
    s_dist = IndexSearcher(spark, root)
    s_dist.LOCAL_SEARCH_MAX_K = -1  # instance override: force Spark path
    assert s_local._local_dispatch(10) is not None
    assert s_dist._local_dispatch(10) is None
    return s_local, s_dist


QUERIES = ["the spark", "deploy index shuffle", "token", "zzznothing"]


def test_search_parity(spark, idx_root):
    a, b = _pair(spark, idx_root)
    for q in QUERIES:
        assert a.search(q, 10) == b.search(q, 10), q
        assert a.search(q, 10, quantized=True) == b.search(q, 10, quantized=True), q


def test_search_df_parity(spark, idx_root):
    a, b = _pair(spark, idx_root)
    for q in QUERIES[:2]:
        ra = [tuple(r) for r in a.search_df(q, 7).collect()]
        rb = [tuple(r) for r in b.search_df(q, 7).collect()]
        assert ra == rb, q


def test_phrase_near_bool_parity(spark, idx_root):
    a, b = _pair(spark, idx_root)
    da = a.search_phrase_df("the spark", 8)
    db = b.search_phrase_df("the spark", 8)
    if db is None:
        assert da is None or da.count() == 0
    else:
        assert [tuple(r) for r in da.collect()] == [tuple(r) for r in db.collect()]
    assert a.search_near("the spark", 4, 8) == b.search_near("the spark", 4, 8)
    assert a.search_phrase_scored("the spark", 8) == b.search_phrase_scored("the spark", 8)
    assert (a.search_bool(should="spark index", filter_q="the", k=8)
            == b.search_bool(should="spark index", filter_q="the", k=8))
    assert (a.search_bool(should="spark index", must_not="deploy", k=8,
                          min_should_match=2)
            == b.search_bool(should="spark index", must_not="deploy", k=8,
                             min_should_match=2))


def test_search_many_parity(spark, idx_root):
    a, b = _pair(spark, idx_root)
    qs = {"q1": "the spark", "q2": "deploy index", "q3": "zzznothing"}
    assert a.search_many(qs, 6) == b.search_many(qs, 6)


def test_big_k_stays_distributed(spark, idx_root):
    s = IndexSearcher(spark, idx_root)
    assert s._local_dispatch(s.LOCAL_SEARCH_MAX_K + 1) is None


def test_cooc_guard_routes_hot_positions_distributed(spark, idx_root):
    """A phrase/near query whose terms co-occur beyond the bound must
    run distributed — and stay row-identical to the local path."""
    s = IndexSearcher(spark, idx_root)
    guarded = IndexSearcher(spark, idx_root)
    guarded.LOCAL_SEARCH_MAX_COOC = 0  # everything over budget
    assert guarded._positions_local(10, est=1.0) is None
    for q in ("the spark", "deploy index"):
        da, db = s.search_phrase_df(q, 8), guarded.search_phrase_df(q, 8)
        ra = None if da is None else [tuple(r) for r in da.collect()]
        rb = None if db is None else [tuple(r) for r in db.collect()]
        assert ra == rb, q
        assert s.search_near(q, 4, 8) == guarded.search_near(q, 4, 8), q
    qs = {"p1": {"type": "phrase", "q": "the spark"},
          "m1": {"type": "match", "q": "deploy"}}
    assert s.search_many_mixed(qs, 6) == guarded.search_many_mixed(qs, 6)


def test_stale_generation_view_falls_back(spark, idx_root):
    from geospatial_spark.plans.compact import merge_generations

    s = IndexSearcher(spark, idx_root)  # freezes the pre-merge view
    merge_generations(spark, idx_root, n_shards=2, force=True)
    # the on-disk manifest advanced: serving locally would answer over a
    # different generation set than this searcher's frozen plan
    assert s._local_dispatch(10) is None
    fresh = IndexSearcher(spark, idx_root)
    assert fresh._local_dispatch(10) is not None
