"""more_like_this: pinned term selection + tier parity + exclusion."""

from __future__ import annotations

import math

import pytest


@pytest.fixture(scope="module")
def mlt_index(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("mlt") / "idx")
    build_index(spark, small_transcripts, root, n_shards=4)
    return root


def test_select_mlt_terms_pinned():
    from geospatial_spark.operators.expand import select_mlt_terms

    tf = {"rare": 2, "common": 5, "mid": 3, "the": 9, "once": 1}
    df = {"rare": 2, "common": 80, "mid": 10, "the": 95, "once": 1}
    # once: df=1 < min_doc_freq → dropped; ranking by rounded tf·idf
    out = select_mlt_terms(tf, df, 100, max_query_terms=3,
                           min_term_freq=1, min_doc_freq=2)
    assert len(out) == 3 and "once" not in out
    assert out == sorted(out)  # returned term-ascending
    # rare (2 · idf(2)) outranks common (5 · idf(80))
    assert "rare" in out and "mid" in out


def test_mlt_tier_parity_and_exclusion(spark, mlt_index, small_transcripts,
                                       tmp_path_factory):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, mlt_index)
    ls = LocalSearcher(mlt_index)
    texts = {f"{r['conv_id']}:{r['turn_idx']}": r["text"]
             for r in small_transcripts.collect()}
    src = ss.search("the spark job", 1)[0][0]
    a = ss.more_like_this(src, small_transcripts, 10)
    b = ls.more_like_this(src, 10, text_of=texts)
    assert a and [d for d, _ in a] == [d for d, _ in b]
    for (_, x), (_, y) in zip(a, b):
        assert math.isclose(x, y, rel_tol=1e-12)
    assert src not in [d for d, _ in a]
    # include=True keeps the source doc (it matches its own terms)
    inc = ss.more_like_this(src, small_transcripts, 10, include=True)
    assert src in [d for d, _ in inc]
    # unknown doc → empty, no job failure
    assert ss.more_like_this("nope:7", small_transcripts, 5) == []
    assert ls.more_like_this("nope:7", 5, text_of=texts) == []


def test_daemon_mlt(mlt_index, spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.daemon import IndexService
    from geospatial_spark.plans.serve import LocalSearcher

    # daemon needs a docstore parquet to fetch the source text
    store = str(tmp_path_factory.mktemp("mltstore") / "tx.parquet")
    small_transcripts.write.mode("overwrite").parquet(store)
    svc = IndexService(mlt_index, request_cache_size=4, docstore=store)
    ls = LocalSearcher(mlt_index)
    texts = {f"{r['conv_id']}:{r['turn_idx']}": r["text"]
             for r in small_transcripts.collect()}
    src = ls.search("the spark job", 1)[0][0]
    rows = svc.handle({"type": "more_like_this", "doc_id": src, "k": 5})
    want = ls.more_like_this(src, 5, text_of=texts)
    assert [r[0] for r in rows] == [d for d, _ in want]
