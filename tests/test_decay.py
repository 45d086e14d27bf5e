"""Recency-decay scoring (function_score analogue): tier parity against
a brute-force recompute, and the pinned missing-ts rule."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

EPOCH = 1_767_225_600  # 2026-01-01 UTC
HL = 3_600.0  # 1 h half-life: ages of minutes move scores visibly


@pytest.fixture(scope="module")
def decay_index(spark, small_transcripts, tmp_path_factory):
    """Index whose docs carry ts = EPOCH + (60·turn + crc(conv)%600)
    minutes — deterministic, distinct enough to reorder hits."""
    from geospatial_spark.plans.build import build_index

    tx = small_transcripts.withColumn(
        "ts", F.timestamp_seconds(
            F.lit(EPOCH) + 60 * (60 * F.col("turn_idx")
                                 + F.pmod(F.crc32("conv_id"), F.lit(600)))))
    root = str(tmp_path_factory.mktemp("decay") / "idx")
    build_index(spark, tx, root, n_shards=4)
    return root


def _brute(searcher, tsm, q, k, origin_us):
    hits = searcher.search(q, searcher.n_docs)
    out = []
    for d, s in hits:
        t = tsm.get(d)
        mult = 1.0 if t is None else 0.5 ** (
            max(0.0, (origin_us - t) / 1e6) / HL)
        conv, _, turn = d.rpartition(":")
        out.append((-s * mult, conv, int(turn), d))
    out.sort()
    return [(d, -neg) for neg, _, _, d in out[:k]]


def test_decay_tier_parity(spark, decay_index):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ss = IndexSearcher(spark, decay_index)
    ls = LocalSearcher(decay_index)
    tsm = ls._ts_lookup()
    origin_us = tsm.max_ts() + 60_000_000
    for q in ["the spark job", "deploy"]:
        a = ss.search_decayed(q, 10, HL, origin_us)
        b = ls.search_decayed(q, 10, HL, origin_us)
        want = _brute(ls, tsm, q, 10, origin_us)
        assert [d for d, _ in a] == [d for d, _ in want], q
        assert [d for d, _ in b] == [d for d, _ in want], q
        for (_, x), (_, w) in zip(a, want):
            assert math.isclose(x, w, rel_tol=1e-9)
        for (_, x), (_, w) in zip(b, want):
            assert math.isclose(x, w, rel_tol=1e-9)
        # decay must actually reorder vs plain BM25 on this fixture for
        # the parity to be meaningful
        plain = [d for d, _ in ss.search(q, 10)]
        assert plain != [d for d, _ in a] or len(plain) < 2


def test_decay_missing_ts_keeps_raw_score(spark, small_transcripts,
                                          tmp_path_factory):
    """ts forced null → docmap ts_us is null → multiplier 1
    everywhere: decayed ≡ the raw-score total-order top-k (score desc,
    conv asc, turn asc), with untouched score values."""
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path_factory.mktemp("decay_nots") / "idx")
    build_index(spark,
                small_transcripts.withColumn(
                    "ts", F.lit(None).cast("timestamp")),
                root, n_shards=3)
    ss = IndexSearcher(spark, root)
    allm = ss.search("the spark job", ss.n_docs)  # all matches, exact
    want = sorted(((-s, d.rpartition(":")[0], int(d.rpartition(":")[2]), d)
                   for d, s in allm))[:10]
    dec = ss.search_decayed("the spark job", 10, HL, 2_000_000_000_000_000)
    assert [d for d, _ in dec] == [d for *_, d in want]
    for (_, a), (neg, *_rest) in zip(dec, want):
        assert math.isclose(a, -neg, rel_tol=1e-12)


def test_daemon_decay(decay_index):
    from geospatial_spark.plans.daemon import IndexService
    from geospatial_spark.plans.serve import LocalSearcher

    svc = IndexService(decay_index, request_cache_size=4)
    ls = LocalSearcher(decay_index)
    tsm = ls._ts_lookup()
    origin_us = tsm.max_ts()
    rows = svc.handle({"type": "decay", "q": "the spark job", "k": 5,
                       "half_life_s": HL, "origin_us": origin_us})
    want = ls.search_decayed("the spark job", 5, HL, origin_us)
    assert [r[0] for r in rows] == [d for d, _ in want]
