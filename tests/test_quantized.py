"""Opt-in quantized-norm scoring mode: the quantizer itself (scalar ≡
numpy ≡ DuckDB SQL, monotone, bounded error), and rank/score parity of
the WAND kernel under quantized dl against a brute-force reference
(round-3 verdict item #7: the Lucene SmallFloat norm-compression
contract, pinned by OUR spec rather than Lucene's byte layout)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from geospatial_spark.functions.bm25 import (K1, B, QUANT_BITS, idf,
                                             quantize_dl, quantize_dl_np,
                                             quantize_dl_sql)
from geospatial_spark.functions.tokenize import tokenize_py
from tests.conftest import QUERIES


def _sample_dls():
    vals = list(range(0, 4097))
    for p in range(5, 23):
        vals += [2**p - 1, 2**p, 2**p + 1]
    return sorted(set(v for v in vals if v <= 2**22))


def test_scalar_numpy_parity():
    dls = _sample_dls()
    got = quantize_dl_np(np.array(dls, dtype=np.int64))
    for dl, q in zip(dls, got.tolist()):
        assert q == quantize_dl(dl), dl


def test_sql_parity():
    import duckdb

    dls = _sample_dls()
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS dl", [dls])
    rows = con.execute(
        f"SELECT dl, {quantize_dl_sql('dl')} AS q FROM t ORDER BY dl"
    ).fetchall()
    for dl, q in rows:
        assert q == quantize_dl(dl), dl


def test_quantizer_contract():
    prev = -1
    for dl in _sample_dls():
        q = quantize_dl(dl)
        assert q <= dl
        assert q >= prev          # monotone non-decreasing
        prev = q
        if dl < (1 << QUANT_BITS):
            assert q == dl        # exact below 2^QUANT_BITS
        elif dl > 0:
            # mantissa ≥ 2^(QUANT_BITS-1) ⇒ rounding < 1/2^(QUANT_BITS-1)
            assert (dl - q) / dl < 2.0 ** -(QUANT_BITS - 1)


def _brute_quantized(rows, query, k):
    """Reference quantized scoring: full corpus, no index, no pruning."""
    doclens, postings, total = {}, {}, 0
    for conv, turn, text in rows:
        doc = f"{conv}:{turn}"
        toks = tokenize_py(text)
        doclens[doc] = len(toks)
        total += len(toks)
        for t, tf in Counter(toks).items():
            postings.setdefault(t, {})[doc] = tf
    n = len(doclens)
    avgdl = total / n if n else 0.0
    scores: dict[str, float] = {}
    for t in sorted(set(tokenize_py(query))):
        post = postings.get(t)
        if not post:
            continue
        w = idf(len(post), n)
        for doc, tf in post.items():
            dlq = quantize_dl(doclens[doc])
            norm = K1 * (1.0 - B + B * (dlq / avgdl))
            scores[doc] = scores.get(doc, 0.0) + w * (tf / (tf + norm))
    def key(item):
        conv, _, turn = item[0].rpartition(":")
        return (-item[1], conv, int(turn))
    return sorted(scores.items(), key=key)[:k]


@pytest.fixture(scope="module")
def quant_index(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("quant") / "idx")
    # hot_df_copy low so the impact-ordered path runs quantized too
    build_index(spark, small_transcripts, root, n_shards=4, hot_df_copy=16)
    return root


def test_local_quantized_matches_bruteforce(quant_index,
                                            small_transcripts_pd):
    from geospatial_spark.plans.serve import LocalSearcher

    rows = list(zip(small_transcripts_pd["conv_id"],
                    small_transcripts_pd["turn_idx"],
                    small_transcripts_pd["text"]))
    s = LocalSearcher(quant_index)
    for q in QUERIES:
        want = _brute_quantized(rows, q, 10)
        got = s.search(q, 10, quantized=True)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, a), (_, b) in zip(got, want):
            assert math.isclose(a, b, rel_tol=1e-9), q


def test_spark_quantized_matches_local(spark, quant_index):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    ls = LocalSearcher(quant_index)
    ss = IndexSearcher(spark, quant_index)
    for q in ["deploy the spark job", "the", "w100 w200 w5"]:
        a = ls.search(q, 10, quantized=True)
        b = ss.search(q, 10, quantized=True)
        assert [d for d, _ in a] == [d for d, _ in b], q
        for (_, x), (_, y) in zip(a, b):
            assert math.isclose(x, y, rel_tol=1e-12)


def test_quantized_mode_is_not_a_noop(quant_index):
    """On a corpus with dl > 16, quantized scores must differ from
    exact scores for at least one query (else the flag is dead)."""
    from geospatial_spark.plans.serve import LocalSearcher

    s = LocalSearcher(quant_index)
    diffs = 0
    for q in ["deploy the spark job", "the", "spark"]:
        exact = dict(s.search(q, 10))
        quant = dict(s.search(q, 10, quantized=True))
        diffs += sum(1 for d in exact
                     if d in quant
                     and not math.isclose(exact[d], quant[d],
                                          rel_tol=1e-12))
    assert diffs > 0


def test_batched_quantized_matches_single(spark, quant_index):
    from geospatial_spark.plans.query import IndexSearcher

    s = IndexSearcher(spark, quant_index)
    qs = {"a": "deploy the spark job", "b": "the", "c": "w100 w200 w5"}
    batch = s.search_many(qs, 10, quantized=True)
    for qid, text in qs.items():
        single = s.search(text, 10, quantized=True)
        assert [d for d, _ in batch[qid]] == [d for d, _ in single], qid
        for (_, x), (_, y) in zip(batch[qid], single):
            assert math.isclose(x, y, rel_tol=1e-12)


def test_mixed_batch_quantized_entry(spark, quant_index):
    """A mixed batch may mark individual match entries quantized; other
    entries keep exact scoring."""
    from geospatial_spark.plans.query import IndexSearcher

    s = IndexSearcher(spark, quant_index)
    res = s.search_many_mixed({
        "mq": {"type": "match", "q": "deploy the spark", "quantized": True},
        "me": {"type": "match", "q": "deploy the spark"},
        "mp": {"type": "phrase", "q": "the spark"},
    }, 10)
    want_q = s.search("deploy the spark", 10, quantized=True)
    want_e = s.search("deploy the spark", 10)
    assert [d for d, _ in res["mq"]] == [d for d, _ in want_q]
    for (_, x), (_, y) in zip(res["mq"], want_q):
        assert math.isclose(x, y, rel_tol=1e-12)
    assert [d for d, _ in res["me"]] == [d for d, _ in want_e]
    for (_, x), (_, y) in zip(res["me"], want_e):
        assert math.isclose(x, y, rel_tol=1e-12)
