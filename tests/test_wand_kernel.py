"""Kernel-level regression tests for the WAND hot-term reader.

Regression (round-3 advice, high): _decode_impact_chunk sized blocks
from the AVAILABLE block count instead of the term's TOTAL block count.
For a LocalSearcher light row whose impact stream exceeds
IMPACT_HEAD_BLOCKS, a discovery chunk touching the last head block but
no tail block mis-sized that block as the stream's final partial block
and crashed the decode (ValueError broadcast (128,) vs (N,)).
"""

import copy

import numpy as np
import pytest

from geospatial_spark.functions.bm25 import idf
from geospatial_spark.functions.codec import (
    BLOCK,
    encode_impact_posting,
    encode_shard_postings,
)
from geospatial_spark.operators.wand import _HotTerm, wand_shard
from geospatial_spark.plans.build import IMPACT_HEAD_BLOCKS


def _synth_posting(df: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    docs = np.sort(rng.choice(df * 3, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, size=df).astype(np.int64)
    dls = rng.integers(5, 200, size=df).astype(np.int64)
    return docs, tfs, dls


def _make_rows(df: int, avgdl: float):
    """One hot term's full segment row (eager) from synthetic postings."""
    docs, tfs, dls = _synth_posting(df)
    starts = np.array([0], dtype=np.int64)
    ends = np.array([df], dtype=np.int64)
    (doc_b, tf_b, dl_b, bmax, bmin, blast,
     sky_tf, sky_dl, sky_off, _pos) = encode_shard_postings(
        docs, tfs, dls, starts, ends)
    idb, itb, ilb, is_tf, is_dl, is_off = encode_impact_posting(
        docs, tfs, dls, avgdl)
    H = IMPACT_HEAD_BLOCKS
    eager = {
        "term": "hot", "df": df,
        "doc_blocks": doc_b[0], "tf_blocks": tf_b[0], "dl_blocks": dl_b[0],
        "block_max_tf": bmax[0], "block_min_dl": bmin[0],
        "block_last_doc": blast[0],
        "sky_tf": sky_tf[0], "sky_dl": sky_dl[0], "sky_off": sky_off[0],
        "imp_head_doc_blocks": idb[:H], "imp_head_tf_blocks": itb[:H],
        "imp_head_dl_blocks": ilb[:H],
        "imp_tail_doc_blocks": idb[H:], "imp_tail_tf_blocks": itb[H:],
        "imp_tail_dl_blocks": ilb[H:],
        "imp_sky_tf": is_tf, "imp_sky_dl": is_dl, "imp_sky_off": is_off,
    }
    return docs, tfs, dls, eager


def _to_light(eager: dict):
    """The serving reader's light form: metadata + imp_head only, with a
    call-counting _fetch_heavy that supplies everything else."""
    heavy_keys = ("doc_blocks", "tf_blocks", "dl_blocks",
                  "imp_tail_doc_blocks", "imp_tail_tf_blocks",
                  "imp_tail_dl_blocks")
    light = {k: v for k, v in eager.items() if k not in heavy_keys}
    calls = []

    def fetch():
        calls.append(1)
        return {k: eager[k] for k in heavy_keys}

    light["_fetch_heavy"] = fetch
    return light, calls


DF_LONG = IMPACT_HEAD_BLOCKS * BLOCK + BLOCK // 2  # head full + half tail block


def test_light_row_head_boundary_block_decodes_full():
    """Decoding the LAST head block of a longer stream must treat it as
    a FULL block (the partial block is the stream's true final block),
    and must not trigger a tail fetch."""
    avgdl = 100.0
    docs, tfs, dls, eager = _make_rows(DF_LONG, avgdl)
    light, calls = _to_light(eager)
    bounds = np.ones(len(eager["imp_sky_off"]) - 1)
    h = _HotTerm(light, 1.0, bounds, k=10)

    last_head = IMPACT_HEAD_BLOCKS - 1
    d, t, l = h.decode(np.array([last_head], dtype=np.int64))
    assert len(d) == BLOCK and len(t) == BLOCK and len(l) == BLOCK
    assert not calls, "decoding a head-resident block must not fetch the tail"
    # the decoded docs are real postings of this term
    assert np.isin(d, docs).all()

    # a block past the head triggers exactly one fetch and decodes the
    # stream's true final partial block at its partial length
    d2, t2, _ = h.decode(np.array([IMPACT_HEAD_BLOCKS], dtype=np.int64))
    assert calls == [1]
    assert len(d2) == DF_LONG - IMPACT_HEAD_BLOCKS * BLOCK
    assert np.isin(d2, docs).all()


def test_wand_shard_light_vs_eager_parity():
    """Full shard scoring parity: a light row (head-only + lazy fetch)
    must produce byte-identical top-k to the eager row."""
    avgdl = 100.0
    df = DF_LONG
    _, _, _, eager = _make_rows(df, avgdl)
    n_local = df * 3 + 1
    df_global = {"hot": df}
    n_docs = n_local

    k = 10
    top_e, sc_e = wand_shard([copy.deepcopy(eager)], n_local, 0,
                             df_global, n_docs, avgdl, k)
    light, _calls = _to_light(eager)
    top_l, sc_l = wand_shard([light], n_local, 0, df_global, n_docs,
                             avgdl, k)
    np.testing.assert_array_equal(top_e, top_l)
    np.testing.assert_allclose(sc_e, sc_l, rtol=0, atol=0)


def test_encode_rejects_oversized_doc():
    """Build-time contract guard: dl >= 2^22 must fail loudly at encode,
    not corrupt skyline bounds silently."""
    from geospatial_spark.functions.codec import encode_shard_streams

    docs = np.array([0, 1], dtype=np.int64)
    tfs = np.array([1, 1], dtype=np.int64)
    dls = np.array([10, 2**22], dtype=np.int64)
    with pytest.raises(ValueError, match="2\\^22"):
        encode_shard_streams(docs, tfs, dls,
                             np.array([0], dtype=np.int64),
                             np.array([2], dtype=np.int64))


def test_v3_tier_units_light_vs_eager_parity():
    """Format v3: head per-block skylines + geometric tail tiers. A
    light row carrying ONLY head + tier metadata must score identically
    to an eager row, including when discovery must enter a tail tier
    (forced by tiny k over a uniform posting so bounds tie)."""
    from geospatial_spark.plans.build import _tier_summaries

    avgdl = 100.0
    df = IMPACT_HEAD_BLOCKS * BLOCK * 4  # 64 blocks: head + 2 tiers
    docs, tfs, dls = _synth_posting(df, seed=11)
    starts = np.array([0], dtype=np.int64)
    ends = np.array([df], dtype=np.int64)
    (doc_b, tf_b, dl_b, bmax, bmin, blast,
     sky_tf, sky_dl, sky_off, _pos) = encode_shard_postings(
        docs, tfs, dls, starts, ends)
    idb, itb, ilb, is_tf, is_dl, is_off = encode_impact_posting(
        docs, tfs, dls, avgdl)
    H = IMPACT_HEAD_BLOCKS
    h_end = min(H, len(is_off) - 1)
    tends, ttf, tdl, toff = _tier_summaries(is_tf, is_dl, is_off, H)
    assert len(tends) == 2  # widths 16 then 32 cover the 48 tail blocks

    row = {
        "term": "hot", "df": df,
        "doc_blocks": doc_b[0], "tf_blocks": tf_b[0], "dl_blocks": dl_b[0],
        "block_max_tf": bmax[0], "block_min_dl": bmin[0],
        "block_last_doc": blast[0],
        "sky_tf": sky_tf[0], "sky_dl": sky_dl[0], "sky_off": sky_off[0],
        "imp_head_doc_blocks": idb[:H], "imp_head_tf_blocks": itb[:H],
        "imp_head_dl_blocks": ilb[:H],
        "imp_tail_doc_blocks": idb[H:], "imp_tail_tf_blocks": itb[H:],
        "imp_tail_dl_blocks": ilb[H:],
        "imp_sky_tf": is_tf[:is_off[h_end]],
        "imp_sky_dl": is_dl[:is_off[h_end]],
        "imp_sky_off": is_off[:h_end + 1],
        "imp_tier_ends": tends, "imp_tier_sky_tf": ttf,
        "imp_tier_sky_dl": tdl, "imp_tier_sky_off": toff,
    }
    n_local = df * 3 + 1
    dfg = {"hot": df}

    for k in (10, 3000):  # small k (head only) and k forcing the tail
        top_e, sc_e = wand_shard([copy.deepcopy(row)], n_local, 0, dfg,
                                 n_local, avgdl, k)
        light, calls = _to_light(row)
        light["imp_sky_tf"] = row["imp_sky_tf"]
        light["imp_sky_dl"] = row["imp_sky_dl"]
        light["imp_sky_off"] = row["imp_sky_off"]
        top_l, sc_l = wand_shard([light], n_local, 0, dfg, n_local,
                                 avgdl, k)
        np.testing.assert_array_equal(top_e, top_l)
        np.testing.assert_allclose(sc_e, sc_l, rtol=0, atol=0)
        if k == 3000:
            assert calls, "k past the head must have fetched the tail"


def test_bulk_multi_hot_equals_discovery():
    """The saturated-multi-hot BULK path must be rank- and
    score-identical to the incremental discovery path on the same rows
    (several synthetic seeds, two hot terms, overlapping docs) — the
    cutover is a performance choice, never a semantics one."""
    import copy

    import geospatial_spark.operators.wand as W

    avgdl = 100.0
    for seed in (1, 2, 3, 11):
        rows = []
        dfg = {}
        n_local = DF_LONG * 3
        for i, term in enumerate(("hotA", "hotB")):
            docs, tfs, dls = _synth_posting(DF_LONG, seed=seed + i * 100)
            starts = np.array([0], dtype=np.int64)
            ends = np.array([DF_LONG], dtype=np.int64)
            (doc_b, tf_b, dl_b, bmax, bmin, blast,
             sky_tf, sky_dl, sky_off, _pos) = encode_shard_postings(
                docs, tfs, dls, starts, ends)
            idb, itb, ilb, is_tf, is_dl, is_off = encode_impact_posting(
                docs, tfs, dls, avgdl)
            H = IMPACT_HEAD_BLOCKS
            rows.append({
                "term": term, "df": DF_LONG,
                "doc_blocks": doc_b[0], "tf_blocks": tf_b[0],
                "dl_blocks": dl_b[0], "block_max_tf": bmax[0],
                "block_min_dl": bmin[0], "block_last_doc": blast[0],
                "sky_tf": sky_tf[0], "sky_dl": sky_dl[0],
                "sky_off": sky_off[0],
                "imp_head_doc_blocks": idb[:H],
                "imp_head_tf_blocks": itb[:H],
                "imp_head_dl_blocks": ilb[:H],
                "imp_tail_doc_blocks": idb[H:],
                "imp_tail_tf_blocks": itb[H:],
                "imp_tail_dl_blocks": ilb[H:],
                "imp_sky_tf": is_tf, "imp_sky_dl": is_dl,
                "imp_sky_off": is_off,
            })
            dfg[term] = DF_LONG * 4  # global df > local
        # doc ids are drawn from [0, 3·DF_LONG); Σdf = 2·DF_LONG, so
        # shift 10 (threshold n>>10 ≈ 6) forces BULK and shift 0
        # (threshold n ≈ 3·DF_LONG > Σdf) forces DISCOVERY
        orig = W.BULK_HOT_DENSITY_SHIFT
        try:
            W.BULK_HOT_DENSITY_SHIFT = 10  # forced bulk
            top_b, sc_b = wand_shard(
                [copy.deepcopy(r) for r in rows], n_local, 0,
                dfg, DF_LONG * 8, avgdl, 10)
            W.BULK_HOT_DENSITY_SHIFT = 0   # forced discovery
            top_d, sc_d = wand_shard(
                [copy.deepcopy(r) for r in rows], n_local, 0,
                dfg, DF_LONG * 8, avgdl, 10)
        finally:
            W.BULK_HOT_DENSITY_SHIFT = orig
        assert top_b.tolist() == top_d.tolist(), seed
        np.testing.assert_allclose(sc_b, sc_d, rtol=1e-12)
