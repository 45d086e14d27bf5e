from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_spark.functions.codec import (
    BLOCK,
    decode_posting,
    delta_decode,
    delta_encode,
    encode_posting,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_basic():
    for vals in ([0], [1], [127], [128], [300], [2**32], [2**63], [0, 0, 0],
                 list(range(1000))):
        a = np.array(vals, dtype=np.uint64)
        assert list(varint_decode(varint_encode(a))) == vals


def test_varint_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert len(varint_decode(b"")) == 0


def test_varint_vs_manual():
    # 300 = 0b1_0010_1100 → LEB128: 0xAC 0x02
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([1], dtype=np.uint64)) == b"\x01"


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_property(vals):
    a = np.array(vals, dtype=np.uint64)
    assert list(varint_decode(varint_encode(a))) == vals


def _varint_encode_reference(values: np.ndarray) -> bytes:
    """Scalar LEB128 reference — pins the wire format the vectorized
    compressed-subset encode/decode pair must reproduce byte-for-byte."""
    out = bytearray()
    for v in values.tolist():
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def test_varint_compressed_subset_paths():
    # the encode/decode pair special-cases single-byte-only streams and
    # runs multi-byte bookkeeping on the compressed subset; exercise
    # every branch boundary against the scalar reference
    rng = np.random.default_rng(11)
    cases = [
        np.array([127] * 64, dtype=np.uint64),            # all single-byte
        np.array([128] * 64, dtype=np.uint64),            # all multi-byte
        np.array([127, 128] * 32, dtype=np.uint64),       # alternating
        np.array([2**64 - 1, 0, 2**63, 1], dtype=np.uint64),  # 10-byte max
        rng.integers(0, 128, 5000).astype(np.uint64),
        np.where(rng.random(5000) < 0.01,
                 rng.integers(0, 2**44, 5000),
                 rng.integers(0, 100, 5000)).astype(np.uint64),  # sparse big
        np.concatenate([np.full(100, 2**40, dtype=np.uint64),
                        np.zeros(100, dtype=np.uint64)]),  # runs of each
    ]
    for a in cases:
        buf = varint_encode(a)
        assert buf == _varint_encode_reference(a)
        assert list(varint_decode(buf)) == list(a)


def test_delta_roundtrip():
    v = np.array([3, 7, 8, 100, 101], dtype=np.uint64)
    assert list(delta_decode(delta_encode(v))) == list(v)


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=500))
def test_posting_roundtrip_property(docset):
    docs = np.array(sorted(docset), dtype=np.uint64)
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 50, size=len(docs)).astype(np.uint64)
    db, tb, bmax, blast = encode_posting(docs, tfs)
    d2, t2 = decode_posting(db, tb)
    assert list(d2) == list(docs)
    assert list(t2) == list(tfs)
    # block metadata invariants
    assert len(db) == len(tb) == len(bmax) == len(blast)
    assert len(db) == (len(docs) + BLOCK - 1) // BLOCK
    assert blast[-1] == int(docs[-1])
    for i in range(0, len(docs), BLOCK):
        assert bmax[i // BLOCK] == int(tfs[i : i + BLOCK].max())


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sets(st.integers(min_value=0, max_value=10**6),
                        min_size=1, max_size=400), min_size=1, max_size=8))
def test_bulk_encoder_byte_identical(term_docsets):
    """encode_shard_postings must emit the exact bytes of the per-term
    encode_posting path (same on-disk format)."""
    import numpy as np

    from geospatial_spark.functions.codec import (
        encode_posting,
        encode_shard_postings,
        varint_encode,
    )

    rng = np.random.default_rng(3)
    docs_l, tfs_l, dls_l, starts, ends = [], [], [], [], []
    pos = 0
    for ds in term_docsets:
        d = np.array(sorted(ds), dtype=np.uint64)
        docs_l.append(d)
        tfs_l.append(rng.integers(1, 30, size=len(d)).astype(np.uint64))
        dls_l.append(rng.integers(1, 500, size=len(d)).astype(np.uint64))
        starts.append(pos)
        pos += len(d)
        ends.append(pos)
    docs = np.concatenate(docs_l); tfs = np.concatenate(tfs_l); dls = np.concatenate(dls_l)
    out = encode_shard_postings(docs, tfs, dls,
                                np.array(starts, dtype=np.int64),
                                np.array(ends, dtype=np.int64))
    (db_l, tb_l, lb_l, bmax_l, bmin_l, blast_l, sky_tf_l, sky_dl_l,
     sky_off_l, pos_l) = out
    for i, (d, t, l) in enumerate(zip(docs_l, tfs_l, dls_l)):
        rdb, rtb, rbmax, rblast = encode_posting(d, t)
        assert db_l[i] == rdb
        assert tb_l[i] == rtb
        assert bmax_l[i] == rbmax
        assert blast_l[i] == rblast
        assert lb_l[i] == [varint_encode(l[j : j + BLOCK]) for j in range(0, len(l), BLOCK)]
        assert bmin_l[i] == [int(l[j : j + BLOCK].min()) for j in range(0, len(l), BLOCK)]
        # skyline gives the EXACT block max score for any bm25 params
        from geospatial_spark.functions.bm25 import term_score

        off = sky_off_l[i]
        stf, sdl = sky_tf_l[i], sky_dl_l[i]
        for b, j in enumerate(range(0, len(l), BLOCK)):
            bt, bl = t[j : j + BLOCK], l[j : j + BLOCK]
            exact = max(term_score(int(x), int(y), 37.3, 5, 1000)
                        for x, y in zip(bt, bl))
            sky = max(term_score(int(x), int(y), 37.3, 5, 1000)
                      for x, y in zip(stf[off[b]:off[b+1]], sdl[off[b]:off[b+1]]))
            assert abs(sky - exact) < 1e-12


def test_blocks_decode_independently():
    docs = np.arange(0, 1000, 3, dtype=np.uint64)
    tfs = (docs % 7 + 1).astype(np.uint64)
    db, tb, bmax, blast = encode_posting(docs, tfs)
    from geospatial_spark.functions.codec import decode_block

    # decode only block 2 using block 1's last doc — no earlier blocks
    d, t = decode_block(db[2], tb[2], blast[1])
    lo, hi = 2 * BLOCK, 3 * BLOCK
    assert list(d) == list(docs[lo:hi])
    assert list(t) == list(tfs[lo:hi])
