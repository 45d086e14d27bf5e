"""Posting-list codec: delta-gap + varint (LEB128), FOR blocks of 128
docs, per-block maxima for block-max WAND.

Reference analogue: the custom field indexers pack values into Lucene's
block-structured index trees (index/mapper/xyshape/XYShapeFieldMapper.java:38-45
packs 7-dim × 4-byte BKD blocks). We own the packing because Spark has
no Lucene: doc ordinals are delta-gapped then LEB128-varint encoded per
block; tfs are varint encoded per block (no gap — tfs are small).

All encode/decode paths are numpy-vectorized (no per-value Python in
the hot loop); exact integer math throughout — the reference's silent
double→float downcast (index/common/xyshape/XYShapeConverter.java:121-124)
is the cautionary tale: precision contracts here are explicit.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # docs per FOR block (Lucene's postings block size)


def varint_byte_lengths(v: np.ndarray) -> np.ndarray:
    """LEB128 byte count per value (1..10), vectorized."""
    counts = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        counts += tmp > 0
        tmp >>= np.uint64(7)
    return counts


def _varint_encode_offsets(values: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array, vectorized. Returns the encoded
    stream as a uint8 ARRAY plus the int64[n+1] exclusive byte offsets
    of each value — the bulk form the shard/merge encoders consume
    directly (no bytes() copy, no second cumsum pass over per-value
    lengths; both measurably matter at multi-million-posting kernels).

    Posting streams are dominated by values < 128 (tfs, dense doc gaps,
    position gaps), so the multi-byte bookkeeping runs on the COMPRESSED
    subset of multi-byte values only: one O(n) pass writes every value's
    first byte, then the continuation loop touches just the few large
    values (term-start absolutes, long documents). Byte-identical to the
    all-values loop it replaces."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    is_multi = v >= np.uint64(128)
    multi = np.flatnonzero(is_multi)
    off = np.empty(n + 1, dtype=np.int64)
    off[0] = 0
    if len(multi) == 0:
        # all single-byte: the encoded stream IS the value bytes
        return v.astype(np.uint8), np.arange(n + 1, dtype=np.int64)
    big = v[multi]
    counts = np.ones(n, dtype=np.int64)
    cm = np.ones(len(multi), dtype=np.int64)
    tmp = big >> np.uint64(7)
    while tmp.any():
        cm += tmp > 0
        tmp >>= np.uint64(7)
    counts[multi] = cm
    np.cumsum(counts, out=off[1:])
    del counts
    starts = off[:-1]
    out = np.empty(int(off[-1]), dtype=np.uint8)
    # first byte of every value, in one vectorized scatter
    out[starts] = (v & np.uint64(0x7F)).astype(np.uint8) | (
        is_multi.astype(np.uint8) << 7
    )
    # continuation bytes: multi-byte values only
    cur = big >> np.uint64(7)
    sm = starts[multi]
    remaining = np.arange(len(multi))
    offset = 1
    while len(remaining):
        idx = sm[remaining] + offset
        chunk = cur[remaining]
        more = (chunk >> np.uint64(7)) > 0
        out[idx] = (chunk & np.uint64(0x7F)).astype(np.uint8) | (
            more.astype(np.uint8) << 7
        )
        cur[remaining] >>= np.uint64(7)
        remaining = remaining[more]
        offset += 1
    return out, off


def varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array, vectorized; also returns the
    per-value byte lengths (so callers slicing the buffer don't pay a
    second length pass). Thin bytes-typed view over
    _varint_encode_offsets."""
    out, off = _varint_encode_offsets(values)
    return out.tobytes(), np.diff(off)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, vectorized."""
    return varint_encode_with_lengths(values)[0]


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte string to a uint64 array, vectorized.

    Mirror of the encode fast path: streams are dominated by single-byte
    values, so the first bytes of all values are gathered in one pass
    and only the (few) multi-byte values walk their continuation bytes —
    the old implementation's per-byte bookkeeping (repeat + shift +
    reduceat over every byte) cost ~6 full-array passes on the decode
    hot path of bulk serving reads and the merge's segment decode."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_cont = (b & 0x80) != 0
    if not is_cont.any():
        # all single-byte values (tf, dl, dense doc gaps are mostly
        # < 128): the byte stream IS the value stream
        return b.astype(np.uint64)
    # a value starts at byte 0 and after every non-continuation byte
    is_start = np.empty(len(b), dtype=bool)
    is_start[0] = True
    np.logical_not(is_cont[:-1], out=is_start[1:])
    starts = np.flatnonzero(is_start)
    out = (b[starts] & 0x7F).astype(np.uint64)
    multi = np.flatnonzero(is_cont[starts])
    if len(multi):
        pos = starts[multi] + 1
        shift = np.uint64(7)
        remaining = np.arange(len(multi))
        # iteration k folds in the k-th continuation byte of every value
        # still continuing — all values in `remaining` are aligned at
        # the same byte depth by construction
        while len(remaining):
            byte = b[pos[remaining]]
            out[multi[remaining]] |= (
                byte & np.uint64(0x7F)).astype(np.uint64) << shift
            more = (byte & 0x80) != 0
            remaining = remaining[more]
            pos[remaining] += 1
            shift += np.uint64(7)
    return out


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-increasing uint64 → first value + gaps-1? No: classic
    delta-gap: d[0]=v[0], d[i]=v[i]-v[i-1] (gaps ≥ 1 for unique docs)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if len(v) == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.uint64), dtype=np.uint64)


def encode_posting(doc_ords: np.ndarray, tfs: np.ndarray):
    """One term's full posting (doc ordinals strictly increasing) →
    (doc_blocks, tf_blocks, block_max_tf, block_last_doc).

    Blocks of BLOCK docs; doc ordinals delta-gapped within each block
    (gap base = previous block's last doc, so blocks decode
    independently — required for WAND block skipping).
    """
    assert len(doc_ords) == len(tfs)
    doc_ords = np.ascontiguousarray(doc_ords, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    doc_blocks, tf_blocks, bmax_tf, blast = [], [], [], []
    prev_last = np.uint64(0)
    first = True
    for i in range(0, len(doc_ords), BLOCK):
        d = doc_ords[i : i + BLOCK]
        t = tfs[i : i + BLOCK]
        gaps = delta_encode(d)
        if not first:
            gaps = gaps.copy()
            gaps[0] = d[0] - prev_last
        doc_blocks.append(varint_encode(gaps))
        tf_blocks.append(varint_encode(t))
        bmax_tf.append(int(t.max()))
        blast.append(int(d[-1]))
        prev_last = d[-1]
        first = False
    return doc_blocks, tf_blocks, bmax_tf, blast


def encode_shard_streams(docs: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                         term_starts: np.ndarray, term_ends: np.ndarray,
                         positions: np.ndarray | None = None,
                         run_tok_bounds: np.ndarray | None = None):
    """Bulk encoder, flat-buffer form: ONE varint pass per stream over
    the whole shard's posting stream (runs sorted by (term, doc)), with
    block/term structure expressed as OFFSET ARRAYS into the shared
    buffers — the zero-copy contract build-side Arrow assembly needs
    (no per-term python lists, no per-block byte slicing).

    Returns a dict:
      n_terms, total_blocks
      first_block   int64[n_terms+1]   — term t owns blocks
                                          [first_block[t], first_block[t+1])
      doc_buf/tf_buf/dl_buf  bytes     — whole-shard varint streams
      doc_bo/tf_bo/dl_bo  int64[total_blocks+1] — BYTE offset of each
                                          block boundary into the buffer
      pos_buf/pos_bo                   — same for positions (None when
                                          positions is None)
      bmax_tf/bmin_dl/blast  int64[total_blocks] — per-block metadata
      sky_tf/sky_dl  int64[total_sky]  — flattened per-block skylines
      sky_bo  int64[total_blocks+1]    — global skyline offsets per block

    positions (optional): per-TOKEN in-document positions, one value per
    occurrence, grouped by (term, doc) run — run i covers token indices
    [run_tok_bounds[i], run_tok_bounds[i+1]) and its positions are
    strictly ascending. Encoded as delta-gaps (first value of each run
    absolute), sliced on the SAME doc-block boundaries as the doc
    stream, so a phrase query decodes positions only for the blocks it
    touches (the Lucene .pos-file analogue — the reference's richer
    query relations, XYShapeQueryBuilder.java:62-71, map to
    phrase/proximity here).

    The skyline of a block is the set of (tf, dl) pairs not dominated by
    another pair (tf' ≥ tf and dl' ≤ dl): BM25 is monotone ↑tf ↓dl for
    any (k1, b, avgdl), so the EXACT block-max score is attained at a
    skyline point — a strictly tighter WAND bound than the decoupled
    (max_tf, min_dl) combination, at a few ints per block.
    """
    n = len(docs)
    if n == 0:
        empty = np.zeros(1, dtype=np.int64)
        return {
            "n_terms": 0, "total_blocks": 0, "first_block": empty,
            "doc_buf": b"", "tf_buf": b"", "dl_buf": b"",
            "doc_bo": empty, "tf_bo": empty, "dl_bo": empty,
            "pos_buf": b"" if positions is not None else None,
            "pos_bo": empty if positions is not None else None,
            "bmax_tf": empty[:0], "bmin_dl": empty[:0], "blast": empty[:0],
            "sky_tf": empty[:0], "sky_dl": empty[:0], "sky_bo": empty,
        }
    docs = np.ascontiguousarray(docs, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)

    # Encode-time contract guard: the skyline packs (tf, dl) into one
    # int64 and the positions stream packs (doc, pos) on a 22-bit pos
    # field — a pathological document breaching either would silently
    # corrupt block-max bounds (and hence WAND pruning). Fail LOUDLY at
    # build time, not at query time.
    if int(dls.max()) >= 2**22:
        raise ValueError(
            f"document length {int(dls.max())} exceeds the 2^22-token "
            "encoding contract — reject or truncate the document upstream")
    if int(tfs.max()) >= 2**22:
        raise ValueError(
            f"term frequency {int(tfs.max())} exceeds the 2^22 encoding "
            "contract")

    # gaps: diff everywhere; at each term start the gap is the absolute
    # doc ordinal (equivalently: blocks after the first still delta from
    # the previous element, which is the previous block's last doc — the
    # exact per-block semantics of encode_posting)
    gaps = np.empty(n, dtype=np.uint64)
    if n:
        gaps[1:] = docs[1:] - docs[:-1]
    gaps[term_starts] = docs[term_starts]

    doc_buf, doc_off = _varint_encode_offsets(gaps)
    del gaps
    tf_buf, tf_off = _varint_encode_offsets(tfs)
    dl_buf, dl_off = _varint_encode_offsets(dls)

    pos_off = None
    if positions is not None:
        pos = np.ascontiguousarray(positions, dtype=np.int64)
        rtb = np.ascontiguousarray(run_tok_bounds, dtype=np.int64)
        # delta within each run; run-start slots overwritten with the
        # absolute first position (cross-run diffs may be negative —
        # computed in int64, then replaced before the uint64 cast)
        pgaps = np.empty(len(pos), dtype=np.int64)
        if len(pos):
            pgaps[1:] = pos[1:] - pos[:-1]
        pgaps[rtb[:-1]] = pos[rtb[:-1]]
        pos_buf, pos_off = _varint_encode_offsets(pgaps.view(np.uint64))
        del pgaps

    # block starts: every BLOCK values within each term run (vectorized)
    run_lens = term_ends - term_starts
    nblocks_per_term = (run_lens + BLOCK - 1) // BLOCK
    total_blocks = int(nblocks_per_term.sum())
    # start index of each block = term_start + 128 * (block idx in term)
    block_term = np.repeat(np.arange(len(term_starts)), nblocks_per_term)
    first_block = np.concatenate(([0], np.cumsum(nblocks_per_term)[:-1]))
    block_in_term = np.arange(total_blocks) - first_block[block_term]
    bs = term_starts[block_term] + BLOCK * block_in_term
    be = np.minimum(bs + BLOCK, term_ends[block_term])  # exclusive ends

    bmax_tf = np.maximum.reduceat(tfs, bs).astype(np.int64)
    bmin_dl = np.minimum.reduceat(dls, bs).astype(np.int64)
    blast = docs[be - 1].astype(np.int64)

    # per-block (tf, dl) skyline: sort by (tf desc, dl asc), keep pairs
    # whose dl strictly undercuts the running minimum. Fully vectorized
    # across ALL blocks at once in FLAT form: lexsort the posting stream
    # block-major with a composite key packing (tf desc, dl asc) into
    # one int64, then run the per-block running-min keep test as a
    # segmented scan — packing the block id into the high bits makes
    # maximum.accumulate reset at every block boundary, so no python
    # loop and no dense (total_blocks × BLOCK) padding matrix. The
    # dense-matrix form this replaces allocated ~BLOCK/avg_block_len ×
    # the posting stream (hundreds of MB to GBs per merge kernel) and
    # its axis-1 sort over mostly-padding rows dominated encode time;
    # the flat form is O(n) memory and byte-identical (asserted against
    # the dense implementation on random + merge-shaped arrays).
    tfs_i = tfs.astype(np.int64)
    dls_i = dls.astype(np.int64)
    lens = be - bs
    row_of = np.repeat(np.arange(total_blocks, dtype=np.int64), lens)
    # tf, dl both < 2^31 (dl < 2^22 by the position-packing contract)
    key = ((np.int64(2**31 - 1) - tfs_i) << np.int64(32)) | dls_i
    del tfs_i, dls_i
    order_sky = np.lexsort((key, row_of))
    ks = key[order_sky]
    del key, order_sky
    sd = ks & np.int64(0xFFFFFFFF)
    # segmented running min of sd: maximum.accumulate over
    # (block << 32) | ~sd restarts at each block because any packed
    # value of block b+1 exceeds every packed value of block b
    acc = np.maximum.accumulate(
        (row_of << np.int64(32)) | (np.int64(0xFFFFFFFF) - sd))
    del row_of
    keep = np.empty(n, dtype=bool)
    keep[0] = True
    keep[1:] = sd[1:] < (np.int64(0xFFFFFFFF)
                         - (acc[:-1] & np.int64(0xFFFFFFFF)))
    del acc
    keep[bs] = True  # first element of every block is always kept
    sky_tf_flat = (np.int64(2**31 - 1) - (ks >> np.int64(32)))[keep]
    sky_dl_flat = sd[keep]
    sky_counts = np.add.reduceat(keep.astype(np.int64), bs)

    # blocks tile the posting stream contiguously (be[j] == bs[j+1]), so
    # block byte boundaries are just the stream offsets sampled at block
    # starts — no slicing, no copies
    bs_ext = np.concatenate((bs, [n]))
    return {
        "n_terms": len(term_starts),
        "total_blocks": total_blocks,
        "first_block": np.concatenate((first_block,
                                       [total_blocks])).astype(np.int64),
        "doc_buf": doc_buf, "tf_buf": tf_buf, "dl_buf": dl_buf,
        "doc_bo": doc_off[bs_ext], "tf_bo": tf_off[bs_ext],
        "dl_bo": dl_off[bs_ext],
        "pos_buf": pos_buf if positions is not None else None,
        "pos_bo": pos_off[rtb[bs_ext]] if positions is not None else None,
        "bmax_tf": bmax_tf, "bmin_dl": bmin_dl, "blast": blast,
        "sky_tf": sky_tf_flat,
        "sky_dl": sky_dl_flat,
        "sky_bo": np.concatenate(([0], np.cumsum(sky_counts))),
    }


def encode_shard_postings(docs: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                          term_starts: np.ndarray, term_ends: np.ndarray,
                          positions: np.ndarray | None = None,
                          run_tok_bounds: np.ndarray | None = None):
    """Per-term list view over encode_shard_streams (kept for tests and
    tooling — the build path consumes the flat-buffer form directly).
    Byte-identical to the historical per-term encode_posting output.

    Returns, per term i (aligned with term_starts):
      doc_blocks[i], tf_blocks[i], dl_blocks[i]  — lists of bytes
      block_max_tf[i], block_min_dl[i], block_last_doc[i] — lists of int
      sky_tf[i], sky_dl[i] — flattened skyline (tf, dl) pairs per block
      sky_off[i] — offsets into the flattened skyline, len nblocks+1
      pos_blocks[i] — lists of bytes (or None when positions is None)
    """
    st = encode_shard_streams(docs, tfs, dls, term_starts, term_ends,
                              positions, run_tok_bounds)
    nt = st["n_terms"]
    if nt == 0:
        return [], [], [], [], [], [], [], [], [], ([] if positions is not None else None)
    fb = st["first_block"]
    mv = {k: memoryview(st[k]) for k in ("doc_buf", "tf_buf", "dl_buf")}
    if st["pos_buf"] is not None:
        mv["pos_buf"] = memoryview(st["pos_buf"])
    out = {k: [] for k in ("doc", "tf", "dl", "pos", "bmax", "bmin",
                           "blast", "sky_tf", "sky_dl", "sky_off")}
    for t in range(nt):
        b0, b1 = int(fb[t]), int(fb[t + 1])
        for key, buf, bo in (("doc", "doc_buf", "doc_bo"),
                             ("tf", "tf_buf", "tf_bo"),
                             ("dl", "dl_buf", "dl_bo")):
            off = st[bo]
            out[key].append([bytes(mv[buf][off[j]: off[j + 1]])
                             for j in range(b0, b1)])
        if st["pos_buf"] is not None:
            off = st["pos_bo"]
            out["pos"].append([bytes(mv["pos_buf"][off[j]: off[j + 1]])
                               for j in range(b0, b1)])
        out["bmax"].append(st["bmax_tf"][b0:b1].tolist())
        out["bmin"].append(st["bmin_dl"][b0:b1].tolist())
        out["blast"].append(st["blast"][b0:b1].tolist())
        sb = st["sky_bo"]
        base = int(sb[b0])
        out["sky_tf"].append(st["sky_tf"][base: int(sb[b1])].tolist())
        out["sky_dl"].append(st["sky_dl"][base: int(sb[b1])].tolist())
        out["sky_off"].append([int(sb[j]) - base for j in range(b0, b1 + 1)])
    return (out["doc"], out["tf"], out["dl"], out["bmax"], out["bmin"],
            out["blast"], out["sky_tf"], out["sky_dl"], out["sky_off"],
            out["pos"] if st["pos_buf"] is not None else None)


def decode_positions_stream(pos_bytes: bytes, tfs: np.ndarray) -> np.ndarray:
    """Concatenated position blocks → flat absolute positions, aligned
    token-for-token with the posting stream whose per-posting tfs are
    given (tfs must cover exactly the decoded blocks' postings).
    Positions are delta-gapped per (term, doc) run with the first value
    of each run absolute, so a contiguous run of blocks decodes
    independently of its predecessors."""
    gaps = varint_decode(pos_bytes).astype(np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    if len(gaps) == 0:
        return gaps
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    cs = np.cumsum(gaps)
    seg_off = cs[starts] - gaps[starts]
    return cs - np.repeat(seg_off, tfs)


def _block_skyline(btf: np.ndarray, bdl: np.ndarray):
    """(tf, dl) skyline of one block: pairs not dominated by another
    (tf' ≥ tf and dl' ≤ dl). BM25 is monotone ↑tf ↓dl, so the EXACT
    block-max score for ANY (k1, b, avgdl) is attained at a skyline
    point."""
    order = np.lexsort((bdl, -btf))
    sd = bdl[order]
    rm = np.minimum.accumulate(sd)
    keep = np.empty(len(sd), dtype=bool)
    keep[0] = True
    keep[1:] = sd[1:] < rm[:-1]
    return btf[order][keep], sd[keep]


def encode_impact_posting(local_docs: np.ndarray, tfs: np.ndarray,
                          dls: np.ndarray, avgdl_local: float,
                          k1: float = 1.2, b: float = 0.75):
    """Impact-ordered copy of one hot term's posting list.

    Postings sort by descending BM25 tf-saturation key
    tf/(tf + k1·(1−b + b·dl/avgdl_local)) with doc asc tie-break (the
    idf factor is per-term constant, so this IS impact order for the
    build-time avgdl; query-time avgdl drift is handled by the reader,
    which orders blocks by their EXACT query-time skyline bound, never
    by stored position). Blocks of BLOCK postings; docs are LOCAL
    indices, re-sorted ascending WITHIN each block and delta-encoded
    (first value absolute) — block membership, not intra-block order,
    is what the bounds constrain.

    Returns (doc_blocks, tf_blocks, dl_blocks, sky_tf, sky_dl, sky_off)
    with the same skyline layout as encode_shard_postings.
    """
    n = len(local_docs)
    if n == 0:
        return [], [], [], [], [], [0]
    ld = np.ascontiguousarray(local_docs, dtype=np.int64)
    tf = np.ascontiguousarray(tfs, dtype=np.int64)
    dl = np.ascontiguousarray(dls, dtype=np.int64)
    tff = tf.astype(np.float64)
    key = tff / (tff + k1 * (1.0 - b + b * dl.astype(np.float64) / max(avgdl_local, 1e-9)))
    order = np.lexsort((ld, -key))
    ld, tf, dl = ld[order], tf[order], dl[order]

    # re-sort docs ascending WITHIN each impact block in one pass
    # (block-major lexsort), then ONE varint pass per stream with
    # per-block byte slicing — byte-identical to per-block encodes but
    # without thousands of small-array varint calls (the measured hot
    # spot: numpy per-call overhead dominated sub-128-value encodes)
    block_ids = np.arange(n, dtype=np.int64) // BLOCK
    o2 = np.lexsort((ld, block_ids))
    ld, tf, dl = ld[o2], tf[o2], dl[o2]
    bstarts = np.arange(0, n, BLOCK, dtype=np.int64)
    gaps = np.empty(n, dtype=np.int64)
    if n > 1:
        gaps[1:] = ld[1:] - ld[:-1]
    gaps[bstarts] = ld[bstarts]  # first value of each block absolute

    doc_buf, doc_lens = varint_encode_with_lengths(gaps.astype(np.uint64))
    tf_buf, tf_lens = varint_encode_with_lengths(tf.astype(np.uint64))
    dl_buf, dl_lens = varint_encode_with_lengths(dl.astype(np.uint64))
    doc_off = np.concatenate(([0], np.cumsum(doc_lens)))
    tf_off = np.concatenate(([0], np.cumsum(tf_lens)))
    dl_off = np.concatenate(([0], np.cumsum(dl_lens)))
    bends = np.minimum(bstarts + BLOCK, n)
    mv_doc, mv_tf, mv_dl = memoryview(doc_buf), memoryview(tf_buf), memoryview(dl_buf)

    doc_blocks, tf_blocks, dl_blocks = [], [], []
    sky_tf: list[int] = []
    sky_dl: list[int] = []
    sky_off = [0]
    for s, e in zip(bstarts, bends):
        doc_blocks.append(bytes(mv_doc[doc_off[s]: doc_off[e]]))
        tf_blocks.append(bytes(mv_tf[tf_off[s]: tf_off[e]]))
        dl_blocks.append(bytes(mv_dl[dl_off[s]: dl_off[e]]))
        s_tf, s_dl = _block_skyline(tf[s:e], dl[s:e])
        sky_tf.extend(int(x) for x in s_tf)
        sky_dl.extend(int(x) for x in s_dl)
        sky_off.append(len(sky_tf))
    return doc_blocks, tf_blocks, dl_blocks, sky_tf, sky_dl, sky_off


def decode_impact_block(doc_block: bytes, tf_block: bytes, dl_block: bytes):
    """One impact block → (local_doc_idx, tfs, dls). Docs are ascending
    within the block, first value absolute."""
    gaps = varint_decode(doc_block)
    docs = delta_decode(gaps).astype(np.int64)
    return docs, varint_decode(tf_block), varint_decode(dl_block)


def decode_block(doc_block: bytes, tf_block: bytes, prev_last: int):
    """One block → (doc_ords, tfs). prev_last = last doc of the previous
    block (0 for the first block)."""
    gaps = varint_decode(doc_block)
    if len(gaps):
        gaps = gaps.copy()
        gaps[0] += np.uint64(prev_last)
    docs = delta_decode(gaps)
    tfs = varint_decode(tf_block)
    return docs, tfs


def decode_posting(doc_blocks, tf_blocks):
    """All blocks → (doc_ords, tfs)."""
    docs_all, tfs_all = [], []
    prev_last = 0
    for db, tb in zip(doc_blocks, tf_blocks):
        docs, tfs = decode_block(bytes(db), bytes(tb), prev_last)
        if len(docs) == 0:
            continue
        docs_all.append(docs)
        tfs_all.append(tfs)
        prev_last = int(docs[-1])
    if not docs_all:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    return np.concatenate(docs_all), np.concatenate(tfs_all)
