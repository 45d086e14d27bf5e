"""Block-max WAND top-k scorer — the engine's central query operator.

Reference analogue: per-shard collect + coordinator reduce of the grid
aggregation (SURVEY.md §2.6 T2; GeoHexGridAggregatorFactory.java:92-128
collects per shard, core reduces). Each shard runs a vectorized
block-max scorer over its compressed segments and returns its local
top-k; the driver k-way merges.

Two physical strategies per term, chosen by what the segment stores —
the cost-based index-vs-docvalues choice of the reference
(index/query/xypoint/XYPointQueryVisitor.java:111-138):

COLD terms (doc-ordered blocks only): classic block-max WAND. Process
terms in descending whole-posting upper-bound order with a running
threshold θ = the k-th largest partial score (a valid lower bound of
the final k-th score — scores only grow). Block B of term i is skipped
iff   max_partial(B) + ub_i(B) + Σ_{j>i} ub_j + Σ_hot ub_h  <  θ
(hot terms are processed AFTER cold ones, so their total upper bound
must ride in the remainder — otherwise a cold skip could understate a
doc the hot phase later promotes into the top-k). Upper bounds are
EXACT per block: BM25's block max is attained at a stored (tf, dl)
skyline point.

HOT terms (terms with an impact-ordered posting copy, built for
shard-local df ≥ build.HOT_DF_COPY): saturated terms defeat block-max
pruning — tf/(tf+norm) → 1 makes every doc-ordered block's bound ≈ idf,
so WAND decodes the whole posting (linear in df; the round-1
scale-killer). Instead:

  discovery — decode the term's impact blocks in descending EXACT
  query-time bound order (bounds from per-impact-block skylines, so
  build-time avgdl drift cannot break monotonicity), chunked, refreshing
  θ between chunks; stop when the residual frontier R = Σ_t (best
  undecoded block bound of t) drops below θ AND the candidate set
  {d : scores[d] + R ≥ θ} is small.

  completion — candidates may still hold unseen postings of a
  truncated hot term; look each candidate up in that term's DOC-ordered
  blocks (binary search block_last_doc, decode only the touched
  blocks) and add the exact contribution. Docs outside the candidate
  set satisfy final(d) ≤ scores[d] + R < θ ≤ final k-th score, so they
  can never enter the top-k — the returned top-k scores are EXACT.

Ties at exactly θ are never dropped (candidate test is ≥ with a 1e-12
slack on the safe side), preserving the (conv_id, turn_idx) tie-break.
All arithmetic is numpy-vectorized (bulk varint decode, scatter-add,
reduceat partial maxima).
"""

from __future__ import annotations

import numpy as np

from geospatial_spark.functions.bm25 import B, K1, idf

from geospatial_spark.functions.codec import BLOCK as BLOCK_N

# θ-refresh cadence for the chunked bulk decode (blocks per chunk)
CHUNK_BLOCKS = 64
# discovery stops early only once this few docs can still reach θ
CAND_CAP = 1024
# multi-hot bulk cutover: ≥2 hot terms jointly covering ≥ n >> SHIFT of
# the shard take the bulk-scoring path (tests pin bulk ≡ discovery by
# overriding this)
BULK_HOT_DENSITY_SHIFT = 2
# float slack applied on the keep-it side of every θ comparison
EPS = 1e-12


def _as_bytes(x) -> bytes:
    """Block cell → bytes. Accepts plain bytes (Spark/pandas rows) or a
    pyarrow BinaryScalar (zero-copy serving rows)."""
    return x.as_py() if hasattr(x, "as_py") else bytes(x)


def _qdl(dls, quantize: bool):
    """dl array → scoring dl array. Quantized mode runs the SAME kernel
    with log-quantized doc lengths (functions/bm25.quantize_dl); the
    quantizer is monotone non-decreasing, so block min-dl and skyline
    (tf, dl) pareto sets quantize in place and every bound stays an
    exact upper bound for quantized scoring."""
    if not quantize:
        return dls
    from geospatial_spark.functions.bm25 import quantize_dl_np

    return quantize_dl_np(dls)


def _block_ubs(idf_t: float, bmax_tf: np.ndarray, bmin_dl: np.ndarray,
               avgdl: float, quantize: bool = False) -> np.ndarray:
    tf = bmax_tf.astype(np.float64)
    dl = _qdl(bmin_dl, quantize).astype(np.float64)
    norm = K1 * (1.0 - B + B * (dl / avgdl))
    return idf_t * (tf / (tf + norm))


def _block_ubs_skyline(idf_t: float, sky_tf, sky_dl, sky_off,
                       avgdl: float,
                       quantize: bool = False) -> np.ndarray | None:
    """EXACT per-block max score from stored (tf, dl) skyline pairs —
    BM25's block max is attained at a skyline point. Returns None if the
    segment row predates the skyline format."""
    if sky_off is None or len(sky_off) < 2:
        return None
    tf = np.asarray(sky_tf, dtype=np.float64)
    dl = _qdl(np.asarray(sky_dl, dtype=np.int64),
              quantize).astype(np.float64)
    if len(tf) == 0:
        return None
    s = idf_t * (tf / (tf + K1 * (1.0 - B + B * (dl / avgdl))))
    off = np.asarray(sky_off, dtype=np.int64)
    return np.maximum.reduceat(s, off[:-1])


def _contrib(idf_t: float, tfs: np.ndarray, dls: np.ndarray,
             avgdl: float, quantize: bool = False) -> np.ndarray:
    tff = tfs.astype(np.float64)
    dlf = _qdl(dls, quantize).astype(np.float64)
    return idf_t * (tff / (tff + K1 * (1.0 - B + B * (dlf / avgdl))))


def _block_lens(df_local: int, nblocks: int) -> np.ndarray:
    lens = np.full(nblocks, BLOCK_N, dtype=np.int64)
    lens[-1] = df_local - BLOCK_N * (nblocks - 1)
    return lens


def _has_impact_copy(r: dict) -> bool:
    off = r.get("imp_sky_off")
    return (off is not None and len(off) >= 2
            and r.get("imp_head_doc_blocks") is not None
            and len(r["imp_head_doc_blocks"]) > 0)


def _decode_impact_chunk(db, tb, lb, df_local: int, kept_idx: np.ndarray):
    """Bulk-decode the given impact blocks of one term →
    (local_docs, tfs, dls). Impact blocks are self-contained: docs are
    ascending LOCAL indices within each block, first value absolute.

    Block lengths MUST come from the term's TOTAL block count (every
    non-final block is full by construction), never from len(db): a
    LocalSearcher light row may hold only the IMPACT_HEAD_BLOCKS-prefix
    of a longer stream, and sizing the head's last block as if it were
    the stream's final partial block corrupts the decode."""
    from geospatial_spark.functions.codec import varint_decode

    total_blocks = -(-df_local // BLOCK_N)
    lens = _block_lens(df_local, total_blocks)[kept_idx]
    gaps = varint_decode(b"".join(_as_bytes(db[i]) for i in kept_idx)).astype(np.int64)
    tfs = varint_decode(b"".join(_as_bytes(tb[i]) for i in kept_idx))
    dls = varint_decode(b"".join(_as_bytes(lb[i]) for i in kept_idx))
    starts_flat = np.concatenate(([0], np.cumsum(lens)[:-1]))
    cs = np.cumsum(gaps)
    seg_off = cs[starts_flat] - gaps[starts_flat]
    docs = cs - np.repeat(seg_off, lens)
    return docs, tfs, dls


def _full_impact_streams(r: dict):
    """A term's COMPLETE impact streams (head + tail), fetching the
    heavy tail once for serving light rows — the bulk-scoring path's
    input. Returns (doc_cells, tf_cells, dl_cells, total_blocks)."""
    def lst(key):
        v = r.get(key)
        return list(v) if v is not None else []

    total_blocks = -(-int(r["df"]) // BLOCK_N)
    db = lst("imp_head_doc_blocks") + lst("imp_tail_doc_blocks")
    if len(db) < total_blocks:
        fetch = r.get("_fetch_heavy")
        if fetch is None:
            raise KeyError(
                f"impact stream of {r.get('term')!r} incomplete "
                f"({len(db)}/{total_blocks} blocks) and no _fetch_heavy")
        r.update(fetch())
        r["_fetch_heavy"] = None
        db = lst("imp_head_doc_blocks") + lst("imp_tail_doc_blocks")
    tb = lst("imp_head_tf_blocks") + lst("imp_tail_tf_blocks")
    lb = lst("imp_head_dl_blocks") + lst("imp_tail_dl_blocks")
    return db, tb, lb, total_blocks


def _decode_doc_blocks(r: dict, kept_idx: np.ndarray, base_ord: int):
    """Bulk-decode the given DOC-ordered blocks of one term →
    (local_docs, tfs, dls), using block_last_doc metadata to make each
    kept block's leading gap absolute even when its predecessor was not
    decoded."""
    from geospatial_spark.functions.codec import varint_decode

    blast = np.asarray(r["block_last_doc"], dtype=np.int64)
    db, tb, lb = r["doc_blocks"], r["tf_blocks"], r["dl_blocks"]
    df_local = int(r["df"])
    lens = _block_lens(df_local, -(-df_local // BLOCK_N))[kept_idx]
    gaps = varint_decode(b"".join(_as_bytes(db[i]) for i in kept_idx)).astype(np.int64)
    tfs = varint_decode(b"".join(_as_bytes(tb[i]) for i in kept_idx))
    dls = varint_decode(b"".join(_as_bytes(lb[i]) for i in kept_idx))
    starts_flat = np.concatenate(([0], np.cumsum(lens)[:-1]))
    prev_last = np.where(kept_idx > 0, blast[kept_idx - 1], 0)
    gaps[starts_flat] += prev_last
    cs = np.cumsum(gaps)
    seg_off = cs[starts_flat] - gaps[starts_flat]
    docs = cs - np.repeat(seg_off, lens)
    return docs - base_ord, tfs, dls


class _HotTerm:
    __slots__ = ("r", "idf_t", "groups", "ptr", "seen", "chunk",
                 "_imp", "_n_avail")

    def __init__(self, r: dict, idf_t: float, bounds: np.ndarray, k: int,
                 avgdl: float = 0.0, quantize: bool = False):
        self.r = r
        self.idf_t = idf_t
        # discovery UNITS, processed in descending query-time bound
        # order: v3 rows bound the head's blocks individually and the
        # tail in geometric TIERS (each an exact union-skyline bound —
        # O(head + log df) metadata); a tier decodes whole, so the
        # doubling bounds decode amplification at 2×. v2 rows (no tier
        # columns) fall back to one unit per block.
        units: list[tuple[float, np.ndarray]] = [
            (float(bounds[i]), np.array([i], dtype=np.int64))
            for i in range(len(bounds))]
        tends = r.get("imp_tier_ends")
        if tends is not None and len(tends) > 0:
            tb = _block_ubs_skyline(idf_t, r["imp_tier_sky_tf"],
                                    r["imp_tier_sky_dl"],
                                    r["imp_tier_sky_off"], avgdl,
                                    quantize)
            start = len(bounds)
            for t_i, end in enumerate(np.asarray(tends, dtype=np.int64)):
                units.append((float(tb[t_i]),
                              np.arange(start, int(end), dtype=np.int64)))
                start = int(end)
        units.sort(key=lambda u: -u[0])
        self.groups = units
        self.ptr = 0
        self.seen: list[np.ndarray] = []
        # galloping decode: the first chunk just covers k postings, then
        # doubles — a saturated term typically terminates within the
        # first couple of chunks, so a fixed 64-block chunk would decode
        # the whole posting of any shard-local df ≤ 8k in one gulp
        self.chunk = max(1, -(-k // BLOCK_N))
        head = (list(r["imp_head_doc_blocks"]), list(r["imp_head_tf_blocks"]),
                list(r["imp_head_dl_blocks"]))
        tail = r.get("imp_tail_doc_blocks")
        if tail is not None and len(tail) > 0:
            # eager row (the Spark scan shipped the whole stream)
            self._imp = (head[0] + list(tail),
                         head[1] + list(r["imp_tail_tf_blocks"]),
                         head[2] + list(r["imp_tail_dl_blocks"]))
        else:
            self._imp = head
        self._n_avail = len(self._imp[0])

    def next_idx(self) -> np.ndarray:
        """Block indices of the next discovery step: at least `chunk`
        blocks' worth of the best-bounded undecoded units."""
        take: list[np.ndarray] = []
        n = 0
        while self.ptr < len(self.groups) and n < self.chunk:
            g = self.groups[self.ptr][1]
            take.append(g)
            n += len(g)
            self.ptr += 1
        self.chunk = min(self.chunk * 2, CHUNK_BLOCKS)
        return (np.concatenate(take) if take
                else np.empty(0, dtype=np.int64))

    def _ensure(self, max_bidx: int) -> None:
        """Lazily pull the tail stream (and doc-ordered streams) of a
        light row — serving readers skip hot terms' byte columns and
        attach a _fetch_heavy callback instead."""
        if max_bidx < self._n_avail:
            return
        fetch = self.r.get("_fetch_heavy")
        if fetch is None:
            raise KeyError(
                f"impact block {max_bidx} beyond available stream and no "
                "_fetch_heavy on a light segment row")
        self.r.update(fetch())
        self.r["_fetch_heavy"] = None

        def _lst(key):
            v = self.r.get(key)
            return list(v) if v is not None else []

        self._imp = (self._imp[0][:] + _lst("imp_tail_doc_blocks"),
                     self._imp[1][:] + _lst("imp_tail_tf_blocks"),
                     self._imp[2][:] + _lst("imp_tail_dl_blocks"))
        self._n_avail = len(self._imp[0])

    def decode(self, idx: np.ndarray):
        if len(idx):
            self._ensure(int(idx.max()))
        db, tb, lb = self._imp
        return _decode_impact_chunk(db, tb, lb, int(self.r["df"]), idx)

    def doc_streams(self) -> dict:
        """Doc-ordered streams for completion; light rows fetch them."""
        if self.r.get("doc_blocks") is None:
            fetch = self.r.get("_fetch_heavy")
            if fetch is not None:
                self.r.update(fetch())
                self.r["_fetch_heavy"] = None
        return self.r

    @property
    def residual(self) -> float:
        if self.ptr >= len(self.groups):
            return 0.0
        return self.groups[self.ptr][0]

    @property
    def total_ub(self) -> float:
        return self.groups[0][0] if self.groups else 0.0


def _single_hot_topk(h: "_HotTerm", k: int, avgdl: float,
                     quantize: bool, stats: dict | None):
    """Single-hot-term fast path: with one query term the per-posting
    contributions ARE the final scores, so the kernel needs no
    O(n_local_docs) dense accumulator, no full-array partition for θ,
    and no flatnonzero sweep at the end — the three remaining
    linear-in-corpus costs of the generic path (measured as the
    hot-term latency growth term, BENCH/HOT_TERM.md). θ is the k-th
    largest DECODED contribution; discovery stops when the best
    undecoded unit's bound falls below it (θ − EPS: unit bounds are
    computed by the same float ops as contributions, so a tie at the
    boundary keeps decoding and the doc-asc tie-break stays exact).
    Work is O(decoded · log decoded); decoded is bounded by the tiered
    impact metadata, near-constant in df."""
    vals: list[np.ndarray] = []
    dlst: list[np.ndarray] = []
    theta = 0.0
    read = 0
    while h.residual > 0.0:
        if theta > 0.0 and h.residual < theta - EPS:
            break
        idx = h.next_idx()
        read += len(idx)
        docs, tfs, dls = h.decode(idx)
        vals.append(_contrib(h.idf_t, tfs, dls, avgdl, quantize))
        dlst.append(docs)
        allv = np.concatenate(vals)
        if len(allv) > k:
            theta = float(np.partition(allv, -k)[-k])
    if stats is not None:
        stats.update(blocks_read=0, blocks_skipped=0, hot_terms=1,
                     hot_blocks_read=read, completion_blocks=0,
                     candidates=0)
    if not vals:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    allv = np.concatenate(vals)
    alld = np.concatenate(dlst)
    pos = allv > 0.0
    allv, alld = allv[pos], alld[pos]
    if len(allv) > k:
        kth = np.partition(allv, -k)[-k]
        keep = allv >= kth
        allv, alld = allv[keep], alld[keep]
    order = np.lexsort((alld, -allv))[:k]
    return alld[order], allv[order]


def _kth(scores: np.ndarray, k: int, n_local_docs: int) -> float:
    if n_local_docs <= k:
        return 0.0
    return float(np.partition(scores, -k)[-k])


def _support(scores: np.ndarray, touched: list[np.ndarray],
             n_local_docs: int) -> np.ndarray:
    """Scores restricted to their support: the unique touched docs'
    scores below the density cutover, the full array above it."""
    if not touched:
        return np.empty(0, dtype=np.float64)
    if sum(len(t) for t in touched) >= (n_local_docs >> 2):
        return scores
    return scores[np.unique(np.concatenate(touched))]


def _kth_touched(scores: np.ndarray, touched: list[np.ndarray], k: int,
                 n_local_docs: int) -> float:
    """θ (k-th largest score) computed over the TOUCHED docs only —
    scores are non-negative and untouched docs are exactly 0, so the
    k-th largest over touched equals the dense answer whenever ≥ k docs
    were touched, without an O(n_local_docs) partition per refresh (the
    measured growth term of hot-term serving on large shards).

    Density cutover: once the touched multiset approaches the shard
    size, the O(T log T) unique dominates a dense O(n) partition (a
    multi-hot-term query touches most of the shard) — switch to dense.
    The touched entries must be DEDUPED in the sparse branch: a doc
    decoded by two terms would otherwise appear twice and push the k-th
    rank upward, overstating θ and breaking exactness."""
    if n_local_docs <= k or not touched:
        return 0.0
    total = sum(len(t) for t in touched)
    if total >= (n_local_docs >> 2):
        return _kth(scores, k, n_local_docs)
    u = np.unique(np.concatenate(touched))
    if len(u) < k:
        return 0.0
    return float(np.partition(scores[u], -k)[-k])


def wand_shard(
    seg_rows: list[dict],
    n_local_docs: int,
    base_ord: int,
    df_global: dict[str, int],
    n_docs: int,
    avgdl: float,
    k: int,
    stats: dict | None = None,
    quantize: bool = False,
):
    """Score one shard. seg_rows: matched segment rows (dicts) for the
    query's terms in THIS shard; doc lengths are decoded from the
    segments' dl_blocks (impact storage — no docmap needed). Returns
    (local_doc_idx, score) arrays of the shard's top-k (exact scores).

    quantize=True scores with log-quantized doc lengths (the opt-in
    Lucene-norm-compression analogue, functions/bm25.quantize_dl); the
    kernel stays exact for THAT scoring function — bounds quantize in
    place because the quantizer is monotone (see _qdl).
    """
    from geospatial_spark.functions.codec import varint_decode

    if not seg_rows or n_local_docs == 0 or avgdl <= 0.0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    # split terms by physical strategy; per-term query-time stats
    cold = []
    hot_raw: list[tuple[dict, float]] = []
    for r in seg_rows:
        idf_t = idf(int(df_global[r["term"]]), n_docs)
        if _has_impact_copy(r):
            hot_raw.append((r, idf_t))
            continue
        if (r.get("sky_off") is None and r.get("block_max_tf") is None
                and r.get("_fetch_heavy") is not None):
            # hot-routed light row whose shard is below the copy
            # threshold: pull the cold metadata + streams now
            r.update(r["_fetch_heavy"]())
            r["_fetch_heavy"] = None
        ubs = _block_ubs_skyline(idf_t, r.get("sky_tf"), r.get("sky_dl"),
                                 r.get("sky_off"), avgdl, quantize)
        if ubs is None:
            bmax_tf = np.asarray(r["block_max_tf"], dtype=np.int64)
            bmin_dl = np.asarray(r["block_min_dl"], dtype=np.int64)
            ubs = _block_ubs(idf_t, bmax_tf, bmin_dl, avgdl, quantize)
        cold.append((float(ubs.max()), idf_t, r, ubs))

    # Saturated MULTI-hot queries ("the spark"): the sum-of-terms θ only
    # beats the combined residual after BOTH terms are deeply decoded,
    # and tf-saturated scores form wide tie plateaus — incremental
    # discovery ends up decoding nearly everything anyway, paying a
    # θ-refresh partition + bound re-mask per chunk (measured ~25 ms per
    # shard at 50k postings vs ~1 ms for one bulk pass). When the hot
    # terms jointly cover ≥¼ of the shard, skip discovery: bulk-score
    # each hot term's whole impact stream (memoized, below), accumulate
    # dense scores, and let the cold loop prune against the resulting
    # exact θ (hot residuals are zero, so no completion phase either).
    # Exactness is trivial — every hot posting is scored. Single-hot
    # and sparse-hot queries keep the early-terminating discovery path.
    bulk = (len(hot_raw) >= 2
            and sum(int(r["df"]) for r, _ in hot_raw)
            >= (n_local_docs >> BULK_HOT_DENSITY_SHIFT))
    hot: list[_HotTerm] = []
    if not bulk:
        for r, idf_t in hot_raw:
            ibounds = _block_ubs_skyline(idf_t, r["imp_sky_tf"],
                                         r["imp_sky_dl"],
                                         r["imp_sky_off"], avgdl, quantize)
            hot.append(_HotTerm(r, idf_t, ibounds, k, avgdl, quantize))

    if not cold and len(hot) == 1:
        return _single_hot_topk(hot[0], k, avgdl, quantize, stats)

    hot_total_ub = float(sum(h.total_ub for h in hot))

    scores = np.zeros(n_local_docs, dtype=np.float64)
    theta = 0.0
    blocks_skipped = 0
    blocks_read = 0
    bulk_hot_blocks = 0

    if bulk:
        memo_key = "_imp_contrib_q" if quantize else "_imp_contrib"
        for r, idf_t in hot_raw:
            memo = r.get(memo_key)
            if memo is None:
                db, tb, lb, total_blocks = _full_impact_streams(r)
                idx = np.arange(total_blocks, dtype=np.int64)
                docs, tfs, dls = _decode_impact_chunk(
                    db, tb, lb, int(r["df"]), idx)
                bulk_hot_blocks += total_blocks
                # memoize (docs, contribution) on the row: idf_t and
                # avgdl are INDEX constants (an appended generation
                # publishes a new manifest and serving re-reads rows),
                # so a warm daemon scores a saturated term with one
                # fancy-index add — no varint decode (~0.5 ms/stream)
                # and no per-query BM25 arithmetic. ~16 B/posting on
                # hot terms only, evicted with the row by the serving
                # LRU (plans/serve); Spark-path rows are per-task
                # dicts, the attach is free there.
                memo = (docs, _contrib(idf_t, tfs, dls, avgdl, quantize))
                r[memo_key] = memo
            docs, contrib = memo
            scores[docs] += contrib
        # θ seeds the cold loop's block skipping; with no cold terms it
        # is never read — skip the O(n) partition
        theta = _kth(scores, k, n_local_docs) if cold else 0.0
    # every doc that ever received a contribution — the sparse support
    # for θ refreshes and the completion candidate set (untouched docs
    # score exactly 0)
    touched: list[np.ndarray] = []

    # ---- cold phase: doc-ordered block-max WAND -----------------------
    cold.sort(key=lambda x: -x[0])
    term_ubs = np.array([p[0] for p in cold])
    suffix_ub = (np.concatenate((np.cumsum(term_ubs[::-1])[::-1], [0.0]))
                 if len(cold) else np.array([0.0]))

    for i, (term_ub, idf_t, r, ubs) in enumerate(cold):
        if r.get("doc_blocks") is None:
            # light row classified cold (e.g. copy exists in another
            # generation only): pull its byte streams now
            fetch = r.get("_fetch_heavy")
            if fetch is None:
                raise KeyError(f"cold term {r.get('term')!r} row lacks doc "
                               "streams and no _fetch_heavy")
            r.update(fetch())
            r["_fetch_heavy"] = None
        # hot terms are processed later: their bounds ride in `remaining`
        # so no cold skip can understate a doc the hot phase promotes
        remaining = float(suffix_ub[i + 1]) + hot_total_ub
        blast_local = np.asarray(r["block_last_doc"], dtype=np.int64) - base_ord
        doc_blocks, tf_blocks, dl_blocks = r["doc_blocks"], r["tf_blocks"], r["dl_blocks"]
        nblocks = len(doc_blocks)
        bstarts_local = np.concatenate(([0], blast_local[:-1] + 1))

        # decide skips for ALL blocks up front (vectorized); then decode
        # the kept blocks in ONE varint pass per stream — per-block
        # decode calls on 128-value arrays are dominated by numpy call
        # overhead, ~50x slower than the bulk path for hot terms
        seg_bounds = np.minimum(bstarts_local, n_local_docs - 1)
        if theta > 0.0:
            part_max = np.maximum.reduceat(scores, seg_bounds)
            keep = (part_max + ubs + remaining) >= theta - EPS
        else:
            keep = np.ones(nblocks, dtype=bool)
        pending = np.flatnonzero(keep)
        blocks_skipped += nblocks - len(pending)

        df_local = int(r["df"])
        block_lens = _block_lens(df_local, nblocks)

        # decode the kept blocks in CHUNKS, refreshing θ (and re-masking
        # the remaining blocks) between chunks so long scans — including
        # the first/only term — start pruning before the term ends
        pos = 0
        while pos < len(pending):
            kept_idx = pending[pos: pos + CHUNK_BLOCKS]
            pos += CHUNK_BLOCKS
            kept_lens = block_lens[kept_idx]
            blocks_read += len(kept_idx)

            gaps = varint_decode(b"".join(_as_bytes(doc_blocks[i]) for i in kept_idx))
            tfs = varint_decode(b"".join(_as_bytes(tf_blocks[i]) for i in kept_idx))
            dls = varint_decode(b"".join(_as_bytes(dl_blocks[i]) for i in kept_idx))

            # each kept block's first gap is relative to the PREVIOUS
            # physical block's last doc (known from metadata even when
            # that block was skipped) — make absolute, segment-cumsum
            starts_flat = np.concatenate(([0], np.cumsum(kept_lens)[:-1]))
            gaps = gaps.astype(np.int64)
            prev_last = np.where(kept_idx > 0,
                                 blast_local[kept_idx - 1] + base_ord, 0)
            gaps[starts_flat] += prev_last
            cs = np.cumsum(gaps)
            seg_off = cs[starts_flat] - gaps[starts_flat]
            docs = cs - np.repeat(seg_off, kept_lens)

            local = docs - base_ord
            scores[local] += _contrib(idf_t, tfs, dls, avgdl, quantize)
            touched.append(local)

            if pos < len(pending) and n_local_docs > k:
                new_theta = float(np.partition(scores, -k)[-k])
                if new_theta > theta:
                    theta = new_theta
                    part_max = np.maximum.reduceat(scores, seg_bounds)
                    rest = pending[pos:]
                    ok = (part_max[rest] + ubs[rest] + remaining) >= theta - EPS
                    blocks_skipped += int((~ok).sum())
                    pending = np.concatenate((pending[:pos], rest[ok]))
        theta = max(theta, _kth(scores, k, n_local_docs))

    # ---- hot phase: impact-ordered discovery --------------------------
    hot_blocks_read = 0
    completion_blocks = 0
    n_candidates = 0
    if hot:
        while True:
            residuals = [h.residual for h in hot]
            R = float(sum(residuals))
            if R <= 0.0:
                break
            if theta > 0.0 and R < theta:
                # frontier below θ: no new doc can enter the top-k, but
                # completion still pays per-candidate doc-block lookups.
                # Keep decoding (which shrinks R and hence the candidate
                # set) while {d : scores[d] ≥ θ − R} is still large —
                # impact-ordered decode is cheaper per posting than the
                # random doc-block reads completion would do for them.
                # Only touched docs can qualify (θ − R > 0; untouched
                # score exactly 0) — sparse support below the density
                # cutover, dense count above it.
                n_cand_now = int(np.count_nonzero(
                    _support(scores, touched, n_local_docs)
                    >= theta - R - EPS))
                if n_cand_now <= CAND_CAP:
                    break
            h = hot[int(np.argmax(residuals))]
            idx = h.next_idx()
            hot_blocks_read += len(idx)
            docs, tfs, dls = h.decode(idx)
            scores[docs] += _contrib(h.idf_t, tfs, dls, avgdl, quantize)
            h.seen.append(docs)
            touched.append(docs)
            theta = max(theta, _kth_touched(scores, touched, k,
                                            n_local_docs))

        # ---- completion: exact scores for the candidate set ----------
        residuals = [h.residual for h in hot]
        R = float(sum(residuals))
        if R > 0.0 and theta > 0.0:
            if sum(len(t) for t in touched) >= (n_local_docs >> 2):
                cand = np.flatnonzero(scores >= theta - R - EPS)
            else:
                u = (np.unique(np.concatenate(touched)) if touched
                     else np.empty(0, dtype=np.int64))
                cand = u[scores[u] >= theta - R - EPS]
            n_candidates = len(cand)
            for h in hot:
                if h.residual <= 0.0:
                    continue  # fully decoded: nothing unseen
                seen = (np.sort(np.concatenate(h.seen))
                        if h.seen else np.empty(0, dtype=np.int64))
                if len(seen):
                    pos_s = np.searchsorted(seen, cand)
                    pos_s = np.minimum(pos_s, len(seen) - 1)
                    need = cand[seen[pos_s] != cand]
                else:
                    need = cand
                if len(need) == 0:
                    continue
                hr = h.doc_streams()
                blast_local = np.asarray(hr["block_last_doc"],
                                         dtype=np.int64) - base_ord
                bidx = np.searchsorted(blast_local, need)
                bidx = bidx[bidx < len(blast_local)]
                if len(bidx) == 0:
                    continue
                ublocks = np.unique(bidx)
                completion_blocks += len(ublocks)
                docs, tfs, dls = _decode_doc_blocks(hr, ublocks, base_ord)
                pos_d = np.searchsorted(docs, need)
                pos_d_c = np.minimum(pos_d, len(docs) - 1)
                found = docs[pos_d_c] == need
                scores[need[found]] += _contrib(
                    h.idf_t, tfs[pos_d_c[found]], dls[pos_d_c[found]],
                    avgdl, quantize)

    if stats is not None:
        stats.update(blocks_read=blocks_read, blocks_skipped=blocks_skipped,
                     hot_terms=len(hot_raw),
                     hot_blocks_read=hot_blocks_read + bulk_hot_blocks,
                     completion_blocks=completion_blocks,
                     candidates=n_candidates)

    nz = np.flatnonzero(scores > 0.0)
    if len(nz) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    if len(nz) > k:
        # candidate set = everything ≥ the k-th score (argpartition alone
        # would cut ties at the boundary arbitrarily, violating the
        # (conv_id, turn_idx) tie-break contract when >k docs tie)
        kth = np.partition(scores[nz], -k)[-k]
        cand = nz[scores[nz] >= kth]
    else:
        cand = nz
    # stable order: score desc, doc_ord asc; then truncate
    order = np.lexsort((cand, -scores[cand]))
    top = cand[order][:k]
    return top, scores[top]
