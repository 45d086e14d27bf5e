"""Block-max WAND top-k scorer — the engine's central query operator.

Reference analogue: per-shard collect + coordinator reduce of the grid
aggregation (SURVEY.md §2.6 T2; GeoHexGridAggregatorFactory.java:92-128
collects per shard, core reduces). Here each shard runs a vectorized
block-max scorer over its compressed segments and returns its local
top-k; the driver k-way merges.

Exact pruning rule (per shard): process query terms in descending
whole-posting upper-bound order, keeping a running threshold θ = the
k-th largest *partial* score so far (a valid lower bound of the final
k-th score, since scores only grow). A block B of term i may be
skipped iff

    max_partial(B) + ub_i(B) + Σ_{j>i} ub_j  <  θ

because every doc in B then finishes strictly below the k-th score —
ties at exactly θ are never skipped, preserving the (conv_id, turn_idx)
tie-break. Upper bounds come from stored (block_max_tf, block_min_dl):
BM25 is monotone ↑ in tf and ↓ in dl, so score(max_tf, min_dl) bounds
every doc in the block. Single-term queries degrade to classic
block-max skipping; all arithmetic is numpy-vectorized (block decode,
scatter-add, reduceat for per-block partial maxima).
"""

from __future__ import annotations

import numpy as np

from geospatial_spark.functions.bm25 import B, K1, idf

from geospatial_spark.functions.codec import BLOCK as BLOCK_N

# θ-refresh cadence for the chunked bulk decode (blocks per chunk)
CHUNK_BLOCKS = 64


def _block_ubs(idf_t: float, bmax_tf: np.ndarray, bmin_dl: np.ndarray,
               avgdl: float) -> np.ndarray:
    tf = bmax_tf.astype(np.float64)
    norm = K1 * (1.0 - B + B * (bmin_dl.astype(np.float64) / avgdl))
    return idf_t * (tf / (tf + norm))


def _block_ubs_skyline(idf_t: float, sky_tf, sky_dl, sky_off,
                       avgdl: float) -> np.ndarray | None:
    """EXACT per-block max score from stored (tf, dl) skyline pairs —
    BM25's block max is attained at a skyline point. Returns None if the
    segment row predates the skyline format."""
    if sky_off is None or len(sky_off) < 2:
        return None
    tf = np.asarray(sky_tf, dtype=np.float64)
    dl = np.asarray(sky_dl, dtype=np.float64)
    if len(tf) == 0:
        return None
    s = idf_t * (tf / (tf + K1 * (1.0 - B + B * (dl / avgdl))))
    off = np.asarray(sky_off, dtype=np.int64)
    return np.maximum.reduceat(s, off[:-1])


def wand_shard(
    seg_rows: list[dict],
    n_local_docs: int,
    base_ord: int,
    df_global: dict[str, int],
    n_docs: int,
    avgdl: float,
    k: int,
    stats: dict | None = None,
):
    """Score one shard. seg_rows: matched segment rows (dicts) for the
    query's terms in THIS shard; doc lengths are decoded from the
    segments' dl_blocks (impact storage — no docmap needed). Returns
    (local_doc_idx, score) arrays of the shard's top-k (exact scores).
    """
    from geospatial_spark.functions.codec import varint_decode

    if not seg_rows or n_local_docs == 0 or avgdl <= 0.0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    # per-term query-time stats (global df → idf)
    prepped = []
    for r in seg_rows:
        idf_t = idf(int(df_global[r["term"]]), n_docs)
        ubs = _block_ubs_skyline(idf_t, r.get("sky_tf"), r.get("sky_dl"),
                                 r.get("sky_off"), avgdl)
        if ubs is None:
            bmax_tf = np.asarray(r["block_max_tf"], dtype=np.int64)
            bmin_dl = np.asarray(r["block_min_dl"], dtype=np.int64)
            ubs = _block_ubs(idf_t, bmax_tf, bmin_dl, avgdl)
        prepped.append((float(ubs.max()), idf_t, r, ubs))
    # descending whole-posting upper bound
    prepped.sort(key=lambda x: -x[0])
    term_ubs = np.array([p[0] for p in prepped])
    suffix_ub = np.concatenate((np.cumsum(term_ubs[::-1])[::-1], [0.0]))

    scores = np.zeros(n_local_docs, dtype=np.float64)
    theta = 0.0
    blocks_skipped = 0
    blocks_read = 0
    terms_skipped = 0

    for i, (term_ub, idf_t, r, ubs) in enumerate(prepped):
        remaining = float(suffix_ub[i + 1])
        if theta > 0.0 and term_ub + remaining + float(scores.max(initial=0.0)) < theta:
            # no doc can reach θ through this or later terms
            blocks_skipped += len(ubs)
            terms_skipped += 1
            continue
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
            keep = (part_max + ubs + remaining) >= theta
        else:
            keep = np.ones(nblocks, dtype=bool)
        pending = np.flatnonzero(keep)
        blocks_skipped += nblocks - len(pending)

        df_local = int(r["df"])
        block_lens = np.full(nblocks, BLOCK_N, dtype=np.int64)
        block_lens[-1] = df_local - BLOCK_N * (nblocks - 1)

        # decode the kept blocks in CHUNKS, refreshing θ (and re-masking
        # the remaining blocks) between chunks so long scans — including
        # the first/only term — start pruning before the term ends
        pos = 0
        while pos < len(pending):
            kept_idx = pending[pos: pos + CHUNK_BLOCKS]
            pos += CHUNK_BLOCKS
            kept_lens = block_lens[kept_idx]
            blocks_read += len(kept_idx)

            gaps = varint_decode(b"".join(bytes(doc_blocks[i]) for i in kept_idx))
            tfs = varint_decode(b"".join(bytes(tf_blocks[i]) for i in kept_idx))
            dls = varint_decode(b"".join(bytes(dl_blocks[i]) for i in kept_idx))

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
            tff = tfs.astype(np.float64)
            contrib = idf_t * (tff / (tff + K1 * (1.0 - B + B * (dls.astype(np.float64) / avgdl))))
            scores[local] += contrib

            if pos < len(pending) and n_local_docs > k:
                new_theta = float(np.partition(scores, -k)[-k])
                if new_theta > theta:
                    theta = new_theta
                    part_max = np.maximum.reduceat(scores, seg_bounds)
                    rest = pending[pos:]
                    ok = (part_max[rest] + ubs[rest] + remaining) >= theta
                    blocks_skipped += int((~ok).sum())
                    pending = np.concatenate((pending[:pos], rest[ok]))
        if n_local_docs > k:
            theta = float(np.partition(scores, -k)[-k])

    if stats is not None:
        stats.update(blocks_read=blocks_read, blocks_skipped=blocks_skipped,
                     terms_skipped=terms_skipped)

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
