"""Positional phrase matching over the compressed index.

The engine's phrase operator — the analogue of the reference's richer
spatial query relations (INTERSECTS/DISJOINT/WITHIN,
index/query/xyshape/XYShapeQueryBuilder.java:62-71): where the
reference refines a bbox candidate set with exact geometry, a phrase
query refines the term-AND candidate set with exact position
adjacency from the segments' position stream (pos_blocks — the Lucene
.pos-file analogue, same varint/delta machinery as the doc stream).

Semantics (shared with the DuckDB oracle):
  * a document matches iff the phrase's tokens appear consecutively in
    the KEPT token stream (post tokenize+normalize);
  * matched docs score as the sum of the phrase's DISTINCT terms'
    BM25 contributions (phrase-as-filter, terms-as-scorer);
  * phrase_tf (number of phrase occurrences) is also returned for
    callers that want occurrence counts.

Scale shape: per shard, only the phrase terms' postings decode, and
only blocks that can hold docs surviving the running intersection —
the doc-id intersection runs FIRST on the (cheap) doc streams in
rarest-term order, and positions decode only for the ~|intersection|
touched blocks of each term. All set operations are sorted-array
numpy (searchsorted / intersect1d); no per-doc Python.
"""

from __future__ import annotations

import numpy as np

from geospatial_spark.functions.bm25 import B, K1, idf
from geospatial_spark.functions.codec import (
    decode_positions_stream,
    varint_decode,
)

# positions are packed as (local_doc << POS_SHIFT) | position when
# intersecting phrase slots; documents longer than 2^POS_SHIFT tokens
# are rejected at encode time by MAX_TOKEN-sane inputs (a 4M-token doc
# is beyond any transcript turn; guarded with an explicit check below)
POS_SHIFT = 22


def _as_bytes(x) -> bytes:
    return x.as_py() if hasattr(x, "as_py") else bytes(x)


def _decode_full_posting(r: dict, base_ord: int, need_positions: bool = True):
    """One segment row → (local_docs asc, tfs, dls, flat positions —
    None when need_positions=False).

    Doc-ordered blocks only (phrase never touches impact copies). The
    leading gap of every block is made absolute from block_last_doc
    metadata, so this is one bulk varint pass per stream.
    """
    db, tb, lb = r["doc_blocks"], r["tf_blocks"], r["dl_blocks"]
    pb = r.get("pos_blocks")
    if pb is None and need_positions:
        raise ValueError(
            f"segment row for term {r.get('term')!r} has no position "
            "stream (pre-v2 generation) — rebuild to enable phrase queries")
    nblocks = len(db)
    blast = np.asarray(r["block_last_doc"], dtype=np.int64)
    df_local = int(r["df"])
    from geospatial_spark.functions.codec import BLOCK

    lens = np.full(nblocks, BLOCK, dtype=np.int64)
    lens[-1] = df_local - BLOCK * (nblocks - 1)

    gaps = varint_decode(b"".join(_as_bytes(x) for x in db)).astype(np.int64)
    tfs = varint_decode(b"".join(_as_bytes(x) for x in tb)).astype(np.int64)
    dls = varint_decode(b"".join(_as_bytes(x) for x in lb)).astype(np.int64)
    starts_flat = np.concatenate(([0], np.cumsum(lens)[:-1]))
    prev_last = np.concatenate(([0], blast[:-1]))
    gaps[starts_flat] += prev_last
    cs = np.cumsum(gaps)
    # cancel the running cumsum at each block boundary: the first gap of
    # every block is already absolute (prev_last added above)
    seg_off = cs[starts_flat] - gaps[starts_flat]
    docs = cs - np.repeat(seg_off, lens) - base_ord

    poss = (decode_positions_stream(b"".join(_as_bytes(x) for x in pb), tfs)
            if need_positions else None)
    return docs, tfs, dls, poss


def _phrase_occurrences(slots: list[str], rows_by_term: dict[str, dict],
                        base_ord: int):
    """Shared phrase-occurrence kernel → (matched local docs asc,
    phrase_tf per matched doc, decoded streams per distinct term).
    Empty arrays when any slot term is absent or no doc matches."""
    none = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), {})
    distinct = list(dict.fromkeys(slots))
    if any(t not in rows_by_term for t in distinct):
        return none

    # decode each distinct term once; intersect doc sets rarest-first
    decoded: dict[str, tuple] = {}
    for t in sorted(distinct, key=lambda t: int(rows_by_term[t]["df"])):
        docs, tfs, dls, poss = _decode_full_posting(rows_by_term[t], base_ord)
        decoded[t] = (docs, tfs, dls, poss)
        cand = docs if len(decoded) == 1 else np.intersect1d(
            cand, docs, assume_unique=True)
        if len(cand) == 0:
            return none

    # position adjacency: token at phrase slot j must sit at p + j.
    # Pack (doc, pos − j) into one int64 key; a phrase start survives
    # iff its key appears in every slot's key set.
    match_keys = None
    for j, t in enumerate(slots):
        docs, tfs, dls, poss = decoded[t]
        # postings of the running candidate docs only
        sel = np.searchsorted(docs, cand)
        tok_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
        reps = tfs[sel]
        flat_docs = np.repeat(cand, reps)
        idx = np.repeat(tok_starts[sel], reps) + (
            np.arange(int(reps.sum())) -
            np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])), reps))
        p = poss[idx]
        if p.max(initial=0) >= (1 << POS_SHIFT):
            raise ValueError("document exceeds 2^22 tokens — phrase "
                             "position packing would overflow")
        adj = p - j
        ok = adj >= 0
        keys = (flat_docs[ok] << POS_SHIFT) | adj[ok]
        if match_keys is None:
            match_keys = keys  # slot 0: already sorted (docs asc, pos asc)
        else:
            match_keys = np.intersect1d(match_keys, keys, assume_unique=True)
        if len(match_keys) == 0:
            return none

    start_docs = (match_keys >> POS_SHIFT).astype(np.int64)
    matched = np.unique(start_docs)
    phrase_tf = np.searchsorted(start_docs, matched, side="right") - \
        np.searchsorted(start_docs, matched, side="left")
    return matched, phrase_tf, decoded


def phrase_scored_match_shard(
    slots: list[str],
    rows_by_term: dict[str, dict],
    base_ord: int,
    avgdl: float,
    k: int,
):
    """Phrase-as-term scoring (Lucene PhraseQuery semantics): the phrase
    scores as ONE synthetic term with tf = phrase occurrence count and
    df = number of matching docs. The phrase's GLOBAL df is only known
    after all shards report, but idf(df) is a constant positive factor,
    so ranking by the saturation term tf/(tf + norm) alone is ranking by
    the final score — per-shard top-k truncation is safe in one pass.

    Returns (local_docs, sat, phrase_tf, n_matched) where sat is the
    idf-less saturation score of the shard's top-k matching docs and
    n_matched the shard's TOTAL match count (the driver sums these into
    the phrase df, then multiplies idf in).

    Reference analogue: scored relation queries — the refined geometry
    predicate is a first-class scored query, not a filter over term
    queries (index/query/xyshape/XYShapeQueryBuilder.java:62-71).
    """
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
             np.empty(0, dtype=np.int64), 0)
    matched, phrase_tf, decoded = _phrase_occurrences(slots, rows_by_term,
                                                      base_ord)
    if len(matched) == 0:
        return empty
    n_matched = len(matched)

    # dl of each matched doc from any decoded term's stream
    t0 = next(iter(decoded))
    docs0, _, dls0, _ = decoded[t0]
    dl = dls0[np.searchsorted(docs0, matched)].astype(np.float64)
    tff = phrase_tf.astype(np.float64)
    sat = tff / (tff + K1 * (1.0 - B + B * (dl / avgdl)))

    if len(matched) > k:
        kth = np.partition(sat, -k)[-k]
        keep = sat >= kth
        matched, sat, phrase_tf = matched[keep], sat[keep], phrase_tf[keep]
    order = np.lexsort((matched, -sat))
    top = order[:k]
    return matched[top], sat[top], phrase_tf[top], n_matched


def phrase_match_shard(
    slots: list[str],
    rows_by_term: dict[str, dict],
    base_ord: int,
    df_global: dict[str, int],
    n_docs: int,
    avgdl: float,
    k: int,
):
    """Score one shard for an ordered phrase.

    slots: the phrase's terms in order (duplicates allowed).
    rows_by_term: this shard's segment row per DISTINCT phrase term; a
    missing term ⇒ no document in this shard can match.

    Returns (local_docs, scores, phrase_tfs) of the shard's top-k
    matching docs (score desc, doc asc), scores exact.
    """
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
             np.empty(0, dtype=np.int64))
    matched, phrase_tf, decoded = _phrase_occurrences(slots, rows_by_term,
                                                      base_ord)
    if len(matched) == 0:
        return empty
    distinct = list(dict.fromkeys(slots))

    scores = _score_distinct_terms(matched, distinct, decoded, df_global,
                                   n_docs, avgdl)

    if len(matched) > k:
        kth = np.partition(scores, -k)[-k]
        keep = scores >= kth
        matched, scores, phrase_tf = matched[keep], scores[keep], phrase_tf[keep]
    order = np.lexsort((matched, -scores))
    top = order[:k]
    return matched[top], scores[top], phrase_tf[top]


def _score_distinct_terms(matched, distinct, decoded, df_global, n_docs,
                          avgdl):
    """Σ over the distinct terms' exact BM25 at the matched docs (the
    shared phrase/proximity scoring contract: match-as-filter,
    terms-as-scorer)."""
    scores = np.zeros(len(matched), dtype=np.float64)
    for t in distinct:
        docs, tfs, dls, _ = decoded[t]
        sel = np.searchsorted(docs, matched)
        tff = tfs[sel].astype(np.float64)
        dlf = dls[sel].astype(np.float64)
        idf_t = idf(int(df_global[t]), n_docs)
        scores += idf_t * (tff / (tff + K1 * (1.0 - B + B * (dlf / avgdl))))
    return scores


def near_match_shard(
    terms: list[str],
    slop: int,
    rows_by_term: dict[str, dict],
    base_ord: int,
    df_global: dict[str, int],
    n_docs: int,
    avgdl: float,
    k: int,
):
    """Proximity (slop) matching: a doc matches iff some window of
    positions of width ≤ slop contains ALL the distinct query terms
    (order-free) — min over one-position-per-term tuples of
    (max − min) ≤ slop. Matched docs score as the sum of the distinct
    terms' BM25 contributions (the phrase contract).

    Returns (local_docs, scores, min_span) of the shard's top-k.

    Scale shape: doc-set intersection first (rarest term drives), then
    a fully-vectorized k-sorted-lists minimum window over the surviving
    candidates' merged (doc, pos, slot) arrays — m running-maximum
    passes over the packed keys, no per-token Python, so a proximity
    query over two hot terms (candidates ~ df of the rarest term) stays
    numpy-bound.
    """
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
             np.empty(0, dtype=np.int64))
    distinct = sorted(set(terms))
    if any(t not in rows_by_term for t in distinct):
        return empty
    m = len(distinct)

    decoded: dict[str, tuple] = {}
    cand = None
    for t in sorted(distinct, key=lambda t: int(rows_by_term[t]["df"])):
        docs, tfs, dls, poss = _decode_full_posting(rows_by_term[t], base_ord)
        decoded[t] = (docs, tfs, dls, poss)
        cand = docs if cand is None else np.intersect1d(cand, docs,
                                                        assume_unique=True)
        if len(cand) == 0:
            return empty

    if m == 1:
        matched = cand
        spans = np.zeros(len(cand), dtype=np.int64)
    else:
        # merged (doc, pos, slot) across terms, restricted to candidates
        d_all, p_all, s_all = [], [], []
        for j, t in enumerate(distinct):
            docs, tfs, dls, poss = decoded[t]
            sel = np.searchsorted(docs, cand)
            tok_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
            reps = tfs[sel]
            idx = np.repeat(tok_starts[sel], reps) + (
                np.arange(int(reps.sum())) -
                np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])), reps))
            d_all.append(np.repeat(cand, reps))
            p_all.append(poss[idx])
            s_all.append(np.full(int(reps.sum()), j, dtype=np.int64))
        d = np.concatenate(d_all)
        p = np.concatenate(p_all)
        s = np.concatenate(s_all)
        if p.max(initial=0) >= (1 << POS_SHIFT):
            raise ValueError("document exceeds 2^22 tokens — proximity "
                             "position packing would overflow")
        order = np.lexsort((p, d))
        d, p, s = d[order], p[order], s[order]
        bounds = np.concatenate(
            ([0], np.flatnonzero(d[1:] != d[:-1]) + 1, [len(d)]))

        # Fully vectorized k-sorted-lists minimum window (no per-token
        # Python — a proximity query over two hot terms intersects to a
        # large candidate set, and an interpreted loop there is the
        # linear-in-df shape the hot-term work removed from WAND).
        # Pack (doc << 22) | pos into one strictly-increasing key; for
        # each token index i the smallest window ending at i spans back
        # to the most recent occurrence of every other slot — per-slot
        # running maxima of the masked key array. A running max that
        # leaked from an earlier doc has key < doc's base and marks the
        # window invalid, so no per-doc reset is needed.
        key = (d << POS_SHIFT) | p
        n_tok = len(key)
        minlast = np.full(n_tok, np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(m):
            xj = np.where(s == j, key, np.int64(-1))
            np.minimum(minlast, np.maximum.accumulate(xj), out=minlast)
        valid = minlast >= (d << POS_SHIFT)
        span_i = np.where(valid, key - minlast, np.iinfo(np.int64).max)
        best = np.minimum.reduceat(span_i, bounds[:-1])
        hit = best <= slop
        if not hit.any():
            return empty
        matched = d[bounds[:-1]][hit]
        spans = best[hit]

    scores = _score_distinct_terms(matched, distinct, decoded, df_global,
                                   n_docs, avgdl)
    if len(matched) > k:
        kth = np.partition(scores, -k)[-k]
        keep = scores >= kth
        matched, scores, spans = matched[keep], scores[keep], spans[keep]
    order = np.lexsort((matched, -scores))
    top = order[:k]
    return matched[top], scores[top], spans[top]


def phrase_prefix_match_shard(
    fixed_slots: list[str],
    exp_terms: list[str],
    rows_by_term: dict[str, dict],
    base_ord: int,
    df_global: dict[str, int],
    n_docs: int,
    avgdl: float,
    k: int,
):
    """match_phrase_prefix: the fixed slots followed immediately by ANY
    of the expansion terms (the trailing prefix expanded against the
    dictionary, Lucene MatchPhrasePrefixQuery shape).

    Pinned contract (shared with the DuckDB oracle):
      * a doc matches variant e iff its kept token stream contains
        ``fixed_slots + [e]`` consecutively;
      * variant score = Σ over the variant's DISTINCT terms of their
        exact BM25 contributions (the phrase contract);
      * doc score = MAX over its matching variants.

    Scale shape: the fixed prefix decodes and position-intersects ONCE;
    each expansion variant then costs one doc-set intersection plus one
    slot-key intersection against the precomputed fixed key set — the
    per-variant work is bounded by the rarest fixed term's df, and the
    variant count by max_expansions. Returns (local_docs, scores) of
    the shard's top-k (score desc, doc asc).
    """
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    distinct_fixed = list(dict.fromkeys(fixed_slots))
    if any(t not in rows_by_term for t in distinct_fixed):
        return empty
    avail = [e for e in exp_terms if e in rows_by_term]
    if not avail:
        return empty

    decoded: dict[str, tuple] = {}
    cand = None
    for t in sorted(distinct_fixed, key=lambda t: int(rows_by_term[t]["df"])):
        decoded[t] = _decode_full_posting(rows_by_term[t], base_ord)
        docs = decoded[t][0]
        cand = docs if cand is None else np.intersect1d(cand, docs,
                                                        assume_unique=True)
        if len(cand) == 0:
            return empty

    def slot_keys(t: str, j: int, cand_docs):
        """(doc << POS_SHIFT) | (pos − j) keys of term t's occurrences
        in cand_docs — a phrase start survives iff its key appears in
        every slot's key set (same packing as _phrase_occurrences)."""
        docs, tfs, _dls, poss = decoded[t]
        sel = np.searchsorted(docs, cand_docs)
        tok_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
        reps = tfs[sel]
        idx = np.repeat(tok_starts[sel], reps) + (
            np.arange(int(reps.sum())) -
            np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])), reps))
        p = poss[idx]
        if p.max(initial=0) >= (1 << POS_SHIFT):
            raise ValueError("document exceeds 2^22 tokens — phrase "
                             "position packing would overflow")
        adj = p - j
        ok = adj >= 0
        return (np.repeat(cand_docs, reps)[ok] << POS_SHIFT) | adj[ok]

    nfix = len(fixed_slots)
    fixed_keys = None
    for j, t in enumerate(fixed_slots):
        keys = slot_keys(t, j, cand)
        fixed_keys = keys if fixed_keys is None else np.intersect1d(
            fixed_keys, keys, assume_unique=True)
        if len(fixed_keys) == 0:
            return empty

    all_docs, all_scores = [], []
    for e in avail:
        if e not in decoded:
            decoded[e] = _decode_full_posting(rows_by_term[e], base_ord)
        docs_e = decoded[e][0]
        if nfix:
            cand_e = np.intersect1d(cand, docs_e, assume_unique=True)
            if len(cand_e) == 0:
                continue
            mk = np.intersect1d(fixed_keys, slot_keys(e, nfix, cand_e),
                                assume_unique=True)
            if len(mk) == 0:
                continue
            matched = np.unique(mk >> POS_SHIFT)
        else:
            # no fixed prefix: the variant is bare term presence
            matched = docs_e
        distinct = list(dict.fromkeys(fixed_slots + [e]))
        all_docs.append(matched)
        all_scores.append(_score_distinct_terms(
            matched, distinct, decoded, df_global, n_docs, avgdl))
    if not all_docs:
        return empty

    # per-doc max across variants: sort (doc asc, score desc), keep firsts
    d = np.concatenate(all_docs)
    s = np.concatenate(all_scores)
    order = np.lexsort((-s, d))
    d, s = d[order], s[order]
    first = np.concatenate(([True], d[1:] != d[:-1]))
    matched, scores = d[first], s[first]

    if len(matched) > k:
        kth = np.partition(scores, -k)[-k]
        keep = scores >= kth
        matched, scores = matched[keep], scores[keep]
    order = np.lexsort((matched, -scores))
    top = order[:k]
    return matched[top], scores[top]
