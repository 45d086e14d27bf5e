"""Boolean query over the compressed index: should / filter / must_not.

The OpenSearch `bool` query analogue (the reference wraps its shape
queries into bool/filter contexts via QueryBuilders — e.g. the
processor path builds filtered queries around the geometry predicate,
index/query/xyshape/XYShapeQueryBuilder.java:62-71). Clause semantics
(documented contract, shared with the DuckDB oracle):

  should    — scored OR: a matching doc contains ≥ minimum_should_match
              DISTINCT should terms (default 1 when any should terms
              are given); score = Σ BM25 over ALL should terms present
              (not just the qualifying ones).
  filter    — unscored AND: every filter term must appear.
  must_not  — unscored NOT: no must_not term may appear.
  minimum_should_match = 0 makes the should clause OPTIONAL (the
              OpenSearch default when a filter/must context is
              present): the filter clauses alone decide matching and
              present should terms only contribute score (0.0 when
              none appear).
  no should clauses → matching is filter/must_not only and every hit
              scores 0.0 (OpenSearch's constant-score filter context).

Scale shape: per shard the filter/must_not streams decode doc ids only
(no tf/dl use) into membership masks; should postings decode once and
scatter-add. Everything is bulk varint + numpy; candidate sets shrink
by the most selective filter first at the mask level.
"""

from __future__ import annotations

import numpy as np

from geospatial_spark.functions.bm25 import B, K1, idf
from geospatial_spark.operators.phrase import _decode_full_posting


def bool_match_shard(
    should: list[str],
    filters: list[str],
    must_not: list[str],
    rows_by_term: dict[str, dict],
    n_local_docs: int,
    base_ord: int,
    df_global: dict[str, int],
    n_docs: int,
    avgdl: float,
    k: int,
    allowed_init: np.ndarray | None = None,
    quantize: bool = False,
    min_should_match: int = 1,
    boosts: dict[str, float] | None = None,
):
    """Score one shard. Returns (local_docs, scores) of the shard's
    top-k (score desc, doc asc; exact scores).

    allowed_init: optional pre-computed membership mask over local
    ordinals (the metadata-filter path, operators/metafilter.py) that
    restricts the candidate universe exactly like an unscored filter
    clause — scoring stats stay corpus-global.

    quantize: score with log-quantized doc lengths (the opt-in
    quantized-norm mode, functions/bm25.quantize_dl) — same contract
    as wand_shard(quantize=True).

    min_should_match: distinct should terms a doc must contain to
    match (``should`` is a distinct list, so per-term presence counts
    once); 0 = optional-should (filter context decides matching). A
    value above len(should) matches nothing, Lucene's behavior — the
    driver short-circuits that case before any shard runs.

    boosts: optional per-should-term score multipliers (Lucene clause
    boosts, `term^2`): scoring becomes Σ boost_t · BM25_t over present
    should terms. Matching (msm hit counts, filter semantics) is
    UNAFFECTED — a boost-0 term still matches, exactly Lucene. The
    multiply is applied LAST per term so boost=1.0 is bit-identical to
    the unboosted path (and to the oracle's `per_term * boost`)."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    if n_local_docs == 0:
        return empty
    # a filter term with no postings in this shard ⇒ nothing matches here
    if any(t not in rows_by_term for t in filters):
        return empty

    if allowed_init is not None:
        if len(allowed_init) != n_local_docs:
            raise ValueError(
                f"allowed_init length {len(allowed_init)} != shard docs "
                f"{n_local_docs}")
        allowed = allowed_init.astype(bool, copy=True)
        if not allowed.any():
            return empty
    else:
        allowed = np.ones(n_local_docs, dtype=bool)
    for t in filters:
        docs, _, _, _ = _decode_full_posting(rows_by_term[t], base_ord,
                                             need_positions=False)
        mask = np.zeros(n_local_docs, dtype=bool)
        mask[docs] = True
        allowed &= mask
        if not allowed.any():
            return empty
    for t in must_not:
        r = rows_by_term.get(t)
        if r is None:
            continue
        docs, _, _, _ = _decode_full_posting(r, base_ord,
                                             need_positions=False)
        allowed[docs] = False
    if not allowed.any():
        return empty

    msm = int(min_should_match)
    if should:
        scores = np.zeros(n_local_docs, dtype=np.float64)
        nhit = np.zeros(n_local_docs, dtype=np.int32)
        for t in should:
            r = rows_by_term.get(t)
            if r is None:
                continue
            docs, tfs, dls, _ = _decode_full_posting(r, base_ord,
                                                     need_positions=False)
            if quantize:
                from geospatial_spark.functions.bm25 import quantize_dl_np

                dls = quantize_dl_np(dls)
            tff = tfs.astype(np.float64)
            dlf = dls.astype(np.float64)
            idf_t = idf(int(df_global[t]), n_docs)
            contrib = idf_t * (
                tff / (tff + K1 * (1.0 - B + B * (dlf / avgdl))))
            if boosts is not None:
                w = float(boosts.get(t, 1.0))
                if w != 1.0:
                    contrib = contrib * w
            scores[docs] += contrib
            nhit[docs] += 1
        if msm > 0:
            cand = np.flatnonzero((nhit >= msm) & allowed)
        else:
            # optional should: filter context decides, should only scores
            cand = np.flatnonzero(allowed)
        if len(cand) == 0:
            return empty
        cscores = scores[cand]
    else:
        cand = np.flatnonzero(allowed)
        if len(cand) == 0:
            return empty
        cscores = np.zeros(len(cand), dtype=np.float64)

    if len(cand) > k:
        kth = np.partition(cscores, -k)[-k]
        keep = cscores >= kth
        cand, cscores = cand[keep], cscores[keep]
    order = np.lexsort((cand, -cscores))
    top = order[:k]
    return cand[top], cscores[top]
