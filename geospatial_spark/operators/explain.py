"""Per-hit score explanation (the Lucene ``Explanation`` / OpenSearch
``_explain`` API analogue).

The explained doc's (tf, dl) are decoded DIRECTLY from the frozen index
— exactly one posting block per query term (``block_last_doc``
searchsorted → decode that block alone) — and recombined through the
same ``functions/bm25`` expressions the kernels score with, so the
explanation IS the score: ``sum(contribution) == search()``'s value for
that doc, pinned by tests at 1e-9.

Reference analogue: the reference stack wraps its queries in
ConstantScoreQuery over Lucene's BM25Similarity
(index/query/xyshape/XYShapeQueryBuilder.java:62-71); Lucene's
Explanation breaks a hit's score into the per-term idf × tf-saturation
factors — this module pins the same decomposition for our format.

Scale shape: an explain is a point lookup — one docmap ordinal probe
plus |query terms| single-block decodes; it never scans postings or
shuffles anything.
"""

from __future__ import annotations

import numpy as np

from geospatial_spark.functions.bm25 import (idf, quantize_dl, term_score)
from geospatial_spark.functions.codec import decode_block, varint_decode


def _as_bytes(x) -> bytes:
    """Block cell → bytes (plain bytes from Spark rows, or a pyarrow
    BinaryScalar from zero-copy serving rows)."""
    return x.as_py() if hasattr(x, "as_py") else bytes(x)


def _cell_list(v):
    """List cell → indexable sequence (pyarrow ListScalar or plain)."""
    return v.as_py() if hasattr(v, "as_py") else v


def tf_dl_at(row: dict, gordinal: int) -> tuple[int, int] | None:
    """(tf, dl) of the doc at GLOBAL ordinal ``gordinal`` (shard base +
    shard-local ordinal — posting streams store global ordinals, see
    plans/build.ORD_SHARD_SHIFT) inside one term row, or None when the
    term's posting doesn't contain it. Decodes exactly one block
    (block_last_doc is the per-block last global doc ordinal, ascending
    across blocks)."""
    blast = np.asarray(_cell_list(row["block_last_doc"]), dtype=np.uint64)
    if blast.size == 0 or gordinal > int(blast[-1]):
        return None
    b = int(np.searchsorted(blast, np.uint64(gordinal)))
    prev_last = int(blast[b - 1]) if b else 0
    db, tb, lb = (row["doc_blocks"], row["tf_blocks"], row["dl_blocks"])
    docs, tfs = decode_block(_as_bytes(db[b]), _as_bytes(tb[b]), prev_last)
    i = int(np.searchsorted(docs, np.uint64(gordinal)))
    if i >= len(docs) or int(docs[i]) != gordinal:
        return None
    dls = varint_decode(_as_bytes(lb[b]))
    return int(tfs[i]), int(dls[i])


def explain_entries(rows: list[dict], gordinal: int,
                    df_global: dict[str, int], n_docs: int, avgdl: float,
                    quantized: bool = False) -> list[dict]:
    """Per-term explanation entries for the doc at global ordinal
    ``gordinal`` (shard base + local ordinal), one dict per query term
    present in the doc (term asc):

        {term, tf, dl, df, idf, contribution}

    ``rows`` are the term rows of the doc's OWN (generation, shard) —
    postings are shard-local. df/n_docs/avgdl are the corpus-global
    stats, identical to what the kernels score with, so the sum of
    contributions equals the doc's search() score exactly.
    """
    out: list[dict] = []
    for r in sorted(rows, key=lambda r: str(r["term"])):
        t = str(r["term"])
        d = df_global.get(t)
        if not d:
            continue
        got = tf_dl_at(r, gordinal)
        if got is None:
            continue
        tf_v, dl_v = got
        dl_s = quantize_dl(dl_v) if quantized else dl_v
        out.append({
            "term": t, "tf": tf_v, "dl": dl_v, "df": int(d),
            "idf": idf(int(d), n_docs),
            "contribution": term_score(tf_v, dl_s, avgdl, int(d), n_docs),
        })
    return out
