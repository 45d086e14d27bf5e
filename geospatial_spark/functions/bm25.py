"""Exact BM25 (Lucene BM25Similarity semantics, unquantized dl).

The reference stack's relevance scoring is Lucene's default
BM25Similarity (k1=1.2, b=0.75) — the plugin itself only wraps queries
in ConstantScoreQuery (index/query/xyshape/XYShapeQueryBuilder.java:62-71),
so BM25 is the scoring contract our engine pins (SURVEY.md §2.11).

One module defines the formula; the Spark engine, the pure-Python
oracle, and the DuckDB oracle SQL all call/embed the SAME expressions,
making "rank- and score-identical" achievable by construction.

    idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))
    score(t, d) = idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl))

dl is the exact token count by default. An OPT-IN quantized mode
(`quantize_dl`) reproduces the *contract* of Lucene's SmallFloat norm
compression — doc length stored log-spaced in one byte, so scores are
stepped and docs with near-equal lengths tie — via an explicitly
specified quantizer: keep the top QUANT_BITS=4 significant bits,

    dl_q = floor(dl / 2^e) * 2^e,  e = max(0, floor(log2(dl)) − 3)

i.e. exact below 16, <12.5% relative rounding above (mantissa ≥ 2^3),
168 codes cover the 2^22 dl ceiling (fits one byte). We deliberately do NOT chase
Lucene's exact byte4 bit layout: the observable semantics (quantized
norms, stepped scores) is the contract; the mapping is pinned here and
in `quantize_dl_sql` so the engine, the Python oracle, and DuckDB agree
to the bit (reference downcast-contract analogue:
index/common/xyshape/XYShapeConverter.java:121-124).
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75

QUANT_BITS = 4  # significant bits kept by the quantized-norm mode


def quantize_dl(dl: int) -> int:
    """Log-quantized doc length (see module docstring). Monotone
    non-decreasing and ≤ dl — the properties the WAND bound math needs
    (block min-dl and skyline dl quantize without re-sorting)."""
    if dl < (1 << QUANT_BITS):
        return dl
    e = dl.bit_length() - QUANT_BITS
    return (dl >> e) << e


def quantize_dl_np(dls):
    """Vectorized quantize_dl over an int array (numpy)."""
    import numpy as np

    dls = np.asarray(dls, dtype=np.int64)
    if dls.size == 0:
        return dls
    # bit_length via the float exponent: exact for 0 < dl < 2^53
    e = np.where(dls >= (1 << QUANT_BITS),
                 np.floor(np.log2(np.maximum(dls, 1))).astype(np.int64)
                 - (QUANT_BITS - 1),
                 0)
    return (dls >> e) << e


def quantize_dl_sql(dl_expr: str) -> str:
    """The same quantizer as ANSI SQL (Spark SQL + DuckDB)."""
    e = (f"greatest(0, CAST(floor(log2(CAST({dl_expr} AS DOUBLE))) AS "
         f"BIGINT) - {QUANT_BITS - 1})")
    return (f"(CASE WHEN {dl_expr} < {1 << QUANT_BITS} THEN {dl_expr} "
            f"ELSE CAST(floor({dl_expr} / power(2.0, {e})) AS BIGINT) "
            f"* CAST(power(2.0, {e}) AS BIGINT) END)")


def idf(df_t: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))


def term_score(tf: int, dl: int, avgdl: float, df_t: int, n_docs: int,
               k1: float = K1, b: float = B) -> float:
    if tf <= 0:
        return 0.0
    norm = k1 * (1.0 - b + b * (dl / avgdl))
    return idf(df_t, n_docs) * (tf / (tf + norm))


def idf_sql(df_expr: str, n_expr: str) -> str:
    """ANSI-SQL idf expression (valid in both Spark SQL and DuckDB)."""
    return f"ln(1.0 + ({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5))"


def score_sql(tf_expr: str, dl_expr: str, avgdl_expr: str,
              df_expr: str, n_expr: str, k1: float = K1, b: float = B) -> str:
    """ANSI-SQL per-term BM25 score expression (Spark SQL + DuckDB)."""
    norm = f"({k1} * (1.0 - {b} + {b} * (CAST({dl_expr} AS DOUBLE) / {avgdl_expr})))"
    return f"({idf_sql(df_expr, n_expr)} * (CAST({tf_expr} AS DOUBLE) / (CAST({tf_expr} AS DOUBLE) + {norm})))"
