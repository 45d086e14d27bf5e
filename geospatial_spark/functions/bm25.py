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

dl is the exact token count (we deliberately do NOT reproduce Lucene's
SmallFloat norm quantization — an architecture choice, not semantics).
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75


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
