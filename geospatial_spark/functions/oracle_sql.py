"""DuckDB oracle SQL builders for the driver correctness gate.

Each builder mirrors one engine operator, assembled from the SAME
tokenizer / BM25 SQL fragments the Spark side uses
(functions/tokenize.py, functions/bm25.py), so engine and oracle agree
by construction. Scores are rounded (ROUND_DP) on both sides because
the driver value-hashes results; ordering ties are broken by doc_id.
"""

from __future__ import annotations

from geospatial_spark.functions.bm25 import score_sql
from geospatial_spark.functions.tokenize import duckdb_tokens_sql, tokenize_py

ROUND_DP = 4          # emitted score precision (both engines)
ORDER_DP = 6          # ranking precision before doc_id tie-break


def _tok_ctes(table: str = "documents", id_col: str = "doc_id",
              text_col: str = "text") -> str:
    return f"""
docs AS (SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS toks FROM {table}),
dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
stats AS (SELECT count(*) AS n, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
tok AS (SELECT doc_id, unnest(toks) AS term FROM docs),
tf AS (SELECT term, doc_id, count(*)::INT AS tf FROM tok GROUP BY 1, 2)
""".strip()


def _qterms_values(query: str) -> str:
    terms = sorted(set(tokenize_py(query)))
    if not terms:
        return "SELECT NULL::VARCHAR AS term WHERE 1=0"
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"SELECT * FROM (VALUES {vals}) AS q(term)"


def bm25_topk_sql(query: str, k: int = 10, table: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
qt AS ({_qterms_values(query)}),
dft AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY 1),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw, {ROUND_DP}) AS score
FROM scored
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC
LIMIT {k}
""".strip()


def term_buckets_sql(limit: int = 50, table: str = "documents",
                     id_col: str = "doc_id", text_col: str = "text") -> str:
    """Bucket agg analogue of geohex_grid: term → df, top-N by df."""
    return f"""
WITH {_tok_ctes(table, id_col, text_col)}
SELECT term, count(*)::BIGINT AS df, max(tf)::INT AS max_tf
FROM tf GROUP BY term
ORDER BY df DESC, term ASC LIMIT {limit}
""".strip()


def doclens_sql(table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    return f"""
WITH {_tok_ctes(table, id_col, text_col)}
SELECT doc_id, dl::INT AS dl FROM dl
""".strip()


def corpus_stats_sql(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    return f"""
WITH {_tok_ctes(table, id_col, text_col)}
SELECT n::BIGINT AS n_docs, round(avgdl, {ROUND_DP}) AS avgdl FROM stats
""".strip()


def postings_sql(terms: list[str], table: str = "documents", id_col: str = "doc_id",
                 text_col: str = "text") -> str:
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {_tok_ctes(table, id_col, text_col)}
SELECT term, doc_id, tf FROM tf
WHERE term IN (SELECT term FROM (VALUES {vals}) AS q(term))
""".strip()
