"""Percolator: reverse search — stored queries matched against docs.

The percolate API analogue (register queries, then ask "which stored
queries match this doc" — alerting/routing). Pinned semantics: a stored
query is its token set; it matches a doc iff EVERY query term appears
in the doc (the AND/alert form — the common routing contract, and the
one an oracle can state exactly).

Spark-first shape: stored queries are the SMALL side. Exploded
(query_id, term) pairs broadcast-join the corpus postings on term —
postings never reshuffle and the per-(doc, query) matched-term count
compares against the query's term count map-side. Never a docs×queries
cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_spark.functions.tokenize import tokenize_py


def queries_df(spark: SparkSession,
               queries: list[tuple[str, str]]) -> DataFrame:
    """[(query_id, query_text)] → (query_id, terms array<string>) with
    the engine tokenizer applied driver-side (queries are tiny)."""
    rows = [(qid, sorted(set(tokenize_py(text)))) for qid, text in queries]
    return spark.createDataFrame(
        rows, "query_id string, terms array<string>")


def percolate_pairs(queries: DataFrame, postings: DataFrame) -> DataFrame:
    """(query_id, doc_id) for every stored query whose FULL term set
    appears in the doc. ``postings`` is the (term, doc_id[, ...]) tuple
    table (one row per distinct term per doc)."""
    qt = queries.select("query_id", F.explode("terms").alias("term"))
    nq = queries.select("query_id", F.size("terms").alias("n_terms"))
    # the stored-query registry is tiny by contract (the broadcast
    # side); collecting its term union costs nothing and the literal
    # isin filter — unlike the join — pushes below the corpus-wide
    # postings aggregate, so only stored-query terms ever shuffle
    all_terms = sorted({r["term"] for r in qt.select("term").distinct().collect()})
    return (
        postings.where(F.col("term").isin(all_terms))
        .join(F.broadcast(qt), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count(F.lit(1)).alias("_nm"))
        .join(F.broadcast(nq), "query_id")
        .where(F.col("_nm") == F.col("n_terms"))
        .select("query_id", "doc_id")
    )


def percolate_counts(queries: DataFrame, postings: DataFrame) -> DataFrame:
    """(query_id, n_matches) — match cardinality per stored query;
    queries matching nothing are kept with 0 (left join against the
    registry, the alert-that-never-fires row)."""
    counts = (percolate_pairs(queries, postings)
              .groupBy("query_id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_matches")))
    return (queries.select("query_id").join(counts, "query_id", "left")
            .select("query_id",
                    F.coalesce("n_matches", F.lit(0)).cast("long")
                    .alias("n_matches"))
            .orderBy("query_id"))


def percolate_doc(queries: list[tuple[str, str]], text: str) -> list[str]:
    """Single-doc percolation (the live API form): which stored queries
    match this one doc — pure python, for the serving tier: the stored
    queries are the small side and the doc is one token set."""
    toks = set(tokenize_py(text))
    qsets = [(qid, set(tokenize_py(qtext))) for qid, qtext in queries]
    return sorted(qid for qid, qs in qsets if qs and qs <= toks)
