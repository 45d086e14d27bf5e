"""Posting-tuple construction and corpus statistics — pure DataFrame ops.

Reference analogue: the field indexers turning values into index
structures (index/mapper/xypoint/XYPointIndexer.java:37-69,
index/mapper/xyshape/XYShapeIndexer.java:35-38). Spark-first design:
tokenization is a JVM-side expression (whole-stage codegen), tf counting
is explode + partial/final hash aggregation — Catalyst does map-side
combine automatically, so the (term, doc) shuffle moves pre-aggregated
rows only.

Scale notes (100 TB / 10^12 turns):
  * explode + groupBy(term, doc_id) shuffles once on a composite key
    whose cardinality is ~unique-terms-per-doc × docs — well spread;
    per-doc tf dedup happens map-side (partial count).
  * doclens/stats are a second cheap agg over the tokenized scan; both
    aggs share the one parquet scan per run when cached, and at scale
    each is a single pass with column pruning (only conv_id, turn_idx,
    text read — verified via .explain ReadSchema).
  * df(term) (the term dictionary) is tiny relative to postings and is
    broadcast to scorers (the ip2geo broadcast-dictionary analogue,
    ip2geo/dao/Ip2GeoCachedDao.java:119-138).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geospatial_spark.functions.tokenize import spark_tokens_col
from geospatial_spark.sources.transcripts import with_doc_id


def tokenized_generic(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """any (id, text) table -> (doc_id, tokens: array<string>, dl: int)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), spark_tokens_col(text_col).alias("tokens"))
        .withColumn("dl", F.size("tokens").cast("int"))
    )


def tokenized(df: DataFrame) -> DataFrame:
    """transcripts -> (doc_id, tokens: array<string>, dl: int)."""
    return tokenized_generic(with_doc_id(df))


def posting_tuples_from(tok: DataFrame) -> DataFrame:
    """tokenized -> (term, doc_id, tf, dl). Partial count happens
    map-side. dl rides inside the posting tuple (one int, constant per
    doc) — exactly how the compressed index stores per-posting dls — so
    the scorer never joins a corpus-sized doclens table per query."""
    return (
        tok.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"),
             F.max("dl").cast("int").alias("dl"))
    )


def posting_tuples(df: DataFrame) -> DataFrame:
    """transcripts -> (term, doc_id, tf). The tokenize+normalize emit stage."""
    return posting_tuples_from(tokenized(df))


def doclens(df: DataFrame) -> DataFrame:
    """transcripts -> (doc_id, dl) side table (doc-values analogue)."""
    return tokenized(df).select("doc_id", "dl")


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, doc_id, tf) -> (term, df, max_tf) dictionary."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("int").alias("df"),
        F.max("tf").alias("max_tf"),
    )


def posting_intersection(postings: DataFrame, terms: list[str]) -> DataFrame:
    """B1 (FILTER conjunction, XYPointQueryVisitor.java:165-178): docs
    containing ALL terms — semi-join style: filter to the term set, then
    require a distinct-term count equal to |terms| (terms are unique in
    postings per doc, so count == distinct count)."""
    uniq = sorted(set(terms))
    return (
        postings.where(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") == len(uniq))
        .select("doc_id")
    )


def posting_union(postings: DataFrame, terms: list[str]) -> DataFrame:
    """B2 (disjunction over geometries, XYShapeQueryProcessor.java:56-68):
    docs containing ANY term."""
    return (
        postings.where(F.col("term").isin(sorted(set(terms))))
        .select("doc_id").distinct()
    )


def significant_terms(postings: DataFrame, match: DataFrame, n_docs: int,
                      m_docs: int, size: int = 10, min_fg: int = 3,
                      order_dp: int = 6) -> DataFrame:
    """Significant-terms aggregation (the significant_terms agg
    analogue): terms over-represented in a query's match set vs the
    corpus background. fg = match-set df, bg = corpus df,
    lift = (fg/|M|) / (bg/N); terms below ``min_fg`` foreground docs
    are noise-filtered (the min_doc_count analogue). Top ``size`` by
    (lift rounded to order_dp desc, term asc).

    Plan: fg is one join of postings against the match-set ids (small
    side broadcastable) + a term agg; bg is the dictionary agg — both
    map-side-combined by Catalyst. No per-doc data reaches the driver.
    """
    fg = (postings.join(match.select("doc_id"), "doc_id")
          .groupBy("term")
          .agg(F.count(F.lit(1)).cast("long").alias("fg"))
          .where(F.col("fg") >= int(min_fg)))
    bg = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("bg"))
    out = fg.join(bg, "term").withColumn(
        "lift",
        (F.col("fg").cast("double") / F.lit(float(m_docs)))
        / (F.col("bg").cast("double") / F.lit(float(n_docs))))
    return (out.orderBy(F.round("lift", order_dp).desc(), F.asc("term"))
            .limit(int(size)))


def corpus_stats(dl: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — one tiny driver-side row (never a full collect)."""
    row = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.col("dl").cast("double")).alias("avgdl")
    ).first()
    n = int(row["n"])
    return n, float(row["avgdl"]) if n else 0.0
