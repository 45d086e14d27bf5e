"""Naive (relational) BM25 scorer — the always-correct second oracle.

Reference analogue: the query processors that turn a parsed query into
an executable plan (index/query/xyshape/XYShapeQueryProcessor.java:40-54).
Plan shape, all Catalyst-optimizable:

  query terms (tiny, broadcast)
    ⋈ postings(term, doc_id, tf, dl)  -- broadcast hash join, no shuffle
    → per-term BM25 score (JVM expression, whole-stage codegen)
    → groupBy(doc_id).sum(score)       -- partial+final agg
    → orderBy(score desc, doc_id) limit k   -- Spark TakeOrderedAndProject

At 100 TB the probe side (postings of the query's terms) is filtered by
the broadcast semi-join before any shuffle, so cost is proportional to
the matched postings, not the corpus. Empty query terms short-circuit to
an empty DataFrame without launching a job (the MatchNoDocsQuery
analogue, XYShapeQueryProcessor.java:49-53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_spark.functions import bm25
from geospatial_spark.functions.tokenize import tokenize_py


def score_expr(n_docs: int, avgdl: float):
    """Per-(term,doc) BM25 score as a JVM-side Column over columns tf, dl, df."""
    return F.expr(bm25.score_sql("tf", "dl", repr(float(avgdl)), "df", str(int(n_docs))))


def bm25_topk(
    spark: SparkSession,
    postings: DataFrame,
    dl: DataFrame | None,
    n_docs: int,
    avgdl: float,
    query: str,
    k: int = 10,
    tie_break=None,
) -> DataFrame:
    """Exact BM25 top-k as one declarative plan. Returns (doc_id, score).

    postings carrying a `dl` column (the posting_tuples_from shape) skip
    the doclens join entirely — the per-query plan touches ONLY rows of
    the query's terms, never a corpus-sized side table. The `dl`
    DataFrame argument is the legacy fallback for (term, doc_id, tf)
    postings and may be None when postings carry dl.

    tie_break: list of Columns ordering equal scores; default doc_id asc.
    Transcript callers pass transcript_tie_break() for the pinned
    (conv_id, turn_idx) contract.
    """
    terms = sorted(set(tokenize_py(query)))
    if not terms or n_docs == 0:
        # empty fast path, doc_id typed like the postings' doc_id
        return postings.select("doc_id", F.lit(0.0).alias("score")).limit(0)

    qterms = spark.createDataFrame([(t,) for t in terms], ["term"])

    # df per term is countable from the MATCHED rows alone (postings are
    # unique per (term, doc)): a window over the broadcast-filtered join
    # keeps the whole plan proportional to the query's postings. The
    # obvious postings.groupBy("term") would hash-aggregate the full
    # corpus-sized posting set per query — Catalyst does not push an
    # inner join below an Aggregate, but it DOES push a literal isin
    # filter on the grouping column below it, so the redundant where()
    # keeps the corpus-wide (term, doc) aggregation + shuffle down to
    # the query's terms only.
    from pyspark.sql.window import Window

    matched = (postings.where(F.col("term").isin(terms))
               .join(F.broadcast(qterms), "term", "inner"))
    scored = matched.withColumn(
        "df",
        F.count(F.lit(1)).over(Window.partitionBy("term")).cast("int"))
    if "dl" not in postings.columns:
        if dl is None:
            raise ValueError("postings lack a dl column and no doclens "
                             "DataFrame was provided")
        scored = scored.join(dl, "doc_id")
    scored = scored.withColumn("s", score_expr(n_docs, avgdl))
    if tie_break is None:
        tie_break = [F.asc("doc_id")]
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
        .orderBy(F.desc("score"), *tie_break)
        .limit(k)
    )


def bm25_topk_synonyms(
    spark: SparkSession,
    postings: DataFrame,
    n_docs: int,
    avgdl: float,
    groups: list[list[str]],
    k: int = 10,
) -> DataFrame:
    """Synonym-aware BM25 top-k with Lucene SynonymQuery semantics:
    each group of synonyms scores as ONE pseudo-term —

        tf_g(d) = Σ tf(t, d) over the group's terms,
        df_g    = max df(t)  over the group's terms (the blended docFreq)

    so a doc is not double-rewarded for containing two spellings of the
    same concept, and the group's idf reflects its most common surface
    form. Plan: broadcast (term → group) map joins the postings, one
    (group, doc) agg sums tf, the blended df comes from a per-group max
    over the same matched rows — cost ∝ matched postings. Returns
    (doc_id, score)."""
    from pyspark.sql.window import Window

    pairs = [(t, i) for i, g in enumerate(groups) for t in sorted(set(g))]
    if not pairs or n_docs == 0:
        return postings.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    gmap = spark.createDataFrame(pairs, "term string, gid int")
    # literal isin pushes below the postings aggregate (see bm25_topk)
    matched = (postings.where(F.col("term").isin([t for t, _ in pairs]))
               .join(F.broadcast(gmap), "term", "inner"))
    # per-term df from matched rows (postings unique per (term, doc)),
    # then the group's blended df = max over its terms
    per_term = matched.withColumn(
        "tdf", F.count(F.lit(1)).over(Window.partitionBy("term")))
    grouped = (per_term.groupBy("gid", "doc_id")
               .agg(F.sum("tf").cast("int").alias("tf"),
                    F.max("dl").cast("int").alias("dl"),
                    F.max("tdf").cast("int").alias("df")))
    blended = grouped.withColumn(
        "df", F.max("df").over(Window.partitionBy("gid")).cast("int"))
    scored = blended.withColumn("s", score_expr(n_docs, avgdl))
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def transcript_tie_break():
    """(conv_id, turn_idx) asc, parsed from doc_id = conv ':' turn
    (conv_id may contain ':'; turn is after the LAST colon)."""
    conv = F.expr("substring(doc_id, 1, length(doc_id) - length(substring_index(doc_id, ':', -1)) - 1)")
    turn = F.substring_index("doc_id", ":", -1).cast("int")
    return [conv.asc(), turn.asc()]
