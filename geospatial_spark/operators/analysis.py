"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

These are the ingest-enrichment family (the reference's processor
extension point, GeospatialPlugin.java:141-147) applied to corpus
hygiene. Everything is JVM-side Spark SQL expressions (whole-stage
codegen, no Python in the hot path); each has a DuckDB-equivalent SQL
built from the same fragments (functions/oracle_sql.py) for the
correctness gate.

Scale: all ops are embarrassingly parallel projections/aggregations —
no shuffle except the final agg where noted; column pruning means only
(id, text) is read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geospatial_spark.functions.tokenize import spark_tokens_col

# pinned stopword list shared with the oracle SQL
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# BPE-ish piece pattern (portable across Java regex and RE2)
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def norm_text_col(text_col: str = "text") -> Column:
    """Canonical normalized text: tokens joined by single spaces."""
    return F.array_join(spark_tokens_col(text_col), " ")


def with_token_stats(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, n_ws_tokens, n_bpe_pieces, n_tokens, n_chars)."""
    lowered = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    ws = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), "\\s+"),
                  lambda t: F.length(t) >= 1)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).cast("int").alias("n_ws_tokens"),
        F.regexp_count(lowered, F.lit(BPE_RE)).cast("int").alias("n_bpe_pieces"),
        F.size(spark_tokens_col(text_col)).cast("int").alias("n_tokens"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("int").alias("n_chars"),
    )


def with_quality(df: DataFrame, id_col: str, text_col: str = "text",
                 round_dp: int = 4) -> DataFrame:
    """Quality features + composite score.

    stop_ratio  — stopword tokens / tokens (0 when empty)
    alnum_ratio — [a-z0-9 ] chars / chars
    mean_token_len
    quality     — 0..1 heuristic: length-band * stopword presence *
                  alnum cleanliness (deterministic, SQL-identical)
    """
    toks = spark_tokens_col(text_col)
    lowered = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")
    n_chars = F.length(lowered).cast("double")
    n_alnum = F.length(F.regexp_replace(lowered, "[^a-z0-9 ]", "")).cast("double")
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    alnum_ratio = F.when(n_chars > 0, n_alnum / n_chars).otherwise(F.lit(0.0))
    mean_tok = F.when(n_tok > 0,
                      F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n_tok
                      ).otherwise(F.lit(0.0))
    len_band = F.when((n_tok >= 5) & (n_tok <= 400), F.lit(1.0)) \
                .when(n_tok > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    quality = len_band * (F.lit(0.5) + F.lit(0.5) * F.least(stop_ratio * 10, F.lit(1.0))) * alnum_ratio
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.round(stop_ratio, round_dp).alias("stop_ratio"),
        F.round(alnum_ratio, round_dp).alias("alnum_ratio"),
        F.round(mean_tok, round_dp).alias("mean_token_len"),
        F.round(quality, round_dp).alias("quality"),
    )


def with_langid(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-hit n-gram rule (en vs unk).
    A corpus-hygiene classifier, deliberately simple + deterministic."""
    toks = spark_tokens_col(text_col)
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")
    lang = F.when((n_tok > 0) & (n_stop / n_tok >= 0.02), F.lit("en")).otherwise(F.lit("unk"))
    return df.select(F.col(id_col).alias("doc_id"), lang.alias("lang"))


def _top_run_sql(arr_sql: str) -> str:
    """Longest run of equal adjacent elements in a SORTED array —
    i.e. the max multiplicity — in one O(n) aggregate pass (the naive
    per-distinct count would be O(n²) per doc, quadratic in doc length
    at crawl scale)."""
    step = ("IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, "
            "CAST(1 AS BIGINT))")
    return (
        f"aggregate({arr_sql}, "
        "named_struct('prev', CAST(NULL AS STRING), "
        "'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)), "
        f"(a, x) -> named_struct('prev', x, 'run', {step}, "
        f"'best', GREATEST(a.best, {step})), "
        "a -> a.best)")


def with_repetition(df: DataFrame, id_col: str, text_col: str = "text",
                    round_dp: int = 4) -> DataFrame:
    """Gopher-style repetition features (Rae et al. 2021 §A1.1's
    repetitious-text filters, re-expressed as pure Spark SQL
    expressions — an embarrassingly parallel projection, no shuffle,
    no Python):

    n_tokens          — kept tokens
    distinct_ratio    — distinct unigrams / tokens (1.0 = no repeats)
    top_bigram_frac   — occurrences of the most frequent 2-gram / all
                        2-grams (degenerate boilerplate → 1.0)
    top_trigram_frac  — same for 3-grams
    0.0 for docs too short to have the n-gram. The top-gram count runs
    as sort + single-pass run-scan per doc (O(n log n)), never a
    per-distinct rescan."""
    toks = spark_tokens_col(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
    n = F.size(F.col("tk"))

    def top_frac(m: int) -> Column:
        grams = (f"array_sort(transform(sequence(0, size(tk) - {m}), "
                 f"i -> concat_ws(' ', slice(tk, i + 1, {m}))))")
        n_grams = n - (m - 1)
        return F.when(
            n >= m,
            F.expr(_top_run_sql(grams)).cast("double")
            / n_grams.cast("double")).otherwise(F.lit(0.0))

    distinct_ratio = F.when(
        n > 0,
        F.size(F.array_distinct(F.col("tk"))).cast("double")
        / n.cast("double")).otherwise(F.lit(0.0))
    return base.select(
        F.col("doc_id"),
        n.cast("int").alias("n_tokens"),
        F.round(distinct_ratio, round_dp).alias("distinct_ratio"),
        F.round(top_frac(2), round_dp).alias("top_bigram_frac"),
        F.round(top_frac(3), round_dp).alias("top_trigram_frac"),
    )


def with_fingerprint(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of normalized text (tokens joined by
    ' '), so case/punctuation/whitespace variants collide — the exact-dup
    key."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm_text_col(text_col)).alias("fingerprint"),
    )
