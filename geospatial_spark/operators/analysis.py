"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

These are the ingest-enrichment family (the reference's processor
extension point, GeospatialPlugin.java:141-147) applied to corpus
hygiene. Integer feature counts run in vectorized Arrow kernels (one
tokenize per doc — the expression form re-evaluated the tokenizer once
per interpreted-lambda reference); ratio/score arithmetic and rounding
stay Catalyst expressions over those exact counts, so each op still
matches its DuckDB-equivalent SQL (functions/oracle_sql.py) value for
value under the correctness gate.

Scale: all ops are embarrassingly parallel projections — no shuffle;
column pruning means only (id, text) is read.
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


def _counts_kernel(df: DataFrame, id_col: str, text_col: str,
                   fields: list[str], row_fn) -> DataFrame:
    """Shared Arrow-kernel shape for the text-analysis family: one
    vectorized tokenize per batch (tokenize_pandas — the engine
    tokenizer's reference twin, parity-gated), integer feature counts
    per doc in Python, ratios/rounding left to Catalyst so the float
    semantics of the previous expression form are untouched. The
    expression form's interpreted higher-order lambdas re-evaluated the
    tokenizer once per reference; here it runs once per doc."""
    import pandas as pd

    from geospatial_spark.functions.tokenize import tokenize_pandas

    id_type = dict(df.dtypes)[id_col]
    schema = f"doc_id {id_type}, " + ", ".join(f"{f} long" for f in fields)

    def kernel(batches):
        for b in batches:
            texts = b[text_col].fillna("")
            toks_col = tokenize_pandas(texts)
            out = {f: [] for f in fields}
            for text, toks in zip(texts, toks_col):
                for f, v in zip(fields, row_fn(text, toks)):
                    out[f].append(v)
            frame = {"doc_id": b[id_col]}
            frame.update(out)
            yield pd.DataFrame(frame)

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, schema=schema)


_WS_RE = None
_BPE_RE_C = None
_NON_ALNUM_SP_RE = None


def _res():
    """Compiled ASCII-mode twins of the SQL regexes (Java \\s without
    UNICODE_CHARACTER_CLASS == Python \\s under re.ASCII)."""
    global _WS_RE, _BPE_RE_C, _NON_ALNUM_SP_RE
    import re

    if _WS_RE is None:
        _WS_RE = re.compile(r"\s+", re.ASCII)
        _BPE_RE_C = re.compile(BPE_RE, re.ASCII)
        _NON_ALNUM_SP_RE = re.compile(r"[^a-z0-9 ]", re.ASCII)
    return _WS_RE, _BPE_RE_C, _NON_ALNUM_SP_RE


def with_token_stats(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, n_ws_tokens, n_bpe_pieces, n_tokens, n_chars)."""
    def row(text, toks):
        ws_re, bpe_re, _ = _res()
        lowered = text.lower()
        n_ws = sum(1 for t in ws_re.split(text) if t)
        return (n_ws, len(bpe_re.findall(lowered)), len(toks), len(text))

    out = _counts_kernel(df, id_col, text_col,
                         ["n_ws", "n_bpe", "n_tok", "n_chars"], row)
    return out.select(
        "doc_id",
        F.col("n_ws").cast("int").alias("n_ws_tokens"),
        F.col("n_bpe").cast("int").alias("n_bpe_pieces"),
        F.col("n_tok").cast("int").alias("n_tokens"),
        F.col("n_chars").cast("int").alias("n_chars"),
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
    stop_set = set(STOPWORDS)

    def row(text, toks):
        _, _, non_alnum = _res()
        lowered = text.lower()
        return (len(toks),
                sum(1 for t in toks if t in stop_set),
                len(lowered),
                len(non_alnum.sub("", lowered)),
                sum(len(t) for t in toks))

    out = _counts_kernel(df, id_col, text_col,
                         ["n_tok", "n_stop", "n_chars", "n_alnum",
                          "tok_len_sum"], row)
    # ratio/score arithmetic stays in Catalyst, identical expressions
    # over exact integer counts (the double folds over int token
    # lengths were exact — sums ≪ 2^53 — so int-sum + cast matches)
    n_tok = F.col("n_tok").cast("double")
    n_stop = F.col("n_stop").cast("double")
    n_chars = F.col("n_chars").cast("double")
    n_alnum = F.col("n_alnum").cast("double")
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    alnum_ratio = F.when(n_chars > 0, n_alnum / n_chars).otherwise(F.lit(0.0))
    mean_tok = F.when(n_tok > 0,
                      F.col("tok_len_sum").cast("double") / n_tok
                      ).otherwise(F.lit(0.0))
    len_band = F.when((n_tok >= 5) & (n_tok <= 400), F.lit(1.0)) \
                .when(n_tok > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    quality = len_band * (F.lit(0.5) + F.lit(0.5) * F.least(stop_ratio * 10, F.lit(1.0))) * alnum_ratio
    return out.select(
        "doc_id",
        F.round(stop_ratio, round_dp).alias("stop_ratio"),
        F.round(alnum_ratio, round_dp).alias("alnum_ratio"),
        F.round(mean_tok, round_dp).alias("mean_token_len"),
        F.round(quality, round_dp).alias("quality"),
    )


def with_langid(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-hit n-gram rule (en vs unk).
    A corpus-hygiene classifier, deliberately simple + deterministic."""
    stop_set = set(STOPWORDS)

    def row(text, toks):
        return (len(toks), sum(1 for t in toks if t in stop_set))

    out = _counts_kernel(df, id_col, text_col, ["n_tok", "n_stop"], row)
    n_tok = F.col("n_tok").cast("double")
    n_stop = F.col("n_stop").cast("double")
    lang = F.when((n_tok > 0) & (n_stop / n_tok >= 0.02), F.lit("en")).otherwise(F.lit("unk"))
    return out.select("doc_id", lang.alias("lang"))


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
    0.0 for docs too short to have the n-gram. The top-gram count is a
    per-doc Counter max in the Arrow kernel (O(n)); ratios and the
    short-doc guards stay in Catalyst over the exact integer counts."""
    from collections import Counter

    def row(text, toks):
        n = len(toks)
        top2 = max(Counter(zip(toks, toks[1:])).values()) if n >= 2 else 0
        top3 = (max(Counter(zip(toks, toks[1:], toks[2:])).values())
                if n >= 3 else 0)
        return (n, len(set(toks)), top2, top3)

    out = _counts_kernel(df, id_col, text_col,
                         ["n_tok", "n_distinct", "top2", "top3"], row)
    n = F.col("n_tok")
    distinct_ratio = F.when(
        n > 0,
        F.col("n_distinct").cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))

    def top_frac(m: int) -> Column:
        n_grams = n - (m - 1)
        return F.when(
            n >= m,
            F.col(f"top{m}").cast("double")
            / n_grams.cast("double")).otherwise(F.lit(0.0))

    return out.select(
        F.col("doc_id"),
        n.cast("int").alias("n_tokens"),
        F.round(distinct_ratio, round_dp).alias("distinct_ratio"),
        F.round(top_frac(2), round_dp).alias("top_bigram_frac"),
        F.round(top_frac(3), round_dp).alias("top_trigram_frac"),
    )


def with_fingerprint(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of normalized text (tokens joined by
    ' '), so case/punctuation/whitespace variants collide — the exact-dup
    key. Arrow-kernel body: hashlib.md5 of the identical joined-token
    string (tokenizer parity-gated), same lowercase hex digest."""
    import hashlib
    import pandas as pd

    from geospatial_spark.functions.tokenize import tokenize_pandas

    id_type = dict(df.dtypes)[id_col]

    def kernel(batches):
        for b in batches:
            toks_col = tokenize_pandas(b[text_col])
            fps = [hashlib.md5(" ".join(t).encode()).hexdigest()
                   for t in toks_col]
            yield pd.DataFrame({"doc_id": b[id_col], "fingerprint": fps})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, schema=f"doc_id {id_type}, fingerprint string")
