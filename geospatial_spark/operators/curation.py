"""Corpus-curation operators for training-data pipelines: deterministic
data-mixture sampling and benchmark-contamination screening.

Reference analogue: these extend the ingest-processor family
(GeospatialPlugin.java:141-147 extension point) the same way the
text-analysis ops do — corpus hygiene before indexing/training.

Scale notes (the 100-TB view):
* `sample_mixture` is a pure per-row projection + filter (whole-stage
  codegen, no shuffle, no sampling pass): the keep/drop decision is a
  hash of (seed, doc_id), so it is reproducible run-to-run, stable
  under retries/resume, and needs no count-first pass the way
  `DataFrame.sample` + exact quotas would. Mixture weights ride along
  as a tiny literal CASE (or broadcast map) — never a join against a
  counted histogram.
* `contamination_screen` joins corpus shingles against the PROBE
  (benchmark) shingle set. Probe sets are small by construction
  (benchmarks are thousands of docs, the corpus is billions), so the
  probe side broadcasts and the corpus side never shuffles — cost is
  one scan of the corpus shingles. Overlap is judged with integer
  arithmetic (2·shared ≥ total) so Spark and the DuckDB oracle agree
  exactly.

Every hash is md5-based (portable: DuckDB reproduces it bit-for-bit;
see functions/oracle_sql.py for the mirrored SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geospatial_spark.operators.dedup import shingle_rows

# deterministic probe-set selector for the contamination gate entry:
# every doc_id divisible by PROBE_MOD plays the "benchmark" role
PROBE_MOD = 31

# hash → uniform [0, 1): first 8 md5 hex chars as an integer / 2^32
_HASH_DENOM = float(1 << 32)


def _unit_hash(seed: str, id_col: str):
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
            / F.lit(_HASH_DENOM))


def sample_mixture(df: DataFrame, weights: dict[str, float],
                   id_col: str = "doc_id", source_col: str = "source",
                   seed: str = "mix") -> DataFrame:
    """Deterministic stratified sample: keep a row iff
    hash01(seed, id) < weights[source]. Sources absent from `weights`
    are dropped (weight 0). Returns (doc_id, source).

    Because the decision is a pure row function, the same inputs always
    produce the same sample (resume/retry-stable), independent of
    partitioning — the property `DataFrame.sample` lacks.
    """
    w = F.lit(0.0)
    for src, frac in sorted(weights.items()):
        w = F.when(F.col(source_col) == src, F.lit(float(frac))).otherwise(w)
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.col(source_col).alias("source"),
                      _unit_hash(seed, id_col).alias("u"),
                      w.alias("w"))
            .where(F.col("u") < F.col("w"))
            .select("doc_id", "source"))


CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", window: int = CHUNK_WINDOW,
                    stride: int = CHUNK_STRIDE) -> DataFrame:
    """Split each document into overlapping token windows — the
    pre-training chunking step. Returns one row per chunk:
    (doc_id, chunk_idx, chunk_text, chunk_tokens), where chunk i covers
    tokens [i·stride, min(i·stride+window, n)). Empty docs yield no
    chunks.

    Pure per-row array expression + explode: no shuffle, no UDF, no
    window function — a 100-TB corpus chunks in one codegen scan. The
    tokens array is let-bound through a 1-element array (the same
    Catalyst idiom as dedup.shingle_rows) so the tokenizer is evaluated
    once per row, not once per chunk."""
    from geospatial_spark.functions.tokenize import spark_tokens_col

    def chunks_of(t):
        n = F.size(t)
        starts = F.when(
            n > F.lit(0),
            F.sequence(F.lit(0), n - 1, F.lit(stride)),
        ).otherwise(F.expr("array()").cast("array<int>"))
        return F.transform(
            starts,
            lambda s: F.struct(
                (s / F.lit(stride)).cast("int").alias("chunk_idx"),
                F.array_join(
                    F.slice(t, s + 1, F.least(F.lit(window), n - s)),
                    " ").alias("chunk_text"),
                F.least(F.lit(window), n - s).cast("int")
                .alias("chunk_tokens")))

    ch = F.flatten(F.transform(F.array(spark_tokens_col(text_col)),
                               chunks_of))
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(ch).alias("c"))
            .select("doc_id", "c.chunk_idx", "c.chunk_text",
                    "c.chunk_tokens"))


def contamination_screen(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         probe_mod: int = PROBE_MOD) -> DataFrame:
    """Benchmark-contamination screen: how much of each corpus doc's
    shingle set also appears in the probe ("benchmark") set?

    Probe = docs with id % probe_mod == 0; corpus = the rest. Returns
    one row per corpus doc: (doc_id, n_shingles, n_shared,
    contaminated) where contaminated ⇔ 2·n_shared ≥ n_shingles > 0
    (half the doc's distinct shingles appear in the benchmark).

    The probe shingle set is broadcast (benchmarks are small); the
    corpus side is one scan + one aggregation keyed by doc_id.
    """
    ids = df.select(F.col(id_col).alias("doc_id"))
    # three consumers (probe set, totals, shared) — one materialized
    # shingle pass instead of three recomputes of the kernel lineage
    sh = shingle_rows(df, id_col, text_col).localCheckpoint(eager=True)
    probe_sh = (sh.where(F.col("doc_id") % probe_mod == 0)
                .select("s").distinct())
    corpus_sh = sh.where(F.col("doc_id") % probe_mod != 0)
    totals = corpus_sh.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles"))
    shared = (corpus_sh.join(F.broadcast(probe_sh), "s")
              .groupBy("doc_id")
              .agg(F.count("*").cast("long").alias("n_shared")))
    return (ids.where(F.col("doc_id") % probe_mod != 0)
            .join(totals, "doc_id", "left")
            .join(shared, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_shingles", F.lit(0)).cast("long")
                .alias("n_shingles"),
                F.coalesce("n_shared", F.lit(0)).cast("long")
                .alias("n_shared"))
            .withColumn(
                "contaminated",
                (F.col("n_shingles") > 0)
                & (F.col("n_shared") * 2 >= F.col("n_shingles"))))
