"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design:
  * exact        — one hash-groupBy on a 16-byte key; map-side partial.
  * minhash LSH  — signatures are per-row projections (no shuffle);
    candidate generation shuffles on (band, bucket) — bounded fan-out,
    never the O(n²) pair space.
  * ngram-jaccard — exact verifier; meant to run on LSH candidates at
    scale (the shingle self-join is quadratic in the worst case, so
    it's the small-side verify stage, not the discovery stage).
  * simhash      — per-row 32-bit sketch via explode + bit-bucket agg.
  * embedding    — see similarity.py (brute-force verify / LSH buckets).

Portability: every hash is md5-based (functions/oracle_sql.py builds the
identical DuckDB SQL), never Spark's xxhash/murmur, so the DuckDB oracle
reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geospatial_spark.functions.tokenize import spark_tokens_col
from geospatial_spark.operators.analysis import norm_text_col

SHINGLE_K = 3
MINHASH_SEEDS = 16
LSH_BANDS = 4  # 4 bands × 4 rows
# per-(band, bucket) contribution cap for candidate generation: a
# degenerate bucket (web boilerplate: 10^5-10^7 same-signature docs is
# GUARANTEED at crawl scale) would otherwise materialize O(b²) pairs in
# one skewed task. With exact dups pre-collapsed (one representative
# per distinct text) a bucket larger than this cap means a pathological
# near-dup cluster; the cap bounds the join to O(cap²) per bucket and
# the truncation is observable via lsh_bucket_stats. Far above anything
# a non-degenerate corpus produces per 2^64-space band hash.
LSH_BUCKET_CAP = 1024


def shingle_rows(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, shingle) rows via one Arrow kernel pass — NO
    shuffle at all: the per-doc shingle SET is built inside the kernel
    (tokenize_py is the engine tokenizer's reference twin, parity-gated
    by the token-stats rows; ' '.join ≡ concat_ws), so the corpus-wide
    explode + distinct exchange the expression form paid is gone, and
    so are its interpreted per-element lambda steps. Row set identical:
    (doc_id, s) pairs are unique per doc by construction."""
    import pandas as pd

    from geospatial_spark.functions.tokenize import tokenize_pandas

    id_type = dict(df.dtypes)[id_col]

    def kernel(batches):
        for b in batches:
            ids: list = []
            ss: list = []
            toks_col = tokenize_pandas(b[text_col])
            for i, toks in zip(b[id_col], toks_col):
                n = len(toks)
                if n < SHINGLE_K:
                    continue
                seen = set()
                for j in range(n - SHINGLE_K + 1):
                    s = " ".join(toks[j:j + SHINGLE_K])
                    if s not in seen:
                        seen.add(s)
                        ids.append(i)
                        ss.append(s)
            yield pd.DataFrame({"doc_id": ids, "s": ss})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, schema=f"doc_id {id_type}, s string")


def _minhash_kernel(df: DataFrame, id_col: str, text_col: str,
                    n_seeds: int) -> DataFrame:
    """Per-doc MinHash signatures straight from text in ONE Arrow
    kernel pass: tokenize (parity-gated reference tokenizer) → distinct
    3-shingles → per-seed min of md5(f'{i}:{shingle}') via hashlib —
    byte-identical inputs and lowercase hex digests to the previous
    Catalyst md5/concat_ws aggregation, with no shingle explode, no
    shuffle, and no per-call MessageDigest setup (the JVM md5
    expression's hidden cost at ~16 hashes per shingle)."""
    import hashlib

    import pandas as pd

    from geospatial_spark.functions.tokenize import tokenize_pandas

    id_type = dict(df.dtypes)[id_col]
    sig_cols = [f"sig_{i}" for i in range(n_seeds)]
    schema = (f"doc_id {id_type}, "
              + ", ".join(f"{c} string" for c in sig_cols))
    prefixes = [f"{i}:".encode() for i in range(n_seeds)]

    def kernel(batches):
        md5 = hashlib.md5
        for b in batches:
            toks_col = tokenize_pandas(b[text_col])
            out_ids: list = []
            outs: list[list[str]] = [[] for _ in range(n_seeds)]
            for i, toks in zip(b[id_col], toks_col):
                n = len(toks)
                if n < SHINGLE_K:
                    continue
                sh = {" ".join(toks[j:j + SHINGLE_K]).encode()
                      for j in range(n - SHINGLE_K + 1)}
                out_ids.append(i)
                for k, pre in enumerate(prefixes):
                    outs[k].append(
                        min(md5(pre + s).hexdigest() for s in sh))
            frame = {"doc_id": out_ids}
            for c, v in zip(sig_cols, outs):
                frame[c] = v
            yield pd.DataFrame(frame)

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, schema=schema)


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Per-doc exact-dup assignment: (doc_id, fingerprint, group_size,
    canonical_id = min doc_id of the group). Docs with group_size == 1
    are unique."""
    fp = df.select(F.col(id_col).alias("doc_id"),
                   F.md5(norm_text_col(text_col)).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id", "fingerprint",
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
        F.min("doc_id").over(w).alias("canonical_id"),
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str = "text",
                       n_seeds: int = MINHASH_SEEDS,
                       collapse_exact: bool = True) -> DataFrame:
    """Per-doc MinHash signature: sig_i = lexicographic min of
    md5(i ':' shingle) — string-min is portable across engines.
    Returns (doc_id, sig_0..sig_{n-1}); docs with no shingles dropped.

    Shape: shingle ROWS once (codegen, see shingle_rows), then ONE
    hash-aggregate computing all n_seeds minima — computing the mins as
    array_min(transform(...)) projections instead would inline (and
    recompute) the shingle expression once per seed, a 16× blowup
    Catalyst does not dedupe across interpreted higher-order lambdas.

    collapse_exact (default): a signature is a pure function of the
    text, so shingle + aggregate once per DISTINCT text (keyed by
    md5(text)) and re-attach per doc with one join — at crawl scale
    boilerplate dup clusters make distinct texts a small fraction of
    rows, and the expensive shingle pass never runs twice for the
    same bytes. Output is row-for-row identical to the uncollapsed
    form."""
    if not collapse_exact:
        return _minhash_kernel(df, id_col, text_col, n_seeds)
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    # explicit repartition: AQE coalesces the dedup shuffle's few MB of
    # text into 1-6 partitions (byte-sized targets), serializing the
    # CPU-heavy signature kernel — hash CPU ≫ bytes here
    texts = (df.select(fp.alias("doc_id"), F.col(text_col))
             .dropDuplicates(["doc_id"])
             .repartition(df.sparkSession.sparkContext.defaultParallelism))
    sig_fp = (_minhash_kernel(texts, "doc_id", text_col, n_seeds)
              .withColumnRenamed("doc_id", "_fp"))
    return (df.select(F.col(id_col).alias("doc_id"), fp.alias("_fp"))
            .join(sig_fp, "_fp").drop("_fp"))


def lsh_buckets(sigs: DataFrame, n_bands: int = LSH_BANDS,
                n_seeds: int = MINHASH_SEEDS) -> DataFrame:
    """Band the signature: bucket = md5(concat of the band's rows).
    Returns (doc_id, band, bucket) — the shuffle key for candidate
    generation."""
    rows_per_band = n_seeds // n_bands
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("bucket"))
        )
    return (
        sigs.select("doc_id", F.explode(F.array(*bands)).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )


def _cap_buckets(bk: DataFrame, bucket_cap: int | None,
                 keys: list[str], order_col: str = "doc_id") -> DataFrame:
    """Keep at most bucket_cap members per bucket (deterministic: the
    smallest ids survive). The window sorts a degenerate bucket in
    O(b log b) in one task — instead of the O(b²) pair materialization
    the uncapped self-join would do there."""
    if bucket_cap is None:
        return bk
    w = Window.partitionBy(*keys).orderBy(order_col)
    return (bk.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= int(bucket_cap)).drop("_rn"))


def lsh_bucket_stats(sigs: DataFrame, bucket_cap: int = LSH_BUCKET_CAP,
                     n_bands: int = LSH_BANDS,
                     n_seeds: int = MINHASH_SEEDS) -> dict:
    """Truncation observability for the capped candidate join: returns
    {n_buckets, n_capped_buckets, dropped_members, max_bucket}. Run it
    alongside a capped discovery pass when coverage accounting matters
    (the no-silent-caps rule)."""
    counts = (lsh_buckets(sigs, n_bands, n_seeds)
              .groupBy("band", "bucket")
              .agg(F.count(F.lit(1)).alias("n")))
    row = counts.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("n") > bucket_cap).cast("long")).alias("n_capped"),
        F.sum(F.greatest(F.col("n") - bucket_cap, F.lit(0)))
        .alias("dropped"),
        F.max("n").alias("max_bucket"),
    ).collect()[0]
    return {"n_buckets": int(row["n_buckets"] or 0),
            "n_capped_buckets": int(row["n_capped"] or 0),
            "dropped_members": int(row["dropped"] or 0),
            "max_bucket": int(row["max_bucket"] or 0),
            "bucket_cap": int(bucket_cap)}


def lsh_candidate_pairs(sigs: DataFrame,
                        bucket_cap: int | None = LSH_BUCKET_CAP) -> DataFrame:
    """Docs sharing ≥1 LSH band bucket: (a, b, n_bands) with a < b.

    bucket_cap bounds each (band, bucket)'s contribution to the
    self-join (see LSH_BUCKET_CAP; lsh_bucket_stats reports what a cap
    dropped). None disables. (The self-join form is deliberate: most
    buckets are singletons at any healthy scale, which the JVM join
    handles for free — a per-bucket kernel pays per-group overhead on
    every singleton.)"""
    bk = _cap_buckets(lsh_buckets(sigs), bucket_cap, ["band", "bucket"])
    l = bk.alias("l")
    r = bk.alias("r")
    return (
        l.join(r, on=["band", "bucket"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).cast("int").alias("n_bands"))
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str = "text",
                        threshold: float = 0.5, round_dp: int = 4,
                        candidates: DataFrame | None = None,
                        shingles: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard over distinct k-shingles for pairs ≥ threshold.

    candidates=None → all pairs (quadratic discovery: only for small
    inputs / verification). candidates=(a, b) DataFrame → verify stage
    restricted to those pairs (the at-scale path, fed by LSH).

    shingles: optional pre-built distinct (doc_id, s) table (the
    shingle_rows shape) — callers that already materialized the shingle
    pass (the collapsed pipeline) hand it in so the explode+distinct
    never recomputes. The three consumers below (sizes, left, right)
    otherwise re-derive the whole lineage each."""
    if candidates is not None:
        # restrict every verify-side consumer to docs that actually
        # appear in a candidate pair BEFORE anything is shingled or
        # joined — only candidate docs' rows can survive the verify
        # joins, and shingling just those docs beats shingling (or
        # shuffling) the corpus. sizes (n_sh) still counts each doc's
        # FULL distinct-shingle set (the doc-level restriction keeps
        # every shingle of a kept doc).
        cand_ids = (candidates.select(F.col("a").alias("doc_id"))
                    .unionByName(candidates.select(F.col("b").alias("doc_id")))
                    .distinct())
        if shingles is None:
            df_r = df.join(cand_ids.withColumnRenamed("doc_id", id_col)
                           .distinct(), id_col)
            ex = shingle_rows(df_r, id_col, text_col).localCheckpoint(eager=True)
        else:
            ex = shingles.join(cand_ids, "doc_id")
    else:
        ex = shingle_rows(df, id_col, text_col) if shingles is None else shingles
        if shingles is None:
            # ex feeds sizes AND both join sides — materialize the one
            # expensive shingle pass instead of recomputing it 3×
            ex = ex.localCheckpoint(eager=True)
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    if candidates is None:
        inter = (
            ex.alias("l").join(ex.alias("r"), "s")
            .where(F.col("l.doc_id") < F.col("r.doc_id"))
            .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
            .agg(F.count(F.lit(1)).cast("long").alias("inter"))
        )
    else:
        la = ex.select(F.col("doc_id").alias("a"), F.col("s"))
        rb = ex.select(F.col("doc_id").alias("b"), F.col("s"))
        inter = (
            candidates.select("a", "b").join(la, "a").join(rb, ["b", "s"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("inter"))
        )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
    )
    return j.select("a", "b", F.round("jaccard", round_dp).alias("jaccard"))


def lsh_verified_dups(df: DataFrame, id_col: str, text_col: str = "text",
                      threshold: float = 0.8, round_dp: int = 4,
                      collapse_exact: bool = True,
                      bucket_cap: int | None = LSH_BUCKET_CAP) -> DataFrame:
    """The full near-dup pipeline as it runs at scale: MinHash LSH
    candidate generation (never the O(n²) pair space) → exact Jaccard
    verification restricted to the candidates. Returns (a, b, jaccard)
    with jaccard ≥ threshold.

    collapse_exact (default): discovery and verification run over ONE
    representative per distinct text — the crawl-scale skew killer: a
    10k-member boilerplate cluster contributes one bucket row instead
    of 10k identical-signature rows. The verified rep pairs then expand
    back to member pairs EXACTLY (Jaccard is a function of the text:
    cross-group pairs inherit the rep pair's value; within-group pairs
    of any group whose text has ≥1 shingle are identical texts, Jaccard
    exactly 1.0 ≥ any threshold ≤ 1). Output is row-for-row identical
    to the uncollapsed pipeline; the expansion is inherent to the PAIR
    output contract — group-level consumers (dup_groups) never pay it.
    """
    if not collapse_exact:
        cand = lsh_candidate_pairs(
            minhash_signatures(df, id_col, text_col, collapse_exact=False),
            bucket_cap=bucket_cap).select("a", "b")
        return ngram_jaccard_pairs(df, id_col, text_col, threshold,
                                   round_dp, candidates=cand)

    rep_pairs, groups = _collapsed_rep_pairs(df, id_col, text_col,
                                             threshold, round_dp,
                                             bucket_cap)
    ga = groups.select(F.col("_rep").alias("a"), F.col("doc_id").alias("ma"))
    gb = groups.select(F.col("_rep").alias("b"), F.col("doc_id").alias("mb"))
    cross = (rep_pairs.join(ga, "a").join(gb, "b")
             .select(F.least("ma", "mb").alias("a"),
                     F.greatest("ma", "mb").alias("b"), "jaccard"))
    within = (groups.alias("l")
              .join(groups.alias("r"),
                    (F.col("l._rep") == F.col("r._rep"))
                    & (F.col("l.doc_id") < F.col("r.doc_id")))
              .select(F.col("l.doc_id").alias("a"),
                      F.col("r.doc_id").alias("b"),
                      F.lit(1.0).alias("jaccard")))
    return cross.unionByName(within)


def _collapsed_rep_pairs(df: DataFrame, id_col: str, text_col: str,
                         threshold: float, round_dp: int,
                         bucket_cap: int | None):
    """Shared collapse core: verified near-dup pairs over one
    representative per DISTINCT text, plus the (doc_id, _rep) group
    membership table restricted to shingle-bearing texts (a no-shingle
    doc never enters the signature table, so the uncollapsed pipeline
    never pairs it — not even with its exact duplicates).

    Shape: ONE window over the NARROW (doc_id, fingerprint) projection
    assigns every doc its representative (min doc_id per fp) in one
    small shuffle — text bytes never enter it; the full-text shuffle
    happens once, in the rep_docs join.

    Every multiply-consumed stage is materialized eagerly
    (localCheckpoint): without it Spark re-derives the whole
    shingle+md5 lineage once per consumer — measured 4-6 full corpus
    passes per dedup query instead of one per stage. Checkpoints live
    only for this query's DAG (block-manager storage, freed with the
    RDD) — nothing persists across bench runs."""
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    w = Window.partitionBy("_fp")
    groups_all = (df.select(F.col(id_col).alias("doc_id"), fp.alias("_fp"))
                  .withColumn("_rep", F.min("doc_id").over(w))
                  .select("doc_id", "_rep")
                  .localCheckpoint(eager=True))  # used by rep_docs AND groups
    # explicit repartition before the checkpoint: AQE coalesces the
    # join's few MB of text into 1-6 partitions, which would serialize
    # BOTH downstream text kernels (shingles + signatures)
    rep_docs = (df.select(F.col(id_col).alias("doc_id"),
                          F.col(text_col).alias(text_col))
                .join(groups_all.where(F.col("doc_id") == F.col("_rep"))
                      .select("doc_id"), "doc_id")
                .repartition(df.sparkSession.sparkContext.defaultParallelism)
                .localCheckpoint(eager=True))  # feeds shingles AND sig join

    sigs = _minhash_kernel(rep_docs, "doc_id", text_col,
                           MINHASH_SEEDS).localCheckpoint(eager=True)
    cand = (lsh_candidate_pairs(sigs, bucket_cap=bucket_cap)
            .select("a", "b").localCheckpoint(eager=True))
    # the verify shingles ONLY candidate docs (ngram_jaccard_pairs
    # restricts df before its shingle kernel) — the corpus-wide shingle
    # table never materializes
    rep_pairs = ngram_jaccard_pairs(rep_docs, "doc_id", text_col,
                                    threshold, round_dp,
                                    candidates=cand).localCheckpoint(eager=True)
    shingled = sigs.select(F.col("doc_id").alias("_rep"))
    groups = (groups_all.join(shingled, "_rep").select("doc_id", "_rep")
              .localCheckpoint(eager=True))
    return rep_pairs, groups


def dup_groups(df: DataFrame, id_col: str, text_col: str = "text",
               threshold: float = 0.8,
               pairs: DataFrame | None = None,
               max_iters: int = 25,
               driver_max_edges: int = 2_000_000) -> DataFrame:
    """Near-dup GROUP assignment — the step a real dedup pipeline runs
    after pair discovery: connected components over the LSH-verified
    similarity graph, canonical = the component's minimum doc id.
    Returns (doc_id, canonical_id, group_size) for EVERY doc (docs in
    no pair are their own singleton group).

    Scale shape: iteration runs ONLY over the dup graph's nodes (a tiny
    fraction of the corpus — every edge survived Jaccard ≥ threshold),
    via min-label propagation: label(n) ← min(label(n), labels of
    neighbors) until fixpoint, O(component diameter) rounds of small
    joins; near-dup chains are shallow in practice. The corpus-sized
    side is touched once, by the final left join.

    Default discovery (pairs=None) runs the exact-dup-collapsed LSH
    pipeline and feeds the components LINEAR-size edges: verified
    representative pairs plus member→representative STAR edges — a
    10k-member boilerplate cluster contributes 9 999 edges, not the
    C(10k, 2) pair expansion (which only the pair-output contract of
    lsh_verified_dups ever materializes). Components, canonical ids
    and group sizes are identical: star edges preserve connectivity
    and the representative is its group's minimum id."""
    from pyspark.sql import functions as F

    if pairs is None:
        rep_pairs, groups = _collapsed_rep_pairs(df, id_col, text_col,
                                                 threshold, 4,
                                                 LSH_BUCKET_CAP)
        star = (groups.where(F.col("doc_id") != F.col("_rep"))
                .select(F.col("doc_id").alias("a"),
                        F.col("_rep").alias("b")))
        pairs = rep_pairs.select("a", "b").unionByName(star)
    edges = (pairs.select(F.col("a").alias("s"), F.col("b").alias("d"))
             .unionByName(pairs.select(F.col("b").alias("s"),
                                       F.col("a").alias("d")))
             .distinct())

    # the dup GRAPH is tiny relative to the corpus (edges survived
    # Jaccard ≥ threshold); below driver_max_edges the components
    # resolve in one collect + union-find instead of a multi-job
    # propagation loop — the loop remains the unbounded-graph path
    edge_rows = edges.limit(driver_max_edges + 1).collect()
    if len(edge_rows) <= driver_max_edges:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in edge_rows:
            a, b = row["s"], row["d"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        assign_rows = [(n, find(n)) for n in parent]
        spark = df.sparkSession
        id_type = dict(df.dtypes)[id_col]
        labels = spark.createDataFrame(
            assign_rows or [], schema=f"node {id_type}, label {id_type}")
        return _dup_groups_finish(df, id_col, labels, small=True)

    labels = _star_contract(edges, max_iters)
    return _dup_groups_finish(df, id_col, labels, small=False)


def _star_contract(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    O(log n) rounds regardless of component diameter — a 1k-node path
    graph converges in a handful of rounds where min-label propagation
    needs ~1k. Each round is two grouped aggregations + joins over the
    CURRENT edge set (which only shrinks toward star graphs).

    edges: symmetric (s, d) pairs. Returns (node, label) with label =
    the component's minimum node id.
    """
    from pyspark.sql import functions as F

    # canonical undirected form (hi, lo), hi > lo
    E = (edges.where(F.col("s") != F.col("d"))
         .select(F.greatest("s", "d").alias("hi"),
                 F.least("s", "d").alias("lo"))
         .distinct().localCheckpoint())

    for _ in range(max_iters):
        nbrs = (E.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
                .unionByName(E.select(F.col("lo").alias("u"),
                                      F.col("hi").alias("v"))))
        # large-star: connect every LARGER neighbor of u to
        # m(u) = min(N(u) ∪ {u}); one output edge per input edge
        m_all = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"))
        large = (nbrs.join(m_all, "u")
                 .where(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
                 .where(F.col("hi") != F.col("lo"))
                 .distinct())

        # small-star over the large-star output: orient each edge at its
        # larger endpoint; connect u and its smaller neighbors to their
        # minimum
        small_nbrs = large.select(F.col("hi").alias("u"),
                                  F.col("lo").alias("v"))
        m_small = small_nbrs.groupBy("u").agg(F.min("v").alias("m"))
        E_new = (small_nbrs.join(m_small, "u")
                 .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
                 .unionByName(m_small.select(F.col("u").alias("hi"),
                                             F.col("m").alias("lo")))
                 .where(F.col("hi") != F.col("lo"))
                 .select(F.greatest("hi", "lo").alias("hi"),
                         F.least("hi", "lo").alias("lo"))
                 .distinct().localCheckpoint())  # truncate lineage

        # fixpoint: E is a star FOREST (every hi has exactly one parent
        # and no parent appears as a child). Star rounds preserve
        # connectivity, so the stars ARE the components — and this
        # structural test fires one round earlier than edge-set equality
        E = E_new
        multi = (E.groupBy("hi").agg(F.countDistinct("lo").alias("c"))
                 .where(F.col("c") > 1).take(1))
        if not multi:
            lo_as_hi = (E.select("lo").distinct()
                        .join(E.select(F.col("hi").alias("lo")).distinct(),
                              "lo").take(1))
            if not lo_as_hi:
                break
    else:
        raise RuntimeError(f"dup_groups did not converge in {max_iters} rounds")

    # labels straight off the star forest: children point at the root,
    # roots label themselves
    return (E.select(F.col("hi").alias("node"), F.col("lo").alias("label"))
            .unionByName(E.select(F.col("lo").alias("node"),
                                  F.col("lo").alias("label")).distinct()))


def _dup_groups_finish(df: DataFrame, id_col: str, labels: DataFrame,
                       small: bool) -> DataFrame:
    from pyspark.sql import functions as F

    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"))
    assign = labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("canonical_id"), "group_size")
    if small:
        assign = F.broadcast(assign)  # driver-resolved graph: tiny
    everyone = df.select(F.col(id_col).alias("doc_id"))
    return (everyone.join(assign, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("canonical_id", F.col("doc_id")).alias("canonical_id"),
                    F.coalesce("group_size", F.lit(1)).cast("long").alias("group_size")))


def keep_canonical(df: DataFrame, id_col: str, text_col: str = "text",
                   threshold: float = 0.8,
                   pairs: DataFrame | None = None) -> DataFrame:
    """Dedup RETENTION policy — the step that actually shrinks a
    training corpus: keep exactly ONE doc per near-dup group, the
    most informative one, pinned as (token count desc, doc_id asc).
    Returns the kept rows as (doc_id, group_size); a downstream join
    against the corpus drops the other group members.

    Scale shape: dup_groups' label table (corpus-sized, but 3 narrow
    columns) joins a token-count projection and takes one
    window row per group — the same one-shuffle-per-step profile as
    the grouping itself.
    """
    groups = dup_groups(df, id_col, text_col, threshold, pairs=pairs)
    dl = df.select(F.col(id_col).alias("doc_id"),
                   F.size(spark_tokens_col(text_col)).alias("_dl"))
    w = Window.partitionBy("canonical_id").orderBy(F.desc("_dl"),
                                                   F.asc("doc_id"))
    return (groups.join(dl, "doc_id")
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("doc_id", "group_size"))


def simhash(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """32-bit SimHash: per distinct token, a md5-derived 32-bit hash,
    weighted by tf; bit b of the sketch is 1 iff the tf-weighted sum of
    (±1 per token hash bit) is positive. Returns (doc_id, simhash).

    Shape: the tf-weighted sum over DISTINCT tokens equals the unweighted
    sum over token INSTANCES (Σ_tok tf·±1 = Σ_instances ±1), so no tf
    pre-aggregation is needed; and bit b's signed sum s_b = 2·ones_b − n
    where ones_b counts instances with bit b set — so the whole sketch is
    33 codegen SUMs in ONE hash aggregate on doc_id. The round-1 form
    exploded 32 rows per token (a 32× shuffle blowup) plus an extra
    (doc_id, tok) shuffle; this is one shuffle, no explode."""
    toks = df.select(F.col(id_col).alias("doc_id"),
                     F.explode(spark_tokens_col(text_col)).alias("tok"))
    h = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    aggs = [F.sum(F.expr(f"(shiftright(h, {b}) & 1)")).alias(f"_o{b}")
            for b in range(32)]
    aggs.append(F.count(F.lit(1)).alias("_n"))
    g = h.groupBy("doc_id").agg(*aggs)
    # bit b set  ⟺  s_b = 2·ones_b − n > 0  ⟺  2·ones_b > n
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * _o{b} > _n THEN shiftleft(CAST(1 AS BIGINT), {b}) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for b in range(32)
    )
    return g.select("doc_id", F.expr(bit_terms).cast("long").alias("simhash"))
