"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (tiny) query
set against the corpus, JVM-side arithmetic (zip_with + aggregate inside
whole-stage codegen, no Python). Scale path: random-hyperplane LSH
bucketing — probes only matching buckets, shuffle keyed on (plane-sign
bucket), the embedding analogue of the term-salted postings story.

Cosine arithmetic is float64, summed in element order on both engines
(Spark F.aggregate and DuckDB list_dot_product both fold left-to-right),
with rounded emit for the value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND_DP = 4
ORDER_DP = 6
# per-bucket contribution cap for the LSH dup self-join (the embedding
# analogue of dedup.LSH_BUCKET_CAP): adaptive_n_planes keeps buckets
# worker-sized IN EXPECTATION, this bounds the pathological bucket a
# boilerplate embedding cluster still produces. Far above any bucket a
# healthy corpus yields at its plane count; truncation observable via
# emb_bucket_stats.
EMB_BUCKET_CAP = 4096


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def _seq_cos_np(A, B):
    """Cosine per row of two (n, dim) float64 matrices with the EXACT
    summation order of the Catalyst fold (`_dot`/`_norm`: left-to-right
    accumulation in float64) and of DuckDB's list_sum — one vectorized
    FMA per dimension instead of interpreted per-element lambdas, but
    bit-for-bit the same doubles, so oracle-gated outputs are unchanged.
    A plain GEMM would NOT be: pairwise/blocked summation can differ in
    the last ulp and flip a rounding or threshold boundary."""
    import numpy as np

    n = len(A)
    dot = np.zeros(n, dtype=np.float64)
    na = np.zeros(n, dtype=np.float64)
    nb = np.zeros(n, dtype=np.float64)
    for j in range(A.shape[1]):
        x, y = A[:, j], B[:, j]
        dot += x * y
        na += x * x
        nb += y * y
    return dot / (np.sqrt(na) * np.sqrt(nb))


def _cos_pairs_kernel(joined: DataFrame, left_vec: str, right_vec: str,
                      keep: list[tuple[str, str]]) -> DataFrame:
    """mapInPandas over a pair frame carrying two vector columns →
    (keep..., raw) with raw = exact-fold cosine (see _seq_cos_np).
    keep: [(col, spark_type)] passthrough id columns."""
    import numpy as np
    import pandas as pd

    schema = ", ".join(f"{c} {t}" for c, t in keep) + ", raw double"
    keep_cols = [c for c, _ in keep]

    def kernel(batches):
        for b in batches:
            if len(b) == 0:
                continue
            A = np.asarray(list(b[left_vec]), dtype=np.float64)
            B = np.asarray(list(b[right_vec]), dtype=np.float64)
            out = {c: b[c] for c in keep_cols}
            out["raw"] = _seq_cos_np(A, B)
            yield pd.DataFrame(out)

    return joined.mapInPandas(kernel, schema=schema)


def with_norm(df: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    return df.select(F.col(id_col).alias("vec_id"),
                     F.round(_norm(F.col(vec_col)), ROUND_DP).alias("l2_norm"))


def embed_int8(df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization — the memory-scale path
    for embedding columns (8× smaller than float32, 4× smaller than the
    float64 math): scale = max|x| / 127, q_i = clip(⌊x_i/scale + 0.5⌋,
    ±127); a zero vector quantizes to zeros with scale 0.

    Returns per-vector scalars the correctness gate can hash exactly:
    (vec_id, scale, q_digest = md5 of the comma-joined codes, q_sum,
    q_min, q_max). The rounding form ⌊x/scale + 0.5⌋ is pinned (not
    banker's round) so Spark and DuckDB agree bit-for-bit.

    Arrow-kernel body (the interpreted higher-order-lambda form cost
    ~n·dim lambda steps per row): every arithmetic step is the same
    IEEE op in the same order as the previous Catalyst expression —
    cast-to-double, amax/127, floor(x/sc + 0.5), int clamp, md5 of the
    comma-joined codes — so the gate-hashed outputs are bit-identical.
    Rounding stays in Catalyst (F.round semantics untouched)."""
    import hashlib as _hl

    import numpy as np
    import pandas as pd

    def kernel(batches):
        for b in batches:
            if len(b) == 0:
                continue
            X = np.asarray(list(b[vec_col]), dtype=np.float64)
            amax = np.abs(X).max(axis=1) if X.size else np.zeros(len(b))
            sc = amax / 127.0
            q = np.zeros(X.shape, dtype=np.int64)
            nz = sc > 0
            if nz.any():
                raw = np.floor(X[nz] / sc[nz][:, None] + 0.5)
                q[nz] = np.clip(raw, -127, 127).astype(np.int64)
            digests = [_hl.md5(",".join(map(str, row)).encode()).hexdigest()
                       for row in q]
            yield pd.DataFrame({
                "vec_id": b[id_col],
                "scale_raw": sc,
                "q_digest": digests,
                "q_sum": q.sum(axis=1),
                "q_min": q.min(axis=1).astype(np.int32),
                "q_max": q.max(axis=1).astype(np.int32),
            })

    out = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kernel, schema=("vec_id long, scale_raw double, q_digest string, "
                        "q_sum long, q_min int, q_max int"))
    return out.select(
        "vec_id",
        F.round("scale_raw", 6).alias("scale"),
        "q_digest", "q_sum", "q_min", "q_max",
    )


def brute_force_topk(df: DataFrame, query_ids: list[int], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     where=None) -> DataFrame:
    """For each query vector (selected by id), exact cosine top-k over
    the corpus (self excluded). Returns (q, vec_id, cos) ordered within
    each q by cos desc then vec_id. Query side is broadcast — probe cost
    is one corpus scan for ALL queries.

    where: optional Column predicate restricting the SEARCHED corpus
    (filtered vector search — the metadata-filtered-retrieval shape:
    'nearest docs among those tagged X'). Query vectors still resolve
    from the full table; the predicate prunes candidates at the scan
    (Catalyst pushes it into the parquet read), so a selective filter
    makes the probe CHEAPER, never approximate."""
    from pyspark.sql.window import Window

    q = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q"), F.col(vec_col).alias("qv"))
    corpus = df.where(where) if where is not None else df
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("q"))
    # exact-fold Arrow kernel: same doubles as the interpreted Catalyst
    # fold (see _seq_cos_np), ~2 orders of magnitude less per-pair cost
    cos = _cos_pairs_kernel(pairs.select("q", "vec_id", "qv", "v"),
                            "qv", "v", [("q", "long"), ("vec_id", "long")])
    w = Window.partitionBy("q").orderBy(F.round(F.col("raw"), ORDER_DP).desc(), F.asc("vec_id"))
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", "vec_id", F.round("raw", ROUND_DP).alias("cos"), "rank")
    )


def lsh_planes(n_planes: int, seed: int, dim: int):
    """Deterministic random hyperplanes — shared by the Spark operator
    AND the DuckDB oracle (which embeds them as literals), so the LSH
    bucketing is reproducible across engines."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_verified_cosine_dups(df: DataFrame, threshold: float = 0.4,
                             n_planes: int = 6, n_tables: int = 3,
                             seed: int = 42, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             dim: int = 64,
                             bucket_cap: int | None = None) -> DataFrame:
    """Embedding near-dup pipeline AS IT RUNS AT SCALE: hyperplane-LSH
    candidate generation (pairs sharing a bucket in ANY of n_tables
    sign-LSH tables — one shuffle per table keyed on bucket, never the
    O(n²) pair space) → exact cosine verification restricted to the
    candidates (JVM-side fold, whole-stage codegen). Returns (a, b, cos)
    with a < b and cosine ≥ threshold among LSH candidates.

    n_planes controls bucket granularity (bucket size ≈ n / 2^n_planes:
    raise it with corpus size so buckets stay worker-sized); n_tables
    controls recall. The all-pairs chunked-GEMM form (cosine_dup_pairs)
    is the small-input verify helper, not the discovery path."""
    if bucket_cap is None:
        bucket_cap = EMB_BUCKET_CAP
    import numpy as np
    import pandas as pd

    from geospatial_spark.operators.dedup import _cap_buckets

    # Per-bucket verify: a bucket of m members implies C(m, 2) candidate
    # pairs — materializing those pair ROWS (let alone joining both
    # vectors onto each: 2·dim floats per pair through Arrow) dwarfs the
    # arithmetic. Instead each (capped) bucket group verifies its own
    # all-pairs cosines inside one kernel: the only shuffles are
    # n_tables passes of (vec_id, bucket, vector), and only qualifying
    # pairs ever become rows. The cosine uses the same exact fold as
    # _seq_cos_np, and multiplication commutativity makes the pair
    # orientation irrelevant, so values are bit-identical to the
    # join-then-score form; cross-table duplicate pairs carry identical
    # doubles and collapse in the final distinct.
    thr = float(threshold)
    _CHUNK = 500_000  # pair-index chunk: bounds peak memory for a
    #                   degenerate capped bucket (cap² pairs)

    def pair_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "raw": pd.Series([], dtype="float64")})
        if m < 2:
            return empty
        ids = pdf["vec_id"].to_numpy()
        E = np.asarray(list(pdf["v"]), dtype=np.float64)
        # member norms once (same exact fold; norms are per-vector, not
        # per-pair — the pair loop below only folds the dot)
        nsq = np.zeros(m, dtype=np.float64)
        for j in range(E.shape[1]):
            nsq += E[:, j] * E[:, j]
        nrm = np.sqrt(nsq)
        iu, ju = np.triu_indices(m, k=1)
        outs = []
        for s in range(0, len(iu), _CHUNK):
            ii, jj = iu[s:s + _CHUNK], ju[s:s + _CHUNK]
            dot = np.zeros(len(ii), dtype=np.float64)
            for j in range(E.shape[1]):
                dot += E[ii, j] * E[jj, j]
            raw = dot / (nrm[ii] * nrm[jj])
            keep = raw >= thr
            if keep.any():
                a = ids[ii[keep]]
                b = ids[jj[keep]]
                outs.append(pd.DataFrame({
                    "a": np.minimum(a, b), "b": np.maximum(a, b),
                    "raw": raw[keep]}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    out = None
    for t in range(n_tables):
        # per-bucket contribution cap (EMB_BUCKET_CAP): bounds a
        # degenerate bucket's pair space to O(cap²); truncation
        # observable via emb_bucket_stats
        bk = _cap_buckets(
            hyperplane_buckets_exact(df, n_planes, seed + 1000 * t,
                                     id_col, vec_col, dim,
                                     carry_vec=True),
            bucket_cap, ["bucket"], order_col="vec_id")
        pairs_t = bk.groupBy("bucket").applyInPandas(
            pair_kernel, schema="a long, b long, raw double")
        out = pairs_t if out is None else out.unionByName(pairs_t)
    return (out.distinct()
            .where(F.col("raw") >= threshold)
            .select("a", "b", F.round("raw", ROUND_DP).alias("cos")))


def emb_bucket_stats(df: DataFrame, n_planes: int = 6, n_tables: int = 3,
                     seed: int = 42, bucket_cap: int = EMB_BUCKET_CAP,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     dim: int = 64) -> dict:
    """Truncation observability for the capped embedding-LSH dup join
    (the no-silent-caps rule): per-table bucket census → {n_buckets,
    n_capped_buckets, dropped_members, max_bucket}."""
    counts = None
    for t in range(n_tables):
        bk = hyperplane_buckets_exact(df, n_planes, seed + 1000 * t,
                                      id_col, vec_col, dim)
        c = (bk.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
             .withColumn("table", F.lit(t)))
        counts = c if counts is None else counts.unionByName(c)
    row = counts.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("n") > bucket_cap).cast("long")).alias("n_capped"),
        F.sum(F.greatest(F.col("n") - bucket_cap, F.lit(0))).alias("dropped"),
        F.max("n").alias("max_bucket"),
    ).collect()[0]
    return {"n_buckets": int(row["n_buckets"] or 0),
            "n_capped_buckets": int(row["n_capped"] or 0),
            "dropped_members": int(row["dropped"] or 0),
            "max_bucket": int(row["max_bucket"] or 0),
            "bucket_cap": int(bucket_cap)}


def cosine_dup_pairs(df: DataFrame, threshold: float = 0.98,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     n_chunks: int = 8) -> DataFrame:
    """SMALL-INPUT verify helper: all-pairs cosine ≥ threshold via
    blocked matrix multiply (chunk pairs cross-join, one numpy GEMM per
    pair in an Arrow kernel). Quadratic in chunk pairs and a chunk is a
    single collect_list row — use ONLY on bounded inputs (a candidate
    subset, a verification sample). The scale path for discovery is
    lsh_verified_cosine_dups above. A pure higher-order-function
    formulation is ~50× slower: Spark evaluates array lambdas
    interpreted, per element."""
    import numpy as np
    import pandas as pd

    chunk = F.pmod(F.col(id_col), F.lit(n_chunks)).cast("int")
    blocks = (
        df.select(chunk.alias("chunk"), F.col(id_col).alias("vid"),
                  F.col(vec_col).alias("v"))
        .groupBy("chunk")
        .agg(F.collect_list(F.struct("vid", "v")).alias("rows"))
    )
    a = blocks.select(F.col("chunk").alias("ca"), F.col("rows").alias("ra"))
    b = blocks.select(F.col("chunk").alias("cb"), F.col("rows").alias("rb"))
    pairs = a.join(b, F.col("ca") <= F.col("cb"))

    thr = float(threshold)

    def kernel(batches):
        for batch in batches:
            out_a, out_b, out_c = [], [], []
            for ra, rb, same in zip(batch["ra"], batch["rb"],
                                    (batch["ca"] == batch["cb"])):
                ia = np.array([r["vid"] for r in ra], dtype=np.int64)
                ib = np.array([r["vid"] for r in rb], dtype=np.int64)
                ma = np.array([r["v"] for r in ra], dtype=np.float64)
                mb = np.array([r["v"] for r in rb], dtype=np.float64)
                na = np.sqrt((ma * ma).sum(axis=1))
                nb = np.sqrt((mb * mb).sum(axis=1))
                cos = (ma @ mb.T) / np.outer(na, nb)
                ii, jj = np.nonzero(cos >= thr)
                aa, bb = ia[ii], ib[jj]
                # each unordered chunk pair is visited once (ca <= cb):
                # normalize ids to (min, max) and drop self-pairs — a
                # bare aa < bb filter would lose cross-chunk pairs whose
                # larger vid lives in the smaller chunk
                # same-chunk blocks see each (i, j) twice → keep aa<bb;
                # distinct chunks see the pair once → keep both orders,
                # normalized
                keep = (aa < bb) if same else (aa != bb)
                lo = np.minimum(aa[keep], bb[keep])
                hi = np.maximum(aa[keep], bb[keep])
                out_a.append(lo); out_b.append(hi)
                out_c.append(cos[ii, jj][keep])
            if out_a:
                yield pd.DataFrame({
                    "a": np.concatenate(out_a),
                    "b": np.concatenate(out_b),
                    "raw": np.concatenate(out_c),
                })

    res = pairs.mapInPandas(kernel, schema="a long, b long, raw double")
    return res.select("a", "b", F.round("raw", ROUND_DP).alias("cos"))


def spherical_kmeans_centroids(df: DataFrame, k: int = 16, dim: int = 64,
                               seed: int = 42, sample: int = 4096,
                               iters: int = 10,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding"):
    """Driver-side spherical k-means (Lloyd's on cosine) over a
    deterministic sample — the IVF coarse quantizer. The sample is tiny
    and the centroid matrix broadcasts; training never shuffles the
    corpus."""
    import numpy as np

    rows = (df.orderBy(id_col).limit(sample)
              .select(vec_col).collect())
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            m = X[assign == j]
            if len(m):
                c = m.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def ivf_assign(df: DataFrame, centroids, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cluster): nearest-centroid assignment via one numpy
    GEMM per Arrow batch (broadcast centroids, no shuffle)."""
    import numpy as np
    import pandas as pd

    C = centroids.tolist()

    def kernel(batches):
        Cm = np.array(C, dtype=np.float64)
        for b in batches:
            X = np.array(list(b[vec_col]), dtype=np.float64)
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame({
                "vec_id": b[id_col].to_numpy(),
                "cluster": np.argmax(X @ Cm.T, axis=1).astype(np.int32),
            })

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kernel, schema="vec_id long, cluster int")


def ivf_topk(df: DataFrame, query_ids: list[int], k: int = 10,
             n_clusters: int | None = None, nprobe: int | None = None,
             seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, n_corpus: int | None = None,
             stats: dict | None = None) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into n_clusters inverted
    lists; each query probes its nprobe nearest centroids and scores
    exactly within them. Cost ∝ nprobe/n_clusters of the corpus per
    query; the corpus shuffles once on cluster id. Approximate by
    construction (recall tunable via nprobe).

    Scale rule (defaults): n_clusters ≈ √N (the standard IVF sizing —
    probe work and list length balance), nprobe = n_clusters/8 clamped
    to ≥4 — so the probed fraction shrinks as 1/√N: 500 vectors → 22
    lists/4 probes (18%); 50k → 223/27 (12%); 1B → 31623/3952 (0.04%
    of the corpus per query). stats (optional dict) receives
    {n_clusters, nprobe, probe_fraction}."""
    import math

    import numpy as np

    from pyspark.sql.window import Window

    if n_clusters is None or nprobe is None:
        if n_corpus is None:
            n_corpus = df.count()
        if n_clusters is None:
            n_clusters = max(16, int(math.isqrt(max(n_corpus, 1))))
        if nprobe is None:
            nprobe = max(4, n_clusters // 8)
    nprobe = min(nprobe, n_clusters)
    if stats is not None:
        stats.update(n_clusters=n_clusters, nprobe=nprobe,
                     probe_fraction=nprobe / float(n_clusters))

    C = spherical_kmeans_centroids(df, n_clusters, dim, seed,
                                   sample=max(4096, 32 * n_clusters),
                                   id_col=id_col, vec_col=vec_col)
    assign = ivf_assign(df, C, id_col, vec_col)
    base = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    vecs = base.join(assign, "vec_id")

    # queries' nprobe nearest clusters (driver-side: queries are few)
    qrows = df.where(F.col(id_col).isin(query_ids)) \
              .select(F.col(id_col).alias("q"), F.col(vec_col).alias("qv")).collect()
    probes = []
    for r in qrows:
        x = np.array(r["qv"], dtype=np.float64)
        x = x / max(np.linalg.norm(x), 1e-12)
        near = np.argsort(-(C @ x))[:nprobe]
        probes.extend((int(r["q"]), int(c)) for c in near)
    spark = df.sparkSession
    probe_df = spark.createDataFrame(probes, ["q", "cluster"])

    cand = vecs.join(F.broadcast(probe_df), "cluster") \
               .where(F.col("vec_id") != F.col("q"))
    qv = base.where(F.col("vec_id").isin(query_ids)) \
             .select(F.col("vec_id").alias("q"), F.col("v").alias("qv"))
    cos = _cos_pairs_kernel(
        cand.join(F.broadcast(qv), "q").select("q", "vec_id", "qv", "v"),
        "qv", "v", [("q", "long"), ("vec_id", "long")])
    w = Window.partitionBy("q").orderBy(F.round(F.col("raw"), ORDER_DP).desc(), F.asc("vec_id"))
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", "vec_id", F.round("raw", ROUND_DP).alias("cos"), "rank")
    )


TARGET_BUCKET = 64  # desired mean vectors per LSH bucket at any corpus size
MAX_PLANES = 24


def adaptive_n_planes(n_corpus: int) -> int:
    """Scale rule for sign-LSH bucket granularity: enough planes that a
    bucket holds ~TARGET_BUCKET vectors (n / 2^planes ≈ TARGET_BUCKET),
    clamped to [4, MAX_PLANES]. 500 vectors → 4 planes (the sandbox
    gate); 50k → 10; 4M → 16; 1B → 24 — the 16–24-plane regime a
    100 TB corpus needs falls out of the same rule that the small
    fixtures pass through."""
    import math

    if n_corpus <= 1:
        return 4
    return max(4, min(MAX_PLANES, math.ceil(math.log2(n_corpus / TARGET_BUCKET))))


def lsh_buckets_kernel(df: DataFrame, n_planes: int, seed: int = 42,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       dim: int = 64) -> DataFrame:
    """Integer sign-LSH buckets via one numpy GEMM per Arrow batch —
    the scale-path bucket assigner (the expression form in
    hyperplane_lsh_buckets evaluates n_planes × dim interpreted lambda
    steps per row; the kernel is one (batch × dim) @ (dim × planes)
    multiply). bucket = Σ_i (sign(<v, h_i>) ≥ 0) << i, same planes and
    sign convention as the expression form (parity asserted in tests).
    """
    import numpy as np
    import pandas as pd

    P = lsh_planes(n_planes, seed, dim).T.tolist()  # dim × planes

    def kernel(batches):
        Pm = np.array(P, dtype=np.float64)
        w = (np.int64(1) << np.arange(Pm.shape[1], dtype=np.int64))
        for b in batches:
            X = np.array(list(b[vec_col]), dtype=np.float64)
            bits = (X @ Pm) >= 0.0
            yield pd.DataFrame({
                "vec_id": b[id_col].to_numpy(),
                "bucket": bits.astype(np.int64) @ w,
            })

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kernel, schema="vec_id long, bucket long")


def hyperplane_buckets_exact(df: DataFrame, n_planes: int = 8, seed: int = 42,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             dim: int = 64,
                             carry_vec: bool = False) -> DataFrame:
    """Arrow-kernel twin of hyperplane_lsh_buckets: identical bucket
    STRINGS (same planes, same sign convention, and — crucially — the
    same left-to-right fold for each <v, h> dot as the Catalyst
    expression and the DuckDB oracle's list_sum, so a near-zero dot
    cannot flip a sign bit between engines). One vectorized FMA per
    dimension instead of n_planes × dim interpreted lambda steps.
    carry_vec=True additionally passes the vector through as `v` (for
    per-bucket verify kernels)."""
    import numpy as np
    import pandas as pd

    P_list = lsh_planes(n_planes, seed, dim).tolist()  # planes × dim
    schema = "vec_id long, bucket string"
    if carry_vec:
        schema += ", v array<float>"

    def kernel(batches):
        P = np.asarray(P_list, dtype=np.float64)
        for b in batches:
            if len(b) == 0:
                continue
            X = np.asarray(list(b[vec_col]), dtype=np.float64)
            acc = np.zeros((len(X), P.shape[0]), dtype=np.float64)
            for j in range(P.shape[1]):
                acc += X[:, j][:, None] * P[:, j][None, :]
            bits = np.where(acc >= 0.0, "1", "0")
            frame = {
                "vec_id": b[id_col],
                "bucket": ["".join(r) for r in bits],
            }
            if carry_vec:
                frame["v"] = b[vec_col]
            yield pd.DataFrame(frame)

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kernel, schema=schema)


def hyperplane_lsh_buckets(df: DataFrame, n_planes: int = 8, seed: int = 42,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit string of <v, h_i> for
    n_planes deterministic pseudo-random hyperplanes (seeded, generated
    driver-side). Returns (vec_id, bucket). Scale path for ANN: group by
    bucket, search within buckets (+ multi-probe neighbors)."""
    planes = lsh_planes(n_planes, seed, dim)
    bits = []
    for i in range(n_planes):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        bits.append(F.when(_dot(F.col(vec_col), h) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(F.col(id_col).alias("vec_id"), F.concat(*bits).alias("bucket"))


def lsh_topk(df: DataFrame, query_ids: list[int], k: int = 10,
             n_planes: int | None = None, seed: int = 42, n_tables: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, n_corpus: int | None = None,
             stats: dict | None = None, where=None) -> DataFrame:
    """Bucketed ANN with multi-probe: exact cosine within the query's
    LSH bucket plus every bucket at Hamming distance 1 (flip one plane
    sign) — the standard recall repair for sign-LSH. Approximate by
    construction; the brute-force op is the small-scale oracle.

    Scale shape: buckets are INTEGER keys from one numpy GEMM per Arrow
    batch (lsh_buckets_kernel — the expression form costs n_planes × dim
    interpreted lambda steps per row); the corpus side shuffles once per
    table on bucket; the probe set per query is n_planes+1 buckets, so
    cost ∝ n_tables·(n_planes+1)/2^n_planes of the corpus. n_planes
    defaults to the adaptive rule (bucket ≈ TARGET_BUCKET vectors at any
    corpus size — adaptive_n_planes), so the probed FRACTION falls as
    the corpus grows. stats (optional dict) receives
    {n_planes, probe_fraction_bound} for recall gates.

    where: optional Column predicate restricting the SEARCHED corpus
    (filtered ANN): applied to the corpus bucket side BEFORE the probe
    join — bucket membership shrinks at the scan, so selectivity makes
    probing cheaper; query vectors still resolve from the full table."""
    from pyspark.sql.window import Window

    if n_planes is None:
        if n_corpus is None:
            n_corpus = df.count()
        n_planes = adaptive_n_planes(n_corpus)
    if stats is not None:
        stats["n_planes"] = n_planes
        stats["probe_fraction_bound"] = min(
            1.0, n_tables * (n_planes + 1) / float(2 ** n_planes))

    import numpy as np
    import pandas as pd

    corpus = df.where(where) if where is not None else df
    base = corpus.select(F.col(id_col).alias("vec_id"),
                         F.col(vec_col).alias("v"))
    # query vectors come from the FULL table: a query doc that the
    # filter excludes from the corpus still probes
    qvecs = (df.where(F.col(id_col).isin(query_ids))
             .select(F.col(id_col).alias("q"), F.col(vec_col).alias("qv")))

    # ONE kernel pass emits every table's integer bucket (n_tables GEMMs
    # over each Arrow batch) instead of n_tables separate corpus scans +
    # join branches; query buckets are computed driver-side with the
    # SAME (rows × dim) @ (dim × planes) matmul shape, so a query's own
    # bucket always matches its corpus-side assignment bit-for-bit
    plane_mats = [lsh_planes(n_planes, seed + 1000 * t, dim).T.tolist()
                  for t in range(n_tables)]
    wts = (np.int64(1) << np.arange(n_planes, dtype=np.int64))

    def kernel(batches):
        Pms = [np.asarray(p, dtype=np.float64) for p in plane_mats]
        for b in batches:
            if len(b) == 0:
                continue
            X = np.asarray(list(b[vec_col]), dtype=np.float64)
            ids = b[id_col].to_numpy()
            frames = []
            for t, Pm in enumerate(Pms):
                bits = (X @ Pm) >= 0.0
                frames.append(pd.DataFrame({
                    "vec_id": ids, "t": np.int32(t),
                    "bucket": bits.astype(np.int64) @ wts}))
            yield pd.concat(frames, ignore_index=True)

    bk_all = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kernel, schema="vec_id long, t int, bucket long")

    # multi-probe set per (query, table): the bucket itself + each
    # one-bit flip, built driver-side (queries are few by contract)
    qrows = (df.where(F.col(id_col).isin(query_ids))
             .select(F.col(id_col), F.col(vec_col)).collect())
    probe_rows = []
    if qrows:
        Xq = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
        for t, p in enumerate(plane_mats):
            qb = ((Xq @ np.asarray(p, dtype=np.float64)) >= 0.0
                  ).astype(np.int64) @ wts
            for r, b0 in zip(qrows, qb):
                probe_rows.append((int(r[0]), t, int(b0)))
                probe_rows.extend((int(r[0]), t, int(b0) ^ (1 << i))
                                  for i in range(n_planes))
    probe_df = df.sparkSession.createDataFrame(
        probe_rows or [], "q long, t int, bucket long")
    cand = (
        bk_all.join(F.broadcast(probe_df), ["t", "bucket"])
        .select("q", "vec_id").distinct()
        .where(F.col("vec_id") != F.col("q"))
        .join(base, "vec_id")
        .join(F.broadcast(qvecs), "q")
    )
    cos = _cos_pairs_kernel(cand.select("q", "vec_id", "qv", "v"),
                            "qv", "v", [("q", "long"), ("vec_id", "long")])
    w = Window.partitionBy("q").orderBy(F.round(F.col("raw"), ORDER_DP).desc(), F.asc("vec_id"))
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", "vec_id", F.round("raw", ROUND_DP).alias("cos"), "rank")
    )
