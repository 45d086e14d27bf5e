"""Federated search over multiple published indexes (the cross-index
alias / multi-index search analogue: one query over `index-a,index-b`
with CORPUS-GLOBAL relevance).

Federation is a MANIFEST-LEVEL merge, by construction identical to the
engine's existing multi-generation model (plans/query.py module
docstring): an IndexSearcher already unions frozen generations and sums
their statistics, so a federated searcher is an IndexSearcher whose
generation set is the concatenation of every member index's
generations, with

  * generation ids remapped to ``i<member>/<gen>`` so same-named
    generations from different roots never collide in the
    (gen, shard) → files/doc-count maps;
  * N = Σ n_docs; avgdl = Σ(n_i · avgdl_i) / N (the token-weighted
    mean — the exact global avgdl up to float ulps, absorbed by the
    engine's rounding contracts);
  * df(term) summed across members by the existing dictionary merge.

The query path itself is UNCHANGED — no code in plans/query.py knows
whether its generations came from one root or five, which is the whole
argument for correctness: scores equal a single index built over the
union corpus (pinned by tests/test_federate.py at 1e-9).

Members must share the analyzer (normalization map) — federating
differently-analyzed indexes would silently mis-tokenize queries, so
it raises instead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from geospatial_spark.plans import lifecycle as lc
from geospatial_spark.plans.query import IndexSearcher


def federated_searcher(spark: SparkSession,
                       roots: list[str]) -> IndexSearcher:
    """One IndexSearcher over every published generation of ``roots``."""
    if not roots:
        raise ValueError("federated_searcher needs at least one root")
    members = [IndexSearcher(spark, r) for r in roots]

    norm0 = members[0].manifest.get("normalization") or {}
    for m in members[1:]:
        if (m.manifest.get("normalization") or {}) != norm0:
            raise ValueError(
                "federated members use different normalization maps — "
                "rebuild with a shared analyzer before federating")

    s = IndexSearcher.__new__(IndexSearcher)
    s.spark = spark
    s.root = ",".join(roots)
    s.n_docs = sum(m.n_docs for m in members)
    # token-weighted mean: Σ(n_i · avgdl_i) recovers total tokens
    s.avgdl = (sum(m.n_docs * m.avgdl for m in members) / s.n_docs
               if s.n_docs else 0.0)
    s.manifest = {
        "state": lc.STATE_AVAILABLE,
        "normalization": norm0,
        "positions": all(m.manifest.get("positions", True)
                         for m in members),
        "n_docs": s.n_docs,
        "avgdl": s.avgdl,
        "federated_roots": list(roots),
        "generation": None,
    }
    s.gens, s.gdirs = [], {}
    s.seg_files, s.docmap_files, s.shard_docs = {}, {}, {}
    for i, m in enumerate(members):
        for g in m.gens:
            gid = f"i{i}/{g['id']}"
            s.gens.append({**g, "id": gid})
            s.gdirs[gid] = m.gdirs[g["id"]]
            s.seg_files[gid] = m.seg_files[g["id"]]
            for (old_gid, sh), name in m.docmap_files.items():
                if old_gid == g["id"]:
                    s.docmap_files[(gid, sh)] = name
            for (old_gid, sh), n in m.shard_docs.items():
                if old_gid == g["id"]:
                    s.shard_docs[(gid, sh)] = n
    total_terms = sum(int(g.get("n_terms", 0)) for g in s.gens)
    s._dict_small = total_terms <= IndexSearcher.DICT_CACHE_MAX
    s._dict = None
    s.gdir = None  # single-generation convenience does not apply
    return s
