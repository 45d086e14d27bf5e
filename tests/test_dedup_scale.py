"""Scale hardening for LSH dedup: exact-dup pre-collapse keeps a
boilerplate cluster out of the bucket self-join, and the per-bucket cap
bounds the pathological bucket that remains. Output parity with the
uncollapsed pipeline is asserted on the regular fixture."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def planted(spark):
    """10 000 byte-identical boilerplate docs + 30 distinct docs."""
    n_dup = 10_000
    boiler = ("subscribe to our newsletter for updates terms of service "
              "privacy policy all rights reserved contact us about")
    rows = [{"doc_id": i, "text": boiler} for i in range(n_dup)]
    rows += [{"doc_id": n_dup + i,
              "text": f"unique document number {i} about topic {i % 7} "
                      f"with some distinct content tail {i * 13}"}
             for i in range(30)]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_planted_cluster_bounded(spark, planted):
    """The 10k-identical cluster must flow through discovery as ONE
    representative (linear edges), and dup_groups must still assign
    every member the correct canonical/size."""
    from geospatial_spark.operators.dedup import (
        _collapsed_rep_pairs,
        dup_groups,
    )

    rep_pairs, groups = _collapsed_rep_pairs(planted, "doc_id", "text",
                                             0.8, 4, 1024)
    # one representative per distinct text → the boilerplate cluster is
    # a single discovery-side row; membership stays full-size
    n_reps = groups.select("_rep").distinct().count()
    assert n_reps == 31
    assert groups.count() == 10_030
    # rep-level verified pairs stay tiny (no boilerplate blowup)
    assert rep_pairs.count() < 200

    out = dup_groups(planted, "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 10_030
    for i in (0, 1, 5000, 9999):
        assert by_id[i]["canonical_id"] == 0
        assert by_id[i]["group_size"] == 10_000


def test_bucket_cap_bounds_pairs(spark):
    """Distinct docs colliding into one signature bucket (synthetic
    sigs): the cap bounds the self-join and the stats report what was
    dropped."""
    from geospatial_spark.operators.dedup import (
        LSH_BANDS,
        lsh_bucket_stats,
        lsh_candidate_pairs,
    )

    n = 100
    sigs = spark.createDataFrame(pd.DataFrame(
        [{"doc_id": f"d{i:04d}", **{f"sig_{j}": "deadbeef" for j in range(16)}}
         for i in range(n)]))
    capped = lsh_candidate_pairs(sigs, bucket_cap=10)
    assert capped.count() == 10 * 9 // 2  # C(cap, 2), not C(100, 2)
    uncapped = lsh_candidate_pairs(sigs, bucket_cap=None)
    assert uncapped.count() == n * (n - 1) // 2

    stats = lsh_bucket_stats(sigs, bucket_cap=10)
    assert stats["n_capped_buckets"] == LSH_BANDS
    assert stats["dropped_members"] == LSH_BANDS * (n - 10)
    assert stats["max_bucket"] == n


def test_collapse_parity_small(spark, small_transcripts):
    """Collapsed and uncollapsed pipelines emit identical rows on the
    regular fixture (exact dups included by the fixture's duplicate-text
    edge rows)."""
    from geospatial_spark.operators.dedup import (
        lsh_verified_dups,
        minhash_signatures,
    )
    from geospatial_spark.sources.transcripts import with_doc_id

    docs = with_doc_id(small_transcripts).select("doc_id", "text")

    a = sorted(map(tuple, minhash_signatures(docs, "doc_id").collect()))
    b = sorted(map(tuple, minhash_signatures(
        docs, "doc_id", collapse_exact=False).collect()))
    assert a == b

    va = sorted(map(tuple, lsh_verified_dups(docs, "doc_id").collect()))
    vb = sorted(map(tuple, lsh_verified_dups(
        docs, "doc_id", collapse_exact=False).collect()))
    assert va == vb


def test_emb_bucket_cap(spark):
    """A cluster of identical embeddings shares every sign bit — the
    cap bounds its self-join; parity when the cap is above bucket."""
    from geospatial_spark.operators.similarity import (
        emb_bucket_stats,
        lsh_verified_cosine_dups,
    )

    rows = [{"vec_id": i, "embedding": [1.0, 2.0, -1.0, 0.5]}
            for i in range(50)]
    rows += [{"vec_id": 100 + i,
              "embedding": [float(i % 3) - 1.2, 1.0, float(i % 5), -2.0]}
             for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    capped = lsh_verified_cosine_dups(df, threshold=0.99, n_planes=3,
                                      n_tables=1, dim=4, bucket_cap=5)
    # the 50-identical cluster contributes at most C(5,2) pairs
    ident = capped.where((F.col("a") < 50) & (F.col("b") < 50)).count()
    assert ident <= 10
    stats = emb_bucket_stats(df, n_planes=3, n_tables=1, bucket_cap=5,
                             dim=4)
    assert stats["n_capped_buckets"] >= 1
    assert stats["dropped_members"] >= 45
