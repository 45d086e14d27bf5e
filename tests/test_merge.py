"""Segment-merge compaction gates: merging delta generations must be
result-identical to a single full rebuild — same scores, same ranks,
same tie-breaks, phrase/bool/near included — without touching source
text."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def merged_root(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.compact import merge_generations

    root = str(tmp_path_factory.mktemp("mergeidx") / "idx")
    parts = [small_transcripts.where(F.crc32(F.col("conv_id")) % 3 == i)
             for i in range(3)]
    build_index(spark, parts[0], root, n_shards=3, generation="g0001",
                hot_df_copy=32)
    build_index(spark, parts[1], root, n_shards=2, generation="g0002",
                append=True, hot_df_copy=32)
    build_index(spark, parts[2], root, n_shards=4, generation="g0003",
                append=True, hot_df_copy=32)
    m = merge_generations(spark, root, n_shards=4, hot_df_copy=32)
    return root, m


def test_merge_manifest(merged_root, small_oracle):
    root, m = merged_root
    assert len(m["generations"]) == 1
    assert m["generations"][0]["id"].startswith("merge-")
    assert m["n_docs"] == small_oracle.n_docs
    assert math.isclose(m["avgdl"], small_oracle.avgdl, rel_tol=1e-12)
    last = m["build_history"][-1]
    assert last["merged_from"] == ["g0001", "g0002", "g0003"]


def test_merge_search_identical_to_oracle(spark, merged_root, small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher
    from tests.conftest import QUERIES

    root, _ = merged_root
    s = IndexSearcher(spark, root)
    ls = LocalSearcher(root)
    for q in QUERIES:
        want = small_oracle.search(q, 10)
        for got in (s.search(q, 10), ls.search(q, 10)):
            assert [d for d, _ in got] == [d for d, _ in want], q
            for (gd, gs), (_, ws) in zip(got, want):
                assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), (q, gd)


def test_merge_phrase_and_bool(spark, merged_root, small_oracle,
                               small_transcripts_pd):
    from geospatial_spark.plans.query import IndexSearcher

    root, _ = merged_root
    rows = list(zip(small_transcripts_pd["conv_id"],
                    small_transcripts_pd["turn_idx"],
                    small_transcripts_pd["text"]))
    s = IndexSearcher(spark, root)
    for p in ["deploy the", "the the", "the spark"]:
        got = s.search_phrase(p, 10)
        want = [(d, sc) for d, sc, _ in small_oracle.search_phrase(rows, p, 10)]
        assert [d for d, _ in got] == [d for d, _ in want], p
        for (gd, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), (p, gd)
    got = s.search_near("deploy spark", 3, 10)
    want = [(d, sc) for d, sc, _ in small_oracle.search_near(rows, "deploy spark", 3, 10)]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_merge_is_single_writer_guarded(spark, merged_root):
    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.compact import merge_generations

    root, _ = merged_root
    with lc.BuildLock(root, owner="other"):
        with pytest.raises(lc.ConcurrentBuildError):
            merge_generations(spark, root)


def test_merge_with_duplicate_doc_ids(spark, tiny_transcripts,
                                      tmp_path_factory):
    """append never dedupes: the same doc_id can exist in two delta
    generations. The merge must preserve BOTH copies (result parity
    with the pre-merge index), keying ordinal mapping on provenance,
    not doc_id."""
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.compact import merge_generations
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path_factory.mktemp("dupidx") / "idx")
    build_index(spark, tiny_transcripts, root, n_shards=2, generation="g0001")
    build_index(spark, tiny_transcripts, root, n_shards=2, generation="g0002",
                append=True)
    before = IndexSearcher(spark, root).search("the spark", 10)
    m = merge_generations(spark, root, n_shards=2)
    assert m["n_docs"] == 2 * tiny_transcripts.count()
    after = IndexSearcher(spark, root).search("the spark", 10)
    # duplicate docs produce pairwise-equal hits; scores must match 1:1
    assert [(d, round(s, 9)) for d, s in after] == \
        [(d, round(s, 9)) for d, s in before]


def test_merge_noop_on_single_generation(spark, merged_root):
    from geospatial_spark.plans.compact import merge_generations

    root, m1 = merged_root
    m2 = merge_generations(spark, root)
    assert m2["generation"] == m1["generation"]


def test_force_reshard_single_generation(spark, small_transcripts,
                                         small_oracle, tmp_path_factory):
    """force=True reshards ONE generation through the co-located fast
    path (2 divides 4: destination shards read their source shards
    directly, no posting shuffle). Results must be identical to the
    pre-merge index, and saturated terms must gain impact copies at the
    bigger per-shard df."""
    import math

    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.compact import merge_generations
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path_factory.mktemp("reshard") / "idx")
    build_index(spark, small_transcripts, root, n_shards=4, hot_df_copy=64)
    before = IndexSearcher(spark, root)
    snaps = {q: before.search(q, 10)
             for q in ["the spark", "deploy the spark job", "the"]}

    m = merge_generations(spark, root, n_shards=2, force=True,
                          hot_df_copy=64)
    assert m["n_shards"] == 2
    assert len(m["generations"]) == 1
    after = IndexSearcher(spark, root)
    for q, want in snaps.items():
        got = after.search(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), (q, gd)

    # phrase still served (positions survived the reshard)
    pdf = small_transcripts.select("conv_id", "turn_idx", "text").toPandas()
    rows = list(zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]))
    ph = after.search_phrase("the spark", 5)
    want_ph = [(d, s) for d, s, _ in
               small_oracle.search_phrase(rows, "the spark", 5)]
    assert [d for d, _ in ph] == [d for d, _ in want_ph]
