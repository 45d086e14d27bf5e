"""M6 gate: resumable build — kill/rerun semantics via per-shard
fingerprint checkpoints (the shouldUpdate sha256-skip analogue,
DatasourceUpdateService.java:282-292) + generation/manifest lifecycle."""

from __future__ import annotations

import json
from pathlib import Path


def _build(spark, df, root, **kw):
    from geospatial_spark.plans.build import build_index

    return build_index(spark, df, root, n_shards=4, **kw)


def test_rerun_skips_all_shards(spark, tiny_transcripts, tmp_path):
    root = str(tmp_path / "idx")
    m1 = _build(spark, tiny_transcripts, root)
    assert all(s["skipped"] == 0 for s in m1["shards"])
    m2 = _build(spark, tiny_transcripts, root)
    assert all(s["skipped"] == 1 for s in m2["shards"])  # idempotent re-run
    # stats identical
    assert m1["n_docs"] == m2["n_docs"]
    assert m1["avgdl"] == m2["avgdl"]


def test_partial_resume_rebuilds_only_missing(spark, tiny_transcripts, tmp_path):
    from geospatial_spark.plans import lifecycle as lc

    root = str(tmp_path / "idx")
    m1 = _build(spark, tiny_transcripts, root)
    gdir = lc.gen_dir(root, m1["generation"])
    # simulate a killed build: shard 2's artifacts vanish
    lc.segment_path(gdir, 2).unlink()
    lc.checkpoint_path(gdir, 2).unlink()

    m2 = _build(spark, tiny_transcripts, root)
    skipped = {s["shard"]: s["skipped"] for s in m2["shards"]}
    assert skipped[2] == 0          # rebuilt
    assert all(v == 1 for sh, v in skipped.items() if sh != 2)
    assert lc.segment_path(gdir, 2).exists()


def test_stale_checkpoint_fingerprint_mismatch_rebuilds(spark, tiny_transcripts, tmp_path):
    from geospatial_spark.plans import lifecycle as lc

    root = str(tmp_path / "idx")
    m1 = _build(spark, tiny_transcripts, root)
    gdir = lc.gen_dir(root, m1["generation"])
    cp = lc.checkpoint_path(gdir, 1)
    stale = json.loads(cp.read_text())
    stale["fingerprint"] = "deadbeef"
    cp.write_text(json.dumps(stale))

    m2 = _build(spark, tiny_transcripts, root)
    skipped = {s["shard"]: s["skipped"] for s in m2["shards"]}
    assert skipped[1] == 0


def test_new_generation_and_swap(spark, tiny_transcripts, tmp_path):
    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path / "idx")
    _build(spark, tiny_transcripts, root, generation="g0001")
    _build(spark, tiny_transcripts, root, generation="g0002")
    m = lc.read_manifest(root)
    assert m["generation"] == "g0002"
    assert lc.list_generations(root) == ["g0001", "g0002"]
    # searcher follows the manifest swap
    s = IndexSearcher(spark, root)
    assert s.gdir.name == "gen-g0002"
    # guarded delete: the default grace period protects the just-written
    # (non-live) generation a concurrent writer might still be swapping
    assert lc.delete_unused_generations(root) == []
    assert lc.list_generations(root) == ["g0001", "g0002"]
    # with the grace waived, only the current generation survives
    deleted = lc.delete_unused_generations(root, grace_seconds=0.0)
    assert deleted == ["g0001"]
    assert lc.list_generations(root) == ["g0002"]


def test_empty_corpus_build_and_search(spark, tiny_transcripts, tmp_path):
    """Zero-row input: build publishes an AVAILABLE empty index; both
    searchers return empty results without errors."""
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    root = str(tmp_path / "idx")
    empty = tiny_transcripts.limit(0)
    m = build_index(spark, empty, root, n_shards=2)
    assert m["state"] == "AVAILABLE"
    assert m["n_docs"] == 0 and m["avgdl"] == 0.0
    assert m["generations"] == []  # empty generations never listed
    assert IndexSearcher(spark, root).search("spark", 5) == []
    assert LocalSearcher(root).search("spark", 5) == []


def test_empty_append_does_not_poison_live_index(spark, tiny_transcripts,
                                                 small_oracle, tmp_path):
    """Appending a zero-doc batch onto a live index must leave queries
    working (the empty generation has no files — it must not be listed)."""
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    root = str(tmp_path / "idx")
    build_index(spark, tiny_transcripts, root, n_shards=2)
    before = IndexSearcher(spark, root).search("the spark", 5)
    assert before
    m = build_index(spark, tiny_transcripts.limit(0), root,
                    n_shards=2, generation="g-empty", append=True)
    assert all(g["id"] != "g-empty" for g in m["generations"])
    assert IndexSearcher(spark, root).search("the spark", 5) == before
    assert LocalSearcher(root).search("the spark", 5) == before


def test_expired_index_predicate(spark, tiny_transcripts, tmp_path):
    """P6: a searcher with max_age refuses an expired index (the
    ip2geo_data_expired analogue)."""
    import pytest

    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path / "idx")
    _build(spark, tiny_transcripts, root)
    # generous age: fine
    IndexSearcher(spark, root, max_age_seconds=3600)
    with pytest.raises(ValueError, match="index_data_expired"):
        IndexSearcher(spark, root, max_age_seconds=0.0)


def test_failed_build_marks_create_failed(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path / "idx")
    # poison: text column is numeric → tokenizer raises inside the kernel
    spark_df = spark.range(3).select(
        F.lit("c").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("id").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    with pytest.raises(Exception):
        build_index(spark, spark_df, root, n_shards=2, generation="gX")
    # no AVAILABLE manifest was published; CREATE_FAILED marker exists
    assert lc.read_manifest(root) is None
    markers = list(Path(root).glob("manifest.FAILED-*.json"))
    assert len(markers) == 1
    assert json.loads(markers[0].read_text())["state"] == "CREATE_FAILED"


def test_concurrent_build_refused(spark, tiny_transcripts, tmp_path):
    """Second concurrent build of one index root raises (the
    ConcurrentModificationException analogue)."""
    import pytest

    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path / "idx")
    with lc.BuildLock(root, owner="other-writer"):
        assert lc.lock_is_held(root)
        with pytest.raises(lc.ConcurrentBuildError, match="being built"):
            build_index(spark, tiny_transcripts, root, n_shards=2)
    # lock released → build proceeds
    assert not lc.lock_is_held(root)
    m = build_index(spark, tiny_transcripts, root, n_shards=2)
    assert m["state"] == "AVAILABLE"


def test_stale_lock_is_broken(spark, tiny_transcripts, tmp_path):
    """A lock whose heartbeat died (old mtime) must not block forever."""
    import os
    import time

    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.build import build_index

    root = tmp_path / "idx"
    root.mkdir()
    p = lc.lock_path(root)
    p.write_text('{"owner": "dead", "pid": 0}')
    old = time.time() - lc.LOCK_STALE_SECONDS - 5
    os.utime(p, (old, old))
    assert not lc.lock_is_held(root)
    m = build_index(spark, tiny_transcripts, str(root), n_shards=2)
    assert m["state"] == "AVAILABLE"
    assert not p.exists()  # released after the build


def test_build_history_recorded(spark, tiny_transcripts, tmp_path):
    """Manifest keeps a per-build audit trail (update-stats analogue):
    duration + skipped/rebuilt shard counts across builds."""
    root = str(tmp_path / "idx")
    m1 = _build(spark, tiny_transcripts, root)
    h = m1["build_history"]
    assert len(h) == 1
    assert h[0]["shards_rebuilt"] == 4 and h[0]["shards_skipped"] == 0
    assert h[0]["finished_at_unix"] >= h[0]["started_at_unix"]
    assert h[0]["error"] is None
    m2 = _build(spark, tiny_transcripts, root)  # resume: all skipped
    h2 = m2["build_history"]
    assert len(h2) == 2
    assert h2[1]["shards_skipped"] == 4 and h2[1]["shards_rebuilt"] == 0


def test_missing_generation_refuses_serving(spark, tiny_transcripts, tmp_path):
    """Manifest lists a generation whose dir is gone (partial restore):
    searchers refuse with a force-rebuild error; reconciliation names it."""
    import shutil

    import pytest

    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    root = str(tmp_path / "idx")
    m = _build(spark, tiny_transcripts, root)
    shutil.rmtree(lc.gen_dir(root, m["generation"]))
    assert lc.missing_generations(root) == [m["generation"]]
    with pytest.raises(ValueError, match="index_generations_missing"):
        IndexSearcher(spark, root)
    with pytest.raises(ValueError, match="index_generations_missing"):
        LocalSearcher(root)
    # force rebuild reconciles
    _build(spark, tiny_transcripts, root)
    assert lc.missing_generations(root) == []
    assert IndexSearcher(spark, root).search("the spark", 3)


def test_append_inherits_normalization(spark, tiny_transcripts, tmp_path):
    """Delta builds inherit the prior manifest's normalization; passing a
    different map is refused (stats would go inconsistent across gens)."""
    import pytest

    from geospatial_spark.plans.build import build_index

    root = str(tmp_path / "idx")
    norm = {"sparc": "spark"}
    build_index(spark, tiny_transcripts, root, n_shards=2,
                generation="g0001", normalization=norm)
    m2 = build_index(spark, tiny_transcripts.limit(2), root, n_shards=2,
                     generation="g0002", append=True)  # none passed
    assert m2["normalization"] == norm  # inherited, not overwritten
    with pytest.raises(ValueError, match="normalization"):
        build_index(spark, tiny_transcripts, root, n_shards=2,
                    generation="g0003", append=True,
                    normalization={"different": "map"})
