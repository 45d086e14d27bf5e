"""Snapshot-pinned incremental source: unchanged snapshot → zero work;
delta snapshot → exactly one appended generation; manifest names the
snapshot it built from. (Round-3 verdict item #4; shouldUpdate
analogue, DatasourceUpdateService.java:282-292.)"""

from __future__ import annotations

import json

import pytest


@pytest.fixture()
def log_table(spark, small_transcripts_pd, tmp_path):
    from geospatial_spark.sources.snapshots import JsonSnapshotLog

    half = len(small_transcripts_pd) // 2
    first = spark.createDataFrame(small_transcripts_pd.iloc[:half])
    second = spark.createDataFrame(small_transcripts_pd.iloc[half:])
    log = JsonSnapshotLog(str(tmp_path / "table"))
    log.append(spark, first)
    return log, second


def test_unchanged_snapshot_skips_everything(spark, log_table, tmp_path):
    from geospatial_spark.sources.snapshots import incremental_build

    log, _second = log_table
    root = str(tmp_path / "idx")
    m1 = incremental_build(spark, log, root, n_shards=2)
    assert m1["source_snapshot"]["snapshot_id"] == \
        log.current_snapshot()["snapshot_id"]
    assert len(m1["generations"]) == 1

    m2 = incremental_build(spark, log, root, n_shards=2)
    # identical manifest — not even a re-publish happened
    assert m2["built_at_unix"] == m1["built_at_unix"]
    assert m2["generations"] == m1["generations"]


def test_delta_snapshot_appends_one_generation(spark, log_table, tmp_path,
                                               small_oracle,
                                               small_transcripts_pd):
    import math

    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.sources.snapshots import incremental_build

    log, second = log_table
    root = str(tmp_path / "idx")
    m1 = incremental_build(spark, log, root, n_shards=2)
    snap1 = m1["source_snapshot"]

    snap2 = log.append(spark, second)
    m2 = incremental_build(spark, log, root, n_shards=2)
    assert m2["source_snapshot"]["snapshot_id"] == snap2["snapshot_id"]
    assert len(m2["generations"]) == 2  # exactly one appended delta
    # the delta consumed ONLY the newly added files
    assert set(m2["source_snapshot"]["files_consumed"]) == \
        set(snap2["added_files"])
    assert snap1["snapshot_id"] != snap2["snapshot_id"]

    # scores over the merged generations equal the full-corpus oracle
    s = IndexSearcher(spark, root)
    for q in ["the spark", "deploy"]:
        got = s.search(q, 10)
        want = small_oracle.search(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), (q, gd)


def test_unknown_ancestor_full_rebuilds(spark, log_table, tmp_path):
    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.sources.snapshots import incremental_build

    log, second = log_table
    root = str(tmp_path / "idx")
    incremental_build(spark, log, root, n_shards=2)
    # corrupt the recorded snapshot id: the log cannot derive a delta
    m = lc.read_manifest(root)
    m["source_snapshot"]["snapshot_id"] = "not-a-real-snapshot"
    lc.publish_manifest(root, m)

    log.append(spark, second)
    m2 = incremental_build(spark, log, root, n_shards=2)
    # full rebuild: ONE generation covering the whole current file set
    assert len(m2["generations"]) == 1
    assert set(m2["source_snapshot"]["files_consumed"]) == \
        set(log.current_snapshot()["files"])


def test_iceberg_metadata_snapshot_pinning(tmp_path):
    """Real-Iceberg metadata JSON → snapshot id + lineage, pure
    Python (pinning/unchanged-detection; no Avro needed)."""
    from geospatial_spark.sources.snapshots import IcebergMetadataSource

    meta = tmp_path / "tbl" / "metadata"
    meta.mkdir(parents=True)
    md = {
        "format-version": 2,
        "last-sequence-number": 7,
        "current-snapshot-id": 4437197002876030991,
        "snapshots": [
            {"snapshot-id": 1111, "manifest-list": "metadata/snap-1.avro"},
            {"snapshot-id": 4437197002876030991,
             "parent-snapshot-id": 1111,
             "manifest-list": "metadata/snap-2.avro"},
        ],
    }
    (meta / "v3.metadata.json").write_text(json.dumps(md))
    (meta / "version-hint.text").write_text("3")

    src = IcebergMetadataSource(str(tmp_path / "tbl"))
    snap = src.current_snapshot()
    assert snap["snapshot_id"] == "4437197002876030991"
    assert snap["parent_id"] == "1111"
    assert snap["version"] == 7
    assert snap["manifest_list"] == "metadata/snap-2.avro"
    assert src.added_files("1111") is None  # declared: no Avro here


def test_metadata_only_repin_preserves_provenance(spark, log_table, tmp_path):
    """A snapshot change with an empty file delta re-pins the manifest
    WITHOUT rebuilding — and keeps the prior files_consumed (the files
    the index content actually came from), instead of clobbering the
    provenance with the empty delta. The re-pin publish happens under
    BuildLock (advisor round-3: lost-update window)."""
    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.sources.snapshots import incremental_build

    log, _second = log_table
    root = str(tmp_path / "idx")
    m1 = incremental_build(spark, log, root, n_shards=2)
    consumed1 = m1["source_snapshot"]["files_consumed"]
    assert consumed1  # the full build named its inputs

    # metadata-only change: new snapshot id, identical live file set
    cur = log.current_snapshot()
    snap = {"version": cur["version"] + 1,
            "snapshot_id": "meta-only-777",
            "parent_id": cur["snapshot_id"],
            "files": cur["files"],
            "added_files": []}
    lc.atomic_write_json(log.meta / f"v{snap['version']}.json", snap)
    lc.atomic_write_json(log.meta / "version-hint.text.json",
                         {"version": snap["version"]})

    m2 = incremental_build(spark, log, root, n_shards=2)
    assert m2["source_snapshot"]["snapshot_id"] == "meta-only-777"
    assert len(m2["generations"]) == 1           # no build happened
    assert m2["source_snapshot"]["files_consumed"] == consumed1


def test_unpinnable_current_snapshot_fails_descriptively(spark, tmp_path):
    """A current snapshot that cannot resolve to a plain data-file set
    (missing/unreadable manifest list) fails the full-rebuild branch
    with the reason — not a TypeError from read(None)."""
    import pytest

    from geospatial_spark.sources.snapshots import (
        IcebergMetadataSource,
        incremental_build,
    )

    meta = tmp_path / "tbl" / "metadata"
    meta.mkdir(parents=True)
    md = {
        "format-version": 2,
        "last-sequence-number": 3,
        "current-snapshot-id": 99,
        "snapshots": [
            {"snapshot-id": 99,
             "manifest-list": "metadata/snap-missing.avro"},
        ],
    }
    (meta / "v1.metadata.json").write_text(json.dumps(md))
    (meta / "version-hint.text").write_text("1")

    src = IcebergMetadataSource(str(tmp_path / "tbl"))
    assert src.added_files(None) is None
    with pytest.raises(ValueError, match="cannot be pinned"):
        incremental_build(spark, src, str(tmp_path / "idx"), n_shards=2)
