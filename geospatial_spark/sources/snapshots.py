"""Snapshot-pinned table sources: incremental index builds that can
NAME the exact source version they built from.

Reference analogue: the datasource updater's change detection —
`shouldUpdate` compares the remote manifest's sha256/updatedAt against
what the last build recorded and skips the whole build when nothing
changed (ip2geo/jobscheduler/DatasourceUpdateService.java:282-292).
The engine's shard checkpoints fingerprint CONTENT (build.py), but
content hashing still requires reading the corpus; a snapshot id makes
"nothing changed" an O(1) metadata check and "what changed" an exact
file-level delta.

Two backends behind one protocol:

* `JsonSnapshotLog` — a transaction-log table layout this module can
  both write and read (the Iceberg/Delta metadata idea distilled):

      <table>/_snapshots/version-hint.text   → latest version N
      <table>/_snapshots/v{N}.json           → {"snapshot_id", "files",
                                                "parent_id", ...}
      <table>/<data files>.parquet           → immutable data files

  Appends write new data files + a new snapshot listing ALL live
  files; readers pin a snapshot and never list the data directory.
  Supports exact `added_files(since)` deltas.

* `IcebergMetadataSource` — reads a real Apache Iceberg table with
  pure Python: metadata JSON (`metadata/version-hint.text` +
  `v{N}.metadata.json`) for the current snapshot id and lineage, and
  the Avro manifest-list → manifest chain (decoded by
  `sources/avroio`, a from-the-spec container codec) for exact
  file-level deltas. Append-only changes yield exactly the added data
  files; anything else (row-level deletes, removed files, expired
  ancestors) degrades to a full rebuild — never a wrong delta.

`incremental_build` ties either backend to the index lifecycle:
unchanged snapshot → NO Spark job at all; changed snapshot → read only
the files added since the pinned snapshot and append ONE delta
generation, recording the new snapshot id in the manifest.
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from geospatial_spark.plans import lifecycle as lc


# -- JSON transaction-log table layout ---------------------------------


class JsonSnapshotLog:
    """Minimal snapshot-log table: immutable parquet data files plus a
    JSON log naming the live set per snapshot."""

    def __init__(self, table_root: str):
        self.root = Path(table_root)
        self.meta = self.root / "_snapshots"

    # -- write side ----------------------------------------------------

    def init_table(self) -> None:
        self.meta.mkdir(parents=True, exist_ok=True)

    def append(self, spark: SparkSession, df: DataFrame) -> dict:
        """Append df's rows as new immutable data files + one snapshot.
        Returns the new snapshot dict."""
        self.init_table()
        token = uuid.uuid4().hex[:12]
        staging = self.root / f"_staging-{token}"
        df.write.mode("overwrite").parquet(str(staging))
        new_files = []
        for i, p in enumerate(sorted(staging.glob("*.parquet"))):
            name = f"data-{token}-{i:04d}.parquet"
            p.rename(self.root / name)
            new_files.append(name)
        for p in staging.glob("*"):
            p.unlink()
        staging.rmdir()

        prev = self.current_snapshot()
        version = (prev["version"] + 1) if prev else 1
        snap = {
            "version": version,
            "snapshot_id": f"{int(time.time())}-{token}",
            "parent_id": prev["snapshot_id"] if prev else None,
            "files": (prev["files"] if prev else []) + new_files,
            "added_files": new_files,
        }
        lc.atomic_write_json(self.meta / f"v{version}.json", snap)
        lc.atomic_write_json(self.meta / "version-hint.text.json",
                             {"version": version})
        return snap

    # -- read side -------------------------------------------------------

    def current_snapshot(self) -> dict | None:
        hint = lc.read_json(self.meta / "version-hint.text.json")
        if not hint:
            return None
        return lc.read_json(self.meta / f"v{int(hint['version'])}.json")

    def snapshot_by_id(self, snapshot_id: str) -> dict | None:
        for p in sorted(self.meta.glob("v*.json")):
            s = lc.read_json(p)
            if s and s.get("snapshot_id") == snapshot_id:
                return s
        return None

    def added_files(self, since_snapshot_id: str | None) -> list[str] | None:
        """Data files added strictly after `since_snapshot_id` (all
        files when None). Returns None when the delta cannot be derived
        (unknown ancestor — caller must full-rebuild)."""
        cur = self.current_snapshot()
        if cur is None:
            return []
        if since_snapshot_id is None:
            return list(cur["files"])
        base = self.snapshot_by_id(since_snapshot_id)
        if base is None:
            return None
        base_set = set(base["files"])
        return [f for f in cur["files"] if f not in base_set]

    def read(self, spark: SparkSession, files: list[str]) -> DataFrame:
        """Pinned read: exactly the named files, never a listing."""
        return spark.read.parquet(*[str(self.root / f) for f in files])


# -- real-Iceberg metadata (snapshot pinning only) ---------------------


class IcebergMetadataSource:
    """Pure-Python reader of an Apache Iceberg table: metadata JSON for
    snapshot ids/lineage, plus the Avro manifest-list → manifest chain
    (decoded by `sources/avroio`, no external Avro library) for EXACT
    file-level deltas. `added_files(since)` returns the data files added
    between two snapshots when the change is append-only; anything this
    reader can't honor as an append (delete manifests, merge-on-read
    delete files, removed data files, expired ancestor snapshots)
    returns None and the caller full-rebuilds — never a wrong delta."""

    def __init__(self, table_root: str):
        self.root = Path(table_root)
        self.meta = self.root / "metadata"

    def _metadata(self) -> dict | None:
        hint = self.meta / "version-hint.text"
        if hint.exists():
            v = hint.read_text().strip()
            p = self.meta / f"v{v}.metadata.json"
            if p.exists():
                return json.loads(p.read_text())
        # fall back: newest v*.metadata.json
        cands = sorted(self.meta.glob("v*.metadata.json"))
        return json.loads(cands[-1].read_text()) if cands else None

    def current_snapshot(self) -> dict | None:
        md = self._metadata()
        if not md:
            return None
        sid = md.get("current-snapshot-id")
        if sid in (None, -1):
            return None
        snap = next((s for s in md.get("snapshots", [])
                     if s.get("snapshot-id") == sid), None)
        return {
            "version": md.get("last-sequence-number", 0),
            "snapshot_id": str(sid),
            "parent_id": (str(snap.get("parent-snapshot-id"))
                          if snap and snap.get("parent-snapshot-id")
                          is not None else None),
            "manifest_list": snap.get("manifest-list") if snap else None,
        }

    def _resolve(self, path: str):
        """Manifest/data paths are absolute URIs (file://…, s3://…) in
        real tables, or table-relative in minimal ones. Non-file URI
        schemes pass through verbatim (spark.read and fsspec-style
        readers resolve them; joining them onto the table root would
        corrupt them)."""
        if path.startswith("file://"):
            return Path(path[len("file://"):])
        if "://" in path:
            return path
        p = Path(path)
        return p if p.is_absolute() else self.root / path

    def _snapshot_entry(self, md: dict, sid) -> dict | None:
        return next((s for s in md.get("snapshots", [])
                     if str(s.get("snapshot-id")) == str(sid)), None)

    def _live_files(self, snap_entry: dict | None) -> set[str] | None:
        """Live data-file paths at a snapshot via its manifest list;
        None when the snapshot uses row-level deletes (content != 0
        manifests or delete data_files) — those are not appends."""
        from geospatial_spark.sources import avroio

        if not snap_entry or not snap_entry.get("manifest-list"):
            return None
        try:
            manifests = avroio.read_container_file(
                self._resolve(snap_entry["manifest-list"]))
        except (OSError, ValueError, EOFError, KeyError):
            return None
        live: set[str] = set()
        for mf in manifests:
            if int(mf.get("content") or 0) != 0:
                return None  # delete manifest: merge-on-read table
            try:
                entries = avroio.read_container_file(
                    self._resolve(mf["manifest_path"]))
            except (OSError, ValueError, EOFError, KeyError):
                return None
            for e in entries:
                if int(e.get("status") or 0) == 2:  # deleted here
                    continue
                dfile = e.get("data_file") or {}
                if int(dfile.get("content") or 0) != 0:
                    return None  # equality/position delete file
                fp = dfile.get("file_path")
                if fp:
                    live.add(fp)
        return live

    def added_files(self, since_snapshot_id: str | None):
        md = self._metadata()
        cur = self.current_snapshot()
        if not md or cur is None:
            return [] if cur is None else None
        cur_set = self._live_files(
            self._snapshot_entry(md, cur["snapshot_id"]))
        if cur_set is None:
            return None
        if since_snapshot_id is None:
            return sorted(cur_set)
        base_set = self._live_files(
            self._snapshot_entry(md, since_snapshot_id))
        if base_set is None:
            return None  # expired/unknown ancestor: full rebuild
        if base_set - cur_set:
            return None  # data files removed: not an append
        return sorted(cur_set - base_set)

    def read(self, spark: SparkSession, files):
        """Pinned read of exactly the named data files."""
        return spark.read.parquet(*[str(self._resolve(f)) for f in files])


# -- incremental build driver ------------------------------------------


def incremental_build(spark: SparkSession,
                      log: "JsonSnapshotLog | IcebergMetadataSource",
                      index_root: str, n_shards: int | None = None,
                      **build_kwargs) -> dict:
    """Bring the index up to the table's CURRENT snapshot.

    * manifest snapshot == current snapshot → return the manifest
      untouched, NO Spark job (the shouldUpdate fast path);
    * known ancestor snapshot → read ONLY the files added since it and
      append ONE delta generation;
    * unknown/no prior snapshot → full rebuild from the pinned file
      set.

    The published manifest records `source_snapshot` (id + version +
    the file names this build consumed), so every index generation can
    name exactly what it was built from."""
    from geospatial_spark.plans.build import build_index

    cur = log.current_snapshot()
    if cur is None:
        raise ValueError(f"table at {log.root} has no snapshot")

    m = lc.read_manifest(index_root)
    prior = (m or {}).get("source_snapshot") or {}
    if prior.get("snapshot_id") == cur["snapshot_id"]:
        return m  # unchanged: zero work

    prior_files = list(prior.get("files_consumed", []))

    def _pin(consumed: list[str]) -> dict:
        return {"snapshot_id": cur["snapshot_id"],
                "version": cur["version"],
                "files_consumed": consumed}

    delta = log.added_files(prior.get("snapshot_id"))
    if delta is None or not prior:
        # unknown ancestor (or first build): full rebuild, pinned files.
        # The pin rides build_index's single publish (under BuildLock) —
        # no second out-of-lock publish to clobber a concurrent writer.
        files = log.added_files(None)
        if files is None:
            # the CURRENT snapshot itself is not resolvable to a plain
            # data-file set (merge-on-read deletes, delete manifests, or
            # unreadable manifest chain). Reading the raw data files
            # would resurrect deleted rows — fail with the reason
            # instead of a TypeError deep in read()
            raise ValueError(
                f"table at {log.root}: current snapshot "
                f"{cur['snapshot_id']} cannot be pinned to a data-file "
                "set (row-level deletes or unreadable manifests) — this "
                "reader supports append/overwrite tables; compact the "
                "table (rewrite data files) and retry")
        df = log.read(spark, files)
        return build_index(spark, df, index_root, n_shards=n_shards,
                           generation=f"snap-{cur['version']:06d}",
                           append=False, extra_manifest={
                               "source_snapshot": _pin(files)},
                           **build_kwargs)
    if not delta:
        # snapshot changed but no new data files (metadata-only change):
        # re-pin without building. Re-read-modify-publish under the same
        # BuildLock a build would take, so a concurrent build/merge
        # landing in between can't be clobbered by this stale copy; the
        # prior files_consumed is preserved — it still names exactly the
        # files the index content came from.
        with lc.BuildLock(index_root, owner="repin"):
            manifest = dict(lc.read_manifest(index_root) or m)
            manifest["source_snapshot"] = _pin(prior_files)
            lc.publish_manifest(index_root, manifest,
                                manifest.get("storage", lc.STORAGE_POSIX))
        return manifest
    # delta append: files_consumed names what THIS build read (the new
    # generation's provenance); earlier generations' inputs live in the
    # build_history / prior manifests
    df = log.read(spark, delta)
    return build_index(spark, df, index_root, n_shards=n_shards,
                       generation=f"snap-{cur['version']:06d}",
                       append=True, extra_manifest={
                           "source_snapshot": _pin(delta)},
                       **build_kwargs)
