"""Index generation + manifest lifecycle.

Reference analogue: the ip2geo datasource lifecycle — build into a new
UUID-suffixed generation, never in place
(ip2geo/jobscheduler/DatasourceUpdateService.java:263-269 setupIndex),
per-record lock renewal during load (GeoIpDataDao.java:307), freeze,
then atomically flip currentIndex + state
(DatasourceUpdateService.updateDatasourceAsSucceeded:235-255); failure
leaves CREATE_FAILED (PutDatasourceTransportAction.java:171-179); old
generations deleted later, guarded by prefix
(GeoIpDataDao.deleteIp2GeoDataIndex:313-343).

Spark-side: generation dir `gen-<id>/` with per-shard parquet files and
per-shard checkpoint JSONs; the root `manifest.json` is swapped last via
atomic rename. States: CREATING → AVAILABLE | CREATE_FAILED.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

STATE_CREATING = "CREATING"
STATE_AVAILABLE = "AVAILABLE"
STATE_CREATE_FAILED = "CREATE_FAILED"

GEN_PREFIX = "gen-"

# -- single-writer build lock ------------------------------------------
#
# Reference analogue: the job-scheduler lock that makes a second
# concurrent datasource update fail with ConcurrentModificationException
# (ip2geo/common/Ip2GeoLockService.java:29,
# ip2geo/action/PutDatasourceTransportAction.java:78-94), with periodic
# renewal during long loads (ip2geo/dao/GeoIpDataDao.java:307). Here:
# O_EXCL lockfile + a daemon heartbeat thread refreshing its mtime; a
# lock whose heartbeat stopped > LOCK_STALE_SECONDS ago is stale (the
# holder died) and may be broken.

LOCK_NAME = "_build.lock"
LOCK_STALE_SECONDS = 600.0
LOCK_RENEW_SECONDS = 15.0


class ConcurrentBuildError(RuntimeError):
    """A second concurrent build of the same index root was refused."""


def lock_path(root: str | Path) -> Path:
    return Path(root) / LOCK_NAME


def lock_is_held(root: str | Path) -> bool:
    """True iff a live (non-stale) writer holds the build lock."""
    import time as _time

    p = lock_path(root)
    try:
        return _time.time() - p.stat().st_mtime < LOCK_STALE_SECONDS
    except OSError:
        return False


class BuildLock:
    """Context manager: exclusive build lock with heartbeat renewal."""

    def __init__(self, root: str | Path, owner: str = ""):
        self.root = Path(root)
        self.owner = owner
        self._stop = None
        self._thread = None

    def _write(self, fd: int) -> None:
        import json as _json
        import os as _os
        import time as _time

        _os.write(fd, _json.dumps({
            "owner": self.owner, "pid": _os.getpid(),
            "acquired_at_unix": _time.time(),
        }).encode())

    def __enter__(self) -> "BuildLock":
        import threading
        import time as _time

        self.root.mkdir(parents=True, exist_ok=True)
        p = lock_path(self.root)
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                stale = _time.time() - p.stat().st_mtime >= LOCK_STALE_SECONDS
            except OSError:
                stale = True  # vanished between open and stat: retry once
            if not stale:
                holder = read_json(p) or {}
                raise ConcurrentBuildError(
                    f"index at {self.root} is being built by "
                    f"pid={holder.get('pid')} owner={holder.get('owner')!r}; "
                    "concurrent builds of one index root are refused") from None
            # Break the dead holder's lock ATOMICALLY: rename it to a
            # unique tombstone. Exactly one contender wins the rename;
            # only the winner may retry O_EXCL. A bare unlink+create has
            # a TOCTOU hole — the second unlinker can delete the first's
            # freshly-acquired lock, letting two builds run concurrently.
            import uuid as _uuid
            tomb = p.with_name(
                f"{p.name}.broken.{os.getpid()}.{_uuid.uuid4().hex[:8]}")
            try:
                os.rename(p, tomb)
            except OSError:
                raise ConcurrentBuildError(
                    f"index at {self.root}: stale lock was broken by a "
                    "concurrent contender; retry the build") from None
            tomb.unlink(missing_ok=True)
            try:
                fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                raise ConcurrentBuildError(
                    f"index at {self.root}: another build acquired the "
                    "lock while breaking a stale one") from None
        self._write(fd)
        os.close(fd)

        self._stop = threading.Event()

        def renew():
            while not self._stop.wait(LOCK_RENEW_SECONDS):
                try:
                    os.utime(p)
                except OSError:
                    return

        self._thread = threading.Thread(target=renew, daemon=True,
                                        name=f"build-lock-renew:{self.root}")
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        if self._stop is not None:
            self._stop.set()
            self._thread.join(timeout=5.0)
        lock_path(self.root).unlink(missing_ok=True)


# -- storage adapter ----------------------------------------------------
#
# Two landing protocols for immutable artifacts:
#   * "posix"  — write temp file + os.replace: partial writes are
#     invisible on POSIX filesystems where in-place writes ARE visible.
#   * "put"    — single-shot write to a UNIQUE content-tokenized name,
#     no rename anywhere: the object-store protocol (S3/GCS PUT is
#     all-or-nothing; rename does not exist). The shard checkpoint and
#     the manifest record the actual file names, and readers resolve
#     names from the manifest — never from directory listings.
# Commit point in both modes = the checkpoint/manifest JSON naming the
# files, written after the data lands.

STORAGE_POSIX = "posix"
STORAGE_PUT = "put"


def storage_mode(override: str | None = None) -> str:
    if override:
        return override
    return os.environ.get("SPARK_GRAFT_STORAGE", STORAGE_POSIX)


def segment_file(shard: int, token: str | None = None) -> str:
    return (f"segments-{shard:05d}-{token}.parquet" if token
            else f"segments-{shard:05d}.parquet")


def docmap_file(shard: int, token: str | None = None) -> str:
    return (f"docmap-{shard:05d}-{token}.parquet" if token
            else f"docmap-{shard:05d}.parquet")


def put_json(path: Path, obj: dict, mode: str = STORAGE_POSIX) -> None:
    """JSON landing through the storage adapter: posix → temp+rename;
    put → direct single-shot write (the atomic-PUT analogue)."""
    if mode == STORAGE_PUT:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(obj, indent=1, sort_keys=True))
    else:
        atomic_write_json(path, obj)


def gen_dir(root: str | Path, generation: str) -> Path:
    return Path(root) / f"{GEN_PREFIX}{generation}"


def segment_path(gdir: Path, shard: int) -> Path:
    return gdir / f"segments-{shard:05d}.parquet"


def docmap_path(gdir: Path, shard: int) -> Path:
    return gdir / f"docmap-{shard:05d}.parquet"


def checkpoint_path(gdir: Path, shard: int) -> Path:
    return gdir / "_checkpoints" / f"part-{shard:05d}.json"


def atomic_write_json(path: Path, obj: dict) -> None:
    """Partial writes must be invisible: temp file + atomic rename."""
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_text(json.dumps(obj, indent=1, sort_keys=True))
    os.replace(tmp, path)


def read_json(path: Path) -> dict | None:
    try:
        return json.loads(Path(path).read_text())
    except (OSError, json.JSONDecodeError):
        return None


def manifest_path(root: str | Path) -> Path:
    return Path(root) / "manifest.json"


def read_manifest(root: str | Path) -> dict | None:
    return read_json(manifest_path(root))


def publish_manifest(root: str | Path, manifest: dict,
                     mode: str = STORAGE_POSIX) -> None:
    """The atomic 'flip currentIndex + state' step — done LAST."""
    put_json(manifest_path(root), manifest, mode)


def mark_create_failed(root: str | Path, generation: str, error: str,
                       build_record: dict | None = None) -> None:
    prior = read_manifest(root)
    failed = {
        "state": STATE_CREATE_FAILED,
        "generation": generation,
        "error": error,
        # lastFailedAt analogue (Datasource.java:105-173)
        "build_record": build_record,
        # keep serving the previous generation if one was AVAILABLE
        "previous": prior if prior and prior.get("state") == STATE_AVAILABLE else None,
    }
    atomic_write_json(Path(root) / f"manifest.FAILED-{generation}.json", failed)


def gen_shard_files(g: dict) -> tuple[list[str], dict[int, str]]:
    """(segment file names, shard → docmap file name) for one manifest
    generation entry. Names come from the manifest (the put-mode
    contract: readers never list directories), falling back to the
    legacy deterministic names for pre-adapter manifests."""
    segs: list[str] = []
    dms: dict[int, str] = {}
    for s in g["shards"]:
        sh = int(s["shard"])
        segs.append(s.get("segment_file") or segment_file(sh))
        dms[sh] = s.get("docmap_file") or docmap_file(sh)
    return segs, dms


def list_generations(root: str | Path) -> list[str]:
    r = Path(root)
    if not r.exists():
        return []
    return sorted(p.name[len(GEN_PREFIX):] for p in r.iterdir()
                  if p.is_dir() and p.name.startswith(GEN_PREFIX))


def missing_generations(root: str | Path) -> list[str]:
    """Manifest/disk reconciliation (the snapshot-restore listener
    analogue, ip2geo/listener/Ip2GeoListener.java:47-53): generations the
    manifest lists but whose directory is gone (e.g. a partial restore).
    Non-empty ⇒ the index must be force-rebuilt before serving."""
    m = read_manifest(root)
    if not m or m.get("state") != STATE_AVAILABLE:
        return []
    gens = m.get("generations")
    ids = [g["id"] for g in gens] if gens is not None else [m.get("generation")]
    return [g for g in ids if g and not gen_dir(root, g).exists()]


def delete_unused_generations(root: str | Path,
                              grace_seconds: float = 3600.0) -> list[str]:
    """Guarded delete (prefix-matched, never the current generation) —
    the deleteUnusedIndices analogue
    (DatasourceUpdateService.java:151-167).

    Skips generations a concurrent build may still be writing before its
    manifest swap: any gen dir younger than grace_seconds (by newest
    mtime inside it), and any generation while the index's build lock is
    held (a writer is active)."""
    import shutil
    import time as _time

    m = read_manifest(root)
    live: set[str] = set()
    if m:
        if m.get("generation"):
            live.add(m["generation"])
        live.update(g["id"] for g in m.get("generations", []))
    writer_active = lock_is_held(root)
    now = _time.time()
    deleted = []
    for g in list_generations(root):
        if g in live:
            continue
        gd = gen_dir(root, g)
        if writer_active:
            continue  # single active writer may be mid-swap on any gen
        try:
            newest = max((p.stat().st_mtime for p in gd.rglob("*")),
                         default=gd.stat().st_mtime)
        except OSError:
            continue
        if now - newest < grace_seconds:
            continue
        shutil.rmtree(gd)
        deleted.append(g)
    return deleted
