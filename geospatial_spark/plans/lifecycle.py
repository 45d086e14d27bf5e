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


def publish_manifest(root: str | Path, manifest: dict) -> None:
    """The atomic 'flip currentIndex + state' step — done LAST."""
    atomic_write_json(manifest_path(root), manifest)


def mark_create_failed(root: str | Path, generation: str, error: str) -> None:
    prior = read_manifest(root)
    failed = {
        "state": STATE_CREATE_FAILED,
        "generation": generation,
        "error": error,
        # keep serving the previous generation if one was AVAILABLE
        "previous": prior if prior and prior.get("state") == STATE_AVAILABLE else None,
    }
    atomic_write_json(Path(root) / f"manifest.FAILED-{generation}.json", failed)


def list_generations(root: str | Path) -> list[str]:
    r = Path(root)
    if not r.exists():
        return []
    return sorted(p.name[len(GEN_PREFIX):] for p in r.iterdir()
                  if p.is_dir() and p.name.startswith(GEN_PREFIX))


def delete_unused_generations(root: str | Path) -> list[str]:
    """Guarded delete (prefix-matched, never the current generation) —
    the deleteUnusedIndices analogue
    (DatasourceUpdateService.java:151-167)."""
    import shutil

    m = read_manifest(root)
    live: set[str] = set()
    if m:
        if m.get("generation"):
            live.add(m["generation"])
        live.update(g["id"] for g in m.get("generations", []))
    deleted = []
    for g in list_generations(root):
        if g not in live:
            shutil.rmtree(gen_dir(root, g))
            deleted.append(g)
    return deleted
