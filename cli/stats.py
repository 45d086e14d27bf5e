#!/usr/bin/env python
"""Index stats entry point (the _stats fan-out analogue,
stats/upload/RestUploadStatsAction.java:32-34: per-node metrics reduced
to totals + the per-metric list).

Usage: python cli/stats.py --index /path/index
Prints one JSON line with totals + per-shard metrics.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--per-shard", action="store_true")
    args = ap.parse_args()

    from geospatial_spark.plans import lifecycle as lc

    m = lc.read_manifest(args.index)
    if not m:
        print(json.dumps({"error": "no manifest"}))
        sys.exit(1)
    gens = m.get("generations", [])
    out = {
        "state": m["state"],
        "generation": m["generation"],
        "n_generations": len(gens),
        "n_docs": m["n_docs"],
        "total_tokens": m["total_tokens"],
        "avgdl": m["avgdl"],
        "totals": {
            "docs_tokenized": sum(s["docs_tokenized"] for g in gens for s in g["shards"]),
            "postings_written": sum(s["postings_written"] for g in gens for s in g["shards"]),
            "bytes_compressed": sum(s["bytes_compressed"] for g in gens for s in g["shards"]),
        },
    }
    if args.per_shard:
        out["shards"] = [
            {"generation": g["id"], **s} for g in gens for s in g["shards"]
        ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
