#!/usr/bin/env python
"""Index build entry point (REST upload analogue,
rest/action/upload/geojson/RestUploadGeoJSONAction.java:80-82).

Usage:
  spark-submit --py-files geospatial_spark.zip cli/build.py \
      --input /path/transcripts.parquet --index /path/index \
      [--shards 128] [--generation g0001] [--append]

Local dev: python cli/build.py --input ... --index ...
Prints the published manifest summary as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None,
                    help="transcripts parquet (omit with --merge)")
    ap.add_argument("--index", required=True)
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument("--generation", default="g0001")
    ap.add_argument("--append", action="store_true")
    ap.add_argument("--merge", action="store_true",
                    help="segment-merge all live generations into one "
                         "(force-merge; never re-reads source text)")
    ap.add_argument("--reshard", action="store_true",
                    help="with --merge: reshard even a single "
                         "generation (serve-tier optimize; co-located "
                         "fast path when --shards divides the old "
                         "count)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from geospatial_spark.session import get_spark

    spark = get_spark("cli-build", cores=args.cores)
    if args.merge:
        from geospatial_spark.plans.compact import merge_generations

        m = merge_generations(spark, args.index, n_shards=args.shards,
                              force=args.reshard)
    else:
        if not args.input:
            ap.error("--input is required unless --merge is given")
        from geospatial_spark.plans.build import build_index
        from geospatial_spark.sources.transcripts import read_transcripts

        tx = read_transcripts(spark, args.input)
        m = build_index(spark, tx, args.index, n_shards=args.shards,
                        generation=args.generation, append=args.append)
    print(json.dumps({
        "state": m["state"], "generation": m["generation"],
        "n_docs": m["n_docs"], "avgdl": m["avgdl"],
        "generations": [g["id"] for g in m["generations"]],
        "postings": sum(s["postings_written"] for s in m["shards"]),
        "bytes_compressed": sum(s["bytes_compressed"] for s in m["shards"]),
        "skipped_shards": sum(s["skipped"] for s in m["shards"]),
    }))


if __name__ == "__main__":
    main()
