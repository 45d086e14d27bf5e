#!/usr/bin/env python
"""Corpus-curation entry point: run the training-data pipeline
operators over a documents parquet and write the result.

Usage:
  spark-submit --py-files geospatial_spark.zip cli/curate.py \
      --input docs.parquet --output out_dir --op <op> [op args]

Ops:
  chunk          --window 64 --stride 48
  sample         --weights src0=1.0,src1=0.5 [--seed mix]
  contamination  [--probe-mod 31]
  dedup-groups   [--threshold 0.8]
  quality        (token stats + quality + language id, one output)
  embed-int8     (input must be an embeddings parquet)

Prints one JSON line: {"op": ..., "rows": N, "output": path}.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--op", required=True,
                    choices=["chunk", "sample", "contamination",
                             "dedup-groups", "quality", "embed-int8"])
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--stride", type=int, default=48)
    ap.add_argument("--weights", default="",
                    help="comma-separated source=fraction pairs")
    ap.add_argument("--seed", default="mix")
    ap.add_argument("--probe-mod", type=int, default=31)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from geospatial_spark.session import get_spark

    spark = get_spark("cli-curate", cores=args.cores)
    df = spark.read.parquet(args.input)

    if args.op == "chunk":
        from geospatial_spark.operators.curation import chunk_documents

        out = chunk_documents(df, window=args.window, stride=args.stride)
    elif args.op == "sample":
        from geospatial_spark.operators.curation import sample_mixture

        weights = {}
        for pair in args.weights.split(","):
            if pair:
                src, _, frac = pair.partition("=")
                weights[src] = float(frac)
        if not weights:
            ap.error("--weights required for --op sample")
        out = sample_mixture(df, weights, seed=args.seed)
    elif args.op == "contamination":
        from geospatial_spark.operators.curation import contamination_screen

        out = contamination_screen(df, probe_mod=args.probe_mod)
    elif args.op == "dedup-groups":
        from geospatial_spark.operators.dedup import dup_groups

        out = dup_groups(df, "doc_id", threshold=args.threshold)
    elif args.op == "quality":
        from geospatial_spark.operators.analysis import (with_langid,
                                                         with_quality,
                                                         with_token_stats)

        out = (with_token_stats(df, "doc_id")
               .join(with_quality(df, "doc_id"), "doc_id")
               .join(with_langid(df, "doc_id"), "doc_id"))
    else:  # embed-int8
        from geospatial_spark.operators.similarity import embed_int8

        out = embed_int8(df)

    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"op": args.op, "rows": n, "output": args.output}))


if __name__ == "__main__":
    main()
