#!/usr/bin/env python
"""Top-k query entry point (the _search analogue).

Usage:
  spark-submit --py-files geospatial_spark.zip cli/query.py \
      --index /path/index --query "deploy the spark job" [--k 10]

Prints one JSON line: {"query": ..., "hits": [{doc_id, score, rank}]}
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
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--local", action="store_true",
                    help="serve without Spark (pyarrow row-group reads)")
    args = ap.parse_args()

    if args.local:
        from geospatial_spark.plans.serve import LocalSearcher

        hits = LocalSearcher(args.index).search(args.query, args.k)
    else:
        from geospatial_spark.plans.query import IndexSearcher
        from geospatial_spark.session import get_spark

        spark = get_spark("cli-query", cores=args.cores)
        s = IndexSearcher(spark, args.index)
        hits = s.search(args.query, args.k)
    print(json.dumps({
        "query": args.query, "k": args.k,
        "hits": [{"doc_id": d, "score": sc, "rank": i + 1}
                 for i, (d, sc) in enumerate(hits)],
    }))


if __name__ == "__main__":
    main()
