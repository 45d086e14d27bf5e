#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1): per-query catalog
timings with job labels, optional plan capture, and repeat support.

bench.py is FROZEN (driver methodology); this file exists so the round's
measure → change → re-measure loop never touches it.

Usage:
  python bench_extra.py [--sf-dir DIR] [--queries a,b,c] [--repeat N]
                        [--explain-dir plans/r06] [--suffix _before]
Times each catalog query as `fn(spark, sf_dir).collect()` (same
methodology as bench.py run_catalog). Prints one JSON line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--warm-index", action="store_true",
                    help="pre-build the catalog wand index untimed")
    args = ap.parse_args()

    from geospatial_spark.plans import catalog
    from geospatial_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)

    all_q = catalog.queries()
    names = [n for n in args.queries.split(",") if n] or list(all_q)
    unknown = [n for n in names if n not in all_q]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if args.warm_index:
        catalog._wand_index_root(spark, args.sf_dir)

    if args.explain_dir:
        Path(args.explain_dir).mkdir(parents=True, exist_ok=True)

    out: dict[str, list[float]] = {}
    for name in names:
        fn = all_q[name]
        samples = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"cat_{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(f"{name}: {samples}", flush=True)
        if args.explain_dir:
            try:
                txt = fn(spark, args.sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
                (Path(args.explain_dir) / f"{name}{args.suffix}.txt").write_text(txt)
            except Exception as e:  # createDataFrame-backed plans are trivial
                (Path(args.explain_dir) / f"{name}{args.suffix}.txt").write_text(
                    f"explain failed: {e}\n")

    total = sum(min(v) for v in out.values())
    print(json.dumps({"metric": "bench_extra_catalog_seconds",
                      "value": round(total, 3), "unit": "sec",
                      "sf_dir": args.sf_dir, "repeat": args.repeat,
                      "queries": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
