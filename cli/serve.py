#!/usr/bin/env python
"""Serving daemon entry point: an always-on process answering BM25
queries over a published index in milliseconds — no Spark session.

Usage:
  python cli/serve.py --index /path/index [--host 127.0.0.1]
      [--port 8080] [--check-interval 0.25]

GET  /health        → {"state", "n_docs", "built_at_unix", ...}
POST /search        → {"type": "match|phrase|phrase_scored|near|bool",
                       "q": ..., "k": 10, ...} → {"hits": [[doc, score]]}
POST /search_batch  → [req, ...] → {"results": [...]}

Hot swap: a new manifest (delta build, force-merge) is picked up within
--check-interval seconds, no restart — the change-listener contract
(Ip2GeoCachedDao.java:194-243 analogue).
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
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--check-interval", type=float, default=0.25,
                    help="seconds between manifest change checks")
    ap.add_argument("--docstore", default=None,
                    help="transcripts parquet path enabling "
                         '{"type": "highlight"} requests (snippets '
                         "re-join doc text; it is not in the index)")
    args = ap.parse_args()

    from geospatial_spark.plans.daemon import make_server

    srv = make_server(args.index, args.host, args.port,
                      check_interval=args.check_interval,
                      docstore=args.docstore)
    print(json.dumps({"serving": args.index,
                      "addr": list(srv.server_address)}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
