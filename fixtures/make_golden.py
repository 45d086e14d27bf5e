"""Generate golden top-k files from the pure-Python oracle — never from
the engine (FIXTURES.md §3; the reference pins golden bucket outputs in
yamlRestTest, 20_geohex_grid.yml:44-61).

Usage: python fixtures/make_golden.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.datagen import gen_transcripts  # noqa: E402
from oracle.oracle import OracleIndex  # noqa: E402

GOLDEN_CONVS = 300  # the `small` fixture table (seed 42)


def main() -> None:
    df = gen_transcripts(GOLDEN_CONVS, seed=42)
    oracle = OracleIndex.build(list(zip(df["conv_id"], df["turn_idx"], df["text"])))
    queries = json.loads((REPO / "fixtures" / "queries.json").read_text())
    out_dir = REPO / "fixtures" / "golden"
    out_dir.mkdir(exist_ok=True)
    for q in queries:
        hits = oracle.search(q["text"], q["k"])
        golden = {
            "qid": q["qid"], "k": q["k"], "text": q["text"],
            "hits": [
                {"doc_id": d, "score": s, "rank": i + 1}
                for i, (d, s) in enumerate(hits)
            ],
        }
        (out_dir / f"{q['qid']}.json").write_text(json.dumps(golden, indent=1))
    print(f"wrote {len(queries)} golden files to {out_dir}")


if __name__ == "__main__":
    main()
