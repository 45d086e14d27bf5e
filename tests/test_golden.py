"""Golden end-to-end gate (FIXTURES.md §3): the WAND engine over the
compressed index must reproduce the oracle-generated golden top-k files
exactly — rank-identical doc_ids, scores within 1e-9 relative — across
the full reference query set."""

from __future__ import annotations

import json
import math
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
QUERIES = json.loads((REPO / "fixtures" / "queries.json").read_text())


@pytest.fixture(scope="module")
def golden_searcher(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path_factory.mktemp("golden") / "idx")
    build_index(spark, small_transcripts, root, n_shards=8)
    return IndexSearcher(spark, root)


@pytest.mark.parametrize("q", QUERIES, ids=[q["qid"] for q in QUERIES])
def test_golden(golden_searcher, q):
    golden = json.loads((REPO / "fixtures" / "golden" / f"{q['qid']}.json").read_text())
    got = golden_searcher.search(q["text"], q["k"])
    assert [d for d, _ in got] == [h["doc_id"] for h in golden["hits"]], q["qid"]
    for (_, gs), h in zip(got, golden["hits"]):
        assert math.isclose(gs, h["score"], rel_tol=1e-9), (q["qid"], gs, h)
