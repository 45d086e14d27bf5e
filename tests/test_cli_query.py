"""query CLI subprocess smoke: serving mode (--local), metadata filter
flags, invalid-combination rejection. Spark-free path keeps this
fast."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def cli_index(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("cliq") / "idx")
    build_index(spark, small_transcripts, root, n_shards=2)
    return root


def _run(*args):
    return subprocess.run(
        [sys.executable, str(REPO / "cli" / "query.py"), *args],
        capture_output=True, text=True, cwd=REPO, timeout=120)


def test_local_match_with_meta(cli_index):
    from geospatial_spark.plans.serve import LocalSearcher

    out = _run("--index", cli_index, "--query", "the spark", "--local",
               "--role", "assistant", "--ts-min", "2026-01-01T06:00:00")
    assert out.returncode == 0, out.stderr[-500:]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    want = LocalSearcher(cli_index).search(
        "the spark", 10,
        meta={"role": ["assistant"], "ts_min": "2026-01-01T06:00:00"})
    assert [(h["doc_id"], round(h["score"], 9)) for h in d["hits"]] == \
        [(doc, round(sc, 9)) for doc, sc in want]


def test_local_bool_with_meta(cli_index):
    from geospatial_spark.plans.serve import LocalSearcher

    out = _run("--index", cli_index, "--query", "deploy spark", "--local",
               "--filter", "the", "--role", "user", "--role", "tool")
    assert out.returncode == 0, out.stderr[-500:]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    want = LocalSearcher(cli_index).search_bool(
        "deploy spark", "the", "", 10, meta={"role": ["user", "tool"]})
    assert [(h["doc_id"], round(h["score"], 9)) for h in d["hits"]] == \
        [(doc, round(sc, 9)) for doc, sc in want]


def test_meta_rejected_for_phrase(cli_index):
    out = _run("--index", cli_index, "--query", "the spark", "--local",
               "--phrase", "--role", "assistant")
    assert out.returncode == 2
    assert "apply to match" in out.stderr


def test_local_highlight(cli_index, small_transcripts_pd, tmp_path):
    from geospatial_spark.plans.serve import LocalSearcher

    store = tmp_path / "store.parquet"
    small_transcripts_pd.to_parquet(store, index=False)
    out = _run("--index", cli_index, "--query", "deploy the spark",
               "--local", "--highlight", "--docstore", str(store),
               "--window", "8", "--k", "5")
    assert out.returncode == 0, out.stderr[-500:]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    want = LocalSearcher(cli_index, docstore=str(store)).highlight(
        "deploy the spark", k=5, window=8)
    assert [(h["doc_id"], h["snippet"], h["n_hit"]) for h in d["hits"]] \
        == [(doc, sn, nh) for doc, _, sn, nh in want]


def test_highlight_requires_docstore(cli_index):
    out = _run("--index", cli_index, "--query", "x", "--local",
               "--highlight")
    assert out.returncode == 2
    assert "--docstore" in out.stderr
