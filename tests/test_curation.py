"""Curation operators: deterministic mixture sampling (reproducible,
partitioning-independent, weight-faithful) and the benchmark
contamination screen (planted overlap detected, clean docs pass,
sub-shingle docs unflagged). DuckDB parity runs under test_driver_gate;
these pin the operator semantics directly."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = []
    for i in range(400):
        src = f"s{i % 4}"
        rows.append((i, f"alpha beta gamma delta tok{i} epsilon zeta",
                     src))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"]))


def test_sample_mixture_deterministic_and_weighted(docs_df):
    from geospatial_spark.operators.curation import sample_mixture

    w = {"s0": 1.0, "s1": 0.5, "s2": 0.0}
    a = sorted(tuple(r) for r in sample_mixture(docs_df, w).collect())
    b = sorted(tuple(r) for r in
               sample_mixture(docs_df.repartition(7), w).collect())
    assert a == b  # pure row function: partitioning-independent
    by_src = {}
    for _, src in a:
        by_src[src] = by_src.get(src, 0) + 1
    assert by_src.get("s0") == 100          # weight 1.0 keeps all
    assert "s2" not in by_src               # weight 0.0 drops all
    assert "s3" not in by_src               # unlisted source dropped
    assert 30 <= by_src.get("s1", 0) <= 70  # ~half of 100


def test_sample_mixture_seed_changes_sample(docs_df):
    from geospatial_spark.operators.curation import sample_mixture

    w = {"s1": 0.5}
    a = {r[0] for r in sample_mixture(docs_df, w, seed="mix").collect()}
    b = {r[0] for r in sample_mixture(docs_df, w, seed="other").collect()}
    assert a != b  # same weights, different seed → different sample


def test_contamination_screen_plants(spark):
    from geospatial_spark.operators.curation import contamination_screen

    # probe docs: ids 0, 31 (id % 31 == 0). Doc 40 copies doc 31's
    # text (fully contaminated); doc 41 is clean; doc 42 is too short
    # to shingle; doc 43 shares half its shingles with doc 0.
    probe_a = "red green blue cyan magenta yellow"
    probe_b = "one two three four five six seven"
    rows = [
        (0, probe_a, "s0"),
        (31, probe_b, "s0"),
        (40, probe_b, "s0"),
        (41, "totally fresh unrelated words here now", "s0"),
        (42, "too short", "s0"),
        (43, "red green blue cyan junk1 junk2 junk3 junk4", "s0"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"]))
    out = {r["doc_id"]: r.asDict()
           for r in contamination_screen(df).collect()}
    assert set(out) == {40, 41, 42, 43}  # probe docs excluded
    assert out[40]["contaminated"] and \
        out[40]["n_shared"] == out[40]["n_shingles"] > 0
    assert not out[41]["contaminated"] and out[41]["n_shared"] == 0
    assert out[42]["n_shingles"] == 0 and not out[42]["contaminated"]
    # doc 43: shingles = 6 total; shared with doc 0: "red green blue",
    # "green blue cyan" → 2 of 6 → below the ≥½ bar
    assert out[43]["n_shared"] == 2 and out[43]["n_shingles"] == 6
    assert not out[43]["contaminated"]


def test_chunk_documents_boundaries(spark):
    from geospatial_spark.operators.curation import chunk_documents

    toks_70 = " ".join(f"t{i}" for i in range(70))
    rows = [(1, "short doc here", "s"), (2, toks_70, "s"), (3, "", "s")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"]))
    out = {}
    for r in chunk_documents(df, window=64, stride=48).collect():
        out.setdefault(r["doc_id"], []).append(r.asDict())
    assert 3 not in out                       # empty doc: no chunks
    assert len(out[1]) == 1                   # short doc: one chunk
    assert out[1][0]["chunk_tokens"] == 3
    assert out[1][0]["chunk_text"] == "short doc here"
    c2 = sorted(out[2], key=lambda c: c["chunk_idx"])
    assert [c["chunk_idx"] for c in c2] == [0, 1]
    assert c2[0]["chunk_tokens"] == 64        # full window
    assert c2[1]["chunk_tokens"] == 70 - 48   # tail
    assert c2[0]["chunk_text"].split()[0] == "t0"
    assert c2[1]["chunk_text"].split()[0] == "t48"  # overlap by 16
    assert c2[0]["chunk_text"].split()[-1] == "t63"


def test_embed_int8_reconstruction_bound(spark):
    import numpy as np

    from geospatial_spark.operators.similarity import embed_int8

    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=16).astype("float32").tolist())
            for i in range(20)]
    rows.append((99, [0.0] * 16))  # zero vector
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    out = {r["vec_id"]: r.asDict() for r in embed_int8(df).collect()}
    assert out[99]["scale"] == 0.0 and out[99]["q_sum"] == 0
    vecs = dict(rows)
    for vid, r in out.items():
        if vid == 99:
            continue
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        # the max-|x| element quantizes to ±127 exactly
        assert max(abs(r["q_min"]), abs(r["q_max"])) == 127
        # reconstruction error ≤ scale/2 per element is implied by the
        # rounding form; spot-check via q_sum: |sum(x) - scale*q_sum|
        # ≤ dim * scale/2
        x = np.array(vecs[vid], dtype=np.float64)
        assert abs(x.sum() - r["scale"] * r["q_sum"]) <= \
            16 * (r["scale"] / 2 + 1e-6) + 1e-6


def test_cli_curate_smoke(tmp_path):
    """cli/curate.py end-to-end for two ops (subprocess, JSON line)."""
    import json
    import subprocess
    import sys

    out1 = tmp_path / "chunks"
    r = subprocess.run(
        [sys.executable, "cli/curate.py",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", str(out1), "--op", "chunk", "--cores", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    line = json.loads([l for l in r.stdout.splitlines()
                       if l.startswith("{")][-1])
    assert line["op"] == "chunk" and line["rows"] > 0

    out2 = tmp_path / "sample"
    r = subprocess.run(
        [sys.executable, "cli/curate.py",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", str(out2), "--op", "sample",
         "--weights", "src0=1.0,src1=0.5", "--cores", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    line = json.loads([l for l in r.stdout.splitlines()
                       if l.startswith("{")][-1])
    assert line["op"] == "sample" and 0 < line["rows"] < 500
