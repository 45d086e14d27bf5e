"""S4 analogue: dictionary CSV source contract + normalization-aware
build/query (FIXTURES.md §4)."""

from __future__ import annotations

import pytest


def test_header_contract(tmp_path):
    from geospatial_spark.sources.dictionary import read_normalization_csv

    ok = tmp_path / "ok.csv"
    ok.write_text("token,canonical\nSpark,spark\npyspark,spark\n")
    assert read_normalization_csv(str(ok)) == {"Spark": "spark", "pyspark": "spark"}

    bad1 = tmp_path / "one_col.csv"
    bad1.write_text("token\nspark\n")
    with pytest.raises(ValueError, match=">= 2 fields"):
        read_normalization_csv(str(bad1))

    bad2 = tmp_path / "short_row.csv"
    bad2.write_text("token,canonical\nspark\n")
    with pytest.raises(ValueError, match="row needs"):
        read_normalization_csv(str(bad2))


def test_normalize_flat_passthrough():
    import numpy as np

    from geospatial_spark.functions.tokenize import normalize_flat

    flat = np.array(["pyspark", "the", "job"], dtype="U16")
    out = normalize_flat(flat, {"pyspark": "spark"})
    assert list(out) == ["spark", "the", "job"]
    assert list(normalize_flat(flat, {})) == list(flat)


def test_normalized_build_and_query(spark, tmp_path):
    """Index built with token→canonical dictionary: variants collapse
    into one term; queries normalize through the same dictionary; the
    oracle over pre-normalized text agrees exactly."""
    import math

    import pandas as pd

    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher
    from oracle.oracle import OracleIndex

    rows = [
        ("c0", 0, "PySpark rocks and pyspark scales"),
        ("c1", 0, "spark is fine"),
        ("c2", 0, "unrelated words entirely"),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    pdf["role"] = "user"
    pdf["tool"] = pd.Series([None] * len(pdf), dtype="string")
    pdf["ts"] = pd.Timestamp("2026-01-01")
    p = tmp_path / "tx.parquet"
    pdf.to_parquet(p, index=False)
    from geospatial_spark.sources.transcripts import read_transcripts

    tx = read_transcripts(spark, str(p))
    mapping = {"pyspark": "spark"}
    root = str(tmp_path / "idx")
    build_index(spark, tx, root, n_shards=2, normalization=mapping)
    s = IndexSearcher(spark, root)

    # oracle over pre-normalized text = same semantics
    norm_rows = [(c, t, x.lower().replace("pyspark", "spark")) for c, t, x in rows]
    oracle = OracleIndex.build(norm_rows)
    for q in ["pyspark", "spark", "PYSPARK rocks"]:
        nq = " ".join(mapping.get(t, t) for t in q.lower().split())
        expected = oracle.search(nq, 5)
        got = s.search(q, 5)
        assert [d for d, _ in got] == [d for d, _ in expected], q
        for (_, gs), (_, es) in zip(got, expected):
            assert math.isclose(gs, es, rel_tol=1e-9)
