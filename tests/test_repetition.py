"""with_repetition semantics on hand-computed docs + DuckDB parity
on adversarial shapes (the gate replica already covers the corpus)."""

from __future__ import annotations

import duckdb
import pytest

from geospatial_spark.functions.oracle_sql import repetition_sql

DOCS = [
    (0, "a b a b a b"),          # bigrams: a-b ×3 of 5; trigrams 2 of 4
    (1, "spam spam spam spam"),  # one token repeated
    (2, "all distinct tokens here"),
    (3, "x"),                    # too short for any n-gram
    (4, ""),                     # empty
    (5, None),                   # null text
    (6, "Tie tie TIE breaker"),  # case folding collapses the tie run
]


@pytest.fixture(scope="module")
def rep(spark):
    from geospatial_spark.operators.analysis import with_repetition

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in
            with_repetition(df, "doc_id").collect()}


def test_hand_computed(rep):
    r0 = rep[0]
    assert r0["n_tokens"] == 6
    assert r0["distinct_ratio"] == round(2 / 6, 4)
    assert r0["top_bigram_frac"] == round(3 / 5, 4)
    assert r0["top_trigram_frac"] == round(2 / 4, 4)

    r1 = rep[1]
    assert r1["distinct_ratio"] == 0.25
    assert r1["top_bigram_frac"] == 1.0   # every bigram identical
    assert r1["top_trigram_frac"] == 1.0

    r2 = rep[2]
    assert r2["distinct_ratio"] == 1.0
    assert r2["top_bigram_frac"] == round(1 / 3, 4)

    assert rep[6]["distinct_ratio"] == 0.5  # tie×3 + breaker


def test_degenerate_docs(rep):
    for d in (3, 4, 5):
        assert rep[d]["top_bigram_frac"] == 0.0
        assert rep[d]["top_trigram_frac"] == 0.0
    assert rep[3]["n_tokens"] == 1 and rep[3]["distinct_ratio"] == 1.0
    assert rep[4]["n_tokens"] == 0 and rep[4]["distinct_ratio"] == 0.0


def test_duckdb_parity_on_adversarial_docs(spark, rep):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = {r[0]: r for r in con.execute(
        repetition_sql() + " ORDER BY doc_id").fetchall()}
    assert set(want) == set(rep)
    for d, row in rep.items():
        w = want[d]
        got = (row["n_tokens"], row["distinct_ratio"],
               row["top_bigram_frac"], row["top_trigram_frac"])
        assert got == w[1:], d
