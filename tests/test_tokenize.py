from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_spark.functions.tokenize import (
    duckdb_tokens_sql,
    tokenize_pandas,
    tokenize_py,
)


def test_basic():
    assert tokenize_py("Deploy the SPARK job!") == ["deploy", "the", "spark", "job"]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    assert tokenize_py("?!... ---") == []
    assert tokenize_py("a1-b2_c3") == ["a1", "b2", "c3"]
    assert tokenize_py("x" * 65) == []  # over MAX_TOKEN_LEN dropped
    assert tokenize_py("x" * 64) == ["x" * 64]


def test_pandas_matches_py():
    texts = pd.Series(["Deploy the SPARK job!", "", None, "?!...", "a1-b2", "x" * 65])
    got = tokenize_pandas(texts)
    for raw, toks in zip(texts, got):
        assert toks == tokenize_py(raw)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_pandas_matches_py_property(s):
    assert tokenize_pandas(pd.Series([s]))[0] == tokenize_py(s)


def test_flat_matches_py():
    import numpy as np

    from geospatial_spark.functions.tokenize import tokenize_flat

    texts = pd.Series(["Deploy the SPARK job!", "", None, "?!...", "a1-b2",
                       "x" * 65, "one two one"])
    flat, doc_idx, dl = tokenize_flat(texts)
    for i, raw in enumerate(texts):
        expect = tokenize_py(raw)
        got = list(flat[doc_idx == i])
        assert got == expect, raw
        assert dl[i] == len(expect)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=10))
def test_flat_matches_py_property(texts):
    from geospatial_spark.functions.tokenize import tokenize_flat

    flat, doc_idx, dl = tokenize_flat(pd.Series(texts, dtype=object))
    for i, raw in enumerate(texts):
        assert list(flat[doc_idx == i]) == tokenize_py(raw)


def test_encoded_matches_py():
    from geospatial_spark.functions.tokenize import tokenize_encoded

    texts = pd.Series(["Deploy the SPARK job!", "", None, "?!...", "a1-b2",
                       "x" * 65, "one two one", "PySpark and pyspark"])
    codes, vocab, doc_idx, dl, pos = tokenize_encoded(texts)
    assert list(vocab) == sorted(set(vocab))
    for i, raw in enumerate(texts):
        expect = tokenize_py(raw)
        got = list(vocab[codes[doc_idx == i]])
        assert got == expect, raw
        assert dl[i] == len(expect)
        # position contract: 0-based index in the KEPT token stream
        assert list(pos[doc_idx == i]) == list(range(len(expect)))
    # with normalization: vocab-level mapping
    codes, vocab, doc_idx, dl, pos = tokenize_encoded(texts, {"pyspark": "spark"})
    got = list(vocab[codes[doc_idx == 7]])
    assert got == ["spark", "and", "spark"]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=10))
def test_encoded_matches_py_property(texts):
    from geospatial_spark.functions.tokenize import tokenize_encoded

    codes, vocab, doc_idx, dl, pos = tokenize_encoded(pd.Series(texts, dtype=object))
    for i, raw in enumerate(texts):
        assert list(vocab[codes[doc_idx == i]]) == tokenize_py(raw)


def test_duckdb_sql_matches_py():
    texts = ["Deploy the SPARK job!", "", "?!... ---", "a1-b2_c3", "x" * 65,
             "MiXeD CaSe, punct; tokens?", "7 numbers 42 and13x"]
    con = duckdb.connect()
    df = pd.DataFrame({"text": texts})
    con.register("t", df)
    rows = con.execute(f"select {duckdb_tokens_sql('text')} from t").fetchall()
    for raw, (toks,) in zip(texts, rows):
        assert list(toks) == tokenize_py(raw), raw


def test_spark_tokens_col_matches_py(spark, tiny_transcripts):
    from pyspark.sql import functions as F

    from geospatial_spark.functions.tokenize import spark_tokens_col

    rows = (
        tiny_transcripts.select("text", spark_tokens_col("text").alias("toks"))
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert list(r["toks"]) == tokenize_py(r["text"]), r["text"]
