"""M3 gate: Spark naive scorer is rank- and score-identical to the
pure-Python oracle (the GeoHexGridAggregatorTests independent-oracle
pattern) on the small fixture across the reference query set."""

from __future__ import annotations

import math

import pytest

from tests.conftest import QUERIES


def _spark_topk(spark, transcripts, query, k):
    from geospatial_spark.operators.postings import corpus_stats, doclens, posting_tuples
    from geospatial_spark.operators.scorer import bm25_topk, transcript_tie_break

    p = posting_tuples(transcripts)
    dl = doclens(transcripts)
    n, avgdl = corpus_stats(dl)
    return bm25_topk(spark, p, dl, n, avgdl, query, k,
                     tie_break=transcript_tie_break()).collect()


def test_corpus_stats_match(spark, small_transcripts, small_oracle):
    from geospatial_spark.operators.postings import corpus_stats, doclens

    n, avgdl = corpus_stats(doclens(small_transcripts))
    assert n == small_oracle.n_docs
    assert math.isclose(avgdl, small_oracle.avgdl, rel_tol=1e-12)


@pytest.mark.parametrize("query", QUERIES)
def test_rank_and_score_identical(spark, small_transcripts, small_oracle, query):
    k = 10
    expected = small_oracle.search(query, k)
    got = _spark_topk(spark, small_transcripts, query, k)
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert math.isclose(r["score"], s, rel_tol=1e-9), (r, s)


def test_k_exceeds_matches(spark, small_transcripts, small_oracle):
    q = "singleton"
    expected = small_oracle.search(q, 1000)
    got = _spark_topk(spark, small_transcripts, q, 1000)
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]


def test_per_turn_text_equality(spark, small_transcripts, small_transcripts_pd):
    """Per-row invariant (BASELINE.json input_hint): under stable
    (conv_id, turn_idx) ordering, the engine-read table's text equals the
    source exactly."""
    got = (
        small_transcripts.orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    src = small_transcripts_pd.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(got["text"]) == list(src["text"])
