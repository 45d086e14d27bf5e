"""Cursor pagination (search_after) gates: page walks must tile the
full ranking under the pagination contract (rounded score desc, doc_id
string asc) with no gaps, dups, or boundary-tie drift — Spark path ≡
serving path ≡ brute-force reference.

Reference analogue: Lucene/OpenSearch ``search_after`` (exact deep
pagination without a growing from+size window on the wire). The
exhaustive walk (hundreds of pages) runs on the no-Spark serving path;
the Spark path — same loop, same contract — is pinned at page 1, a
mid-ranking cursor, and a deep cursor (each Spark page is a full job,
so the exhaustive walk would be all scheduler overhead)."""

from __future__ import annotations

import math

import pytest

from geospatial_spark.functions.oracle_sql import ORDER_DP
from geospatial_spark.functions.tokenize import tokenize_py


@pytest.fixture(scope="module")
def built_index(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("pageidx") / "idx")
    build_index(spark, small_transcripts, root, n_shards=4, hot_df_copy=32)
    return root


@pytest.fixture(scope="module")
def searcher(spark, built_index):
    from geospatial_spark.plans.query import IndexSearcher

    return IndexSearcher(spark, built_index)


@pytest.fixture(scope="module")
def local(built_index):
    from geospatial_spark.plans.serve import LocalSearcher

    return LocalSearcher(built_index)


def _ref_ranking(oracle, rows, query):
    """Full ranking under the pagination contract."""
    from geospatial_spark.functions.bm25 import term_score

    terms = sorted(set(tokenize_py(query)))
    hits = []
    for conv, turn, text in rows:
        toks = set(tokenize_py(text))
        present = [t for t in terms if t in toks]
        if not present:
            continue
        doc_id = f"{conv}:{turn}"
        score = sum(
            term_score(oracle.postings[t][doc_id], oracle.doclens[doc_id],
                       oracle.avgdl, len(oracle.postings[t]),
                       oracle.n_docs) for t in present)
        hits.append((doc_id, score))
    hits.sort(key=lambda h: (-round(h[1], ORDER_DP), h[0]))
    return hits


@pytest.fixture(scope="module")
def rows(small_transcripts_pd):
    return list(zip(small_transcripts_pd["conv_id"],
                    small_transcripts_pd["turn_idx"],
                    small_transcripts_pd["text"]))


QUERY = "the spark deploy"
K = 7  # not a divisor-friendly number: exercises a ragged last page


def _walk(search_after_fn, k=K):
    """Walk every page to exhaustion; return the concatenation."""
    out, cursor = [], None
    while True:
        page = search_after_fn(QUERY, k, after=cursor)
        if not page:
            break
        out.extend(page)
        if len(page) < k:
            break
        cursor = (page[-1][1], page[-1][0])
    return out


def test_full_walk_tiles_reference(local, small_oracle, rows):
    """Exhaustive page walk (serving path — hundreds of pages) equals
    the full contract-ordered ranking: no gaps, no dups, exact scores,
    exact boundary ties."""
    want = _ref_ranking(small_oracle, rows, QUERY)
    got = _walk(local.search_after)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert len({d for d, _ in got}) == len(got)  # no doc served twice
    for (gd, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), gd


def test_spark_pages_match_reference(searcher, small_oracle, rows):
    """Spark path pinned at page 1, a mid-ranking cursor, and a cursor
    deep enough to force the adaptive fetch loop to widen (m starts at
    max(2k, k+50) = 57)."""
    full = _ref_ranking(small_oracle, rows, QUERY)
    assert len(full) > 300  # the fixture really exercises depth
    p1 = searcher.search_after(QUERY, K, after=None)
    assert [d for d, _ in p1] == [d for d, _ in full[:K]]
    for depth in (K - 1, 40, 300):
        cur = (full[depth][1], full[depth][0])
        page = searcher.search_after(QUERY, K, after=cur)
        want = full[depth + 1:depth + 1 + K]
        assert [d for d, _ in page] == [d for d, _ in want], f"depth {depth}"
        for (gd, gs), (_, ws) in zip(page, want):
            assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), gd


def test_spark_serving_parity(searcher, local, small_oracle, rows):
    full = _ref_ranking(small_oracle, rows, QUERY)
    for depth in (None, 150):
        cur = None if depth is None else (full[depth][1], full[depth][0])
        a = searcher.search_after(QUERY, K, after=cur)
        b = local.search_after(QUERY, K, after=cur)
        assert [d for d, _ in a] == [d for d, _ in b]
        for (_, sa), (_, sb) in zip(a, b):
            assert math.isclose(sa, sb, rel_tol=1e-12)


def test_cursor_mid_tie_group(local, small_oracle, rows):
    """A cursor placed at EVERY early rank (including inside rounded-
    score tie groups) resumes exactly at the next contract-ordered
    doc."""
    full = _ref_ranking(small_oracle, rows, QUERY)
    for i in range(0, min(len(full) - 1, 25)):
        cur = (full[i][1], full[i][0])
        nxt = local.search_after(QUERY, 3, after=cur)
        want = full[i + 1:i + 4]
        assert [d for d, _ in nxt] == [d for d, _ in want], f"rank {i}"


def test_cursor_past_end_empty(local, small_oracle, rows):
    full = _ref_ranking(small_oracle, rows, QUERY)
    last = full[-1]
    assert local.search_after(QUERY, 5, after=(last[1], last[0])) == []


def test_no_match_query(searcher, local):
    assert local.search_after("zzz-not-in-corpus", 5, after=None) == []
    assert searcher.search_after("zzz-not-in-corpus", 5,
                                 after=(1.0, "0:0")) == []
