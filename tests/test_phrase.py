"""Phrase-query gate: positions stream + exact-phrase matching.

Engine (IndexSearcher.search_phrase over pos_blocks) must agree with
the pure-Python oracle (OracleIndex.search_phrase) on matched docs,
exact scores, and phrase occurrence counts — including repeated-term
phrases, hot (impact-copied) terms inside a phrase, and phrases
spanning delta generations.
"""

from __future__ import annotations

import math

import pytest

from geospatial_spark.functions.tokenize import tokenize_py


@pytest.fixture(scope="module")
def built_index(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("phraseidx") / "idx")
    # low hot_df_copy so phrases containing an impact-copied (hot) term
    # exercise the doc-ordered fallback the phrase path relies on
    build_index(spark, small_transcripts, root, n_shards=8, hot_df_copy=32)
    return root


@pytest.fixture(scope="module")
def searcher(spark, built_index):
    from geospatial_spark.plans.query import IndexSearcher

    return IndexSearcher(spark, built_index)


@pytest.fixture(scope="module")
def rows(small_transcripts_pd):
    return list(zip(small_transcripts_pd["conv_id"],
                    small_transcripts_pd["turn_idx"],
                    small_transcripts_pd["text"]))


def _data_phrases(rows, n=6):
    """Bigrams/trigrams lifted from real documents — guaranteed hits."""
    out = []
    for _, _, text in rows[:50]:
        toks = tokenize_py(text)
        if len(toks) >= 4:
            out.append(" ".join(toks[1:3]))
            out.append(" ".join(toks[0:3]))
        if len(out) >= n:
            break
    return out


def _check(searcher, oracle, rows, phrase, k=10):
    got = searcher.search_phrase(phrase, k)
    want = [(d, s) for d, s, _ in oracle.search_phrase(rows, phrase, k)]
    assert [d for d, _ in got] == [d for d, _ in want], phrase
    for (gd, gs), (wd, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), (phrase, gd)


def test_phrases_from_data(searcher, small_oracle, rows):
    phrases = _data_phrases(rows)
    assert phrases
    hit_any = False
    for p in phrases:
        _check(searcher, small_oracle, rows, p)
        hit_any = hit_any or bool(searcher.search_phrase(p, 5))
    assert hit_any  # at least one lifted phrase must actually match


def test_phrase_fixed_cases(searcher, small_oracle, rows):
    for p in ["the", "the the", "deploy the", "the spark",
              "spark the spark", "zzz missing phrase", "the zzzz"]:
        _check(searcher, small_oracle, rows, p)


def test_phrase_tf_counts(searcher, small_oracle, rows):
    """phrase_tf column == oracle occurrence count (overlap-counting)."""
    phrases = _data_phrases(rows, n=3) + ["the"]
    for p in phrases:
        df = searcher.search_phrase_df(p, 10)
        if df is None:
            continue
        got = {r["doc_id"]: r["phrase_tf"] for r in df.collect()}
        want = {d: m for d, _, m in small_oracle.search_phrase(rows, p, 10)}
        assert got == want, p


def test_phrase_serving_path_parity(built_index, small_oracle, rows):
    """LocalSearcher (no-Spark serving) phrase results == oracle."""
    from geospatial_spark.plans.serve import LocalSearcher

    ls = LocalSearcher(built_index)
    for p in _data_phrases(rows, n=4) + ["the the", "zzz missing phrase"]:
        got = ls.search_phrase(p, 10)
        want = [(d, s) for d, s, _ in small_oracle.search_phrase(rows, p, 10)]
        assert [d for d, _ in got] == [d for d, _ in want], p
        for (gd, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), (p, gd)


def test_phrase_missing_term_short_circuits(searcher):
    assert searcher.search_phrase("qqqqzzz never seen", 10) == []
    assert searcher.search_phrase("", 10) == []


def test_near_matches_oracle(searcher, small_oracle, rows):
    """Proximity engine vs brute-force pure-Python oracle, including a
    3-term query (the SQL oracle covers 2 terms; python covers k)."""
    cases = [("deploy spark", 3), ("deploy spark", 0), ("the spark", 1),
             ("deploy the spark", 4), ("spark spark", 2),
             ("zzz spark", 5)]
    # lift a real co-occurring word pair for a guaranteed hit
    toks = tokenize_py(rows[0][2])
    if len(toks) >= 3:
        cases.append((f"{toks[0]} {toks[2]}", 2))
    for q, slop in cases:
        got = searcher.search_near(q, slop, 10)
        want = [(d, s) for d, s, _ in small_oracle.search_near(rows, q, slop, 10)]
        assert [d for d, _ in got] == [d for d, _ in want], (q, slop)
        for (gd, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), (q, gd)


def test_near_min_span_column(searcher, small_oracle, rows):
    df = searcher.search_near_df("deploy the spark", 6, 10)
    if df is None:
        pytest.skip("terms absent at this scale")
    got = {r["doc_id"]: r["min_span"] for r in df.collect()}
    want = {d: sp for d, _, sp in small_oracle.search_near(rows, "deploy the spark", 6, 10)}
    assert got == want


def test_phrase_across_generations(spark, small_transcripts,
                                   small_oracle, rows, tmp_path_factory):
    """Split the corpus into a base build + an append delta: phrase
    results over the two-generation index must equal the single-build
    answer (scores use summed cross-generation stats)."""
    from pyspark.sql import functions as F

    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path_factory.mktemp("phrasegen") / "idx")
    part1 = small_transcripts.where(F.crc32(F.col("conv_id")) % 2 == 0)
    part2 = small_transcripts.where(F.crc32(F.col("conv_id")) % 2 == 1)
    build_index(spark, part1, root, n_shards=4, generation="g0001")
    build_index(spark, part2, root, n_shards=4, generation="g0002", append=True)
    s = IndexSearcher(spark, root)
    for p in _data_phrases(rows, n=3) + ["the the"]:
        _check(s, small_oracle, rows, p)


def _ref_min_window(pos_slot_pairs, m):
    """Reference two-pointer minimum window over one doc's merged
    (pos, slot) list — the interpreted implementation the vectorized
    near_match_shard kernel replaced."""
    pairs = sorted(pos_slot_pairs)
    counts = [0] * m
    have = 0
    best = None
    left = 0
    for right in range(len(pairs)):
        counts[pairs[right][1]] += 1
        if counts[pairs[right][1]] == 1:
            have += 1
        while have == m:
            span = pairs[right][0] - pairs[left][0]
            if best is None or span < best:
                best = span
            counts[pairs[left][1]] -= 1
            if counts[pairs[left][1]] == 0:
                have -= 1
            left += 1
    return best


def test_near_kernel_randomized_vs_two_pointer():
    """The vectorized running-maxima minimum-window kernel must agree
    with the classic two-pointer on random inputs (matched docs AND
    exact min spans), including hot-pair-like dense candidates."""
    import numpy as np

    from geospatial_spark.functions.codec import encode_shard_postings
    from geospatial_spark.operators.phrase import near_match_shard

    rng = np.random.default_rng(42)
    for trial in range(8):
        n_docs = int(rng.integers(5, 60))
        m = int(rng.integers(2, 5))
        terms = [f"t{j}" for j in range(m)]
        # per doc: distinct positions split among a random subset of terms
        doc_tokens = {}  # term -> list[(doc, [positions])]
        per_term = {t: [] for t in terms}
        for doc in range(n_docs):
            npos = int(rng.integers(0, 14))
            pos = np.sort(rng.choice(400, size=npos, replace=False))
            owner = rng.integers(0, m, size=npos)
            for j, t in enumerate(terms):
                mine = pos[owner == j]
                if len(mine):
                    per_term[t].append((doc, mine))
            doc_tokens[doc] = list(zip(pos.tolist(), owner.tolist()))

        # term-major (term, doc) runs for the encoder
        docs_l, tfs_l, dls_l, pos_l, starts, ends = [], [], [], [], [], []
        rows_by_term = {}
        for t in terms:
            runs = per_term[t]
            if not runs:
                break
            starts.append(len(docs_l))
            for doc, mine in runs:
                docs_l.append(doc)
                tfs_l.append(len(mine))
                dls_l.append(50)
                pos_l.extend(mine.tolist())
            ends.append(len(docs_l))
        if len(starts) < m:
            continue  # a term got no postings this trial
        docs_a = np.array(docs_l, dtype=np.int64)
        tfs_a = np.array(tfs_l, dtype=np.int64)
        dls_a = np.array(dls_l, dtype=np.int64)
        pos_a = np.array(pos_l, dtype=np.int64)
        rtb = np.concatenate(([0], np.cumsum(tfs_a))).astype(np.int64)
        (doc_b, tf_b, dl_b, bmax, bmin, blast,
         sky_tf, sky_dl, sky_off, pos_b) = encode_shard_postings(
            docs_a, tfs_a, dls_a,
            np.array(starts, dtype=np.int64), np.array(ends, dtype=np.int64),
            positions=pos_a, run_tok_bounds=rtb)
        for i, t in enumerate(terms):
            rows_by_term[t] = {
                "term": t, "df": ends[i] - starts[i],
                "doc_blocks": doc_b[i], "tf_blocks": tf_b[i],
                "dl_blocks": dl_b[i], "pos_blocks": pos_b[i],
                "block_last_doc": blast[i],
            }

        slop = int(rng.integers(1, 30))
        got_docs, _scores, got_spans = near_match_shard(
            terms, slop, rows_by_term, 0,
            {t: ends[i] - starts[i] for i, t in enumerate(terms)},
            n_docs, 50.0, k=n_docs + 1)

        want = {}
        for doc in range(n_docs):
            slots_here = {sl for _, sl in doc_tokens[doc]}
            if len(slots_here) < m:
                continue
            best = _ref_min_window(doc_tokens[doc], m)
            if best is not None and best <= slop:
                want[doc] = best
        got = dict(zip(got_docs.tolist(), got_spans.tolist()))
        assert got == want, (trial, slop, got, want)


def test_phrase_scored_matches_reference(searcher, small_oracle, rows):
    """Phrase-as-term scoring: idf from the phrase's df, tf = phrase
    occurrence count (overlaps included) — checked against a brute
    pure-Python reference on phrases lifted from real docs."""
    import math

    from geospatial_spark.functions.bm25 import idf as _idf
    from geospatial_spark.functions.bm25 import B, K1

    def ref(phrase, k=10):
        slots = tokenize_py(phrase)
        m = len(slots)
        hits = []
        per_doc = {}
        for conv, turn, text in rows:
            toks = tokenize_py(text)
            ptf = sum(1 for i in range(len(toks) - m + 1)
                      if toks[i:i + m] == slots)
            if ptf:
                per_doc[f"{conv}:{turn}"] = ptf
        df = len(per_doc)
        if not df:
            return []
        for doc_id, ptf in per_doc.items():
            dl = small_oracle.doclens[doc_id]
            sat = ptf / (ptf + K1 * (1 - B + B * dl / small_oracle.avgdl))
            hits.append((doc_id, _idf(df, small_oracle.n_docs) * sat))
        hits.sort(key=lambda h: (-h[1], small_oracle.doc_sort_key(h[0])))
        return hits[:k]

    for phrase in _data_phrases(rows, 6) + ["the the", "zzz missing"]:
        got = searcher.search_phrase_scored(phrase, 10)
        want = ref(phrase, 10)
        assert [d for d, _ in got] == [d for d, _ in want], phrase
        for (gd, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), (phrase, gd)
