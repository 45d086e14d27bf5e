"""SynonymQuery scoring and dedup retention invariants."""

from __future__ import annotations

import math


def test_synonym_blended_scoring(spark, small_transcripts):
    from geospatial_spark.operators import postings as P
    from geospatial_spark.operators.scorer import (bm25_topk,
                                                   bm25_topk_synonyms)

    post = P.posting_tuples(small_transcripts)
    tok = P.tokenized(small_transcripts)
    n, avgdl = P.corpus_stats(tok.select("doc_id", "dl"))
    # singleton groups ≡ the plain OR scorer (same tf, df = own df)
    plain = bm25_topk(spark, post, None, n, avgdl, "spark deploy", 10)
    syn = bm25_topk_synonyms(spark, post, n, avgdl,
                             [["spark"], ["deploy"]], 10)
    a = {r["doc_id"]: r["score"] for r in plain.collect()}
    b = {r["doc_id"]: r["score"] for r in syn.collect()}
    assert set(a) == set(b)
    for d in a:
        assert math.isclose(a[d], b[d], rel_tol=1e-9)
    # a real group must score differently from the plain OR (blended
    # df + summed tf changes saturation) while matching the same docs
    plain2 = {r["doc_id"]: r["score"]
              for r in bm25_topk(spark, post, None, n, avgdl,
                                 "spark job", n).collect()}
    syn2 = {r["doc_id"]: r["score"]
            for r in bm25_topk_synonyms(spark, post, n, avgdl,
                                        [["spark", "job"]], n).collect()}
    assert set(plain2) == set(syn2)
    assert any(not math.isclose(plain2[d], syn2[d], rel_tol=1e-9)
               for d in plain2)


def test_keep_canonical_invariants(spark, small_transcripts):
    from geospatial_spark.operators.dedup import dup_groups, keep_canonical
    from geospatial_spark.sources.transcripts import with_doc_id

    docs = with_doc_id(small_transcripts).select("doc_id", "text")
    groups = {r["doc_id"]: (r["canonical_id"], r["group_size"])
              for r in dup_groups(docs, "doc_id", threshold=0.8).collect()}
    kept = {r["doc_id"]: r["group_size"]
            for r in keep_canonical(docs, "doc_id",
                                    threshold=0.8).collect()}
    # exactly one kept doc per canonical group, sizes consistent
    n_groups = len({c for c, _ in groups.values()})
    assert len(kept) == n_groups
    canon_of_kept = {groups[d][0] for d in kept}
    assert len(canon_of_kept) == len(kept)
    for d, gs in kept.items():
        assert groups[d][1] == gs
    # every dropped doc's group still has a kept representative
    for d, (c, gs) in groups.items():
        assert c in {groups[k][0] for k in kept} or gs == 1
