"""Physical-plan shape gates: the properties that keep the engine fast
at 100 TB must be visible in .explain output, not assumed.

  * column pruning  — tokenize stage reads ONLY the needed columns
  * predicate pushdown — query-term filters reach the parquet scan
  * broadcast joins — dictionary sides never shuffle the fact side
  * whole-stage codegen — relational scoring stays JVM-side
"""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._sc is not None and df._jdf.queryExecution().explainString("formatted") or ""


def explain(df) -> str:
    from contextlib import redirect_stdout
    from io import StringIO

    buf = StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_tokenize_scan_prunes_columns(spark):
    """Posting build over transcripts must read only conv_id, turn_idx,
    text — never role/tool/ts (ReadSchema check)."""
    from geospatial_spark.operators.postings import posting_tuples
    from geospatial_spark.sources.transcripts import read_transcripts

    # use the real parquet reader path
    import tempfile

    from fixtures.datagen import gen_transcripts

    d = tempfile.mkdtemp()
    gen_transcripts(10).to_parquet(f"{d}/t.parquet", index=False)
    tx = read_transcripts(spark, f"{d}/t.parquet")
    plan = explain(posting_tuples(tx))
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan, plan
    line = scan[0]
    assert "text" in line
    assert "role" not in line and "tool" not in line and "ts" not in line


def test_segment_scan_pushes_term_filter(spark, tmp_path):
    """The query path's term filter must appear in PushedFilters on the
    segments parquet scan."""
    from pyspark.sql import functions as F

    from fixtures.datagen import gen_transcripts
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.sources.transcripts import read_transcripts

    p = tmp_path / "t.parquet"
    gen_transcripts(30).to_parquet(p, index=False)
    tx = read_transcripts(spark, str(p))
    root = str(tmp_path / "idx")
    build_index(spark, tx, root, n_shards=2)
    s = IndexSearcher(spark, root)
    matched = s._segments().where(F.col("term").isin(["spark", "the"]))
    plan = explain(matched)
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "In(term" in pushed or "term" in pushed, pushed


def test_scorer_uses_broadcast_join(spark, small_transcripts):
    """Naive relational scorer: query terms join must be broadcast (no
    shuffle of the postings side on the term key)."""
    from geospatial_spark.operators.postings import corpus_stats, doclens, posting_tuples
    from geospatial_spark.operators.scorer import bm25_topk

    post = posting_tuples(small_transcripts)
    dl = doclens(small_transcripts)
    n, avgdl = corpus_stats(dl)
    topk = bm25_topk(spark, post, dl, n, avgdl, "deploy the spark job", 10)
    plan = explain(topk)
    assert "BroadcastHashJoin" in plan, plan


def test_scorer_stays_in_codegen(spark, small_transcripts):
    """BM25 scoring expressions must sit inside WholeStageCodegen spans
    (no Python in the relational path)."""
    from geospatial_spark.operators.postings import corpus_stats, doclens, posting_tuples
    from geospatial_spark.operators.scorer import bm25_topk

    post = posting_tuples(small_transcripts)
    dl = doclens(small_transcripts)
    n, avgdl = corpus_stats(dl)
    topk = bm25_topk(spark, post, dl, n, avgdl, "deploy the spark job", 10)
    plan = explain(topk)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    from contextlib import redirect_stdout
    from io import StringIO

    buf = StringIO()
    with redirect_stdout(buf):
        topk.explain("codegen")
    assert "WholeStageCodegen" in buf.getvalue()


def test_enrich_join_broadcasts_dims(spark):
    from geospatial_spark.plans import catalog

    df = catalog.queries()["enrich_region_stats"](spark, "/root/testdata/sf0.001")
    plan = explain(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_topk_is_take_ordered(spark, small_transcripts):
    """orderBy + limit must compile to TakeOrderedAndProject (per-
    partition heap + driver merge), not a global sort."""
    from geospatial_spark.operators.postings import corpus_stats, doclens, posting_tuples
    from geospatial_spark.operators.scorer import bm25_topk

    post = posting_tuples(small_transcripts)
    dl = doclens(small_transcripts)
    n, avgdl = corpus_stats(dl)
    topk = bm25_topk(spark, post, dl, n, avgdl, "spark table", 10)
    plan = explain(topk)
    assert "TakeOrderedAndProject" in plan, plan


def test_scorer_has_no_doclens_join(spark, small_transcripts):
    """dl rides inside the posting tuple: the per-query plan must contain
    NO join on doc_id (round 1 shuffled a corpus-sized doclens table per
    query — the scale-killer the verdict flagged)."""
    from geospatial_spark.operators.postings import corpus_stats, doclens, posting_tuples
    from geospatial_spark.operators.scorer import bm25_topk

    post = posting_tuples(small_transcripts)
    dl = doclens(small_transcripts)
    n, avgdl = corpus_stats(dl)
    topk = bm25_topk(spark, post, None, n, avgdl, "deploy the spark job", 10)
    plan = explain(topk)
    # every remaining join must be a broadcast on term, never doc_id
    for line in plan.splitlines():
        if "Join" in line and "doc_id" in line:
            raise AssertionError(f"doc_id join survived: {line}\n{plan}")
    assert "SortMergeJoin" not in plan, plan


def test_scorer_df_from_filtered_postings_only(spark, small_transcripts):
    """df must be computed from the term-FILTERED matched rows, never by
    aggregating the full corpus-sized posting set (round-2 verdict:
    Catalyst does not push an inner join below an Aggregate, so a
    postings.groupBy('term') branch re-scans everything per query). The
    plan must contain exactly ONE branch over the postings relation —
    every aggregate sits above the broadcast term filter."""
    from geospatial_spark.operators.postings import corpus_stats, doclens, posting_tuples
    from geospatial_spark.operators.scorer import bm25_topk

    post = posting_tuples(small_transcripts)
    dl = doclens(small_transcripts)
    n, avgdl = corpus_stats(dl)
    topk = bm25_topk(spark, post, None, n, avgdl, "deploy the spark job", 10)
    plan = explain(topk)
    # one BroadcastHashJoin (the term filter), one postings branch: the
    # tokenizer's Python eval appears exactly once in the physical plan
    tree = plan.split("\n\n", 1)[0]  # the indented tree section only
    n_scans = sum(1 for l in tree.splitlines() if "Scan parquet" in l)
    assert n_scans == 1, f"postings branch duplicated ({n_scans} scans):\n{tree}"
    n_bhj = sum(1 for l in tree.splitlines() if "BroadcastHashJoin" in l)
    assert n_bhj == 1, tree


def test_shingles_have_no_window(spark):
    """Shingling is a per-row array expression: no Window (shuffle+sort
    per doc) may appear in the plan."""
    from geospatial_spark.operators.dedup import shingle_rows
    from geospatial_spark.plans.catalog import _docs

    ex = shingle_rows(_docs(spark, "/root/testdata/sf0.001"), "doc_id")
    plan = explain(ex)
    assert "Window" not in plan, plan


def test_simhash_has_single_aggregate_no_explode_blowup(spark):
    """SimHash is one hash aggregate on doc_id (33 sums); the 32-way bit
    explode (32x shuffle blowup) must be gone."""
    from geospatial_spark.operators.dedup import simhash
    from geospatial_spark.plans.catalog import _docs

    import re

    df = simhash(_docs(spark, "/root/testdata/sf0.001"), "doc_id")
    plan = explain(df)
    # exactly one HASH-partitioned exchange: the doc_id aggregate. A
    # round-robin exchange from the scan-width repartition (_scan_wide,
    # round 6) is allowed — it spreads a single-file scan, it is not an
    # aggregation shuffle.
    assert len(re.findall(r"hashpartitioning", plan)) == 1, plan
    # exactly one Generate: the single token explode (round 1 had two)
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1, plan


def test_plain_search_scan_prunes_positions(spark, tiny_transcripts,
                                            tmp_path_factory):
    """Non-phrase search must not ship position bytes: the pos_blocks
    drop has to reach the parquet scan (ReadSchema excludes it), and
    the phrase path must read it."""
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path_factory.mktemp("pruneidx") / "idx")
    build_index(spark, tiny_transcripts, root, n_shards=2)
    s = IndexSearcher(spark, root)
    # pin the DISTRIBUTED plan: small-k searches dispatch to the
    # serving-tier LocalSearcher (no Spark job, nothing to explain);
    # the column-pruning contract under test belongs to the big-k path
    s.LOCAL_SEARCH_MAX_K = -1
    plain = explain(s.search_df("the spark", 5))
    scans = [ln for ln in plain.splitlines() if "ReadSchema" in ln]
    seg_scans = [ln for ln in scans if "doc_blocks" in ln]
    assert seg_scans and all("pos_blocks" not in ln for ln in seg_scans), plain
    phrase = explain(s.search_phrase_df("the spark", 5))
    assert any("pos_blocks" in ln for ln in phrase.splitlines()
               if "ReadSchema" in ln), phrase


def test_sample_mixture_is_pure_filter_no_shuffle(spark):
    """Mixture sampling must be a projection + filter (whole-stage
    codegen, no Exchange, no sampling pass): the keep/drop decision is
    a per-row hash, so the plan has zero shuffles and zero extra scans."""
    from geospatial_spark.operators.curation import sample_mixture

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = explain(sample_mixture(docs, {"src0": 0.5, "src1": 0.1}))
    tree = plan.split("\n\n", 1)[0]
    assert "Exchange" not in tree, tree
    assert sum(1 for l in tree.splitlines() if "Scan parquet" in l) == 1
    # formatted mode marks codegen stages with a leading '*'
    assert "* Filter" in tree, tree


def test_contamination_probe_side_broadcasts(spark):
    """The probe (benchmark) shingle set must reach the corpus side as
    a broadcast — the corpus shingles never shuffle for the overlap
    join (the probe is small by construction; the corpus is not)."""
    from geospatial_spark.operators.curation import contamination_screen

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = explain(contamination_screen(docs))
    tree = plan.split("\n\n", 1)[0]
    assert "BroadcastHashJoin" in tree, tree
    # the overlap join itself must not be a SortMergeJoin over shingles
    smj = [l for l in tree.splitlines() if "SortMergeJoin" in l]
    bhj = [l for l in tree.splitlines() if "BroadcastHashJoin" in l]
    assert len(bhj) >= 1 and len(smj) <= 2, tree
