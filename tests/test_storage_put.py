"""Storage-adapter gate: object-store ("put") landing protocol.

put mode must never rename: artifacts land once under unique
content-tokenized names, the checkpoint/manifest record the names, and
readers resolve names from the manifest (never directory listings).
Existing posix-mode behavior (temp + os.replace) is unchanged — the
whole pre-existing suite runs through the posix path.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest


def test_put_parquet_performs_no_rename(tmp_path, monkeypatch):
    """Unit proof: the put path never calls os.replace (object stores
    have no rename); the posix path does."""
    import os

    from geospatial_spark.plans import build as B

    df = pd.DataFrame({"shard": [1], "doc_ord": [1], "doc_id": ["a:0"],
                       "dl": [3]})

    def boom(*a, **kw):
        raise AssertionError("rename is not available on this storage")

    monkeypatch.setattr(os, "replace", boom)
    B._write_parquet(df, tmp_path / "docmap-00001-abc.parquet", "put")
    assert (tmp_path / "docmap-00001-abc.parquet").exists()
    with pytest.raises(AssertionError):
        B._write_parquet(df, tmp_path / "docmap-00001.parquet", "posix")


@pytest.fixture(scope="module")
def put_index(spark, small_transcripts, tmp_path_factory):
    from geospatial_spark.plans.build import build_index

    root = str(tmp_path_factory.mktemp("putidx") / "idx")
    m = build_index(spark, small_transcripts, root, n_shards=4, storage="put")
    return root, m


def test_put_names_are_tokenized_and_recorded(put_index):
    from pathlib import Path

    from geospatial_spark.plans import lifecycle as lc

    root, m = put_index
    assert m["storage"] == "put"
    gdir = lc.gen_dir(root, m["generation"])
    for s in m["shards"]:
        # unique name: segments-XXXXX-<fp10>.parquet, recorded in manifest
        assert s["segment_file"].startswith(f"segments-{s['shard']:05d}-")
        assert s["segment_file"].endswith(".parquet")
        assert (gdir / s["segment_file"]).exists()
        assert (gdir / s["docmap_file"]).exists()
        cp = lc.read_json(lc.checkpoint_path(gdir, s["shard"]))
        assert cp["files"]["segments"] == s["segment_file"]
    # no temp-file leftovers, no legacy-name files
    assert not list(Path(gdir).glob("*.tmp"))


def test_put_mode_search_matches_oracle(spark, put_index, small_oracle):
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    root, _ = put_index
    s = IndexSearcher(spark, root)
    ls = LocalSearcher(root)
    for q in ["deploy the spark job", "the", "spark"]:
        want = small_oracle.search(q, 10)
        for got in (s.search(q, 10), ls.search(q, 10)):
            assert [d for d, _ in got] == [d for d, _ in want], q
            for (gd, gs), (_, ws) in zip(got, want):
                assert math.isclose(gs, ws, rel_tol=1e-9), (q, gd)


def test_put_mode_resume_skips(spark, small_transcripts, put_index):
    from geospatial_spark.plans.build import build_index

    root, _ = put_index
    m2 = build_index(spark, small_transcripts, root, n_shards=4, storage="put")
    assert all(s["skipped"] == 1 for s in m2["shards"])


def test_put_mode_rebuild_purges_stale_tokens(spark, small_transcripts,
                                              tmp_path_factory):
    """A content change re-lands under a NEW token; the old object is
    purged and the manifest points at the new one."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path_factory.mktemp("putidx2") / "idx")
    m1 = build_index(spark, small_transcripts, root, n_shards=2, storage="put")
    old = {s["shard"]: s["segment_file"] for s in m1["shards"]}
    changed = small_transcripts.withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz9freshterm")))
    m2 = build_index(spark, changed, root, n_shards=2, storage="put")
    gdir = lc.gen_dir(root, m2["generation"])
    names = {p.name for p in Path(gdir).glob("segments-*.parquet")}
    for s in m2["shards"]:
        assert s["segment_file"] != old[s["shard"]]
        assert s["segment_file"] in names
        assert old[s["shard"]] not in names  # stale object purged
    hits = IndexSearcher(spark, root).search("zz9freshterm", 5)
    assert hits


def test_store_positions_false_builds_smaller(spark, tiny_transcripts,
                                              tmp_path_factory, small_oracle):
    """store_positions=False: plain search identical, phrase refused
    cleanly, segment bytes strictly smaller than a positions build."""
    import math

    import pytest as _pytest

    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher

    base = tmp_path_factory.mktemp("nopos")
    m_with = build_index(spark, tiny_transcripts, str(base / "w"), n_shards=2)
    m_wo = build_index(spark, tiny_transcripts, str(base / "wo"), n_shards=2,
                       store_positions=False)
    b_with = sum(s["bytes_compressed"] for s in m_with["shards"])
    b_wo = sum(s["bytes_compressed"] for s in m_wo["shards"])
    assert b_wo < b_with
    assert m_wo["positions"] is False

    s_w = IndexSearcher(spark, str(base / "w"))
    s_o = IndexSearcher(spark, str(base / "wo"))
    for q in ["the spark", "deploy"]:
        a, b = s_w.search(q, 5), s_o.search(q, 5)
        assert [d for d, _ in a] == [d for d, _ in b]
        for (_, sa), (_, sb) in zip(a, b):
            assert math.isclose(sa, sb, rel_tol=1e-12)
    with _pytest.raises(ValueError, match="store_positions"):
        s_o.search_phrase_df("the spark", 5)
    with _pytest.raises(ValueError, match="store_positions"):
        s_o.search_near_df("the spark", 2, 5)
    # append must not silently flip the flag
    with _pytest.raises(ValueError, match="store_positions"):
        build_index(spark, tiny_transcripts, str(base / "wo"), n_shards=2,
                    generation="g0002", append=True, store_positions=True)


def test_put_mode_dictionary_is_landed_not_committed(spark, put_index,
                                                     small_oracle):
    """The per-generation dictionary must land through the storage
    adapter: unique tokenized names recorded in the manifest, no Spark
    committer artifacts (_SUCCESS/_temporary mean a rename happened),
    and readers must resolve names from the manifest — a stray poison
    file in the directory is invisible to them."""
    from pathlib import Path

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.query import IndexSearcher
    from geospatial_spark.plans.serve import LocalSearcher

    root, m = put_index
    gen = next(g for g in m["generations"] if g["id"] == m["generation"])
    names = gen.get("dictionary_files")
    assert names, "put-mode manifest must record dictionary file names"
    ddir = lc.gen_dir(root, m["generation"]) / "dictionary"
    on_disk = {p.name for p in ddir.iterdir()}
    assert set(names) == on_disk  # exactly the recorded objects: no
    assert "_SUCCESS" not in on_disk  # committer artifacts, no temps
    assert all(n.startswith("dict-") and n.endswith(".parquet")
               for n in names)

    # poison: a glob-based reader would double every df through this
    poison = pa.Table.from_pandas(pd.DataFrame(
        {"term": ["the"], "df": [999999], "max_tf": [1], "has_imp": [0]}))
    pq.write_table(poison, ddir / "dict-poisonpoison.parquet")
    try:
        s = IndexSearcher(spark, root)
        ls = LocalSearcher(root)
        want = small_oracle.search("the spark", 10)
        for got in (s.search("the spark", 10), ls.search("the spark", 10)):
            assert [d for d, _ in got] == [d for d, _ in want]
            for (gd, gs), (_, ws) in zip(got, want):
                assert math.isclose(gs, ws, rel_tol=1e-9), gd
    finally:
        (ddir / "dict-poisonpoison.parquet").unlink()
