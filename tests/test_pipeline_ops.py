"""Training-data pipeline operators: properties the driver gate can't
check (approximate-op recall, stub behavior, operator invariants)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def test_lsh_ann_recall_vs_bruteforce(spark):
    from geospatial_spark.plans import catalog

    q = catalog.queries()
    bf = {(r["q"], r["vec_id"]) for r in q["ann_topk_bruteforce"](spark, SF).collect()}
    ls = {(r["q"], r["vec_id"]) for r in q["ann_topk_lsh"](spark, SF).collect()}
    recall = len(bf & ls) / len(bf)
    assert recall >= 0.9, recall


def test_ivf_ann_recall_vs_bruteforce(spark):
    from geospatial_spark.plans import catalog

    q = catalog.queries()
    bf = {(r["q"], r["vec_id"]) for r in q["ann_topk_bruteforce"](spark, SF).collect()}
    iv = {(r["q"], r["vec_id"]) for r in q["ann_topk_ivf"](spark, SF).collect()}
    recall = len(bf & iv) / len(bf)
    assert recall >= 0.8, recall


def test_multimodal_compressed_decode_is_stubbed():
    """Only COMPRESSED formats remain stubbed (codec libs absent);
    uncompressed PPM/WAV decode for real (test_decode_ppm_and_wav)."""
    from geospatial_spark.sources.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_multimodal_plumbing_batches(spark):
    """Binary payloads flow through Arrow batches with the declared
    schema regardless of batch boundaries."""
    from geospatial_spark.plans import catalog

    df = catalog.queries()["multimodal_features"](spark, SF)
    rows = df.collect()
    assert len(rows) == 500
    assert df.columns == ["doc_id", "n_bytes", "content_md5", "head_hex"]
    r0 = next(r for r in rows if r["doc_id"] == 0)
    assert r0["n_bytes"] > 0 and len(r0["content_md5"]) == 32


def test_exact_dedup_finds_injected_dups(spark, tmp_path):
    import pandas as pd

    from geospatial_spark.operators.dedup import exact_dup_groups

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["Same text!", "same TEXT", "unique one", "same, text"],
    })
    p = tmp_path / "d.parquet"
    pdf.to_parquet(p, index=False)
    out = exact_dup_groups(spark.read.parquet(str(p)), "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    # normalization collapses case/punct: docs 1, 2, 4 are one group
    assert by_id[1]["group_size"] == 3
    assert by_id[1]["canonical_id"] == 1
    assert by_id[4]["canonical_id"] == 1
    assert by_id[3]["group_size"] == 1


def test_salted_agg_matches_plain(spark):
    from pyspark.sql import functions as F

    from geospatial_spark.operators.grid import salted_agg

    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("k"), F.lit(1).alias("v"))
    got = {r["k"]: r["sum_v"] for r in salted_agg(df, "k", "v", salts=8).collect()}
    want = {r["k"]: r["s"] for r in
            df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert got == want


def test_flatten_conversations(spark, tiny_transcripts):
    """S2: nested conv rows → per-turn rows, lossless round-trip."""
    from pyspark.sql import functions as F

    from geospatial_spark.sources.transcripts import flatten_conversations

    nested = tiny_transcripts.groupBy("conv_id").agg(
        F.sort_array(F.collect_list(
            F.struct("turn_idx", "role", "text", "tool", "ts"))).alias("turns"))
    flat = flatten_conversations(nested)
    a = sorted([tuple(r) for r in flat.collect()], key=repr)
    b = sorted([tuple(r) for r in tiny_transcripts.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts").collect()], key=repr)
    assert a == b


def test_fetch_doc_text_and_search_by_doc(spark, small_transcripts, small_oracle, tmp_path):
    """T1 limit-1 lookup + J4 query-by-indexed-doc (fetch-then-query)."""
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path / "idx")
    build_index(spark, small_transcripts, root, n_shards=4)
    s = IndexSearcher(spark, root)
    doc_id = "conv-00000002:0"  # the 'singleton' edge row
    text = s.fetch_doc_text(doc_id, small_transcripts)
    assert text == "singleton"
    got = s.search_by_doc(doc_id, small_transcripts, 5)
    expected = small_oracle.search(text, 5)
    assert [d for d, _ in got] == [d for d, _ in expected]
    assert s.fetch_doc_text("conv-zzz:0", small_transcripts) is None
    assert s.search_by_doc("conv-zzz:0", small_transcripts, 5) == []


def test_multi_value_lookup_sorted(spark):
    import pandas as pd

    from geospatial_spark.operators.enrich import multi_value_lookup

    facts = spark.createDataFrame(
        [(1, ["b", "a"]), (2, ["c"]), (3, [])], ["id", "keys"])
    dim = spark.createDataFrame(
        [("a", "A"), ("b", "B"), ("c", "C")], ["k", "payload"])
    out = {r["id"]: r["payloads"] for r in
           multi_value_lookup(facts, "id", "keys", dim, "k", "payload").collect()}
    assert out[1] == ["A", "B"]
    assert out[2] == ["C"]
    assert out[3] == []


def test_dup_groups_transitive_closure(spark):
    """Chained pairs must collapse transitively: A~B, B~C → one group
    with canonical min(A,B,C), regardless of discovery order."""
    from geospatial_spark.operators.dedup import dup_groups

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(1, 7)],
                                 ["doc_id", "text"])
    pairs = spark.createDataFrame([(2, 3), (1, 2), (5, 6)], ["a", "b"])
    got = {r["doc_id"]: (r["canonical_id"], r["group_size"])
           for r in dup_groups(docs, "doc_id", pairs=pairs).collect()}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3),
                   4: (4, 1), 5: (5, 2), 6: (5, 2)}


def test_dup_groups_distributed_path(spark):
    """The unbounded-graph path (driver_max_edges=0 forces it) must
    agree with the driver union-find on a chained graph."""
    from geospatial_spark.operators.dedup import dup_groups

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(1, 9)],
                                 ["doc_id", "text"])
    pairs = spark.createDataFrame([(2, 3), (1, 2), (5, 6), (3, 4), (7, 8),
                                   (6, 7)], ["a", "b"])
    got = {r["doc_id"]: (r["canonical_id"], r["group_size"])
           for r in dup_groups(docs, "doc_id", pairs=pairs,
                               driver_max_edges=0).collect()}
    assert got == {1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
                   5: (5, 4), 6: (5, 4), 7: (5, 4), 8: (5, 4)}


def test_star_contract_path_graph_bounded_rounds(spark):
    """large-star/small-star must collapse a 1000-node PATH graph (the
    worst case for min-label propagation, which needs ~diameter rounds)
    within 10 rounds — O(log n), not O(diameter)."""
    from pyspark.sql import functions as F

    from geospatial_spark.operators.dedup import _star_contract

    n = 1000
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  ["s", "d"])
    edges = (pairs.unionByName(pairs.select(F.col("d").alias("s"),
                                            F.col("s").alias("d"))))
    labels = {r["node"]: r["label"]
              for r in _star_contract(edges, max_iters=10).collect()}
    # max_iters=10 doubles as the round bound: convergence past 10
    # rounds raises, so reaching here proves O(log n) behavior
    assert len(labels) == n
    assert all(v == 0 for v in labels.values())


def test_range_lookup_chunked_parity(spark):
    """Chunked (hash equi-join) and nested-loop range lookups agree,
    including misses and boundary values."""
    import pandas as pd

    from geospatial_spark.operators.enrich import range_lookup

    facts = spark.createDataFrame(pd.DataFrame({
        "id": list(range(12)),
        "v": [-5.0, 0.0, 999.99, 1000.0, 2500.0, 4999.9, 5000.0,
              8999.0, 9000.0, 12000.0, 500.0, 1.5]}))
    dim = spark.createDataFrame(
        [(0.0, 1000.0, "low"), (1000.0, 5000.0, "mid"),
         (5000.0, 9000.0, "high")], "lo double, hi double, tier string")
    a = sorted(map(tuple, range_lookup(facts, dim, "v").collect()))
    b = sorted(map(tuple, range_lookup(facts, dim, "v",
                                       chunk=750.0).collect()))
    assert a == b
    by_id = {r[0]: r[2] for r in a}
    assert by_id[0] is None and by_id[9] is None      # below/above all
    assert by_id[1] == "low" and by_id[3] == "mid"    # inclusive lo
    assert by_id[8] is None                           # exclusive hi


def _ppm(w, h, rgb):
    head = f"P6\n# handcrafted\n{w} {h}\n255\n".encode()
    return head + bytes(rgb)


def _wav(rate, samples16):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples16)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", 4) + b"INFO"  # skipped chunk
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_ppm_and_wav():
    """Real pure-Python decode of handcrafted uncompressed media."""
    import numpy as np
    import pytest as _pt

    from geospatial_spark.sources.multimodal import (
        decode_media,
        decode_ppm,
        decode_wav,
    )

    img = decode_ppm(_ppm(2, 2, [255, 0, 0, 0, 255, 0,
                                 0, 0, 255, 10, 20, 30]))
    assert (img["width"], img["height"]) == (2, 2)
    assert img["pixels"].shape == (2, 2, 3)
    assert tuple(img["pixels"][0, 0]) == (255, 0, 0)
    assert tuple(img["pixels"][1, 1]) == (10, 20, 30)

    wav = decode_wav(_wav(8000, [0, 1000, -1000, 32767, -32768, 0]))
    assert wav["sample_rate"] == 8000 and wav["n_channels"] == 1
    assert wav["samples"].shape == (6, 1)
    assert int(wav["samples"][3, 0]) == 32767

    assert decode_media(_ppm(1, 1, [1, 2, 3]))["kind"] == "image/ppm"
    with _pt.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n1 2 3")     # ASCII PPM is not P6
    with _pt.raises(ValueError):
        decode_ppm(_ppm(4, 4, [0] * 12))        # truncated raster
    with _pt.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff\xe0JFIF")   # JPEG stays stubbed
    import struct as _s

    gsm = (b"RIFF" + _s.pack("<I", 28) + b"WAVE" + b"fmt "
           + _s.pack("<I", 16) + _s.pack("<HHIIHH", 49, 1, 8000, 1625, 65, 0)
           + b"data" + _s.pack("<I", 0))
    with _pt.raises(NotImplementedError):
        decode_media(gsm)                       # compressed WAVE stubbed


def test_extract_media_features(spark):
    """Spark-side real feature extraction: PPM pixel means, WAV RMS,
    graceful unknown-kind degradation."""
    import math

    rows = [
        (1, _ppm(2, 1, [10, 20, 30, 30, 40, 50])),
        (2, _wav(16000, [3, 4, 3, 4])),
        (3, b"not media at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    from geospatial_spark.sources.multimodal import extract_media_features

    got = {r["doc_id"]: r for r in extract_media_features(df).collect()}
    assert got[1]["kind"] == "image/ppm"
    assert (got[1]["width"], got[1]["height"]) == (2, 1)
    assert got[1]["mean_r"] == 20.0 and got[1]["mean_b"] == 40.0
    assert got[2]["kind"] == "audio/wav"
    assert got[2]["n_samples"] == 4 and got[2]["sample_rate"] == 16000
    assert math.isclose(got[2]["rms"], math.sqrt((9 + 16 + 9 + 16) / 4))
    assert got[3]["kind"] == "unknown" and got[3]["rms"] is None


def test_media_features_truncated_wav_degrades():
    """A RIFF/WAVE header whose fmt chunk is cut short raises
    struct.error inside decode_wav's unpack_from — _media_features must
    degrade it to kind='unknown' instead of failing the stage."""
    from geospatial_spark.sources.multimodal import _media_features

    truncated = b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00"
    out = _media_features(truncated)
    assert out["kind"] == "unknown" and out["rms"] is None


def test_range_lookup_randomized(spark):
    """Seeded randomized parity: many disjoint intervals, values planted
    on/off boundaries; both join modes vs a numpy reference."""
    import numpy as np
    import pandas as pd

    from geospatial_spark.operators.enrich import range_lookup

    rng = np.random.default_rng(11)
    # 60 disjoint intervals with gaps
    edges = np.sort(rng.choice(np.arange(0, 20_000), size=240,
                               replace=False)).astype("float64")
    lo, hi = edges[0::4], edges[1::4]  # every other span is a GAP
    dim_pd = pd.DataFrame({"lo": lo, "hi": hi,
                           "tier": [f"t{i}" for i in range(len(lo))]})
    vals = np.concatenate([
        rng.uniform(-100, 20_100, size=300),
        lo[:20], hi[:20] - 1e-9, hi[:20],  # boundary probes
    ])
    facts_pd = pd.DataFrame({"id": np.arange(len(vals)), "v": vals})

    def ref(v):
        j = np.where((lo <= v) & (v < hi))[0]
        return f"t{j[0]}" if len(j) else None

    want = sorted((int(i), ref(v)) for i, v in zip(facts_pd["id"], vals))
    facts = spark.createDataFrame(facts_pd)
    dim = spark.createDataFrame(dim_pd)
    for chunk in (None, 500.0):
        got = sorted((int(r["id"]), r["tier"])
                     for r in range_lookup(facts, dim, "v",
                                           chunk=chunk).collect())
        assert got == want, f"chunk={chunk}"


def test_filtered_ann(spark):
    """Filtered vector search: the corpus predicate prunes candidates
    exactly (brute force), the LSH path keeps recall on the filtered
    universe, and a query excluded by the filter still probes."""
    from pyspark.sql import functions as F

    from geospatial_spark.plans import catalog
    from geospatial_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pred = F.pmod(F.col("vec_id"), F.lit(3)) == 0
    bf = catalog.queries()["ann_topk_filtered"](spark, SF).collect()
    # every hit satisfies the predicate; query ids include non-matching
    assert bf and all(r["vec_id"] % 3 == 0 for r in bf)
    qs = {r["q"] for r in bf}
    assert any(q % 3 != 0 for q in qs)  # excluded query still probed

    ls = lsh_topk(emb, catalog.ANN_QUERY_IDS, 10, where=pred).collect()
    assert all(r["vec_id"] % 3 == 0 for r in ls)
    bf_set = {(r["q"], r["vec_id"]) for r in bf}
    ls_set = {(r["q"], r["vec_id"]) for r in ls}
    recall = len(bf_set & ls_set) / len(bf_set)
    assert recall >= 0.9, recall

    # unfiltered call unchanged (no behavior drift from the new param)
    plain = brute_force_topk(emb, catalog.ANN_QUERY_IDS, 10).collect()
    assert {r["vec_id"] % 3 for r in plain} == {0, 1, 2}
