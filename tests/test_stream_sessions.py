"""Stateful streaming sessionization (applyInPandasWithState): closed
sessions emitted on gap or watermark timeout; cross-micro-batch state;
parity with a pure-Python reference sessionizer on the same events."""

from __future__ import annotations

import pandas as pd
import pytest


def _ref_sessions(rows, gap_minutes):
    """Reference: per-user sorted sweep, same gap rule."""
    gap = pd.Timedelta(minutes=gap_minutes)
    out = []
    by_user: dict[str, list[pd.Timestamp]] = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(pd.Timestamp(t))
    for u, ts in by_user.items():
        ts.sort()
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > gap:
                out.append((u, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        out.append((u, start, last, n))
    return sorted(out)


def _run_stream(spark, src_dir, gap_minutes):
    from geospatial_spark.streaming.sessions import sessionize_stream

    schema = "user_id string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(str(src_dir))
    q = (sessionize_stream(stream, gap_minutes=gap_minutes,
                           watermark="0 seconds")
         .writeStream.format("memory").queryName("sess")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return sorted(
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"])
        for r in spark.sql("select * from sess").collect())


def test_stream_sessions_match_reference(spark, tmp_path):
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    # user a: two sessions separated by a 90-minute gap
    for m in (0, 5, 12):
        rows.append(("a", base + pd.Timedelta(minutes=m)))
    for m in (102, 110):
        rows.append(("a", base + pd.Timedelta(minutes=m)))
    # user b: one long session (each hop under the gap)
    for m in (0, 20, 40, 60):
        rows.append(("b", base + pd.Timedelta(minutes=m)))
    # sentinel event far in the future: advances the watermark past
    # every open session's gap deadline so timeouts flush them
    rows.append(("zz-sentinel", base + pd.Timedelta(days=7)))

    src = tmp_path / "ev"
    src.mkdir()
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark reads µs
    pdf.to_parquet(src / "a.parquet", index=False)

    got = _run_stream(spark, src, gap_minutes=30)
    want = _ref_sessions([(u, t) for u, t in rows
                          if u != "zz-sentinel"], 30)
    got_wo_sentinel = [g for g in got if g[0] != "zz-sentinel"]
    assert [(u, s, e, n) for u, s, e, n in got_wo_sentinel] == \
        [(u, s, e, n) for u, s, e, n in want]
    # both of user a's sessions closed, b's single session closed
    assert sum(1 for g in got_wo_sentinel if g[0] == "a") == 2
    assert sum(1 for g in got_wo_sentinel if g[0] == "b") == 1


def test_stream_sessions_state_survives_batches(spark, tmp_path):
    """A session spanning two micro-batches (file drops) closes ONCE
    with the merged count — per-key state carries across batches."""
    base = pd.Timestamp("2026-02-01 09:00:00")
    src = tmp_path / "ev"
    src.mkdir()
    ck = tmp_path / "ck"
    b1 = pd.DataFrame([("u", base),
                       ("u", base + pd.Timedelta(minutes=10))],
                      columns=["user_id", "ts"])
    b1["ts"] = b1["ts"].astype("datetime64[us]")
    b1.to_parquet(src / "b1.parquet", index=False)

    from geospatial_spark.streaming.sessions import sessionize_stream

    schema = "user_id string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (sessionize_stream(stream, gap_minutes=30,
                           watermark="0 seconds")
         .writeStream.format("memory").queryName("sess2")
         .outputMode("append")
         .option("checkpointLocation", str(ck))
         .start())
    try:
        q.processAllAvailable()  # micro-batch 1: session still open
        assert spark.sql("select * from sess2").count() == 0

        # batch 2 extends the same session, then a far event closes it
        b2 = pd.DataFrame([("u", base + pd.Timedelta(minutes=25)),
                           ("u", base + pd.Timedelta(hours=9))],
                          columns=["user_id", "ts"])
        b2["ts"] = b2["ts"].astype("datetime64[us]")
        b2.to_parquet(src / "b2.parquet", index=False)
        q.processAllAvailable()
        got = sorted(
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"])
            for r in spark.sql("select * from sess2").collect())
        assert (("u", base, base + pd.Timedelta(minutes=25), 3)
                in [(u, s, e, n) for u, s, e, n in got])
    finally:
        q.stop()


def test_stream_sessions_out_of_order_stragglers(spark, tmp_path):
    """In-watermark events arriving in a LATER batch that precede the
    open session's start: within-gap stragglers move session_start back
    (batch parity); a straggler more than gap before start closes as
    its own earlier session."""
    base = pd.Timestamp("2026-03-01 10:00:00")
    src = tmp_path / "ev"
    src.mkdir()
    ck = tmp_path / "ck"

    def drop(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(src / name, index=False)

    drop("b1.parquet", [("u1", base), ("u1", base + pd.Timedelta(minutes=10)),
                        ("u2", base)])

    from geospatial_spark.streaming.sessions import sessionize_stream

    stream = spark.readStream.schema("user_id string, ts timestamp") \
        .parquet(str(src))
    q = (sessionize_stream(stream, gap_minutes=30, watermark="2 hours")
         .writeStream.format("memory").queryName("sess3")
         .outputMode("append")
         .option("checkpointLocation", str(ck))
         .start())
    try:
        q.processAllAvailable()
        # stragglers (both above the 2h watermark): u1 bridges, u2 splits
        drop("b2.parquet", [("u1", base - pd.Timedelta(minutes=10)),
                            ("u2", base - pd.Timedelta(minutes=90))])
        q.processAllAvailable()
        drop("b3.parquet", [("zz", base + pd.Timedelta(days=7))])
        q.processAllAvailable()
        got = sorted(
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"])
            for r in spark.sql("select * from sess3").collect()
            if r["user_id"] != "zz")
        assert got == [
            ("u1", base - pd.Timedelta(minutes=10),
             base + pd.Timedelta(minutes=10), 3),
            ("u2", base - pd.Timedelta(minutes=90),
             base - pd.Timedelta(minutes=90), 1),
            ("u2", base, base, 1),
        ]
    finally:
        q.stop()
