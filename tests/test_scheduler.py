"""Refresh-scheduler policy gates (DatasourceRunner.java:87-188
analogue): user-vs-system schedule swap near expiry, bounded failure
backoff, recovery, and an end-to-end loop over a real index root."""

from __future__ import annotations

from geospatial_spark.streaming.scheduler import (
    RefreshLoop,
    RefreshPolicy,
    RefreshRun,
)


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += s


def test_normal_cadence_is_user_interval():
    p = RefreshPolicy(interval_seconds=600.0)
    assert p.next_delay(now=0.0, last_built_at=0.0,
                        consecutive_failures=0) == 600.0


def test_expiry_swaps_to_system_schedule():
    p = RefreshPolicy(interval_seconds=600.0, expire_after_seconds=1000.0)
    # fresh build: plenty of validity left → user schedule
    assert p.next_delay(now=0.0, last_built_at=0.0,
                        consecutive_failures=0) == 600.0
    # 800s into a 1000s validity: remaining 200 < 0.5·600 → system
    # schedule lands the next run at remaining/2
    assert p.next_delay(now=800.0, last_built_at=0.0,
                        consecutive_failures=0) == 100.0
    # almost expired: floors at min_delay
    assert p.next_delay(now=999.5, last_built_at=0.0,
                        consecutive_failures=0) == p.min_delay_seconds


def test_failure_backoff_is_bounded_and_recovers():
    p = RefreshPolicy(interval_seconds=600.0, retry_backoff=(5.0, 30.0, 120.0))
    delays = [p.next_delay(now=0.0, last_built_at=0.0, consecutive_failures=f)
              for f in (1, 2, 3, 4, 9)]
    assert delays == [5.0, 30.0, 120.0, 120.0, 120.0]  # last entry repeats
    assert p.next_delay(now=0.0, last_built_at=0.0,
                        consecutive_failures=0) == 600.0


def test_loop_records_history_and_retries():
    clock = FakeClock()
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] in (2, 3):
            raise RuntimeError("transient source outage")

    loop = RefreshLoop(flaky, RefreshPolicy(interval_seconds=100.0,
                                            retry_backoff=(7.0, 13.0)),
                       clock=clock, sleep=clock.sleep)
    hist = loop.run(max_runs=5)
    assert [h.ok for h in hist] == [True, False, False, True, True]
    assert [h.next_delay for h in hist] == [100.0, 7.0, 13.0, 100.0, 100.0]
    assert hist[1].error and "transient" in hist[1].error
    assert loop.consecutive_failures == 0
    assert all(isinstance(h, RefreshRun) for h in hist)


def test_loop_refreshes_real_index(spark, tiny_transcripts, tmp_path_factory):
    """End-to-end: each tick appends a delta generation; a mid-loop
    failure leaves the prior manifest serving; history and the
    manifest's build_history agree on success counts."""
    from geospatial_spark.plans import lifecycle as lc
    from geospatial_spark.plans.build import build_index
    from geospatial_spark.plans.query import IndexSearcher

    root = str(tmp_path_factory.mktemp("refresh") / "idx")
    clock = FakeClock()
    tick = {"n": 0}

    def refresh():
        tick["n"] += 1
        if tick["n"] == 2:
            raise RuntimeError("source unavailable")
        build_index(spark, tiny_transcripts, root, n_shards=2,
                    generation=f"r{tick['n']:04d}",
                    append=tick["n"] > 1)

    loop = RefreshLoop(refresh, RefreshPolicy(interval_seconds=60.0),
                       clock=clock, sleep=clock.sleep)
    hist = loop.run(max_runs=3)
    assert [h.ok for h in hist] == [True, False, True]
    m = lc.read_manifest(root)
    assert m["state"] == lc.STATE_AVAILABLE
    gen_ids = {g["id"] for g in m["generations"]}
    assert gen_ids == {"r0001", "r0003"}  # failed tick added nothing
    assert len(m["build_history"]) == 2  # successes only reach the manifest
    assert IndexSearcher(spark, root).search("the", 3) is not None
