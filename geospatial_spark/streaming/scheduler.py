"""Scheduled index refresh with expiry-aware rescheduling and retry.

Reference analogue: the job-scheduler runner that re-triggers a
datasource update, swaps between the user-configured schedule and a
tighter system schedule as the data nears expiry, and reschedules
after every run with failure retry
(ip2geo/jobscheduler/DatasourceRunner.java:87-188,
DatasourceUpdateService.java:282-292; per-run success/failure history
is the Datasource.java:105-173 update-stats block, which the engine
persists as the manifest's build_history).

Spark mapping: each tick calls a caller-supplied refresh callable
(typically plans.build.build_index or compact_index over the current
source snapshot). Time and sleep are injected so policy behavior is
unit-testable without wall-clock sleeps; the loop itself is plain
driver-side Python — a cluster deployment runs it in the driver
process or an external scheduler with identical semantics, because
every build is independently locked, checkpointed, and atomic.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RefreshPolicy:
    """User schedule + expiry behavior + failure retry.

    interval_seconds     — the user schedule (normal cadence).
    expire_after_seconds — data older than this must not serve (the
                           reference's datasource expiry); None = never.
    urgent_fraction      — once remaining validity < urgent_fraction ×
                           interval, the SYSTEM schedule takes over:
                           refresh at half the remaining validity
                           (DatasourceRunner's system-vs-user swap).
    retry_backoff        — successive delays after failures; the last
                           entry repeats (bounded retry, never give up:
                           the prior generation keeps serving).
    min_delay_seconds    — floor under any computed delay.
    """

    interval_seconds: float
    expire_after_seconds: float | None = None
    urgent_fraction: float = 0.5
    retry_backoff: tuple[float, ...] = (5.0, 30.0, 120.0)
    min_delay_seconds: float = 1.0

    def next_delay(self, *, now: float, last_built_at: float,
                   consecutive_failures: int) -> float:
        if consecutive_failures > 0:
            i = min(consecutive_failures, len(self.retry_backoff)) - 1
            return max(self.min_delay_seconds, self.retry_backoff[i])
        delay = self.interval_seconds
        if self.expire_after_seconds is not None:
            remaining = (last_built_at + self.expire_after_seconds) - now
            if remaining < self.urgent_fraction * self.interval_seconds:
                # system schedule: land the next build well before expiry
                delay = max(self.min_delay_seconds, remaining / 2.0)
        return max(self.min_delay_seconds, min(delay, self.interval_seconds))


@dataclass
class RefreshRun:
    started_at: float
    finished_at: float
    ok: bool
    error: str | None
    next_delay: float


@dataclass
class RefreshLoop:
    """Drive refresh_fn on the policy's schedule.

    refresh_fn() performs one full refresh (build + swap) and may raise;
    a raise counts as a failed run and triggers the retry schedule. The
    loop stops after max_runs ticks (None = run forever).
    """

    refresh_fn: Callable[[], object]
    policy: RefreshPolicy
    clock: Callable[[], float] = time.monotonic
    sleep: Callable[[float], None] = time.sleep
    history: list[RefreshRun] = field(default_factory=list)
    consecutive_failures: int = 0
    last_built_at: float | None = None

    def tick(self) -> RefreshRun:
        """One scheduled run: refresh, record, compute the next delay."""
        started = self.clock()
        err = None
        try:
            self.refresh_fn()
            ok = True
        except Exception as exc:  # failure: prior generation keeps serving
            ok = False
            err = repr(exc)
        finished = self.clock()
        if ok:
            self.consecutive_failures = 0
            self.last_built_at = finished
        else:
            self.consecutive_failures += 1
        delay = self.policy.next_delay(
            now=finished,
            last_built_at=self.last_built_at if self.last_built_at is not None else finished,
            consecutive_failures=self.consecutive_failures,
        )
        run = RefreshRun(started, finished, ok, err, delay)
        self.history.append(run)
        return run

    def run(self, max_runs: int | None = None) -> list[RefreshRun]:
        n = 0
        while max_runs is None or n < max_runs:
            run = self.tick()
            n += 1
            if max_runs is not None and n >= max_runs:
                break
            self.sleep(run.next_delay)
        return self.history
