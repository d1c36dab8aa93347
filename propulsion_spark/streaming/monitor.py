"""Monitoring, stats and health (SURVEY.md §2.5 M1-M9).

- :class:`BusyMonitor` classifies per-stream handler attempts into
  Running / Slow / Failing / Stuck (ref: src/Propulsion/Streams.fs:438-532)
  from the outcome tables the sink produces.
- :class:`HealthCheckException` + ``check_health`` abend the pipeline
  when the oldest stuck/failing stream exceeds the threshold
  (ref: Streams.fs:311-322,697-707).
- :class:`QueryMonitor` wraps Structured Streaming progress for lag
  gauges (ref M8) and deterministic test waits (``process_all`` =
  FeedMonitor.AwaitCompletion analog, ref: Feed/FeedMonitor.fs:51-183).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


class HealthCheckException(Exception):
    """ref: HealthCheckException{StuckStreams; FailingStreams}."""

    def __init__(self, stuck: list[tuple[str, float]], failing: list[tuple[str, float]]):
        self.stuck_streams = stuck
        self.failing_streams = failing
        super().__init__(
            f"unhealthy streams: stuck={[s for s, _ in stuck]} "
            f"failing={[s for s, _ in failing]}"
        )


@dataclass
class _Attempt:
    since: float
    attempts: int = 0
    succeeded_once: bool = False


@dataclass
class BusyMonitor:
    """Tracks attempt age/count per stream from sink outcomes.

    States (ref: Streams.fs:438-532): *stuck* = never succeeded and
    failing for ≥ threshold; *failing* = succeeded before, now failing
    for ≥ threshold; *slow* = running longer than slow_threshold.
    """

    slow_threshold_s: float = 30.0

    _state: dict[str, _Attempt] = field(default_factory=dict)
    _succeeded: set = field(default_factory=set)

    def record_outcomes(self, outcome_rows) -> None:
        now = time.monotonic()
        for r in outcome_rows:
            name, outcome = r["stream_name"], r["outcome"]
            if outcome in ("ok", "partial_duplicate", "duplicate"):
                self._succeeded.add(name)
                self._state.pop(name, None)
            elif outcome in ("exn", "timeout", "rate_limited", "prefix_missing"):
                att = self._state.setdefault(name, _Attempt(since=now))
                att.attempts += 1
                att.succeeded_once = name in self._succeeded

    def classify(self, abend_threshold_s: float) -> tuple[list, list]:
        now = time.monotonic()
        stuck, failing = [], []
        for name, att in self._state.items():
            age = now - att.since
            if age < abend_threshold_s:
                continue
            (failing if att.succeeded_once else stuck).append((name, age))
        return stuck, failing

    def check_health(self, abend_threshold_s: float) -> None:
        stuck, failing = self.classify(abend_threshold_s)
        if stuck or failing:
            raise HealthCheckException(stuck, failing)

    def snapshot(self) -> dict:
        now = time.monotonic()
        return {
            name: {"age_s": now - a.since, "attempts": a.attempts}
            for name, a in self._state.items()
        }


class QueryMonitor:
    """Progress/lag over a running StreamingQuery (M4/M8)."""

    def __init__(self, query):
        self.query = query

    def process_all(self, timeout_s: float = 120.0) -> None:
        """Deterministic catch-up wait (processAllAvailable with a bound)."""
        deadline = time.monotonic() + timeout_s
        self.query.processAllAvailable()
        while time.monotonic() < deadline:
            if not self.query.isActive:
                ex = self.query.exception()
                if ex:
                    raise RuntimeError(ex.desc)
                return
            progress = self.query.lastProgress
            if progress and progress.get("numInputRows", 0) == 0:
                return
            time.sleep(0.1)

    def lag(self) -> dict:
        """latestOffset − endOffset per source (M8 analog)."""
        p = self.query.lastProgress
        if not p:
            return {}
        out = {}
        for i, src in enumerate(p.get("sources", [])):
            behind = src.get("latestOffset"), src.get("endOffset")
            out[src.get("description", f"source-{i}")] = behind
        return out
