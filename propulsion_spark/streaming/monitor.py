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


#: the five Busy states (ref: Streams.fs:491 ``type State = Running |
#: Slow | Failing | Stuck | Waiting``)
RUNNING = "running"
SLOW = "slow"
FAILING = "failing"
STUCK = "stuck"
WAITING = "waiting"


@dataclass
class BusyMonitor:
    """Tracks attempt age/count per stream from sink outcomes.

    Health states (ref: Streams.fs:438-532): *stuck* = never succeeded
    and failing for ≥ threshold; *failing* = succeeded before, now
    failing for ≥ threshold; *slow* = running longer than
    slow_threshold.

    :meth:`classify_stream` mirrors ``Busy.Monitor.Classify``'s five
    states in micro-batch terms: *failing* = repeated handler
    exceptions; *stuck* = handler succeeding without advancing the
    position; *slow*/*running* = dispatched last batch, by handler
    latency; *waiting* = known to have buffered-but-undispatchable
    events (gap below head / capacity), or not currently dispatched —
    the state the reference assigns to streams queued for capacity.
    """

    slow_threshold_s: float = 30.0

    _state: dict[str, _Attempt] = field(default_factory=dict)
    _succeeded: set = field(default_factory=set)
    _no_progress: dict[str, int] = field(default_factory=dict)
    _waiting: set = field(default_factory=set)
    _last_latency_ms: dict[str, float] = field(default_factory=dict)

    def record_outcomes(self, outcome_rows) -> None:
        now = time.monotonic()
        for r in outcome_rows:
            if hasattr(r, "asDict"):  # pyspark Row → dict (key membership)
                r = r.asDict()
            name, outcome = r["stream_name"], r["outcome"]
            if outcome in ("ok", "partial_duplicate", "duplicate"):
                self._succeeded.add(name)
                self._state.pop(name, None)
                self._waiting.discard(name)
                lat = r["latency_ms"] if "latency_ms" in r else None
                if lat is not None:
                    self._last_latency_ms[name] = float(lat)
                # succeeded-without-progress = Stuck in ref terms
                # (Streams.fs:500 HandleResult succeeded && not progressed);
                # duplicates excepted — redelivery below write-pos is the
                # dedup doing its job, not a wedged handler
                prev = r["prev_pos"] if "prev_pos" in r else None
                pos = r["pos"] if "pos" in r else None
                if outcome == "ok" and prev is not None and pos == prev:
                    self._no_progress[name] = self._no_progress.get(name, 0) + 1
                else:
                    self._no_progress.pop(name, None)
            elif outcome in ("exn", "timeout", "rate_limited"):
                att = self._state.setdefault(name, _Attempt(since=now))
                att.attempts += 1
                att.succeeded_once = name in self._succeeded
            elif outcome in ("prefix_missing", "buffered"):
                # events buffered, nothing dispatchable: Waiting
                self._waiting.add(name)
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

    def classify_stream(self, name: str) -> str:
        """Busy.Monitor.Classify analog (ref: Streams.fs:502-512):
        Failing beats Stuck beats Slow/Running; an unknown or
        queued-but-undispatched stream is Waiting."""
        if name in self._state and name not in self._waiting:
            return FAILING
        if self._no_progress.get(name):
            return STUCK
        if name in self._waiting:
            return WAITING
        lat = self._last_latency_ms.get(name)
        if lat is not None:
            return SLOW if lat > self.slow_threshold_s * 1000.0 else RUNNING
        return WAITING

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
