"""Feed sources — the generic paged-feed abstraction
(SURVEY.md §2.1 S7-S10; ref: src/Propulsion/Feed/FeedSource.fs:43-188).

A *feed* is a set of *tranches* (partitions), each a paged sequence of
batches with integer positions. The reference pumps one crawl loop per
tranche; here the pump is a driver loop (the micro-batch planner's
role) while every batch's processing is a distributed Spark job through
the sink. Positions commit to the consumer-group
:class:`CheckpointStore` only after the sink finished the batch —
the ProgressRequirement rule (ref: src/Propulsion/Streams.fs:709-750)
— giving at-least-once delivery with idempotent redelivery handled by
write-position dedup.

Variants (ref file:line in each class):

- :class:`FeedSource` — user supplies ``read_tranches()`` and
  ``read_page(tranche, pos)``.
- :class:`TailingFeedSource` — crawls to tail, then sleeps
  ``tail_sleep_s`` and re-polls (ref: FeedSource.fs:74-124).
- :class:`SinglePassFeedSource` — stops at tail
  (ref: SinglePassFeedSource.fs:7-20; = Trigger.AvailableNow).
- :class:`PeriodicSource` — re-crawls the whole source every refresh,
  wall-clock-encoded positions (ref: PeriodicSource.fs:13-44).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession

from propulsion_spark.streaming.checkpoints import CheckpointStore


@dataclass
class Batch:
    """One page of a tranche (ref: src/Propulsion/Feed/Feed.fs:37-44)."""

    items: DataFrame | None
    checkpoint: int
    is_tail: bool


ReadPage = Callable[[str, int], Batch]


@dataclass
class _TrancheState:
    pos: int = 0
    reached_tail: bool = False
    batches: int = 0
    last_error: Optional[str] = None


class FeedSource:
    """Generic paged feed (ref: FeedSource.fs:155-188).

    ``sink`` is anything with ``process_batch(df, batch_id)`` —
    usually a :class:`~propulsion_spark.streaming.sinks.StreamsSink`.
    """

    source_id = "feed"
    stop_at_tail = False
    tail_sleep_s = 1.0  # ref default tailSleepInterval = 1 s
    #: exception types swallow-and-retry must NOT swallow: permanent
    #: conditions (e.g. a change-feed reader lagging past retention)
    #: where retrying forever is a silent stall — these abend the
    #: pipeline so the operator sees the mandatory recovery instead
    fatal_errors: "tuple[type, ...]" = ()

    def __init__(
        self,
        spark: SparkSession,
        read_tranches: Callable[[], Iterable[str]],
        read_page: ReadPage,
        sink,
        checkpoints: CheckpointStore,
        source_id: str = "feed",
        establish_origin: Callable[[str], int] | int | None = None,
    ):
        self.spark = spark
        self.read_tranches = read_tranches
        self.read_page = read_page
        self.sink = sink
        self.checkpoints = checkpoints
        self.source_id = source_id
        self.establish_origin = establish_origin
        self.tranches: dict[str, _TrancheState] = {}
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._exceptions: list[BaseException] = []
        self._batch_seq = 0

    # ---- crawl loop per tranche (ref: FeedSource.fs:43-64) -------------
    def _pump_tranche(self, tranche: str) -> None:
        st = self.tranches[tranche]
        origin = self.establish_origin
        if callable(origin):
            origin = origin(tranche)
        st.pos = self.checkpoints.start(self.source_id, tranche, origin or 0)
        while not self._stop.is_set():
            try:
                batch = self.read_page(tranche, st.pos)
            except Exception as ex:  # noqa: BLE001 — swallow-and-retry (ref :56-60)
                if isinstance(ex, self.fatal_errors):
                    raise  # permanent: abend via _run_safe, don't spin
                st.last_error = repr(ex)
                if self._stop.wait(self.tail_sleep_s):
                    return
                continue
            st.last_error = None
            if batch.items is not None:
                self._batch_seq += 1
                self.sink.process_batch(batch.items, self._batch_seq)
                st.batches += 1
            # commit only after the sink completed the batch
            self.checkpoints.commit(self.source_id, tranche, batch.checkpoint)
            st.pos = batch.checkpoint
            if batch.is_tail:
                st.reached_tail = True
                if self.stop_at_tail:
                    return
                if self._stop.wait(self.tail_sleep_s):
                    return
            else:
                st.reached_tail = False

    # ---- lifecycle (ref: Pipeline.fs:8-165) ------------------------------
    def start(self) -> "FeedSource":
        for tranche in self.read_tranches():
            self.tranches[str(tranche)] = _TrancheState()
        for tranche in self.tranches:
            t = threading.Thread(
                target=self._run_safe, args=(tranche,), daemon=True, name=f"feed-{tranche}"
            )
            t.start()
            self._threads.append(t)
        return self

    def _run_safe(self, tranche: str) -> None:
        try:
            self._pump_tranche(tranche)
        except BaseException as ex:  # noqa: BLE001 — abend propagation
            self._exceptions.append(ex)
            self._stop.set()

    def stop(self) -> None:
        self._stop.set()

    def await_completion(self, timeout: float = 60.0) -> bool:
        """Wait until every tranche reached tail (and, for stop-at-tail
        sources, the pumps exited). Mirrors FeedMonitor.AwaitCompletion
        (ref: src/Propulsion/Feed/FeedMonitor.fs:51-183)."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if self._exceptions:
                raise self._exceptions[0]
            if self.tranches and all(s.reached_tail for s in self.tranches.values()):
                if not self.stop_at_tail or all(
                    not t.is_alive() for t in self._threads
                ):
                    self.checkpoints.flush(force=True)
                    return True
            time.sleep(0.05)
        return False

    def run_until_caught_up(self, timeout: float = 120.0) -> None:
        """Bounded run (ref: FeedMonitor.runUntilCaughtUp, :186-210)."""
        self.start()
        try:
            if not self.await_completion(timeout):
                raise TimeoutError(f"feed {self.source_id} not caught up in {timeout}s")
        finally:
            self.stop()
            self.checkpoints.flush(force=True)

    @property
    def ran_to_completion(self) -> bool:
        return (
            not self._exceptions
            and bool(self.tranches)
            and all(s.reached_tail for s in self.tranches.values())
        )

    def lag(self, tail_positions: dict[str, int]) -> dict[str, int]:
        """Remaining work per tranche (ref: M8 lag estimator)."""
        return {
            tr: max(0, int(tail_positions.get(tr, 0)) - st.pos)
            for tr, st in self.tranches.items()
        }


class TailingFeedSource(FeedSource):
    """Crawl → tail-sleep → re-poll, forever (ref: FeedSource.fs:74-124)."""


class SinglePassFeedSource(FeedSource):
    """Reads every tranche to its tail, then stops
    (ref: src/Propulsion/Feed/SinglePassFeedSource.fs:7-20)."""

    stop_at_tail = True
    tail_sleep_s = 0.0


class PeriodicSource(FeedSource):
    """Re-crawls an entire non-checkpointable source every
    ``refresh_interval_s``; positions are wall-clock encoded
    (``epoch_seconds * 1e9 + offset``, ref:
    src/Propulsion/Feed/PeriodicSource.fs:13-44)."""

    def __init__(
        self,
        spark: SparkSession,
        crawl: Callable[[str], DataFrame],
        sink,
        checkpoints: CheckpointStore,
        source_id: str = "periodic",
        refresh_interval_s: float = 60.0,
        read_tranches: Callable[[], Iterable[str]] | None = None,
    ):
        self.crawl = crawl
        self.refresh_interval_s = refresh_interval_s
        super().__init__(
            spark,
            read_tranches or (lambda: ["0"]),
            self._read_page,
            sink,
            checkpoints,
            source_id=source_id,
        )
        self.tail_sleep_s = refresh_interval_s

    @staticmethod
    def encode_position(epoch_seconds: float, offset: int = 0) -> int:
        return int(epoch_seconds) * 1_000_000_000 + offset

    def _read_page(self, tranche: str, pos: int) -> Batch:
        started = time.time()
        df = self.crawl(tranche)
        return Batch(
            items=df, checkpoint=self.encode_position(started), is_tail=True
        )
