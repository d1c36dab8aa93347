"""Sink factories — the engine's public processing surface
(SURVEY.md §2.2 P17; ref: src/Propulsion/Sinks.fs:38-127).

``StreamsSink.start_concurrent(handle)`` is the analog of
``Factory.StartConcurrent``: per-stream ordered dispatch of event
spans to a user handler, with write-position dedup, slicing,
outcome classification and stats. Spark plays the scheduler
(ref Ingester/Submitter/Scheduler/Dispatcher are *not* re-implemented
— SURVEY §7 design stance):

- admission/read-ahead   → maxOffsetsPerTrigger / maxFilesPerTrigger
- per-partition fairness → task scheduling
- busy-lock (≤1 handler per stream) → one task owns a key group per
  micro-batch (``groupBy(stream).applyInPandas``)
- batch completion       → micro-batch commit

The handler is the UDF (ref: src/Propulsion/Sinks.fs:73-87):
``handle(stream_name: str, events: pd.DataFrame) -> (outcome, next_pos)``
running as an Arrow-batched grouped-map function on executors.

Dedup/progress is durable in :class:`PositionsTable`; only the head
*contiguous* span from the write position is dispatched per batch
(gapped suffixes wait for redelivery — at-least-once, same contract as
the reference with ``requireAll``; the stateful kernel in
``state_kernel.py`` is the gap-buffering variant).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from propulsion_spark.streaming.positions import PositionsTable


class OutcomeKind:
    """ref: OutcomeKind classification, src/Propulsion/Streams.fs:295-306."""

    OK = "ok"
    DUPLICATE = "duplicate"  # everything below write-pos (ref: CosmosStoreSink.fs:40-120)
    PARTIAL_DUPLICATE = "partial_duplicate"
    PREFIX_MISSING = "prefix_missing"  # head span starts above write-pos
    TIMEOUT = "timeout"
    RATE_LIMITED = "rate_limited"
    EXN = "exn"
    MALFORMED = "malformed"  # poison stream (ref: Streams.fs:166, write = -3)


class MalformedStreamError(Exception):
    """Raise from a handler to quarantine the stream."""


@dataclass
class HandlerResult:
    outcome: str
    next_pos: Optional[int] = None
    info: str = ""


OUTCOME_SCHEMA = T.StructType(
    [
        T.StructField("stream_name", T.StringType(), False),
        T.StructField("prev_pos", T.LongType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("revision", T.LongType(), False),
        T.StructField("malformed", T.BooleanType(), False),
        T.StructField("outcome", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_deduped", T.LongType(), False),
        T.StructField("info", T.StringType(), True),
        T.StructField("latency_ms", T.DoubleType(), False),
    ]
)

Handler = Callable[[str, pd.DataFrame], "tuple[str, int] | HandlerResult"]


def _classify_exception(ex: Exception) -> str:
    name = type(ex).__name__.lower()
    if isinstance(ex, MalformedStreamError):
        return OutcomeKind.MALFORMED
    if "timeout" in name:
        return OutcomeKind.TIMEOUT
    if "ratelimit" in name or "throttl" in name:
        return OutcomeKind.RATE_LIMITED
    return OutcomeKind.EXN


def _make_grouped_handler(
    handle: Handler, max_events: int, max_bytes: int, require_all: bool
):
    """Build the executor-side per-stream function. Pure closure over
    picklable config; uses the same span semantics as the pure kernel."""

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.monotonic()
        stream = pdf["stream_name"].iloc[0]
        write_pos = int(pdf["_pos"].iloc[0]) if pd.notna(pdf["_pos"].iloc[0]) else 0
        total = len(pdf)
        pdf = pdf.sort_values("idx").drop_duplicates("idx", keep="first")
        live = pdf[pdf["idx"] >= write_pos]
        n_dedup = total - len(live)

        def out(outcome, pos, n, info="", revision=0, malformed=False, prev=None):
            return pd.DataFrame(
                [
                    {
                        "stream_name": stream,
                        "prev_pos": int(write_pos if prev is None else prev),
                        "pos": int(pos),
                        "revision": int(revision),
                        "malformed": bool(malformed),
                        "outcome": outcome,
                        "n_events": int(n),
                        "n_deduped": int(n_dedup),
                        "info": info,
                        "latency_ms": (time.monotonic() - t0) * 1000.0,
                    }
                ]
            )

        if live.empty:
            return out(OutcomeKind.DUPLICATE, write_pos, 0)
        # Dispatch every buffered span in order (the scheduler drains all
        # dispatchable spans across cycles, ref: Streams.fs:862-871);
        # with require_all a gap below the head blocks (ref: :370-373).
        rows = []
        pos = write_pos
        while not live.empty:
            head_start = int(live["idx"].iloc[0])
            if head_start > pos and require_all:
                rows.append(
                    out(
                        OutcomeKind.PREFIX_MISSING,
                        pos,
                        0,
                        info=f"gap {pos}..{head_start}",
                    )
                )
                break
            # head contiguous span from head_start
            idx = live["idx"].to_numpy()
            run_len = 1
            while run_len < len(idx) and idx[run_len] == idx[run_len - 1] + 1:
                run_len += 1
            span = live.iloc[:run_len]
            # slice to max_events / max_bytes, ≥1 event (ref: Streams.fs:89-107)
            if len(span) > max_events:
                span = span.iloc[:max_events]
            if "size" in span.columns and max_bytes > 0:
                csum = span["size"].fillna(0).cumsum()
                keep = max(1, int((csum <= max_bytes).sum()))
                span = span.iloc[:keep]
            try:
                res = handle(stream, span)
            except Exception as ex:  # noqa: BLE001 — outcome classification
                kind = _classify_exception(ex)
                malformed = kind == OutcomeKind.MALFORMED
                rows.append(
                    out(kind, pos, 0, info=repr(ex)[:500], malformed=malformed)
                )
                break
            if isinstance(res, HandlerResult):
                outcome, next_pos, info = res.outcome, res.next_pos, res.info
            else:
                outcome, next_pos = res
                info = ""
            if next_pos is None:
                next_pos = int(span["idx"].iloc[-1]) + 1
            if next_pos < pos:
                outcome = OutcomeKind.DUPLICATE
                next_pos = pos
            elif n_dedup > 0 and outcome == OutcomeKind.OK and not rows:
                outcome = OutcomeKind.PARTIAL_DUPLICATE
            rows.append(out(outcome, next_pos, len(span), info=info, prev=pos))
            if int(next_pos) <= pos:
                break  # no forward progress — remainder retries next batch
            pos = int(next_pos)
            live = live[live["idx"] >= pos]
        return pd.concat(rows, ignore_index=True)

    return process


class _SpoolRotation:
    """Per-call outcome-spool directories with bounded retention.

    One spool dir per ``next()`` call — REQUIRED for correctness, not
    hygiene: concurrent tranche pumps share one sink and call
    process_batch from several threads, and two overwrite-writes into a
    shared dir race (one commit deletes the other's ``_temporary`` task
    files mid-write). A rotation also keeps the PREVIOUS batch's
    returned outcome table readable while the next batch runs.

    Retention is COMPLETION-ordered, not creation-ordered: an in-flight
    batch's spool is never deleted however many faster batches overlap
    it (creation-order pruning would rmtree a slow tranche's spool out
    from under its own write). ``done()`` moves a spool to the retained
    set; only retained spools beyond ``keep`` are deleted. ``next()``
    refreshes retained spools' mtimes so an operator-run
    ``manifest.vacuum`` (which knows nothing of live sinks) never
    age-collects an active sink's retention window; spools of DEAD
    sinks stop being refreshed and age out through that same vacuum."""

    def __init__(self, base_dir: str, keep: int = 4):
        import collections
        import os
        import threading
        import uuid

        self._base = os.path.join(base_dir, f"_SPOOL-{uuid.uuid4().hex[:12]}")
        self._keep = keep
        self._inflight: "set[str]" = set()
        self._done: "collections.deque[str]" = collections.deque()
        self._lock = threading.Lock()

    def next(self) -> str:
        import os
        import uuid

        path = f"{self._base}-{uuid.uuid4().hex[:8]}"
        with self._lock:
            self._inflight.add(path)
            retained = list(self._done)
        for p in retained:  # keep live retention out of vacuum's age window
            try:
                os.utime(p, None)
            except OSError:
                pass
        return path

    def depth(self) -> dict:
        """Gauge snapshot: spools being written right now vs completed
        spools held for returned-table reads (exported as
        ``propulsion_spool_*`` by MetricsExporter)."""
        with self._lock:
            return {"inflight": len(self._inflight), "retained": len(self._done)}

    def done(self, path: str) -> None:
        """The batch that owns ``path`` has finished writing AND reading
        it (the returned DataFrame may still read it — the newest
        ``keep`` completed spools stay on disk for exactly that)."""
        import shutil

        drop = None
        with self._lock:
            self._inflight.discard(path)
            self._done.append(path)
            if len(self._done) > self._keep:
                drop = self._done.popleft()
        if drop is not None:
            shutil.rmtree(drop, ignore_errors=True)


@dataclass
class SinkStats:
    """Outcome/latency accumulation (ref: Scheduling.Stats,
    src/Propulsion/Streams.fs:606-707). Updated driver-side from the
    (small) per-batch outcome aggregates."""

    outcomes: dict[str, int] = field(default_factory=dict)
    events: int = 0
    deduped: int = 0
    batches: int = 0
    failing_streams: dict[str, int] = field(default_factory=dict)
    latency_ms: dict[str, dict] = field(default_factory=dict)

    def __post_init__(self) -> None:
        import threading

        # concurrent tranche pumps share one sink's stats
        self._lock = threading.Lock()

    def record(self, agg_rows: list) -> None:
        with self._lock:
            self.batches += 1
            for r in agg_rows:
                self.outcomes[r["outcome"]] = (
                    self.outcomes.get(r["outcome"], 0) + r["n"]
                )
                self.events += r["n_events"]
                self.deduped += r["n_deduped"]
                if r.get("max_latency_ms") is not None:
                    lat = self.latency_ms.setdefault(
                        r["outcome"], {"max": 0.0, "sum": 0.0, "n": 0}
                    )
                    lat["max"] = max(lat["max"], r["max_latency_ms"])
                    lat["sum"] += r["sum_latency_ms"]
                    lat["n"] += r["n"]

    def record_failures(self, streams: list[str]) -> None:
        with self._lock:
            for s in streams:
                self.failing_streams[s] = self.failing_streams.get(s, 0) + 1
            for s in list(self.failing_streams):
                if s not in streams:
                    del self.failing_streams[s]

    def as_dict(self) -> dict:
        return {
            "batches": self.batches,
            "events": self.events,
            "deduped": self.deduped,
            "outcomes": dict(self.outcomes),
            "failing": dict(self.failing_streams),
            "latency_ms": {
                k: {"avg": v["sum"] / max(v["n"], 1), "max": v["max"]}
                for k, v in self.latency_ms.items()
            },
        }


def _make_partition_handler(
    handle: Handler, max_events: int, max_bytes: int, require_all: bool
):
    """mapInPandas variant of the grouped handler: processes many streams
    per Arrow batch (amortizing the per-group flush that dominates
    applyInPandas when streams are small), carrying a possibly-split
    tail group across batch boundaries. Requires input partitioned by
    stream and sorted by (stream, idx) — which also preserves the ≤1
    concurrent handler per stream guarantee (a stream lives in exactly
    one partition)."""
    grouped = _make_grouped_handler(handle, max_events, max_bytes, require_all)

    def by_weight(body: "pd.DataFrame"):
        """Dispatch heaviest streams first within the Arrow batch — the
        StreamsPrioritizer.prioritizeHead approximation (ref:
        Streams.fs:754-788 sorts the head batch's streams by
        -getStreamWeight): under a handler failure or batch cutoff the
        biggest buffered spans get worked soonest."""
        groups = [grp for _, grp in body.groupby("stream_name", sort=False)]
        if "size" in body.columns:
            groups.sort(key=lambda g: -int(g["size"].fillna(0).sum()))
        return groups

    def process(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            last = pdf["stream_name"].iloc[-1]
            tail_mask = pdf["stream_name"] == last
            carry = pdf[tail_mask]
            body = pdf[~tail_mask]
            for grp in by_weight(body):
                yield grouped(grp)
        if carry is not None and not carry.empty:
            for grp in by_weight(carry):
                yield grouped(grp)

    return process


class StreamsSink:
    """Per-stream ordered sink (Factory.StartConcurrent analog).

    ``fast_path`` switches the dispatch from ``applyInPandas`` (one
    Arrow exchange per stream) to repartition+sortWithinPartitions+
    ``mapInPandas`` (many streams per Arrow batch) — same semantics,
    much less per-group overhead when streams are fine-grained.
    """

    def __init__(
        self,
        spark: SparkSession,
        handle: Handler,
        positions: PositionsTable,
        max_events: int = 16384,
        max_bytes: int = 1024 * 1024 - 4096,  # ref defaults: Sync.fs:54
        require_all: bool = False,
        fast_path: bool = False,
    ):
        from propulsion_spark import ensure_shipped

        ensure_shipped(spark)
        self.spark = spark
        self.handle = handle
        self.positions = positions
        self.max_events = max_events
        self.max_bytes = max_bytes
        self.require_all = require_all
        self.fast_path = fast_path
        self.stats = SinkStats()
        self._spool = _SpoolRotation(positions.path)

    @classmethod
    def start_concurrent(
        cls,
        spark: SparkSession,
        handle: Handler,
        positions_path: str,
        **kw,
    ) -> "StreamsSink":
        return cls(spark, handle, PositionsTable(spark, positions_path), **kw)

    @classmethod
    def start_concurrent_chunked(
        cls,
        spark: SparkSession,
        handle: Handler,
        positions_path: str,
        max_events: int = 16384,
        max_bytes: int = 1024 * 1024 - 4096,
        **kw,
    ) -> "StreamsSink":
        """Sync.Factory analog (ref: src/Propulsion/Sync.fs:44-76):
        spans pre-sliced to store-friendly chunks."""
        return cls(
            spark,
            handle,
            PositionsTable(spark, positions_path),
            max_events=max_events,
            max_bytes=max_bytes,
            **kw,
        )

    # -- one micro-batch ---------------------------------------------------
    def process_batch(self, df: DataFrame, batch_id: int = 0) -> DataFrame:
        """Dispatch one micro-batch of envelope rows; returns the outcome
        table (one row per touched stream) after persisting progress."""
        # No broadcast hint: the positions table grows with total stream
        # count (unbounded at 100 TB) — AQE broadcasts it while small and
        # shuffle-joins on stream_name (the partitioning the grouped
        # dispatch needs anyway) once it isn't.
        pos = self.positions.read().select(
            "stream_name", F.col("pos").alias("_pos"), F.col("malformed").alias("_mal")
        )
        work = (
            df.join(pos, "stream_name", "left")
            .filter(~F.coalesce(F.col("_mal"), F.lit(False)))
        )
        if self.fast_path:
            n_parts = max(int(self.spark.conf.get("spark.sql.shuffle.partitions")), 1)
            grouped = (
                work.repartition(n_parts, "stream_name")
                .sortWithinPartitions("stream_name", "idx")
                .mapInPandas(
                    _make_partition_handler(
                        self.handle, self.max_events, self.max_bytes, self.require_all
                    ),
                    OUTCOME_SCHEMA,
                )
            )
        else:
            grouped = work.groupBy("stream_name").applyInPandas(
                _make_grouped_handler(
                    self.handle, self.max_events, self.max_bytes, self.require_all
                ),
                OUTCOME_SCHEMA,
            )
        # The outcome table stays DISTRIBUTED end-to-end: the handler
        # stage materializes exactly once into a per-sink parquet spool
        # (a bounded O(streams-per-batch) write, overwritten each batch),
        # and progress, stats, health, and the returned table all read
        # from the spool. Why a spool write and not cache/collect:
        # - the WRITE is the materializing action, so the handler stage
        #   keeps full shuffle-partition parallelism (a collect query
        #   lets AQE coalesce by shuffle BYTES — tiny here — serializing
        #   the per-stream Python handlers);
        # - a catch-up batch touching millions of streams never
        #   serializes one row per stream onto the driver — positions
        #   .merge() receives the outcome DataFrame directly;
        # - the returned table re-reads the spool, never a retired
        #   positions snapshot, and never re-invokes handlers;
        # - driver-side collects are CAPPED: stats aggregate to one row
        #   per outcome kind, failing-stream health to ≤10k rows.
        # The spool write goes through a short-lived cache: the handler
        # stage's cost is per-GROUP Python work, which AQE's bytes-based
        # partition coalescing cannot see — writing the raw plan lets
        # AQE fold the (tiny) shuffle to 1-3 tasks and SERIALIZE
        # thousands of per-stream handlers (measured 32 tasks → 3,
        # 1.9 s → 4.9 s at sf0.1). A cached plan keeps its partitioning
        # (canChangeCachedPlanOutputPartitioning default), so the write
        # materializes at full parallelism; the cache is dropped as soon
        # as the spool is durable, and everything downstream reads the
        # spool. Cache size is bounded: one outcome row per stream.
        spool = self._spool.next()
        try:
            outcomes_src = grouped.cache()
            try:
                outcomes_src.write.mode("overwrite").parquet(spool)
            finally:
                outcomes_src.unpersist()
            outcomes = self.spark.read.schema(OUTCOME_SCHEMA).parquet(spool)
            # ONE bounded control-plane job (a row per outcome kind)
            # carries stats AND the progressed-count probe, so the
            # happy/redelivery paths cost exactly two jobs: the spool
            # write + this aggregate. The positions merge and
            # failing-stream scan only run when the counts say there is
            # something to merge/record.
            agg_rows = (
                outcomes.groupBy("outcome")
                .agg(
                    F.count("*").alias("n"),
                    F.sum("n_events").alias("n_events"),
                    F.sum("n_deduped").alias("n_deduped"),
                    F.max("latency_ms").alias("max_latency_ms"),
                    F.sum("latency_ms").alias("sum_latency_ms"),
                    F.sum(
                        ((F.col("pos") > F.col("prev_pos")) | F.col("malformed")).cast(
                            "long"
                        )
                    ).alias("n_progressed"),
                )
                .collect()  # bounded: one row per outcome kind
            )
            if sum(r.n_progressed for r in agg_rows):
                self.positions.merge(
                    outcomes.filter(
                        (F.col("pos") > F.col("prev_pos")) | F.col("malformed")
                    ).select("stream_name", "pos", "revision", "malformed"),
                    assume_nonempty=True,
                )
            if agg_rows:
                self.stats.record([r.asDict() for r in agg_rows])
            _FAILING = (OutcomeKind.EXN, OutcomeKind.TIMEOUT, OutcomeKind.RATE_LIMITED)
            # the failing-stream scan job only runs when the counts show
            # failures, but record_failures is called on every batch that
            # TOUCHED streams — its not-seen-this-batch deletion is what
            # clears recovered streams from the health gauge. Zero-touch
            # batches (idle tail polls) skip the call entirely: an empty
            # poll says nothing about a failing stream's recovery, so it
            # must not drop persistently-failing streams out of health
            # tracking.
            if agg_rows:
                failing: list = []
                if any(r.outcome in _FAILING for r in agg_rows):
                    # driver-side health bookkeeping stays bounded (explicit cap)
                    failing = [
                        r.stream_name
                        for r in outcomes.filter(F.col("outcome").isin(*_FAILING))
                        .select("stream_name")
                        .limit(10_000)
                        .collect()
                    ]
                self.stats.record_failures(failing)
        finally:
            self._spool.done(spool)
        return outcomes

    # -- streaming lifecycle -------------------------------------------------
    def run_stream(self, stream_df: DataFrame, checkpoint_location: str, **trigger):
        """Attach to a streaming DataFrame: every micro-batch flows through
        process_batch; Spark's commit log is the batch-completion record
        (ref ProgressRequirement semantics are built-in)."""
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid) and None
            )
            .option("checkpointLocation", checkpoint_location)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class DeclarativeSink:
    """Whole-stage-codegen sink for fold-shaped handlers.

    Most projection handlers reduce a span to an outcome row (counts,
    sums, last-values). When the fold is expressible as Spark aggregate
    expressions there is no reason to pay the Arrow/Python hop of the
    grouped-map handler: this sink runs write-pos dedup + the fold +
    progress entirely JVM-side — the Spark-first fast path
    (ref semantics identical to StreamsSink with an OK handler).

    ``aggs``: dict of output column → aggregate Column over the deduped
    span rows of one stream.

    Per-batch cost anatomy (the r1→r2 bench delta chased in VERDICT r2
    #6): the fold itself is one shuffle; on top of it a batch pays (a)
    the outcome-spool write (the single materialization), (b) one
    bounded stats aggregate, and (c) the durable positions delta write
    — (c) is what r2 added over r1 (r1 rewrote no positions log) and is
    the price of O(batch) append-then-compact progress; it is one
    distributed O(streams-touched) parquet write, invariant in table
    size. A/B timing of the spool mechanics vs the collect mechanics
    they replaced shows parity within host noise.
    """

    def __init__(
        self,
        spark: SparkSession,
        aggs: "dict[str, object]",
        positions: PositionsTable,
        outcome_table_path: str | None = None,
    ):
        self.spark = spark
        self.aggs = aggs
        self.positions = positions
        self.outcome_table_path = outcome_table_path
        self.stats = SinkStats()
        self._spool = _SpoolRotation(positions.path)

    @classmethod
    def start(cls, spark: SparkSession, aggs, positions_path: str, **kw):
        return cls(spark, aggs, PositionsTable(spark, positions_path), **kw)

    def process_batch(self, df: DataFrame, batch_id: int = 0) -> DataFrame:
        pos = self.positions.read().select(
            "stream_name", F.col("pos").alias("_pos"), F.col("malformed").alias("_mal")
        )
        # redelivery overlap *within* one micro-batch: duplicate
        # (stream, idx) rows must not double-count in the fold
        # (semantics identical to StreamsSink). Dedup via a lag window
        # over stream_name — not dropDuplicates([stream, idx]), whose
        # (stream, idx) hash partitioning the downstream
        # groupBy(stream_name) can't reuse — so the fold rides the
        # window's exchange and the batch shuffles once, not twice
        # (the event_store append-path rule, applied to the
        # declarative fast path).
        dw = Window.partitionBy("stream_name").orderBy("idx")
        live = (
            df.join(pos, "stream_name", "left")
            .filter(~F.coalesce(F.col("_mal"), F.lit(False)))
            .filter(F.col("idx") >= F.coalesce(F.col("_pos"), F.lit(0)))
            .withColumn("_dup", F.lag("idx").over(dw) == F.col("idx"))
            .filter(~F.coalesce(F.col("_dup"), F.lit(False)))
            .drop("_dup")
        )
        outcomes = live.groupBy("stream_name").agg(
            *[c.alias(name) for name, c in self.aggs.items()],
            (F.max("idx") + 1).alias("pos"),
            F.coalesce(F.first("_pos"), F.lit(0)).alias("prev_pos"),
            F.count("*").alias("n_events"),
        )
        # see StreamsSink.process_batch: the outcome table stays
        # distributed — ONE materializing spool write, then progress /
        # the outcome-table append / the returned table all read the
        # spool (never a retired positions snapshot), and the only
        # driver collect is a single aggregate row. A catch-up batch
        # touching millions of streams never lands row-per-stream on
        # the driver.
        schema = outcomes.schema
        spool = self._spool.next()
        try:
            outcomes.write.mode("overwrite").parquet(spool)
            result = self.spark.read.schema(schema).parquet(spool)
            tot = result.agg(
                F.count("*").alias("n"), F.sum("n_events").alias("n_events")
            ).first()  # bounded control-plane job: one aggregate row
            if tot.n:
                self.positions.merge(
                    result.select(
                        "stream_name",
                        "pos",
                        F.lit(0).cast("long").alias("revision"),
                        F.lit(False).alias("malformed"),
                    ),
                    assume_nonempty=True,
                )
                if self.outcome_table_path:
                    result.write.mode("append").parquet(self.outcome_table_path)
                self.stats.record(
                    [
                        {
                            "outcome": OutcomeKind.OK,
                            "n": tot.n,
                            "n_events": tot.n_events or 0,
                            "n_deduped": 0,
                        }
                    ]
                )
        finally:
            self._spool.done(spool)
        return result

    def run_stream(self, stream_df: DataFrame, checkpoint_location: str, **trigger):
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid) and None
            )
            .option("checkpointLocation", checkpoint_location)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class ParallelSink:
    """Unordered item-level processing — no stream grouping or ordering
    (ref: Parallel.PartitionedSchedulingEngine,
    src/Propulsion/Parallel.fs:80-178). The handler is a per-item-batch
    pandas function run via mapInPandas: partition-parallel, faults
    abend the batch. Use when per-stream ordering doesn't matter."""

    def __init__(
        self, spark: SparkSession, handle_items, output_schema, spool_dir=None
    ):
        import tempfile

        from propulsion_spark import ensure_shipped

        ensure_shipped(spark)
        self.spark = spark
        self.handle_items = handle_items
        self.output_schema = output_schema
        self.batches = 0
        self._spool = _SpoolRotation(spool_dir or tempfile.mkdtemp())

    def process_batch(self, df: DataFrame, batch_id: int = 0) -> DataFrame:
        handle = self.handle_items

        def run(batches):
            for pdf in batches:
                yield handle(pdf)

        # Spool the handler outputs to parquet — the same durability
        # pattern as StreamsSink. The write is the single action that
        # runs the handler stage (faults propagate → abend); the
        # returned table reads the spool, so a caller acting on it never
        # re-invokes the (side-effecting, at-least-once) handlers AND
        # survives executor loss — unlike localCheckpoint, whose
        # lineage-truncated blocks die with the executor that held them.
        spool = self._spool.next()
        try:
            df.mapInPandas(run, self.output_schema).write.mode(
                "overwrite"
            ).parquet(spool)
            out = self.spark.read.schema(self.output_schema).parquet(spool)
        finally:
            self._spool.done(spool)
        self.batches += 1
        return out

    def run_stream(self, stream_df: DataFrame, checkpoint_location: str, **trigger):
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid) and None
            )
            .option("checkpointLocation", checkpoint_location)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class BatchedSink:
    """Whole-batch dispatch (Factory.StartBatched analog,
    ref: src/Propulsion/Streams.fs:1071-1104): ``select`` narrows the
    micro-batch, one ``handle`` call processes it as a DataFrame —
    dop=1 by construction, used for control-plane style sinks."""

    def __init__(
        self,
        spark: SparkSession,
        select: Callable[[DataFrame], DataFrame],
        handle: Callable[[DataFrame], None],
    ):
        self.spark = spark
        self.select = select
        self.handle = handle
        self.batches = 0

    def process_batch(self, df: DataFrame, batch_id: int = 0) -> None:
        self.handle(self.select(df))
        self.batches += 1

    def run_stream(self, stream_df: DataFrame, checkpoint_location: str, **trigger):
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_location)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )
