"""Stateful span buffer — per-stream state across micro-batches
(SURVEY.md §7 step 6; ref: Scheduling.StreamStates,
src/Propulsion/Streams.fs:327-431).

Where :class:`~propulsion_spark.streaming.sinks.StreamsSink` is
stateless between batches (gapped suffixes rely on redelivery), this
kernel holds ``{write_pos, revision, malformed, buffered spans}`` per
stream in Spark's state store via ``applyInPandasWithState``:
out-of-order events are buffered as gapped spans and dispatched the
moment the gap fills — the ``requireAll`` behavior with cross-batch
memory (ref: Streams.fs:370-373,828-843).

The state transition is exactly the pure kernel
(:mod:`propulsion_spark.kernel`): property-tested once, executed here
inside the Arrow grouped-map. State is bounded by ``purge`` timeouts
(ref purgeInterval, Streams.fs:904-913) → state TTL.

Scale: state lives in the executor state store (RocksDB on a cluster),
partitioned by stream key — the same shuffle the groupBy already pays.
Buffered bytes are bounded per stream by ``max_buffered_events``;
beyond it the stream is flagged malformed (poison) rather than OOMing
an executor.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from propulsion_spark.kernel.spans import Event, span_next
from propulsion_spark.kernel.state import StreamState

STATE_SCHEMA = T.StructType(
    [
        T.StructField("write_pos", T.LongType()),
        T.StructField("revision", T.LongType()),
        T.StructField("malformed", T.BooleanType()),
        T.StructField("buffer", T.StringType()),  # JSON spans incl. unfolds
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("stream_name", T.StringType()),
        T.StructField("write_pos", T.LongType()),
        T.StructField("dispatched", T.LongType()),
        T.StructField("buffered", T.LongType()),
        T.StructField("gap_start", T.LongType()),
        T.StructField("gap_end", T.LongType()),
        T.StructField("outcome", T.StringType()),
        T.StructField("revision", T.LongType()),
    ]
)

_EVENT_FIELDS = ("idx", "event_type", "data", "is_unfold", "size")


def _encode(st: StreamState) -> tuple:
    payload = {
        "spans": [[list(e[:5]) for e in s] for s in st.spans],
        "unfolds": [list(e[:5]) for e in st.unfolds],
    }
    return (st.write_pos, st.revision, st.is_malformed, json.dumps(payload))


def _decode(row: tuple) -> StreamState:
    write_pos, revision, malformed, buffer = row
    st = StreamState(write_pos=int(write_pos), revision=int(revision))
    if malformed:
        st.mark_malformed()
        return st
    payload = json.loads(buffer) if buffer else {"spans": [], "unfolds": []}
    st.spans = [tuple(Event(*e) for e in s) for s in payload["spans"]]
    st.unfolds = tuple(Event(*e) for e in payload["unfolds"])
    return st


def _make_drain(
    handle: Callable[[str, pd.DataFrame], "tuple[str, int]"],
    require_all: bool,
):
    """The dispatch loop both execution legs share: dispatch spans until
    none is dispatchable; returns (outcome of the last dispatch, total
    events dispatched)."""

    def _drain(stream: str, st: StreamState) -> "tuple[str, int]":
        outcome = "buffered"
        dispatched = 0
        while True:
            span = st.choose_dispatchable(require_all=require_all)
            if span is None:
                break
            span_pdf = pd.DataFrame(
                [dict(zip(_EVENT_FIELDS, e[:5])) for e in span]
            ).assign(stream_name=stream)
            try:
                res = handle(stream, span_pdf)
                outcome, next_pos = (
                    (res.outcome, res.next_pos) if hasattr(res, "outcome") else res
                )
                if next_pos is None:
                    next_pos = span_next(span)
                dispatched += len(span)
                st.record_progress(int(next_pos))
            except Exception as ex:  # noqa: BLE001
                outcome = f"exn:{type(ex).__name__}"
                break  # leave the span buffered; retried next batch/tick
        return outcome, dispatched

    return _drain


def _emit(stream: str, st: StreamState, outcome: str, dispatched: int):
    gap = st.gap()
    return pd.DataFrame(
        [
            {
                "stream_name": stream,
                "write_pos": st.write_pos,
                "dispatched": dispatched,
                "buffered": st.queued_events,
                "gap_start": gap[0] if gap else None,
                "gap_end": gap[1] if gap else None,
                "outcome": outcome,
                "revision": st.revision,
            }
        ]
    )


def _ingest_pdf(st: StreamState, pdf: pd.DataFrame) -> None:
    pdf = pdf.sort_values("idx")
    events = [
        Event(
            int(r.idx),
            str(r.event_type),
            r.data if isinstance(r.data, str) else "",
            bool(r.is_unfold),
            int(r.size) if pd.notna(r.size) else 0,
        )
        for r in pdf.itertuples()
    ]
    st.ingest(events)


def make_stateful_processor(
    handle: Callable[[str, pd.DataFrame], "tuple[str, int]"],
    require_all: bool = True,
    max_buffered_events: int = 100_000,
    ttl_ms: int = 0,
):
    """Build the applyInPandasWithState function: ingest → dispatch →
    persist. Dispatch loops until no span is dispatchable (the reference
    scheduler drains all dispatchable spans across cycles; a single-shot
    dispatch would strand the second buffered span of a stream that then
    goes idle, since state functions only run for keys present in the
    batch). On state-TTL timeout, residual dispatchable spans are drained
    and only *empty* streams are purged (ref purges only empty streams,
    src/Propulsion/Streams.fs:904-913 — dropping buffered spans whose
    source offsets Spark already committed would be silent event loss)."""

    _drain = _make_drain(handle, require_all)

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (stream,) = key
        if state.hasTimedOut:
            st = _decode(state.get) if state.exists else None
            if st is None:
                state.remove()
                return
            outcome, dispatched = _drain(stream, st)
            if st.is_empty:
                state.remove()
                yield _emit(stream, st, "purged", dispatched)
            else:
                # still-buffered (gapped or failing) spans must survive the
                # purge tick: re-arm and report
                state.update(_encode(st))
                state.setTimeoutDuration(ttl_ms)
                yield _emit(stream, st, outcome, dispatched)
            return
        st = _decode(state.get) if state.exists else StreamState(write_pos=0)
        for pdf in pdfs:
            _ingest_pdf(st, pdf)
        if st.queued_events > max_buffered_events:
            st.mark_malformed()
            outcome, dispatched = "malformed", 0
        else:
            outcome, dispatched = _drain(stream, st)
        state.update(_encode(st))
        if ttl_ms > 0:
            state.setTimeoutDuration(ttl_ms)
        yield _emit(stream, st, outcome, dispatched)

    return process


def make_span_buffer_processor(
    handle: Callable[[str, pd.DataFrame], "tuple[str, int]"],
    require_all: bool = True,
    max_buffered_events: int = 100_000,
    ttl_ms: int = 0,
):
    """The same span-buffer kernel as a Spark-4 ``StatefulProcessor``
    (``transformWithStateInPandas``) — the native successor API: typed
    value state instead of a single state struct, and explicit TIMERS
    instead of the per-key timeout duration. The state transition is
    the identical pure kernel; only the storage/timer plumbing differs
    — which is the point of keeping the kernel pure.

    Purge semantics match the applyInPandasWithState leg exactly: on an
    expired timer, residual dispatchable spans are drained and only
    EMPTY streams drop their state; a gapped stream re-arms its timer.
    Spark's native value-state TTL (``getValueState(ttlDurationMs=…)``)
    is deliberately NOT used for the buffer — it would silently drop
    buffered spans whose source offsets are already committed
    (ref purges only empty streams, src/Propulsion/Streams.fs:904-913).

    Returned lazily (class defined inside) so importing this module
    never requires the Spark-4 streaming-state client stack; the class
    itself is pure Python and unit-testable with a faked handle.
    """
    from pyspark.sql.streaming import StatefulProcessor

    drain = _make_drain(handle, require_all)

    class SpanBufferProcessor(StatefulProcessor):
        def init(self, phandle):
            self._state = phandle.getValueState("span_buffer", STATE_SCHEMA)
            self._phandle = phandle

        def _arm(self, timer_values):
            if ttl_ms > 0:
                self._phandle.registerTimer(
                    timer_values.getCurrentProcessingTimeInMs() + ttl_ms
                )

        def handleInputRows(self, key, rows, timer_values):
            (stream,) = key
            st = (
                _decode(tuple(self._state.get()))
                if self._state.exists()
                else StreamState(write_pos=0)
            )
            for pdf in rows:
                _ingest_pdf(st, pdf)
            if st.queued_events > max_buffered_events:
                st.mark_malformed()
                outcome, dispatched = "malformed", 0
            else:
                outcome, dispatched = drain(stream, st)
            self._state.update(_encode(st))
            self._arm(timer_values)
            yield _emit(stream, st, outcome, dispatched)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            (stream,) = key
            if not self._state.exists():
                return
            st = _decode(tuple(self._state.get()))
            outcome, dispatched = drain(stream, st)
            if st.is_empty:
                self._state.clear()
                yield _emit(stream, st, "purged", dispatched)
            else:
                # still-buffered (gapped or failing) spans survive the
                # purge tick: persist, re-arm, report
                self._state.update(_encode(st))
                self._arm(timer_values)
                yield _emit(stream, st, outcome, dispatched)

        def close(self):
            pass

    return SpanBufferProcessor()


def transform_with_state_available() -> bool:
    """True when the Spark-4 transformWithState Python runtime can run
    here: the API needs ``google.protobuf`` for its state-server
    protocol (not installable in this sandbox — same class of gate as
    the delta-spark legs)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        from pyspark.sql.streaming import StatefulProcessor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_stream(
    envelope_stream: DataFrame,
    handle,
    require_all: bool = True,
    ttl_ms: int = 0,
    engine: str = "auto",
) -> DataFrame:
    """Attach the span-buffer kernel to a streaming envelope DataFrame.

    Returns the outcome stream; start it with ``writeStream`` (the
    caller picks sink/trigger/checkpoint).

    ``engine``: ``'apply'`` = applyInPandasWithState (Spark 3.x API,
    always available), ``'tws'`` = Spark-4 transformWithStateInPandas
    (native timers + typed state; requires the RocksDB state store and
    the protobuf-backed Python state client), ``'auto'`` = tws when its
    runtime is importable, else apply — the same native-with-fallback
    policy as the store CDC DataSource.
    """
    from propulsion_spark import ensure_shipped

    spark = envelope_stream.sparkSession
    ensure_shipped(spark)
    if require_all and ttl_ms > 0:
        # purging a gapped stream's state would silently re-admit events
        # below its write position (ref: requireAll × purgeInterval are
        # mutually exclusive, src/Propulsion/Streams.fs:864)
        raise ValueError("require_all and state TTL (purge) are mutually exclusive")
    if engine == "auto":
        engine = "tws" if transform_with_state_available() else "apply"
    if engine == "tws":
        # transformWithState requires the RocksDB state store provider
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        return envelope_stream.groupBy("stream_name").transformWithStateInPandas(
            make_span_buffer_processor(
                handle, require_all=require_all, ttl_ms=ttl_ms
            ),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="ProcessingTime" if ttl_ms > 0 else "None",
        )
    if engine != "apply":
        raise ValueError(f"unknown state engine {engine!r}")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        envelope_stream.groupBy("stream_name")
        .applyInPandasWithState(
            make_stateful_processor(handle, require_all=require_all, ttl_ms=ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
