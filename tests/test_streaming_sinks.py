"""Sink + positions + checkpoint behavior tests, mirroring the
reference suites (SURVEY.md §5: ProgressTests, SinkHealthTests,
SourceTests semantics).
"""

from __future__ import annotations

import pandas as pd
import pytest

from propulsion_spark.envelope import STREAM_EVENT_SCHEMA
from propulsion_spark.streaming import CheckpointStore, StreamsSink
from propulsion_spark.streaming.monitor import BusyMonitor, HealthCheckException
from propulsion_spark.streaming.sinks import MalformedStreamError, OutcomeKind


def envelope_rows(stream: str, start: int, n: int, size: int = 10):
    return [
        {
            "stream_name": stream,
            "category": stream.split("-")[0],
            "idx": start + i,
            "event_type": f"e{start + i}",
            "data": "{}",
            "meta": None,
            "event_id": start + i,
            "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=start + i),
            "is_unfold": False,
            "size": size,
        }
        for i in range(n)
    ]


def mk_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows), schema=STREAM_EVENT_SCHEMA)


@pytest.fixture()
def sink(spark, tmp_path):
    def handle(stream, events):
        return OutcomeKind.OK, int(events["idx"].iloc[-1]) + 1

    return StreamsSink.start_concurrent(
        spark, handle, str(tmp_path / "positions")
    )


def outcomes_map(df):
    return {r.stream_name: r for r in df.collect()}


class TestStreamsSink:
    def test_dispatch_advances_positions(self, spark, sink):
        df = mk_df(spark, envelope_rows("user-1", 0, 5) + envelope_rows("user-2", 0, 3))
        out = outcomes_map(sink.process_batch(df))
        assert out["user-1"].outcome == OutcomeKind.OK
        assert out["user-1"].pos == 5
        assert out["user-2"].pos == 3
        pos = {r.stream_name: r.pos for r in sink.positions.read().collect()}
        assert pos == {"user-1": 5, "user-2": 3}

    def test_redelivery_is_duplicate(self, spark, sink):
        df = mk_df(spark, envelope_rows("user-1", 0, 5))
        sink.process_batch(df)
        out = outcomes_map(sink.process_batch(df))
        assert out["user-1"].outcome == OutcomeKind.DUPLICATE
        assert out["user-1"].pos == 5
        assert sink.stats.outcomes.get(OutcomeKind.DUPLICATE) == 1

    def test_partial_redelivery(self, spark, sink):
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 5)))
        out = outcomes_map(
            sink.process_batch(mk_df(spark, envelope_rows("user-1", 3, 5)))
        )
        assert out["user-1"].outcome == OutcomeKind.PARTIAL_DUPLICATE
        assert out["user-1"].pos == 8

    def test_gap_blocks_with_require_all(self, spark, tmp_path):
        def handle(stream, events):
            return OutcomeKind.OK, int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(
            spark, handle, str(tmp_path / "p2"), require_all=True
        )
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 3)))
        out = outcomes_map(
            sink.process_batch(mk_df(spark, envelope_rows("user-1", 5, 2)))
        )
        assert out["user-1"].outcome == OutcomeKind.PREFIX_MISSING
        assert out["user-1"].pos == 3  # did not advance

    def test_handler_exception_classified(self, spark, tmp_path):
        def handle(stream, events):
            raise TimeoutError("too slow")

        sink = StreamsSink.start_concurrent(spark, handle, str(tmp_path / "p3"))
        out = outcomes_map(sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 2))))
        assert out["user-1"].outcome == OutcomeKind.TIMEOUT
        assert out["user-1"].pos == 0

    def test_spool_rotation_is_completion_ordered(self, tmp_path):
        """In-flight spools are never deleted no matter how many faster
        batches overlap; retention applies only to completed spools
        (review r4: creation-ordered pruning rmtree'd a slow tranche's
        spool out from under its own write)."""
        import os

        from propulsion_spark.streaming.sinks import _SpoolRotation

        rot = _SpoolRotation(str(tmp_path), keep=2)
        paths = []
        for _ in range(5):  # 5 overlapping in-flight batches
            p = rot.next()
            os.makedirs(p)
            paths.append(p)
        assert all(os.path.isdir(p) for p in paths)  # none deleted
        for p in paths:
            rot.done(p)
        assert [os.path.isdir(p) for p in paths] == [False, False, False, True, True]

    def test_failing_gauge_clears_on_recovered_batch(self, spark, tmp_path):
        """A stream that failed in batch N and succeeded in batch N+1
        must leave the failing-streams health gauge (review r4: the
        clearing happens via record_failures' not-seen-this-batch
        deletion, which must run even when a batch has NO failures)."""

        def flaky(stream, events):
            if int(events["idx"].max()) < 3:
                raise TimeoutError("transient")
            return "ok", int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(spark, flaky, str(tmp_path / "pf"))
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 2)))
        assert "user-1" in sink.stats.failing_streams
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 6)))
        assert sink.stats.failing_streams == {}

    def test_empty_batch_keeps_failing_gauge(self, spark, tmp_path):
        """An idle tail-poll (zero-row micro-batch) touches no streams,
        so it must NOT clear a persistently-failing stream from the
        health gauge (advice r4: record_failures([]) on empty polls
        dropped failing streams out of health tracking without them
        ever succeeding)."""

        def failing(stream, events):
            raise TimeoutError("still down")

        sink = StreamsSink.start_concurrent(spark, failing, str(tmp_path / "pe"))
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 2)))
        assert "user-1" in sink.stats.failing_streams
        sink.process_batch(
            spark.createDataFrame([], STREAM_EVENT_SCHEMA)  # idle poll
        )
        assert "user-1" in sink.stats.failing_streams

    def test_malformed_quarantine(self, spark, tmp_path):
        def handle(stream, events):
            raise MalformedStreamError("bad payload")

        sink = StreamsSink.start_concurrent(spark, handle, str(tmp_path / "p4"))
        first = outcomes_map(
            sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 2)))
        )
        assert first["user-1"].outcome == OutcomeKind.MALFORMED
        assert first["user-1"].malformed
        # second batch: the stream is poisoned → excluded before dispatch
        out = sink.process_batch(mk_df(spark, envelope_rows("user-1", 2, 2)))
        assert out.count() == 0

    def test_slice_to_max_events(self, spark, tmp_path):
        def handle(stream, events):
            return OutcomeKind.OK, int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(
            spark, handle, str(tmp_path / "p5"), max_events=4
        )
        rows = sorted(
            sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 10))).collect(),
            key=lambda r: r.pos,
        )
        # sliced into chunks of ≤4, all drained within the batch
        assert [r.n_events for r in rows] == [4, 4, 2]
        assert rows[-1].pos == 10

    def test_slice_to_max_bytes(self, spark, tmp_path):
        def handle(stream, events):
            return OutcomeKind.OK, int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(
            spark, handle, str(tmp_path / "p5b"), max_bytes=35
        )
        rows = sorted(
            sink.process_batch(
                mk_df(spark, envelope_rows("user-1", 0, 10, size=10))
            ).collect(),
            key=lambda r: r.pos,
        )
        assert rows[0].n_events == 3  # 3×10 ≤ 35 < 4×10

    def test_post_gap_spans_drain_without_require_all(self, spark, tmp_path):
        def handle(stream, events):
            return OutcomeKind.OK, int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(spark, handle, str(tmp_path / "p7"))
        df = mk_df(
            spark, envelope_rows("user-1", 0, 3) + envelope_rows("user-1", 5, 2)
        )
        rows = sorted(sink.process_batch(df).collect(), key=lambda r: r.pos)
        # both spans dispatched in one batch; write pos jumps the gap
        assert [(r.n_events, r.pos) for r in rows] == [(3, 3), (2, 7)]
        pos = {r.stream_name: r.pos for r in sink.positions.read().collect()}
        assert pos == {"user-1": 7}

    def test_handler_fast_forward(self, spark, tmp_path):
        # handler may return a pos beyond the span (e.g. store said so)
        def handle(stream, events):
            return OutcomeKind.OK, 100

        sink = StreamsSink.start_concurrent(spark, handle, str(tmp_path / "p6"))
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 3)))
        out = outcomes_map(sink.process_batch(mk_df(spark, envelope_rows("user-1", 3, 3))))
        assert out["user-1"].outcome == OutcomeKind.DUPLICATE


class TestEmptyBatch:
    def test_empty_batch_is_a_noop(self, spark, sink, tmp_path):
        from propulsion_spark.envelope import STREAM_EVENT_SCHEMA

        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 2)))
        segments_before = sink.positions._segments()
        empty = spark.createDataFrame([], STREAM_EVENT_SCHEMA)
        out = sink.process_batch(empty)
        assert out.count() == 0
        # positions table untouched (no segment churn from tail polls)
        assert sink.positions._segments() == segments_before


class TestFastPathSink:
    def test_semantics_match_grouped_path(self, spark, tmp_path):
        def handle(stream, events):
            return OutcomeKind.OK, int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(
            spark, handle, str(tmp_path / "fp"), fast_path=True
        )
        df = mk_df(
            spark,
            envelope_rows("user-1", 0, 50)
            + envelope_rows("user-2", 0, 30)
            + envelope_rows("user-3", 5, 4),  # gap stream
        )
        rows = sink.process_batch(df).collect()
        by_stream = {}
        for r in rows:
            by_stream.setdefault(r.stream_name, []).append(r)
        assert max(r.pos for r in by_stream["user-1"]) == 50
        assert max(r.pos for r in by_stream["user-2"]) == 30
        assert max(r.pos for r in by_stream["user-3"]) == 9
        pos = {r.stream_name: r.pos for r in sink.positions.read().collect()}
        assert pos == {"user-1": 50, "user-2": 30, "user-3": 9}
        # redelivery dedups identically
        out = {r.stream_name: r for r in sink.process_batch(df).collect()}
        assert all(o.outcome == OutcomeKind.DUPLICATE for o in out.values())

    def test_many_small_streams(self, spark, tmp_path):
        def handle(stream, events):
            return OutcomeKind.OK, int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(
            spark, handle, str(tmp_path / "fp2"), fast_path=True
        )
        rows = []
        for i in range(200):
            rows += envelope_rows(f"user-{i}", 0, 2)
        out = sink.process_batch(mk_df(spark, rows))
        assert out.count() == 200
        assert sink.positions.read().count() == 200


class TestDeclarativeSink:
    def test_jvm_only_fold_matches_handler_semantics(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from propulsion_spark.streaming import DeclarativeSink

        sink = DeclarativeSink.start(
            spark,
            {"n": F.count("*"), "last_type": F.max("event_type")},
            str(tmp_path / "dpos"),
        )
        out = outcomes_map(
            sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 5)))
        )
        assert out["user-1"].n == 5 and out["user-1"].pos == 5
        # redelivery: deduped rows never re-enter the fold
        out2 = sink.process_batch(
            mk_df(spark, envelope_rows("user-1", 0, 5) + envelope_rows("user-1", 5, 2))
        )
        m = outcomes_map(out2)
        assert m["user-1"].n == 2 and m["user-1"].pos == 7
        pos = {r.stream_name: r.pos for r in sink.positions.read().collect()}
        assert pos == {"user-1": 7}

    def test_outcome_table_append(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from propulsion_spark.streaming import DeclarativeSink

        out_path = str(tmp_path / "outcomes")
        sink = DeclarativeSink.start(
            spark,
            {"n": F.count("*")},
            str(tmp_path / "dpos2"),
            outcome_table_path=out_path,
        )
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 3)))
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 3, 2)))
        rows = spark.read.parquet(out_path).orderBy("pos").collect()
        assert [(r.n, r.pos) for r in rows] == [(3, 3), (2, 5)]


class TestBatchedSink:
    def test_select_then_single_handle(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from propulsion_spark.streaming import BatchedSink

        seen = []

        def select(df):
            return df.filter(F.col("event_type") != "e0")

        def handle(df):
            seen.append(df.count())

        sink = BatchedSink(spark, select, handle)
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 5)))
        assert seen == [4] and sink.batches == 1


class TestRequireAllTtlExclusion:
    def test_mutually_exclusive(self, spark, tmp_path):
        from propulsion_spark.streaming.state_kernel import stateful_stream

        stream = (
            spark.readStream.schema(
                __import__(
                    "propulsion_spark.envelope", fromlist=["STREAM_EVENT_SCHEMA"]
                ).STREAM_EVENT_SCHEMA
            )
            .parquet(str(tmp_path))
        )
        with pytest.raises(ValueError, match="mutually exclusive"):
            stateful_stream(stream, lambda s, e: ("ok", None), require_all=True, ttl_ms=1000)


class TestCheckpointStore:
    def test_start_establishes_origin(self, tmp_path):
        store = CheckpointStore(str(tmp_path / "ckpt"), group="g1")
        assert store.start("src", "0", establish_origin=42) == 42
        # origin persisted: a second store instance sees it
        store2 = CheckpointStore(str(tmp_path / "ckpt"), group="g1")
        assert store2.start("src", "0", establish_origin=99) == 42

    def test_commit_newest_wins_and_throttles(self, tmp_path):
        store = CheckpointStore(str(tmp_path / "c2"), group="g1", commit_interval_s=999)
        store.start("src", "0", 0)
        store.commit("src", "0", 10)
        store.commit("src", "0", 7)  # stale: ignored
        store.commit("src", "0", 15)
        # throttled: durable value still 0; pending is 15
        assert store.position("src", "0") == 15
        store.flush(force=True)
        fresh = CheckpointStore(str(tmp_path / "c2"), group="g1")
        assert fresh.position("src", "0") == 15

    def test_consumer_groups_isolated(self, tmp_path):
        a = CheckpointStore(str(tmp_path / "c3"), group="a")
        b = CheckpointStore(str(tmp_path / "c3"), group="b")
        a.start("src", "0", 0)
        b.start("src", "0", 0)
        a.commit("src", "0", 5)
        a.flush()
        b.commit("src", "0", 9)
        b.flush()
        assert CheckpointStore(str(tmp_path / "c3"), group="a").position("src", "0") == 5
        assert CheckpointStore(str(tmp_path / "c3"), group="b").position("src", "0") == 9

    def test_override(self, tmp_path):
        store = CheckpointStore(str(tmp_path / "c4"), group="g1")
        store.start("src", "0", 0)
        store.commit("src", "0", 50)
        store.flush()
        store.override_position("src", "0", 10)
        fresh = CheckpointStore(str(tmp_path / "c4"), group="g1")
        assert fresh.position("src", "0") == 10

    def test_compaction_preserves_positions(self, tmp_path):
        store = CheckpointStore(str(tmp_path / "c5"), group="g1", commit_interval_s=0)
        store.start("src", "0", 0)
        for i in range(80):
            store.commit("src", "0", i)
            store.flush(force=True)
        assert len(store._files()) <= 64
        assert store.position("src", "0") == 79


class TestBusyMonitor:
    def test_stuck_vs_failing(self):
        mon = BusyMonitor()
        mon.record_outcomes(
            [
                {"stream_name": "s-ok", "outcome": "ok"},
                {"stream_name": "s-new", "outcome": "exn"},
                {"stream_name": "s-was-ok", "outcome": "ok"},
            ]
        )
        mon.record_outcomes([{"stream_name": "s-was-ok", "outcome": "exn"}])
        stuck, failing = mon.classify(abend_threshold_s=0.0)
        assert [s for s, _ in stuck] == ["s-new"]
        assert [s for s, _ in failing] == ["s-was-ok"]
        with pytest.raises(HealthCheckException) as ei:
            mon.check_health(abend_threshold_s=0.0)
        assert ei.value.stuck_streams and ei.value.failing_streams

    def test_recovery_clears(self):
        mon = BusyMonitor()
        mon.record_outcomes([{"stream_name": "s1", "outcome": "exn"}])
        mon.record_outcomes([{"stream_name": "s1", "outcome": "ok"}])
        mon.check_health(abend_threshold_s=0.0)  # no raise

    def test_five_state_classify(self):
        """ref: Streams.fs:491-512 — Running | Slow | Failing | Stuck |
        Waiting, with Failing > Stuck > activity precedence."""
        from propulsion_spark.streaming.monitor import (
            FAILING,
            RUNNING,
            SLOW,
            STUCK,
            WAITING,
        )

        mon = BusyMonitor(slow_threshold_s=1.0)
        mon.record_outcomes(
            [
                {"stream_name": "s-run", "outcome": "ok",
                 "prev_pos": 0, "pos": 5, "latency_ms": 10.0},
                {"stream_name": "s-slow", "outcome": "ok",
                 "prev_pos": 0, "pos": 5, "latency_ms": 5000.0},
                {"stream_name": "s-fail", "outcome": "exn"},
                # succeeded without advancing: intentional no-progress
                {"stream_name": "s-stuck", "outcome": "ok",
                 "prev_pos": 7, "pos": 7, "latency_ms": 1.0},
                # gapped: buffered but nothing dispatchable
                {"stream_name": "s-wait", "outcome": "prefix_missing"},
            ]
        )
        assert mon.classify_stream("s-run") == RUNNING
        assert mon.classify_stream("s-slow") == SLOW
        assert mon.classify_stream("s-fail") == FAILING
        assert mon.classify_stream("s-stuck") == STUCK
        assert mon.classify_stream("s-wait") == WAITING
        assert mon.classify_stream("s-unknown") == WAITING
        # a duplicate redelivery is NOT stuck (dedup working as designed)
        mon.record_outcomes(
            [{"stream_name": "s-dup", "outcome": "duplicate",
              "prev_pos": 3, "pos": 3, "latency_ms": 1.0}]
        )
        assert mon.classify_stream("s-dup") == RUNNING
        # recovery: the gap fills, the waiting stream progresses
        mon.record_outcomes(
            [{"stream_name": "s-wait", "outcome": "ok",
              "prev_pos": 0, "pos": 9, "latency_ms": 2.0}]
        )
        assert mon.classify_stream("s-wait") == RUNNING


class TestDispatchPrioritization:
    def test_heaviest_stream_first_within_partition(self):
        """StreamsPrioritizer approximation (ref: Streams.fs:754-788):
        within one Arrow batch the partition handler dispatches streams
        by descending buffered bytes."""
        import pandas as pd

        from propulsion_spark.streaming.sinks import _make_partition_handler

        def handle(stream, events):
            return "ok", int(events["idx"].iloc[-1]) + 1

        rows = []
        # input sorted by stream name; dispatch must resort by weight.
        # (d-tail is the batch's last stream: held as the split-tail
        # carry and dispatched after the body regardless of weight.)
        for name, size, n in [
            ("a-light", 10, 1),
            ("b-heavy", 100, 3),
            ("c-mid", 20, 1),
            ("d-tail", 500, 1),
        ]:
            for i in range(n):
                rows.append(
                    {"stream_name": name, "idx": i, "_pos": 0, "size": size}
                )
        pdf = pd.DataFrame(rows)
        process = _make_partition_handler(
            handle, max_events=4096, max_bytes=1 << 20, require_all=True
        )
        out = pd.concat(list(process(iter([pdf]))), ignore_index=True)
        assert list(out["stream_name"]) == ["b-heavy", "c-mid", "a-light", "d-tail"]


class TestCheckpointStoreConcurrency:
    def test_parallel_pumps_never_see_partial_segments(self, tmp_path):
        """Regression for a read/write race: tranche pumps call
        start()/snapshot() without the writer lock, so an in-progress
        segment write must never be visible under its final name
        (observed as ArrowInvalid 'file size is 4 bytes'), and a
        compaction deleting a just-listed segment must not crash the
        reader. Hammer both paths concurrently for a few seconds."""
        import threading
        import time

        from propulsion_spark.streaming.checkpoints import CheckpointStore

        store = CheckpointStore(
            str(tmp_path / "ck"), group="g", commit_interval_s=0
        )
        stop = time.monotonic() + 4.0
        errors: list[BaseException] = []

        def writer():
            i = 0
            while time.monotonic() < stop:
                try:
                    store.commit("s", "0", i)
                    store.flush(force=True)
                    store._maybe_compact(max_files=4)
                except BaseException as e:  # noqa: BLE001
                    errors.append(e)
                    return
                i += 1

        def reader():
            while time.monotonic() < stop:
                try:
                    store.start("s", "1", establish_origin=0)
                    store.snapshot()
                    store.position("s", "0")
                except BaseException as e:  # noqa: BLE001
                    errors.append(e)
                    return

        threads = [threading.Thread(target=writer)] + [
            threading.Thread(target=reader) for _ in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:1]
        # and the store is still coherent after the storm
        snap = store.snapshot()
        assert int(snap[snap.tranche == "0"].pos.iloc[0]) >= 0
