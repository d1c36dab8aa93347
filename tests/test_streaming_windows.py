"""Streaming window twins: the batch operators' semantics as continuous
queries with watermarks, driven through real micro-batches; verifies
batch/stream agreement on the same data and watermark lateness drop."""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pytest

from propulsion_spark.streaming.windows import tumbling_counts_stream

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def ev(eid, minute, etype="click", value=1.0):
    return {
        "event_id": eid,
        "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=minute),
        "user_id": eid % 3,
        "event_type": etype,
        "value": value,
        "props": "{}",
    }


class TestSessionStream:
    def test_session_windows_close_after_gap(self, spark, tmp_path):
        from propulsion_spark.streaming.windows import session_stream

        indir = str(tmp_path / "in")
        os.makedirs(indir)
        name = f"sess_{uuid.uuid4().hex[:8]}"
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
        )
        enveloped = stream.withColumnRenamed("event_type", "stream_name")
        q = (
            session_stream(enveloped, key="stream_name", gap="30 minutes")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )

        def push(rows):
            spark.createDataFrame(
                pd.DataFrame(rows),
                EVENTS_SCHEMA.replace("event_type", "stream_name"),
            ).coalesce(1).write.mode("append").parquet(indir)
            q.processAllAvailable()

        # two bursts 90 min apart → two sessions for stream 'a'
        push([ev(1, 0, "a"), ev(2, 10, "a"), ev(3, 100, "a"), ev(4, 105, "a")])
        push([ev(9, 500, "a")])  # advance watermark far → both sessions close
        rows = sorted(
            spark.sql(f"SELECT * FROM {name}").collect(),
            key=lambda r: r.session_start,
        )
        assert [(r.n_events) for r in rows[:2]] == [2, 2]
        starts = [r.session_start.minute for r in rows[:2]]
        assert starts == [0, 40]  # sessions began at minute 0 and 100 (mod 60)
        q.stop()


class TestTumblingStream:
    def test_stream_matches_batch_and_drops_late(self, spark, tmp_path):
        indir = str(tmp_path / "in")
        os.makedirs(indir)
        name = f"win_{uuid.uuid4().hex[:8]}"
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
        )
        q = (
            tumbling_counts_stream(stream, window="1 hour", watermark="10 minutes")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )

        def push(rows):
            spark.createDataFrame(pd.DataFrame(rows), EVENTS_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(indir)
            q.processAllAvailable()

        # hour 0 data, then advance event time far past the watermark
        push([ev(1, 5), ev(2, 20), ev(3, 59)])
        push([ev(4, 200)])  # moves watermark to ~190min → hour-0 window closes
        closed = {
            (r.window_start.isoformat(), r.n)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert ("2024-01-01T00:00:00", 3) in closed

        # a late straggler for hour 0 (event time far behind watermark) is dropped
        push([ev(5, 30)])
        push([ev(6, 400)])  # close everything else
        rows = spark.sql(f"SELECT * FROM {name} WHERE window_start = timestamp '2024-01-01 00:00:00'").collect()
        assert len(rows) == 1 and rows[0].n == 3  # late row never re-opened hour 0
        q.stop()


class TestAsofEnrichStream:
    def test_streamed_asof_matches_batch_operator(self, spark, tmp_path):
        """Drive micro-batches through the foreachBatch as-of enricher
        and assert the accumulated output equals the batch operator run
        over the same events — the twin contract."""
        from propulsion_spark.operators.timeseries import q_asof_join_orders
        from propulsion_spark.streaming.windows import asof_enrich_foreach_batch
        from propulsion_spark import load_table

        sf = "/root/testdata/sf0.001"
        events = load_table(spark, sf, "events").select("event_id", "ts", "user_id")
        orders = load_table(spark, sf, "orders")
        indir, out = str(tmp_path / "in"), str(tmp_path / "out")
        os.makedirs(indir)
        # split events into 3 files → 3 micro-batches
        for bucket in range(3):
            events.filter(events.event_id % 3 == bucket).coalesce(1).write.mode(
                "append"
            ).parquet(indir)
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
        )
        q = (
            stream.writeStream.foreachBatch(
                asof_enrich_foreach_batch(orders, out)
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            r.event_id: (r.o_orderkey, r.o_totalprice)
            for r in spark.read.parquet(out).collect()
        }
        want = {
            r.event_id: (r.o_orderkey, r.o_totalprice)
            for r in q_asof_join_orders(spark, sf).collect()
        }
        assert got == want


class TestRangeLookbackStream:
    def _read_out(self, spark, out):
        return {
            r.event_id: (r.n_prior_1h, round(r.prior_value_sum, 6))
            for r in spark.read.parquet(out).collect()
        }

    def test_streamed_range_join_matches_batch_replays_idempotently(
        self, spark, tmp_path
    ):
        """Drive 3 time-ordered micro-batches through the foreachBatch
        range-lookback twin: the accumulated output must equal the
        batch operator over the same events (the twin contract), a
        replay of the last batch must change nothing (at-least-once
        safety), and state snapshots must compact to the newest two
        versions (watermark-bounded state, not stream-lifetime)."""
        import os

        from propulsion_spark import load_table
        from propulsion_spark.operators.timeseries import q_range_join_events_1h
        from propulsion_spark.streaming.windows import range_lookback_foreach_batch

        sf = "/root/testdata/sf0.001"
        events = load_table(spark, sf, "events").select(
            "event_id", "user_id", "ts", "value"
        )
        q1, q2 = events.selectExpr(
            "percentile(unix_micros(ts), array(0.33, 0.66)) AS q"
        ).first()[0]
        import pyspark.sql.functions as F

        us = F.expr("unix_micros(ts)")
        batches = [
            events.filter(us <= q1),
            events.filter((us > q1) & (us <= q2)),
            events.filter(us > q2),
        ]
        state, out = str(tmp_path / "state"), str(tmp_path / "out")
        fb = range_lookback_foreach_batch(spark, state, out)
        for i, b in enumerate(batches):
            fb(b, i)

        got = self._read_out(spark, out)
        want = {
            r.event_id: (r.n_prior_1h, round(r.prior_value_sum, 6))
            for r in q_range_join_events_1h(spark, sf).collect()
        }
        assert got == want

        # at-least-once replay of the last batch: same output, same state
        fb(batches[2], 2)
        assert self._read_out(spark, out) == want

        # compaction: only the newest two state versions survive
        versions = sorted(n for n in os.listdir(state) if n.startswith("v"))
        assert versions == ["v1", "v2"]

    def test_range_lookback_under_real_stream(self, spark, tmp_path):
        """Plumbing check: the twin runs under a real AvailableNow
        foreachBatch query and produces one row per event."""
        from propulsion_spark import load_table
        from propulsion_spark.streaming.windows import range_lookback_foreach_batch

        sf = "/root/testdata/sf0.001"
        events = load_table(spark, sf, "events").select(
            "event_id", "user_id", "ts", "value"
        )
        indir = str(tmp_path / "in")
        events.coalesce(1).write.mode("append").parquet(indir)
        stream = spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        ).parquet(indir)
        q = (
            stream.writeStream.foreachBatch(
                range_lookback_foreach_batch(
                    spark, str(tmp_path / "state"), str(tmp_path / "out")
                )
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        n = spark.read.parquet(str(tmp_path / "out")).count()
        assert n == events.count()


class TestResampleStream:
    def test_grid_continuous_across_batches_and_replays(self, spark, tmp_path):
        """Drive hand-crafted micro-batches through the foreachBatch
        resample twin: hourly grid rows must be continuous per key
        ACROSS batches (inter-batch gap hours materialized with the
        carried value), late events for closed hours must be dropped,
        and a replay of the last batch must change nothing."""
        import datetime as dt

        from propulsion_spark.streaming.windows import resample_ffill_foreach_batch

        t0 = dt.datetime(2024, 1, 1, 0, 30)

        def mk(rows):
            return spark.createDataFrame(
                rows, "user_id long, ts timestamp, value double"
            )

        state, out = str(tmp_path / "state"), str(tmp_path / "out")
        fb = resample_ffill_foreach_batch(spark, state, out)
        # batch 0: hour 0 (hi 10) and hour 1 (hi 4)
        fb(mk([(1, t0, 10.0), (1, t0 + dt.timedelta(hours=1), 4.0)]), 0)
        # batch 1: next event at hour 4 → hours 2,3 are inter-batch gaps;
        # plus a LATE event back in hour 0 (must be dropped)
        fb(
            mk(
                [
                    (1, t0 + dt.timedelta(hours=4), 7.0),
                    (1, t0 - dt.timedelta(minutes=10), 99.0),
                ]
            ),
            1,
        )

        def read_grid():
            return {
                (r.user_id, r.hour): (
                    r.n_events,
                    r.hi_ffill,
                    r.volume,
                    r.gap_filled,
                )
                for r in spark.read.parquet(out).collect()
            }

        got = read_grid()
        h = lambda k: dt.datetime(2024, 1, 1, k)
        assert got == {
            (1, h(0)): (1, 10.0, 10.0, False),
            (1, h(1)): (1, 4.0, 4.0, False),
            (1, h(2)): (0, 4.0, 0.0, True),   # carried across the batch gap
            (1, h(3)): (0, 4.0, 0.0, True),
            (1, h(4)): (1, 7.0, 7.0, False),
        }
        # replay of batch 1: identical grid (no duplicate rows)
        fb(
            mk([(1, t0 + dt.timedelta(hours=4), 7.0)]),
            1,
        )
        assert read_grid() == got

    def test_untouched_keys_keep_their_carry(self, spark, tmp_path):
        import datetime as dt

        from propulsion_spark.streaming.windows import resample_ffill_foreach_batch

        t0 = dt.datetime(2024, 6, 1, 12, 0)

        def mk(rows):
            return spark.createDataFrame(
                rows, "user_id long, ts timestamp, value double"
            )

        state, out = str(tmp_path / "state"), str(tmp_path / "out")
        fb = resample_ffill_foreach_batch(spark, state, out)
        fb(mk([(1, t0, 5.0), (2, t0, 6.0)]), 0)
        # only key 1 ticks in batch 1
        fb(mk([(1, t0 + dt.timedelta(hours=2), 8.0)]), 1)
        # key 2 reappears in batch 2: its gap is filled from ITS carry
        fb(mk([(2, t0 + dt.timedelta(hours=3), 9.0)]), 2)
        rows = {
            (r.user_id, r.hour): (r.n_events, r.hi_ffill)
            for r in spark.read.parquet(out).collect()
        }
        h = lambda k: dt.datetime(2024, 6, 1, 12 + k)
        assert rows[(1, h(1))] == (0, 5.0)
        assert rows[(1, h(2))] == (1, 8.0)
        assert rows[(2, h(1))] == (0, 6.0)
        assert rows[(2, h(2))] == (0, 6.0)
        assert rows[(2, h(3))] == (1, 9.0)
