"""Codec round-trips (RenderedSpan, change-feed parser), StreamFilter
composition, Kafka message→envelope mapping, ChangeFeedSource tailing,
JsonSource line checkpoints, ParallelSink."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from propulsion_spark.functions.codec import (
    parse_changefeed_documents,
    parse_rendered_spans,
    render_spans,
)
from propulsion_spark.functions.filters import StreamFilter
from propulsion_spark.sources.kafka import kafka_messages_to_envelope
from propulsion_spark.sources.parquet_feed import ChangeFeedSource
from propulsion_spark.sources.json_source import JsonSource
from propulsion_spark.streaming import CheckpointStore
from propulsion_spark.streaming.sinks import ParallelSink

from test_sources import CollectingSink
from test_streaming_sinks import envelope_rows, mk_df


class TestRenderedSpanCodec:
    def test_roundtrip(self, spark):
        df = mk_df(
            spark, envelope_rows("user-1", 0, 3) + envelope_rows("user-1", 5, 2)
        )
        messages = render_spans(df)
        msgs = messages.collect()
        assert len(msgs) == 2  # one message per contiguous span
        payloads = [json.loads(m.value) for m in msgs]
        assert sorted(p["i"] for p in payloads) == [0, 5]
        back = parse_rendered_spans(messages)
        rows = sorted(back.collect(), key=lambda r: r.idx)
        assert [r.idx for r in rows] == [0, 1, 2, 5, 6]
        assert all(r.stream_name == "user-1" for r in rows)
        assert rows[0].event_type == "e0"

    def test_parse_changefeed_documents(self, spark):
        doc = {
            "p": "user-7",
            "i": 10,
            "e": [
                {"c": "Added", "t": "2024-01-01T00:00:00Z", "d": '{"x":1}'},
                {"c": "Removed", "t": "2024-01-01T00:00:01Z", "d": '{"x":2}'},
            ],
            "u": [{"c": "Snapshot", "d": '{"s":true}'}],
        }
        df = spark.createDataFrame([(json.dumps(doc),)], "doc string")
        rows = sorted(
            parse_changefeed_documents(df).collect(),
            key=lambda r: (r.is_unfold, r.idx),
        )
        assert [(r.idx, r.event_type, r.is_unfold) for r in rows] == [
            (10, "Added", False),
            (11, "Removed", False),
            (11, "Snapshot", True),
        ]


class TestStreamFilter:
    def test_combined_allow_deny(self, spark):
        df = mk_df(
            spark,
            envelope_rows("user-1", 0, 2)
            + envelope_rows("user-2", 0, 2)
            + envelope_rows("cart-1", 0, 2)
            + envelope_rows("$system", 0, 1),
        )
        f = StreamFilter(
            allow_categories=["user"],
            deny_stream_regex=[r"user-2$"],
        )
        names = {r.stream_name for r in f.apply(df).collect()}
        assert names == {"user-1"}

    def test_event_type_and_custom(self, spark):
        df = mk_df(spark, envelope_rows("user-1", 0, 5))
        f = StreamFilter(deny_event_types=["e0", "e1"]).where(F.col("idx") < 4)
        rows = f.apply(df).collect()
        assert sorted(r.idx for r in rows) == [2, 3]

    def test_system_streams_opt_in(self, spark):
        df = mk_df(spark, envelope_rows("$sys", 0, 1) + envelope_rows("user-1", 0, 1))
        assert StreamFilter().apply(df).count() == 1
        assert StreamFilter(include_system=True).apply(df).count() == 2


class TestKafkaMapping:
    def test_messages_to_envelope(self, spark):
        msgs = spark.createDataFrame(
            pd.DataFrame(
                [
                    {"key": b"user-1", "value": b'{"a":1}', "topic": "t", "partition": 0,
                     "offset": 100, "timestamp": pd.Timestamp("2024-01-01")},
                    {"key": b"user-1", "value": b'{"a":2}', "topic": "t", "partition": 0,
                     "offset": 101, "timestamp": pd.Timestamp("2024-01-01")},
                    {"key": None, "value": b'{"a":3}', "topic": "t", "partition": 2,
                     "offset": 7, "timestamp": pd.Timestamp("2024-01-01")},
                    {"key": b"nodash", "value": b'{"a":4}', "topic": "t", "partition": 1,
                     "offset": 9, "timestamp": pd.Timestamp("2024-01-01")},
                ]
            ),
            "key binary, value binary, topic string, partition int, offset long, timestamp timestamp",
        )
        env = kafka_messages_to_envelope(msgs).collect()
        by_stream = {}
        for r in env:
            by_stream.setdefault(r.stream_name, []).append(r)
        # keyed messages get per-stream synthetic indexes in offset order
        assert [r.idx for r in sorted(by_stream["user-1"], key=lambda r: r.event_id)] == [0, 1]
        # null key → synthetic Messages_{topic}_{partition} name w/ category
        assert "kafka-Messages_t_2" in by_stream
        # un-dashed key gets the default category prefix
        assert "kafka-nodash" in by_stream
        meta = json.loads(by_stream["user-1"][0].meta)
        assert meta == {"topic": "t", "partition": 0, "offset": 100}

    def test_kafka_source_gated(self, spark):
        from propulsion_spark.sources.kafka import kafka_available, kafka_stream

        if kafka_available(spark):
            pytest.skip("kafka connector present")
        with pytest.raises(RuntimeError, match="classpath"):
            kafka_stream(spark, "localhost:9092", "t")


class TestChangeFeedSource:
    def test_tails_appended_files(self, spark, tmp_path):
        feed_dir = tmp_path / "feed"
        feed_dir.mkdir()
        mk_df(spark, envelope_rows("user-1", 0, 3)).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed_dir))
        sink = CollectingSink()
        ckpt = CheckpointStore(str(tmp_path / "ck"), group="g", commit_interval_s=0)
        src = ChangeFeedSource(
            spark, str(feed_dir), sink, ckpt, stop_at_tail=False
        )
        src.tail_sleep_s = 0.05
        src.start()
        assert src.await_completion(timeout=60)
        n1 = sum(len(b) for b in sink.batches)
        # append more files while tailing → picked up like a change feed
        mk_df(spark, envelope_rows("user-2", 0, 2)).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed_dir))
        assert src.await_completion(timeout=60)
        import time

        deadline = time.monotonic() + 30
        while sum(len(b) for b in sink.batches) < n1 + 2 and time.monotonic() < deadline:
            time.sleep(0.05)
        src.stop()
        assert sum(len(b) for b in sink.batches) >= n1 + 2


class TestJsonSource:
    def test_line_checkpoints_and_skip(self, spark, tmp_path):
        path = tmp_path / "data.ndjson"
        with open(path, "w") as f:
            for i in range(10):
                f.write(json.dumps({"n": i}) + "\n")
        sink = CollectingSink()
        ckpt = CheckpointStore(str(tmp_path / "ck"), group="g", commit_interval_s=0)
        src = JsonSource(
            spark, str(path), sink, ckpt, skip=2, truncate_to=8, page_lines=3
        )
        src.run_until_caught_up(timeout=120)
        rows = [r for b in sink.batches for r in b]
        ns = sorted(json.loads(r.line)["n"] for r in rows)
        assert ns == [2, 3, 4, 5, 6, 7]  # skip=2, truncate_to=8
        assert ckpt.position("jsonSource", "0") == 8


class TestParallelSink:
    def test_unordered_item_processing(self, spark):
        def handle_items(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"stream_name": pdf["stream_name"], "double_idx": pdf["idx"] * 2}
            )

        sink = ParallelSink(
            spark, handle_items, "stream_name string, double_idx long"
        )
        out = sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 5)))
        assert sink.batches == 1

    def test_faults_abend(self, spark):
        def handle_items(pdf: pd.DataFrame) -> pd.DataFrame:
            raise RuntimeError("item failure")

        sink = ParallelSink(spark, handle_items, "stream_name string")
        with pytest.raises(Exception, match="item failure"):
            sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 5)))

    def test_returned_table_never_reinvokes_handlers(self, spark):
        """Acting on the returned table must not re-run the (side-
        effecting, at-least-once) handlers — the checkpointed result is
        the record of what already happened."""
        acc = spark.sparkContext.accumulator(0)

        def handle_items(pdf: pd.DataFrame) -> pd.DataFrame:
            acc.add(len(pdf))
            return pd.DataFrame({"stream_name": pdf["stream_name"]})

        sink = ParallelSink(spark, handle_items, "stream_name string")
        out = sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 5)))
        handled = acc.value
        assert handled == 5
        assert out.count() == 5 and len(out.collect()) == 5  # two more actions
        assert acc.value == handled  # no re-invocation

    def test_returned_table_survives_cache_loss(self, spark):
        """The outcome table is durable (parquet spool), not executor
        block storage: it must stay readable — without re-running the
        handlers — even after every cached/checkpointed block is gone
        (the localCheckpoint failure mode at scale: lose one executor
        after the checkpoint and the batch is unrecoverable)."""
        acc = spark.sparkContext.accumulator(0)

        def handle_items(pdf: pd.DataFrame) -> pd.DataFrame:
            acc.add(len(pdf))
            return pd.DataFrame({"stream_name": pdf["stream_name"]})

        sink = ParallelSink(spark, handle_items, "stream_name string")
        out = sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 5)))
        handled = acc.value
        spark.catalog.clearCache()  # simulate storage/executor loss
        assert out.count() == 5
        assert acc.value == handled  # durable result, no handler re-run
