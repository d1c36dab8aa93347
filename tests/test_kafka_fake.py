"""Kafka path end-to-end against the file-backed topic fake — the
broker-less mirror of the reference's integration scenarios
(ref: tests/Propulsion.Kafka.Integration/ConsumersIntegration.fs:206-370).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from propulsion_spark.functions.codec import parse_rendered_spans, render_spans
from propulsion_spark.sources.kafka_fake import (
    FileTopic,
    FileTopicConsumer,
    produce_rendered,
)
from propulsion_spark.streaming import StreamsSink


def make_sink(spark, tmp_path, name="pos", handle=None):
    if handle is None:
        # defined here (not module level) so cloudpickle ships it by
        # value — executors can't import the test module
        def handle(stream, events):
            return "ok", int(events["idx"].iloc[-1]) + 1

    return StreamsSink.start_concurrent(spark, handle, str(tmp_path / name))


def fill(topic, n_producers=3, per_producer=40):
    """numbered messages across keyed streams, like the reference's
    RunProducers."""
    for p in range(n_producers):
        for i in range(per_producer):
            topic.produce(
                f"Producer-{p}", json.dumps({"producerId": p, "messageId": i})
            )


class TestFileTopicRoundtrip:
    def test_producer_consumer_basic_roundtrip(self, spark, tmp_path):
        """All produced messages consumed exactly once; per-stream
        positions equal per-producer counts (offset order preserved)."""
        topic = FileTopic(str(tmp_path / "t"), n_partitions=4)
        fill(topic, n_producers=3, per_producer=40)
        sink = make_sink(spark, tmp_path)
        consumer = FileTopicConsumer(spark, topic, "g1", sink)
        got = consumer.run_until_caught_up()
        assert got == 120
        pos = {
            r.stream_name: r.pos for r in sink.positions.read().collect()
        }
        assert pos == {f"Producer-{p}": 40 for p in range(3)}

    def test_consumer_group_isolation(self, spark, tmp_path):
        """Different group ids consume the same message set (ref:
        'different consumer group ids should be consuming the same
        message set')."""
        topic = FileTopic(str(tmp_path / "t"), n_partitions=2)
        fill(topic, n_producers=1, per_producer=10)
        c1 = FileTopicConsumer(spark, topic, "gA", make_sink(spark, tmp_path, "a"))
        c2 = FileTopicConsumer(spark, topic, "gB", make_sink(spark, tmp_path, "b"))
        assert c1.run_until_caught_up() == 10
        assert c2.run_until_caught_up() == 10

    def test_same_group_no_redelivery(self, spark, tmp_path):
        """A new consumer in the same group sees nothing (ref: 'Spawning
        a new consumer with same consumer group id should not receive
        new messages')."""
        topic = FileTopic(str(tmp_path / "t"), n_partitions=2)
        fill(topic, n_producers=1, per_producer=10)
        c1 = FileTopicConsumer(spark, topic, "g", make_sink(spark, tmp_path, "a"))
        assert c1.run_until_caught_up() == 10
        c2 = FileTopicConsumer(spark, topic, "g", make_sink(spark, tmp_path, "b"))
        assert c2.run_until_caught_up() == 0

    def test_committed_offsets_no_loss(self, spark, tmp_path):
        """Produce 10, consume, produce 10 more: second run reads
        exactly the new 10 — no off-by-one loss or redelivery at the
        commit boundary (ref: 'Committed offsets should not result in
        missing messages')."""
        topic = FileTopic(str(tmp_path / "t"), n_partitions=2)
        fill(topic, 1, 10)
        sink = make_sink(spark, tmp_path)
        consumer = FileTopicConsumer(spark, topic, "g", sink)
        assert consumer.run_until_caught_up() == 10
        fill(topic, 1, 10)  # same keys: appends messageIds 0..9 again
        assert consumer.run_until_caught_up() == 10

    def test_failed_batch_redelivers_then_dedups(self, spark, tmp_path):
        """Handler failure leaves offsets uncommitted; the retry
        redelivers the batch and the write-pos dedup passes it through
        once the handler recovers (at-least-once + idempotent sink)."""
        topic = FileTopic(str(tmp_path / "t"), n_partitions=2)
        fill(topic, 1, 10)
        fails = {"armed": True}
        path = str(tmp_path / "flaky")

        def flaky(stream, events):
            import os

            if not os.path.exists(path):  # executor-visible tripwire
                raise RuntimeError("transient")
            return "ok", int(events["idx"].iloc[-1]) + 1

        sink = make_sink(spark, tmp_path, "f", flaky)
        consumer = FileTopicConsumer(spark, topic, "g", sink)
        assert consumer.run_once() is True  # processed, failed, uncommitted
        assert consumer.consumed_events == 0
        assert topic.committed("g") == {0: 0, 1: 0}
        with open(path, "w") as f:
            f.write("recover")
        assert consumer.run_until_caught_up() == 10
        assert topic.committed("g")[0] + topic.committed("g")[1] == 10

    def test_max_records_backpressure(self, spark, tmp_path):
        """maxOffsetsPerTrigger analog: bounded polls still consume
        everything across rounds, commits advancing monotonically."""
        topic = FileTopic(str(tmp_path / "t"), n_partitions=2)
        fill(topic, 2, 20)
        sink = make_sink(spark, tmp_path)
        consumer = FileTopicConsumer(
            spark, topic, "g", sink, max_records_per_partition=7
        )
        assert consumer.run_until_caught_up() == 40
        assert consumer.batches > 1  # genuinely chunked


class TestProducerPath:
    def test_render_produce_consume_parse_roundtrip(self, spark, tmp_path):
        """Envelope → RenderedSpan JSON → keyed producer → poll →
        parse: the consumer sees the exact event set, and every span of
        a stream lands on one partition (ordering survives)."""
        topic = FileTopic(str(tmp_path / "t"), n_partitions=4)
        rows = [
            ("Cart-1", "Cart", i, "Added", f'{{"n":{i}}}', None, None, None, False, 8)
            for i in range(5)
        ] + [
            ("Cart-2", "Cart", i, "Added", f'{{"n":{i}}}', None, None, None, False, 8)
            for i in range(3)
        ]
        env = spark.createDataFrame(
            rows,
            "stream_name string, category string, idx long, event_type string, "
            "data string, meta string, event_id long, ts timestamp, "
            "is_unfold boolean, size long",
        )
        n = produce_rendered(render_spans(env), topic)
        assert n == 2  # one contiguous span per stream

        polled = topic.poll(spark, "g")
        # same-key-same-partition: per stream exactly one partition
        parts = (
            polled.select(F.col("key").cast("string").alias("k"), "partition")
            .distinct()
            .groupBy("k")
            .count()
            .collect()
        )
        assert all(r["count"] == 1 for r in parts)

        back = parse_rendered_spans(
            polled.select(F.col("value").cast("string").alias("value"))
        )
        got = {
            (r.stream_name, r.idx, r.event_type, r.data)
            for r in back.collect()
        }
        want = {(r[0], r[2], r[3], r[4]) for r in rows}
        assert got == want
