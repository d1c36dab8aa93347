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


class TestNativeFakeKafkaSource:
    """r10: the fake broker as a native Spark DataSource — offsets ride
    Spark's OWN offset/commit log (the in-sandbox stand-in for the real
    connector's resume-from-committed integration scenarios)."""

    FMT = "propulsion-kafka-fake"

    def _register(self, spark):
        from propulsion_spark.sources.kafka_fake import register_fake_kafka

        register_fake_kafka(spark)

    def test_batch_read_snapshot(self, spark, tmp_path):
        self._register(spark)
        topic = FileTopic(str(tmp_path / "t"))
        fill(topic, n_producers=2, per_producer=10)
        df = spark.read.format(self.FMT).option("path", topic.path).load()
        rows = df.collect()
        assert len(rows) == 20
        # wire shape: keyed records land on their key-hash partition
        by_key = {}
        for r in rows:
            by_key.setdefault(bytes(r.key).decode(), set()).add(r.partition)
        assert all(len(ps) == 1 for ps in by_key.values())
        # offsets are dense per partition
        by_part = {}
        for r in rows:
            by_part.setdefault(r.partition, []).append(r.offset)
        for offs in by_part.values():
            assert sorted(offs) == list(range(len(offs)))

    def test_stream_restart_resumes_from_sparks_commit_log(
        self, spark, tmp_path
    ):
        """Stop the query, produce more, restart with the SAME
        checkpoint: every message is served exactly once across the two
        runs — no loss, no redelivery."""
        self._register(spark)
        topic = FileTopic(str(tmp_path / "t"))
        fill(topic, n_producers=3, per_producer=10)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def start():
            return (
                spark.readStream.format(self.FMT)
                .option("path", topic.path)
                .load()
                .selectExpr(
                    "cast(key as string) AS k",
                    "cast(value as string) AS v",
                    "partition",
                    "offset",
                )
                .writeStream.format("parquet")
                .option("path", out)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .start()
            )

        q = start()
        q.processAllAvailable()
        q.stop()
        assert spark.read.parquet(out).count() == 30
        fill(topic, n_producers=3, per_producer=5)  # 15 more
        q = start()
        q.processAllAvailable()
        q.stop()
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 45  # resumed, not re-read
        assert len({(r.partition, r.offset) for r in rows}) == 45  # no dupes
        msgs = sorted(
            (r.k, json.loads(r.v)["messageId"]) for r in rows
        )
        want = sorted(
            (f"Producer-{p}", i)
            for p in range(3)
            for i in list(range(10)) + list(range(5))  # both fill waves
        )
        assert msgs == want  # no loss

    def test_max_records_per_trigger_paces_batches(self, spark, tmp_path):
        """Admission control paces from the reader's learned base. The
        FIRST planned batch of a reader instance is unthrottled (the
        Python DataSource API gives the reader no restart-offset hook —
        same documented contract as the store-CDC source); every batch
        after it honors maxRecordsPerTrigger."""
        import uuid as _uuid

        self._register(spark)
        topic = FileTopic(str(tmp_path / "t"), n_partitions=2)
        for i in range(3):
            topic.produce("only-key", json.dumps({"i": i}))  # one partition
        name = f"kfk_{_uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.format(self.FMT)
            .option("path", topic.path)
            .option("partitions", "2")
            .option("maxRecordsPerTrigger", "5")
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()  # batch 0 drains the 3 (base learned)
        for i in range(12):  # second wave: must pace at 5/trigger
            topic.produce("only-key", json.dumps({"i": 3 + i}))
        q.processAllAvailable()
        q.stop()
        assert spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c == 15
        sizes = [p["numInputRows"] for p in q.recentProgress]
        paced = [s for s in sizes if s > 0][1:]  # after the first batch
        assert paced and max(paced) <= 5 and sum(paced) == 12
