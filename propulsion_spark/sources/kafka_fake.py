"""File-backed Kafka topic stand-in (SURVEY.md §2.1 S6, §2.4 W4-W6).

No broker (or kafka connector jars) ship in this environment, so the
real wiring in :mod:`propulsion_spark.sources.kafka` cannot run live.
This module provides the minimal broker contract that wiring depends on
— a partitioned, offset-addressed, append-only log with per-consumer-
group committed offsets — so the full consumer/producer code paths
(``kafka_messages_to_envelope`` key→StreamName mapping, the synthetic
per-stream index generator, span render/parse codecs, commit-after-
processing offset semantics, key-hash partition affinity) are exercised
end-to-end, mirroring the reference's broker-backed integration
scenarios (ref: tests/Propulsion.Kafka.Integration/
ConsumersIntegration.fs:206-370 — basic round-trip, consumer-group
isolation, committed offsets neither redeliver nor lose messages).

Scope note: ``produce``/``poll`` move records through the driver — fine
for a test double standing in for a broker (the reference's integration
suite likewise produces from the test process). The production path at
scale is the connector-backed ``kafka_stream``/``kafka_producer_sink``;
both consume/produce the exact (key, value, topic, partition, offset,
timestamp) shape this fake emits.
"""

from __future__ import annotations

import json
import os
import time
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from propulsion_spark.sources.kafka import kafka_messages_to_envelope
from propulsion_spark.streaming.sinks import OutcomeKind

# the Kafka wire shape (what the DSv2 connector's load() yields)
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
    ]
)


class FileTopic:
    """A partitioned append-only log with consumer-group offsets.

    - ``produce`` appends to the partition chosen by key hash (same
      key → same partition → per-stream ordering, the property the
      reference's producers rely on; the hash is crc32, not Kafka's
      murmur2 — contract-compatible, not wire-compatible).
    - ``poll`` returns records at-or-after the group's committed
      offsets in Kafka wire shape.
    - ``commit`` stores next-offset-to-read per partition (Kafka's
      StoreOffset(highWaterMark+1) convention — the off-by-one the
      reference's "Committed offsets should not result in missing
      messages" scenario pins down).
    """

    def __init__(self, path: str, name: str = "topic", n_partitions: int = 4):
        self.path = path
        self.name = name
        self.n_partitions = n_partitions
        os.makedirs(os.path.join(path, "_groups"), exist_ok=True)
        self._ends: dict[int, int] = {
            p: self._count_lines(self._part_path(p)) for p in range(n_partitions)
        }

    def _part_path(self, p: int) -> str:
        return os.path.join(self.path, f"p{p}.jsonl")

    @staticmethod
    def _count_lines(path: str) -> int:
        try:
            with open(path) as f:
                return sum(1 for _ in f)
        except FileNotFoundError:
            return 0

    def partition_for(self, key: str | None) -> int:
        if key is None:
            return 0
        return zlib.crc32(key.encode()) % self.n_partitions

    # ---- producing --------------------------------------------------------
    def produce(self, key: str | None, value: str, ts: float | None = None) -> None:
        p = self.partition_for(key)
        rec = {
            "offset": self._ends[p],
            "key": key,
            "value": value,
            "ts": ts if ts is not None else time.time(),
        }
        with open(self._part_path(p), "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._ends[p] += 1

    def produce_many(self, records: "list[tuple[str | None, str]]") -> None:
        for key, value in records:
            self.produce(key, value)

    # ---- offsets ----------------------------------------------------------
    def end_offsets(self) -> dict[int, int]:
        return dict(self._ends)

    def _group_path(self, group: str) -> str:
        return os.path.join(self.path, "_groups", f"{group}.json")

    def committed(self, group: str) -> dict[int, int]:
        try:
            with open(self._group_path(group)) as f:
                return {int(k): v for k, v in json.load(f).items()}
        except FileNotFoundError:
            return {p: 0 for p in range(self.n_partitions)}

    def commit(self, group: str, offsets: dict[int, int]) -> None:
        cur = self.committed(group)
        cur.update(offsets)
        tmp = self._group_path(group) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cur, f)
        os.replace(tmp, self._group_path(group))

    # ---- consuming --------------------------------------------------------
    def poll(
        self,
        spark: SparkSession,
        group: str,
        max_records_per_partition: int | None = None,
    ) -> DataFrame:
        """Uncommitted records for ``group``, in Kafka wire shape."""
        from datetime import datetime, timezone

        start = self.committed(group)
        rows = []
        for p in range(self.n_partitions):
            lo = start.get(p, 0)
            if self._ends[p] <= lo:
                continue
            with open(self._part_path(p)) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["offset"] < lo:
                        continue
                    if (
                        max_records_per_partition is not None
                        and rec["offset"] >= lo + max_records_per_partition
                    ):
                        break
                    rows.append(
                        (
                            rec["key"].encode() if rec["key"] is not None else None,
                            rec["value"].encode(),
                            self.name,
                            p,
                            rec["offset"],
                            datetime.fromtimestamp(rec["ts"], tz=timezone.utc),
                        )
                    )
        return spark.createDataFrame(rows, MESSAGE_SCHEMA)


class FileTopicConsumer:
    """The consumer pump: poll → envelope mapping → sink →
    commit-after-processing (ref: Consumers.fs:97-125 StoreOffset after
    handler completion — at-least-once; a batch with failed handler
    outcomes is NOT committed and redelivers, the sink's write-pos
    dedup absorbing the replayed prefix)."""

    def __init__(
        self,
        spark: SparkSession,
        topic: FileTopic,
        group: str,
        sink,
        default_category: str = "kafka",
        max_records_per_partition: int | None = None,
    ):
        self.spark = spark
        self.topic = topic
        self.group = group
        self.sink = sink
        self.default_category = default_category
        self.max_records = max_records_per_partition
        self.consumed_events = 0
        self.batches = 0

    def run_once(self) -> bool:
        """One poll/process/commit cycle; False when caught up."""
        batch = self.topic.poll(self.spark, self.group, self.max_records)
        msgs = batch.cache()
        try:
            bounds = msgs.groupBy("partition").agg(
                (F.max("offset") + 1).alias("next_offset")
            ).collect()
            if not bounds:
                return False
            envelope = kafka_messages_to_envelope(
                msgs,
                self.default_category,
                base_positions=self.sink.positions.read(),
            )
            outcomes = self.sink.process_batch(envelope)
            failed = outcomes.filter(
                F.col("outcome").isin(
                    OutcomeKind.EXN, OutcomeKind.TIMEOUT, OutcomeKind.RATE_LIMITED
                )
            ).count()
            if failed:
                return True  # uncommitted: the whole batch redelivers
            self.consumed_events += sum(
                r.n_events for r in outcomes.select("n_events").collect()
            )
            self.batches += 1
            self.topic.commit(
                self.group, {r.partition: r.next_offset for r in bounds}
            )
            return True
        finally:
            msgs.unpersist()

    def run_until_caught_up(self, max_rounds: int = 1000) -> int:
        """Pump until no uncommitted records remain; returns events
        consumed this run."""
        before = self.consumed_events
        for _ in range(max_rounds):
            if not self.run_once():
                break
        return self.consumed_events - before


# ------------------------------------------------- native Spark source
# The fake broker as a first-class Spark format, mirroring
# StoreCdcDataSource: ``spark.readStream.format("propulsion-kafka-fake")
# .option("path", topic_dir)`` consumes the partitioned log with offsets
# riding Spark's OWN offset/commit log — the closest in-sandbox
# stand-in for the real Kafka connector's integration surface
# (ref: tests/Propulsion.Kafka.Integration/ConsumersIntegration.fs:
# 206-370 — resume-from-committed semantics), so restart/resume,
# back-pressure (maxRecordsPerTrigger), and parallel per-partition
# reads are exercised through Spark's native streaming machinery
# instead of the driver-side poll loop above.
try:  # PySpark ≥ 4.0 — gate so older runtimes keep the poll-loop path
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    _MESSAGE_DDL = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in MESSAGE_SCHEMA.fields
    )

    class _TopicRange(InputPartition):
        def __init__(self, path: str, name: str, p: int, lo: int, hi: int):
            self.path = path
            self.name = name
            self.p = p
            self.lo = lo
            self.hi = hi

    def _n_partitions(path: str, default: int) -> int:
        import re

        found = [
            int(m.group(1))
            for f in os.listdir(path)
            if (m := re.fullmatch(r"p(\d+)\.jsonl", f))
        ]
        return max(default, max(found) + 1 if found else 0)

    def _read_range_arrow(part: "_TopicRange"):
        """Executor-side read of one partition's [lo, hi) offset range
        as Arrow batches in the Kafka wire shape."""
        import pyarrow as pa

        if part.hi <= part.lo:
            return iter(())
        keys, values, parts_, offs, tss = [], [], [], [], []
        try:
            fh = open(os.path.join(part.path, f"p{part.p}.jsonl"))
        except FileNotFoundError:
            return iter(())
        with fh:
            for line in fh:
                rec = json.loads(line)
                if rec["offset"] < part.lo:
                    continue
                if rec["offset"] >= part.hi:
                    break
                keys.append(
                    rec["key"].encode() if rec["key"] is not None else None
                )
                values.append(rec["value"].encode())
                parts_.append(part.p)
                offs.append(rec["offset"])
                tss.append(int(rec["ts"] * 1_000_000))
        batch = pa.record_batch(
            [
                pa.array(keys, pa.binary()),
                pa.array(values, pa.binary()),
                pa.array([part.name] * len(offs), pa.string()),
                pa.array(parts_, pa.int32()),
                pa.array(offs, pa.int64()),
                pa.array(tss, pa.timestamp("us")),
            ],
            names=["key", "value", "topic", "partition", "offset", "timestamp"],
        )
        return iter([batch])

    class _FakeKafkaStreamReader(DataSourceStreamReader):
        """Offsets are {partition: next-offset-to-read} dicts — exactly
        the connector's startingOffsets shape — persisted by Spark's
        checkpoint; commit() is a no-op because Spark's own commit log
        is the source of truth (the point of the exercise)."""

        def __init__(self, options: dict):
            self.path = options["path"]
            self.name = options.get("name", "topic")
            self.default_parts = int(options.get("partitions", 4))
            self.max_records = int(options.get("maxrecordspertrigger", 1 << 30))
            self._last: "dict[str, int] | None" = None

        def _ends(self) -> "dict[str, int]":
            n = _n_partitions(self.path, self.default_parts)
            ends = {}
            for p in range(n):
                try:
                    with open(os.path.join(self.path, f"p{p}.jsonl")) as f:
                        ends[str(p)] = sum(1 for _ in f)
                except FileNotFoundError:
                    ends[str(p)] = 0
            return ends

        def initialOffset(self) -> dict:
            start = {str(p): 0 for p in range(
                _n_partitions(self.path, self.default_parts)
            )}
            self._last = dict(start)
            return start

        def latestOffset(self) -> dict:
            ends = self._ends()
            if self._last is not None:
                # admission control per partition, from the newest
                # offset THIS READER planned (post-restart the first
                # batch is unthrottled — same contract and rationale as
                # _StoreCdcStreamReader.latestOffset)
                ends = {
                    p: max(
                        min(end, self._last.get(p, 0) + self.max_records),
                        self._last.get(p, 0),
                    )
                    for p, end in ends.items()
                }
            self._last = dict(ends)
            return ends

        def partitions(self, start: dict, end: dict):
            self._last = {
                p: max((self._last or {}).get(p, 0), int(v))
                for p, v in end.items()
            }
            parts = [
                _TopicRange(self.path, self.name, int(p), int(start.get(p, 0)), int(hi))
                for p, hi in end.items()
                if int(hi) > int(start.get(p, 0))
            ]
            # Spark requires ≥1 partition; an empty batch reads nothing
            return parts or [_TopicRange(self.path, self.name, 0, 0, 0)]

        def read(self, partition):  # executes on Python workers
            return _read_range_arrow(partition)

        def commit(self, end: dict) -> None:
            pass  # Spark's commit log is authoritative

    class _FakeKafkaSnapshotReader(DataSourceReader):
        """Batch face: the whole topic as of now."""

        def __init__(self, options: dict):
            self.path = options["path"]
            self.name = options.get("name", "topic")
            self.default_parts = int(options.get("partitions", 4))

        def partitions(self):
            n = _n_partitions(self.path, self.default_parts)
            parts = []
            for p in range(n):
                try:
                    with open(os.path.join(self.path, f"p{p}.jsonl")) as f:
                        hi = sum(1 for _ in f)
                except FileNotFoundError:
                    hi = 0
                parts.append(_TopicRange(self.path, self.name, p, 0, hi))
            return parts or [_TopicRange(self.path, self.name, 0, 0, 0)]

        def read(self, partition):
            return _read_range_arrow(partition)

    class FakeKafkaDataSource(DataSource):
        """The file-backed broker as a Spark format. Options: ``path``
        (topic dir, required), ``name`` (topic name), ``partitions``
        (partition count for empty topics), streaming only:
        ``maxRecordsPerTrigger`` (per-partition admission control)."""

        @classmethod
        def name(cls) -> str:
            return "propulsion-kafka-fake"

        def schema(self) -> str:
            return _MESSAGE_DDL

        def reader(self, schema):
            return _FakeKafkaSnapshotReader(
                {k.lower(): v for k, v in self.options.items()}
            )

        def streamReader(self, schema):
            return _FakeKafkaStreamReader(
                {k.lower(): v for k, v in self.options.items()}
            )

    def register_fake_kafka(spark: SparkSession) -> None:
        """Register the native source with this session (idempotent)."""
        spark.dataSource.register(FakeKafkaDataSource)

except ImportError:  # pragma: no cover — PySpark < 4.0

    FakeKafkaDataSource = None

    def register_fake_kafka(spark: SparkSession) -> None:
        raise NotImplementedError(
            "the native fake-kafka source needs the PySpark DataSource "
            "API (Spark >= 4.0); use FileTopicConsumer instead"
        )


def produce_rendered(rendered: DataFrame, topic: FileTopic) -> int:
    """The StreamsProducerSink analog against the fake (ref:
    ProducerSinks.fs:15-45): one message per rendered span, keyed by
    stream so ordering per stream survives partitioning. Driver-side
    iteration is the test double's liberty; the connector path is
    kafka_producer_sink. Returns messages produced."""
    n = 0
    for row in rendered.select("key", "value").toLocalIterator():
        topic.produce(row.key, row.value)
        n += 1
    return n
