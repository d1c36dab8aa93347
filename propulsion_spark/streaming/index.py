"""CDC span index — the DynamoStore-index subsystem re-expressed
(SURVEY.md §2.1 S2, §2.4 W7, §2.3 F9/F10; ref:
src/Propulsion.DynamoStore/AppendsEpoch.fs:33-112, AppendsIndex.fs,
DynamoStoreIndexer.fs, ExactlyOnceIngester.fs:12-66).

The index records *which spans were appended to which streams*, in
closed **epochs** (ref cap 1,000,000 items/epoch, Types.fs:32-34), so
consumers can tail "what changed" without scanning the store. Ingestion
is exactly-once: incoming spans are classified against per-stream
high-watermarks —

- entirely below the watermark → **Discard** (duplicate index write)
- straddling → **Append** truncated to the novel suffix
- starting exactly at the watermark → **Append**
- starting above (missing predecessor) → **Gap** — rejected & reported
  (ref: DynamoStoreIndex gap flagging, F9)

Checkpoints across the epoch chain encode ``epoch * 1_000_000 + offset``
(ref: Types.fs:32-50).

Storage is the same MVCC parquet-version pattern as PositionsTable
(Delta table on a cluster). Classification is one set-wise Spark job
per batch: groupBy + broadcast watermark join — never per-row loops.
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("stream_name", T.StringType(), False),
        T.StructField("span_lo", T.LongType(), False),
        T.StructField("span_hi", T.LongType(), False),  # exclusive
        T.StructField("n_items", T.LongType(), False),
    ]
)

EPOCH_POSITION_FACTOR = 1_000_000


def encode_checkpoint(epoch: int, offset: int) -> int:
    """ref: src/Propulsion.DynamoStore/Types.fs:32-50."""
    assert offset < EPOCH_POSITION_FACTOR
    return epoch * EPOCH_POSITION_FACTOR + offset


def decode_checkpoint(pos: int) -> tuple[int, int]:
    return pos // EPOCH_POSITION_FACTOR, pos % EPOCH_POSITION_FACTOR


class AppendsIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        max_items_per_epoch: int = 1_000_000,
    ):
        self.spark = spark
        self.path = path
        self.max_items_per_epoch = max_items_per_epoch
        self._retired: list[str] = []
        self._write_lock = threading.Lock()  # serialize read-modify-write commits
        os.makedirs(path, exist_ok=True)

    # ---- storage (MVCC pointer) -----------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def _current_version(self) -> str | None:
        try:
            with open(self._pointer) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def read(self) -> DataFrame:
        v = self._current_version()
        if v is None:
            return self.spark.createDataFrame([], INDEX_SCHEMA)
        return self.spark.read.parquet(os.path.join(self.path, v))

    def _commit(self, df: DataFrame) -> None:
        version = f"v-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, version))
        old = self._current_version()
        tmp = self._pointer + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer)
        for stale in self._retired:
            shutil.rmtree(os.path.join(self.path, stale), ignore_errors=True)
        self._retired = [old] if old else []

    # ---- derived state -----------------------------------------------------
    def watermarks(self) -> DataFrame:
        """Per-stream high-watermark = max indexed span_hi (ref:
        AppendsEpoch.flatten high-watermark fold, :44-58)."""
        return self.read().groupBy("stream_name").agg(
            F.max("span_hi").alias("watermark")
        )

    def active_epoch(self) -> tuple[int, int]:
        """(epoch id, items already in it). Epochs close at the cap
        (ref: MaxItemsPerEpoch)."""
        row = (
            self.read()
            .groupBy()
            .agg(F.max("epoch").alias("e"))
            .collect()[0]
        )
        if row.e is None:
            return 0, 0
        items = (
            self.read()
            .filter(F.col("epoch") == row.e)
            .agg(F.sum("n_items").alias("n"))
            .collect()[0]
            .n
        )
        return int(row.e), int(items or 0)

    def tail_checkpoint(self) -> int:
        epoch, items = self.active_epoch()
        return encode_checkpoint(epoch, min(items, EPOCH_POSITION_FACTOR - 1))

    # ---- exactly-once ingestion (W7/F10) -------------------------------------
    def ingest(self, spans: DataFrame) -> DataFrame:
        """Classify & append a batch of spans. ``spans`` columns:
        (stream_name, span_lo, span_hi). Returns the report:
        (stream_name, verdict ∈ appended|discarded|gap, lo, hi, appended_lo).
        Re-ingesting the same batch is a no-op (exactly-once,
        ref: ExactlyOnceIngester.fs:12-66)."""
        with self._write_lock:
            return self._ingest_locked(spans)

    def _ingest_locked(self, spans: DataFrame) -> DataFrame:
        batch = spans.groupBy("stream_name").agg(
            F.min("span_lo").alias("lo"), F.max("span_hi").alias("hi")
        )
        wm = self.watermarks()
        classified = (
            # unhinted (r15): the watermark table is O(streams the
            # index has EVER seen) — 10^8 at crawl scale — while the
            # left side is one batch's aggregate; AQE broadcasts wm
            # while small and falls back to a shuffle join past the
            # threshold instead of force-collecting the store's whole
            # stream set
            batch.join(wm, "stream_name", "left")
            .withColumn("watermark", F.coalesce(F.col("watermark"), F.lit(0)))
            .withColumn(
                "verdict",
                F.when(F.col("hi") <= F.col("watermark"), "discarded")
                .when(F.col("lo") > F.col("watermark"), "gap")
                .otherwise("appended"),
            )
            .withColumn(
                "appended_lo",
                F.when(
                    F.col("verdict") == "appended",
                    F.greatest(F.col("lo"), F.col("watermark")),
                ),
            )
        )
        classified = classified.cache()
        classified.count()
        epoch, items = self.active_epoch()
        if items >= self.max_items_per_epoch:
            epoch, items = epoch + 1, 0
        novel = classified.filter(F.col("verdict") == "appended").select(
            F.lit(epoch).alias("epoch"),
            "stream_name",
            F.col("appended_lo").alias("span_lo"),
            F.col("hi").alias("span_hi"),
            (F.col("hi") - F.col("appended_lo")).alias("n_items"),
        )
        self._commit(self.read().unionByName(novel))
        report = classified.select(
            "stream_name", "verdict", "lo", "hi", "appended_lo"
        )
        classified.unpersist()
        return report

    def ingest_from_outcomes(self, outcomes: DataFrame) -> DataFrame:
        """Index the spans a StreamsSink just processed (the indexer-sink
        wiring, ref: DynamoStoreIndexer.fs:1-46)."""
        spans = outcomes.filter(F.col("pos") > F.col("prev_pos")).select(
            "stream_name",
            F.col("prev_pos").alias("span_lo"),
            F.col("pos").alias("span_hi"),
        )
        return self.ingest(spans)

    # ---- index-driven source (S2) ---------------------------------------------
    def epoch_page(self, epoch: int, event_store=None) -> DataFrame | None:
        """One epoch's spans, optionally hydrated with event bodies from
        the store (EventLoadMode.IndexOnly vs WithData, ref:
        DynamoStoreSource.fs:114-144). Hydration is a distributed join
        on (stream, idx-range) — parallelism is task-level, the
        ``loadDop`` analog."""
        spans = self.read().filter(F.col("epoch") == epoch)
        if event_store is None:
            return spans
        events = event_store.read()
        return (
            events.join(
                F.broadcast(spans.select("stream_name", "span_lo", "span_hi")),
                "stream_name",
            )
            .filter(
                (F.col("idx") >= F.col("span_lo")) & (F.col("idx") < F.col("span_hi"))
            )
            .drop("span_lo", "span_hi")
        )


def index_source(
    spark: SparkSession,
    index: AppendsIndex,
    sink,
    checkpoints,
    event_store=None,
    source_id: str = "index",
    stop_at_tail: bool = True,
):
    """Feed over the epoch chain: page = epoch, position = epoch id
    (the DynamoStoreSource shape, S2)."""
    from propulsion_spark.sources.feed import Batch, FeedSource, SinglePassFeedSource

    def read_page(tranche: str, pos: int) -> Batch:
        last_epoch, _ = index.active_epoch()
        if pos > last_epoch:
            return Batch(items=None, checkpoint=pos, is_tail=True)
        has_rows = index.read().filter(F.col("epoch") == pos).limit(1).count() > 0
        items = index.epoch_page(pos, event_store) if has_rows else None
        return Batch(items=items, checkpoint=pos + 1, is_tail=pos >= last_epoch)

    cls = SinglePassFeedSource if stop_at_tail else FeedSource
    return cls(
        spark, lambda: ["0"], read_page, sink, checkpoints, source_id=source_id
    )
