"""Idempotent position-based event writer — the CosmosStoreSink analog
(SURVEY.md §2.4 W1; ref: src/Propulsion.CosmosStore/CosmosStoreSink.fs:40-120).

Semantics per stream span: given the stream's stored tail position,

- span starts exactly at tail            → **Ok(new_pos)** — append
- span entirely below tail               → **Duplicate** — no-op
- span straddles tail                    → **PartialDuplicate** — append
  the novel suffix only
- span starts above tail (gap)           → **PrefixMissing** — reject,
  report the gap

Storage is a versioned parquet table keyed ``(stream_name, idx)``
(MVCC pointer-flip like :class:`PositionsTable`; Delta MERGE on a
cluster). The conflict resolution is computed set-wise in one Spark
job per batch — anti-join against current tails — never row-at-a-time.

The pruner (W2 analog, ref: CosmosStorePruner.fs:9-84) deletes events
at or below a requested index per stream.
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propulsion_spark.streaming.sinks import OutcomeKind


class EventStoreTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._retired: list[str] = []
        self._write_lock = threading.Lock()  # serialize read-modify-write commits
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def _manifest(self) -> list[str]:
        """Segment list of the current version (Delta-log style: appends
        add a segment, maintenance ops replace the whole list)."""
        import json

        try:
            with open(self._pointer) as f:
                raw = f.read().strip()
            return json.loads(raw) if raw else []
        except FileNotFoundError:
            return []

    def _flip(self, segments: list[str]) -> None:
        import json

        old = [s for s in self._manifest() if s not in segments]
        tmp = self._pointer + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(segments))
        os.replace(tmp, self._pointer)
        for stale in self._retired:
            shutil.rmtree(os.path.join(self.path, stale), ignore_errors=True)
        self._retired = old

    def read(self) -> DataFrame:
        segs = self._manifest()
        if not segs:
            from propulsion_spark.envelope import STREAM_EVENT_SCHEMA

            return self.spark.createDataFrame([], STREAM_EVENT_SCHEMA)
        return self.spark.read.parquet(*[os.path.join(self.path, s) for s in segs])

    def _commit(self, df: DataFrame) -> None:
        """Full rewrite (maintenance ops: prune, unfold compaction)."""
        version = f"v-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, version))
        self._flip([version])

    def _commit_append(self, novel: DataFrame) -> None:
        """Append one segment — O(batch), not O(table): the Delta-append
        shape; conflict classification happened before this call."""
        seg = f"seg-{uuid.uuid4().hex}"
        novel.write.mode("overwrite").parquet(os.path.join(self.path, seg))
        self._flip(self._manifest() + [seg])

    # ---- the idempotent writer (W1) --------------------------------------
    def sync(self, batch: DataFrame) -> DataFrame:
        """Write a batch of envelope rows idempotently; returns the outcome
        table: (stream_name, outcome, prev_tail, new_tail, appended)."""
        with self._write_lock:
            return self._sync_locked(batch)

    def _sync_locked(self, batch: DataFrame) -> DataFrame:
        current = self.read()
        tails = current.groupBy("stream_name").agg(
            (F.max("idx") + 1).alias("tail")
        )
        span = batch.groupBy("stream_name").agg(
            F.min("idx").alias("span_lo"), (F.max("idx") + 1).alias("span_hi")
        )
        verdict = (
            span.join(tails, "stream_name", "left")
            .withColumn("tail", F.coalesce(F.col("tail"), F.lit(0)))
            .withColumn(
                "outcome",
                F.when(F.col("span_hi") <= F.col("tail"), OutcomeKind.DUPLICATE)
                .when(F.col("span_lo") > F.col("tail"), OutcomeKind.PREFIX_MISSING)
                .when(F.col("span_lo") < F.col("tail"), OutcomeKind.PARTIAL_DUPLICATE)
                .otherwise(OutcomeKind.OK),
            )
        )
        writable = verdict.filter(
            F.col("outcome").isin(OutcomeKind.OK, OutcomeKind.PARTIAL_DUPLICATE)
        ).select("stream_name", "tail")
        novel = (
            batch.join(F.broadcast(writable), "stream_name")
            .filter(F.col("idx") >= F.col("tail"))
            .drop("tail")
        )
        appended = novel.groupBy("stream_name").agg(
            F.count("*").alias("appended"), (F.max("idx") + 1).alias("new_tail")
        )
        appended = appended.cache()
        if appended.count() > 0:  # full-duplicate batches append nothing
            self._commit_append(novel.select(*current.columns))
        return (
            verdict.join(appended, "stream_name", "left")
            .select(
                "stream_name",
                "outcome",
                F.col("tail").alias("prev_tail"),
                F.coalesce(F.col("new_tail"), F.col("tail")).alias("new_tail"),
                F.coalesce(F.col("appended"), F.lit(0)).alias("appended"),
            )
        )

    # ---- the pruner (W2) ---------------------------------------------------
    def prune(self, requests: DataFrame) -> DataFrame:
        """Delete events with ``idx <= until_idx`` per stream.
        ``requests``: (stream_name, until_idx). Returns
        (stream_name, deleted, remaining)."""
        with self._write_lock:
            return self._prune_locked(requests)

    def _prune_locked(self, requests: DataFrame) -> DataFrame:
        current = self.read()
        tagged = current.join(F.broadcast(requests), "stream_name", "left")
        survivors = tagged.filter(
            F.col("until_idx").isNull() | (F.col("idx") > F.col("until_idx"))
        ).drop("until_idx")
        report = (
            current.join(F.broadcast(requests), "stream_name")
            .groupBy("stream_name")
            .agg(
                F.sum((F.col("idx") <= F.col("until_idx")).cast("long")).alias(
                    "deleted"
                ),
                F.sum((F.col("idx") > F.col("until_idx")).cast("long")).alias(
                    "remaining"
                ),
            )
        )
        report = report.cache()
        report.count()
        self._commit(survivors.select(*current.columns))
        return report

    def unfold_compact(self) -> None:
        """Keep only the freshest unfold set per (stream, event_type)
        (ref: Streams.fs:143-147) — run opportunistically."""
        with self._write_lock:
            current = self.read()
            w = Window.partitionBy("stream_name", "event_type").orderBy(
                F.col("idx").desc()
            )
            events = current.filter(~F.col("is_unfold"))
            unfolds = (
                current.filter(F.col("is_unfold"))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
            self._commit(events.unionByName(unfolds))
