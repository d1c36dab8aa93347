"""Per-stream write-position table — the durable face of the
scheduler's StreamStates (SURVEY.md §2.2 P7; ref:
src/Propulsion/Streams.fs:327-431).

One row per stream: ``(stream_name, pos, revision, malformed)``.
Unlike the consumer-group checkpoint store (one row per tranche), this
table scales with stream count, so it is maintained *distributed*: the
merge of new handler outcomes is a Spark job (union → groupBy max), and
each merge commits a new immutable version directory with an atomic
pointer flip — MVCC-by-hand, the moral equivalent of a Delta MERGE
(which replaces this class on a cluster with Delta available).

Reads are served from the current version: a plain parquet scan,
broadcast-joined against incoming micro-batches for dedup.
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

POSITIONS_SCHEMA = T.StructType(
    [
        T.StructField("stream_name", T.StringType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("revision", T.LongType(), False),
        T.StructField("malformed", T.BooleanType(), False),
    ]
)


class PositionsTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._retired: list[str] = []  # keep one generation for in-flight readers
        # Concurrent feed tranches share one sink: the read-union-flip
        # below is a read-modify-write, so merges must serialize (the
        # role Delta's optimistic-concurrency MERGE plays on a cluster).
        self._write_lock = threading.Lock()
        os.makedirs(path, exist_ok=True)

    # ---- version pointer ------------------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def _current_version(self) -> str | None:
        try:
            with open(self._pointer) as f:
                v = f.read().strip()
            return v or None
        except FileNotFoundError:
            return None

    def _flip(self, version: str) -> None:
        tmp = self._pointer + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer)

    # ---- reads -----------------------------------------------------------
    def read(self) -> DataFrame:
        v = self._current_version()
        if v is None:
            return self.spark.createDataFrame([], POSITIONS_SCHEMA)
        return self.spark.read.parquet(os.path.join(self.path, v))

    # ---- merge (the MERGE-upsert analog) ----------------------------------
    def merge(self, updates: DataFrame) -> None:
        """Upsert handler outcomes: write positions only advance
        (monotonic, ref: Streams.fs:338-346), revisions take the max,
        malformed is sticky until an explicit reset.

        ``updates`` columns: stream_name, pos, revision, malformed.
        """
        with self._write_lock:
            merged = (
                self.read()
                .unionByName(
                    updates.select(*[f.name for f in POSITIONS_SCHEMA.fields])
                )
                .groupBy("stream_name")
                .agg(
                    F.max("pos").alias("pos"),
                    F.max("revision").alias("revision"),
                    F.max(F.col("malformed").cast("int"))
                    .cast("boolean")
                    .alias("malformed"),
                )
            )
            self._commit(merged)

    def _commit(self, df: DataFrame) -> None:
        """Write a new immutable version and flip the pointer. The
        previous version is retired lazily (one generation grace) so
        plans still holding it can finish."""
        version = f"v-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, version))
        old = self._current_version()
        self._flip(version)
        for stale in self._retired:
            shutil.rmtree(os.path.join(self.path, stale), ignore_errors=True)
        self._retired = [old] if old else []

    def purge(self, keep_streams: DataFrame | None = None) -> None:
        """Drop state for idle streams (ref purgeInterval semantics,
        Streams.fs:904-913): keep only streams present in
        ``keep_streams`` (single column stream_name)."""
        if keep_streams is None:
            return
        with self._write_lock:
            kept = self.read().join(keep_streams, "stream_name", "left_semi")
            self._commit(kept)
