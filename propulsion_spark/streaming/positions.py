"""Per-stream write-position table — the durable face of the
scheduler's StreamStates (SURVEY.md §2.2 P7; ref:
src/Propulsion/Streams.fs:327-431).

One row per stream: ``(stream_name, pos, revision, malformed)``.
Unlike the consumer-group checkpoint store (one row per tranche), this
table scales with stream count, so it is maintained *distributed* and
**append-then-compact**: each merge writes only the micro-batch's
updates as a small delta segment (O(batch) — never a rewrite of every
stream ever seen), and the segment list is folded into one base segment
every ``compact_after`` merges (amortized O(table / compact_after) per
batch — the same shape as Delta MERGE + OPTIMIZE, which replace this
class on a cluster).

Reads resolve the manifest's base+delta segments with a newest-wins
groupBy (pos/revision monotonic max, malformed sticky) — snapshot-
isolated via the atomic manifest pointer. Cross-driver mutation safety
comes from an on-disk :class:`~propulsion_spark.streaming.mvcc.FileLease`
(two sink replicas sharing a positions path must not interleave
read-modify-write commits), in addition to the in-process lock.
"""

from __future__ import annotations

import os
import threading
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from propulsion_spark.streaming.mvcc import FileLease, JsonManifest

POSITIONS_SCHEMA = T.StructType(
    [
        T.StructField("stream_name", T.StringType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("revision", T.LongType(), False),
        T.StructField("malformed", T.BooleanType(), False),
    ]
)

_COLS = [f.name for f in POSITIONS_SCHEMA.fields]


def _resolve(df: DataFrame) -> DataFrame:
    """Newest-wins fold across base+delta rows: positions/revisions only
    advance (monotonic, ref: Streams.fs:338-346), malformed is sticky."""
    return df.groupBy("stream_name").agg(
        F.max("pos").alias("pos"),
        F.max("revision").alias("revision"),
        F.max(F.col("malformed").cast("int")).cast("boolean").alias("malformed"),
    )


class PositionsTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        compact_after: int = 8,
        lease_ttl_s: float = 30.0,
    ):
        self.spark = spark
        self.path = path
        self.compact_after = compact_after
        self.lease_ttl_s = lease_ttl_s
        self.manifest = JsonManifest(path)
        self._write_lock = threading.Lock()  # in-process writer serialization
        #: cross-commit lease liveness totals (exported as propulsion_lease_*)
        self.lease_counters = {"heartbeats": 0, "steals": 0, "lost": 0}

    @contextmanager
    def _commit(self):
        """One fenced commit scope: in-process lock + on-disk lease, with
        the lease attached to the manifest so every flip inside verifies
        the fencing token (LeaseLostError instead of a silent lost update
        if a peer wrongly judged us stale)."""
        with self._write_lock, FileLease(self.path, ttl_s=self.lease_ttl_s, counters=self.lease_counters) as lease:
            self.manifest.fence = lease
            try:
                yield lease
            finally:
                self.manifest.fence = None

    # ---- reads -----------------------------------------------------------
    def _segments(self) -> list[str]:
        return self.manifest.load([])

    def read(self) -> DataFrame:
        segs = self._segments()
        if not segs:
            return self.spark.createDataFrame([], POSITIONS_SCHEMA)
        raw = self.spark.read.parquet(*[os.path.join(self.path, s) for s in segs])
        return _resolve(raw) if len(segs) > 1 else raw

    # ---- merge (the MERGE-upsert analog) ----------------------------------
    def merge(self, updates: DataFrame, assume_nonempty: bool = False) -> None:
        """Upsert handler outcomes as an O(batch) delta segment; fold the
        log into one base segment every ``compact_after`` merges.

        ``updates`` columns: stream_name, pos, revision, malformed.
        ``assume_nonempty``: skip the emptiness probe when the caller has
        already proven ≥1 row (e.g. from its own bounded stats aggregate)
        — saves one Spark job per micro-batch.
        """
        if not assume_nonempty and updates.isEmpty():
            return
        with self._commit():
            segs = self._segments()
            delta = f"d-{uuid.uuid4().hex}"
            # a batch can carry several rows for one stream (e.g. two
            # spans of a gapped stream dispatched in one micro-batch):
            # fold to one row per stream HERE so every segment — and
            # therefore the single-segment read fast path — is
            # per-stream unique
            _resolve(updates.select(*_COLS)).write.mode("overwrite").parquet(
                os.path.join(self.path, delta)
            )
            segs = segs + [delta]
            if len(segs) > self.compact_after:
                base = f"v-{uuid.uuid4().hex}"
                _resolve(
                    self.spark.read.parquet(
                        *[os.path.join(self.path, s) for s in segs]
                    )
                ).write.mode("overwrite").parquet(os.path.join(self.path, base))
                segs = [base]
            self.manifest.flip(segs)

    def vacuum(self, grace_s: float = 3600.0) -> list[str]:
        """Remove orphaned segment dirs (crash between write and flip, or
        a lost retire-grace list) older than ``grace_s``."""
        with self._commit():
            return self.manifest.vacuum(grace_s)

    def purge(self, keep_streams: DataFrame | None = None) -> None:
        """Drop state for idle streams (ref purgeInterval semantics,
        Streams.fs:904-913): keep only streams present in
        ``keep_streams`` (single column stream_name)."""
        if keep_streams is None:
            return
        with self._commit():
            kept = self.read().join(keep_streams, "stream_name", "left_semi")
            base = f"v-{uuid.uuid4().hex}"
            kept.select(*_COLS).write.mode("overwrite").parquet(
                os.path.join(self.path, base)
            )
            self.manifest.flip([base])
