"""Delta Lake backends for the durable tables — the cluster swap the
parquet-MVCC docstrings promise (``positions.py``, ``event_store.py``,
``mvcc.py``).

``delta-spark`` (the OSS pure-Spark extension) replaces BOTH hand-rolled
MVCC pieces with battle-tested equivalents:

- :class:`~propulsion_spark.streaming.mvcc.FileLease` → Delta's
  log-based optimistic concurrency control: every commit appends the
  next numbered JSON action file via the LogStore's atomic
  put-if-absent; a losing writer retries/conflicts instead of
  corrupting (this is exactly the "conditional write" lease story for
  object stores — S3 ``If-None-Match``, GCS generation preconditions —
  already wired inside delta's LogStore implementations).
- :class:`~propulsion_spark.streaming.mvcc.JsonManifest` → the Delta
  log itself (segment list = file actions, retire grace = VACUUM
  retention, pointer flip = commit).

The adapters below expose the SAME public surface as
:class:`~propulsion_spark.streaming.positions.PositionsTable` and
:class:`~propulsion_spark.streaming.event_store.EventStoreTable`, so a
sink is pointed at either backend by constructor choice alone
(``tests/test_delta_backend.py`` runs the shared semantics matrix over
both, skip-marked when delta-spark is not installed — it is not baked
into this sandbox, so the suite exercises the parquet backend here and
the delta backend on any machine with ``pip install delta-spark``).

**Validation status: UNVALIDATED here.** This sandbox cannot install
``delta-spark``, so the conformance matrix has only ever executed
against the parquet backend; the Delta legs are recorded skips. The
exact contract a deployment must verify before trusting these adapters
is ``docs/DELTA_CONFORMANCE.md`` — run it wherever delta-spark installs.
The STORAGE-MODEL half of the gap is closed natively (r9): the
positions matrix also runs an always-on ``deltalite`` leg —
``streaming/deltalite.py`` implements the public Delta transaction-log
protocol (version-numbered JSON actions, add/remove replay,
put-if-absent commits, optimistic compaction) without the JVM
extension, so log-structured commit semantics are conformance-tested
in-sandbox even though delta-spark binary interop still is not.

Session requirement: build the SparkSession with

    from delta import configure_spark_with_delta_pip
    builder = (SparkSession.builder
        .config("spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension")
        .config("spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog"))
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propulsion_spark.streaming.positions import _COLS, POSITIONS_SCHEMA, _resolve
from propulsion_spark.streaming.sinks import OutcomeKind

try:  # optional dependency — adapters are inert without it
    from delta.tables import DeltaTable

    HAVE_DELTA = True
except ImportError:  # pragma: no cover - exercised on delta-less sandboxes
    DeltaTable = None
    HAVE_DELTA = False


_RETENTION_CHECK = "spark.databricks.delta.retentionDurationCheck.enabled"


def _vacuum_with_short_retention(spark: SparkSession, tables, grace_s: float) -> None:
    """Vacuum with the retention safety check suspended for THIS call
    only: the previous conf value is restored in a finally, so other
    Delta vacuums on the shared session keep their protection."""
    prev = spark.conf.get(_RETENTION_CHECK, None)
    spark.conf.set(_RETENTION_CHECK, "false")
    try:
        for t in tables:
            t.vacuum(grace_s / 3600.0)
    finally:
        if prev is None:
            spark.conf.unset(_RETENTION_CHECK)
        else:
            spark.conf.set(_RETENTION_CHECK, prev)


def _require_delta() -> None:
    if not HAVE_DELTA:
        raise ImportError(
            "delta-spark is not installed — `pip install delta-spark` and "
            "build the session per delta_backend's module docstring, or use "
            "the parquet-MVCC PositionsTable/EventStoreTable backends"
        )


class DeltaPositionsTable:
    """Per-stream write-position table on a Delta table.

    Same contract as :class:`PositionsTable` (newest-wins monotonic
    pos/revision, sticky malformed), but merge is a Delta MERGE (no
    segment log to maintain: OPTIMIZE replaces compaction, the Delta log
    replaces the manifest, commit-protocol OCC replaces the lease)."""

    def __init__(self, spark: SparkSession, path: str):
        _require_delta()
        self.spark = spark
        self.path = path

    def _table(self):
        return DeltaTable.forPath(self.spark, self.path)

    def _exists(self) -> bool:
        return DeltaTable.isDeltaTable(self.spark, self.path)

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], POSITIONS_SCHEMA)
        return self.spark.read.format("delta").load(self.path)

    def merge(self, updates: DataFrame, assume_nonempty: bool = False) -> None:
        resolved = _resolve(updates.select(*_COLS))
        if not self._exists():
            resolved.write.format("delta").mode("overwrite").save(self.path)
            return
        (
            self._table()
            .alias("t")
            .merge(resolved.alias("u"), "t.stream_name = u.stream_name")
            .whenMatchedUpdate(
                set={
                    "pos": "greatest(t.pos, u.pos)",
                    "revision": "greatest(t.revision, u.revision)",
                    "malformed": "t.malformed OR u.malformed",
                }
            )
            .whenNotMatchedInsertAll()
            .execute()
        )

    def compact(self) -> None:
        """OPTIMIZE analog of the manifest fold — optional, async-safe."""
        self._table().optimize().executeCompaction()

    def vacuum(self, grace_s: float = 3600.0) -> list:
        if self._exists():
            _vacuum_with_short_retention(self.spark, [self._table()], grace_s)
        return []

    def purge(self, keep_streams: "DataFrame | None" = None) -> None:
        if keep_streams is None or not self._exists():
            return
        (
            self._table()
            .alias("t")
            .merge(
                keep_streams.select("stream_name").alias("k"),
                "t.stream_name = k.stream_name",
            )
            .whenNotMatchedBySourceDelete()
            .execute()
        )


class DeltaEventStoreTable:
    """Idempotent position-based event writer on two Delta tables
    (``<path>/data`` bucket-partitioned, ``<path>/tails``).

    Same outcome semantics as :class:`EventStoreTable` (Ok / Duplicate /
    PartialDuplicate / PrefixMissing per span vs the stored tail); the
    append is a Delta transaction, the tails upsert a MERGE, pruning a
    MERGE-delete, and compaction OPTIMIZE — all commits going through
    Delta's log OCC instead of a FileLease."""

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 64):
        _require_delta()
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        self._data = f"{path}/data"
        self._tails = f"{path}/tails"

    # ---- helpers ----------------------------------------------------------
    def _bucket_col(self) -> F.Column:
        return F.crc32(F.col("stream_name").cast("binary")) % self.n_buckets

    def _empty_envelope(self) -> DataFrame:
        from propulsion_spark.envelope import STREAM_EVENT_SCHEMA

        return self.spark.createDataFrame([], STREAM_EVENT_SCHEMA)

    def _exists(self, p: str) -> bool:
        return DeltaTable.isDeltaTable(self.spark, p)

    # ---- reads ------------------------------------------------------------
    def read(self, buckets: "set[str] | None" = None) -> DataFrame:
        if not self._exists(self._data):
            return self._empty_envelope()
        df = self.spark.read.format("delta").load(self._data)
        if buckets is not None:
            # partition pruning: bucket is the partition column
            df = df.filter(F.col("bucket").isin(*[int(b) for b in buckets]))
        cols = [f.name for f in self._empty_envelope().schema.fields]
        return df.select(*cols)

    def read_tails(self) -> DataFrame:
        if not self._exists(self._tails):
            return self.spark.createDataFrame([], "stream_name string, tail long")
        return self.spark.read.format("delta").load(self._tails)

    # ---- the idempotent writer -------------------------------------------
    def sync(self, batch: DataFrame) -> DataFrame:
        """Classify each stream's span against the stored tail, append
        only novel suffixes, upsert tails; returns the same report shape
        as EventStoreTable.sync."""
        from pyspark.sql import Window

        batch = batch.cache()
        try:
            span = batch.groupBy("stream_name").agg(
                F.min("idx").alias("span_lo"), (F.max("idx") + 1).alias("span_hi")
            )
            verdict = (
                span.join(self.read_tails(), "stream_name", "left")
                .withColumn("tail", F.coalesce(F.col("tail"), F.lit(0)))
                .withColumn(
                    "outcome",
                    F.when(F.col("span_hi") <= F.col("tail"), OutcomeKind.DUPLICATE)
                    .when(F.col("span_lo") > F.col("tail"), OutcomeKind.PREFIX_MISSING)
                    .when(
                        F.col("span_lo") < F.col("tail"),
                        OutcomeKind.PARTIAL_DUPLICATE,
                    )
                    .otherwise(OutcomeKind.OK),
                )
                .persist()
            )
            writable = verdict.filter(
                F.col("outcome").isin(OutcomeKind.OK, OutcomeKind.PARTIAL_DUPLICATE)
            ).select("stream_name", "tail")
            # no broadcast hint: an explicit hint is never demoted by AQE,
            # and writable can be millions of streams in a catch-up batch
            # (same rationale as EventStoreTable._append_novel) — Spark
            # auto-broadcasts the small steady-state relation on its own
            dw = Window.partitionBy("stream_name").orderBy("idx")
            novel = (
                batch.join(writable, "stream_name")
                .filter(F.col("idx") >= F.col("tail"))
                .drop("tail")
                .withColumn("_p", F.lag("idx").over(dw))
                .filter(F.col("_p").isNull() | (F.col("_p") != F.col("idx")))
                .drop("_p")
            )
            cols = [f.name for f in self._empty_envelope().schema.fields]
            tail_stats = (
                novel.groupBy("stream_name")
                .agg(F.count("*").alias("appended"), (F.max("idx") + 1).alias("new_tail"))
                .persist()
            )
            if not tail_stats.rdd.isEmpty():
                (
                    novel.select(*cols)
                    .withColumn("bucket", self._bucket_col())
                    .repartition("bucket")
                    .write.format("delta")
                    .mode("append")
                    .partitionBy("bucket")
                    .save(self._data)
                )
                tdelta = tail_stats.select(
                    "stream_name", F.col("new_tail").alias("tail")
                )
                if not self._exists(self._tails):
                    tdelta.write.format("delta").mode("overwrite").save(self._tails)
                else:
                    (
                        DeltaTable.forPath(self.spark, self._tails)
                        .alias("t")
                        .merge(tdelta.alias("u"), "t.stream_name = u.stream_name")
                        .whenMatchedUpdate(set={"tail": "greatest(t.tail, u.tail)"})
                        .whenNotMatchedInsertAll()
                        .execute()
                    )
            report = (
                verdict.select(
                    "stream_name", "outcome", F.col("tail").alias("prev_tail")
                )
                .join(tail_stats, "stream_name", "left")
                .select(
                    "stream_name",
                    "outcome",
                    "prev_tail",
                    F.coalesce("new_tail", "prev_tail").alias("new_tail"),
                    F.coalesce("appended", F.lit(0)).cast("long").alias("appended"),
                )
            )
            # localCheckpoint: sever lineage so the report survives later
            # table versions without a spool dir (Delta time-travel would
            # also work; this is cheaper)
            out = report.localCheckpoint(eager=True)
            verdict.unpersist(), tail_stats.unpersist()
            return out
        finally:
            batch.unpersist()

    # ---- pruning / compaction --------------------------------------------
    def prune(self, requests: DataFrame) -> DataFrame:
        """Delete events with idx <= until_idx per stream (MERGE-delete);
        Delta's data skipping restricts the rewrite to files containing
        matching (bucket-partitioned) streams."""
        current = self.read()
        # no broadcast hint (mass-retention prunes can carry millions of
        # request rows; AQE never demotes an explicit hint)
        report = (
            current.join(requests, "stream_name")
            .groupBy("stream_name")
            .agg(
                F.sum((F.col("idx") <= F.col("until_idx")).cast("long")).alias(
                    "deleted"
                ),
                F.sum((F.col("idx") > F.col("until_idx")).cast("long")).alias(
                    "remaining"
                ),
            )
            .localCheckpoint(eager=True)
        )
        if self._exists(self._data):
            (
                DeltaTable.forPath(self.spark, self._data)
                .alias("t")
                .merge(
                    requests.alias("r"),
                    "t.stream_name = r.stream_name AND t.idx <= r.until_idx",
                )
                .whenMatchedDelete()
                .execute()
            )
        return report

    def compact_bucket(self, bucket: str) -> None:
        if self._exists(self._data):
            (
                DeltaTable.forPath(self.spark, self._data)
                .optimize()
                .where(f"bucket = {int(bucket)}")
                .executeCompaction()
            )

    def unfold_compact(self) -> None:
        """Keep only the freshest unfold per (stream, event_type):
        MERGE-delete every unfold row that is not the max-idx one."""
        from pyspark.sql import Window

        if not self._exists(self._data):
            return
        w = Window.partitionBy("stream_name", "event_type").orderBy(
            F.col("idx").desc()
        )
        stale = (
            self.read()
            .filter(F.col("is_unfold"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") > 1)
            .select("stream_name", F.col("idx").alias("stale_idx"))
            .localCheckpoint(eager=True)  # don't re-rank mid-delete
        )
        (
            DeltaTable.forPath(self.spark, self._data)
            .alias("t")
            .merge(
                stale.alias("s"),
                "t.stream_name = s.stream_name AND t.idx = s.stale_idx "
                "AND t.is_unfold",
            )
            .whenMatchedDelete()
            .execute()
        )

    def vacuum(self, grace_s: float = 3600.0) -> list:
        _vacuum_with_short_retention(
            self.spark,
            [
                DeltaTable.forPath(self.spark, p)
                for p in (self._data, self._tails)
                if self._exists(p)
            ],
            grace_s,
        )
        return []
