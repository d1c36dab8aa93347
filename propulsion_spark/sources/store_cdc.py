"""Change-data feed over :class:`EventStoreTable` — the engine's own
store exposed as a *source*, the way the reference's flagship pipeline
consumes the Cosmos change feed (SURVEY §2.1 S1,
ref: src/Propulsion.CosmosStore/CosmosStoreSource.fs:8-63) and the way
Delta exposes Change Data Feed.

Every appending ``sync`` commit writes one tiny CDC record (seq →
segment dirs) under the store's lease, so the commit log doubles as a
paged feed: readers page by ``seq``, each page's rows are read
directly from the store's immutable bucket segments by executors —
no copy of the data, no scan of the whole store.

Two consumption surfaces, both over the same log:

- :func:`store_cdc_feed` — the engine's consumer-group shape: a
  :class:`TailingFeedSource` pump whose positions live in the
  :class:`CheckpointStore` (N independent groups per store, commit
  after sink completion — the reference's checkpointing model).
- :class:`StoreCdcDataSource` — a NATIVE Spark structured-streaming
  source (PySpark DataSource API, Spark 4): ``register_store_cdc(
  spark)`` then ``spark.readStream.format("propulsion-store-cdc")
  .option("path", store_path)`` — offsets ride Spark's own
  offset/commit log, partitions = the batch's segment bucket dirs
  (read in parallel on executors via Arrow), back-pressure via
  ``maxSeqsPerTrigger``. This is the DSv2 micro-batch shape SURVEY §4
  calls out as the one genuinely custom source integration.

Semantics: append-only at-least-once (a seq re-read re-serves its
rows — pair with write-pos dedup downstream, the engine standard).
Prune deletions and compaction rewrites do not appear; a reader
lagging past compaction gets :class:`CdcRetentionError` and re-seeds
from a snapshot — the Delta-CDF-past-VACUUM contract.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from propulsion_spark.sources.feed import Batch, TailingFeedSource
from propulsion_spark.streaming.checkpoints import CheckpointStore
from propulsion_spark.streaming.event_store import EventStoreTable

# envelope DDL + column list DERIVED from the one schema definition
# (envelope.STREAM_EVENT_SCHEMA) so an envelope change cannot drift
# this source; only the Arrow read target below is spelled out (its
# types must match what Spark's Arrow bridge expects, asserted
# name-for-name against the schema by test).
from propulsion_spark.envelope import STREAM_EVENT_SCHEMA as _ENV_SCHEMA

_ENVELOPE_DDL = ", ".join(
    f"{f.name} {f.dataType.simpleString()}" for f in _ENV_SCHEMA.fields
)
_ENVELOPE_COLS = [f.name for f in _ENV_SCHEMA.fields]


# --------------------------------------------------------------- feed pump
def store_cdc_feed(
    spark: SparkSession,
    store: EventStoreTable,
    sink,
    checkpoints: CheckpointStore,
    source_id: str = "store-cdc",
    page_seqs: int = 64,
    tail_sleep_s: float = 1.0,
    by_bucket: bool = False,
) -> TailingFeedSource:
    """Consumer-group tailing pump over the store's change feed:
    checkpoint = CDC seq, one page = up to ``page_seqs`` commits'
    segments unioned into one distributed read.

    ``by_bucket=True`` runs one tranche PER STORE BUCKET — the
    reference's change-feed model exactly (tranche = physical
    partition, ref: CosmosStoreSource.fs:8-63 lease-per-partition),
    with independent positions per (source, bucket) in the checkpoint
    store. Streams hash to one bucket, so per-stream ordering is
    preserved within a tranche — the same guarantee the Cosmos lease
    gives — while tranches progress independently (a slow handler on
    one bucket never stalls the others)."""

    def read_page(tranche: str, pos: int) -> Batch:
        from propulsion_spark.streaming.event_store import (
            CdcRetentionError,
            cdc_check_contiguous,
        )

        bucket_suffix = f"/bucket={tranche}" if by_bucket else None
        # paged listing: only page_seqs+1 record files are ever opened
        # per poll (the +1 answers is_tail), so draining an N-deep
        # backlog costs O(N) opens total, not O(N²)
        recs = store._cdc_records(pos, limit=page_seqs + 1)
        cdc_check_contiguous(recs, pos)
        page, rest = recs[:page_seqs], recs[page_seqs:]
        if not page:
            return Batch(items=None, checkpoint=pos, is_tail=True)
        paths = []
        for rec in page:
            for s in rec["segments"]:
                if bucket_suffix is not None and not s.endswith(bucket_suffix):
                    continue  # another tranche's bucket
                p = os.path.join(store.path, s)
                if not os.path.exists(p):
                    raise CdcRetentionError(
                        f"change-feed seq {rec['seq']} references "
                        f"compacted-away segment {s}; re-seed from a "
                        "snapshot"
                    )
                paths.append(p)
        new_pos = page[-1]["seq"]
        if not paths:
            # commits in range, none touching this bucket: advance the
            # position without a data batch
            return Batch(items=None, checkpoint=new_pos, is_tail=not rest)
        return Batch(
            items=spark.read.parquet(*paths),
            checkpoint=new_pos,
            is_tail=not rest,
        )

    def tranches():
        if by_bucket:
            store._load()  # adopt the manifest-stamped bucket count — a
            # consumer constructed with a different n_buckets default
            # would otherwise silently never cover the extra buckets
            return [str(b) for b in range(store.n_buckets)]
        return ["0"]

    src = TailingFeedSource(
        spark,
        read_tranches=tranches,
        read_page=read_page,
        sink=sink,
        checkpoints=checkpoints,
        source_id=source_id,
    )
    src.tail_sleep_s = tail_sleep_s
    # a retention gap is permanent: retrying it forever would be a
    # silent stall — abend so the operator performs the documented
    # re-seed-from-snapshot recovery
    from propulsion_spark.streaming.event_store import CdcRetentionError

    src.fatal_errors = (CdcRetentionError,)
    return src


# ------------------------------------------------- native Spark source
try:  # PySpark ≥ 4.0 — gate so older runtimes keep the feed-pump path
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    class _SegmentsPartition(InputPartition):
        def __init__(self, paths: "list[str]"):
            self.paths = paths

    class _StoreCdcStreamReader(DataSourceStreamReader):
        def __init__(self, options: dict):
            self.path = options["path"]
            self.start_seq = int(options.get("startseq", 0))
            self.max_seqs = int(options.get("maxseqspertrigger", 1 << 30))
            self._last = None  # newest seq this reader has emitted

        # -- offset log (Spark persists these dicts in its checkpoint) --
        def initialOffset(self) -> dict:
            # fresh start (Spark only calls this with no checkpoint):
            # seed the throttle base so the FIRST batch honors
            # maxSeqsPerTrigger too — exactly the deep-backfill case
            # admission control exists for
            self._last = self.start_seq
            return {"seq": self.start_seq}

        def latestOffset(self) -> dict:
            from propulsion_spark.streaming.event_store import (
                cdc_log_max,
                cdc_repair,
            )

            cdc_repair(self.path)  # a crashed writer's head, healed
            latest = max(cdc_log_max(self.path), self.start_seq)
            # Admission control: at most maxSeqsPerTrigger commits per
            # micro-batch, advancing from the newest offset THIS READER
            # has planned. After a restart Spark resumes from its own
            # checkpoint and this object is fresh (_last=None, and the
            # API gives the reader no restart-offset hook) — clamping
            # against start_seq here would hand Spark an offset BEHIND
            # its checkpoint and roll the stream back, so the first
            # post-restart batch is unthrottled; partitions() then
            # re-learns the true base from the engine's own start
            # offset and throttling resumes.
            if self._last is not None:
                latest = max(min(latest, self._last + self.max_seqs), self._last)
            self._last = latest
            return {"seq": latest}

        def partitions(self, start: dict, end: dict):
            from propulsion_spark.streaming.event_store import (
                CdcRetentionError,
                cdc_check_contiguous,
                cdc_list_records,
            )

            # the engine's start offset is the authoritative progress
            # base (it survives restarts in Spark's checkpoint)
            self._last = max(self._last or 0, end["seq"])
            # one partition per segment bucket dir → executors read the
            # batch's buckets in parallel, directly from the store
            recs = [
                r
                for r in cdc_list_records(self.path, start["seq"])
                if r["seq"] <= end["seq"]
            ]
            cdc_check_contiguous(recs, start["seq"])
            # completeness both ways: a planned range whose records
            # were vacuumed (all of them, or a trailing run) must raise
            # — Spark will commit `end`, so silently reading fewer
            # records than the range loses rows forever
            served_to = recs[-1]["seq"] if recs else start["seq"]
            if served_to != end["seq"]:
                raise CdcRetentionError(
                    f"change-feed records ({served_to}, {end['seq']}] of "
                    "a planned batch were reclaimed by retention; "
                    "restart the query from a snapshot"
                )
            parts = []
            for rec in recs:
                for s in rec["segments"]:
                    p = os.path.join(self.path, s)
                    if not os.path.exists(p):
                        raise CdcRetentionError(
                            f"change-feed seq {rec['seq']} references "
                            f"compacted-away segment {s}; restart the "
                            "query from a snapshot"
                        )
                    parts.append(_SegmentsPartition([p]))
            # Spark requires ≥1 partition; an empty batch (planned
            # between latestOffset calls) reads zero files
            return parts or [_SegmentsPartition([])]

        def read(self, partition):  # executes on Python workers
            return _read_segment_arrow(partition.paths)

        def commit(self, end: dict) -> None:
            pass  # Spark's own commit log is the source of truth

    def _arrow_target():
        """Arrow read target for the envelope — field NAMES must track
        STREAM_EVENT_SCHEMA (asserted by test); types are spelled out
        because they must match what Spark's Arrow bridge expects."""
        import pyarrow as pa

        return pa.schema(
            [
                pa.field("stream_name", pa.string()),
                pa.field("category", pa.string()),
                pa.field("idx", pa.int64()),
                pa.field("event_type", pa.string()),
                pa.field("data", pa.string()),
                pa.field("meta", pa.string()),
                pa.field("event_id", pa.int64()),
                pa.field("ts", pa.timestamp("us")),
                pa.field("is_unfold", pa.bool_()),
                pa.field("size", pa.int64()),
            ]
        )

    def _read_segment_arrow(paths: "list[str]"):
        """Shared executor-side read: parquet files under segment dirs →
        Arrow batches cast to the envelope schema."""
        import pyarrow.dataset as pds

        files = []
        for p in paths:
            for root, _, names in os.walk(p):
                files.extend(
                    os.path.join(root, n)
                    for n in names
                    if n.endswith(".parquet")
                )
        if not files:
            return iter(())
        table = pds.dataset(files, format="parquet").to_table()
        return iter(
            table.select(_ENVELOPE_COLS).cast(_arrow_target()).to_batches()
        )

    class _StoreSnapshotReader(DataSourceReader):
        """Batch face of the source: the CURRENT manifest's committed
        segments (crash orphans and retired generations invisible) —
        one executor partition per segment bucket dir."""

        def __init__(self, options: dict):
            self.path = options["path"]

        def partitions(self):
            import json

            try:
                with open(os.path.join(self.path, "_VERSION")) as f:
                    m = json.loads(f.read().strip() or "null")
            except FileNotFoundError:
                m = None
            if m is None:
                return [_SegmentsPartition([])]
            data = m["data"] if isinstance(m, dict) else {"0": m}
            parts = [
                _SegmentsPartition([os.path.join(self.path, s)])
                for segs in data.values()
                for s in segs
            ]
            return parts or [_SegmentsPartition([])]

        def read(self, partition):
            return _read_segment_arrow(partition.paths)

    class StoreCdcDataSource(DataSource):
        """The engine store as a first-class Spark format — the Delta
        convention: ``spark.read.format("propulsion-store-cdc")`` is a
        manifest-consistent SNAPSHOT of the committed store;
        ``spark.readStream`` on the same format is the change feed.

        Options: ``path`` (the store dir, required); streaming only:
        ``startSeq`` (default 0 = from the feed's beginning),
        ``maxSeqsPerTrigger`` (commits admitted per micro-batch — the
        read-ahead gate)."""

        @classmethod
        def name(cls) -> str:
            return "propulsion-store-cdc"

        def schema(self) -> str:
            return _ENVELOPE_DDL

        def reader(self, schema):
            return _StoreSnapshotReader(
                {k.lower(): v for k, v in self.options.items()}
            )

        def streamReader(self, schema):
            return _StoreCdcStreamReader(
                {k.lower(): v for k, v in self.options.items()}
            )

    def register_store_cdc(spark: SparkSession) -> None:
        """Register the native source with this session (idempotent)."""
        spark.dataSource.register(StoreCdcDataSource)

except ImportError:  # pragma: no cover — PySpark < 4.0

    StoreCdcDataSource = None

    def register_store_cdc(spark: SparkSession) -> None:
        raise NotImplementedError(
            "the native store-cdc source needs the PySpark DataSource "
            "API (Spark >= 4.0); use store_cdc_feed() instead"
        )
