"""Idempotent position-based event writer — the CosmosStoreSink analog
(SURVEY.md §2.4 W1; ref: src/Propulsion.CosmosStore/CosmosStoreSink.fs:40-120).

Semantics per stream span: given the stream's stored tail position,

- span starts exactly at tail            → **Ok(new_pos)** — append
- span entirely below tail               → **Duplicate** — no-op
- span straddles tail                    → **PartialDuplicate** — append
  the novel suffix only
- span starts above tail (gap)           → **PrefixMissing** — reject,
  report the gap

Storage layout (the 100 TB shape, Delta-equivalent by construction):

- **Data segments are bucketed by stream hash** (``crc32(stream_name)
  % n_buckets``): each append writes one segment partitioned into the
  buckets it touches; the manifest maps bucket → segment list. Prune /
  compaction rewrite only touched buckets — never the whole table.
- **Tails are maintained incrementally**: a per-stream ``(stream_name,
  tail)`` delta log rides in the SAME manifest as the data segments and
  both are committed in ONE atomic pointer flip, so classification
  never scans the store (O(tails) vs O(table)) and can never observe a
  data/tails torn state after a crash. Tails deltas fold into a base
  segment every ``compact_after`` syncs (append-then-compact, like
  :class:`PositionsTable`).

Conflict resolution is computed set-wise in one Spark job per batch —
join against the tails view — never row-at-a-time. Cross-driver safety:
on-disk :class:`~propulsion_spark.streaming.mvcc.FileLease` around every
read-modify-write commit.

The pruner (W2 analog, ref: CosmosStorePruner.fs:9-84) deletes events
at or below a requested index per stream, rewriting only the buckets
the requests hash into.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propulsion_spark.streaming.mvcc import FileLease, JsonManifest
from propulsion_spark.streaming.sinks import OutcomeKind

_EMPTY_MANIFEST = {"data": {}, "tails": [], "unfold_buckets": []}


class CdcRetentionError(RuntimeError):
    """A change-feed reader lagged past compaction: a CDC record
    references a segment the store has since folded away. Recover by
    re-seeding from a snapshot (``read()`` + ``cdc_latest_seq()``) —
    the same contract as reading Delta CDF past VACUUM retention."""


# ---- change-feed log helpers (path-level, no SparkSession) -------------
# Shared by EventStoreTable and the native DataSource reader
# (sources/store_cdc.py) so the record format lives in ONE place.
# The AUTHORITATIVE head is the {"cdc": {seq, segments}} key the store
# writes into the manifest in the SAME atomic flip as the data; the
# per-seq log files are a materialization that cdc_repair() can always
# re-derive (at most the newest record can be missing after a crash),
# so a committed sync can never silently vanish from the feed.

def _cdc_dir_of(store_path: str) -> str:
    return os.path.join(store_path, "_cdc")


def cdc_log_max(store_path: str) -> int:
    """Newest materialized record seq, from FILENAMES only (one
    listdir, no opens/parses — called per tail poll and per scrape)."""
    try:
        names = os.listdir(_cdc_dir_of(store_path))
    except FileNotFoundError:
        return 0
    seqs = [
        int(n[2:-5])
        for n in names
        if n.startswith("c-") and n.endswith(".json")
    ]
    return max(seqs, default=0)


def cdc_list_records(
    store_path: str, since_seq: int = 0, limit: "int | None" = None
) -> "list[dict]":
    """Records with seq > since_seq, in order. Filename-filtered first,
    so a caught-up tail poll opens zero files; ``limit`` opens only the
    first N names — a paged reader drains a deep backlog in O(backlog)
    total opens instead of O(backlog²)."""
    d = _cdc_dir_of(store_path)
    try:
        names = sorted(
            n
            for n in os.listdir(d)
            if n.startswith("c-")
            and n.endswith(".json")
            and int(n[2:-5]) > since_seq
        )
    except FileNotFoundError:
        return []
    if limit is not None:
        names = names[:limit]
    out = []
    for n in names:
        with open(os.path.join(d, n)) as f:
            out.append(json.loads(f.read()))
    return out


def cdc_check_contiguous(recs: "list[dict]", since_seq: int) -> None:
    """Seqs are dense by construction (every appending commit is +1),
    so a reader starting at ``since_seq`` must see the EXACT run
    ``since_seq+1, since_seq+2, …`` — a gap anywhere (not just at the
    head: vacuum GCs records per-record, so a mid-log record whose
    buckets were compacted can vanish while its neighbors survive)
    means retention reclaimed rows this reader still needed. Raise
    rather than silently skip."""
    for i, rec in enumerate(recs):
        if rec["seq"] != since_seq + 1 + i:
            raise CdcRetentionError(
                f"change-feed records ({since_seq + i}, {rec['seq']}) "
                "were reclaimed by retention (compaction + vacuum); "
                "re-seed from a snapshot"
            )


def cdc_repair(store_path: str) -> None:
    """Materialize the manifest's CDC head into the log if a crash
    between the manifest flip and the record write left it missing.
    Idempotent and safe without the lease: every writer produces the
    identical bytes for a given seq (the manifest is the authority),
    and the tmp+rename is atomic."""
    try:
        with open(os.path.join(store_path, "_VERSION")) as f:
            m = json.loads(f.read().strip() or "null")
    except FileNotFoundError:
        return
    head = m.get("cdc") if isinstance(m, dict) else None
    if not head:
        return
    d = _cdc_dir_of(store_path)
    target = os.path.join(d, f"c-{head['seq']:012d}.json")
    if os.path.exists(target):
        return
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".c-{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        f.write(json.dumps({"seq": head["seq"], "segments": head["segments"]}))
    os.replace(tmp, target)

# below this many touched streams per sync, the verdict/report are
# handled driver-side (one probe job — r2's single-job redelivery
# shape); above it everything stays distributed and the report spools.
# The cap bounds driver memory regardless of batch stream cardinality.
DRIVER_REPORT_CAP = 10_000


class EventStoreTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_buckets: int = 64,
        compact_after: int = 8,
        lease_ttl_s: float = 30.0,
    ):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        self.compact_after = compact_after
        self.lease_ttl_s = lease_ttl_s
        self.manifest = JsonManifest(path)
        self._write_lock = threading.Lock()  # in-process writer serialization
        #: cross-commit lease liveness totals (exported as propulsion_lease_*)
        self.lease_counters = {"heartbeats": 0, "steals": 0, "lost": 0}
        # spools for the sync report / append aggregates — bounded
        # O(streams-per-batch) dirs, so the verdict/report never
        # serialize row-per-stream onto the driver. The report spool
        # ROTATES per sync (the previous sync's returned report must
        # stay readable while the next sync runs); the append spool is
        # only read inside the lock-serialized sync, so one fixed dir
        # suffices. Stale spools of dead writers age out via vacuum.
        from propulsion_spark.streaming.sinks import _SpoolRotation

        # SEPARATE rotations for sync and prune: with a shared one, two
        # prunes after a sync would rmtree the sync's still-held report
        # (and vice versa). Each verb's returned report stays readable
        # until ``keep`` more completed calls of the SAME verb — read
        # or persist a report within that window (documented on sync()).
        self._report_spool = _SpoolRotation(path, keep=2)
        self._prune_spool = _SpoolRotation(path, keep=2)
        self._append_spool = os.path.join(
            path, f"_SPOOL-append-{uuid.uuid4().hex[:12]}"
        )

    @contextmanager
    def _commit(self):
        """Fenced commit scope (see PositionsTable._commit): lease token
        verified at every manifest flip inside — a stolen lease raises
        LeaseLostError instead of silently dropping the peer's commit."""
        with self._write_lock, FileLease(self.path, ttl_s=self.lease_ttl_s, counters=self.lease_counters) as lease:
            self.manifest.fence = lease
            try:
                yield lease
            finally:
                self.manifest.fence = None

    # ---- manifest helpers -------------------------------------------------
    def _load(self) -> dict:
        m = self.manifest.load(None)
        if m is None:
            # fresh store: the first append may stamp the constructor
            # fan-out (there is no pre-existing layout to conflict with)
            self._stamped = True
            return {"data": {}, "tails": [], "unfold_buckets": []}
        if isinstance(m, list):  # pre-bucketing manifests: flat segment list
            self._stamped = False
            return {"data": {"0": m}, "tails": [], "unfold_buckets": None}
        if "unfold_buckets" not in m:
            # legacy manifest: unknown which buckets hold unfolds — None
            # makes unfold_compact fall back to one full derivation scan,
            # after which the set is recorded
            m = {**m, "unfold_buckets": None}
        # The bucketing fan-out is a property of the DATA, not of this
        # process: a reader/writer constructed with a different
        # n_buckets would hash streams to the wrong buckets (prune and
        # compaction would rewrite the wrong sets; a by-bucket CDC
        # consumer would silently never cover buckets past its count).
        # The first appending commit stamps it; every open afterwards
        # adopts the stamped value over the constructor default.
        self._stamped = "n_buckets" in m
        if self._stamped:
            self.n_buckets = m["n_buckets"]
        return m

    def _check_fanout(self, m: dict) -> None:
        """Write verbs that hash streams to buckets must not run against
        an UNSTAMPED manifest that already holds data: the historical
        fan-out is unknown, so bucketing by the constructor default
        could interleave a second layout (and the first append would
        stamp that guess as truth, silently breaking every later pruned
        read). Reads stay available (read_streams falls back to a full
        scan); writers must be constructed with the original fan-out,
        which stamps the manifest going forward."""
        if not self._stamped and m["data"]:
            raise ValueError(
                f"store {self.path}: manifest holds data but no n_buckets "
                "stamp (legacy layout) — construct with the fan-out the "
                "data was bucketed under and call stamp_fanout() once to "
                "record it; refusing to assume "
                f"n_buckets={self.n_buckets}"
            )

    def stamp_fanout(self) -> None:
        """Record the CONSTRUCTOR ``n_buckets`` on an unstamped legacy
        manifest — the explicit one-time migration step that unblocks
        write verbs (``_check_fanout``). This is an operator assertion
        that the constructor value matches how the existing data was
        bucketed; the engine cannot verify it (the historical fan-out
        was never recorded — that is the defect being migrated away)."""
        with self._commit():
            m = self._load()
            if self._stamped:
                return
            # Cheap half of wrong-fan-out detection: every bucket key the
            # data already holds must be addressable under the stamped
            # count, else read_streams would prune to buckets that can
            # never match and silently return empty for streams a full
            # scan finds. (The other half — right count, different hash
            # placement — is unverifiable without rehashing the data.)
            bad = [
                b
                for b in m["data"]
                if not b.isdigit() or int(b) >= self.n_buckets
            ]
            if bad:
                raise ValueError(
                    f"store {self.path}: existing bucket keys {sorted(bad)} "
                    f"are not addressable under n_buckets={self.n_buckets} "
                    "— the constructor fan-out does not match the data; "
                    "construct with the original fan-out before stamping"
                )
            self.manifest.flip({**m, "n_buckets": self.n_buckets})
            self._stamped = True

    def _bucket_col(self) -> F.Column:
        return F.crc32(F.col("stream_name").cast("binary")) % self.n_buckets

    def _data_paths(self, m: dict, buckets: "set[str] | None" = None) -> list[str]:
        out = []
        for b, segs in m["data"].items():
            if buckets is None or b in buckets:
                out.extend(os.path.join(self.path, s) for s in segs)
        return out

    # ---- reads ------------------------------------------------------------
    def _empty_envelope(self) -> DataFrame:
        from propulsion_spark.envelope import STREAM_EVENT_SCHEMA

        return self.spark.createDataFrame([], STREAM_EVENT_SCHEMA)

    def read(self, buckets: "set[str] | None" = None) -> DataFrame:
        paths = self._data_paths(self._load(), buckets)
        if not paths:
            return self._empty_envelope()
        return self.spark.read.parquet(*paths)

    def read_streams(self, stream_names: "list[str]") -> DataFrame:
        """Events of the named streams only — the point-read path the
        reference serves per stream (an Equinox load reads one stream's
        events by its partition key; ref
        src/Propulsion.CosmosStore/EventStoreSink-adjacent read APIs).

        Two pruning layers, so cost scales with the TOUCHED buckets,
        never the store: (1) each name's bucket — the same
        ``crc32(utf8) % n_buckets`` the writer uses; zlib.crc32 and
        Spark's crc32 share the polynomial, so this is computed
        driver-side with no Spark job — restricts the scan to those
        bucket segment dirs; (2) the ``stream_name IN (...)`` predicate
        pushes down to the parquet row-group filter inside them.

        The manifest is loaded FIRST: the data's stamped n_buckets
        (``_load`` adopts it over the constructor default) must drive
        the bucket rule, or a reader constructed with a different
        fan-out would prune to the wrong buckets and silently miss
        events. Manifests WITHOUT a stamp (legacy flat lists,
        pre-stamp dicts) predate the recorded fan-out — pruning by the
        constructor default could miss events there too, so those fall
        back to scanning every bucket (correct, just unpruned)."""
        import zlib

        m = self._load()  # adopts the stamped n_buckets before hashing
        buckets = (
            {
                str(zlib.crc32(n.encode("utf-8")) % self.n_buckets)
                for n in stream_names
            }
            if self._stamped
            else None
        )
        paths = self._data_paths(m, buckets)
        if not paths:
            return self._empty_envelope()
        return self.spark.read.parquet(*paths).filter(
            F.col("stream_name").isin(list(stream_names))
        )

    def _tails_raw(self, m: dict) -> DataFrame:
        """UNAGGREGATED (stream_name, tail) rows — up to one row per
        (stream, tails segment), newest tail largest. :meth:`read_tails`
        folds this to the per-stream view; sync's classifier instead
        folds AFTER its batch join, so its aggregate is bounded by the
        batch's streams, never the store's stream universe (r11 — the
        ``redelivery_flat_10x`` gauge's residual state-growth term)."""
        if not m["tails"]:
            if not m["data"]:
                return self.spark.createDataFrame([], "stream_name string, tail long")
            # migration path for pre-tails manifests: derive once from data
            return self.read().groupBy("stream_name").agg(
                (F.max("idx") + 1).alias("tail")
            )
        return self.spark.read.parquet(
            *[os.path.join(self.path, s) for s in m["tails"]]
        )

    def read_tails(self, m: dict | None = None) -> DataFrame:
        """Current (stream_name, tail) view — O(streams), never O(events)."""
        m = m if m is not None else self._load()
        raw = self._tails_raw(m)
        if len(m["tails"]) <= 1:
            return raw
        return raw.groupBy("stream_name").agg(F.max("tail").alias("tail"))

    # ---- the idempotent writer (W1) ---------------------------------------
    def sync(self, batch: DataFrame) -> DataFrame:
        """Write a batch of envelope rows idempotently; returns the outcome
        table: (stream_name, outcome, prev_tail, new_tail, appended).

        Per-sync cost is O(batch) + O(tails view): one delta data segment
        (bucket-partitioned), one tails delta, one manifest flip — the
        store's total size never enters the plan.

        Report lifetime: on the >cap distributed path the returned table
        reads a spool retained for the next 2 completed sync() calls on
        this instance — act on (or persist) the report within that
        window; prune() reports rotate independently."""
        with self._commit():
            return self._sync_locked(batch)

    def _sync_locked(self, batch: DataFrame) -> DataFrame:
        m = self._load()
        self._check_fanout(m)
        tails = self._tails_raw(m)
        # The batch lineage is walked at most twice (classification, then
        # the novel-suffix append) and each walk is single-pass, so sync
        # does NOT cache the batch: a cache would pay one extra
        # materialize+store for at most one saved recompute, and on the
        # steady-state redelivery path (no writable streams — exactly one
        # walk) the store cost is pure overhead, measured at ~20% of the
        # whole sync at sf0.1 (docs/ROUND_NOTES.md r8). A caller whose
        # envelope derivation is genuinely expensive should persist it
        # before calling sync — sync honors an already-persisted input
        # (both walks then read the caller's cache).
        #
        # span bounds are duplicate-insensitive (min/max): classification
        # needs no dedup shuffle, so a full-duplicate redelivery costs
        # exactly one pass over the batch
        span = batch.groupBy("stream_name").agg(
            F.min("idx").alias("span_lo"), (F.max("idx") + 1).alias("span_hi")
        )
        joined = span.join(tails, "stream_name", "left")
        if len(m["tails"]) > 1:
            # multi-segment tails list: fold to the freshest tail AFTER
            # the batch join — the aggregate is then bounded by the
            # batch's streams (≤ segments rows each), not by every
            # stream the store has ever seen. The join's stream_name
            # hash partitioning already clusters the group keys, so no
            # extra exchange (the old shape pre-aggregated the WHOLE
            # tails union per sync: an O(streams) shuffle that grew
            # with accumulated state).
            joined = joined.groupBy("stream_name", "span_lo", "span_hi").agg(
                F.max("tail").alias("tail")
            )
        verdict = (
            joined
            .withColumn("tail", F.coalesce(F.col("tail"), F.lit(0)))
            .withColumn(
                "outcome",
                F.when(F.col("span_hi") <= F.col("tail"), OutcomeKind.DUPLICATE)
                .when(F.col("span_lo") > F.col("tail"), OutcomeKind.PREFIX_MISSING)
                .when(F.col("span_lo") < F.col("tail"), OutcomeKind.PARTIAL_DUPLICATE)
                .otherwise(OutcomeKind.OK),
            )
        )
        # the verdict is one bounded row per touched stream. Two report
        # paths, picked by ONE probe job:
        # - ≤ DRIVER_REPORT_CAP streams (the steady-state micro-batch):
        #   the probe already collected every verdict row, so control
        #   flow and the report are built driver-side — a full-duplicate
        #   redelivery costs exactly one Spark job, same as r2. The
        #   probe runs UNPERSISTED: the small path never touches the
        #   verdict again, so a persist would be a pure storage-write
        #   tax on every steady-state sync;
        # - above the cap (a 100× catch-up batch): the verdict stays
        #   DISTRIBUTED — it is persisted only now (one recompute of the
        #   cheap span aggregate, amortized by the big batch it fronts),
        #   per-outcome counts materialize the persisted rows, the
        #   append receives the writable rows as a DataFrame, and the
        #   report is spooled to parquet so it never references a tails
        #   view a later sync retires. Driver memory stays O(cap).
        probe = verdict.limit(DRIVER_REPORT_CAP + 1).collect()
        if len(probe) <= DRIVER_REPORT_CAP:
            return self._report_small(m, batch, probe)
        verdict = verdict.persist()
        try:
            # cap exceeded → distributed path; one bounded aggregate
            # fully materializes the persisted verdict (the probe's
            # limit job may have computed only a prefix of it)
            counts = {
                r.outcome: r.n
                for r in verdict.groupBy("outcome")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            writable_n = counts.get(OutcomeKind.OK, 0) + counts.get(
                OutcomeKind.PARTIAL_DUPLICATE, 0
            )
            writable = verdict.filter(
                F.col("outcome").isin(OutcomeKind.OK, OutcomeKind.PARTIAL_DUPLICATE)
            ).select("stream_name", "tail")
            tail_stats = (
                self._append_novel(m, batch, writable) if writable_n else None
            )
            report = verdict.select(
                "stream_name", "outcome", F.col("tail").alias("prev_tail")
            )
            if tail_stats is not None:
                report = report.join(tail_stats, "stream_name", "left").select(
                    "stream_name",
                    "outcome",
                    "prev_tail",
                    F.coalesce("new_tail", "prev_tail").alias("new_tail"),
                    F.coalesce("appended", F.lit(0)).cast("long").alias("appended"),
                )
            else:
                report = report.select(
                    "stream_name",
                    "outcome",
                    "prev_tail",
                    F.col("prev_tail").alias("new_tail"),
                    F.lit(0).cast("long").alias("appended"),
                )
            spool = self._report_spool.next()
            report.write.mode("overwrite").parquet(spool)
            # retained by the rotation (keep=2) so the returned report
            # outlives the next sync; a failed write leaves the spool
            # in-flight, where only vacuum's age guard reclaims it
            self._report_spool.done(spool)
        finally:
            verdict.unpersist()
        return self.spark.read.schema(
            "stream_name string, outcome string, prev_tail long, "
            "new_tail long, appended long"
        ).parquet(spool)

    def _report_small(self, m: dict, batch: DataFrame, vrows: list) -> DataFrame:
        """Below-cap sync: verdict rows are already on the driver; feed
        the append a tiny local writable relation and assemble the report
        without touching the cluster again."""
        writable = [
            (r.stream_name, r.tail)
            for r in vrows
            if r.outcome in (OutcomeKind.OK, OutcomeKind.PARTIAL_DUPLICATE)
        ]
        appended_by_stream: dict = {}
        if writable:
            tail_stats = self._append_novel(
                m,
                batch,
                self.spark.createDataFrame(writable, "stream_name string, tail long"),
            )
            appended_by_stream = {
                r.stream_name: (r.appended, r.new_tail)
                for r in tail_stats.collect()  # ≤ cap rows, from the spool
            }
        report_rows = [
            (
                r.stream_name,
                r.outcome,
                r.tail,
                appended_by_stream.get(r.stream_name, (0, r.tail))[1],
                appended_by_stream.get(r.stream_name, (0, r.tail))[0],
            )
            for r in vrows
        ]
        return self.spark.createDataFrame(
            report_rows,
            "stream_name string, outcome string, prev_tail long, "
            "new_tail long, appended long",
        )

    def _append_novel(
        self, m: dict, batch: DataFrame, writable: DataFrame
    ) -> "DataFrame | None":
        """Append each writable stream's novel suffix as one bucketed
        segment + tails delta; returns the durable per-stream append
        aggregate ``(stream_name, appended, new_tail)`` (spooled parquet —
        safe to join after caches are dropped). ``writable``: distributed
        (stream_name, tail) rows — the caller guarantees ≥1 row (checked
        against the bounded per-outcome counts, never an isEmpty probe)."""
        # redelivered rows can repeat (stream, idx) inside one batch;
        # appending both copies would corrupt the log permanently.
        # Dedup via a lag window over stream_name — not
        # dropDuplicates([stream, idx]), whose (stream, idx) hash
        # partitioning the downstream groupBy(stream_name) can't reuse —
        # so the append agg rides the window's exchange and the batch
        # shuffles once, not twice. The writable join runs first to
        # shrink the shuffle to writable streams only — with NO broadcast
        # hint: an explicit hint is honored regardless of relation size
        # (AQE upgrades joins to broadcast, it never demotes a user
        # hint), and on the >cap distributed path writable can be
        # millions of streams in a catch-up batch — collecting those for
        # a forced broadcast would defeat the O(DRIVER_REPORT_CAP)
        # driver-memory guarantee. Below the auto-broadcast threshold
        # (the ≤cap steady state) Spark still picks a broadcast join on
        # its own; above it, a shuffle join is the right plan.
        dw = Window.partitionBy("stream_name").orderBy("idx")
        novel = (
            batch.join(writable, "stream_name")
            .filter(F.col("idx") >= F.col("tail"))
            .drop("tail")
            .withColumn("_prev_idx", F.lag("idx").over(dw))
            .filter(F.col("_prev_idx").isNull() | (F.col("_prev_idx") != F.col("idx")))
            .drop("_prev_idx")
            .cache()
        )
        try:
            # per-stream append aggregate, materialized DISTRIBUTED to a
            # spool (writable non-empty ⇒ every writable stream has ≥1
            # novel row, so the spool is non-empty too)
            (
                novel.groupBy("stream_name")
                .agg(
                    F.count("*").alias("appended"),
                    (F.max("idx") + 1).alias("new_tail"),
                    # rides the same aggregate so unfold-bucket tracking
                    # costs no extra pass over the batch
                    F.max(F.col("is_unfold").cast("int")).alias("has_unfold"),
                )
                .write.mode("overwrite")
                .parquet(self._append_spool)
            )
            tail_stats = self.spark.read.schema(
                "stream_name string, appended long, new_tail long, has_unfold int"
            ).parquet(self._append_spool)
            cols = [f.name for f in self._empty_envelope().schema.fields]
            seg = f"seg-{uuid.uuid4().hex}"
            (
                novel.select(*cols)
                .withColumn("bucket", self._bucket_col())
                # one task per bucket: without this, partitionBy writes
                # (input partitions × touched buckets) tiny files
                .repartition("bucket")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(os.path.join(self.path, seg))
            )
            data = {b: list(s) for b, s in m["data"].items()}
            for d in os.listdir(os.path.join(self.path, seg)):
                if d.startswith("bucket="):
                    b = d.split("=", 1)[1]
                    data.setdefault(b, []).append(f"{seg}/{d}")
            # tails delta rides the same flip: data+tails stay consistent
            # even across a crash between writes and the pointer swap
            tdelta = f"t-{uuid.uuid4().hex}"
            tail_stats.select(
                "stream_name", F.col("new_tail").alias("tail")
            ).write.mode("overwrite").parquet(os.path.join(self.path, tdelta))
            tsegs = m["tails"] + [tdelta]
            if len(tsegs) > self.compact_after:
                tbase = f"t-{uuid.uuid4().hex}"
                (
                    self.spark.read.parquet(
                        *[os.path.join(self.path, s) for s in tsegs]
                    )
                    .groupBy("stream_name")
                    .agg(F.max("tail").alias("tail"))
                    .write.mode("overwrite")
                    .parquet(os.path.join(self.path, tbase))
                )
                tsegs = [tbase]
            ub_old = m.get("unfold_buckets")
            if ub_old is None:
                new_ub = None  # legacy store: unknown until unfold_compact derives it
            else:
                # bounded job over the append spool (≤ n_buckets rows out):
                # buckets receiving unfold rows this sync join the tracked set
                touched_ub = {
                    str(r.b)
                    for r in tail_stats.filter(F.col("has_unfold") == 1)
                    .select(self._bucket_col().cast("string").alias("b"))
                    .distinct()
                    .collect()
                }
                new_ub = sorted(set(ub_old) | touched_ub)
            # change-data feed: the CDC head rides the SAME atomic flip
            # as the data (manifest = authority), then is materialized
            # into the per-seq log. A crash between flip and
            # materialize loses nothing: cdc_repair() re-derives the
            # record from the manifest on the next write or read, so a
            # committed sync can never silently vanish from the feed.
            cdc_repair(self.path)  # heal a predecessor's crash first
            prev_seq = (m.get("cdc") or {}).get("seq")
            if prev_seq is None:
                # legacy store (pre-CDC manifest): seed from the log
                prev_seq = cdc_log_max(self.path)
            new_cdc = {
                "seq": prev_seq + 1,
                "segments": [
                    f"{seg}/{d}"
                    for d in sorted(os.listdir(os.path.join(self.path, seg)))
                    if d.startswith("bucket=")
                ],
            }
            self.manifest.flip(
                {
                    **m,
                    "data": data,
                    "tails": tsegs,
                    "unfold_buckets": new_ub,
                    "cdc": new_cdc,
                    "n_buckets": self.n_buckets,
                }
            )
            cdc_repair(self.path)
            return tail_stats
        finally:
            novel.unpersist()

    def vacuum(self, grace_s: float = 3600.0) -> list[str]:
        """Remove orphaned segment dirs (crash between write and flip, or
        a lost retire-grace list) older than ``grace_s``; also GC
        change-feed records made unreadable by compaction (a referenced
        segment is gone ⇒ the record can never serve again — the
        CDF-past-retention rule), so the CDC log stays bounded by
        retention instead of growing with total commits forever."""
        with self._commit():
            removed = self.manifest.vacuum(grace_s)
            head = (self._load().get("cdc") or {}).get("seq", 0)
            for rec in cdc_list_records(self.path):
                if rec["seq"] >= head:
                    continue  # never GC the manifest's own head
                if any(
                    not os.path.exists(os.path.join(self.path, s))
                    for s in rec["segments"]
                ):
                    try:
                        os.unlink(
                            os.path.join(
                                _cdc_dir_of(self.path),
                                f"c-{rec['seq']:012d}.json",
                            )
                        )
                        removed.append(f"_cdc/c-{rec['seq']:012d}.json")
                    except FileNotFoundError:
                        pass
            return removed

    # ---- change-data feed (the Cosmos change-feed / Delta CDF analog;
    #      SURVEY §2.1 S1: consumers react to committed appends) ----------
    def _cdc_records(
        self, since_seq: int = 0, limit: "int | None" = None
    ) -> "list[dict]":
        cdc_repair(self.path)  # heal a crashed writer's missing head
        return cdc_list_records(self.path, since_seq, limit=limit)

    def cdc_latest_seq(self) -> int:
        """Newest committed change-feed sequence (0 = empty feed).
        Filename/manifest math only — no record parses."""
        head = (self._load().get("cdc") or {}).get("seq", 0)
        return max(head, cdc_log_max(self.path))

    def cdc_earliest_readable(self) -> int:
        """Smallest ``since_seq`` from which :meth:`changes` can serve
        without a retention gap — compaction/prune fold old segments
        away, exactly like VACUUM bounds Delta's CDF lookback."""
        recs = self._cdc_records()
        earliest = self.cdc_latest_seq()  # read-from-here always works
        expected = None
        for rec in reversed(recs):
            if expected is not None and rec["seq"] != expected:
                break  # a GC'd record: the run ends here, gap-blindness
                # would otherwise report a readable range spanning it
            if all(
                os.path.exists(os.path.join(self.path, s))
                for s in rec["segments"]
            ):
                earliest = rec["seq"] - 1
                expected = rec["seq"] - 1
            else:
                break
        return earliest

    def changes(self, since_seq: int = 0) -> "tuple[DataFrame, int]":
        """Envelope rows appended by syncs AFTER ``since_seq``, plus the
        new watermark to checkpoint: ``(df, latest_seq)``.

        At-least-once per appended row (a sync's rows appear under
        exactly one seq; re-reading a seq re-serves its rows — pair
        with write-pos dedup downstream, the engine's standard
        contract). Deletions (prune) and rewrites (compaction) do NOT
        appear — this is an append feed, the reference change feed's
        semantics. A reader lagging past compaction gets
        :class:`CdcRetentionError` and must re-seed from a ``read()``
        snapshot + ``cdc_latest_seq()``, the standard CDF recovery."""
        recs = self._cdc_records(since_seq)
        cdc_check_contiguous(recs, since_seq)
        if not recs:
            return self._empty_envelope(), since_seq
        paths = []
        for rec in recs:
            for s in rec["segments"]:
                p = os.path.join(self.path, s)
                if not os.path.exists(p):
                    raise CdcRetentionError(
                        f"change-feed seq {rec['seq']} references "
                        f"compacted-away segment {s}; re-seed from a "
                        f"snapshot (read() + cdc_latest_seq()="
                        f"{self.cdc_latest_seq()}) or start from "
                        f"cdc_earliest_readable()="
                        f"{self.cdc_earliest_readable()}"
                    )
                paths.append(p)
        return self.spark.read.parquet(*paths), recs[-1]["seq"]

    # ---- the pruner (W2) ---------------------------------------------------
    def prune(self, requests: DataFrame) -> DataFrame:
        """Delete events with ``idx <= until_idx`` per stream.
        ``requests``: (stream_name, until_idx). Returns
        (stream_name, deleted, remaining).

        Rewrites ONLY the buckets the requested streams hash into —
        pruning a few streams of a 100 TB store touches a few bucket
        partitions, not the table."""
        with self._commit():
            return self._prune_locked(requests)

    def _prune_locked(self, requests: DataFrame) -> DataFrame:
        m = self._load()
        self._check_fanout(m)
        # one row per stream, highest watermark wins: duplicate request
        # rows (a redelivered or unioned retention batch) would fan the
        # event join out and write each surviving event once PER
        # REQUEST ROW into the rewritten segment — permanent duplicate
        # rows in the store. Deletion-by-watermark is idempotent, so
        # max() is the correct merge.
        requests = requests.groupBy("stream_name").agg(
            F.max("until_idx").alias("until_idx")
        )
        touched = {
            str(r.b)
            for r in requests.select(
                self._bucket_col().cast("string").alias("b")
            ).distinct().collect()
        }
        touched &= set(m["data"])
        if not touched:
            return self.spark.createDataFrame(
                [], "stream_name string, deleted long, remaining long"
            )
        current = self.read(buckets=touched)
        # no broadcast hint: a mass-retention prune can carry millions of
        # request rows, and an explicit hint is honored regardless of
        # size (AQE never demotes it) — Spark auto-broadcasts small
        # request sets on its own, same rationale as _append_novel
        tagged = current.join(requests, "stream_name", "left")
        survivors = tagged.filter(
            F.col("until_idx").isNull() | (F.col("idx") > F.col("until_idx"))
        ).drop("until_idx")
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
        )
        # materialize before the rewrite retires the segments it reads
        # (bounded: one row per pruned stream) — spooled distributed,
        # never row-per-stream on the driver; prune's own rotation so a
        # held sync report can't be reclaimed by prune traffic
        spool = self._prune_spool.next()
        report.write.mode("overwrite").parquet(spool)
        self._prune_spool.done(spool)
        report = self.spark.read.schema(
            "stream_name string, deleted long, remaining long"
        ).parquet(spool)
        self._rewrite_buckets(m, touched, survivors)
        return report

    def _rewrite_buckets(
        self,
        m: dict,
        buckets: "set[str]",
        replacement: DataFrame,
        unfold_buckets: "list[str] | None | str" = "keep",
    ) -> None:
        """Replace the segment lists of ``buckets`` with one compacted
        segment holding ``replacement`` (already filtered to those
        buckets); all other buckets' segments are untouched.

        ``unfold_buckets``: the tracked unfold-bearing set to record —
        default ``"keep"`` preserves the manifest's current set (always
        a safe superset: prune/compact never ADD unfold rows to a
        bucket); unfold_compact passes the exact recomputed set."""
        cols = [f.name for f in self._empty_envelope().schema.fields]
        seg = f"seg-{uuid.uuid4().hex}"
        (
            replacement.select(*cols)
            .withColumn("bucket", self._bucket_col())
            .repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(self.path, seg))
        )
        data = {b: list(s) for b, s in m["data"].items() if b not in buckets}
        seg_dir = os.path.join(self.path, seg)
        for d in os.listdir(seg_dir):
            if d.startswith("bucket="):
                data.setdefault(d.split("=", 1)[1], []).append(f"{seg}/{d}")
        ub = m.get("unfold_buckets") if unfold_buckets == "keep" else unfold_buckets
        # {**m, ...}: carry every other manifest key (notably the CDC
        # head) through rewrites untouched
        self.manifest.flip({**m, "data": data, "unfold_buckets": ub})

    def compact_bucket(self, bucket: str) -> None:
        """Fold one bucket's segment list into a single segment — the
        OPTIMIZE analog; run opportunistically per bucket, never table-wide."""
        with self._commit():
            m = self._load()
            # _rewrite_buckets re-hashes the survivors with _bucket_col()
            # — on an unstamped legacy manifest that would interleave a
            # second layout, exactly what the stamping contract refuses
            # everywhere else streams are hashed to buckets.
            self._check_fanout(m)
            if len(m["data"].get(bucket, [])) <= 1:
                return
            self._rewrite_buckets(m, {bucket}, self.read(buckets={bucket}))

    def bucket_segment_counts(self) -> "dict[str, int]":
        """Per-bucket data-segment counts — the read-amplification gauge
        (each sync appends one segment per touched bucket; a reader of
        bucket b opens every one of its segments). Exported as
        ``propulsion_store_segments`` by MetricsExporter."""
        m = self._load()
        return {b: len(s) for b, s in m["data"].items()}

    def auto_compact(
        self, max_segments: int = 16, max_buckets: "int | None" = None
    ) -> "list[str]":
        """Compaction POLICY over :meth:`compact_bucket`: fold every
        bucket whose segment count exceeds ``max_segments``, worst
        first, optionally capped at ``max_buckets`` per call so the
        maintenance cost is bounded and spreadable across idle windows.
        Returns the buckets compacted.

        Deliberately NOT run inside sync(): compaction rewrites
        O(bucket) data while sync writes O(batch) — coupling them would
        make write latency proportional to accumulated history. The
        operator (or the ``compact`` CLI verb / an idle-trigger hook)
        runs this at its own cadence; every compaction is its own
        fenced commit, so it interleaves safely with live syncs."""
        counts = self.bucket_segment_counts()
        worst = sorted(
            (b for b, n in counts.items() if n > max_segments),
            key=lambda b: -counts[b],
        )
        if max_buckets is not None:
            worst = worst[:max_buckets]
        for b in worst:
            self.compact_bucket(b)
        return worst

    def unfold_compact(self) -> None:
        """Keep only the freshest unfold set per (stream, event_type)
        (ref: Streams.fs:143-147) — run opportunistically. OPENS only
        the buckets the manifest tracks as unfold-bearing (recorded at
        append time from the same aggregate that maintains the tails),
        so the invocation cost is O(unfold buckets), never a full-store
        scan; a legacy manifest without the tracked set pays one
        derivation scan and records it for every later run."""
        with self._commit():
            m = self._load()
            self._check_fanout(m)
            ub = m.get("unfold_buckets")
            if ub is None:  # legacy store: derive once, record below
                ub = [
                    str(r.b)
                    for r in self.read()
                    .filter(F.col("is_unfold"))
                    .select(self._bucket_col().cast("string").alias("b"))
                    .distinct()
                    .collect()
                ]
            touched = set(ub) & set(m["data"])
            if not touched:
                if m.get("unfold_buckets") is None:
                    self.manifest.flip({**m, "unfold_buckets": sorted(touched)})
                return
            current = self.read(buckets=touched)
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
            # the compacted buckets still hold (exactly the freshest)
            # unfolds — the tracked set is precisely `touched` afterwards
            self._rewrite_buckets(
                m, touched, events.unionByName(unfolds), unfold_buckets=sorted(touched)
            )
