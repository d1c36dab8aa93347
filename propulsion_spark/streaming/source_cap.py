"""Streaming (cross-batch) per-source cap — the micro-batch twin of
``operators/textops.py::cap_per_source`` (the RefinedWeb/Gopher
domain-share bound), completing the curation family's streaming-twin
set: splits/mixture/epochs are pure per-doc functions and stream for
free, but the cap is corpus-STATE-dependent by design (the keep rate
for a source tightens as the source grows), so a continuous ingest
needs a durable per-source count registry — this module.

Rule — why the stream cannot reuse the batch operator's residue rule:
``h % src_cnt < cap`` selects a DIFFERENT residue set at every count,
so the admitted sets at successive counts are not nested — a doc
rejected at N=1000 could be admitted under the final N=5000 rule, and
a stream cannot resurrect a doc it already dropped. The streaming
rule is the MONOTONE threshold form of the same bound:

    admit(D)  ⟺  (h64(D) % 2^30) · N  <  cap · 2^30
              ⟺  u(D) < cap / N    with u a 30-bit uniform in [0,1)

As N grows the threshold cap/N only shrinks, so admitted sets are
NESTED: everything the final rule admits was admitted on arrival, and
the stream's divergence is pure OVER-admission (docs admitted while
their source was still small). Expected kept = cap at every source
size; a source at or under the cap passes whole (u < 1 ≤ cap/N);
integer arithmetic throughout (r·N < 2^30·2^33 stays inside BIGINT;
the 2^-30 resolution floor engages only past ~10^9·cap docs in ONE
source — documented, and far beyond the residue rule's old 10^4·cap
cliff). ``cap_per_source_monotone`` is the batch reference of this
exact rule; ``retro_thin`` converges a finished stream's output to it
EXACTLY (pinned by test) because of the nesting.

Greedy semantics + repair (the SubstrDedupStream mask-debt shape):
per batch, docs are admitted against the POST-registration totals —
replay-deterministic for foreachBatch's last-uncommitted-batch replay
(same no-op registration, same totals). Early batches over-admit
(cap/N was looser); ``retro_thin(out_path)`` is the bounded batch
repair that re-evaluates every emitted doc under the FINAL counts and
drops the excess — idempotent, and ≡ the batch reference over the
full input union.

Scale shape: per batch ONE map-side-combined count aggregate over the
batch + an O(batch sources) registry delta write + a bucket-pruned
totals read + one join back. The totals join carries NO broadcast
hint: the key space is the source/domain set, tiny for curated
corpora (AQE broadcasts it by runtime size) but 10^7–10^8 rows for
raw-web domain capping — the exact workload the cap exists for —
where a forced broadcast would bypass autoBroadcastJoinThreshold and
OOM the executors instead of degrading to a shuffle join. Registry
state is O(distinct sources) rows of (source, cnt); the lifecycle
(fencing,
persisted fan-out, fold ledger, auto_compact) is
``pipelines/registry.py::FencedStoreLifecycle`` — this registry is
the first written natively against the r14 base.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propulsion_spark.operators.dedup import SPARK_H64
from propulsion_spark.pipelines.registry import FencedStoreLifecycle

#: resolution of the uniform u(D): 30 bits keeps r·N inside BIGINT for
#: sources up to 2^33 docs while floor effects stay unreachable
_RES_BITS = 30
_RES = 1 << _RES_BITS


def _admit_expr(cap: int, salt: str, id_col: str = "doc_id"):
    """admit ⟺ (h % 2^30) · src_cnt < cap · 2^30 (see module doc)."""
    h = F.expr(SPARK_H64.format(x=f"concat(cast({id_col} as string), '{salt}')"))
    r = F.pmod(h, F.lit(_RES)).cast("long")
    return (r * F.col("src_cnt")) < F.lit(int(cap) * _RES)


def cap_per_source_monotone(
    docs: DataFrame,
    max_per_source: int = 10,
    salt: str = "-srccap",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch reference of the stream's monotone-threshold rule: the
    corpus thinned to ≈``max_per_source`` docs per source under
    ``u(D) < cap/src_cnt``. Same guarantees as
    ``textops.cap_per_source`` (expected kept = cap at every source
    size, at/under-cap sources pass whole, deterministic), different
    tie-breaking set — use THIS one when a streaming ingest must
    later converge to the batch answer (``retro_thin``), the residue
    rule otherwise.

    No broadcast hint on the count join (the ``cap_per_source``
    rationale): AQE broadcasts by the table's RUNTIME size, so a
    curated corpus's source table still broadcasts while a raw-web
    crawl's 10^7–10^8 distinct domains degrade to a shuffle join
    instead of OOMing — the crawl is the workload the cap is FOR."""
    cnts = docs.groupBy(source_col).agg(F.count("*").alias("src_cnt"))
    return (
        docs.join(cnts, source_col)
        .filter(_admit_expr(int(max_per_source), salt, id_col=id_col))
        .drop("src_cnt")
    )


class SourceCountRegistry(FencedStoreLifecycle):
    """Durable per-source document counts with the shared store
    lifecycle: fenced mutations, per-batch idempotent appends (dynamic
    partition overwrite), fold LEDGER (content-derived batch ids need
    the set, not a watermark — the GramRegistry rationale), persisted
    bucket fan-out, ``auto_compact``. Rows: ``(source, cnt)`` summed
    across batches at read time."""

    LABEL = "source-count registry"
    DEFAULT_BUCKETS = 16

    @property
    def _counts_path(self) -> str:
        return os.path.join(self.path, "source_counts")

    @staticmethod
    def _bkt(n: int):
        return F.pmod(
            F.expr(SPARK_H64.format(x="source")), F.lit(int(n))
        ).cast("int")

    def append_counts(self, counts: DataFrame, batch_id: int) -> None:
        """Add one batch's ``(source, cnt)`` aggregate. Idempotent per
        ``batch_id``; a replay of a folded batch no-ops via the fold
        ledger. ``batch_id`` must be ≥ 1 (generation 0 is the fold's)."""
        from propulsion_spark.pipelines.lineage import is_folded_id

        if batch_id < 1:
            raise ValueError(
                f"batch_id must be >= 1 (got {batch_id}); generation 0 "
                "is reserved for compacted folds"
            )
        if counts.isEmpty():
            return  # zero-row partitionBy writes poison the dir
        with self._fenced():
            if is_folded_id(self.spark, self.path, batch_id):
                return
            n = self._ensure_fanout()
            (
                counts.select("source", "cnt")
                .withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))
                .withColumn("_bkt", self._bkt(n))
                .repartition("_bkt")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id", "_bkt")
                .parquet(self._counts_path)
            )

    def _read(self) -> "DataFrame | None":
        from propulsion_spark.fsio import read_parquet_if_exists

        # the counts table's shape is a write-path contract (every
        # append/compact produces the same columns), so the schema
        # inferred on the first read serves every later one — one
        # footer-inference job per instance instead of per batch (r16).
        # Deliberately NOT fence-cleared: mutations add/replace
        # partitions, they never change the shape.
        sch = getattr(self, "_counts_schema", None)
        df = read_parquet_if_exists(self.spark, self._counts_path, schema=sch)
        if df is not None and sch is None:
            self._counts_schema = df.schema
        return df

    def totals(self, buckets: "list[int] | None" = None) -> DataFrame:
        """(source, src_cnt) summed across batches; ``buckets`` prunes
        the scan to the touched ``_bkt`` partitions."""
        raw = self._read()
        if raw is None:
            return self.spark.createDataFrame([], "source string, src_cnt long")
        if buckets is not None:
            raw = raw.filter(F.col("_bkt").isin([int(b) for b in buckets]))
        return raw.groupBy("source").agg(F.sum("cnt").alias("src_cnt"))

    def n_batches(self) -> int:
        raw = self._read()
        if raw is None:
            return 0
        return raw.select("_batch_id").distinct().count()

    def compact(self, n_buckets: "int | None" = None) -> None:
        """Fold every batch into one ``_batch_id=0`` generation —
        ledger FIRST, then the persisted fan-out (rebucket knob), then
        the overwrite: the r14 marker-first discipline."""
        from propulsion_spark.pipelines.lineage import record_folded_ids

        with self._fenced():
            raw = self._read()
            if raw is None:
                return
            n = int(n_buckets) if n_buckets is not None else self.n_buckets()
            folded_ids = [
                r["_batch_id"]
                for r in raw.select("_batch_id").distinct().collect()
                if r["_batch_id"] != 0
            ]
            folded = (
                self.totals()
                .select("source", F.col("src_cnt").alias("cnt"))
                .withColumn("_batch_id", F.lit(0).cast("long"))
                .withColumn("_bkt", self._bkt(n))
                .localCheckpoint(eager=True)  # pin before the overwrite
            )
            record_folded_ids(self.spark, self.path, folded_ids)
            self._set_fanout(n)
            (
                folded.repartition("_bkt")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "static")
                .partitionBy("_batch_id", "_bkt")
                .parquet(self._counts_path)
            )


class CapPerSourceStream:
    """Cross-batch per-source cap over a durable count registry.
    ``process_batch`` returns the batch's ADMITTED rows;
    ``run_batch`` writes them idempotently (dynamic overwrite keyed by
    batch id); ``stream_into`` wires foreachBatch; ``retro_thin``
    converges finished output to the batch reference exactly."""

    def __init__(
        self,
        spark: SparkSession,
        registry_path: str,
        max_per_source: int = 10,
        salt: str = "-srccap",
        source_col: str = "source",
        id_col: str = "doc_id",
        auto_compact: "dict | None" = None,
        n_buckets: "int | None" = None,
    ):
        self.spark = spark
        self.registry = SourceCountRegistry(
            spark, registry_path, n_buckets=n_buckets
        )
        self.cap = int(max_per_source)
        self.salt = salt
        self.source_col = source_col
        self.id_col = id_col
        self.auto_compact = auto_compact
        self.stats = {"seen": 0, "admitted": 0}

    def process_batch(self, df: DataFrame, batch_id: int = 1) -> DataFrame:
        """One micro-batch: register the batch's per-source counts →
        admit each doc against the POST-registration totals
        (register-then-read: a foreachBatch replay's registration
        no-ops and scores against the same totals). Early batches
        over-admit by design (the threshold cap/N was looser when N
        was smaller) — the nested-set rule guarantees the excess is
        exactly what :meth:`retro_thin` later drops, never the other
        way around."""
        src = F.col(self.source_col)
        # persisted (r15): the empty probe inside append_counts and the
        # registry write both evaluate this aggregate — cache computes
        # the batch count shuffle once
        counts = (
            df.groupBy(src.alias("source"))
            .agg(F.count("*").alias("cnt"))
            .persist()
        )
        try:
            self.registry.append_counts(counts, batch_id)
            nb = self.registry.n_buckets()
            # r15: the bucket list is the batch's just-written
            # (_batch_id, _bkt) partition dirs — a driver FS listing,
            # not a distinct+collect Spark job over the batch. Folded
            # replays (dirs gone, append no-opped) fall back to the old
            # derivation; so do empty batches (nothing written).
            from propulsion_spark.fsio import fs_list_subdirs

            bdirs = fs_list_subdirs(
                self.spark,
                os.path.join(
                    self.registry._counts_path,
                    f"_batch_id={int(batch_id)}",
                ),
            )
            if bdirs is not None:
                buckets = [
                    int(d.split("=", 1)[1])
                    for d in bdirs
                    if d.startswith("_bkt=")
                ]
            else:
                buckets = [
                    r["b"]
                    for r in df.select(
                        F.pmod(
                            F.expr(SPARK_H64.format(x=self.source_col)),
                            F.lit(nb),
                        )
                        .cast("int")
                        .alias("b")
                    )
                    .distinct()
                    .collect()
                ]
            # no broadcast hint: the totals table is O(distinct sources
            # in this batch's buckets) — tiny for curated corpora (AQE
            # still broadcasts it), 10^7+ rows for raw-web domain
            # capping, where a forced broadcast would OOM exactly the
            # target workload
            tot = self.registry.totals(buckets)
            # persisted (r15): the stats aggregate and the admitted
            # output pin below both evaluate this join — one compute
            flagged = df.join(
                tot.withColumnRenamed("source", self.source_col),
                self.source_col,
            ).withColumn(
                "_admit",
                _admit_expr(self.cap, self.salt, id_col=self.id_col),
            ).persist()
            agg = flagged.agg(
                F.count("*").alias("n"),
                F.sum(F.col("_admit").cast("long")).alias("a"),
            ).collect()[0]
            self.stats["seen"] += agg["n"]
            self.stats["admitted"] += int(agg["a"] or 0)
            # pinned (r15, previously only under auto_compact): the
            # returned frame feeds run_batch's output write — without
            # the pin that write re-ran the whole totals-join+admit
            # chain a second time per batch
            out = (
                flagged.filter("_admit")
                .drop("_admit", "src_cnt")
                .localCheckpoint(eager=True)
            )
            flagged.unpersist()
            if self.auto_compact is not None:
                self.registry.auto_compact(**self.auto_compact)
            return out
        finally:
            counts.unpersist()

    def run_batch(self, df: DataFrame, batch_id: int, out_path: str) -> None:
        admitted_before = self.stats["admitted"]
        out = self.process_batch(df, batch_id)
        if self.stats["admitted"] == admitted_before:
            # all-dropped batch (tiny cap over huge sources) OR empty
            # input — either way nothing was admitted: the registry
            # registered any counts, but a zero-row partitionBy write
            # on a fresh out_path would poison the dir (r14 advice).
            # The admit rule is deterministic, so a replay skips the
            # write identically; nothing to overwrite, nothing lost.
            # (r15: this guard subsumes the old up-front df.isEmpty()
            # probe — one fewer action against the input per batch;
            # stream_into still short-circuits empty micro-batches
            # before reaching here.)
            return
        (
            out.withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    def stream_into(
        self,
        stream_df: DataFrame,
        out_path: str,
        checkpoint_location: str,
        **trigger,
    ):
        """Continuous ingestion. Registry/output batch ids are derived
        from batch CONTENT (``lineage.content_batch_id``), not the
        checkpoint's micro-batch counter: a later re-ingest with a
        FRESH checkpoint against the same registry would otherwise
        restart ids at 1 and dynamic-overwrite the first run's count
        rows instead of accumulating — undercounted totals and silent
        over-admission (r14 advice). Content ids make the registry
        checkpoint-lineage-free: the same BATCH re-delivered → same
        id (replay no-op), new docs → new id (accumulate). The
        guarantee is per batch content, so a fresh-checkpoint
        re-ingest of old data is idempotent only when the batch
        boundaries reproduce — run file sources with
        ``maxFilesPerTrigger=1`` (file-granular, reproducible
        batches; pinned by test) or point the fresh ingest at new
        data only. Differently-bounded overlapping deliveries
        accumulate as new batches: counts inflate, which errs toward
        OVER-thinning (the conservative direction for a cap) and is
        repaired exactly by clearing+rebuilding the registry, never
        silently under-counted as the old counter-keyed scheme did."""
        from propulsion_spark.pipelines.lineage import (
            content_batch_id_nonempty,
        )

        def _run(df: DataFrame, _bid: int) -> None:
            # ONE agg probes emptiness AND derives the content id
            # (r16) — the separate isEmpty was its own job per batch
            bid = content_batch_id_nonempty(df, self.id_col, self.source_col)
            if bid is None:
                return
            self.run_batch(df, bid, out_path)

        return (
            stream_df.writeStream.foreachBatch(_run)
            .option("checkpointLocation", checkpoint_location)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )

    def retro_thin(self, out_path: str, chunk_size: int = 1) -> "dict":
        """Repair pass: re-evaluate every EMITTED doc under the FINAL
        registry counts and drop the early over-admissions — after
        which the output is ``cap_per_source_monotone(input union)``
        row for row (pinned by test; the nested-set rule makes the
        final admitted set a subset of every batch's, so dropping is
        sufficient — nothing ever needs resurrecting). Idempotent.

        PARTITION-INCREMENTAL (r14 verdict #4): the admit verdict is
        per-row against the final counts, so each ``_batch_id``
        partition repairs independently under dynamic overwrite,
        resumable from the marker — a crash mid-repair re-does at
        most one partition, never the 100 TB output. An all-dropped
        partition is deleted outright; an all-dropped OUTPUT removes
        the dir (r14 advice — never a file-less husk). ``dropped`` /
        ``kept`` cover the partitions repaired THIS run."""
        from propulsion_spark.streaming.repair import (
            registry_fingerprint,
            repair_partitions,
        )

        tot = (
            self.registry.totals()
            .withColumnRenamed("source", self.source_col)
            .localCheckpoint(eager=True)  # one registry scan, reused
        )
        fp = registry_fingerprint(tot, self.source_col, "src_cnt")

        def _thin(part: DataFrame) -> DataFrame:
            return (
                part.join(tot, self.source_col)
                .filter(
                    _admit_expr(self.cap, self.salt, id_col=self.id_col)
                )
                .drop("src_cnt")
            )

        rep = repair_partitions(
            self.spark, out_path, "srccap", fp, _thin,
            chunk_size=chunk_size,
        )
        return {
            "dropped": rep["rows_before"] - rep["rows_after"],
            "kept": rep["rows_after"],
            **rep,
        }
