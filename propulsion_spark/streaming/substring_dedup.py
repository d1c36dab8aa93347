"""Streaming (cross-batch) exact repeated-substring dedup — the
micro-batch twin of ``operators/substring_dedup.py`` (Lee et al. 2021
ExactSubstr, occurrence level), following the keeper-registry
discipline its cross-document sibling (``trim_duplicated_spans`` →
SemDedupStream / MediaDedupStream) already has: each micro-batch's
n-gram window counts fold into a DURABLE gram registry, so a passage
first seen last week is masked when it reappears this week without
re-scanning last week's corpus.

Semantics — the streaming-safe variant is ``keep_first``: the
corpus-canonical occurrence (min (doc_id, start), the batch
operator's definition) survives, every later occurrence is masked as
it arrives. The batch default ("mask ALL occurrences, leaving
potentially zero copies") is batch-only by nature: it would have to
retro-mask documents already emitted in earlier micro-batches.

Equivalence (pinned by test): with ``min_dup=2`` and batches arriving
in canonical order (a gram's min-(doc_id, start) occurrence is in the
earliest batch containing it — true for any monotone doc-id stream),
the union of streamed outputs is EXACTLY
``mask_repeated_ngrams(union, keep_first=True)``: a non-canonical
occurrence always arrives at or after its canonical copy, so the
registry count has already reached 2 when it is scored. With
``min_dup > 2`` the stream is the documented greedy prefix (the
SemDedupStream "clusters never merge retroactively" trade):
occurrences emitted before the corpus-wide count crossed the
threshold stay unmasked.

Scale shape:

- per batch: one map-only gram pass (the batch operator's), ONE
  map-side-combined count shuffle, O(batch distinct grams) registry
  delta write, one bucket-pruned registry read for the totals join.
- registry state is O(distinct grams) rows of
  ``(gh, gh2, cnt, first_doc, first_start)`` — the 96-bit pair key of
  the batch operator (exact-modulo-hash; see ``_gram_hits``), counts
  summed across batch partitions at read time.
- lifecycle = the serving-index discipline (NOT _DeltaRegistry, whose
  resolve is a dedup — counts must SUM, which makes replayed deltas
  poisonous): partitioned by ``(_batch_id, _bkt)``, appends are
  lease-fenced dynamic partition overwrites (a replay rewrites its own
  partitions with identical counts), ``compact()`` folds batches into
  one aggregated ``_batch_id=0`` generation under the
  ``pipelines/lineage.py`` fold LEDGER (a set, not a watermark:
  callers may derive batch ids from batch CONTENT — see
  CurationPipeline — and content hashes aren't monotone), so a replay
  of a folded batch no-ops instead of double-counting. Batch ids are
  ≥ 1; generation 0 is the fold's own.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: gram-hash buckets: the registry's partition fan-out (a small batch
#: touching few buckets prunes its totals read; compaction and the
#: totals aggregation shuffle on a bounded key space)
N_BUCKETS = 16


class GramRegistry:
    """Durable cross-batch gram-count table with the serving-index
    lifecycle: fenced mutations, per-batch idempotent appends, fold
    watermark, ``auto_compact`` policy."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.lease_counters = {"heartbeats": 0, "steals": 0, "lost": 0}
        self.lease_timeout_s = 60.0

    def _fenced(self):
        from propulsion_spark.pipelines.fencing import index_lease

        return index_lease(
            self.path, self.lease_counters, timeout_s=self.lease_timeout_s
        )

    @property
    def _counts_path(self) -> str:
        return os.path.join(self.path, "gram_counts")

    @staticmethod
    def _bkt():
        return F.pmod(F.col("gh"), F.lit(N_BUCKETS)).cast("int")

    def append_counts(self, counts: DataFrame, batch_id: int) -> None:
        """Add one batch's per-gram aggregates
        ``(gh, gh2, cnt, first_doc, first_start)``. Idempotent per
        ``batch_id`` (dynamic partition overwrite); a replay of a batch
        ``compact()`` already folded no-ops via the fold LEDGER
        (pipelines/lineage.py — a set, not a watermark, because
        content-derived batch ids aren't monotone). ``batch_id`` must
        be ≥ 1: generation 0 is the fold's own, and an append landing
        there would dynamic-overwrite folded partitions."""
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
            (
                counts.select(
                    "gh", "gh2", "cnt", "first_doc", "first_start"
                )
                .withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))
                .withColumn("_bkt", self._bkt())
                .repartition("_bkt")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id", "_bkt")
                .parquet(self._counts_path)
            )

    def _read(self) -> "DataFrame | None":
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.parquet(self._counts_path)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return None
            raise

    def totals(self, buckets: "list[int] | None" = None) -> DataFrame:
        """Resolved corpus-wide view: ``(gh, gh2, cnt, first_doc,
        first_start)`` with counts SUMMED and the canonical occurrence
        MIN-folded across batches. ``buckets`` prunes the scan to the
        touched ``_bkt`` partitions (a batch's bucket list is ≤
        N_BUCKETS driver ints)."""
        raw = self._read()
        if raw is None:
            return self.spark.createDataFrame(
                [],
                "gh long, gh2 int, cnt long, first_doc long, first_start long",
            )
        if buckets is not None:
            raw = raw.filter(F.col("_bkt").isin([int(b) for b in buckets]))
        return (
            raw.groupBy("gh", "gh2")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.min(F.struct("first_doc", "first_start")).alias("_f"),
            )
            .select(
                "gh",
                "gh2",
                "cnt",
                F.col("_f.first_doc").alias("first_doc"),
                F.col("_f.first_start").alias("first_start"),
            )
        )

    def n_batches(self) -> int:
        raw = self._read()
        if raw is None:
            return 0
        return raw.select("_batch_id").distinct().count()

    def compact(self) -> None:
        """Fold every batch partition into one aggregated
        ``_batch_id=0`` generation (fenced; the fold LEDGER refuses
        later replays of the folded batches)."""
        from propulsion_spark.pipelines.lineage import record_folded_ids

        with self._fenced():
            raw = self._read()
            if raw is None:
                return
            # exactly the ids this fold absorbs (bounded by the
            # compaction cadence; generation 0 is the previous fold,
            # refreshed in place, never a replayable batch)
            folded_ids = [
                r["_batch_id"]
                for r in raw.select("_batch_id").distinct().collect()
                if r["_batch_id"] != 0
            ]
            folded = (
                self.totals()
                .withColumn("_batch_id", F.lit(0).cast("long"))
                .withColumn("_bkt", self._bkt())
                .localCheckpoint(eager=True)  # pin before the overwrite
            )
            (
                folded.repartition("_bkt")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "static")
                .partitionBy("_batch_id", "_bkt")
                .parquet(self._counts_path)
            )
            record_folded_ids(self.spark, self.path, folded_ids)

    def auto_compact(self, max_batches: int = 16) -> "dict | None":
        """The serving-index maintenance policy: no-op at or below
        ``max_batches``, one fenced fold past it."""
        n = self.n_batches()
        if n == 0 or n <= max_batches:
            return None
        self.compact()
        return {"n_batches_before": n, "n_batches_after": self.n_batches()}


class SubstrDedupStream:
    """Cross-batch occurrence-level substring dedup over a durable
    gram registry. ``process_batch`` returns the batch masked
    (``(doc_id, text, masked_text, n_masked_tokens)`` — the batch
    operator's schema); ``run_batch`` writes it idempotently;
    ``stream_into`` wires foreachBatch."""

    def __init__(
        self,
        spark: SparkSession,
        registry_path: str,
        n: int = 8,
        min_dup: int = 2,
        auto_compact: "dict | None" = None,
    ):
        self.spark = spark
        self.registry = GramRegistry(spark, registry_path)
        self.n = int(n)
        self.min_dup = int(min_dup)
        self.auto_compact = auto_compact
        self.stats = {"seen": 0, "masked_docs": 0, "masked_tokens": 0}

    def process_batch(self, df: DataFrame, batch_id: int = 1) -> DataFrame:
        """One micro-batch: gram pass → register this batch's counts →
        score the batch against the post-registration totals → mask.

        Register-then-read makes replays exactly deterministic: a
        replayed batch's registration no-ops (same partition rewrite,
        or the fold watermark), so it scores against the SAME totals
        and emits the SAME masked rows."""
        from propulsion_spark.operators.substring_dedup import (
            _gram_hits,
            coalesce_spans,
            mask_spans,
        )

        docs = df.select("doc_id", "text")
        grams = _gram_hits(docs, self.n).persist()
        try:
            counts = grams.groupBy("gh", "gh2").agg(
                F.count("*").alias("cnt"),
                F.min(F.struct("doc_id", "start")).alias("_f"),
            ).select(
                "gh",
                "gh2",
                "cnt",
                F.col("_f.doc_id").alias("first_doc"),
                F.col("_f.start").alias("first_start"),
            )
            self.registry.append_counts(counts, batch_id)
            # totals read the WRITTEN registry (this batch included),
            # pruned to the batch's gram buckets — ≤ N_BUCKETS ints of
            # driver control plane
            buckets = [
                r["b"]
                for r in grams.select(
                    F.pmod(F.col("gh"), F.lit(N_BUCKETS))
                    .cast("int")
                    .alias("b")
                )
                .distinct()
                .collect()
            ]
            dup = self.registry.totals(buckets).filter(
                F.col("cnt") >= self.min_dup
            )
            hits = (
                grams.join(dup, ["gh", "gh2"])
                .filter(
                    ~(
                        (F.col("doc_id") == F.col("first_doc"))
                        & (F.col("start") == F.col("first_start"))
                    )
                )
                .select("doc_id", "start")
            )
            out = mask_spans(
                docs, coalesce_spans(hits, self.n)
            ).localCheckpoint(eager=True)
            agg = out.agg(
                F.count("*").alias("n"),
                F.count_if(F.col("n_masked_tokens") > 0).alias("m"),
                F.sum("n_masked_tokens").alias("tok"),
            ).collect()[0]
            self.stats["seen"] += agg["n"]
            self.stats["masked_docs"] += agg["m"] or 0
            self.stats["masked_tokens"] += agg["tok"] or 0
            if self.auto_compact is not None:
                # safe here: `out` is already pinned to blocks, so the
                # registry fold can't invalidate its lineage; every
                # consumer (run_batch, CurationPipeline) inherits the
                # maintenance policy
                self.registry.auto_compact(**self.auto_compact)
            return out
        finally:
            grams.unpersist()

    def run_batch(self, df: DataFrame, batch_id: int, out_path: str) -> None:
        # an empty micro-batch writes NOTHING (the repo's zero-row
        # partitionBy pitfall: a fresh out_path would become a
        # file-less, unreadable dir — the r13 review's finding)
        if df.isEmpty():
            return
        (
            self.process_batch(df, batch_id)
            .withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))
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
        """Continuous ingestion: foreachBatch with the micro-batch id
        as the idempotence key (the SemDedupStream shape)."""
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.run_batch(df, bid + 1, out_path)
            )
            .option("checkpointLocation", checkpoint_location)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )
