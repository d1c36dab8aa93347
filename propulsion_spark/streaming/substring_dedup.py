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

from propulsion_spark.pipelines.registry import FencedStoreLifecycle

#: DEFAULT gram-hash bucket fan-out for NEW registries (a small batch
#: touching few buckets prunes its totals read; compaction and the
#: totals aggregation shuffle on a bounded key space). The value an
#: EXISTING registry uses is persisted in its root (store_meta — the
#: r13 verdict's #1: a changed constant over an existing layout
#: silently mis-prunes); raise it per-registry at build time or via
#: the fenced ``compact(n_buckets=...)`` rebucket.
N_BUCKETS = 16


class GramRegistry(FencedStoreLifecycle):
    """Durable cross-batch gram-count table with the serving-index
    lifecycle (fenced mutations, per-batch idempotent appends, fold
    ledger, ``auto_compact`` policy, persisted fan-out) — the control
    plane rides :class:`~propulsion_spark.pipelines.registry.
    FencedStoreLifecycle` (r14, single-sourced); this class owns the
    sum-fold storage discipline only."""

    LABEL = "gram registry"
    DEFAULT_BUCKETS = N_BUCKETS

    @property
    def _counts_path(self) -> str:
        return os.path.join(self.path, "gram_counts")

    @staticmethod
    def _bkt(n: int):
        return F.pmod(F.col("gh"), F.lit(int(n))).cast("int")

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
            # first write persists the fan-out that shapes the layout;
            # later opens validate against it (store_meta)
            n = self._ensure_fanout()
            (
                counts.select(
                    "gh", "gh2", "cnt", "first_doc", "first_start"
                )
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

        # one footer-inference job per instance, not per batch (r16):
        # the counts table's shape is a write-path contract — see
        # SourceCountRegistry._read for the rationale
        sch = getattr(self, "_counts_schema", None)
        df = read_parquet_if_exists(self.spark, self._counts_path, schema=sch)
        if df is not None and sch is None:
            self._counts_schema = df.schema
        return df

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

    def compact(self, n_buckets: "int | None" = None) -> None:
        """Fold every batch partition into one aggregated
        ``_batch_id=0`` generation (fenced; the fold LEDGER refuses
        later replays of the folded batches). ``n_buckets`` REBUCKETS
        the fold — the only sanctioned way to change the fan-out
        (SCALE.md's "raise N_BUCKETS with corpus size" knob): the fold
        rewrites every partition anyway, and the persisted layout meta
        flips with it, so later opens route reads correctly. The
        meta-then-overwrite pair is not atomic (neither is the static
        overwrite itself); a compact that crashed between them is
        repaired by re-running compact — unpruned totals stay correct
        throughout."""
        from propulsion_spark.pipelines.lineage import record_folded_ids

        with self._fenced():
            raw = self._read()
            if raw is None:
                return
            n = int(n_buckets) if n_buckets is not None else self.n_buckets()
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
                .withColumn("_bkt", self._bkt(n))
                .localCheckpoint(eager=True)  # pin before the overwrite
            )
            # LEDGER FIRST, overwrite second (r13 advice): a crash
            # between the two leaves the batch partitions intact but
            # already ledgered — a replay no-ops (its rewrite would be
            # a content no-op anyway) and the NEXT compact simply
            # redoes the fold. The reverse order left a window where
            # folded data had no replay guard → double-counted grams.
            record_folded_ids(self.spark, self.path, folded_ids)
            self._set_fanout(n)
            (
                folded.repartition("_bkt")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "static")
                .partitionBy("_batch_id", "_bkt")
                .parquet(self._counts_path)
            )

    # auto_compact: the FencedStoreLifecycle template (no extra gauges)


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
        n_buckets: "int | None" = None,
    ):
        self.spark = spark
        self.registry = GramRegistry(spark, registry_path, n_buckets=n_buckets)
        self.n = int(n)
        self.min_dup = int(min_dup)
        self.auto_compact = auto_compact
        #: ``mask_debt`` gauges the greedy prefix's divergence from the
        #: batch operator (r13 verdict #3): occurrences EMITTED
        #: UNMASKED in earlier batches whose gram only later crossed
        #: ``min_dup`` — batch semantics would have masked them.
        #: Accrued exactly at each gram's crossing batch (pre-batch
        #: cnt < min_dup ≤ post-batch cnt): every earlier occurrence
        #: is debt except the corpus-canonical one when it lies in an
        #: earlier batch. In-memory monitoring counters (exported by
        #: ``register_substr_dedup``), not durable state — a replayed
        #: batch re-counts, like the other stages. Nonzero debt is the
        #: signal to schedule :meth:`retro_mask`.
        self.stats = {
            "seen": 0,
            "masked_docs": 0,
            "masked_tokens": 0,
            "mask_debt": 0,
        }

    def process_batch(self, df: DataFrame, batch_id: int = 1) -> DataFrame:
        """One micro-batch: gram pass → register this batch's counts →
        score the batch against the post-registration totals → mask.

        Register-then-read makes the STREAM-REPLAY case exactly
        deterministic: foreachBatch only ever replays the last
        uncommitted micro-batch, whose registration no-ops (same
        partition rewrite, or the fold ledger), so it scores against
        the SAME totals and emits the SAME masked rows. A
        content-derived batch id REDELIVERED after later batches have
        appended (the CurationPipeline case) also no-ops on
        registration but reads GROWN totals — it may mask MORE rows
        than the original run: the greedy keep_first drift
        (semantically safe — masking more duplicates never
        resurrects one — but not bit-identical)."""
        from propulsion_spark.operators.substring_dedup import (
            _gram_hits,
            coalesce_spans,
            mask_spans,
        )

        docs = df.select("doc_id", "text")
        grams = _gram_hits(docs, self.n).persist()
        counts = None
        try:
            # persisted (r15): THREE consumers re-ran this combine-heavy
            # aggregate from the gram cache — append_counts' empty probe,
            # the registry write itself, and the debt join inside the
            # combined stats action; the cache computes it once
            counts = grams.groupBy("gh", "gh2").agg(
                F.count("*").alias("cnt"),
                F.min(F.struct("doc_id", "start")).alias("_f"),
            ).select(
                "gh",
                "gh2",
                "cnt",
                F.col("_f.doc_id").alias("first_doc"),
                F.col("_f.start").alias("first_start"),
            ).persist()
            self.registry.append_counts(counts, batch_id)
            # totals read the WRITTEN registry (this batch included),
            # pruned to the batch's gram buckets — ≤ n_buckets ints of
            # driver control plane. The fan-out comes from the
            # registry's PERSISTED layout (store_meta), never a module
            # constant: a mismatch would route the pruned read to the
            # wrong partitions (missed masks, no error).
            #
            # r15: the bucket list is the batch's OWN just-written
            # (_batch_id=bid, _bkt=…) partition dirs — one driver FS
            # listing instead of the distinct+collect Spark job the
            # grams cache used to pay per batch. A replay whose batch
            # was already FOLDED (generation 0; its dirs are gone and
            # append no-opped via the ledger) falls back to deriving
            # the list from the grams, exactly the old job — the
            # register-then-read replay contract is unchanged.
            nb = self.registry.n_buckets()
            from propulsion_spark.fsio import fs_list_subdirs

            bdirs = fs_list_subdirs(
                docs.sparkSession,
                os.path.join(
                    self.registry._counts_path, f"_batch_id={int(batch_id)}"
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
                    for r in grams.select(
                        F.pmod(F.col("gh"), F.lit(nb))
                        .cast("int")
                        .alias("b")
                    )
                    .distinct()
                    .collect()
                ]
            tot = self.registry.totals(buckets)
            # mask-debt delta (r13 verdict #3): for this batch's
            # grams, pre-batch count = post-fold count − batch count,
            # and the post-fold canonical equals the batch's own first
            # iff the canonical lies IN this batch. Two debt sources:
            # (1) a gram CROSSING min_dup here has pre_cnt earlier
            #     occurrences emitted unmasked — all debt except the
            #     corpus-canonical one when it stayed in an earlier
            #     batch (post-fold first < the batch's first);
            # (2) a gram already past min_dup whose canonical MOVES
            #     into this batch (a smaller (doc_id, start) arrived
            #     late): the previously-kept canonical is now
            #     non-canonical yet unmasked — one more debt.
            # One extra small agg over the batch's gram set — the
            # totals read is already in hand.
            # persisted: the DUPLICATED-gram subset feeds BOTH the
            # debt gauge and the masking join — without the cache the
            # registry scan+agg would run twice per batch. dup, not
            # tot: caching the full unfiltered totals materializes
            # O(batch distinct grams) rows no consumer needs
            dup = tot.filter(F.col("cnt") >= self.min_dup).persist()
            pre = F.col("cnt") - F.col("_bcnt")
            post_first = F.struct("first_doc", "first_start")
            # joined against DUP, not the full totals: every
            # debt-contributing gram has post-fold cnt ≥ min_dup
            # (crossing by definition; a moved canonical implies
            # pre ≥ min_dup ≤ post), so the join side is the small
            # duplicated-gram set, not O(batch distinct grams)
            debt_df = (
                counts.select(
                    "gh",
                    "gh2",
                    F.col("cnt").alias("_bcnt"),
                    F.struct("first_doc", "first_start").alias("_bfirst"),
                )
                .join(dup, ["gh", "gh2"])
                .select(
                    F.sum(
                        F.when(
                            (F.col("cnt") >= self.min_dup)
                            & (pre < self.min_dup),
                            pre
                            - F.when(
                                post_first < F.col("_bfirst"), F.lit(1)
                            ).otherwise(F.lit(0)),
                        )
                        .when(
                            (pre >= self.min_dup)
                            & (post_first == F.col("_bfirst")),
                            F.lit(1),
                        )
                        .otherwise(F.lit(0))
                    ).alias("debt")
                )
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
            # ONE action for all per-batch gauges: the doc-level stats
            # over the pinned output crossJoin the 1-row debt aggregate
            # (a broadcast-scalar crossJoin, the repo's documented
            # shape) — a separate debt collect was one extra Spark job
            # per micro-batch, measurable at bench scale
            agg = (
                out.agg(
                    F.count("*").alias("n"),
                    F.count_if(F.col("n_masked_tokens") > 0).alias("m"),
                    F.sum("n_masked_tokens").alias("tok"),
                )
                .crossJoin(debt_df)
                .collect()[0]
            )
            self.stats["seen"] += agg["n"]
            self.stats["masked_docs"] += agg["m"] or 0
            self.stats["masked_tokens"] += agg["tok"] or 0
            self.stats["mask_debt"] += int(agg["debt"] or 0)
            dup.unpersist()  # out is pinned; the small cache can go
            if self.auto_compact is not None:
                # safe here: `out` is already pinned to blocks, so the
                # registry fold can't invalidate its lineage; every
                # consumer (run_batch, CurationPipeline) inherits the
                # maintenance policy
                self.registry.auto_compact(**self.auto_compact)
            return out
        finally:
            grams.unpersist()
            if counts is not None:
                counts.unpersist()

    def retro_mask(self, out_path: str, chunk_size: int = 1) -> "dict":
        """Repair pass for the greedy prefix's mask debt (r13 verdict
        #3): re-mask the ALREADY-EMITTED output at ``out_path``
        against the FINAL registry, in place. The registry's min-folded
        totals are exactly the batch operator's per-gram aggregate
        over everything ever processed, so the rewritten output is
        ``mask_repeated_ngrams(union, keep_first=True, n, min_dup)``
        row for row REGARDLESS of arrival order or ``min_dup`` (pinned
        by test on a shuffled-arrival corpus) — the occurrences the
        stream emitted before their gram crossed the threshold get
        their mask here. One bounded batch job: a gram pass over the
        emitted docs + one join against the registry totals + the
        shared span/mask kernels; cost is the batch operator's, not
        the stream's. Returns the masked-token delta.

        PARTITION-INCREMENTAL (r14 verdict #4): a doc's final mask
        depends only on (its own text, the registry's final totals) —
        never on other docs' masks — so each ``_batch_id`` partition
        repairs independently under dynamic overwrite, resumable from
        the marker keyed by the registry's content fingerprint: a
        crash mid-repair re-does at most one partition, never the
        100 TB output. Stats cover the partitions repaired THIS
        run."""
        from propulsion_spark.operators.substring_dedup import (
            _gram_hits,
            coalesce_spans,
            mask_spans,
        )
        from propulsion_spark.streaming.repair import (
            registry_fingerprint,
            repair_partitions,
        )

        # ONE registry scan, pinned and reused by every partition's
        # join (the totals read is the repair's only registry cost)
        dup = (
            self.registry.totals()
            .filter(F.col("cnt") >= self.min_dup)
            .localCheckpoint(eager=True)
        )
        fp = registry_fingerprint(
            dup, "gh", "gh2", "cnt", "first_doc", "first_start"
        )
        stats = {"docs": 0, "delta": 0}

        def _mask(part: DataFrame) -> DataFrame:
            docs = part.select("doc_id", "text")
            hits = (
                _gram_hits(docs, self.n)
                .join(dup, ["gh", "gh2"])
                .filter(
                    ~(
                        (F.col("doc_id") == F.col("first_doc"))
                        & (F.col("start") == F.col("first_start"))
                    )
                )
                .select("doc_id", "start")
            )
            return mask_spans(docs, coalesce_spans(hits, self.n)).join(
                part.select("doc_id", "_batch_id"), "doc_id"
            )

        def _delta(part: DataFrame, pinned: DataFrame) -> None:
            d = pinned.join(
                part.select(
                    "doc_id", F.col("n_masked_tokens").alias("_was")
                ),
                "doc_id",
            ).agg(
                F.sum(F.col("n_masked_tokens") - F.col("_was")).alias("d"),
                F.count_if(
                    F.col("n_masked_tokens") > F.col("_was")
                ).alias("docs"),
            ).collect()[0]
            stats["docs"] += int(d["docs"] or 0)
            stats["delta"] += int(d["d"] or 0)

        rep = repair_partitions(
            self.spark, out_path, "substr", fp, _mask,
            on_repaired=_delta, chunk_size=chunk_size,
        )
        return {
            "repaired_docs": stats["docs"],
            "masked_token_delta": stats["delta"],
            **rep,
        }

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
        """Continuous ingestion. Registry/output batch ids derive from
        batch CONTENT (``lineage.content_batch_id`` over (doc_id,
        text) — the CurationPipeline scheme), not the checkpoint's
        counter: re-ingesting through a fresh checkpoint against the
        same gram registry would otherwise reuse id 1.. and
        dynamic-overwrite (or, post-fold, be ledger-refused as) the
        first run's gram counts (r14 advice — the source-cap twin of
        the r13 curation finding). Idempotence is per batch CONTENT:
        a fresh-checkpoint re-ingest of old data no-ops only when the
        batch boundaries reproduce (file sources:
        ``maxFilesPerTrigger=1``); differently-bounded overlapping
        deliveries inflate gram counts, erring toward OVER-masking —
        conservative, and repaired by rebuilding the registry."""
        from propulsion_spark.pipelines.lineage import (
            content_batch_id_nonempty,
        )

        def _run(df: DataFrame, _bid: int) -> None:
            # ONE agg probes emptiness AND derives the content id
            # (r16) — the separate isEmpty was its own job per batch
            bid = content_batch_id_nonempty(df, "doc_id", "text")
            if bid is None:
                return
            self.run_batch(df, bid, out_path)

        return (
            stream_df.writeStream.foreachBatch(_run)
            .option("checkpointLocation", checkpoint_location)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )
