"""Streaming corpus curation — the training-data pipeline as a
continuous flow (the batch twin is the ``corpus_curation`` oracle
query).

    raw document batches (change feed / any feed source)
      → PII redaction      (optional: email/SSN/phone/IPv4 → typed
                            placeholders, map-only, FIRST — nothing
                            downstream ever sees raw PII)
      → substr mask        (optional, r13: cross-BATCH repeated-passage
                            masking against the durable gram registry —
                            streaming ExactSubstr, keep_first)
      → span dedup         (optional: cut cross-document duplicated
                            k-token spans before the gates judge the
                            post-trim text)
      → quality gates      (declarative: alpha ratio, token bounds,
                            Gopher-style dup-trigram repetition)
      → LM likelihood gate (optional: mean bigram log-likelihood under
                            a reference LM broadcast once per pipeline
                            life — the CCNet-style gibberish filter;
                            train offline with the `lmtrain` verb)
      → DSIR gate          (optional: log importance weight under a
                            target vs raw LM pair — the streaming
                            target-domain filter; both LMs broadcast
                            once per pipeline life)
      → learned quality    (optional: hashed-ngram linear classifier,
                            hard floor or deterministic Pareto-shaped
                            acceptance — the GPT-3-style filter; model
                            fixed per pipeline life, map-only scoring)
      → decontamination    (optional: benchmark n-gram Bloom bitset
                            built once, broadcast, map-only scan —
                            before dedup so a flagged doc never
                            becomes a fingerprint/band keeper)
      → cross-batch dedup  (fingerprint table: first-writer-wins)
      → near-dup dedup     (optional: MinHash-LSH — intra-batch
                            connected-components canonical keep, then a
                            greedy band-table check against every
                            earlier batch)
      → split assignment   (train/val/test by md5(doc_id) hash range —
                            pure function of the id, stable forever)
      → curated store      (append-only parquet, split column attached)
      + per-language corpus stats

The fingerprint table is the same MVCC parquet pattern as
PositionsTable (Delta MERGE on a cluster); the dedup check is one
left-anti join per batch on the fingerprint — exactly the shape that
scales to 100 TB (shuffle on fp only for the batch increment, broadcast
while small via AQE). Everything is JVM-side; no Python in the hot path
(the near-dup stage's component loop is bounded driver control-plane:
one single-row aggregate per propagation round).
"""

from __future__ import annotations

import os
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propulsion_spark.operators.dedup import (
    MH_NAMES,
    NUM_HASHES,
    SPARK_H64,
    band_pairs_from_sigs,
    connected_components,
    minhash_signatures,
    normalized,
    with_bands,
    BAND_DEFS,
)
from propulsion_spark.operators.textops import REP_THRESHOLD, TRAIN_PCT, VAL_PCT, _toks
from propulsion_spark.pipelines.registry import FencedStoreLifecycle


class _DeltaRegistry(FencedStoreLifecycle):
    """Append-then-compact keyed registry — the PositionsTable shape
    (SURVEY §2.4 W8 store mapping) for curation state: each register()
    writes ONLY the batch's rows as a delta segment (O(batch) — a full
    rewrite per batch would make ingest cost grow with everything ever
    seen), reads resolve base+deltas with the subclass's fold, and the
    segment log folds into one base every ``compact_after`` registers
    (amortized O(table / compact_after)). Manifest flips are atomic
    and fenced; the fence itself (r14) is the shared
    :meth:`FencedStoreLifecycle._fenced` — POSIX FileLease locally,
    HadoopLease on hdfs-class roots, with lease-liveness counters —
    so two drivers sharing a curated store cannot interleave commits
    and the lock discipline cannot drift from the other registries'."""

    LABEL = "delta registry"
    #: subclasses set: DDL schema string and column list
    SCHEMA = ""
    COLS: list[str] = []
    #: optional derived partition columns (``_with_partitions`` adds
    #: them): segments and compacted bases are then written
    #: ``partitionBy`` these, so pruned reads (a filter on the partition
    #: column) list only the touched subdirectories — the bucketed
    #: layout that keeps per-batch registry scans O(touched buckets)
    #: instead of O(registry)
    PARTITION_BY: list[str] = []
    #: subclasses whose register() inputs are unique by construction
    #: (e.g. one row per surviving keeper) set this False to skip the
    #: defensive per-delta resolve shuffle; reads and compaction still
    #: resolve across segments
    RESOLVE_DELTAS = True

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        compact_after: int = 8,
        n_buckets: "int | None" = None,
    ):
        from propulsion_spark.streaming.mvcc import JsonManifest

        super().__init__(spark, path, n_buckets=n_buckets)
        self.compact_after = compact_after
        self.manifest = JsonManifest(path)
        self._write_lock = threading.Lock()
        #: one inferred segment schema per instance (r16): every
        #: segment of a registry is written with the same column set
        #: (``novel.select(*COLS)`` + the derived partition columns)
        #: and segment dirs are immutable once manifest-visible (new
        #: uuid per segment), so a bare ``spark.read.parquet`` — one
        #: driver-scheduled footer-inference job PER SEGMENT PER READ —
        #: only ever needs to run once per instance. Deliberately NOT
        #: cleared by ``_fenced``: mutations add/retire segments, they
        #: never change the shape.
        self._seg_schema = None
        os.makedirs(path, exist_ok=True)

    def _resolve(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def _with_partitions(self, df: DataFrame) -> DataFrame:
        """Add the derived ``PARTITION_BY`` columns (no-op default)."""
        return df

    def read(self, partition_filter=None) -> DataFrame:
        """Resolved registry view. ``partition_filter`` (a Column over
        the ``PARTITION_BY`` columns) prunes the scan to the touched
        partition subdirectories — apply it BEFORE resolution, which is
        semantics-preserving because partitions are derived from the
        resolution key."""
        segs = self.manifest.load([])
        if not segs:
            return self.spark.createDataFrame([], self.SCHEMA)
        raw = self._read_segments(segs)
        if partition_filter is not None:
            raw = raw.filter(partition_filter)
        # single segments are written resolved — only cross-segment
        # reads need the fold (a pruning filter preserves resolution)
        return self._resolve(raw) if len(segs) > 1 else raw

    def _read_segments(self, segs: "list[str]") -> DataFrame:
        paths = [os.path.join(self.path, s) for s in segs]
        if self._seg_schema is None:
            self._seg_schema = self.spark.read.parquet(paths[0]).schema
        if not self.PARTITION_BY:
            return self.spark.read.schema(self._seg_schema).parquet(*paths)
        # each partitioned segment is its own table root — one multi-path
        # scan would need a common basePath it doesn't have, so union
        # per-segment scans (the manifest bounds segments at
        # compact_after + 1, so the plan stays narrow) and partition
        # pruning applies within every branch
        frames = [
            self.spark.read.schema(self._seg_schema).parquet(p)
            for p in paths
        ]
        out = frames[0]
        for df in frames[1:]:
            out = out.unionByName(df)
        return out

    def _write_segment(self, df: DataFrame, seg: str, resolve: bool = True) -> None:
        out = self._with_partitions(self._resolve(df) if resolve else df)
        dest = os.path.join(self.path, seg)
        if not self.PARTITION_BY:
            out.write.mode("overwrite").parquet(dest)
            return
        # one narrow shuffle keyed by the partition columns before the
        # write: without it every task writes its own file into every
        # touched bucket (shuffle.partitions × buckets tiny files per
        # segment); 16 tasks bound the fan-in for registry-sized deltas
        out.repartition(16, *[F.col(c) for c in self.PARTITION_BY]).write.mode(
            "overwrite"
        ).partitionBy(*self.PARTITION_BY).parquet(dest)
        # a zero-row partitionBy write produces NO files (only _SUCCESS)
        # and the segment becomes unreadable — detected from the dir
        # (no extra Spark action) and rewritten flat to carry the schema
        if not any(
            f.endswith(".parquet")
            for _, _, names in os.walk(dest)
            for f in names
        ):
            out.write.mode("overwrite").parquet(dest)

    def _persist_layout(self) -> None:
        """Hook: runs inside the register lease before the delta write.
        Subclasses with a persisted partition layout (the bucketed
        keeper registry) record the fan-out that shapes it here."""

    def register(self, novel: DataFrame) -> None:
        with self._write_lock, self._fenced() as lease:
            self.manifest.fence = lease
            try:
                self._persist_layout()
                segs = self.manifest.load([])
                delta = f"d-{uuid.uuid4().hex}"
                self._write_segment(
                    novel.select(*self.COLS), delta,
                    resolve=self.RESOLVE_DELTAS,
                )
                segs = segs + [delta]
                if len(segs) > self.compact_after:
                    base = f"v-{uuid.uuid4().hex}"
                    # drop + re-derive the partition columns: partition
                    # values read back type-inferred, a recompute keeps
                    # the written layout identical to fresh segments
                    self._write_segment(
                        self._read_segments(segs).drop(*self.PARTITION_BY),
                        base,
                    )
                    segs = [base]
                self.manifest.flip(segs)
            finally:
                self.manifest.fence = None


class _FingerprintTable(_DeltaRegistry):
    """Seen-fingerprint registry: (fp, keeper doc_id); first-writer-wins
    resolved as min(keeper) — deterministic under replays."""

    SCHEMA = "fp string, keeper long"
    COLS = ["fp", "keeper"]

    def _resolve(self, df: DataFrame) -> DataFrame:
        return df.groupBy("fp").agg(F.min("keeper").alias("keeper"))


class _BandTable(_DeltaRegistry):
    """Seen-band registry for streaming near-dup: one row per
    (band key, keeper doc) with the keeper's MinHash signature, so a new
    doc co-bucketed with ANY earlier keeper can be signature-checked
    without rereading earlier batches. All (band, keeper) rows are kept,
    not one-per-band: collapsing to a single keeper per band would let a
    non-near-dup band collision evict a signature and silently lose
    recall for later batches."""

    SCHEMA = "band string, keeper long, " + ", ".join(
        f"{m} long" for m in MH_NAMES
    )
    COLS = ["band", "keeper", *MH_NAMES]

    def _resolve(self, df: DataFrame) -> DataFrame:
        return df.dropDuplicates(["band", "keeper"])


class _TokenHistogram(_DeltaRegistry):
    """Durable token-length histogram of KEPT docs: the mergeable
    log2-bucket sketch (``operators/sketches.py``) accumulated per
    batch. Rows are KEYED BY batch_id and resolve by max-per-key (a
    replayed batch re-registers identical counts, so replays and
    crash-retry orderings cannot double- or under-count — the same
    idempotence-by-key contract as the fingerprint registry, which a
    plain additive fold would not have); the summed view is taken at
    read time. register() is O(batch); state is O(batches × langs ×
    buckets) rows of three scalars. The corpus drift gauge: if the
    length distribution of what curation keeps shifts (p50/p90/p99
    off the cumulative histogram), the gates or the incoming mix
    changed."""

    SCHEMA = "batch_id long, grp string, bucket long, c long"
    COLS = ["batch_id", "grp", "bucket", "c"]

    def _resolve(self, df: DataFrame) -> DataFrame:
        return df.groupBy("batch_id", "grp", "bucket").agg(
            F.max("c").alias("c")
        )

    def summed(self) -> DataFrame:
        """(grp, bucket, c) across all batches — the sketch state the
        quantile estimator consumes."""
        return (
            self.read()
            .groupBy("grp", "bucket")
            .agg(F.sum("c").cast("long").alias("c"))
        )


class CurationPipeline:
    """Feed-source sink: each batch of raw documents flows through
    quality gates and cross-batch dedup into the curated store."""

    def __init__(
        self,
        spark: SparkSession,
        out_path: str,
        min_alpha_ratio: float = 0.7,
        token_bounds: tuple[int, int] = (10, 5000),
        max_dup_trigram_frac: float = REP_THRESHOLD,
        assign_splits: bool = True,
        near_dedup: bool = False,
        redact_pii: bool = False,
        span_dedup: bool = False,
        span_k: int = None,
        span_min_docs: int = 2,
        substr_registry: "str | None" = None,
        substr_n: int = 8,
        substr_min_dup: int = 2,
        benchmark: DataFrame | None = None,
        decontam_ngram: int = 8,
        decontam_threshold: float = 0.0,
        decontam_bits: int = 1 << 23,
        lm: DataFrame | None = None,
        lm_min_score: float = -8.0,
        lm_alpha: float = 0.1,
        semdedup_embeddings: DataFrame | None = None,
        semdedup_cos: float | None = None,
        dsir_target_lm: DataFrame | None = None,
        dsir_raw_lm: DataFrame | None = None,
        dsir_min_logw: float = 0.0,
        dsir_alpha: float = 0.1,
        quality_model=None,
        quality_min: float | None = None,
        quality_pareto_alpha: float | None = None,
        quality_n_features: int | None = None,
        quality_salt: str = "quality-0",
        max_per_source: "int | None" = None,
        srccap_registry: "str | None" = None,
    ):
        self.spark = spark
        self.out_path = out_path
        self.min_alpha_ratio = min_alpha_ratio
        self.token_bounds = token_bounds
        self.max_dup_trigram_frac = max_dup_trigram_frac
        self.assign_splits = assign_splits
        self.near_dedup = near_dedup
        # PII scrub runs FIRST (before span trim and every gate) so no
        # downstream stage — fingerprints, spans, shards — ever sees
        # raw PII; map-only, so it fuses into the batch's first scan
        self.redact_pii = redact_pii
        # substring-span dedup (Lee et al. 2021 ExactSubstr): INTRA-
        # batch by design — the duplicated-gram table is recomputed per
        # batch, never persisted, because cross-batch gram state is
        # O(corpus tokens) (unbounded, unlike the bounded fingerprint /
        # band tables). Run the pipeline single-batch (or over a
        # consolidated store) for corpus-wide span semantics.
        self.span_dedup = span_dedup
        # r13: the CROSS-batch occurrence-level variant the intra-batch
        # caveat above pointed at — a durable gram-count registry
        # (streaming/substring_dedup.py) makes the state bounded and
        # replay-idempotent (O(distinct grams) rows, auto-compacted),
        # so a passage first seen last week is masked when it reappears
        # this week. keep_first semantics (emitted batches can't be
        # retro-masked). Composes with span_dedup: this masks repeated
        # PASSAGES (incl. self-repetition), span_dedup trims
        # cross-DOCUMENT spans within the batch.
        if substr_registry is not None:
            from propulsion_spark.streaming.substring_dedup import (
                SubstrDedupStream,
            )

            self._substr = SubstrDedupStream(
                spark,
                substr_registry,
                n=substr_n,
                min_dup=substr_min_dup,
                auto_compact={"max_batches": 16},
            )
        else:
            self._substr = None
        if span_k is None:
            from propulsion_spark.operators.dedup import SPAN_K

            span_k = SPAN_K
        self.span_k = span_k
        self.span_min_docs = span_min_docs
        # benchmark decontamination: the eval-side Bloom bitset is built
        # ONCE here (the benchmark is fixed for the pipeline's life) and
        # broadcast into every batch's map-only scan — no per-batch
        # rebuild, no join, no shuffle (operators/decontam.py)
        self.decontam_threshold = decontam_threshold
        if benchmark is not None:
            from propulsion_spark.operators.decontam import (
                broadcast_bloom,
                build_ngram_bloom,
            )

            # one Broadcast for the pipeline's life: per-batch re-broadcast
            # of the same frozen bitset would leave cleanup to driver GC.
            # _bloom (driver-side object) feeds the fill-ratio gauge;
            # _bloom_bc (executor-side Broadcast) feeds every batch scan.
            self._bloom = build_ngram_bloom(
                benchmark, n=decontam_ngram, m_bits=decontam_bits
            )
            self._bloom_bc = broadcast_bloom(spark, self._bloom)
        else:
            self._bloom = None
            self._bloom_bc = None
        # LM quality gate: like the Bloom, the (min_count-pruned) LM
        # counts table is collected + broadcast ONCE for the pipeline's
        # life; per-batch scoring is then a map-only mapInPandas pass.
        # Train with operators.lm.train_bigram_lm on a reference corpus
        # (CLI: `sync --curate --lm-table <parquet> --lm-min-score x`).
        self.lm_min_score = lm_min_score
        if lm is not None:
            from propulsion_spark.operators.lm import broadcast_lm

            self._lm_bc = broadcast_lm(spark, lm, alpha=lm_alpha)
        else:
            self._lm_bc = None
        # DSIR gate (Xie et al. 2023): a streaming target-domain filter —
        # both LM count tables broadcast once for the pipeline's life,
        # per batch two map-only scoring passes; a doc whose log
        # importance weight log p_target − log p_raw falls below
        # dsir_min_logw is less target-like than raw and gates out.
        # NULL weights (<2 tokens) pass — the token-bounds gate owns
        # degenerate lengths.
        self.dsir_min_logw = dsir_min_logw
        if dsir_target_lm is not None or dsir_raw_lm is not None:
            if dsir_target_lm is None or dsir_raw_lm is None:
                raise ValueError(
                    "the DSIR gate needs BOTH dsir_target_lm and dsir_raw_lm"
                )
            from propulsion_spark.operators.lm import broadcast_lm

            self._dsir_bcs = (
                broadcast_lm(spark, dsir_target_lm, alpha=dsir_alpha),
                broadcast_lm(spark, dsir_raw_lm, alpha=dsir_alpha),
            )
        else:
            self._dsir_bcs = None
        # learned quality gate (operators/quality_classifier.py): the
        # fitted linear model is fixed for the pipeline's life (pass a
        # model object or a saved-model path); per batch, scoring is
        # map-only against the broadcast coefficient vector. Two
        # acceptance modes, mutually exclusive: a hard floor
        # (quality_min) or the published Pareto-shaped sampling
        # (quality_pareto_alpha; the default when neither is given) —
        # the Pareto draw is deterministic per doc_id, so replays gate
        # identically.
        if quality_model is not None:
            if quality_min is not None and quality_pareto_alpha is not None:
                raise ValueError(
                    "pick ONE of quality_min / quality_pareto_alpha"
                )
            from propulsion_spark.operators.quality_classifier import (
                PARETO_ALPHA,
            )

            if isinstance(quality_model, str):
                from pyspark.ml.classification import LogisticRegressionModel

                quality_model = LogisticRegressionModel.load(quality_model)
            self._quality_model = quality_model
            self.quality_min = quality_min
            self.quality_pareto_alpha = (
                quality_pareto_alpha
                if quality_pareto_alpha is not None or quality_min is not None
                else PARETO_ALPHA
            )
            # None → score_quality derives the space from the fitted
            # model (model.numFeatures); a value is a cross-check only
            self.quality_n_features = quality_n_features
            self.quality_salt = quality_salt
        else:
            self._quality_model = None
        # SemDeDup stage (Abbas et al. 2023): like the Bloom and the LM,
        # the embedding side input is fixed for the pipeline's life, so
        # the corpus-wide drop set is computed ONCE here (k-means cell
        # assignment + in-cell ε-ball verdicts — O(Σ cell²) pairs, one
        # cell-keyed shuffle) and each batch only anti-joins against it.
        # localCheckpoint: the drop set is small (dropped ids only) and
        # its lineage (pairwise cosines) must not be re-run per batch.
        if semdedup_embeddings is not None:
            from propulsion_spark.operators.similarity import (
                SEMDEDUP_COS,
                semdedup_verdicts_joined,
                ivf_cells,
                normed_frame,
            )

            # persisted-join form (see semdedup_verdicts_joined — the
            # uncached wrapper would pay the cell assignment twice);
            # projected to the kernel's four columns so extra metadata
            # columns on the embeddings frame don't bloat the cache,
            # and released as soon as the ids-only drop set is pinned
            _sem_joined = (
                normed_frame(semdedup_embeddings)
                .join(ivf_cells(semdedup_embeddings), "vec_id")
                .select("vec_id", "embedding", "nrm", "cell")
                .persist()
            )
            try:
                self._sem_drops = (
                    semdedup_verdicts_joined(
                        _sem_joined,
                        threshold=(
                            SEMDEDUP_COS
                            if semdedup_cos is None
                            else semdedup_cos
                        ),
                    )
                    .select(F.col("b_id").alias("doc_id"))
                    .localCheckpoint(eager=True)
                )
            finally:
                _sem_joined.unpersist()
        else:
            self._sem_drops = None
        # per-source (domain) cap — the RefinedWeb/Gopher share bound,
        # the one curation stage that was still outside the flagship
        # story (r14 verdict #2). Runs LAST, after every dedup
        # registration: dedup state must cover everything seen (a
        # capped-out doc's fingerprint still suppresses later exact
        # copies — the content exists, the corpus just bounds its
        # share), the cap only thins what is WRITTEN. Cross-batch by
        # construction: the same durable SourceCountRegistry +
        # monotone admit rule as the standalone CapPerSourceStream,
        # so a source that grows across micro-batches tightens its
        # keep rate instead of resetting per batch. Greedy like every
        # registry stream (early batches over-admit while cap/N is
        # loose); the curated store is an APPEND table without
        # _batch_id partitions, so the partitioned retro_thin does
        # not apply — converge offline by re-filtering the store
        # with the admit rule against the registry's final totals
        # (one bounded job; the nested-set rule guarantees drop-only
        # suffices).
        if max_per_source is not None:
            from propulsion_spark.streaming.source_cap import (
                CapPerSourceStream,
            )

            self._srccap = CapPerSourceStream(
                spark,
                srccap_registry or f"{out_path}/_src_counts",
                max_per_source=int(max_per_source),
                auto_compact={"max_batches": 16},
            )
        else:
            self._srccap = None
        self.fingerprints = _FingerprintTable(spark, f"{out_path}/_fingerprints")
        self.token_hist = _TokenHistogram(spark, f"{out_path}/_token_hist")
        self.bands = (
            _BandTable(spark, f"{out_path}/_bands") if near_dedup else None
        )
        self.curated_path = f"{out_path}/curated"
        self.stats = {
            "seen": 0,
            "rejected_quality": 0,
            "rejected_repetition": 0,
            "rejected_benchmark": 0,
            "rejected_lm": 0,
            "rejected_dsir": 0,
            "rejected_lowquality": 0,
            "pii_redacted": 0,
            "substr_masked": 0,
            "span_trimmed": 0,
            "deduped": 0,
            "sem_deduped": 0,
            "near_deduped": 0,
            "rejected_srccap": 0,
            "kept": 0,
        }
        self._lock = threading.Lock()

    # -- near-dup stage ----------------------------------------------------
    def _near_dedup_batch(
        self, docs: DataFrame
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """(survivors, band rows to register, persisted sigs handle).

        Intra-batch: exact duplicate-cluster resolution — connected
        components over the batch's LSH candidate pairs, keep the
        canonical (min doc_id) per cluster. Cross-batch: greedy — a
        survivor co-bucketed with ANY earlier keeper whose signature
        agrees on ≥ half the min-hashes is a near-dup of that earlier
        cluster and is dropped. Greedy-vs-exact is the standard
        streaming trade: clusters never merge retroactively across
        batches, which is exactly the first-writer-wins behavior the
        exact-dedup stage already has."""
        sigs = with_bands(minhash_signatures(docs)).persist()
        pairs = band_pairs_from_sigs(sigs).filter(
            F.col("matches") >= NUM_HASHES // 2
        ).select("a_id", "b_id")
        labels = connected_components(pairs)
        dropped = labels.filter(F.col("node") != F.col("label")).select(
            F.col("node").alias("doc_id")
        )
        canon = docs.join(dropped, "doc_id", "left_anti")
        # cross-batch check: explode each survivor to its band keys once
        band_col = F.explode(
            F.array(*[F.col(name) for name, _ in BAND_DEFS])
        ).alias("band")
        exploded = sigs.select("doc_id", *MH_NAMES, band_col)
        table = self.bands.read()
        agree = None
        for m in MH_NAMES:
            term = F.when(F.col(f"n.{m}") == F.col(f"t.{m}"), 1).otherwise(0)
            agree = term if agree is None else (agree + term)
        hits = (
            exploded.alias("n")
            .join(table.alias("t"), "band")
            .filter(agree >= NUM_HASHES // 2)
            .select(F.col("n.doc_id").alias("doc_id"))
            .distinct()
        )
        survivors = canon.join(hits, "doc_id", "left_anti")
        new_bands = exploded.join(survivors.select("doc_id"), "doc_id").select(
            F.col("band"), F.col("doc_id").alias("keeper"), *MH_NAMES
        )
        # sigs stays persisted until the caller has materialized both
        # frames (process_batch unpersists after the writes)
        return survivors, new_bands, sigs

    # -- one batch ---------------------------------------------------------
    def process_batch(self, df: DataFrame, batch_id: int = 0) -> None:
        # NOTE: batch_id identifies the DELIVERY (foreachBatch passes
        # the micro-batch id): replays of the same id are idempotent
        # end-to-end (fingerprint dedup + batch-keyed histogram rows);
        # distinct batches must carry distinct ids.
        # dup-trigram fraction, same columnar expression as the
        # text_repetition operator (Gopher-style repetition gate)
        from propulsion_spark.operators.textops import repetition_counts_expr

        n_pii_docs = 0
        if self.redact_pii:
            # scrub, count touched docs in one extra map-only pass
            # (deliberately unpersisted — the r8 sync lesson: a cache
            # here costs more than recomputing four codegen'd regexes
            # in the downstream lineage), then keep only the redacted
            # text: pii_hits must not leak into the curated schema
            from propulsion_spark.operators.textops import redact_pii

            scrubbed = redact_pii(df)
            n_pii_docs = scrubbed.filter(F.col("pii_hits") > 0).count()
            df = scrubbed.drop("pii_hits")
            if "n_chars" in df.columns:
                # the stored char count must describe the stored text
                df = df.withColumn("n_chars", F.length("text").cast("long"))
        if self._substr is not None:
            # cross-batch repeated-passage masking BEFORE the gates
            # (same rationale as the span trim below: a doc that is
            # boilerplate + thin content must face the token floor
            # after the boilerplate is cut). The registry's batch id is
            # derived from the batch CONTENT, not the delivery counter:
            # feed pumps restart their in-memory batch sequence every
            # process, so a second `sync --curate` run would reuse id 1
            # and dynamic-overwrite (or, post-fold, be refused as) the
            # first run's gram counts — the r13 review's finding. A
            # commutative hash-sum is replay-stable (same docs -> same
            # id, so at-least-once redelivery stays idempotent) and
            # distinct batches collide with probability ~2^-62.
            # (Single-sourced in r15: the scheme this pipeline
            # introduced now also guards the srccap/substr stream_into
            # paths via lineage.content_batch_id.)
            from propulsion_spark.pipelines.lineage import content_batch_id

            eff_batch = content_batch_id(df, "doc_id", "text")
            before_masked = self._substr.stats["masked_docs"]
            masked = self._substr.process_batch(
                df.select("doc_id", "text"), eff_batch
            )
            # the stream already counted masked docs for its own stats
            # — read the delta instead of a second count job (r13
            # review)
            self.stats["substr_masked"] += (
                self._substr.stats["masked_docs"] - before_masked
            )
            df = df.drop("text").join(
                masked.select("doc_id", F.col("masked_text").alias("text")),
                "doc_id",
            )
            if "n_chars" in df.columns:
                # the stored char count must describe the stored text
                df = df.withColumn("n_chars", F.length("text").cast("long"))
        n_span_trimmed = 0
        trimmed = None
        if self.span_dedup:
            # trim FIRST: the quality/repetition gates then judge the
            # post-trim text (a doc that is boilerplate + thin content
            # should fail the token floor AFTER the boilerplate is cut,
            # not squeak through on it); fully-cut docs fall out at the
            # token-bounds gate, so they are counted as quality rejects
            from propulsion_spark.operators.dedup import (
                trim_duplicated_spans,
            )

            trimmed = trim_duplicated_spans(
                df, k=self.span_k, min_docs=self.span_min_docs
            ).persist()
            n_span_trimmed = trimmed.filter(
                F.col("n_tokens_removed") > 0
            ).count()
            df = trimmed.drop("n_tokens_removed")
            if "n_chars" in df.columns:
                # the stored char count must describe the stored text
                df = df.withColumn(
                    "n_chars", F.length("text").cast("long")
                )
        st = repetition_counts_expr()
        scored = df.select(
            "*",
            # try_divide: a zero-length text (possible after the span
            # trim cuts a doc to nothing) must gate out, not ANSI-crash
            F.expr(
                "coalesce(try_divide(length(regexp_replace(text, "
                "'[^A-Za-z]', '')), length(text)), 0.0D)"
            ).alias("_alpha"),
            F.expr(f"size({_toks('spark')})").alias("_ntok"),
            F.expr(
                f"1.0D - cast(({st}).d as double) / ({st}).n"
            ).alias("_dup3"),
            F.expr(f"md5({normalized('spark')})").alias("fp"),
        )
        lo, hi = self.token_bounds
        passed_q = scored.filter(
            (F.col("_alpha") >= self.min_alpha_ratio)
            & F.col("_ntok").between(lo, hi)
        )
        passed_r = passed_q.filter(F.col("_dup3") <= self.max_dup_trigram_frac)
        if self._lm_bc is not None:
            # LM likelihood gate (gibberish/OCR-noise filter): map-only
            # scoring against the pipeline-life broadcast LM, then a
            # doc_id equi-join back onto the gated rows (same batch-
            # scale join shape as the keeper selection below). NULL
            # scores (docs with <2 tokens) pass — the token-bounds gate
            # already owns degenerate-length rejection.
            from propulsion_spark.operators.lm import lm_likelihood_bc

            scores = lm_likelihood_bc(
                passed_r.select("doc_id", "text"), self._lm_bc
            ).select("doc_id", "score")
            passed_l = (
                passed_r.join(scores, "doc_id", "left")
                .filter(
                    F.col("score").isNull()
                    | (F.col("score") >= self.lm_min_score)
                )
                .drop("score")
            )
        else:
            passed_l = passed_r
        if self._dsir_bcs is not None:
            # DSIR target-domain gate: two map-only broadcast-LM scores,
            # keep docs at least dsir_min_logw more target-like than raw
            from propulsion_spark.operators.dsir import dsir_weights

            t_bc, r_bc = self._dsir_bcs
            w = dsir_weights(
                passed_l.select("doc_id", "text"), t_bc, r_bc
            ).select("doc_id", "logw")
            passed_d = (
                passed_l.join(w, "doc_id", "left")
                .filter(
                    F.col("logw").isNull()
                    | (F.col("logw") >= self.dsir_min_logw)
                )
                .drop("logw")
            )
        else:
            passed_d = passed_l
        if self._quality_model is not None:
            # learned quality gate: map-only scoring, then the hard
            # floor or the deterministic Pareto acceptance — BEFORE
            # dedup for the same reason as decontam (a low-quality doc
            # must never become the keeper that suppresses a clean
            # near-dup of itself later)
            from propulsion_spark.operators.quality_classifier import (
                pareto_filter,
                score_quality,
            )

            q = score_quality(
                passed_d.select("doc_id", "text"),
                self._quality_model,
                n_features=self.quality_n_features,
            )
            if self.quality_min is not None:
                q = q.filter(F.col("quality") >= self.quality_min)
            else:
                q = pareto_filter(
                    q,
                    alpha=self.quality_pareto_alpha,
                    salt=self.quality_salt,
                )
            passed_m = passed_d.join(q.select("doc_id"), "doc_id")
        else:
            passed_m = passed_d
        if self._bloom is not None:
            # decontaminate BEFORE dedup: a flagged doc must never
            # become a fingerprint/band keeper (it would then suppress
            # clean near-dups of itself in later batches)
            from propulsion_spark.operators.decontam import (
                contamination_scores,
            )

            flagged = contamination_scores(
                passed_m.select("doc_id", "text"), self._bloom_bc
            ).filter(
                F.col("contaminated_frac") > self.decontam_threshold
            ).select("doc_id")
            passed = passed_m.join(flagged, "doc_id", "left_anti")
        else:
            passed = passed_m
        # intra-batch keeper, then cross-batch anti-join vs seen fps
        keeper = passed.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
        fresh = keeper.join(self.fingerprints.read(), "fp", "left_anti").select(
            F.col("fp").alias("_kfp"), F.col("keeper").alias("_keeper")
        )
        exact_kept = passed.join(
            fresh,
            (passed.fp == F.col("_kfp")) & (passed.doc_id == F.col("_keeper")),
        ).select(*df.columns, "fp")
        exact_kept = exact_kept.cache()
        if self._sem_drops is not None:
            # SemDeDup: anti-join against the pipeline-life drop set.
            # The set covers the corpus the embedding side input
            # describes — ids outside it pass untouched.
            sem_kept = exact_kept.join(self._sem_drops, "doc_id", "left_anti")
        else:
            sem_kept = exact_kept
        sigs = new_bands = None
        if self.near_dedup:
            kept_docs, new_bands, sigs = self._near_dedup_batch(sem_kept)
            kept_docs = kept_docs.cache()
        else:
            kept_docs = sem_kept
        try:
            n_seen = df.count()
            n_passed_q = passed_q.count()
            n_passed_r = passed_r.count()
            n_passed_l = (
                passed_l.count() if self._lm_bc is not None else n_passed_r
            )
            n_passed_d = (
                passed_d.count() if self._dsir_bcs is not None else n_passed_l
            )
            n_passed_m = (
                passed_m.count()
                if self._quality_model is not None
                else n_passed_d
            )
            n_passed = (
                passed.count() if self._bloom is not None else n_passed_m
            )
            n_exact = exact_kept.count()
            n_sem = (
                sem_kept.count() if self._sem_drops is not None else n_exact
            )
            n_kept = kept_docs.count()
            out = kept_docs.drop("fp")
            n_src_capped = 0
            if self._srccap is not None:
                # domain-share bound over the SURVIVORS, cross-batch
                # via the durable count registry (its batch id derives
                # from the batch's doc-id content — replay-stable, the
                # substr/eff_batch scheme); rejected counts read off
                # the stream's own stats delta, no extra count job
                from propulsion_spark.pipelines.lineage import (
                    content_batch_id,
                )

                seen0 = self._srccap.stats["seen"]
                adm0 = self._srccap.stats["admitted"]
                out = self._srccap.process_batch(
                    out, content_batch_id(kept_docs, "doc_id")
                )
                n_src_capped = (
                    self._srccap.stats["seen"] - seen0
                ) - (self._srccap.stats["admitted"] - adm0)
            if self.assign_splits:
                # reproducible split label: pure function of doc_id
                # (same rule as corpus_split_assign), so replays and
                # corpus growth never move a doc between splits
                b = F.expr(SPARK_H64.format(x="cast(doc_id as string)")) % 100
                out = out.withColumn(
                    "split",
                    F.when(b < TRAIN_PCT, "train")
                    .when(b < TRAIN_PCT + VAL_PCT, "val")
                    .otherwise("test"),
                )
            if self._srccap is None or n_kept - n_src_capped > 0:
                # cap mode knows the written-row count up front (the
                # stats delta): an all-capped (or empty) batch skips
                # the append instead of writing a row-less file set
                out.write.mode("append").parquet(self.curated_path)
            if n_kept:
                # accumulate the per-language token-length histogram of
                # what was KEPT (drift gauge; O(batch) register), keyed
                # by batch_id so crash-retry replays are idempotent.
                # MUST register BEFORE the fingerprints: once the fps
                # land, a replay of this batch dedups to n_kept=0 and
                # could never repair a missing histogram entry; in the
                # other order a replay re-registers identical keyed
                # rows, which the max-per-(batch,grp,bucket) resolve
                # absorbs.
                from propulsion_spark.operators.sketches import (
                    value_log_histogram,
                )

                self.token_hist.register(
                    value_log_histogram(
                        kept_docs.select(
                            "lang",
                            F.expr(
                                f"CAST(size({_toks('spark')}) AS DOUBLE)"
                            ).alias("_ntok"),
                        ),
                        group_col="lang",
                        value_col="_ntok",
                    ).withColumn("batch_id", F.lit(batch_id).cast("long"))
                )
            self.fingerprints.register(kept_docs.select("fp", F.col("doc_id").alias("keeper")))
            if new_bands is not None:
                self.bands.register(new_bands)
            with self._lock:
                self.stats["seen"] += n_seen
                self.stats["rejected_quality"] += n_seen - n_passed_q
                self.stats["rejected_repetition"] += n_passed_q - n_passed_r
                self.stats["rejected_lm"] += n_passed_r - n_passed_l
                self.stats["rejected_dsir"] += n_passed_l - n_passed_d
                self.stats["rejected_lowquality"] += n_passed_d - n_passed_m
                self.stats["rejected_benchmark"] += n_passed_m - n_passed
                self.stats["pii_redacted"] += n_pii_docs
                self.stats["span_trimmed"] += n_span_trimmed
                self.stats["deduped"] += n_passed - n_exact
                self.stats["sem_deduped"] += n_exact - n_sem
                self.stats["near_deduped"] += n_sem - n_kept
                self.stats["rejected_srccap"] += n_src_capped
                self.stats["kept"] += n_kept - n_src_capped
        finally:
            exact_kept.unpersist()
            if kept_docs is not exact_kept:
                kept_docs.unpersist()
            if sigs is not None:
                sigs.unpersist()
            if trimmed is not None:
                trimmed.unpersist()

    # -- results -----------------------------------------------------------
    def curated(self) -> DataFrame:
        return self.spark.read.parquet(self.curated_path)

    def rethin_curated(self) -> "dict":
        """Converge the curated store's per-source share to the batch
        bound exactly: re-filter every stored row with the monotone
        admit rule against the count registry's FINAL totals and
        rewrite the store. The cap stage is greedy (early batches
        admit under a looser cap/N), and the curated store is an
        APPEND table without ``_batch_id`` partitions, so the
        partitioned ``retro_thin`` does not apply — this is its
        whole-store twin, safe because the nested-set rule makes the
        final admitted set a subset of everything emitted (drop-only
        suffices, nothing needs resurrecting). One bounded job: a
        scan of the store joined with the totals (AQE-sized, the
        cap_per_source rationale); the survivors pin to blocks
        before overwriting the files they were read from. Idempotent.
        Run at epoch boundaries, not per batch."""
        from propulsion_spark.streaming.source_cap import _admit_expr

        if self._srccap is None:
            raise ValueError(
                "rethin_curated needs the pipeline's max_per_source "
                "cap stage (no count registry exists without it)"
            )
        cur = self.curated()
        tot = self._srccap.registry.totals()
        kept = (
            cur.join(tot, "source")
            .filter(
                _admit_expr(
                    self._srccap.cap, self._srccap.salt, id_col="doc_id"
                )
            )
            .drop("src_cnt")
            .localCheckpoint(eager=True)  # rewrites the path it reads
        )
        n_before = cur.count()
        n_after = kept.count()
        if n_after == 0:
            # all-dropped: remove outright (the repair-kernel
            # discipline — never a file-less husk)
            from propulsion_spark.fsio import fs_delete

            fs_delete(self.spark, self.curated_path)
        else:
            kept.write.mode("overwrite").parquet(self.curated_path)
        with self._lock:
            self.stats["rejected_srccap"] += n_before - n_after
            self.stats["kept"] -= n_before - n_after
        return {"dropped": int(n_before - n_after), "kept": int(n_after)}

    def split_stats(self) -> DataFrame:
        """Docs/chars per (source, split) over the curated store —
        the corpus_split_assign rollup restricted to survivors."""
        return (
            self.curated()
            .groupBy("source", "split")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
        )

    def token_length_quantiles(self) -> DataFrame:
        """p50/p90/p99 kept-doc token length per language, off the
        accumulated mergeable histogram (no scan of the curated store)
        — the length-distribution drift gauge."""
        from propulsion_spark.operators.sketches import histogram_quantiles

        return histogram_quantiles(self.token_hist.summed())

    def lang_stats(self) -> DataFrame:
        return (
            self.curated()
            .groupBy("lang")
            .agg(F.count("*").alias("kept_docs"), F.sum("n_chars").alias("kept_chars"))
        )

    def run_stream(self, stream_df: DataFrame, checkpoint_location: str, **trigger):
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_location)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )
