"""Streaming (cross-batch) semantic dedup — the embedding twin of
MediaDedupStream and of the curation pipeline's near-dup stage: each
micro-batch assigns its vectors to cells under a codebook FROZEN at
construction (the AnnIndex append discipline — a drifting codebook
would silently re-cluster history), resolves ε-ball duplicates INSIDE
the batch exactly (SemDeDup keep-lowest-id), then checks survivors
against a durable registry of every keeper ever admitted — so a
paraphrase of a document ingested last week is caught this week without
re-scoring last week's corpus.

Scale shape (the media-dedup discipline, applied to embeddings):

- Cell assignment is one broadcast-codebook aggregate per batch; the
  registry join is keyed by cell, so cross-batch comparison cost is
  O(batch × cell occupancy), never O(batch × corpus).
- State is O(keepers) rows of (cell, keeper, embedding, nrm) — the
  embedding IS the fingerprint here (cosine needs it); at 100 TB the
  registry is the corpus's embedding table re-partitioned by cell,
  which the storage layer already holds. ``int8_registry=True`` (r10)
  applies the AnnIndex shrink lever: keepers store max-abs-scaled int8
  codes + scale + true norm (¼ the bytes), the verify dequantizes the
  keeper side only (asymmetric). Registry segments are PARTITIONED by
  cell bucket, so a batch scans only the buckets it touches.
- The registry is the repo's append-then-compact ``_DeltaRegistry``
  (lease-fenced atomic manifest flips): ``register()`` writes O(batch)
  delta rows, segments fold every ``compact_after`` batches.
- Greedy across batches: clusters never merge retroactively
  (first-writer-wins — the same streaming trade the text and media
  pipelines document). Unlike the substring stream's ``retro_mask``
  and the source-cap stream's ``retro_thin``, NO drop-only repair
  pass can converge this output to the batch operator
  (``semdedup_verdicts`` over the input union), and r15 ships the
  impossibility argument plus a divergence gauge instead of a false
  repair:

  * The batch rule drops x whenever ANY lower-id y in its cell has
    cos(x,y) ≥ τ — including a y that was itself dropped. Witnesses
    the stream discarded (their vectors are in no registry and no
    output) can therefore decide batch verdicts. 3-doc chain
    counterexample with ids X<Y<Z, cos(X,Y) ≥ τ, cos(Y,Z) ≥ τ,
    cos(X,Z) < τ, arriving Z then Y then X: the stream admits Z,
    drops Y (near Z), admits X (far from Z) → output {Z, X}; the
    batch keeps only {X} (Y dropped via X; Z dropped via the
    DROPPED witness Y). The emitted output is pairwise non-dup —
    every batch admitted docs only after checking the full registry
    — so there is nothing a repair could drop, yet it differs from
    the batch answer in count AND membership; converging would
    require resurrecting Y, whose vector is gone.
  * Representative inversions: when a late-arriving doc x is
    dropped against an earlier keeper k with x < k, the batch
    operator keeps x and drops k. x's row is gone from the output,
    so no drop-only pass can restore it. The ``keeper_inversions``
    stat counts exactly these (cross-batch drops whose id is below
    every matched keeper's) — a LOWER BOUND on the stream/batch
    divergence, read per batch at no extra join cost; the exact
    divergence is only computable by re-running the batch operator
    over the input union, which is not a repair but the answer.

  Operationally: a near-zero gauge certifies arrival order ≈ id
  order (the common append-only case) where stream ≈ batch; a
  growing gauge says re-run the batch operator at the next epoch
  boundary if exact batch semantics matter.
- Replay-idempotent: a keeper re-processing its own batch matches only
  its OWN registry rows (self-matches excluded), survives again, and
  re-registers identical rows that the registry resolve dedups; the
  kept-output write is keyed by batch id with dynamic partition
  overwrite.

jet/propulsion has no embedding analogue — LLM-data-pipeline extension
surface alongside SemDeDup's batch operator
(`operators/similarity.py::semdedup_verdicts`, Abbas et al. 2023).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propulsion_spark.pipelines.curation import _DeltaRegistry


class _SemVecTable(_DeltaRegistry):
    """Keeper-vector registry: one row per keeper carrying its cell,
    embedding and norm for the cosine verify. Replays resolve away.

    Segments are PARTITIONED by ``_bkt = cell % N_BUCKETS`` (r10): a
    micro-batch whose rows touch K cells reads at most K bucket
    subdirectories of each segment instead of the whole registry — the
    same bucketed-layout trick the event store uses. At 100 TB the
    registry is corpus-sized while a batch touches a handful of cells,
    so the pruned scan is the difference between O(batch-locality) and
    O(corpus) registry IO per batch."""

    SCHEMA = "cell long, keeper long, embedding array<float>, nrm double"
    COLS = ["cell", "keeper", "embedding", "nrm"]
    PARTITION_BY = ["_bkt"]
    #: DEFAULT fan-out for NEW registries; an existing registry's value
    #: is persisted in its root (store_meta — r13 verdict #1: a changed
    #: constant over an existing layout silently skips keeper rows on
    #: the pruned scan) and validated on open (the
    #: FencedStoreLifecycle fan-out machinery — N_BUCKETS kept as the
    #: historical alias)
    DEFAULT_BUCKETS = N_BUCKETS = 16
    LABEL = "semdedup keeper registry"
    # register() inputs are one row per SURVIVING keeper (unique by
    # construction — survivors carry distinct vec_ids), so the delta
    # write skips the defensive dedup shuffle; replays still resolve
    # away at read/compaction time via dropDuplicates across segments
    RESOLVE_DELTAS = False

    def _persist_layout(self) -> None:
        self._ensure_fanout()

    def rebucket(self, n_buckets: int) -> None:
        """Rewrite the registry under a new fan-out — the sanctioned
        fan-out change (SCALE.md's knob), fenced like every other
        manifest flip: read-all → flip meta → one new base segment in
        the new layout → manifest flip. The meta/flip pair is not
        atomic: a crash between them is repaired by re-running, and a
        concurrent PRUNED read inside that window routes its bucket
        list by the new meta over the old segments — run rebucket in
        a maintenance window, like the other stores' in-place
        compaction (UNPRUNED reads resolve correctly throughout)."""
        import uuid as _uuid

        with self._write_lock, self._fenced() as lease:
            self.manifest.fence = lease
            try:
                segs = self.manifest.load([])
                self._set_fanout(int(n_buckets))
                if not segs:
                    return
                base = f"v-{_uuid.uuid4().hex}"
                self._write_segment(
                    self._read_segments(segs).drop(*self.PARTITION_BY), base
                )
                self.manifest.flip([base])
            finally:
                self.manifest.fence = None

    def _resolve(self, df: DataFrame) -> DataFrame:
        return df.dropDuplicates(["cell", "keeper"])

    def _with_partitions(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "_bkt", (F.col("cell") % self.n_buckets()).cast("int")
        )

    def read_buckets(self, buckets: "list[int]") -> DataFrame:
        """The registry pruned to the given cell buckets: the filter is
        a literal IN over the partition column, so Spark's partition
        discovery lists ONLY those subdirectories."""
        if not buckets:
            return self.spark.createDataFrame([], self.SCHEMA)
        return self.read(
            partition_filter=F.col("_bkt").isin([int(b) for b in buckets])
        )


class _SemVecInt8Table(_SemVecTable):
    """The registry's int8 shrink lever (the AnnIndex trick): keepers
    store max-abs-scaled int8 codes + scale + the TRUE norm instead of
    the float32 vector — ¼ the registry bytes moved per cross-batch
    candidate. The cosine verify dequantizes the keeper side only
    (asymmetric, like quantized ANN search): with unit-ish embeddings
    the dequantization error on cosine is ~1e-2, so thresholds keep a
    margin; measure with the fixture test before flipping a corpus."""

    SCHEMA = (
        "cell long, keeper long, qvec array<tinyint>, "
        "qscale double, nrm double"
    )
    COLS = ["cell", "keeper", "qvec", "qscale", "nrm"]


class SemDedupStream:
    """Cross-batch SemDeDup over a durable keeper registry.

    ``codebook`` is a (label, dim, c) centroid frame (build one with
    ``operators.similarity.centroids_frame`` over a seed corpus) —
    materialized once here and broadcast into every batch's
    assignment. ``process_batch`` returns the batch's surviving rows;
    ``run_batch`` writes them idempotently; ``stream_into`` wires
    foreachBatch."""

    def __init__(
        self,
        spark: SparkSession,
        registry_path: str,
        codebook: DataFrame,
        threshold: float | None = None,
        id_col: str = "doc_id",
        emb_col: str = "embedding",
        compact_after: int = 8,
        int8_registry: bool = False,
        n_buckets: "int | None" = None,
    ):
        from propulsion_spark.operators.similarity import SEMDEDUP_COS

        self.spark = spark
        self.int8_registry = bool(int8_registry)
        table_cls = _SemVecInt8Table if int8_registry else _SemVecTable
        self.registry = table_cls(
            spark, registry_path, compact_after=compact_after,
            n_buckets=n_buckets,
        )
        # freeze the codebook for the stream's life: small (cells×dims),
        # lineage cut so no batch re-runs the seed aggregation
        self.codebook = codebook.localCheckpoint(eager=True)
        # the one-row array<struct<label, c_arr>> shape the map-only
        # argmin consumes (r16) — pinned once so no batch re-aggregates
        # the codebook fold
        from propulsion_spark.operators.similarity import _codebook_row

        self._cb_row = _codebook_row(self.codebook).localCheckpoint(
            eager=True
        )
        self.threshold = SEMDEDUP_COS if threshold is None else threshold
        self.id_col = id_col
        self.emb_col = emb_col
        self.stats = {
            "seen": 0,
            "unembeddable": 0,
            "deduped_in_batch": 0,
            "deduped_cross_batch": 0,
            "keeper_inversions": 0,
            "kept": 0,
        }

    def process_batch(self, df: DataFrame, batch_id: int = 0) -> DataFrame:
        """One micro-batch: assign cells → intra-batch SemDeDup →
        cross-batch registry check → register survivors → survivors.

        Rows with a NULL or zero-norm embedding are KEPT and counted
        (`unembeddable`), never silently dropped — cosine is undefined
        for them, so they must degrade to "not deduped", not to data
        loss (the media-dedup null-fingerprint contract)."""
        from propulsion_spark.operators.similarity import (
            semdedup_verdicts_joined,
            _spark_dot,
            assign_cells_inline,
        )

        # ONE persist carries the whole batch state: every row with its
        # norm AND its cell (r16 — the assignment is a map-only argmin
        # against the one-row broadcast codebook, so attaching it here
        # costs no join, no window shuffle, and no second cache; the
        # r15 shape paid an O(batch × cells) crossJoin + argmin window
        # + join-back and a SECOND persist for the joined frame).
        # Unembeddable rows get a junk-but-unread cell (every consumer
        # filters on _embeddable first); batch stats come from one agg
        # over this cache.
        _embeddable = F.col("embedding").isNotNull() & (F.col("nrm") > 0)
        base = (
            assign_cells_inline(
                df.select(
                    F.col(self.id_col).alias("vec_id"),
                    F.col(self.emb_col).alias("embedding"),
                ).withColumn(
                    "nrm", F.sqrt(_spark_dot("embedding", "embedding"))
                ),
                cb_row=self._cb_row,
            )
            .persist()
        )
        framed = base.filter(_embeddable)
        try:
            # intra-batch: ε-ball keep-lowest-id over the cached
            # assignment — both sides of the kernel's pair self-join
            # read base's cache. The drop set is ids-only and
            # batch-bounded: localCheckpoint pins it so the pair join
            # runs ONCE, not once per downstream count/write (and the
            # pin is what makes post-register re-evaluation safe)
            dropped = (
                semdedup_verdicts_joined(framed, threshold=self.threshold)
                .select(F.col("b_id").alias("vec_id"))
                .localCheckpoint(eager=True)
            )
            canon = framed.join(dropped, "vec_id", "left_anti")
            # cross-batch: cell-keyed join vs registered keepers,
            # cosine verify against each keeper's full vector;
            # keeper == own id is a replay seeing its own registration.
            # The registry scan is PRUNED to the batch's cell buckets
            # (a tiny control-plane collect of ≤ N_BUCKETS ints — same
            # class as the codebook read): a batch touching one cell
            # reads one bucket subdir per segment, never the registry.
            # An EMPTY registry short-circuits to a literal empty hit
            # set — no bucket collect, no scan, no checkpoint job.
            if self.registry.manifest.load([]):
                # route by the registry's PERSISTED fan-out (store_meta)
                # — a module constant here would mis-prune an existing
                # registry built at a different fan-out; refresh=True so
                # a long-lived stream picks up another process's fenced
                # rebucket instead of routing with a stale modulus
                batch_buckets = [
                    r[0]
                    for r in framed.select(
                        (F.col("cell") % self.registry.n_buckets(refresh=True))
                        .cast("int")
                        .alias("b")
                    )
                    .distinct()
                    .collect()
                ]
                table = self.registry.read_buckets(batch_buckets)
                if self.int8_registry:
                    # asymmetric verify: dequantize the keeper side only
                    keepers = table.select(
                        "cell",
                        F.col("keeper"),
                        F.expr(
                            "transform(qvec, v -> cast(v as double)"
                            " * qscale / 127.0D)"
                        ).alias("k_emb"),
                        F.col("nrm").alias("k_nrm"),
                    )
                else:
                    keepers = table.select(
                        "cell",
                        F.col("keeper"),
                        F.col("embedding").alias("k_emb"),
                        F.col("nrm").alias("k_nrm"),
                    )
                cosine = _spark_dot("embedding", "k_emb") / (
                    F.col("nrm") * F.col("k_nrm")
                )
                # (vec_id, min matched keeper): the id set drives the
                # anti-join; the min-keeper rides along for the
                # keeper_inversions gauge below at zero extra join cost
                hit_pairs = (
                    canon.join(
                        keepers,
                        "cell",
                    )
                    .filter(
                        (F.col("keeper") != F.col("vec_id"))
                        & (cosine >= self.threshold)
                    )
                    .groupBy("vec_id")
                    .agg(F.min("keeper").alias("_k_min"))
                    # ids-only: pin so the registry join runs once (same
                    # rationale as the drop set above)
                    .localCheckpoint(eager=True)
                )
            else:
                idt = dict(framed.dtypes)["vec_id"]
                hit_pairs = self.spark.createDataFrame(
                    [], f"vec_id {idt}, _k_min {idt}"
                )
            hits = hit_pairs.select("vec_id")
            survivors = canon.join(hits, "vec_id", "left_anti")
            # cell cast pins the registry schema: codebooks with int
            # labels must not write int cells next to the long SCHEMA
            # (mixed per-segment parquet types poison later unions —
            # the ann_index _load_pq lesson)
            if self.int8_registry:
                qs = F.expr("array_max(transform(embedding, x -> abs(x)))")
                novel = survivors.select(
                    F.col("cell").cast("long").alias("cell"),
                    F.col("vec_id").alias("keeper"),
                    F.expr(
                        "transform(embedding, x -> cast(round("
                        "x / array_max(transform(embedding, v -> abs(v)))"
                        " * 127.0) as tinyint))"
                    ).alias("qvec"),
                    qs.cast("double").alias("qscale"),
                    "nrm",
                )
            else:
                novel = survivors.select(
                    F.col("cell").cast("long").alias("cell"),
                    F.col("vec_id").alias("keeper"),
                    "embedding",
                    "nrm",
                )
            self.registry.register(novel)
            # the keep set NEEDS NO checkpoint (r16): base ids minus
            # the two PINNED id sets is exactly
            # survivors ∪ unembeddable (dropped ⊆ framed, hits ⊆ framed
            # ⊆ base), and its lineage — source scan + two broadcast
            # anti-joins against checkpointed frames — never re-reads
            # the registry, so consuming it after register() (or after
            # the finally block drops base's cache) recomputes the
            # same rows deterministically
            keep_ids = (
                base.select("vec_id")
                .join(dropped, "vec_id", "left_anti")
                .join(hits, "vec_id", "left_anti")
            )
            out = df.join(
                keep_ids.withColumnRenamed("vec_id", self.id_col), self.id_col
            )
            # counting discipline (r16): ONE fused job computes every
            # batch stat — seen + embeddable from the persisted base,
            # the drop count and the hit/inversion gauge from the
            # pinned ids-only sets (each agg is a single row, the
            # crossJoins are trivial). The r15 shape was three separate
            # driver-scheduled jobs for the same five numbers.
            # keeper_inversions (module doc "Greedy across batches"):
            # a drop whose doc id is SMALLER than every keeper it
            # matched is a representative inversion — the batch
            # operator would have kept this doc and dropped the keeper.
            st = (
                base.agg(
                    F.count("*").alias("seen"),
                    F.count_if(_embeddable).alias("emb"),
                )
                .crossJoin(dropped.agg(F.count("*").alias("ndrop")))
                .crossJoin(
                    hit_pairs.agg(
                        F.count("*").alias("nhit"),
                        F.count_if(
                            F.col("vec_id") < F.col("_k_min")
                        ).alias("inv"),
                    )
                )
            ).collect()[0]
            n_seen = int(st["seen"])
            n_emb = int(st["emb"])
            n_canon = n_emb - int(st["ndrop"])
            n_surv = n_canon - int(st["nhit"])
            self.stats["seen"] += n_seen
            self.stats["unembeddable"] += n_seen - n_emb
            self.stats["deduped_in_batch"] += n_emb - n_canon
            self.stats["deduped_cross_batch"] += n_canon - n_surv
            self.stats["keeper_inversions"] += int(st["inv"] or 0)
            self.stats["kept"] += n_surv + (n_seen - n_emb)
            return out
        finally:
            base.unpersist()

    def run_batch(self, df: DataFrame, batch_id: int, out_path: str) -> None:
        """process + idempotent write keyed by batch id (dynamic
        partition overwrite — replays rewrite, never duplicate)."""
        if df.isEmpty():
            return  # the zero-row partitionBy pitfall
        kept_before = self.stats["kept"]
        out = self.process_batch(df, batch_id)
        if self.stats["kept"] == kept_before:
            # every row deduped away: a zero-row partitionBy write on
            # a fresh out_path would poison the dir (the srccap
            # run_batch discipline); the registry already recorded the
            # batch, and a replay skips identically
            return
        (
            out.withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    def stream_into(
        self, stream_df: DataFrame, out_path: str, checkpoint_location: str, **trigger
    ):
        """Continuous ingestion: foreachBatch with the micro-batch id as
        the idempotence key, same shape as MediaDedupStream."""
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.run_batch(df, bid, out_path)
            )
            .option("checkpointLocation", checkpoint_location)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )
