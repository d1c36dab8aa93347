"""Streaming (cross-batch) perceptual media dedup — the media twin of
the curation pipeline's near-dup stage: each micro-batch fingerprints
its media map-only, resolves duplicates INSIDE the batch exactly
(connected components over hamming pairs, min-id canonical), then
checks survivors against a durable chunk registry of every keeper ever
admitted — so a re-encoded copy of an image ingested last week is
caught this week without rereading last week's media.

Scale shape (the curation discipline, applied to media):

- Fingerprinting is map-only (`operators/perceptual.py`); media bytes
  never shuffle and never enter the registry — state is O(keepers ×
  n_chunks) rows of five scalars.
- The registry is the repo's append-then-compact ``_DeltaRegistry``
  (lease-fenced, atomic manifest flips): ``register()`` writes O(batch)
  delta rows, reads resolve base+deltas, segments fold every
  ``compact_after`` batches. One row per (chunk index, chunk value,
  media type, keeper) — ALL keeper rows are kept per bucket, like the
  band table: collapsing to one keeper per bucket would let a chunk
  collision evict a fingerprint and silently lose recall later.
- Cross-batch matching is the same multi-index pigeonhole contract as
  batch pairing (`dedup.hamming_pairs64`): a survivor agreeing with any
  registered keeper on ≥1 chunk is hamming-verified against that
  keeper's full fingerprint — exact recall within the ball against
  everything ever registered, greedy across batches (clusters never
  merge retroactively — first-writer-wins, the streaming trade the text
  pipeline documents). NO drop-only repair can converge this output to
  the batch answer (`hamming_pairs64` + connected components over the
  input union) — the semantic_dedup module doc carries the full
  impossibility argument; the media instance of its chain
  counterexample is fps X, Y, Z (ids ascending) with hamming(X,Y) ≤ r,
  hamming(Y,Z) ≤ r, hamming(X,Z) > r arriving Z, Y, X: the stream
  admits {Z, X} (Y dropped near Z) while batch CC merges all three and
  keeps {X} — Y's fingerprint is in no registry (only keepers
  register), so nothing can detect that Z belongs to X's component.
  The `keeper_inversions` stat is the same lower-bound divergence
  gauge: cross-batch drops whose id undercuts every keeper they
  matched (the batch rule would have kept them); near-zero certifies
  arrival ≈ id order, growing says re-run the batch operator at the
  next epoch boundary.
- Replay-idempotent end to end: a keeper re-processing its own batch
  matches only its OWN registry rows (self-joins are excluded), so it
  survives again and re-registers identical rows (the registry resolve
  dedups them); the kept-output write is keyed by batch id with dynamic
  partition overwrite, so a replay rewrites exactly its own partition.

jet/propulsion has no media analogue — LLM-data-pipeline extension
surface (SURVEY §2.8), test-pinned like the rest of the perceptual
family (`tests/test_perceptual.py::TestStreamingDedup`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propulsion_spark.pipelines.curation import _DeltaRegistry


class _MediaChunkTable(_DeltaRegistry):
    """Keeper-fingerprint registry: one row per (chunk_idx, chunk_val,
    media_type, keeper) carrying the keeper's full fp64 for the
    hamming verify. Replayed registrations resolve away."""

    SCHEMA = (
        "chunk_idx int, chunk_val long, media_type string, "
        "keeper long, fp64 long"
    )
    COLS = ["chunk_idx", "chunk_val", "media_type", "keeper", "fp64"]

    def _resolve(self, df: DataFrame) -> DataFrame:
        return df.dropDuplicates(
            ["chunk_idx", "chunk_val", "media_type", "keeper"]
        )


class MediaDedupStream:
    """Cross-batch perceptual media dedup over a durable registry.

    ``process_batch`` returns the batch's surviving rows (original
    columns); ``run_batch`` additionally writes them to ``out_path``
    keyed by batch id (replay rewrites its own partition);
    ``stream_into`` wires that into foreachBatch."""

    def __init__(
        self,
        spark: SparkSession,
        registry_path: str,
        max_hamming: int = 3,
        n_chunks: int = 4,
        media_col: str = "media",
        type_col: str = "media_type",
        id_col: str = "doc_id",
        compact_after: int = 8,
    ):
        if max_hamming > n_chunks - 1:
            raise ValueError(
                f"max_hamming={max_hamming} needs n_chunks ≥ "
                f"{max_hamming + 1} for exact pigeonhole recall"
            )
        if 64 % n_chunks:
            raise ValueError("n_chunks must divide 64")
        self.spark = spark
        self.registry = _MediaChunkTable(
            spark, registry_path, compact_after=compact_after
        )
        self.max_hamming = max_hamming
        self.n_chunks = n_chunks
        self.media_col = media_col
        self.type_col = type_col
        self.id_col = id_col
        self.stats = {
            "seen": 0,
            "unfingerprintable": 0,
            "deduped_in_batch": 0,
            "deduped_cross_batch": 0,
            "keeper_inversions": 0,
            "kept": 0,
        }

    def _chunks(self, fps: DataFrame) -> DataFrame:
        """(doc_id, media_type, fp64, chunk_idx, chunk_val) — the
        multi-index explode, media type carried so buckets never mix
        modalities."""
        width = 64 // self.n_chunks
        mask = (1 << width) - 1 if width < 64 else None
        return fps.select(
            "doc_id",
            "media_type",
            "fp64",
            F.posexplode(
                F.array(
                    *[
                        F.expr(
                            f"shiftright(fp64, {c * width}) & {mask}L"
                            if mask is not None
                            else "fp64"
                        )
                        for c in range(self.n_chunks)
                    ]
                )
            ).alias("chunk_idx", "chunk_val"),
        )

    def process_batch(self, df: DataFrame, batch_id: int = 0) -> DataFrame:
        """One micro-batch: fingerprint → intra-batch CC dedup →
        cross-batch registry check → register survivors → survivors.

        Unfingerprintable rows (unknown container → null fp64) are
        KEPT and counted, never silently dropped: an exotic format must
        degrade to "not deduped", not to data loss."""
        from propulsion_spark.operators.dedup import (
            connected_components,
            hamming_pairs64,
        )
        from propulsion_spark.operators.perceptual import media_fingerprints

        all_fps = media_fingerprints(
            df,
            media_col=self.media_col,
            type_col=self.type_col,
            id_col=self.id_col,
        ).persist()
        fps = all_fps.filter(F.col("fp64").isNotNull())
        try:
            # intra-batch: exact cluster resolution per modality, keep
            # the min-id canonical (the curation near-dup discipline)
            types = [
                r["media_type"]
                for r in fps.select("media_type").distinct().collect()
            ]
            dropped = None
            for t in sorted(types):
                pairs = hamming_pairs64(
                    fps.filter(F.col("media_type") == t),
                    max_hamming=self.max_hamming,
                    n_chunks=self.n_chunks,
                    fp_col="fp64",
                ).select("a_id", "b_id")
                d = connected_components(pairs).filter(
                    F.col("node") != F.col("label")
                ).select(F.col("node").alias("doc_id"))
                dropped = d if dropped is None else dropped.unionByName(d)
            canon = fps
            if dropped is not None:
                # pinned (r15 counting discipline, from semantic_dedup):
                # ids-only and batch-bounded; every consumer (the
                # anti-join below, evaluated once per downstream job,
                # and the near-free count that replaces the old
                # canon.count() join job) reads blocks instead of
                # re-running the CC compose joins
                dropped = dropped.localCheckpoint(eager=True)
                canon = fps.join(dropped, "doc_id", "left_anti")
            # cross-batch: chunk equi-join vs the registry, hamming
            # verify vs the matched keeper's full fingerprint;
            # keeper == own id is a replay seeing its own registration.
            # An EMPTY registry short-circuits to a literal empty hit
            # set (r16) — no registry scan, no join, no checkpoint job.
            if self.registry.manifest.load([]):
                table = self.registry.read()
                # (doc_id, min matched keeper): ids drive the anti-join,
                # the min-keeper rides along for the keeper_inversions
                # gauge (see module doc) at zero extra join cost
                hit_pairs = (
                    self._chunks(canon).alias("n")
                    .join(
                        table.alias("t"),
                        ["chunk_idx", "chunk_val", "media_type"],
                    )
                    .filter(
                        (F.col("t.keeper") != F.col("n.doc_id"))
                        & (
                            F.expr("bit_count(n.fp64 ^ t.fp64)")
                            <= self.max_hamming
                        )
                    )
                    .groupBy(F.col("n.doc_id").alias("doc_id"))
                    .agg(F.min("t.keeper").alias("_k_min"))
                    .localCheckpoint(eager=True)  # ids-only, batch-bounded
                )
            else:
                hit_pairs = self.spark.createDataFrame(
                    [], "doc_id long, _k_min long"
                )
            hits = hit_pairs.select("doc_id")
            survivors_fp = canon.join(hits, "doc_id", "left_anti")
            new_rows = self._chunks(survivors_fp).select(
                "chunk_idx",
                "chunk_val",
                "media_type",
                F.col("doc_id").alias("keeper"),
                "fp64",
            )
            self.registry.register(new_rows)
            # original rows back: fingerprinted survivors + null-fp
            # rows, expressed as ONE chain off the cached fingerprints
            # (all_fps ids minus the two pinned drop/hit sets — dropped
            # and hits are subsets of the non-null-fp rows, so the
            # null-fp rows ride through the anti-joins untouched).
            # localCheckpoint pins the (ids-only) keep set: the returned
            # frame is consumed after the finally block unpersists, and
            # a lazy lineage would re-fingerprint the whole batch
            keep_chain = all_fps.select("doc_id")
            if dropped is not None:
                keep_chain = keep_chain.join(dropped, "doc_id", "left_anti")
            keep_ids = keep_chain.join(
                hits, "doc_id", "left_anti"
            ).localCheckpoint(eager=True)
            out = df.join(
                keep_ids.withColumnRenamed("doc_id", self.id_col),
                self.id_col,
            )
            # counting discipline (r16): ONE fused job computes every
            # batch stat — seen + unfingerprintable from the persisted
            # fingerprints (media_fingerprints is map-only and row-1:1
            # with df, so count(*) here IS the batch size), the drop
            # count and the hit/inversion gauge from the pinned
            # ids-only sets (each agg is a single row, the crossJoins
            # are trivial; the r15 shape was three separate jobs). The
            # derived canon/survivor arithmetic assumes one row per
            # doc_id in the batch (the stream's id contract — a
            # duplicated id would already make the keep_ids join fan
            # out); a violating batch only skews these gauges (always
            # high — never a silent empty-write), the kept rows
            # themselves stay anti-join-exact.
            stf = all_fps.agg(
                F.count("*").alias("n"),
                F.count_if(F.col("fp64").isNull()).alias("nofp"),
            )
            if dropped is not None:
                stf = stf.crossJoin(dropped.agg(F.count("*").alias("nd")))
            else:
                stf = stf.withColumn("nd", F.lit(0))
            st = stf.crossJoin(
                hit_pairs.agg(
                    F.count("*").alias("nhit"),
                    F.count_if(
                        F.col("doc_id") < F.col("_k_min")
                    ).alias("inv"),
                )
            ).collect()[0]
            n_seen = int(st["n"])
            n_nofp = int(st["nofp"])
            n_dropped = int(st["nd"])
            n_canon = (n_seen - n_nofp) - n_dropped
            n_surv = n_canon - int(st["nhit"])
            self.stats["seen"] += n_seen
            self.stats["unfingerprintable"] += n_nofp
            self.stats["deduped_in_batch"] += n_dropped
            self.stats["deduped_cross_batch"] += int(st["nhit"])
            # divergence lower bound vs the batch operator (module
            # doc): a drop whose id undercuts every matched keeper is
            # a representative the batch rule would have kept
            self.stats["keeper_inversions"] += int(st["inv"] or 0)
            self.stats["kept"] += n_surv + n_nofp
            return out
        finally:
            all_fps.unpersist()

    def run_batch(self, df: DataFrame, batch_id: int, out_path: str) -> None:
        """process + idempotent write: the survivors land in the batch's
        own partition (dynamic overwrite — replays rewrite, never
        duplicate; the ann-append discipline)."""
        if df.isEmpty():
            return  # the zero-row partitionBy pitfall
        kept_before = self.stats["kept"]
        out = self.process_batch(df, batch_id)
        if self.stats["kept"] == kept_before:
            # every row deduped away: a zero-row partitionBy write on a
            # fresh out_path would poison the dir (the srccap run_batch
            # discipline); registry already counted, replay skips alike
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
        the idempotence key, same shape as ``AnnIndex.stream_into``."""
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.run_batch(df, bid, out_path)
            )
            .option("checkpointLocation", checkpoint_location)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )
