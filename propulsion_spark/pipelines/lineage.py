"""Folded-batch watermark for the serving indexes.

Compaction (``LexicalIndex.compact`` / ``AnnIndex.reindex``) folds
every ingested batch into one ``_batch_id=0`` partition set. The
ingest side's replay idempotence, however, is per-BATCH (a replayed
micro-batch dynamic-overwrites its own partitions) — and after a fold
those partitions no longer exist, so an at-least-once replay of the
stream's last uncommitted micro-batch (Spark replays it on any
unclean restart) would re-append rows that already live inside the
fold: double-counted tf / duplicate serving vectors, silently.

The fix is a one-row marker at the index root recording the highest
batch id the fold absorbed: an append whose ``batch_id`` is at or
below it is a REPLAY OF FOLDED DATA and becomes a no-op (logged).
This leans on the indexes' existing single-lineage contract — batch
ids come from ONE stream checkpoint and only grow; a fresh build
resets the marker along with everything else. (Mirrors what Delta's
``txn`` appIds do for idempotent writers across OPTIMIZE.)
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)


def content_batch_id(df, *cols: str) -> int:
    """Batch id derived from the batch's CONTENT, not the checkpoint's
    delivery counter — the CurationPipeline discipline, shared (r14
    advice): a registry keyed by ``foreachBatch`` ids is silently
    bound to one checkpoint lineage, because restarting ingestion with
    a FRESH checkpoint against the same registry restarts ids at 0/1
    and the per-batch dynamic partition overwrite then REPLACES the
    prior run's rows for those ids instead of accumulating —
    undercounted state, no error. A commutative xxhash64-sum over
    ``cols`` is replay-stable (same rows → same id regardless of
    partitioning/order, so at-least-once redelivery stays idempotent)
    while distinct batches collide with probability ~2^-62 (the
    ledger would then no-op a genuinely new batch — accepted and
    documented where CurationPipeline introduced the scheme). Always
    ≥ 1 (generation 0 stays the fold's). One tiny agg job per batch.

    The sum runs in decimal(38,0), not long: under ANSI mode (Spark 4
    default) a long sum of 64-bit hashes overflows loudly once the
    batch is big enough (~hundreds of rows can do it), which would
    crash the stream mid-ingest. Decimal is exact to 10^19 rows, and
    for every batch the long sum could handle the value — and
    therefore the derived id — is identical, so registries built
    under the original CurationPipeline scheme keep their ids."""
    h = (
        df.agg(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")
        ).collect()[0]["h"]
        or 0
    )
    return (int(h) & ((1 << 62) - 1)) + 1


def content_batch_id_nonempty(df, *cols: str) -> "int | None":
    """:func:`content_batch_id` fused with the emptiness probe — ONE
    agg job instead of ``df.isEmpty()`` + the hash agg per micro-batch
    (r16: the two probes were separate driver-scheduled jobs on every
    foreachBatch invocation). Returns None for an empty batch (the
    caller skips it), else exactly the id ``content_batch_id`` would
    derive (same decimal xxhash64 sum, same masking)."""
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    if not int(row["n"]):
        return None
    return (int(row["h"] or 0) & ((1 << 62) - 1)) + 1


def _marker_path(index_path: str) -> str:
    return os.path.join(index_path, "folded")


def folded_through(spark: SparkSession, index_path: str) -> int:
    """Highest batch id absorbed by a fold; -1 when never compacted
    (NOT 0 — batch id 0 is a legitimate first batch for registries
    that pass raw foreachBatch ids, and the stale check is ≤)."""
    from propulsion_spark.fsio import read_parquet_if_exists

    marker = read_parquet_if_exists(spark, _marker_path(index_path))
    if marker is None:
        return -1
    rows = marker.collect()
    return max((r["folded_through"] for r in rows), default=-1)


def record_fold(spark: SparkSession, index_path: str, through: int) -> None:
    """Persist the fold watermark (monotone: keeps the max of the old
    and new values, so a dest-compaction chain can't regress it)."""
    through = max(int(through), folded_through(spark, index_path))
    (
        spark.createDataFrame([(through,)], "folded_through long")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(_marker_path(index_path))
    )


def reset_fold(spark: SparkSession, index_path: str) -> None:
    """A full rebuild starts a new lineage — drop the marker."""
    from propulsion_spark.fsio import fs_delete

    fs_delete(spark, _marker_path(index_path))


def is_stale_replay(spark: SparkSession, index_path: str, batch_id: int) -> bool:
    """True when ``batch_id`` was already absorbed by a fold — the
    append must no-op instead of resurrecting it next to the fold."""
    through = folded_through(spark, index_path)
    if batch_id <= through:
        _log.info(
            "index %s: append batch %d is at/below the fold watermark %d "
            "(an at-least-once replay of folded data) — no-op",
            index_path,
            batch_id,
            through,
        )
        return True
    return False


# ---- fold LEDGER (set-based) -------------------------------------------
# The watermark above assumes MONOTONE batch ids (one stream lineage —
# the serving indexes' contract). Registries whose callers derive batch
# ids from CONTENT (the curation path: a feed pump's in-memory batch
# counter resets every process, so durable ids must come from the
# batch itself — the r13 review's finding) get a SET ledger instead:
# compaction records exactly the ids it folded, and an append replaying
# any of them no-ops, while a NEW batch with a numerically smaller id
# (hashes aren't ordered) still lands — a watermark would wrongly
# refuse it. Ledger size is one long per batch ever folded (tiny), and
# the membership probe is one bounded read of the marker parquet.


def _ledger_path(index_path: str) -> str:
    return os.path.join(index_path, "folded_ids")


def record_folded_ids(spark: SparkSession, index_path: str, batch_ids) -> None:
    """Add ``batch_ids`` to the fold ledger — a union-fold of the one
    marker table via the shared :func:`~propulsion_spark.pipelines.
    registry.fold_in` kernel (the tombstone discipline, single-sourced
    in r14)."""
    from propulsion_spark.pipelines.registry import fold_in

    ids = sorted({int(b) for b in batch_ids})
    if not ids:
        return
    rows = spark.createDataFrame([(b,) for b in ids], "batch_id long")
    fold_in(spark, _ledger_path(index_path), rows)


def is_folded_id(spark: SparkSession, index_path: str, batch_id: int) -> bool:
    """True when ``batch_id`` was absorbed by a fold — the set-ledger
    twin of :func:`is_stale_replay`."""
    from propulsion_spark.fsio import read_parquet_if_exists

    ledger = read_parquet_if_exists(spark, _ledger_path(index_path))
    if ledger is None:
        return False
    hit = ledger.filter(F.col("batch_id") == int(batch_id)).count()
    if hit:
        _log.info(
            "registry %s: append batch %d is in the fold ledger (an "
            "at-least-once replay of folded data) — no-op",
            index_path,
            batch_id,
        )
    return bool(hit)
