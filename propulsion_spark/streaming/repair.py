"""Partition-incremental repair kernel for the keeper-registry
streams' retro passes (r14 verdict #4).

``retro_mask`` (substring stream) and ``retro_thin`` (source-cap
stream) converge a finished stream's emitted output to the batch
reference by re-evaluating every emitted row under the FINAL registry
state. Their first cut rewrote the WHOLE output in one static
overwrite — semantically right and idempotent, but at a 100 TB output
the blast radius of one failed job was the entire corpus rewrite.

This kernel restores the bound the per-row convergence arguments
already allow: the repair verdict for a row depends only on (row,
final registry), never on other partitions, so the output's
``_batch_id`` partitions can be repaired ONE AT A TIME with dynamic
partition overwrite, and a crash loses at most one partition's worth
of work. A marker file at the output root records which partitions
were repaired UNDER WHICH registry state (a content fingerprint of
the registry's resolved totals): resume skips them; a registry that
has since ingested more batches changes the fingerprint and the
repair starts over — repaired-under-stale-state partitions must not
be skipped, that would silently freeze old verdicts.

Per-partition discipline (the repo's overwrite rules, applied):
- the repaired frame pins to blocks (``localCheckpoint``) before the
  write, since dynamic overwrite deletes the files it was read from;
- an ALL-DROPPED partition is deleted outright through the Hadoop
  FileSystem API — a zero-row dynamic overwrite writes nothing and
  would leave the stale rows alive (the inverse of the zero-row
  ``partitionBy`` pitfall);
- if every partition ends up deleted the whole output dir is removed
  (the ``LexicalIndex.compact`` all-dropped discipline): a file-less
  partitioned dir is unreadable, an absent one is honestly empty.

The marker (``_repair-<label>.json``, underscore-prefixed so parquet
readers ignore it) is advisory state for THIS repair pass only —
losing it costs a full re-repair (idempotent), corrupting it raises.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def registry_fingerprint(df: DataFrame, *cols: str) -> str:
    """Content fingerprint of a registry's resolved totals: a
    commutative xxhash64 sum (decimal accumulator — the
    ``content_batch_id`` overflow rule) over ``cols``, independent of
    partitioning and row order. One small agg job over a frame the
    repair is about to join against anyway."""
    h = (
        df.agg(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"))
        .collect()[0]["h"]
        or 0
    )
    return str(int(h))


def _marker_path(out_path: str, label: str) -> str:
    return out_path.rstrip("/") + f"/_repair-{label}.json"


def _read_marker(spark: SparkSession, out_path: str, label: str) -> dict:
    from propulsion_spark.fsio import fs_read_small

    line = fs_read_small(spark, _marker_path(out_path, label))
    if line is None:
        return {"fp": None, "done": []}
    return json.loads(line)


def _write_marker(
    spark: SparkSession, out_path: str, label: str, fp: str, done: list
) -> None:
    from propulsion_spark.fsio import fs_write_small

    fs_write_small(
        spark,
        _marker_path(out_path, label),
        json.dumps({"fp": fp, "done": sorted(done)}) + "\n",
    )


def repair_partitions(
    spark: SparkSession,
    out_path: str,
    label: str,
    registry_fp: str,
    repair_one,
    on_repaired=None,
    chunk_size: int = 1,
) -> dict:
    """Run ``repair_one(partition_df) -> repaired_df`` over every
    ``_batch_id`` partition of ``out_path`` not yet repaired under
    ``registry_fp``, rewriting each with dynamic partition overwrite
    (resume from the marker; see module doc). ``repaired_df`` must
    carry the partition's ``_batch_id`` column. Optional
    ``on_repaired(partition_df, pinned_df)`` runs after the repaired
    frame is pinned to blocks and before the overwrite — the one spot
    where caller stats can compare old vs new WITHOUT re-running the
    repair plan (the pre-r15 whole-output pass computed its deltas
    there too). Returns ``{"repaired": n, "skipped": n,
    "deleted_partitions": n, "rows_before": n, "rows_after": n}`` for
    THIS run (resumed-over partitions count as skipped and contribute
    no row counts).

    ``chunk_size`` trades blast radius for driver-job amortization:
    the default 1 repairs strictly one partition per write (a crash
    re-does at most one partition); an output with 10^3–10^4 batch
    partitions pays ~3 sequential Spark jobs per partition at that
    setting (pin, post-repair count, overwrite — the pre-repair counts
    are one job up front for the whole pass), so raise the chunk to
    repair K partitions per dynamic overwrite — the failure unit
    becomes one CHUNK, still bounded and resumable, while the job
    count drops K-fold (SCALE.md knob)."""
    from propulsion_spark.fsio import _fs_and_path, fs_delete

    # partition ids from the directory listing, not a Spark job: the
    # `_batch_id=<n>` dirs ARE the ground truth, and a resumed repair
    # whose previous run deleted every partition (crash before the
    # final cleanup) would make a parquet read of the file-less dir
    # fail before any repair could run
    fs, jroot = _fs_and_path(spark, out_path)
    _zero = {
        "repaired": 0,
        "skipped": 0,
        "deleted_partitions": 0,
        "rows_before": 0,
        "rows_after": 0,
    }
    if not fs.exists(jroot):
        return dict(_zero)
    ids = sorted(
        int(name.split("=", 1)[1])
        for name in (
            s.getPath().getName() for s in fs.listStatus(jroot)
        )
        if name.startswith("_batch_id=")
    )
    if not ids:
        fs_delete(spark, out_path)
        return dict(_zero)
    state = _read_marker(spark, out_path, label)
    done = set(state["done"]) if state["fp"] == registry_fp else set()
    n_deleted = n_repaired = n_skipped = 0
    rows_before = rows_after = 0
    pending = []
    for bid in ids:
        if bid in done:
            n_skipped += 1
        else:
            pending.append(bid)
    chunk_size = max(1, int(chunk_size))
    # pre-repair row counts for EVERY pending partition in ONE job up
    # front (the per-chunk `part.count()` paid one job per chunk — at
    # 10^4 batch partitions that was 10^4 driver-scheduled jobs); the
    # counts are collected before any overwrite, so the loop's dynamic
    # rewrites cannot skew them. A dir with zero data rows simply has
    # no groupBy row — same 0 the per-chunk count returned.
    before_per = {}
    if pending:
        before_per = {
            r["_batch_id"]: int(r["count"])
            for r in spark.read.parquet(out_path)
            .filter(F.col("_batch_id").isin(pending))
            .groupBy("_batch_id")
            .count()
            .collect()
        }
    for i in range(0, len(pending), chunk_size):
        chunk = pending[i : i + chunk_size]
        part = spark.read.parquet(out_path).filter(
            F.col("_batch_id").isin(chunk)
        )
        repaired = repair_one(part).localCheckpoint(eager=True)
        rows_before += sum(before_per.get(b, 0) for b in chunk)
        # one job over the pinned blocks yields BOTH the row count and
        # the set of partitions the dynamic overwrite will emit (the
        # survivors); a separate count + distinct-collect paid two
        per = repaired.groupBy("_batch_id").count().collect()
        n_after = sum(int(r["count"]) for r in per)
        rows_after += n_after
        if on_repaired is not None:
            on_repaired(part, repaired)
        # a chunk member whose rows ALL dropped gets no partition from
        # the dynamic overwrite — its stale dir must be deleted, else
        # the old rows stay alive (the zero-row overwrite pitfall)
        if n_after:
            alive = {r["_batch_id"] for r in per}
            (
                repaired.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(out_path)
            )
        else:
            alive = set()
        for bid in chunk:
            if bid not in alive:
                fs_delete(spark, f"{out_path.rstrip('/')}/_batch_id={bid}")
                n_deleted += 1
        done.update(chunk)
        n_repaired += len(chunk)
        _write_marker(spark, out_path, label, registry_fp, list(done))
    # every partition dropped (across THIS run and any resumed-over
    # predecessors): remove the file-less dir outright (ADVICE r14 —
    # an unreadable husk of markers is worse than an absent path)
    if not any(
        s.getPath().getName().startswith("_batch_id=")
        for s in fs.listStatus(jroot)
    ):
        fs_delete(spark, out_path)
    return {
        "repaired": n_repaired,
        "skipped": n_skipped,
        "deleted_partitions": n_deleted,
        "rows_before": rows_before,
        "rows_after": rows_after,
    }
