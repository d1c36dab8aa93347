"""Streaming twin of :func:`~propulsion_spark.operators.packing.pack_documents`
— curated corpora grow per micro-batch, and the packed token stream
must extend (never re-shuffle) as they do.

Batch packing lays the WHOLE corpus out in (split, doc_id) order; a
stream cannot (future docs are unknown), so the streaming contract is
*append order*: each micro-batch's documents are packed in (split,
doc_id) order within the batch and appended to the split's stream at
its carried position. Feeding the same docs in doc_id-ordered batches
reproduces the batch operator's offsets exactly (pinned by test).

State is one carry row per split — ``(split, last_offset)``, the
split's next free token position — kept as versioned ``_SUCCESS``-gated
parquet snapshots exactly like the other foreachBatch twins
(``streaming/windows.py``): replay of batch N reads the same v(N-1)
state and rewrites the same ``_batch_id`` output partition (dynamic
overwrite), so at-least-once delivery never duplicates or shifts
offsets. State is O(splits); the per-batch work is the same two-phase
distributed prefix sum as the batch operator — nothing driver-side
grows with the corpus.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propulsion_spark.operators.packing import pack_documents, with_seq_cols


def pack_foreach_batch(
    spark,
    state_path: str,
    out_path: str,
    seq_len: int,
    split_col: str = "split",
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
):
    """A ``foreachBatch`` callable: incremental sequence packing with a
    durable per-split stream position. Output rows match
    ``pack_documents`` column-for-column plus ``_batch_id``."""
    state_schema = "split string, last_offset long"

    def _versions() -> "list[int]":
        try:
            names = os.listdir(state_path)
        except FileNotFoundError:
            return []
        return sorted(
            int(n[1:])
            for n in names
            if n.startswith("v")
            and n[1:].isdigit()
            and os.path.exists(os.path.join(state_path, n, "_SUCCESS"))
        )

    def process(batch: DataFrame, batch_id: int) -> None:
        prior_versions = [v for v in _versions() if v < batch_id]
        if prior_versions:
            carry = spark.read.schema(state_schema).parquet(
                os.path.join(state_path, f"v{prior_versions[-1]}")
            )
        else:
            carry = spark.createDataFrame([], state_schema)

        # batch-local offsets via the same distributed prefix sum, then
        # shift each split by its carried stream position
        local = pack_documents(
            batch,
            seq_len,
            split_col=split_col,
            order_col=order_col,
            token_col=token_col,
        ).select("split", "doc_id", "n_tokens", "offset")
        shifted = (
            local.join(F.broadcast(carry), "split", "left")
            .select(
                "split",
                "doc_id",
                "n_tokens",
                (
                    F.col("offset") + F.coalesce("last_offset", F.lit(0))
                ).alias("offset"),
            )
        )
        packed = with_seq_cols(shifted, seq_len)
        (
            packed.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )
        # next carry: carried position + this batch's per-split token
        # totals for touched splits, untouched splits' rows verbatim
        touched = (
            local.groupBy("split")
            .agg(F.sum("n_tokens").alias("_batch_tokens"))
            .join(carry, "split", "left")
            .select(
                "split",
                (
                    F.coalesce("last_offset", F.lit(0))
                    + F.col("_batch_tokens")
                ).alias("last_offset"),
            )
        )
        new_carry = touched.unionByName(
            carry.join(touched.select("split"), "split", "left_anti")
        )
        new_carry.write.mode("overwrite").parquet(
            os.path.join(state_path, f"v{batch_id}")
        )
        # keep this version + the previous one (replay of N needs N-1)
        for v in _versions():
            if v < batch_id and (prior_versions and v != prior_versions[-1]):
                shutil.rmtree(os.path.join(state_path, f"v{v}"), ignore_errors=True)

    return process
