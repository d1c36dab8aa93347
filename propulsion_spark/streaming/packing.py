"""Streaming twins of the packing-family operators
(:func:`~propulsion_spark.operators.packing.pack_documents` and
:func:`~propulsion_spark.operators.packing.shard_corpus`) — curated
corpora grow per micro-batch, and the packed token stream / shard
sequence must extend (never re-shuffle) as they do.

Batch packing lays the WHOLE corpus out in (split, doc_id) order and
batch sharding in (split, salted-hash) order; a stream cannot (future
docs are unknown), so the streaming contract is *append order*: each
micro-batch's documents are laid out in the operator's order WITHIN
the batch and appended to the split's stream at its carried position.
Feeding the same docs in stream-order batches reproduces the batch
operator's offsets exactly (pinned by tests) — for packing that means
doc_id-ordered batches, for sharding hash-ordered batches; arbitrary
arrival orders still produce valid bounded shards / sequences, just a
different (equally deterministic) permutation, the same greedy trade
the curation pipeline's cross-batch near-dedup documents.

State is one carry row per split — ``(split, last_offset)``, the
split's next free token position — kept as versioned ``_SUCCESS``-gated
parquet snapshots exactly like the other foreachBatch twins
(``streaming/windows.py``): replay of batch N reads the same v(N-1)
state and rewrites the same ``_batch_id`` output partition (dynamic
overwrite), so at-least-once delivery never duplicates or shifts
offsets. State is O(splits); the per-batch work is the same two-phase
distributed prefix sum as the batch operators — nothing driver-side
grows with the corpus.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propulsion_spark.operators.packing import (
    pack_documents,
    shard_corpus,
    with_seq_cols,
    with_shard_cols,
)

_CARRY_SCHEMA = "split string, last_offset long"


class _SplitCarry:
    """Versioned per-split stream positions shared by both twins:
    ``_SUCCESS``-gated parquet snapshots, replay-stable reads (batch N
    always folds over v(N−1)), previous-version retention for replays."""

    def __init__(self, spark, state_path: str):
        self.spark = spark
        self.state_path = state_path

    def versions(self) -> "list[int]":
        try:
            names = os.listdir(self.state_path)
        except FileNotFoundError:
            return []
        return sorted(
            int(n[1:])
            for n in names
            if n.startswith("v")
            and n[1:].isdigit()
            and os.path.exists(os.path.join(self.state_path, n, "_SUCCESS"))
        )

    def read_prior(self, batch_id: int) -> "tuple[DataFrame, list[int]]":
        prior = [v for v in self.versions() if v < batch_id]
        if prior:
            carry = self.spark.read.schema(_CARRY_SCHEMA).parquet(
                os.path.join(self.state_path, f"v{prior[-1]}")
            )
        else:
            carry = self.spark.createDataFrame([], _CARRY_SCHEMA)
        return carry, prior

    def advance(
        self,
        batch_id: int,
        prior: "list[int]",
        carry: DataFrame,
        batch_totals: DataFrame,
    ) -> None:
        """Write v(batch_id) = carry + per-split batch token totals for
        touched splits, untouched splits verbatim; drop versions older
        than v(batch_id−…)'s replay window."""
        touched = (
            batch_totals.join(carry, "split", "left")
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
            os.path.join(self.state_path, f"v{batch_id}")
        )
        # keep this version + the previous one (replay of N needs N-1)
        for v in self.versions():
            if v < batch_id and (prior and v != prior[-1]):
                shutil.rmtree(
                    os.path.join(self.state_path, f"v{v}"),
                    ignore_errors=True,
                )


def _shift_by_carry(local: DataFrame, carry: DataFrame) -> DataFrame:
    """Add each split's carried stream position to batch-local offsets."""
    return local.join(F.broadcast(carry), "split", "left").select(
        "split",
        "doc_id",
        "n_tokens",
        (F.col("offset") + F.coalesce("last_offset", F.lit(0))).alias(
            "offset"
        ),
    )


def _write_batch(out_path: str, df: DataFrame, batch_id: int) -> None:
    (
        df.withColumn("_batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(out_path)
    )


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
    state = _SplitCarry(spark, state_path)

    def process(batch: DataFrame, batch_id: int) -> None:
        carry, prior = state.read_prior(batch_id)
        # batch-local offsets via the same distributed prefix sum, then
        # shift each split by its carried stream position
        local = pack_documents(
            batch,
            seq_len,
            split_col=split_col,
            order_col=order_col,
            token_col=token_col,
        ).select("split", "doc_id", "n_tokens", "offset")
        _write_batch(
            out_path, with_seq_cols(_shift_by_carry(local, carry), seq_len),
            batch_id,
        )
        state.advance(
            batch_id,
            prior,
            carry,
            local.groupBy("split").agg(
                F.sum("n_tokens").alias("_batch_tokens")
            ),
        )

    return process


def shard_foreach_batch(
    spark,
    state_path: str,
    out_path: str,
    shard_tokens: int,
    split_col: str = "split",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    salt: str = "shard-0",
):
    """A ``foreachBatch`` callable: incremental shuffle-and-shard with a
    durable per-split stream position — curation feeds sharding
    end-to-end streaming, shards fill in arrival order (hash-shuffled
    WITHIN each batch) and new docs only ever extend the tail shard
    region, never reshuffle closed shards. Output rows match
    ``shard_corpus`` column-for-column plus ``_batch_id``."""
    state = _SplitCarry(spark, state_path)

    def process(batch: DataFrame, batch_id: int) -> None:
        carry, prior = state.read_prior(batch_id)
        local = shard_corpus(
            batch,
            shard_tokens,
            split_col=split_col,
            id_col=id_col,
            token_col=token_col,
            salt=salt,
        ).select("split", "doc_id", "n_tokens", "offset")
        _write_batch(
            out_path,
            with_shard_cols(_shift_by_carry(local, carry), shard_tokens),
            batch_id,
        )
        state.advance(
            batch_id,
            prior,
            carry,
            local.groupBy("split").agg(
                F.sum("n_tokens").alias("_batch_tokens")
            ),
        )

    return process
