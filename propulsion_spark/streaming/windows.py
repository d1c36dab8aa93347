"""Streaming twins of the batch window operators
(operators/windows.py): the same semantics as continuous queries with
watermarks — the extension surface the reference lacks (SURVEY §2.6:
no event-time in Propulsion; late data here is governed by watermark
instead of write-position dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of window_tumbling_hourly: late rows beyond the
    watermark are dropped; closed windows emit exactly once in append
    mode."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def session_stream(
    events: DataFrame,
    key: str = "stream_name",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of window_sessions via session_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def asof_enrich_foreach_batch(
    dimension: DataFrame,
    out_path: str,
    key: str = "user_id",
    dim_key: str = "o_custkey",
    dim_time: str = "o_orderdate",
    payload: "tuple[str, ...]" = ("o_orderkey", "o_orderdate", "o_totalprice"),
):
    """Streaming twin of ``asof_join_orders``: a ``foreachBatch``
    callable that as-of-enriches each micro-batch of events against a
    dimension snapshot and appends the result to ``out_path``.

    The batch operator's union-tag-window plan needs an unbounded sort,
    which a continuous streaming plan forbids — but each micro-batch IS
    a batch, so the per-trigger enrichment reuses the exact batch
    method against the current dimension snapshot (re-resolved every
    trigger, so a slowly-changing dimension is picked up between
    batches). No stream-side state; one shuffle per batch on the key.
    """
    from pyspark.sql import Window

    def enrich(batch: DataFrame, batch_id: int) -> None:
        dim_tagged = dimension.select(
            F.col(dim_key).alias("_key"),
            F.col(dim_time).cast("timestamp").alias("_t"),
            F.lit(1).alias("_is_dim"),
            F.lit(None).cast("long").alias("event_id"),
            F.struct(*[F.col(c) for c in payload]).alias("_payload"),
        )
        ev_tagged = batch.select(
            F.col(key).alias("_key"),
            F.col("ts").cast("timestamp").alias("_t"),
            F.lit(0).alias("_is_dim"),
            "event_id",
            F.lit(None).cast(dim_tagged.schema["_payload"].dataType).alias(
                "_payload"
            ),
        )
        w = (
            Window.partitionBy("_key")
            .orderBy(
                F.col("_t").asc(),
                F.col("_is_dim").desc(),
                F.col(f"_payload.{payload[0]}").asc(),
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        (
            dim_tagged.unionByName(ev_tagged)
            .withColumn("_last", F.last("_payload", ignorenulls=True).over(w))
            .filter(F.col("_is_dim") == 0)
            .select(
                "event_id",
                F.col("_key").alias(key),
                F.col("_t").alias("ts"),
                *[F.col(f"_last.{c}").alias(c) for c in payload],
            )
            # idempotent under foreachBatch's at-least-once replays: the
            # output is partitioned by batch id and dynamically
            # overwritten, so a re-run of batch N replaces exactly its
            # own partition instead of appending duplicates
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    return enrich
