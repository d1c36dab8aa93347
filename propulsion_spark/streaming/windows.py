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


def range_lookback_foreach_batch(
    spark,
    state_path: str,
    out_path: str,
    key: str = "user_id",
    lookback_s: int = 3600,
    late_s: int = 600,
):
    """Streaming twin of ``range_join_events_1h``: a ``foreachBatch``
    callable that, per micro-batch, counts/sums each event's same-key
    priors within the lookback window against watermark-bounded durable
    state, using the batch operator's banded plan (equi-join on
    (key, lookback-bucket) with a 2-bucket probe explode + exact
    interval filter — never an O(n²) inequality join).

    State is the stream's own recent history, kept as VERSIONED parquet
    snapshots under ``state_path`` (``v<batch_id>``, ``_SUCCESS``-gated):
    each batch reads the newest complete version OLDER than itself,
    unions the current batch, and writes survivors newer than
    ``max(ts) - lookback - late`` as its own version. Replay of batch N
    therefore re-reads exactly the inputs the first attempt saw and
    rewrites the same artifacts — and the output is partitioned by
    ``_batch_id`` with dynamic overwrite, so at-least-once foreachBatch
    delivery never duplicates rows (same contract as
    ``asof_enrich_foreach_batch``). State size is bounded by the
    watermark (``late_s``), not by stream lifetime: rows older than
    lookback+late are dropped at every snapshot, so per-batch cost is
    O(batch + window volume) regardless of how long the stream runs.

    Lateness semantics: every event in the batch gets an output row,
    but an event arriving later than ``late_s`` may undercount priors
    that were already compacted away — the watermark trade, stated
    rather than hidden.
    """
    import os
    import shutil
    from datetime import timedelta

    bucket_us = lookback_s * 1_000_000
    state_schema = f"{key} long, ts timestamp, value double"

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
        probe = batch.select("event_id", key, "ts", "value")
        prior_versions = [v for v in _versions() if v < batch_id]
        hist = probe.drop("event_id")
        if prior_versions:
            hist = hist.unionByName(
                spark.read.schema(state_schema).parquet(
                    os.path.join(state_path, f"v{prior_versions[-1]}")
                )
            )
        bucket = F.expr(f"unix_micros(ts) div {bucket_us}")
        probe_b = probe.withColumn(
            "bucket", F.explode(F.array(bucket - 1, bucket))
        )
        build = hist.select(
            F.col(key).alias("_b_key"),
            bucket.alias("bucket"),
            F.col("ts").alias("_b_ts"),
            F.col("value").alias("_b_value"),
        )
        pairs = probe_b.join(
            build,
            (probe_b[key] == build._b_key) & (probe_b.bucket == build.bucket),
        ).filter(
            (F.col("_b_ts") >= F.col("ts") - F.expr(f"INTERVAL {lookback_s} SECOND"))
            & (F.col("_b_ts") < F.col("ts"))
        )
        agg = pairs.groupBy("event_id").agg(
            F.count("*").alias("n_prior_1h"),
            F.sum(F.col("_b_value").cast("decimal(38,6)"))
            .cast("double")
            .alias("prior_value_sum"),
        )
        (
            probe.join(agg, "event_id", "left")
            .select(
                "event_id",
                key,
                "ts",
                F.coalesce("n_prior_1h", F.lit(0)).cast("long").alias("n_prior_1h"),
                F.coalesce("prior_value_sum", F.lit(0.0)).alias("prior_value_sum"),
            )
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )
        mx = probe.agg(F.max("ts")).first()[0]
        if mx is None:
            return  # empty batch: no state advance, no version churn
        cutoff = mx - timedelta(seconds=lookback_s + late_s)
        (
            hist.filter(F.col("ts") >= F.lit(cutoff))
            .write.mode("overwrite")
            .parquet(os.path.join(state_path, f"v{batch_id}"))
        )
        # keep this version + the previous one (replay of N needs N-1);
        # everything older is dead under monotone batch ids
        for v in _versions():
            if v < batch_id and (prior_versions and v != prior_versions[-1]):
                shutil.rmtree(os.path.join(state_path, f"v{v}"), ignore_errors=True)

    return process


def resample_ffill_foreach_batch(
    spark,
    state_path: str,
    out_path: str,
    key: str = "user_id",
):
    """Streaming twin of ``timeseries_resample``: a ``foreachBatch``
    callable that keeps each key's event stream regularized onto an
    hourly grid ACROSS micro-batches — hours with no events (including
    whole gap hours between batches) are materialized with n_events=0
    and the last observed per-hour max forward-filled into them.

    State is one carry row per key — ``(key, last_hour, last_hi)``, the
    newest emitted grid hour and the value to carry into the next gap —
    kept as versioned ``_SUCCESS``-gated parquet snapshots exactly like
    ``range_lookback_foreach_batch``'s history (replay of batch N reads
    the same v(N-1) state and rewrites the same artifacts), and the
    output is ``_batch_id``-partitioned with dynamic overwrite, so
    at-least-once foreachBatch delivery never duplicates grid rows.
    State is O(keys), not O(events) — the resample needs only the carry
    value, never history.

    Lateness: an event older than its key's already-emitted grid
    (ts-hour ≤ last_hour) cannot retrofit closed hours; it is dropped
    with the same stated watermark trade as the other twins. A key
    absent from a batch does not tick (event-time progress is
    per-key).
    """
    import os
    import shutil

    state_schema = f"{key} long, last_hour timestamp, last_hi double"

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
        from pyspark.sql import Window

        prior_versions = [v for v in _versions() if v < batch_id]
        if prior_versions:
            carry = spark.read.schema(state_schema).parquet(
                os.path.join(state_path, f"v{prior_versions[-1]}")
            )
        else:
            carry = spark.createDataFrame([], state_schema)

        hourly = (
            batch.select(key, F.date_trunc("hour", F.col("ts")).alias("hour"),
                         "value")
            .join(carry.select(key, "last_hour"), key, "left")
            # late events for already-emitted hours are dropped (stated)
            .filter(F.col("last_hour").isNull() | (F.col("hour") > F.col("last_hour")))
            .groupBy(key, "hour")
            .agg(
                F.count("*").alias("n_events"),
                F.max("value").alias("hi"),
                F.sum(F.col("value").cast("decimal(38,6)"))
                .cast("double")
                .alias("volume"),
            )
        )
        # per-key grid bounds: resume at last_hour+1h when state exists
        spans = (
            hourly.groupBy(key)
            .agg(F.min("hour").alias("b0"), F.max("hour").alias("h1"))
            .join(carry, key, "left")
            .select(
                key,
                F.coalesce(
                    F.col("last_hour") + F.expr("INTERVAL 1 HOUR"), F.col("b0")
                ).alias("h0"),
                "h1",
                "last_hour",
                "last_hi",
            )
        )
        spine = spans.select(
            key,
            "last_hi",
            F.explode(F.expr("sequence(h0, h1, INTERVAL 1 HOUR)")).alias("hour"),
        )
        joined = spine.join(hourly, [key, "hour"], "left")
        w_run = (
            Window.partitionBy(key)
            .orderBy("hour")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        grouped = joined.withColumn("grp", F.count("hi").over(w_run))
        w_grp = Window.partitionBy(key, "grp")
        grid = grouped.select(
            key,
            "hour",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            # grp=0 rows precede this batch's first observation: carry
            # the previous batch's last value across the gap
            F.coalesce(F.max("hi").over(w_grp), F.col("last_hi")).alias("hi_ffill"),
            F.coalesce("volume", F.lit(0.0)).alias("volume"),
            F.col("n_events").isNull().alias("gap_filled"),
        )
        (
            grid.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )
        # next carry: newest grid hour + its forward-filled value per
        # touched key, plus untouched keys' rows verbatim
        w_last = Window.partitionBy(key).orderBy(F.col("hour").desc())
        touched = (
            grid.withColumn("_rn", F.row_number().over(w_last))
            .filter(F.col("_rn") == 1)
            .select(
                key,
                F.col("hour").alias("last_hour"),
                F.col("hi_ffill").alias("last_hi"),
            )
        )
        new_carry = touched.unionByName(
            carry.join(touched.select(key), key, "left_anti")
        )
        new_carry.write.mode("overwrite").parquet(
            os.path.join(state_path, f"v{batch_id}")
        )
        for v in _versions():
            if v < batch_id and (prior_versions and v != prior_versions[-1]):
                shutil.rmtree(os.path.join(state_path, f"v{v}"), ignore_errors=True)

    return process
