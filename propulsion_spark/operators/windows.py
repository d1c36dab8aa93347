"""Time-window extension operators over ``events`` (SURVEY.md §7 step 10).

The reference has no event-time windows (SURVEY §2.6) — these are the
north-star additions, expressed so the same semantics run in batch
(below, oracle-checked) and in Structured Streaming (streaming/ module,
`F.window`/`session_window` + watermark).

Epoch-aligned tumbling windows match `date_trunc`; session windows are
computed with the lag/cumsum island method so batch and oracle agree
exactly; micro-second epoch arithmetic avoids cross-engine timestamp
truncation differences.

All three window shapes are verified through ONE registered query
(``window_aggregates``, a union with a ``kind`` discriminator) so the
driver's per-round query budget covers every shape; the individual
builders below remain the public API and the streaming twins' batch
reference semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.operators import register
from propulsion_spark.operators.fixtures import prelude

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


# ------------------------------------------------------------- tumbling
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (epoch-aligned, = date_trunc).
    Streaming twin: groupBy(F.window(ts, '1 hour')) + watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )


# ------------------------------------------------------------- sliding
def window_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h length, 1h step): each event lands in two
    epoch-aligned windows. Streaming twin: F.window(ts, '2 hours', '1 hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "total",
        )
    )


# ------------------------------------------------------------- sessions
def window_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) via the lag/cumsum island
    method — identical semantics in batch and oracle. Streaming twin:
    session_window(ts, '30 minutes')."""
    from propulsion_spark.operators.fixtures import stream_events

    se = stream_events(spark, sf_dir)
    order = Window.partitionBy("stream_name").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(order)
    marked = se.withColumn(
        "is_new", F.when(gap > SESSION_GAP_US, 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        marked.groupBy("stream_name", "session_id")
        .agg(
            F.min("ts").alias("window_start"),
            F.max("ts").alias("window_end"),
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"),
        )
        .select("stream_name", "window_start", "window_end", "n", "total")
    )


# ------------------------------------------------- merged oracle query
@register(
    "window_aggregates",
    prelude()
    + f"""
SELECT 'tumbling' AS kind, event_type AS grp_key,
       date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'sliding' AS kind, '' AS grp_key, window_start,
       window_start + INTERVAL 2 HOUR AS window_end,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM (
  SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
         value
  FROM events
)
GROUP BY window_start
UNION ALL
SELECT 'session' AS kind, stream_name AS grp_key,
       min(ts) AS window_start, max(ts) AS window_end,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM (
  SELECT stream_name, ts, value,
         sum(is_new) OVER (PARTITION BY stream_name ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (
    SELECT stream_name, ts, value, event_id,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY stream_name ORDER BY ts, event_id)
                    > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS is_new
    FROM stream_events
  )
)
GROUP BY stream_name, session_id
""",
    doc="All three window shapes (tumbling 1h, sliding 2h/1h, 30-min-gap "
    "sessions) unioned under a kind discriminator — one oracle row "
    "verifies every shape. Each leg is one groupBy(window) shuffle; the "
    "session leg's window functions ride the stream_name partitioning.",
)
def q_window_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    tumb = window_tumbling_hourly(spark, sf_dir).select(
        F.lit("tumbling").alias("kind"),
        F.col("event_type").alias("grp_key"),
        "window_start",
        "window_end",
        "n",
        "total",
    )
    slid = window_sliding_2h_1h(spark, sf_dir).select(
        F.lit("sliding").alias("kind"),
        F.lit("").alias("grp_key"),
        "window_start",
        "window_end",
        "n",
        "total",
    )
    sess = window_sessions(spark, sf_dir).select(
        F.lit("session").alias("kind"),
        F.col("stream_name").alias("grp_key"),
        "window_start",
        "window_end",
        "n",
        "total",
    )
    return tumb.unionByName(slid).unionByName(sess)
