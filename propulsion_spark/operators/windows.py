"""Time-window extension operators over ``events`` (SURVEY.md §7 step 10).

The reference has no event-time windows (SURVEY §2.6) — these are the
north-star additions, expressed so the same semantics run in batch
(below, oracle-checked) and in Structured Streaming (streaming/ module,
`F.window`/`session_window` + watermark).

Epoch-aligned tumbling windows match `date_trunc`; session windows are
computed with the lag/cumsum island method so batch and oracle agree
exactly; micro-second epoch arithmetic avoids cross-engine timestamp
truncation differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.operators import register
from propulsion_spark.operators.fixtures import prelude

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


# ------------------------------------------------------------- tumbling
@register(
    "window_tumbling_hourly",
    """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling 1-hour window aggregate (epoch-aligned, = date_trunc). "
    "Streaming twin: groupBy(F.window(ts, '1 hour')) + watermark.",
)
def q_window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


# ------------------------------------------------------------- sliding
@register(
    "window_sliding_2h_1h",
    """
SELECT window_start, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM (
  SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
         value
  FROM events
)
GROUP BY window_start
""",
    doc="Sliding window (2h length, 1h step): each event lands in two "
    "epoch-aligned windows. Streaming twin: F.window(ts, '2 hours', '1 hour').",
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total")
    )


# ------------------------------------------------------------- sessions
@register(
    "window_sessions",
    prelude()
    + f"""
SELECT stream_name, min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM (
  SELECT stream_name, ts,
         sum(is_new) OVER (PARTITION BY stream_name ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (
    SELECT stream_name, ts, event_id,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY stream_name ORDER BY ts, event_id)
                    > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS is_new
    FROM stream_events
  )
)
GROUP BY stream_name, session_id
""",
    doc="Session windows (30-min inactivity gap) via the lag/cumsum island "
    "method — identical semantics in batch and oracle. Streaming twin: "
    "session_window(ts, '30 minutes').",
)
def q_window_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("stream_name", "session_start", "session_end", "n_events")
    )
