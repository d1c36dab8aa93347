"""Timeseries join operators over ``events``/``orders`` — as-of join
and banded range join, the two join shapes Spark lacks as built-ins and
a training-data pipeline keeps needing (feature lookups "most recent
fact at or before t", sliding-lookback enrichment).

Both are expressed as compositions of existing DataFrame ops chosen for
their 100 TB shape:

- **As-of join** (``asof_join_orders``): the union-tag-window method —
  union both sides keyed and time-sorted, carry the build side's payload
  forward with ``last(..., ignorenulls)`` over a rows-unbounded window,
  keep probe rows. ONE shuffle on the join key, state bounded by one
  payload row per partition frame — against the naive per-probe
  subquery (O(probe × build) inequality join) this is the plan that
  survives a billion-row probe side. Ties are deterministic: at equal
  time the order row sorts before the event (at-or-before semantics)
  and the max order key wins.
- **Banded range join** (``range_join_events_1h``): the interval is
  bounded (1 hour), so the inequality join becomes an equi-join on
  (key, hour bucket) with the probe exploded to the 2 candidate
  buckets, then an exact filter — candidates per probe are bounded by
  per-bucket density, never O(n) per row. This is the standard
  bucketed-range-join rewrite Spark's optimizer does not do for you.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.operators import register

HOUR_US = 3_600_000_000


@register(
    "asof_join_orders",
    """
SELECT event_id, user_id, ts, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT e.event_id, e.user_id, e.ts,
         o.o_orderkey, o.o_orderdate, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
""",
    doc="As-of join: each event enriched with the customer's most recent "
    "order at or before the event time (ties → max order key; customers "
    "with no prior order → nulls). Union-tag-window plan: ONE shuffle on "
    "the customer key, no inequality join — the shape that survives a "
    "billion-row event side.",
)
def q_asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    od = load_table(spark, sf_dir, "orders")
    orders_tagged = od.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        F.struct(
            F.col("o_orderkey"),
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            F.col("o_totalprice"),
        ).alias("ord"),
    )
    events_tagged = ev.select(
        F.col("user_id").alias("key"),
        F.col("ts").cast("timestamp").alias("t"),
        F.lit(0).alias("is_order"),
        "event_id",
        F.lit(None)
        .cast("struct<o_orderkey:bigint,o_orderdate:timestamp,o_totalprice:double>")
        .alias("ord"),
    )
    # at equal t the order row must sort BEFORE the event (at-or-before
    # includes same-instant orders) and among same-t orders the max
    # order key must sort last so last() picks it — deterministic ties
    w = (
        Window.partitionBy("key")
        .orderBy(
            F.col("t").asc(),
            F.col("is_order").desc(),
            F.col("ord.o_orderkey").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        orders_tagged.unionByName(events_tagged)
        .withColumn("last_ord", F.last("ord", ignorenulls=True).over(w))
        .filter(F.col("is_order") == 0)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.col("t").alias("ts"),
            F.col("last_ord.o_orderkey").alias("o_orderkey"),
            F.col("last_ord.o_orderdate").alias("o_orderdate"),
            F.col("last_ord.o_totalprice").alias("o_totalprice"),
        )
    )


@register(
    "range_join_events_1h",
    """
SELECT e.event_id, e.user_id, e.ts,
       CAST(count(b.event_id) AS BIGINT) AS n_prior_1h,
       COALESCE(CAST(sum(CAST(b.value AS DECIMAL(38,6))) AS DOUBLE), 0.0)
           AS prior_value_sum
FROM events e LEFT JOIN events b
  ON b.user_id = e.user_id AND b.ts >= e.ts - INTERVAL 1 HOUR AND b.ts < e.ts
GROUP BY e.event_id, e.user_id, e.ts
""",
    doc="Sliding-lookback range join: per event, count/sum the same "
    "user's events in the preceding hour. Banded plan: equi-join on "
    "(user, hour-bucket) with the probe exploded to its 2 candidate "
    "buckets + exact interval filter — candidate volume is bounded by "
    "per-bucket density instead of the O(n²) inequality join. Decimal "
    "sum keeps the cross-engine float exactness.",
)
def q_range_join_events_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    bucket = F.expr(f"unix_micros(ts) div {HOUR_US}")
    probe = base.withColumn(
        "bucket", F.explode(F.array(bucket - 1, bucket))
    )
    build = base.select(
        F.col("user_id").alias("b_user"),
        bucket.alias("bucket"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
        F.col("event_id").alias("b_event_id"),
    )
    pairs = probe.join(
        build,
        (probe.user_id == build.b_user) & (probe.bucket == build.bucket),
    ).filter(
        (F.col("b_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("b_ts") < F.col("ts"))
    )
    agg = pairs.groupBy("event_id").agg(
        F.count("*").alias("n_prior_1h"),
        F.sum(F.col("b_value").cast("decimal(38,6)"))
        .cast("double")
        .alias("prior_value_sum"),
    )
    return base.join(agg, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce("n_prior_1h", F.lit(0)).cast("long").alias("n_prior_1h"),
        F.coalesce("prior_value_sum", F.lit(0.0)).alias("prior_value_sum"),
    )


# --------------------------------------------- resample + gap-fill
@register(
    "timeseries_resample",
    """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         count(*) AS n_events,
         max(value) AS hi,
         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS volume
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM spans
),
joined AS (
  SELECT s.user_id, s.hour, h.n_events, h.hi, h.volume
  FROM spine s LEFT JOIN hourly h USING (user_id, hour)
),
grouped AS (
  SELECT *, count(hi) OVER (PARTITION BY user_id ORDER BY hour
                            ROWS UNBOUNDED PRECEDING) AS grp
  FROM joined
)
SELECT user_id, hour,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       max(hi) OVER (PARTITION BY user_id, grp) AS hi_ffill,
       coalesce(volume, 0.0) AS volume,
       (n_events IS NULL) AS gap_filled
FROM grouped
""",
    doc="Time-series resampling with gap fill: each user's event stream "
    "regularized onto an hourly grid from its first to its last active "
    "hour — empty hours materialized with n_events=0 and the per-hour "
    "max forward-filled across the gap (the resample→ffill shape "
    "feature pipelines need before windowed models). The dense spine "
    "comes from sequence()/explode per user (rows ∝ span hours, never "
    "a calendar cross join), and the forward fill is the "
    "run-numbering trick — a running count of non-null hours defines "
    "fill groups, max within group carries the value — instead of "
    "last(ignorenulls), keeping the whole plan in exactly-typed "
    "aggregates that are bit-identical across engines. Decimal sums "
    "for the volume column; one shuffle per aggregate grain and the "
    "fill windows reuse the user partitioning.",
)
def q_timeseries_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count("*").alias("n_events"),
        F.max("value").alias("hi"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("volume"),
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = spans.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, INTERVAL 1 HOUR)")).alias("hour"),
    )
    joined = spine.join(hourly, ["user_id", "hour"], "left")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = joined.withColumn("grp", F.count("hi").over(w_run))
    w_grp = Window.partitionBy("user_id", "grp")
    return grouped.select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.max("hi").over(w_grp).alias("hi_ffill"),
        F.coalesce("volume", F.lit(0.0)).alias("volume"),
        F.col("n_events").isNull().alias("gap_filled"),
    )
