"""Analytic surface over the TPC-H-ish star schema (SURVEY.md §2.7
Q-AGG¹/Q-JOIN¹ extension: classic group-agg, multi-way join,
filter+project, semi-join, top-k).

These exercise the engine's DataFrame layer on classic OLAP shapes and
double as bench headliners. Plans are fully declarative: filters reach
the parquet scan, dimension tables are broadcast, aggregates are
partial. Float determinism vs the oracle is guaranteed by summing
exact DECIMAL(38,6) casts (per-row double arithmetic is IEEE-identical
across engines; decimal addition is order-insensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.operators import register


def dec_sum(col: F.Column) -> F.Column:
    """Order-insensitive exact sum of a double expression."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")


# --------------------------------------------------- TPC-H Q1 analog
@register(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1-shaped pricing summary: scan-filter + 8-agg groupBy; "
    "checks partial aggregation + parquet predicate pushdown.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum(F.col("l_quantity")).alias("sum_qty"),
        dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        dec_sum(disc_price).alias("sum_disc_price"),
        dec_sum(charge).alias("sum_charge"),
        (dec_sum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
        (dec_sum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------- TPC-H Q5 analog
@register(
    "revenue_by_nation",
    """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
    doc="TPC-H Q5-shaped 6-way join: local-supplier revenue per nation; "
    "dims broadcast, fact joins shuffle on their keys.",
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # supplier is SF-SCALED (10k·SF rows) — unhinted so AQE
            # broadcasts it at bench scale but shuffles at 100 TB
            # instead of OOMing; nation/region below stay hinted
            # (constant 25/5 rows at every SF)
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# ----------------------------------------------------------- top-k
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per global ordering: agg + order + limit
    (TakeOrderedAndProject physical op — no full sort at scale).
    Oracle-verified through the merged ``priority_reports`` query."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            dec_sum(F.col("o_totalprice")).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


# ------------------------------------------------- semi-join (Q4-ish)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join: order priority of orders with
    any lineitem shipped after the order date.
    Oracle-verified through the merged ``priority_reports`` query."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# --------------------------------------------------- TPC-H Q6 analog
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped scan-heavy filter+agg: all predicates push to the
    parquet scan; no shuffle at all (single global aggregate).
    Oracle-verified through the merged ``revenue_kpis`` query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------- TPC-H Q3 analog
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: segment-filtered 3-way join,
    grouped revenue, global top-10 (TakeOrderedAndProject).
    Oracle-verified through the merged ``priority_reports`` query."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------- TPC-H Q12 analog
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped conditional aggregation over a fact join:
    priority-class line counts per line status.
    Oracle-verified through the merged ``priority_reports`` query."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------- merged priority/top-k report union
@register(
    "priority_reports",
    """
SELECT 'late_shipment' AS report, o_orderpriority AS k,
       CAST(NULL AS VARCHAR) AS detail,
       CAST(count(*) AS BIGINT) AS n, CAST(NULL AS BIGINT) AS n2,
       CAST(NULL AS DOUBLE) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
UNION ALL
SELECT 'shipping_topk', CAST(o_orderkey AS VARCHAR),
       strftime(o_orderdate, '%Y-%m-%d') || '|' || o_orderpriority,
       NULL, NULL, revenue
FROM (
  SELECT o_orderkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
         o_orderdate, o_orderpriority
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
    AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
  GROUP BY o_orderkey, o_orderdate, o_orderpriority
  ORDER BY revenue DESC, o_orderkey
  LIMIT 10
)
UNION ALL
SELECT 'linestatus_priority', l_linestatus, NULL,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT),
       NULL
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
UNION ALL
SELECT 'top_customers', CAST(c_custkey AS VARCHAR), c_name,
       n_orders, NULL, revenue
FROM (
  SELECT c_custkey, c_name,
         CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey, c_name
  ORDER BY revenue DESC, c_custkey
  LIMIT 10
)
UNION ALL
SELECT 'branded_revenue', p_brand, NULL,
       CAST(count(*) AS BIGINT), NULL,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size BETWEEN 1 AND 15
  AND l_quantity BETWEEN 5 AND 30
GROUP BY p_brand
""",
    doc="Merged priority/top-k report (one long-format union, five "
    "sub-reports): the TPC-H Q4-shaped EXISTS semi-join, the Q3-shaped "
    "3-way-join top-10, the Q12-shaped conditional aggregation, the "
    "customer-revenue top-K, and the Q19-shaped range-predicate "
    "broadcast join (brand revenue for bounded size/quantity bands, "
    "both range filters pushed to their scans). Each branch keeps its "
    "own optimal physical plan (semi-join, TakeOrderedAndProject, "
    "partial aggs) — the union is concatenation, not a shuffle — while "
    "costing one driver correctness slot instead of five.",
)
def q_priority_reports(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = F.lit(None).cast("string")
    b = F.lit(None).cast("long")
    d = F.lit(None).cast("double")
    late = q_late_shipment_priority(spark, sf_dir).select(
        F.lit("late_shipment").alias("report"),
        F.col("o_orderpriority").alias("k"),
        s.alias("detail"),
        F.col("n_orders").cast("long").alias("n"),
        b.alias("n2"),
        d.alias("revenue"),
    )
    ship = q_shipping_priority(spark, sf_dir).select(
        F.lit("shipping_topk").alias("report"),
        F.col("o_orderkey").cast("string").alias("k"),
        F.concat(
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.lit("|"),
            F.col("o_orderpriority"),
        ).alias("detail"),
        b.alias("n"),
        b.alias("n2"),
        F.col("revenue"),
    )
    mode = q_shipmode_priority(spark, sf_dir).select(
        F.lit("linestatus_priority").alias("report"),
        F.col("l_linestatus").alias("k"),
        s.alias("detail"),
        F.col("high_line_count").cast("long").alias("n"),
        F.col("low_line_count").cast("long").alias("n2"),
        d.alias("revenue"),
    )
    top = q_top_customers(spark, sf_dir).select(
        F.lit("top_customers").alias("report"),
        F.col("c_custkey").cast("string").alias("k"),
        F.col("c_name").alias("detail"),
        F.col("n_orders").cast("long").alias("n"),
        b.alias("n2"),
        F.col("revenue"),
    )
    brand = q_branded_quantity_revenue(spark, sf_dir).select(
        F.lit("branded_revenue").alias("report"),
        F.col("p_brand").alias("k"),
        s.alias("detail"),
        F.col("n_items").cast("long").alias("n"),
        b.alias("n2"),
        F.col("revenue"),
    )
    return (
        late.unionByName(ship)
        .unionByName(mode)
        .unionByName(top)
        .unionByName(brand)
    )


# --------------------------------------------------- TPC-H Q14 analog
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo revenue share: dimension attribute drives
    a conditional ratio; part dim broadcast against the fact scan.
    Oracle-verified through the merged ``revenue_kpis`` query."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)
    return (
        # part is SF-scaled (200k·SF rows): unhinted, AQE-sized (r15)
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0).cast("double")
                * dec_sum(promo_rev)
                / dec_sum(rev)
            ).alias("promo_share"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------- merged revenue KPIs
@register(
    "revenue_kpis",
    """
SELECT f.revenue AS forecast_revenue, f.n_items AS forecast_items,
       p.promo_share, p.n_items AS promo_items,
       u.n_users, u.signed_up, u.converted
FROM (
  SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
         CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    AND l_discount BETWEEN 0.05 AND 0.07
    AND l_quantity < 24
) f
CROSS JOIN (
  SELECT CAST(100.0 AS DOUBLE) *
         CAST(sum(CAST(CASE WHEN p_type LIKE 'PROMO%'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                       AS DECIMAL(38,6))) AS DOUBLE) /
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS promo_share,
         CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
) p
CROSS JOIN (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS signed_up,
         CAST(sum(CASE WHEN first_signup IS NOT NULL AND last_purchase > first_signup
                       THEN 1 ELSE 0 END) AS BIGINT) AS converted
  FROM (
    SELECT user_id,
           min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
           max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
    FROM events GROUP BY user_id
  )
) u
""",
    doc="KPI row: the TPC-H Q6-shaped forecast aggregate (pure "
    "pushed-down scan, zero shuffle), the Q14-shaped promo share "
    "(broadcast part dim against the fact scan), and the ordered-event "
    "signup→purchase funnel (one conditional aggregate per user, no "
    "self-join) cross-joined into one single-row result — three "
    "independent single-row aggregates cost two trivially-broadcast "
    "joins and one driver correctness slot.",
)
def q_revenue_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = q_forecast_revenue(spark, sf_dir).select(
        F.col("revenue").alias("forecast_revenue"),
        F.col("n_items").alias("forecast_items"),
    )
    p = q_promo_revenue_share(spark, sf_dir).select(
        "promo_share", F.col("n_items").alias("promo_items")
    )
    u = q_event_funnel(spark, sf_dir)
    return f.crossJoin(p).crossJoin(u)


# --------------------------------------------------- TPC-H Q19 analog
def q_branded_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped range-predicate join: brand revenue for bounded
    size/quantity bands; both range filters push to their scans.
    Oracle-verified through the merged ``priority_reports`` query."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(5, 30)
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size").between(1, 15))
    return (
        # part is SF-scaled even post-filter: unhinted, AQE-sized (r15)
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# ------------------------------------ rollup + pivot lineitem report
@register(
    "status_rollup",
    """
WITH r AS (
  SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         coalesce(l_linestatus, 'ALL') AS linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem
  GROUP BY ROLLUP (l_returnflag, l_linestatus)
),
p AS (
  SELECT l_returnflag AS returnflag,
         CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS DOUBLE) AS qty_O,
         CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS DOUBLE) AS qty_F
  FROM lineitem GROUP BY l_returnflag
)
SELECT r.returnflag, r.linestatus, r.sum_qty, r.n, p.qty_O, p.qty_F
FROM r LEFT JOIN p USING (returnflag)
""",
    doc="Hierarchical ROLLUP totals (flag → flag×status → grand total) "
    "with the flag-level PIVOT columns (line status → wide qty_O/qty_F) "
    "joined on: one report attests both the multi-granularity rollup and "
    "the wide-pivot shape. The pivot side is 3 grouped rows — broadcast "
    "join, no extra shuffle beyond the two partial aggs. The rollup is "
    "CASCADED re-aggregation, not Spark's rollup(): rollup()/cube() "
    "physically Expand every input row ×3 before the shuffle (3× the "
    "corpus through the exchange at 100 TB), and on EMPTY input Spark "
    "emits no rows while ANSI/DuckDB ROLLUP still emits the () grouping "
    "set's one grand-total row. Cascading — one (flag,status) shuffle, "
    "then tiny exact-DECIMAL re-aggs, groupBy().agg() for the grand row "
    "(always 1 row on both engines) — fixes both.",
)
def q_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    fs = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("_qty"),
        F.count("*").alias("n"),
    )
    flag = (
        fs.groupBy("l_returnflag")
        .agg(F.sum("_qty").alias("_qty"), F.sum("n").alias("n"))
        .withColumn("l_linestatus", F.lit(None).cast("string"))
    )
    grand = (
        fs.groupBy()
        .agg(
            F.sum("_qty").alias("_qty"),
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        )
        .withColumn("l_returnflag", F.lit(None).cast("string"))
        .withColumn("l_linestatus", F.lit(None).cast("string"))
    )
    lvl_cols = ["l_returnflag", "l_linestatus", "_qty", "n"]
    rolled = (
        fs.select(*lvl_cols)
        .unionByName(flag.select(*lvl_cols))
        .unionByName(grand.select(*lvl_cols))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            F.col("_qty").cast("double").alias("sum_qty"),
            "n",
        )
    )
    pivoted = (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )
    return rolled.join(F.broadcast(pivoted), "returnflag", "left").select(
        "returnflag", "linestatus", "sum_qty", "n", "qty_O", "qty_F"
    )


# ------------------------------------------------------ event funnel
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel over the stream fixture: signup → later
    purchase conversion, computed as one conditional aggregate per user
    (no self-join). Oracle-verified through the merged ``revenue_kpis``."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("first_signup").isNotNull(), 1).otherwise(0)).alias(
            "signed_up"
        ),
        F.sum(
            F.when(
                F.col("first_signup").isNotNull()
                & (F.col("last_purchase") > F.col("first_signup")),
                1,
            ).otherwise(0)
        ).alias("converted"),
    )


# ----------------------------------------------------- set difference
@register(
    "churned_customers",
    """
SELECT o_custkey AS c_custkey
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
EXCEPT
SELECT o_custkey
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
""",
    doc="Set difference (churn): customers active in 1996 with no 1997 "
    "order — EXCEPT compiles to a left-anti join on the grouped keys.",
)
def q_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def active(year: str, nxt: str):
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{nxt}-01-01 00:00:00").cast("timestamp"))
        ).select(F.col("o_custkey").alias("c_custkey"))

    # subtract = EXCEPT DISTINCT (exceptAll would be bag semantics: a
    # repeat-1996 customer with one 1997 order would wrongly survive)
    return active("1996", "1997").distinct().subtract(active("1997", "1998"))


# ---------------- PeriodicSource re-index (S9) + running aggregate
@register(
    "periodic_reindex",
    """
SELECT concat('order-', o_custkey) AS stream_name,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) - 1 AS BIGINT) AS idx,
       o_orderkey, o_orderstatus, o_totalprice,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_revenue
FROM orders
""",
    doc="PeriodicSource semantics: full re-crawl of a non-checkpointable "
    "source with synthesized monotonic per-stream indexes "
    "(ref: src/Propulsion/Feed/PeriodicSource.fs:49-113; S9). The same "
    "window spec also carries the running cumulative revenue per stream "
    "(rowsBetween unbounded preceding — the account-balance shape): two "
    "window functions, one partition/order, one shuffle.",
)
def q_periodic_reindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.concat(F.lit("order-"), F.col("o_custkey")).alias("stream_name"),
        (F.row_number().over(w) - 1).cast("long").alias("idx"),
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_revenue"),
    )
