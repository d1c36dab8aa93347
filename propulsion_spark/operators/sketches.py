"""Deterministic sketch operators — mergeable approximate aggregates
whose results are bit-identical across engines, so they stay inside the
exact-match oracle gate (unlike HLL++, whose register layout is
implementation-defined: Spark's ``approx_count_distinct`` and DuckDB's
``approx_count_distinct`` give different answers by design).

``sketch_distinct_kmv``: K-minimum-values distinct-count sketch. Keep
the K smallest values of a uniform hash per group; if fewer than K
distinct hashes exist the count is exact, otherwise the kth-smallest
hash position estimates the distinct count as ``(K-1) · M / kth``
(Beyer et al., "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD'07). KMV sets are trivially mergeable
(union, re-take K smallest) — the property that makes the sketch useful
for 100 TB rollups where per-partition sketches combine without a
global distinct shuffle.

Determinism: the hash is the first 13 hex digits (52 bits) of
``md5(value)`` — 52 bits so every hash, and the ``(K-1)·M/kth``
division's operands, are exact in BOTH a BIGINT and an IEEE double;
the estimate is then bit-identical in Spark and DuckDB. Production note:
for raw speed Spark's native ``approx_count_distinct`` (HLL++, partial
aggregation, no window) is the right tool; this operator is the
oracle-checkable design point demonstrating the sketch shape itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.operators import register

KMV_K = 64
HASH_BITS = 52
HASH_SPACE = float(1 << HASH_BITS)  # M


@register(
    "sketch_distinct_kmv",
    f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(max(h) AS BIGINT) AS kth_hash,
       CASE WHEN count(*) < {KMV_K} THEN CAST(count(*) AS DOUBLE)
            ELSE ({KMV_K} - 1) * CAST({1 << HASH_BITS} AS DOUBLE) / max(h)
            END AS est_distinct,
       CAST(min(exact_distinct) AS BIGINT) AS exact_distinct
FROM (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY event_type) AS exact_distinct
  FROM (
    SELECT DISTINCT event_type,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT) AS h
    FROM events
  )
)
WHERE rn <= {KMV_K}
GROUP BY event_type
""",
    doc=f"K-minimum-values distinct-count sketch (K={KMV_K}) of users per "
    "event type, with the exact distinct count alongside for error "
    "inspection. 52-bit md5 hashes make the kept set AND the estimator "
    "arithmetic bit-identical across engines — an oracle-checkable "
    "approximate aggregate. Mergeable by construction (union, re-take "
    "K smallest).",
)
def q_sketch_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    wc = Window.partitionBy("event_type")
    kept = (
        hashed.withColumn("rn", F.row_number().over(w))
        .withColumn("exact_distinct", F.count("*").over(wc))
        .filter(F.col("rn") <= KMV_K)
    )
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.when(F.count("*") < KMV_K, F.count("*").cast("double"))
        .otherwise((KMV_K - 1) * F.lit(HASH_SPACE) / F.max("h"))
        .alias("est_distinct"),
        F.min("exact_distinct").alias("exact_distinct"),
    )
