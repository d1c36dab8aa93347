"""Deterministic fixture derivations shared by the engine queries and
their DuckDB oracles (FIXTURES.md §1).

The reference's scheduling semantics are exercised against synthesized
stream imperfections: gapped streams (dropped mid-stream indexes),
synthetic unfolds, batch/epoch chunking, and a write-position
(checkpoint) table. All derivations are pure functions of the driver's
``events`` fixture so Spark and DuckDB compute identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propulsion_spark.envelope import STREAM_EVENTS_SQL, derive_stream_events

# ---- knobs (mirrored in the oracle SQL below) ----
GAP_MOD = 7  # drop event_id % 7 == 3 → mid-stream gaps
GAP_DROP = 3
UNFOLD_MOD = 10  # event_id % 10 == 0 → synthetic unfold rows
BATCH_SIZE = 250  # epoch = event_id div 250 (ingestion batch analog)
TRANCHES = 4  # tranche = user_id % 4


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propulsion_spark import load_table

    return derive_stream_events(load_table(spark, sf_dir, "events"))


def gapped(se: DataFrame) -> DataFrame:
    """Streams with missing mid-stream indexes (tests Q-GAP/Q-COALESCE;
    ref semantics: src/Propulsion/Streams.fs:370-373)."""
    return se.filter(F.col("event_id") % GAP_MOD != GAP_DROP)


def with_unfold_flag(se: DataFrame) -> DataFrame:
    """Mark a deterministic subset as unfolds (state-snapshot rows)."""
    return se.withColumn("is_unfold", F.col("event_id") % UNFOLD_MOD == 0)


def with_batch(se: DataFrame) -> DataFrame:
    """Ingestion-batch chunking: epoch = event_id div BATCH_SIZE
    (ref: src/Propulsion/Ingestion.fs:44-45)."""
    return se.withColumn("batch_id", F.expr(f"event_id div {BATCH_SIZE}"))


def with_tranche(se: DataFrame) -> DataFrame:
    return se.withColumn("tranche", (F.col("user_id") % TRANCHES).cast("string"))


def write_positions(se: DataFrame) -> DataFrame:
    """Synthetic consumer-group positions: every third user's stream has
    been handled up to half its length (tests Q-DEDUP)."""
    return (
        se.filter(F.col("user_id") % 3 == 0)
        .groupBy("stream_name")
        .agg(F.expr("(max(idx) + 1) div 2").alias("pos"))
    )


# ---- DuckDB oracle prelude: identical derivations in SQL ----
SE_CTE = f"stream_events AS ({STREAM_EVENTS_SQL})"

GAPPED_CTE = (
    f"gapped AS (SELECT * FROM stream_events WHERE event_id % {GAP_MOD} != {GAP_DROP})"
)

WP_CTE = """wp AS (
  SELECT stream_name, (max(idx) + 1) // 2 AS pos
  FROM stream_events WHERE user_id % 3 = 0 GROUP BY stream_name
)"""


def prelude(*extra: str) -> str:
    return "WITH " + ",\n".join([SE_CTE, *extra])
