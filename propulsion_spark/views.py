"""SQL surface: register the engine's tables and envelope as temp views
so users can work in pure ``spark.sql`` (Catalyst produces identical
plans either way — SURVEY §4's "declare, don't hand-schedule").

    import propulsion_spark.views as V
    V.register(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT stream_name, count(*) FROM stream_events GROUP BY 1")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from propulsion_spark import TABLES, load_table
from propulsion_spark.envelope import derive_stream_events


def register(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Create temp views for every fixture table plus the derived
    ``stream_events`` envelope; returns the view names."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    derive_stream_events(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        f"{prefix}stream_events"
    )
    names.append(f"{prefix}stream_events")
    return names
