"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All operators live in ``propulsion_spark.operators`` (registry pattern:
one Spark DataFrame builder + one DuckDB oracle per operator).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from propulsion_spark.operators import load_all

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the per-stream fold (SURVEY.md §7 step 2
    slice — envelope derivation → groupBy(stream) → outcome row)."""
    registry = load_all()
    return registry["stream_fold"].build(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.7."""
    return {name: q.build for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query; operators
    whose semantics aren't SQL-expressible are omitted (rows-only check).
    """
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
