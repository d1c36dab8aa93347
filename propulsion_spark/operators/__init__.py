"""Operator registry: every oracle-checkable query the engine declares.

Each entry pairs a Spark DataFrame builder with the equivalent ANSI SQL
for the DuckDB oracle (None → non-SQL-expressible, rows-only check).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class EngineQuery:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


REGISTRY: dict[str, EngineQuery] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        REGISTRY[name] = EngineQuery(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, EngineQuery]:
    """Import every operator module so REGISTRY is fully populated."""
    from propulsion_spark.operators import (  # noqa: F401
        analytics,
        dedup,
        multimodal,
        queries,
        similarity,
        sketches,
        textops,
        timeseries,
        windows,
    )

    return REGISTRY
