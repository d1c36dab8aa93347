"""Empty-input parity gate: every declared query runs against fully
EMPTY tables (exact production schemas, zero rows) on both engines and
still matches its oracle.

Why this is worth a suite slot: at 100 TB an empty *slice* is routine
(a partition with no late data, a tenant with no docs, a fresh store),
and "aggregate over nothing" is where engines disagree by design —
Spark's rollup()/cube() emit NO rows on empty input while ANSI/DuckDB
ROLLUP still emits the () grouping set's grand-total row (the
status_rollup divergence this gate caught, fixed by cascaded
re-aggregation), first()/head-based codebook reads IndexError, and
ANSI division traps fire. The gate pins all 50 declared queries at
once so the class stays closed.

Schemas are copied from the driver's own parquet via pyarrow
(`schema.empty_table()`), preserving TIMESTAMP(NANOS) on events —
writing empty files through Spark would silently downgrade to micros
and bypass the load_table nanos path.
"""

from __future__ import annotations

import glob
import os

import pytest


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("empty_sf")
    for f in glob.glob(f"{src}/*.parquet"):
        sch = pq.read_schema(f)
        pq.write_table(sch.empty_table(), str(dst / os.path.basename(f)))
    return str(dst)


def test_all_queries_match_oracle_on_empty_tables(spark, empty_sf):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import __spark_entry__ as e
    from verify_oracle import compare, duck_connect

    con = duck_connect(empty_sf)
    qs, oracles = e.queries(), e.oracle_sql()
    failures = {}
    for name, build in qs.items():
        try:
            sdf = build(spark, empty_sf).toPandas()
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures[name] = [f"spark error: {ex}"[:200]]
            continue
        if name not in oracles:
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            failures[name] = [f"duckdb error: {ex}"[:200]]
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures[name] = problems
    assert not failures, failures
