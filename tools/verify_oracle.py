"""Local replica of the driver's correctness gate: run every declared
query on Spark AND its DuckDB oracle, compare row count, column names,
and exact values (order-insensitive).

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        try:
            import numpy as np

            if isinstance(df[c].dtype, pd.DatetimeTZDtype):
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            if df[c].dtype.kind == "f":
                df[c] = df[c].astype("float64")
            if df[c].dtype.kind in "iu":
                df[c] = df[c].astype("int64")
            if df[c].dtype.kind == "M":
                df[c] = df[c].astype("datetime64[us]")
        except Exception:
            pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(ddf):
        problems.append(f"row count spark={len(sdf)} duck={len(ddf)}")
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems
    a, b = canon(sdf), canon(ddf)
    if len(a) == len(b):
        for c in a.columns:
            if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                import numpy as np

                av, bv = a[c].to_numpy(dtype="float64"), b[c].to_numpy(dtype="float64")
                exact = (av == bv) | (pd.isna(av) & pd.isna(bv))
                if not exact.all():
                    close = np.isclose(av, bv, rtol=1e-12, equal_nan=True)
                    n_bad = int((~exact).sum())
                    if close.all():
                        problems.append(f"col {c}: {n_bad} float values differ (within 1e-12 — hash would FAIL)")
                    else:
                        i = int((~close).argmax())
                        problems.append(
                            f"col {c}: {n_bad} values differ, e.g. {av[i]!r} vs {bv[i]!r}"
                        )
            else:
                eq = (a[c] == b[c]) | (a[c].isna() & b[c].isna())
                if not eq.all():
                    i = int((~eq).to_numpy().argmax())
                    problems.append(
                        f"col {c}: {int((~eq).sum())} values differ, e.g. {a[c].iloc[i]!r} vs {b[c].iloc[i]!r}"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from propulsion_spark import get_spark

    spark = get_spark("verify-oracle")
    con = duck_connect(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, build in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = build(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"     - {p}")
            failed.append(name)
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    ran = [n for n in qs if not only or n in only]
    print(f"\n{len(ran) - len(failed)}/{len(ran)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
