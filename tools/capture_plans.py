"""Capture ``.explain("formatted")`` output for named registry queries
into ``plans/<tag>/<query>_<suffix>.txt`` — the r15 optimization round's
evidence files.

Runs under plan_audit's ``_audit_mode`` so ``finalize()`` does not
truncate the plan to a checkpoint scan (the r10 blind spot).

Usage:
  python tools/capture_plans.py <tag> <suffix> <query> [<query> ...]
  # e.g. python tools/capture_plans.py r15 before dedup_clusters
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from plan_audit import _audit_mode  # noqa: E402  (same tools/ dir)


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from propulsion_spark import get_spark
    from propulsion_spark.operators import load_all

    registry = load_all()
    spark = get_spark("capture-plans")
    out_dir = f"/root/repo/plans/{tag}"
    os.makedirs(out_dir, exist_ok=True)
    with _audit_mode():
        for name in names:
            df = registry[name].build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"{out_dir}/{name}_{suffix}.txt"
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path} ({len(plan)} bytes)", flush=True)
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
