"""Interleaved same-host A/B: HEAD vs the round-10 tree for the two
queries whose r11 driver-bench numbers drifted with no plan change
(VERDICT r11 "Next round" #3): dedup_clusters 5.20→6.26 s (+17%) and
pipeline_ann_build 1.98→2.43 s (+23%).

Methodology (the ab_store_sync discipline): the r10 code
(``AB_R10_COMMIT``, default 69ce83c = the round-10 closing commit) is
checked out into a git worktree; each round runs BOTH arms as fresh
processes back-to-back in alternating order (AB, BA, AB, …); each
process times each query as min-of-2 with the bench's cache-clearing
rule. Min-of-N-rounds per arm is the comparison — the only methodology
that beats this host's ambient drift.

Usage:
    python tools/ab_r12_drift.py [sf_dir] [rounds]       # orchestrate
    python tools/ab_r12_drift.py --probe <sf_dir>        # one arm (internal)

Result on record (2026-08-16, sf0.1, 6 interleaved rounds, min-of-6):
dedup_clusters head/r10 = 0.994 (6.528 vs 6.567 s), pipeline_ann_build
head/r10 = 1.008 (2.206 vs 2.189 s). The r11 driver deltas (+17% /
+23%) are ambient host drift, not the r11 code — consistent with this
host's dedup_clusters floor (~6.5 s) already sitting at the r11
driver's 6.26 s, well above the r10 driver's 5.20 s.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

R10_COMMIT = os.environ.get("AB_R10_COMMIT", "69ce83c")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(sf_dir: str) -> None:
    """One arm: run in a tree's cwd/PYTHONPATH; prints one JSON line."""
    from propulsion_spark import get_spark, load_table
    from propulsion_spark.operators import load_all
    from propulsion_spark.pipelines.ann_index import AnnIndex
    from pyspark.sql import functions as F  # noqa: F401

    spark = get_spark("ab-r12-drift")
    spark.range(1_000).count()  # JVM warmup
    for t in ("embeddings", "documents"):
        load_table(spark, sf_dir, t).schema
    registry = load_all()
    out: dict[str, float] = {}

    runs = []
    for _ in range(2):
        t0 = time.time()
        registry["dedup_clusters"].build(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        runs.append(time.time() - t0)
        spark.catalog.clearCache()
    out["dedup_clusters"] = round(min(runs), 3)

    tmp = tempfile.mkdtemp(prefix="ab-r12-")
    try:
        runs = []
        for i in range(2):
            t0 = time.time()
            AnnIndex.build(spark, sf_dir, f"{tmp}/annidx{i}")
            runs.append(time.time() - t0)
        out["pipeline_ann_build"] = round(min(runs), 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print("PROBE " + json.dumps(out))


def run_probe(tree: str, sf_dir: str) -> dict:
    env = dict(os.environ, PYTHONPATH=tree)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe", sf_dir],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE "):
            return json.loads(line[len("PROBE "):])
    raise RuntimeError(
        f"probe in {tree} produced no result: {proc.stderr[-2000:]}"
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        probe(sys.argv[2])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    wt = tempfile.mkdtemp(prefix="ab-r10-wt-")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, R10_COMMIT],
        check=True,
        capture_output=True,
    )
    best: dict[str, dict[str, float]] = {"head": {}, "r10": {}}
    try:
        for i in range(rounds):
            order = (
                [("head", REPO), ("r10", wt)]
                if i % 2 == 0
                else [("r10", wt), ("head", REPO)]
            )
            for arm, tree in order:
                res = run_probe(tree, sf_dir)
                for q, v in res.items():
                    cur = best[arm].get(q)
                    best[arm][q] = v if cur is None else min(cur, v)
                print(f"round {i} {arm}: {res}", flush=True)
        report = {
            q: {
                "head": best["head"][q],
                "r10": best["r10"][q],
                "ratio_head_over_r10": round(
                    best["head"][q] / best["r10"][q], 3
                ),
            }
            for q in best["head"]
        }
        print(json.dumps({"sf_dir": sf_dir, "rounds": rounds, **report}))
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            capture_output=True,
        )


if __name__ == "__main__":
    main()
