"""Interleaved A/B of EventStoreTable.sync: current HEAD vs the round-2
implementation, same session, alternating order, min-of-N per arm.

Usage: python tools/ab_store_sync.py [sf_dir] [rounds]

The round-2 module is extracted with ``git show <r2>:...`` into a temp
file and imported under a private name, so both implementations run in
one JVM back-to-back — the only methodology that beats this host's
±50-100% ambient drift (VERDICT r4, "Next round" #2).

Measures, per arm: fresh-store first sync (pipeline_store_sync shape)
and full-duplicate resync (pipeline_store_resync / redelivery shape).

Result on record (2026-08-14, sf0.1, 5 interleaved rounds, min-of-5):
sync new/old = 1.037, resync new/old = 1.043 — both within the ≤1.1
bar. The r4 BENCH deltas (store_sync 2.82→6.22 s, redelivery 1.03→
2.31 s vs r2) were ambient host drift, not the probe/persist/spool
hardening; the ≤cap small path is exonerated.

Round-6 result (AB_OLD_COMMIT=8ac19ae — the round-4 code — sf0.1,
4 interleaved rounds, two independent sessions): resync (the
redelivery shape) new/old = 0.898 and 0.967; sync = 1.07 both times.
The widening idempotent_sink_redelivery baseline ratio across r4→r5
(1.41 → 1.71) is NOT an engine regression vs the r4 code — it is
baseline-arm/ambient drift, and the ≤2× baseline target still holds
with margin.
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import subprocess
import sys
import tempfile
import time

#: comparison arm: any past commit's event_store.py ($AB_OLD_COMMIT;
#: default = the round-2 implementation this tool was built against)
R2_COMMIT = os.environ.get("AB_OLD_COMMIT", "cd3ade6")


def load_r2_module(repo_root: str):
    src = subprocess.check_output(
        ["git", "-C", repo_root, "show",
         f"{R2_COMMIT}:propulsion_spark/streaming/event_store.py"],
        text=True,
    )
    path = os.path.join(tempfile.mkdtemp(prefix="ab-r2-"), "event_store_r2.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("event_store_r2", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_arm(spark, cls, envelope, tmp):
    store = cls(spark, os.path.join(tmp, "store"))
    t0 = time.time()
    store.sync(envelope)
    sync_s = time.time() - t0
    t0 = time.time()
    store.sync(envelope)
    resync_s = time.time() - t0
    shutil.rmtree(tmp, ignore_errors=True)
    return sync_s, resync_s


def main():
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from propulsion_spark import get_spark
    from propulsion_spark.operators.fixtures import stream_events
    from propulsion_spark.streaming.event_store import EventStoreTable as NewTable

    r2 = load_r2_module(repo_root)
    OldTable = r2.EventStoreTable

    spark = get_spark()
    envelope = stream_events(spark, sf_dir).cache()
    envelope.count()  # warm the input so neither arm pays the scan

    results = {"new": {"sync": [], "resync": []}, "old": {"sync": [], "resync": []}}
    for i in range(rounds):
        order = [("new", NewTable), ("old", OldTable)]
        if i % 2:
            order.reverse()
        for name, cls in order:
            s, r = run_arm(spark, cls, envelope, tempfile.mkdtemp(prefix="ab-"))
            results[name]["sync"].append(round(s, 3))
            results[name]["resync"].append(round(r, 3))
            print(f"round {i} {name}: sync={s:.3f}s resync={r:.3f}s", flush=True)

    import json

    summary = {}
    for metric in ("sync", "resync"):
        n = min(results["new"][metric])
        o = min(results["old"][metric])
        summary[metric] = {
            "new_min": n, "old_min": o,
            "ratio_new_over_old": round(n / o, 3),
            "new_all": results["new"][metric], "old_all": results["old"][metric],
        }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
