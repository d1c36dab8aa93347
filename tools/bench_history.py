#!/usr/bin/env python3
"""Re-parse every BENCH_r*.json into one per-query history CSV.

The driver records each round's bench as ``{n, rc, cpus, sf, tail,
parsed}``; some rounds' ``parsed`` is null because the JSON line was
interleaved with a late Spark WARN (fixed in the r7 bench emission),
leaving only a truncated fragment in ``tail``. This tool recovers the
per-query timings from either field so round-over-round diffs never
require hand-scraping again.

Usage: python tools/bench_history.py [--out BENCH_HISTORY.csv]
Writes the CSV and prints a round-over-round summary of the biggest
movers (last two recoverable rounds).
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import re

# keys of the bench JSON envelope that are not query timings
_NON_QUERY = {"value", "sf"}
_PAIR = re.compile(r'"([a-z0-9_]+)": ([0-9]+(?:\.[0-9]+)?)')


def _recover(doc: dict) -> "dict[str, float]":
    """Query→seconds for one round: ``parsed`` when the driver got it,
    else scraped from the (possibly truncated) JSON fragment in
    ``tail``."""
    parsed = doc.get("parsed")
    if parsed and parsed.get("queries"):
        out = dict(parsed["queries"])
        out["TOTAL"] = parsed.get("value")
        if parsed.get("calibration"):
            out["_host_calib"] = parsed["calibration"]
        return out
    tail = doc.get("tail", "")
    # keep only the metric line's fragment: cut at the closing
    # `}, "sf": ...}` if present, drop anything after a log timestamp
    cut = tail.find('"sf":')
    frag = tail[:cut] if cut >= 0 else tail
    out = {}
    for k, v in _PAIR.findall(frag):
        if k in _NON_QUERY:
            if k == "value":
                out["TOTAL"] = float(v)
            continue
        out[k] = float(v)
    if "calibration" in out:
        out["_host_calib"] = out.pop("calibration")
    # backfill (r13): rounds whose tail truncated before the trailing
    # `"value":` still carry every per-query timing — the TOTAL is
    # their sum by construction, so recover it instead of leaving the
    # r6/r11-style holes the r12 verdict flagged. ONLY when the
    # queries dict provably closed (the `"sf":` cut marker was found):
    # a tail cut mid-list would otherwise present a partial sum as the
    # round's total — a fake regression with no marker (r13 review)
    if "TOTAL" not in out and out and cut >= 0:
        out["TOTAL"] = round(
            sum(v for k, v in out.items() if k != "_host_calib"), 3
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_HISTORY.csv")
    ap.add_argument(
        "--dir", default=os.path.dirname(os.path.dirname(__file__)) or "."
    )
    args = ap.parse_args()

    rounds = {}
    for path in sorted(glob.glob(os.path.join(args.dir, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            doc = json.load(f)
        rec = _recover(doc)
        if rec:
            rounds[int(m.group(1))] = rec

    names = sorted(
        {q for rec in rounds.values() for q in rec}
        - {"TOTAL", "_host_calib"}
    )
    cols = sorted(rounds)
    # normalized view (r13): TOTAL divided by the round's host-speed
    # calibration row — engine work per unit of host speed, so ambient
    # drift (the +21% r10→r12 trend every A/B exonerated the code for)
    # divides out. Blank for rounds before the calib row existed.
    for c in cols:
        rec = rounds[c]
        calib, total = rec.get("_host_calib"), rec.get("TOTAL")
        if calib and total:
            rec["TOTAL_PER_CALIB"] = round(total / calib, 3)
    with open(os.path.join(args.dir, args.out), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query"] + [f"r{c}" for c in cols])
        for q in names + ["_host_calib", "TOTAL", "TOTAL_PER_CALIB"]:
            w.writerow([q] + [rounds[c].get(q, "") for c in cols])
    print(f"wrote {args.out}: {len(names)} queries x {len(cols)} rounds")

    if len(cols) >= 2:
        a, b = cols[-2], cols[-1]
        movers = []
        for q in names:
            va, vb = rounds[a].get(q), rounds[b].get(q)
            if va and vb and va > 0:
                movers.append((vb / va, q, va, vb))
        movers.sort()
        print(f"\nr{a} -> r{b} biggest movers (ratio, query, before, after):")
        for r, q, va, vb in movers[:5] + movers[-5:]:
            print(f"  {r:5.2f}x  {q:32s} {va:7.3f} -> {vb:7.3f}")


if __name__ == "__main__":
    main()
