"""BASELINE.md comparison: measure the engine against plain PySpark
doing the *same work* (the ≤2× bar), workload by workload.

Usage: python tools/baseline_compare.py [sf_dir] [--out RESULT.json]

Methodology: each side runs twice and reports the min (steady-state
plans; cold-start costs are not a plan property). Baselines do the
identical computation — same expressions, same dedup semantics — minus
the engine's durable bookkeeping (positions/outcome tables), which is
precisely the functionality being bought.

Two workloads are *flatness* gauges rather than engine-vs-raw races:
``redelivery_flat_10x`` and ``positions_merge_flat_10x`` put the
1×-state cost in the "baseline" slot and the 10×-state cost in the
"engine" slot, so their ratio measures whether per-batch cost grows
with accumulated durable state (the O(batch)-not-O(table) invariant);
flat ≈ 1.0, and the same ≤2× gate applies.

``--out`` additionally writes the JSON to a file — persist one per
round (BASELINE_RESULT_r{N}.json) so round-over-round ratio diffs don't
require a re-run.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def timed_pair(fa, fb, rounds: int = 3) -> tuple[float, float]:
    """Warm both sides untimed, then time them INTERLEAVED (a,b,a,b)
    and report each side's min.

    Two defenses, both necessary on this host:
    - the warm-up absorbs one-time costs that are not plan properties
      (parquet footers into the page cache, AQE final-plan compilation,
      Python worker spin-up) — whichever side ran first would otherwise
      pay them alone. Verified on span_coalesce: identical physical
      plans timed 0.61 vs 0.36 cold-first, 0.31 vs 0.30 warm.
    - interleaving bounds ambient-load drift to within one round;
      timing side A's runs back-to-back and then side B's hands any
      multi-second load spike entirely to one side (documented ±50-100%
      swings here), which min-of-N cannot undo.
    """
    fa()
    fb()
    ta: list[float] = []
    tb: list[float] = []
    for _ in range(rounds):
        t0 = time.time()
        fa()
        ta.append(time.time() - t0)
        t0 = time.time()
        fb()
        tb.append(time.time() - t0)
    return round(min(ta), 3), round(min(tb), 3)


def main() -> int:
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark, load_table
    from propulsion_spark.operators import load_all
    from propulsion_spark.operators.fixtures import stream_events
    from propulsion_spark.streaming import DeclarativeSink, StreamsSink
    from propulsion_spark.streaming.event_store import EventStoreTable

    registry = load_all()
    spark = get_spark("baseline-compare")
    spark.range(1000).count()
    tmp = tempfile.mkdtemp(prefix="baseline-")
    results: dict[str, dict] = {}

    def record(name: str, engine_s: float, baseline_s: float) -> None:
        results[name] = {
            "engine": engine_s,
            "baseline": baseline_s,
            "ratio": round(engine_s / max(baseline_s, 1e-9), 2),
        }

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # ---- analytic surface: engine query vs the identical hand-written SQL
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    # Build each side's DataFrame ONCE and time only execution: the
    # deliverable is the plan, and rebuilding per run times the Python
    # DataFrame-construction chatter (~30 py4j round-trips for the
    # engine's fluent builder vs 1 for spark.sql) instead of the plan.
    q = registry["pricing_summary"]
    eng_df, base_df = q.build(spark, sf_dir), spark.sql(q.oracle)
    record(
        "analytic_group_agg",
        *timed_pair(
            lambda: run_noop(eng_df),
            # the oracle SQL is the hand-written form of the same computation
            lambda: run_noop(base_df),
        ),
    )

    # ---- stateful coalesce query vs identical raw window SQL ------------
    envelope = stream_events(spark, sf_dir)
    envelope.createOrReplaceTempView("se")
    coalesce_eng = registry["span_coalesce"].build(spark, sf_dir)
    coalesce_base = spark.sql(
        """SELECT stream_name, min(idx) s, count(*) n FROM (
             SELECT stream_name, idx,
                    idx - row_number() OVER (PARTITION BY stream_name ORDER BY idx) g
             FROM se WHERE event_id % 7 != 3)
           GROUP BY stream_name, g"""
    )
    record(
        "dedup_coalesce",
        *timed_pair(
            lambda: run_noop(coalesce_eng),
            lambda: run_noop(coalesce_base),
        ),
    )

    # ---- fold ingest: DeclarativeSink (+ durable positions/outcomes)
    #      vs the identical raw groupBy-agg + parquet write ---------------
    def engine_fold():
        sink = DeclarativeSink.start(
            spark,
            {"n": F.count("*"), "total": F.sum(F.col("value").cast("decimal(38,6)")).cast("double")},
            tempfile.mkdtemp(dir=tmp),
        )
        sink.process_batch(envelope)

    def baseline_fold():
        # BASELINE.md's ingest workload produces outcome + checkpoints:
        # the raw pipeline must also persist both tables
        out = envelope.groupBy("stream_name").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"),
            (F.max("idx") + 1).alias("pos"),
        )
        out = out.cache()
        out.write.mode("overwrite").parquet(f"{tmp}/raw_outcomes")
        out.select("stream_name", "pos").write.mode("overwrite").parquet(
            f"{tmp}/raw_positions"
        )
        out.unpersist()

    record("ingest_fold", *timed_pair(engine_fold, baseline_fold))

    # ---- handler ingest: grouped-pandas sink vs the identical raw
    #      applyInPandas (the baseline for Python-handler work) -----------
    def handle(stream, events):
        return "ok", int(events["idx"].iloc[-1]) + 1

    sink = StreamsSink.start_concurrent(
        spark, handle, tempfile.mkdtemp(dir=tmp), fast_path=True
    )

    def raw_grouped():
        import pandas as pd

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("idx")
            return pd.DataFrame(
                [{"stream_name": pdf["stream_name"].iloc[0], "pos": int(pdf["idx"].iloc[-1]) + 1}]
            )

        envelope.groupBy("stream_name").applyInPandas(
            fn, "stream_name string, pos long"
        ).write.format("noop").mode("overwrite").save()

    record(
        "ingest_python_handler",
        *timed_pair(lambda: sink.process_batch(envelope), raw_grouped),
    )

    # ---- idempotent sink vs raw dedup-append (anti-join + append) -------
    store = EventStoreTable(spark, f"{tmp}/store")
    store.sync(envelope)  # preload: both paths face the full-conflict case
    existing = store.read().select("stream_name", "idx")

    record(
        "idempotent_sink_redelivery",
        *timed_pair(
            lambda: store.sync(envelope),
            lambda: envelope.join(existing, ["stream_name", "idx"], "left_anti")
            .write.mode("append")
            .parquet(f"{tmp}/raw_store"),
        ),
    )

    # ---- flatness: redelivery cost must not grow with store size --------
    # (VERDICT r1 #2: per-batch cost flat as the store grows). The same
    # redelivered batch is timed against a 1-batch store and a 10-batch
    # store; classification reads only the tails view + manifest, so the
    # ratio stays ~1 however much data has accumulated.
    from pyspark.sql import functions as F2  # noqa: F401 — scope clarity

    small = EventStoreTable(spark, f"{tmp}/flat_small")
    batch0 = envelope.limit(2000).cache()
    batch0.count()
    small.sync(batch0)
    big = EventStoreTable(spark, f"{tmp}/flat_big")
    big.sync(batch0)
    for i in range(9):  # grow: 9 more distinct stream sets
        grown = batch0.withColumn(
            "stream_name", F.concat(F.lit(f"g{i}-"), F.col("stream_name"))
        )
        big.sync(grown)
    cost_10x, cost_1x = timed_pair(
        lambda: big.sync(batch0), lambda: small.sync(batch0)
    )
    record("redelivery_flat_10x", cost_10x, cost_1x)

    # ---- flatness: positions merge is O(batch) however many streams
    #      the table has ever seen -----------------------------------------
    from propulsion_spark.streaming.positions import PositionsTable

    delta = envelope.limit(500).groupBy("stream_name").agg(
        (F.max("idx") + 1).alias("pos"),
        F.lit(0).cast("long").alias("revision"),
        F.lit(False).alias("malformed"),
    ).cache()
    delta.count()
    p1 = PositionsTable(spark, f"{tmp}/pos_small")
    p1.merge(delta)
    p2 = PositionsTable(spark, f"{tmp}/pos_big")
    for i in range(10):
        p2.merge(
            delta.withColumn(
                "stream_name", F.concat(F.lit(f"g{i}-"), F.col("stream_name"))
            )
        )
    merge_10x, merge_1x = timed_pair(
        lambda: p2.merge(delta), lambda: p1.merge(delta)
    )
    record("positions_merge_flat_10x", merge_10x, merge_1x)
    batch0.unpersist(), delta.unpersist()

    # ---- distributed outcome path: a batch touching 100k DISTINCT
    #      streams must never land row-per-stream on the driver
    #      (VERDICT r2 #1). Engine = DeclarativeSink over 100k streams
    #      with every DataFrame.collect spied; the gauge asserts the
    #      largest driver collect stays capped (control-plane only)
    #      while the outcome/progress path runs distributed. Baseline =
    #      the identical raw groupBy + outcome/position parquet writes.
    from pyspark.sql import DataFrame as _DF

    n_wide = 100_000
    wide = spark.range(n_wide).select(
        F.concat(F.lit("w-"), F.col("id")).alias("stream_name"),
        F.lit(0).cast("long").alias("idx"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    collect_sizes: list[int] = []
    orig_collect = _DF.collect

    def spying_collect(self):
        rows = orig_collect(self)
        collect_sizes.append(len(rows))
        return rows

    def baseline_wide():
        out = wide.groupBy("stream_name").agg(
            F.sum("value").alias("total"), (F.max("idx") + 1).alias("pos")
        )
        out = out.cache()
        out.write.mode("overwrite").parquet(f"{tmp}/raw_wide_outcomes")
        out.select("stream_name", "pos").write.mode("overwrite").parquet(
            f"{tmp}/raw_wide_positions"
        )
        out.unpersist()

    # the collect spy stays armed across both interleaved sides; only
    # the engine path performs collects, so max_collect measures it
    _DF.collect = spying_collect
    try:
        wsink = DeclarativeSink.start(
            spark, {"total": F.sum("value")}, tempfile.mkdtemp(dir=tmp)
        )
        engine_wide, base_wide = timed_pair(
            lambda: wsink.process_batch(wide), baseline_wide
        )
    finally:
        _DF.collect = orig_collect
    max_collect = max(collect_sizes, default=0)

    record("sink_100k_streams_distributed", engine_wide, base_wide)
    results["sink_100k_streams_distributed"]["max_collect_rows"] = max_collect
    from propulsion_spark.streaming.event_store import DRIVER_REPORT_CAP

    collect_cap_ok = max_collect <= DRIVER_REPORT_CAP + 1

    shutil.rmtree(tmp, ignore_errors=True)
    worst = max(r["ratio"] for r in results.values())
    payload = {
        "workloads": results,
        "worst_ratio": worst,
        "target": 2.0,
        "sf_dir": sf_dir,
        "collect_cap_ok": collect_cap_ok,
    }
    print(json.dumps(payload))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
    spark.stop()
    return 0 if (worst <= 2.0 and collect_cap_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
