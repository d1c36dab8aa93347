"""BASELINE.md comparison: measure the engine against plain PySpark
doing the *same work* (the ≤2× bar), workload by workload.

Usage: python tools/baseline_compare.py [sf_dir]

Methodology: each side runs twice and reports the min (steady-state
plans; cold-start costs are not a plan property). Baselines do the
identical computation — same expressions, same dedup semantics — minus
the engine's durable bookkeeping (positions/outcome tables), which is
precisely the functionality being bought.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def timed2(fn) -> float:
    """Min of two runs: steady-state cost."""
    runs = []
    for _ in range(2):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(min(runs), 3)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
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
    q = registry["pricing_summary"]
    record(
        "analytic_group_agg",
        timed2(lambda: run_noop(q.build(spark, sf_dir))),
        # the oracle SQL is the hand-written form of the same computation
        timed2(lambda: run_noop(spark.sql(q.oracle))),
    )

    # ---- stateful coalesce query vs identical raw window SQL ------------
    envelope = stream_events(spark, sf_dir)
    envelope.createOrReplaceTempView("se")
    record(
        "dedup_coalesce",
        timed2(lambda: run_noop(registry["span_coalesce"].build(spark, sf_dir))),
        timed2(
            lambda: run_noop(
                spark.sql(
                    """SELECT stream_name, min(idx) s, count(*) n FROM (
                         SELECT stream_name, idx,
                                idx - row_number() OVER (PARTITION BY stream_name ORDER BY idx) g
                         FROM se WHERE event_id % 7 != 3)
                       GROUP BY stream_name, g"""
                )
            )
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

    record("ingest_fold", timed2(engine_fold), timed2(baseline_fold))

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
        timed2(lambda: sink.process_batch(envelope)),
        timed2(raw_grouped),
    )

    # ---- idempotent sink vs raw dedup-append (anti-join + append) -------
    store = EventStoreTable(spark, f"{tmp}/store")
    store.sync(envelope)  # preload: both paths face the full-conflict case
    existing = store.read().select("stream_name", "idx")

    record(
        "idempotent_sink_redelivery",
        timed2(lambda: store.sync(envelope)),
        timed2(
            lambda: envelope.join(existing, ["stream_name", "idx"], "left_anti")
            .write.mode("append")
            .parquet(f"{tmp}/raw_store")
        ),
    )

    shutil.rmtree(tmp, ignore_errors=True)
    worst = max(r["ratio"] for r in results.values())
    print(json.dumps({"workloads": results, "worst_ratio": worst, "target": 2.0}))
    spark.stop()
    return 0 if worst <= 2.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
