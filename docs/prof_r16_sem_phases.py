"""r16 profiling: per-ACTION job counts and wall time inside one
SemDedupStream micro-batch — replica of the CURRENT (r16) process_batch
shape, so each driver-scheduled action's cost is attributable.
(Measurement only; the pipeline stays the source of truth. Job counts
under AQE include concurrent query-stage materializations, so wall
seconds per action are the primary signal, job counts secondary.)

Usage: python docs/prof_r16_sem_phases.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def jobs_in(sc, group, fn):
    sc.setJobGroup(group, group)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    sc.setJobGroup(None, None)
    n = len(sc.statusTracker().getJobIdsForGroup(group))
    return n, dt, out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark, load_table
    from propulsion_spark.operators.similarity import (
        _spark_dot,
        assign_cells_inline,
        centroids_frame,
        semdedup_verdicts_joined,
    )
    from propulsion_spark.pipelines import SemDedupStream

    spark = get_spark("prof-r16-sem")
    sc = spark.sparkContext
    spark.range(1000).count()
    report = {}

    emb = load_table(spark, sf_dir, "embeddings")
    half = emb.selectExpr("vec_id AS doc_id", "embedding")
    tmp = tempfile.mkdtemp(prefix="prof-r16-sem-")
    try:
        sds = SemDedupStream(spark, f"{tmp}/semreg", centroids_frame(emb))
        n, dt, _ = jobs_in(
            sc, "b0-real",
            lambda: sds.process_batch(half.filter("doc_id % 2 = 0"), 0).count(),
        )
        report["b0_real"] = {"jobs": n, "s": round(dt, 2)}

        # batch 1 step-by-step (cross-batch shape, registry nonempty)
        df = half.filter("doc_id % 2 = 1")
        _embeddable = F.col("embedding").isNotNull() & (F.col("nrm") > 0)
        base = (
            assign_cells_inline(
                df.select(
                    F.col("doc_id").alias("vec_id"), F.col("embedding")
                ).withColumn(
                    "nrm", F.sqrt(_spark_dot("embedding", "embedding"))
                ),
                cb_row=sds._cb_row,
            )
            .persist()
        )
        framed = base.filter(_embeddable)
        steps = {}

        n, dt, dropped = jobs_in(
            sc, "s1-dropped-lcp",
            lambda: semdedup_verdicts_joined(framed, threshold=sds.threshold)
            .select(F.col("b_id").alias("vec_id"))
            .localCheckpoint(eager=True),
        )
        steps["dropped_lcp"] = {"jobs": n, "s": round(dt, 2)}

        canon = framed.join(dropped, "vec_id", "left_anti")
        n, dt, batch_buckets = jobs_in(
            sc, "s2-buckets",
            lambda: [
                r[0]
                for r in framed.select(
                    (F.col("cell") % sds.registry.n_buckets(refresh=True))
                    .cast("int")
                    .alias("b")
                )
                .distinct()
                .collect()
            ],
        )
        steps["buckets_collect"] = {"jobs": n, "s": round(dt, 2)}

        table = sds.registry.read_buckets(batch_buckets)
        keepers = table.select(
            "cell",
            F.col("keeper"),
            F.col("embedding").alias("k_emb"),
            F.col("nrm").alias("k_nrm"),
        )
        cosine = _spark_dot("embedding", "k_emb") / (
            F.col("nrm") * F.col("k_nrm")
        )
        n, dt, hit_pairs = jobs_in(
            sc, "s3-hits-lcp",
            lambda: canon.join(keepers, "cell")
            .filter(
                (F.col("keeper") != F.col("vec_id"))
                & (cosine >= sds.threshold)
            )
            .groupBy("vec_id")
            .agg(F.min("keeper").alias("_k_min"))
            .localCheckpoint(eager=True),
        )
        steps["hits_lcp"] = {"jobs": n, "s": round(dt, 2)}

        hits = hit_pairs.select("vec_id")
        survivors = canon.join(hits, "vec_id", "left_anti")
        novel = survivors.select(
            F.col("cell").cast("long").alias("cell"),
            F.col("vec_id").alias("keeper"),
            "embedding",
            "nrm",
        )
        n, dt, _ = jobs_in(
            sc, "s4-register", lambda: sds.registry.register(novel)
        )
        steps["register"] = {"jobs": n, "s": round(dt, 2)}

        keep_ids = (
            base.select("vec_id")
            .join(dropped, "vec_id", "left_anti")
            .join(hits, "vec_id", "left_anti")
        )
        out = df.join(keep_ids.withColumnRenamed("vec_id", "doc_id"), "doc_id")

        n, dt, _ = jobs_in(
            sc, "s5-stats-fused",
            lambda: (
                base.agg(
                    F.count("*").alias("seen"),
                    F.count_if(_embeddable).alias("emb"),
                )
                .crossJoin(dropped.agg(F.count("*").alias("ndrop")))
                .crossJoin(
                    hit_pairs.agg(
                        F.count("*").alias("nhit"),
                        F.count_if(
                            F.col("vec_id") < F.col("_k_min")
                        ).alias("inv"),
                    )
                )
            ).collect(),
        )
        steps["stats_fused"] = {"jobs": n, "s": round(dt, 2)}

        n, dt, _ = jobs_in(sc, "s6-out-count", lambda: out.count())
        steps["out_count"] = {"jobs": n, "s": round(dt, 2)}

        base.unpersist()
        report["b1_steps"] = steps
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
