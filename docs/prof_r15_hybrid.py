"""r15 profiling: phase decomposition + Spark job counts for the two
serving-path bench rows never decomposed this round —
``pipeline_lexical_build`` and ``pipeline_hybrid_search_many`` (and the
single-query ``pipeline_hybrid_search`` for contrast).

Job counts are the deterministic fact on this noisy host; wall times
are min-of-2 within one session. Usage:
python docs/prof_r15_hybrid.py [sf_dir]
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
    return n, round(dt, 3), out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark, load_table
    from propulsion_spark.pipelines.ann_index import AnnIndex
    from propulsion_spark.pipelines.hybrid import hybrid_search_many
    from propulsion_spark.pipelines.lexical_index import LexicalIndex

    spark = get_spark("prof-r15-hybrid")
    sc = spark.sparkContext
    spark.range(1000).count()
    report = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # --- lexical build, phase by phase (2 runs) -------------------
    docs = load_table(spark, sf_dir, "documents")
    for run in range(2):
        tmp = tempfile.mkdtemp(prefix="prof-hyb-lex-")
        try:
            r = {}
            r["is_empty"] = jobs_in(
                sc, f"lex-empty-{run}", lambda: docs.isEmpty()
            )[:2]
            n, dt, idx = jobs_in(
                sc,
                f"lex-build-{run}",
                lambda: LexicalIndex.build(spark, sf_dir, f"{tmp}/lex"),
            )
            r["build_total"] = (n, dt)
            report[f"lex_build_run{run}"] = r
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # --- hybrid serving: bench-exact setup ------------------------
    tmp = tempfile.mkdtemp(prefix="prof-hyb-srv-")
    try:
        idx = AnnIndex.build(spark, sf_dir, f"{tmp}/searchidx")
        hlex = LexicalIndex.build(spark, sf_dir, f"{tmp}/searchlex")
        emb = load_table(spark, sf_dir, "embeddings")
        qspecs = [
            (i, ["hash", "tree"] if i % 2 == 0 else ["hash", "data"])
            for i in range(8)
        ]
        qemb = {
            r["vec_id"]: r["embedding"]
            for r in emb.filter("vec_id < 8").collect()
        }
        qdf = spark.createDataFrame(
            [(qid, terms, qemb[qid]) for qid, terms in qspecs],
            "query_id long, terms array<string>, embedding array<double>",
        )
        # warm (the bench warms too)
        noop(hybrid_search_many(hlex, idx, qdf, k=10, n_probes=2))
        for run in range(2):
            r = {}
            # arm 1: lexical search_many — plan construction (driver
            # collects) vs execution
            n, dt, lr = jobs_in(
                sc,
                f"lexmany-plan-{run}",
                lambda: hlex.search_many(
                    qdf.select("query_id", "terms"), k=40
                ),
            )
            r["lex_plan"] = (n, dt)
            r["lex_exec"] = jobs_in(
                sc, f"lexmany-exec-{run}", lambda: noop(lr)
            )[:2]
            # arm 2: ann search — plan (probe collect) vs execution
            q10 = qdf.select("query_id", "embedding")
            n, dt, ar = jobs_in(
                sc,
                f"ann-plan-{run}",
                lambda: idx.search(q10, top_k=40, n_probes=2),
            )
            r["ann_plan"] = (n, dt)
            r["ann_exec"] = jobs_in(
                sc, f"ann-exec-{run}", lambda: noop(ar)
            )[:2]
            # full fused path, end to end (bench row shape)
            r["fused_total"] = jobs_in(
                sc,
                f"fused-{run}",
                lambda: noop(
                    hybrid_search_many(hlex, idx, qdf, k=10, n_probes=2)
                ),
            )[:2]
            report[f"hybrid_run{run}"] = r
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
