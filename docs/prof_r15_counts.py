"""r15 profiling: per-batch Spark JOB COUNTS (and wall time) for the
two cross-batch dedup streams — the counting-discipline A/B for the
stats-scan change (one agg over the already-persisted base/fingerprint
frame instead of df.count() + a second cached count).

Wall time on this host swings 1.5-4x; the job count per batch is the
deterministic structural fact, captured via job groups. Usage:
python docs/prof_r15_counts.py [sf_dir]
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
    import numpy as np
    import pandas as pd

    from propulsion_spark import get_spark, load_table
    from propulsion_spark.operators.multimodal import encode_bmp
    from propulsion_spark.operators.perceptual import resize_bilinear
    from propulsion_spark.operators.similarity import centroids_frame
    from propulsion_spark.pipelines import MediaDedupStream, SemDedupStream

    spark = get_spark("prof-r15-counts")
    sc = spark.sparkContext
    spark.range(1000).count()
    report = {}

    # --- semantic stream: the bench row's exact shape ---
    emb = load_table(spark, sf_dir, "embeddings")
    half = emb.selectExpr("vec_id AS doc_id", "embedding")
    for run in range(2):
        tmp = tempfile.mkdtemp(prefix="prof-counts-sem-")
        try:
            sds = SemDedupStream(spark, f"{tmp}/semreg", centroids_frame(emb))
            n0, t0, _ = jobs_in(
                sc, f"sem-b0-{run}",
                lambda: sds.process_batch(
                    half.filter("doc_id % 2 = 0"), 0
                ).count(),
            )
            n1, t1, _ = jobs_in(
                sc, f"sem-b1-{run}",
                lambda: sds.process_batch(
                    half.filter("doc_id % 2 = 1"), 1
                ).count(),
            )
            report[f"sem_run{run}"] = {
                "b0_jobs": n0, "b0_s": round(t0, 2),
                "b1_jobs": n1, "b1_s": round(t1, 2),
                "stats": dict(sds.stats),
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        spark.catalog.clearCache()

    # --- media stream: bench-shaped BMPs, two batches ---
    def _gen_bmps(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.RandomState(int(i) // 2)
                base = resize_bilinear(rng.rand(8, 8) * 235.0, 64, 64)
                if i % 2:
                    base = base + 15.0
                g = base.astype(np.uint8).astype(np.float64)
                rows.append(
                    {
                        "doc_id": int(i),
                        "media": encode_bmp(np.stack([g, g, g], axis=2)),
                        "media_type": "image/bmp",
                    }
                )
            yield pd.DataFrame(rows)

    media = (
        spark.range(2000)
        .repartition(16)
        .mapInPandas(
            _gen_bmps, "doc_id long, media binary, media_type string"
        )
    )
    for run in range(2):
        tmp = tempfile.mkdtemp(prefix="prof-counts-med-")
        try:
            mds = MediaDedupStream(
                spark, f"{tmp}/medreg", type_col="media_type"
            )
            n0, t0, _ = jobs_in(
                sc, f"med-b0-{run}",
                lambda: mds.process_batch(
                    media.filter("doc_id % 2 = 0"), 0
                ).count(),
            )
            n1, t1, _ = jobs_in(
                sc, f"med-b1-{run}",
                lambda: mds.process_batch(
                    media.filter("doc_id % 2 = 1"), 1
                ).count(),
            )
            report[f"med_run{run}"] = {
                "b0_jobs": n0, "b0_s": round(t0, 2),
                "b1_jobs": n1, "b1_s": round(t1, 2),
                "stats": dict(mds.stats),
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        spark.catalog.clearCache()

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
