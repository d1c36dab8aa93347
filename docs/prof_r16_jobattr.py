"""r16: attribute every Spark job inside one SemDedupStream micro-batch
(and one MediaDedupStream batch) by its call-site description, via the
UI REST API — job counts alone said 26-36 jobs/batch and the mental
model undercounted badly; this names them.

Usage: python docs/prof_r16_jobattr.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import urllib.request

sys.path.insert(0, "/root/repo")


def jobs_since(ui, app_id, lo):
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
    ) as r:
        jobs = json.load(r)
    out = [
        (j["jobId"], j.get("name", "")[:110])
        for j in jobs
        if j["jobId"] > lo
    ]
    out.sort()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from propulsion_spark import get_spark, load_table
    from propulsion_spark.operators.similarity import centroids_frame
    from propulsion_spark.pipelines import SemDedupStream

    spark = get_spark(
        "prof-r16-jobattr", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    spark.range(1000).count()

    emb = load_table(spark, sf_dir, "embeddings")
    half = emb.selectExpr("vec_id AS doc_id", "embedding")
    tmp = tempfile.mkdtemp(prefix="prof-r16-attr-")
    try:
        last = max((j for j, _ in jobs_since(ui, app_id, -1)), default=-1)
        sds = SemDedupStream(spark, f"{tmp}/semreg", centroids_frame(emb))
        init_jobs = jobs_since(ui, app_id, last)
        print("== init ==")
        for j, n in init_jobs:
            print(f"  [{j}] {n}")
        last = max((j for j, _ in init_jobs), default=last)

        for bid, pred in ((0, "doc_id % 2 = 0"), (1, "doc_id % 2 = 1")):
            sds.process_batch(half.filter(pred), bid).count()
            batch_jobs = jobs_since(ui, app_id, last)
            print(f"== batch {bid}: {len(batch_jobs)} jobs ==")
            for j, n in batch_jobs:
                print(f"  [{j}] {n}")
            last = max((j for j, _ in batch_jobs), default=last)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
