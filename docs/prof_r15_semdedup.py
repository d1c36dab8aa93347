"""r15 profiling: decompose pipeline_semdedup_stream at sf0.1.

Times each phase of the bench row: stream construction (codebook
freeze), the two process_batch micro-batches, and — separately — one
isolated materialization of assign_cells over the same rows, to price
a single assignment pass (the candidate redundancy: the pair join's
self-join sides and the framed join each recompute it). Usage:
python docs/prof_r15_semdedup.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark, load_table
    from propulsion_spark.operators.similarity import (
        _spark_dot,
        assign_cells,
        centroids_frame,
    )
    from propulsion_spark.pipelines import SemDedupStream

    spark = get_spark("prof-r15-semdedup")
    spark.range(1000).count()
    emb = load_table(spark, sf_dir, "embeddings")
    half = emb.selectExpr("vec_id AS doc_id", "embedding")

    for run in range(2):
        tmp = tempfile.mkdtemp(prefix="prof-semdedup-")
        try:
            t0 = time.time()
            sds = SemDedupStream(spark, f"{tmp}/semreg", centroids_frame(emb))
            t_open = time.time() - t0
            t0 = time.time()
            sds.process_batch(half.filter("doc_id % 2 = 0"), 0).count()
            t_b1 = time.time() - t0
            t0 = time.time()
            sds.process_batch(half.filter("doc_id % 2 = 1"), 1).count()
            t_b2 = time.time() - t0

            # isolated: ONE assignment pass over batch-1's rows
            normed = (
                half.filter("doc_id % 2 = 0")
                .select(
                    F.col("doc_id").alias("vec_id"), "embedding"
                )
                .withColumn(
                    "nrm", F.sqrt(_spark_dot("embedding", "embedding"))
                )
                .filter(F.col("embedding").isNotNull() & (F.col("nrm") > 0))
            )
            t0 = time.time()
            assign_cells(normed, sds.codebook).write.format("noop").mode(
                "overwrite"
            ).save()
            t_assign = time.time() - t0
            print(
                f"run{run}: open={t_open:.2f} b1={t_b1:.2f} b2={t_b2:.2f} "
                f"one_assign={t_assign:.2f} stats={sds.stats}"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()


