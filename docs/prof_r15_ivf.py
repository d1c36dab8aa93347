"""r15 profiling: decompose similarity_ivf_topk at sf0.1.

Times the shared intermediates (dist0+rank window, normed) and the
three branches (seeded 1-probe, seeded multi-probe, learned) through
the noop sink. Usage: python docs/prof_r15_ivf.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from propulsion_spark import get_spark
    from propulsion_spark.operators.similarity import (
        NPROBE,
        _ivf_multiprobe_from_dist,
        _spark_ivf_dist,
        _spark_ivf_dist_learned,
        _spark_normed,
        q_similarity_ivf_single,
    )

    spark = get_spark("prof-r15-ivf")
    spark.range(1000).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    cols = ["query_id", "neighbor_id", "rank", "cosine"]
    for run in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        dist0 = _spark_ivf_dist(spark, sf_dir)
        w_cell = Window.partitionBy("vec_id").orderBy(F.col("d2"), F.col("label"))
        ranked0 = dist0.withColumn("rn", F.row_number().over(w_cell)).persist()
        noop(ranked0)
        t_ranked = time.time() - t0

        t0 = time.time()
        normed = _spark_normed(spark, sf_dir).persist()
        noop(normed)
        t_normed = time.time() - t0

        cells = ranked0.filter(F.col("rn") == 1).select(
            "vec_id", F.col("label").alias("cell")
        )
        t0 = time.time()
        single = q_similarity_ivf_single(
            spark, sf_dir, cells=cells, normed=normed
        ).select(*cols)
        noop(single)
        t_single = time.time() - t0

        t0 = time.time()
        multi = _ivf_multiprobe_from_dist(
            spark, sf_dir, dist0, ranked=ranked0, normed=normed
        ).select(*cols)
        noop(multi)
        t_multi = time.time() - t0

        t0 = time.time()
        learned = _ivf_multiprobe_from_dist(
            spark,
            sf_dir,
            _spark_ivf_dist_learned(spark, sf_dir, assign0=cells),
            normed=normed,
        ).select(*cols)
        noop(learned)
        t_learned = time.time() - t0
        ranked0.unpersist()
        normed.unpersist()
        print(
            f"run{run}: ranked0={t_ranked:.2f}s normed={t_normed:.2f}s "
            f"single={t_single:.2f}s multi={t_multi:.2f}s "
            f"learned={t_learned:.2f}s "
            f"total={t_ranked + t_normed + t_single + t_multi + t_learned:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
