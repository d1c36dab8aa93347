"""Interleaved A/B for the r15 keeper_inversions gauge (quiet host).

The gauge changed the SemDedup/MediaDedup cross-batch hit set from
``.select(id).distinct().localCheckpoint()`` (+ one count) to
``.groupBy(id).agg(min(keeper)).localCheckpoint()`` (+ the same count
+ one extra filter-count on the pinned frame). Same join, same
shuffle shape — this measures the end-to-end delta of exactly that
substitution on a bench-scale candidate table, interleaved min-of-3
(the repo's quiet-host measurement rule).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from propulsion_spark import get_spark, load_table


def main() -> None:
    spark = get_spark("ab-r15-gauge", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    from propulsion_spark.operators.similarity import (
        _spark_dot,
        assign_cells,
        centroids_frame,
        normed_frame,
    )

    emb = load_table(spark, sf, "embeddings").select(
        F.col("vec_id"), "embedding", "label"
    )
    normed = normed_frame(emb).persist()
    cells = assign_cells(normed, centroids_frame(emb)).persist()
    cells.count()
    # candidate table shaped like the stream's cross-batch join:
    # batch side = odd ids, keeper side = even ids, same cell
    canon = (
        normed.join(cells, "vec_id")
        .filter("vec_id % 2 = 1")
        .persist()
    )
    keepers = (
        normed.join(cells, "vec_id")
        .filter("vec_id % 2 = 0")
        .select(
            "cell",
            F.col("vec_id").alias("keeper"),
            F.col("embedding").alias("k_emb"),
            F.col("nrm").alias("k_nrm"),
        )
        .persist()
    )
    canon.count(), keepers.count()
    cosine = _spark_dot("embedding", "k_emb") / (
        F.col("nrm") * F.col("k_nrm")
    )
    joined = canon.join(keepers, "cell").filter(
        (F.col("keeper") != F.col("vec_id")) & (cosine >= 0.32)
    )

    def old_shape() -> float:
        t0 = time.time()
        hits = (
            joined.select("vec_id").distinct().localCheckpoint(eager=True)
        )
        hits.count()
        return time.time() - t0

    def new_shape() -> float:
        # the SHIPPED shape: one agg job covers hit count + inversions
        t0 = time.time()
        hit_pairs = (
            joined.groupBy("vec_id")
            .agg(F.min("keeper").alias("_k_min"))
            .localCheckpoint(eager=True)
        )
        hit_pairs.agg(
            F.count("*").alias("n"),
            F.count_if(F.col("vec_id") < F.col("_k_min")).alias("inv"),
        ).collect()
        return time.time() - t0

    old_shape(), new_shape()  # warm both paths
    olds, news = [], []
    for _ in range(3):  # interleaved min-of-3
        olds.append(old_shape())
        news.append(new_shape())
    print(
        {
            "old_distinct_s": round(min(olds), 3),
            "new_gauge_s": round(min(news), 3),
            "delta_s": round(min(news) - min(olds), 3),
        }
    )


if __name__ == "__main__":
    main()
