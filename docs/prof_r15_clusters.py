"""r15 profiling: where does dedup_clusters spend its time at sf0.1?

Decomposes the query into (a) signature+band compute, (b) band-pair
join, (c) the connected-components loop (per-round timing), (d) the
final size join — each timed through the noop sink on the bench's
session config. Usage: python docs/prof_r15_clusters.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from propulsion_spark import get_spark
    from propulsion_spark.operators.dedup import (
        NUM_HASHES,
        band_pairs_from_sigs,
        connected_components,
        minhash_with_bands,
    )

    spark = get_spark("prof-r15-clusters")
    spark.range(1000).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for run in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        sigs = minhash_with_bands(spark, sf_dir, persist=True)
        noop(sigs)
        t_sigs = time.time() - t0

        t0 = time.time()
        cand = (
            band_pairs_from_sigs(sigs)
            .filter(F.col("matches") >= NUM_HASHES // 2)
            .select("a_id", "b_id")
        )
        cand = cand.localCheckpoint(eager=True)
        t_pairs = time.time() - t0
        n_edges = cand.count()

        t0 = time.time()
        labels = connected_components(cand)
        t_cc = time.time() - t0

        t0 = time.time()
        sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
        out = labels.join(sizes, "label").select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("label")).alias("is_canonical"),
        )
        noop(out)
        t_final = time.time() - t0
        sigs.unpersist()
        print(
            f"run{run}: sigs+bands={t_sigs:.2f}s band_pairs={t_pairs:.2f}s "
            f"(edges={n_edges}) cc_loop={t_cc:.2f}s final_join={t_final:.2f}s "
            f"total={t_sigs + t_pairs + t_cc + t_final:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
