"""r15 profiling: decompose dedup_minhash_lsh_pairs at sf0.1.

Times the four arms separately through the noop sink: signature+band
compute, the banded candidate join, the exact 3-gram Jaccard verify,
and the PassJoin edit arm. Usage: python docs/prof_r15_minhash.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from propulsion_spark import get_spark, load_table
    from propulsion_spark.operators.dedup import (
        JACCARD_CUTOFF,
        NUM_HASHES,
        _grams,
        band_pairs_from_sigs,
        fuzzy_edit_pairs,
        minhash_with_bands,
    )

    spark = get_spark("prof-r15-minhash")
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
        pairs = band_pairs_from_sigs(sigs).persist()
        noop(pairs)
        t_pairs = time.time() - t0

        t0 = time.time()
        grams = load_table(spark, sf_dir, "documents").selectExpr(
            "doc_id", f"{_grams('spark')} AS g"
        )
        ga = grams.select(F.col("doc_id").alias("a_id"), F.col("g").alias("ga"))
        gb = grams.select(F.col("doc_id").alias("b_id"), F.col("g").alias("gb"))
        inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
        jaccard = inter / (F.size("ga") + F.size("gb") - inter)
        verified = (
            pairs.select("a_id", "b_id")
            .join(ga, "a_id")
            .join(gb, "b_id")
            .select("a_id", "b_id", jaccard.alias("score"))
            .filter(F.col("score") >= JACCARD_CUTOFF)
        )
        noop(verified)
        t_verify = time.time() - t0

        t0 = time.time()
        edit = fuzzy_edit_pairs(load_table(spark, sf_dir, "documents"))
        noop(edit)
        t_edit = time.time() - t0
        pairs.unpersist()
        sigs.unpersist()
        print(
            f"run{run}: sigs={t_sigs:.2f}s band_pairs={t_pairs:.2f}s "
            f"verify={t_verify:.2f}s edit={t_edit:.2f}s "
            f"total={t_sigs + t_pairs + t_verify + t_edit:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
