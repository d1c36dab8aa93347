"""r15 profiling: decompose pipeline_srccap_stream at sf0.1.

Times each phase of the bench row: the two run_batch micro-batches
through CapPerSourceStream, then retro_thin split into its internal
steps (registry totals pin + fingerprint vs the per-partition repair
loop). Phase timing is by wall-clock brackets around the existing
calls. Usage: python docs/prof_r15_srccap.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from propulsion_spark import get_spark, load_table
    from propulsion_spark.streaming.source_cap import CapPerSourceStream

    spark = get_spark("prof-r15-srccap")
    spark.range(1000).count()
    full = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    for run in range(2):
        tmp = tempfile.mkdtemp(prefix="prof-srccap-")
        try:
            t0 = time.time()
            scap = CapPerSourceStream(spark, f"{tmp}/reg", 64)
            t_open = time.time() - t0
            t0 = time.time()
            scap.run_batch(
                full.filter("doc_id % 2 = 0"), 1, f"{tmp}/out"
            )
            t_b1 = time.time() - t0
            t0 = time.time()
            scap.run_batch(
                full.filter("doc_id % 2 = 1"), 2, f"{tmp}/out"
            )
            t_b2 = time.time() - t0

            # retro_thin, decomposed: totals pin + fingerprint first
            # (the same calls its body makes), then the kernel loop
            from pyspark.sql import functions as F

            from propulsion_spark.streaming.repair import (
                registry_fingerprint,
                repair_partitions,
            )
            from propulsion_spark.streaming.source_cap import _admit_expr

            t0 = time.time()
            tot = (
                scap.registry.totals()
                .withColumnRenamed("source", scap.source_col)
                .localCheckpoint(eager=True)
            )
            fp = registry_fingerprint(tot, scap.source_col, "src_cnt")
            t_totfp = time.time() - t0

            def _thin(part):
                return (
                    part.join(tot, scap.source_col)
                    .filter(
                        _admit_expr(
                            scap.cap, scap.salt, id_col=scap.id_col
                        )
                    )
                    .drop("src_cnt")
                )

            t0 = time.time()
            rep = repair_partitions(
                spark, f"{tmp}/out", "srccap", fp, _thin, chunk_size=1
            )
            t_loop = time.time() - t0
            print(
                f"run{run}: open={t_open:.2f} b1={t_b1:.2f} "
                f"b2={t_b2:.2f} totals+fp={t_totfp:.2f} "
                f"repair_loop={t_loop:.2f} rep={rep}"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
