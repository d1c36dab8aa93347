"""r15 profiling: decompose pipeline_substr_stream at sf0.1.

Times each phase of the two micro-batches through SubstrDedupStream:
registry open, per-batch gram pass, counts write, totals read, mask,
stats action. Phase timing is by wall-clock brackets around the
existing calls (process_batch is not modified).
Usage: python docs/prof_r15_substr.py [sf_dir]
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
    from propulsion_spark.streaming.substring_dedup import SubstrDedupStream

    spark = get_spark("prof-r15-substr")
    spark.range(1000).count()
    full = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    for run in range(2):
        tmp = tempfile.mkdtemp(prefix="prof-substr-")
        try:
            t0 = time.time()
            sub = SubstrDedupStream(spark, f"{tmp}/reg", n=8, min_dup=2)
            t_open = time.time() - t0
            t0 = time.time()
            sub.process_batch(full.filter("doc_id % 2 = 0"), 1).write.format(
                "noop"
            ).mode("overwrite").save()
            t_b1 = time.time() - t0
            t0 = time.time()
            sub.process_batch(full.filter("doc_id % 2 = 1"), 2).write.format(
                "noop"
            ).mode("overwrite").save()
            t_b2 = time.time() - t0
            print(
                f"run{run}: open={t_open:.2f}s batch1={t_b1:.2f}s "
                f"batch2={t_b2:.2f}s total={t_open + t_b1 + t_b2:.2f}s",
                flush=True,
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
