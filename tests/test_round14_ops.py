"""Round-14 fixes: resolution-free per-source cap (the basis-points
rate floored to zero on mega-sources), persisted bucket fan-outs,
fold-ledger write ordering, and the streaming-substring mask-debt
gauge + retro repair pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from propulsion_spark import load_table

SF = "/root/testdata/sf0.001"


class TestCapPerSourceMegaDomain:
    def test_mega_source_is_thinned_not_dropped(self, spark):
        """The regime the r13 rate floored to zero: src_cnt > 10000·cap.
        With cap=5 over a 60k-doc source the old rate was
        (10000·5) div 60000 = 0 basis points — the WHOLE source
        silently dropped. The residue rule keeps ≈cap at every source
        size (deterministic hash, so this count is stable forever)."""
        from propulsion_spark.operators.textops import cap_per_source

        docs = (
            spark.range(60_000)
            .select(
                F.col("id").alias("doc_id"),
                F.lit("mega").alias("source"),
            )
        )
        kept = cap_per_source(docs, 5).count()
        assert 1 <= kept <= 15, f"mega-source kept {kept}, expected ≈5"

    def test_small_source_passes_whole_and_expectation_unbiased(self, spark):
        """residue < src_cnt ≤ cap ⇒ every doc keeps; and across many
        mid-size sources the mean kept stays ≈cap (no floor bias)."""
        from propulsion_spark.operators.textops import cap_per_source

        docs = (
            spark.range(40_000)
            .select(
                F.col("id").alias("doc_id"),
                # 20 sources × 2000 docs (src_cnt > cap, below the old
                # floor regime — behavior comparable to r13 here)
                (F.col("id") % 20).cast("string").alias("source"),
            )
        )
        small = spark.range(7).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            F.lit("tiny").alias("source"),
        )
        out = cap_per_source(docs.unionByName(small), 10)
        per_src = {
            r["source"]: r["count"]
            for r in out.groupBy("source").count().collect()
        }
        assert per_src.get("tiny") == 7  # under-cap source intact
        mids = [v for k, v in per_src.items() if k != "tiny"]
        mean = sum(mids) / max(len(mids), 1)
        assert 6.0 <= mean <= 14.0
