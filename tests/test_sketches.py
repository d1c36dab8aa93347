"""Mergeability proof for the distinct-count sketches: the sketch of a
union must equal the merge of per-partition sketches — the property
that lets 100 TB rollups combine partial sketches without a global
distinct shuffle. The operator doc claims it; this test pins it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.operators.sketches import HLL_M, KMV_K, _POW53

SF = "/root/testdata/sf0.001"


def _kmv_state(df):
    """(event_type → sorted list of kept hashes): the KMV sketch state."""
    hashed = df.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    out: dict[str, list[int]] = {}
    for r in hashed.collect():
        out.setdefault(r["event_type"], []).append(r["h"])
    return {k: sorted(v)[:KMV_K] for k, v in out.items()}


def _hll_regs(df):
    """(event_type → {bucket: m_j}): the HLL register state."""
    md = F.md5(F.col("user_id").cast("string"))
    rows = (
        df.select(
            "event_type",
            F.conv(F.substring(md, 1, 2), 16, 10).cast("long").alias("bucket"),
            F.conv(F.substring(md, 3, 13), 16, 10).cast("long").alias("hh"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max(F.lit(53) - F.length(F.expr("bin(hh)"))).alias("m_j"))
        .collect()
    )
    out: dict[str, dict[int, int]] = {}
    for r in rows:
        out.setdefault(r["event_type"], {})[r["bucket"]] = r["m_j"]
    return out


class TestSketchMergeability:
    def test_kmv_merge_equals_full(self, spark):
        """KMV merge rule: union the kept sets, re-take the K smallest —
        identical state (hence identical estimate) to sketching the full
        data directly."""
        ev = load_table(spark, SF, "events")
        full = _kmv_state(ev)
        a = _kmv_state(ev.filter(F.col("event_id") % 2 == 0))
        b = _kmv_state(ev.filter(F.col("event_id") % 2 == 1))
        merged = {
            k: sorted(set(a.get(k, [])) | set(b.get(k, [])))[:KMV_K]
            for k in set(a) | set(b)
        }
        assert merged == full

    def test_hll_merge_equals_full(self, spark):
        """HLL merge rule: per-register max — identical registers (hence
        identical integer power sum and estimate) to the full sketch."""
        ev = load_table(spark, SF, "events")
        full = _hll_regs(ev)
        a = _hll_regs(ev.filter(F.col("event_id") % 2 == 0))
        b = _hll_regs(ev.filter(F.col("event_id") % 2 == 1))
        merged: dict[str, dict[int, int]] = {}
        for side in (a, b):
            for et, regs in side.items():
                dst = merged.setdefault(et, {})
                for bucket, m in regs.items():
                    dst[bucket] = max(dst.get(bucket, 0), m)
        assert merged == full
        # and the derived integer power sum (the reported `detail`)
        # matches per event type
        for et, regs in full.items():
            s_full = sum(1 << (53 - m) for m in regs.values()) + (
                HLL_M - len(regs)
            ) * _POW53
            s_merged = sum(1 << (53 - m) for m in merged[et].values()) + (
                HLL_M - len(merged[et])
            ) * _POW53
            assert s_full == s_merged


class TestLogHistogramSketch:
    def test_merge_of_partials_equals_sketch_of_union(self, spark):
        """The mergeability contract: per-partition histograms summed per
        (group, bucket) == the histogram of the whole table."""
        from propulsion_spark.operators.sketches import (
            merge_histograms,
            value_log_histogram,
        )

        ev = load_table(spark, SF, "events")
        full = {
            (r["grp"], r["bucket"]): r["c"]
            for r in value_log_histogram(ev).collect()
        }
        parts = [
            value_log_histogram(ev.filter(F.col("event_id") % 3 == i))
            for i in range(3)
        ]
        merged = {
            (r["grp"], r["bucket"]): r["c"]
            for r in merge_histograms(*parts).collect()
        }
        assert merged == full

    def test_quantile_estimate_error_bound(self, spark):
        """Bucket b spans [2^(b-1), 2^b) of the scaled value, so the
        dyadic upper-bound estimate is ≥ the true quantile and < 2× it
        — the HDR-histogram guarantee, checked against the exact order
        statistic for every (event_type, pct)."""
        from propulsion_spark.operators.sketches import (
            QH_PCTS,
            QH_SCALE,
            histogram_quantiles,
            value_log_histogram,
        )
        from pyspark.sql import Window

        ev = load_table(spark, SF, "events")
        est = {
            (r["grp"], r["pct"]): r["est"]
            for r in histogram_quantiles(value_log_histogram(ev)).collect()
        }
        w = Window.partitionBy("event_type").orderBy("value", "event_id")
        wn = Window.partitionBy("event_type")
        ranked = ev.select(
            "event_type",
            "value",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wn).alias("n"),
        )
        for pct in QH_PCTS:
            true = {
                r["event_type"]: r["value"]
                for r in ranked.filter(
                    F.col("rn") == F.expr(f"(n * {pct} + 99) div 100")
                ).collect()
            }
            for et, tv in true.items():
                e = est[(et, pct)]
                scaled_true = int(tv * QH_SCALE)
                assert e * QH_SCALE >= scaled_true
                assert e * QH_SCALE < 2 * max(scaled_true, 1) + 2


class TestCountMin:
    """Count-Min sketch: one-sided guarantee (estimate ≥ true, always),
    partition invariance, merge == union — pinned against exact
    groupBy counts on the corpus."""

    def _exact(self, spark, docs):
        from pyspark.sql import functions as F

        return {
            r["t"]: r["c"]
            for r in docs.select(
                F.explode(
                    F.expr("split(lower(trim(text)), '\\\\s+')")
                ).alias("t")
            )
            .filter("t != ''")
            .groupBy("t")
            .agg(F.count("*").alias("c"))
            .collect()
        }

    def test_one_sided_bound_and_accuracy(self, spark):
        from propulsion_spark import load_table
        from propulsion_spark.operators.sketches import build_count_min

        docs = load_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).select("text")
        cm = build_count_min(docs)
        exact = self._exact(spark, docs)
        toks = list(exact)
        est = cm.estimate(toks)
        true = [exact[t] for t in toks]
        assert all(e >= t for e, t in zip(est, true))  # never undercounts
        assert cm.total == sum(true)
        # 65536 buckets vs ~few-thousand distinct tokens: collisions
        # rare — deterministic hashing makes this a fixed fact
        frac_exact = sum(int(e == t) for e, t in zip(est, true)) / len(toks)
        assert frac_exact > 0.95

    def test_partition_invariant_and_merge(self, spark):
        from propulsion_spark import load_table
        from propulsion_spark.operators.sketches import build_count_min

        docs = load_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).select("doc_id", "text")
        a = build_count_min(docs.repartition(1).select("text"))
        b = build_count_min(docs.repartition(13).select("text"))
        assert a.data == b.data
        lo = build_count_min(docs.filter("doc_id % 2 = 0").select("text"))
        hi = build_count_min(docs.filter("doc_id % 2 = 1").select("text"))
        assert lo.merge(hi).data == a.data

    def test_shape_validation(self):
        import numpy as np

        from propulsion_spark.operators.sketches import CountMinSketch

        with pytest.raises(ValueError):
            CountMinSketch(2, 1000, b"\0" * 16000)  # width not 2^k
        with pytest.raises(ValueError):
            CountMinSketch(2, 1024, b"\0" * 7)  # wrong byte length
        a = CountMinSketch(2, 1024, np.zeros((2, 1024), np.int64).tobytes())
        other = CountMinSketch(
            4, 1024, np.zeros((4, 1024), np.int64).tobytes()
        )
        with pytest.raises(ValueError):
            a.merge(other)


class TestHeavyHitters:
    def test_exact_for_any_threshold(self, spark):
        """heavy_hitters == the full groupBy census filtered at the
        threshold — EXACT, because the sketch never undercounts (no
        qualifying token is prefiltered away) and stragglers die in
        the final HAVING."""
        from propulsion_spark import load_table
        from propulsion_spark.operators.sketches import (
            build_count_min,
            heavy_hitters,
        )

        docs = load_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).select("text")
        exact = {
            r["t"]: r["c"]
            for r in docs.select(
                F.explode(
                    F.expr("split(lower(trim(text)), '\\\\s+')")
                ).alias("t")
            )
            .filter("t != ''")
            .groupBy("t")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        cm = build_count_min(docs)
        for threshold in (2, 10, 100):
            got = {
                r["token"]: r["n"]
                for r in heavy_hitters(docs, threshold, cm=cm).collect()
            }
            want = {t: c for t, c in exact.items() if c >= threshold}
            assert got == want, threshold
        assert want  # non-vacuous at the largest threshold
