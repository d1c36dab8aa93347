"""Round-11: the hybrid-search BM25 top-k scale fix (bm25_topk —
TakeOrderedAndProject instead of an unpartitioned row_number window),
the bench-only-pipeline plan audit that would have caught it, and the
global-window plan detector itself."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

SF_SMOKE = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestBm25TopK:
    def test_bit_identical_to_global_window_ranking(self, spark):
        """The retired r10 formulation (rank EVERY doc through one
        global window, then filter) and bm25_topk (partition-local
        k-heaps, rank only the survivors) must produce identical
        (doc_id, rank) rows — same doc_id tiebreak on both sides."""
        from propulsion_spark import load_table
        from propulsion_spark.operators.textops import bm25_scores, bm25_topk

        docs = load_table(spark, SF_SMOKE, "documents")
        new = sorted(
            (r["doc_id"], r["rank"])
            for r in bm25_topk(docs, terms=("hash", "tree"), k=40).collect()
        )
        w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
        old = sorted(
            (r["doc_id"], r["rank"])
            for r in bm25_scores(docs, terms=("hash", "tree"))
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter("rank <= 40")
            .select("doc_id", "rank")
            .collect()
        )
        assert len(new) == 40
        assert new == old

    def test_fewer_matches_than_k(self, spark):
        """When fewer than k docs score, every scorer is returned with
        a dense 1..n ranking (no padding, no misses)."""
        import pandas as pd

        from propulsion_spark.operators.textops import bm25_topk

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": ["hash hash table", "no match here", "one hash"],
                }
            ),
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r["rank"] for r in bm25_topk(docs, ("hash",), k=40).collect()}
        assert rows == {1: 1, 3: 2}

    def test_plan_is_take_ordered_not_global_window(self, spark):
        """The scale contract: top-k compiles to TakeOrderedAndProject
        (partition-local heaps) and NO window node sits on a
        single-partition exchange anywhere in the plan."""
        from plan_audit import _has_global_window

        from propulsion_spark import load_table
        from propulsion_spark.operators.textops import bm25_topk

        docs = load_table(spark, SF_SMOKE, "documents")
        plan = _plan(bm25_topk(docs, terms=("hash", "tree"), k=40))
        assert "TakeOrderedAndProject" in plan
        assert not _has_global_window(plan)

    def test_detector_catches_the_retired_pattern(self, spark):
        """Regression proof: the exact r10 anti-pattern (row_number
        over an unpartitioned window on corpus-sized input) IS flagged
        by the audit's detector — the audit would now catch a
        reintroduction before ship."""
        from plan_audit import _has_global_window, audit_plan

        from propulsion_spark import load_table
        from propulsion_spark.operators.textops import bm25_scores

        docs = load_table(spark, SF_SMOKE, "documents")
        w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
        old = (
            bm25_scores(docs, terms=("hash",))
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .withColumn("rank", F.row_number().over(w))
            .filter("rank <= 40")
        )
        plan = _plan(old)
        assert _has_global_window(plan)
        assert "global-window" in audit_plan(plan)


class TestRrfFuseNonEmptySpec:
    def test_ungrouped_fuse_has_no_global_window(self, spark):
        """rrf_fuse with no ``by`` ranks through a constant-partitioned
        window (input is candidate-sized, but the plan shouldn't need
        an audit allowlist entry)."""
        import pandas as pd

        from plan_audit import _has_global_window

        from propulsion_spark.operators.similarity import rrf_fuse

        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            pd.DataFrame(rows, columns=["doc_id", "rank"]),
            "doc_id long, rank long",
        )
        fused = rrf_fuse([mk([(7, 1), (5, 2)]), mk([(5, 1), (7, 2)])])
        assert not _has_global_window(_plan(fused))
        out = {r["doc_id"]: r["fused_rank"] for r in fused.collect()}
        assert sorted(out.values()) == [1, 2]


class TestDsirSelectExact:
    def _corpus(self, spark, rows):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]),
            "doc_id long, text string",
        )

    def test_target_lookalikes_outrank(self, spark):
        """Docs written in the pseudo-target slice's vocabulary carry a
        larger integer weight than docs the target LM never saw — the
        DSIR property, under the linear-domain surrogate."""
        from propulsion_spark.operators.dsir import dsir_select_exact

        # ids ≡ 0 (mod 7) form the target slice; 1..6 are candidates —
        # 8 and 15 mimic the target text, the rest are off-domain
        rows = [
            (0, "alpha beta gamma alpha beta"),
            (7, "alpha beta gamma gamma beta"),
            (14, "beta gamma alpha alpha gamma"),
            (8, "alpha beta gamma alpha"),
            (15, "gamma alpha beta beta"),
            (9, "totally different words here now"),
            (10, "unrelated tokens with nothing shared"),
        ]
        ranked = [
            r["doc_id"]
            for r in dsir_select_exact(self._corpus(spark, rows), k=7)
            .orderBy(F.col("dsir_w").desc(), "doc_id")
            .collect()
        ]
        # the draw pool is the whole corpus, so the target docs
        # themselves lead; the lookalikes beat the off-domain docs,
        # which land last (every gram OOV to the target LM)
        assert set(ranked[-2:]) == {9, 10}
        assert ranked.index(8) < ranked.index(9)
        assert ranked.index(15) < ranked.index(9)
        sel5 = {
            r["doc_id"]
            for r in dsir_select_exact(self._corpus(spark, rows), k=5).collect()
        }
        assert {8, 15} <= sel5 and not ({9, 10} & sel5)

    def test_partition_invariant_and_deterministic(self, spark):
        """The selected id set must not move under repartitioning —
        integer weights, integer ties: no accumulation-order float
        hazard anywhere."""
        from propulsion_spark import load_table
        from propulsion_spark.operators.dsir import dsir_select_exact

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        a = sorted(
            (r["doc_id"], r["dsir_w"])
            for r in dsir_select_exact(docs, k=50).collect()
        )
        b = sorted(
            (r["doc_id"], r["dsir_w"])
            for r in dsir_select_exact(docs.repartition(13), k=50).collect()
        )
        assert a == b
        assert len(a) == 50
        assert all(isinstance(w, int) for _, w in a)

    def test_short_docs_never_enter_the_draw(self, spark):
        from propulsion_spark.operators.dsir import dsir_select_exact

        rows = [(0, "alpha beta"), (1, "solo"), (2, ""), (3, "alpha beta")]
        ids = {
            r["doc_id"]
            for r in dsir_select_exact(self._corpus(spark, rows), k=10).collect()
        }
        assert ids == {0, 3}  # <2-token docs contribute no grams

    def test_curation_facet_bounded_by_k(self, spark):
        """corpus_curation's n_dsir counts kept∩selected — never more
        than the draw size."""
        from propulsion_spark.operators.dsir import DSIR_SEL_K
        from propulsion_spark.operators.textops import q_corpus_curation

        rows = q_corpus_curation(spark, SF_SMOKE).collect()
        assert {"n_dsir", "dsir_chars"} <= set(rows[0].asDict())
        total = sum(r["n_dsir"] for r in rows)
        assert 0 < total <= DSIR_SEL_K


class TestBenchPipelinePlanAudit:
    def test_bench_flags_stay_within_expected_set(self, spark):
        """The r10 blind spot, closed: every bench-only pipeline's
        physical plan is audited like the registered queries, and any
        flag outside the documented expected set — including the
        global-window shape that shipped in r10 — fails the suite."""
        from plan_audit import BENCH_EXPECTED_FLAGGED, audit_bench

        results = audit_bench(spark, SF_SMOKE)
        errors = {n: f for n, f in results.items() if any("ERROR" in x for x in f)}
        assert not errors
        flagged = {n for n, f in results.items() if f}
        assert flagged <= BENCH_EXPECTED_FLAGGED, (
            f"unexpected bench plan flags: "
            f"{ {n: results[n] for n in flagged - BENCH_EXPECTED_FLAGGED} }"
        )
        for name, flags in results.items():
            assert "global-window" not in flags, name
