"""Round-7 operators: cross-document substring-span dedup coverage
(Lee et al. 2021-style) and exact discrete token-count quantiles.

The oracle queries (`text_repetition`, `text_lang_stats`) hash-check
these against DuckDB on the corpus; the tests here pin the hand-checked
semantics the oracle can't express as obviously: interval-union
arithmetic on overlapping spans, sub-k documents, and quantile rank
edges on tiny groups.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from propulsion_spark.operators.dedup import substring_span_stats


def mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestSubstringSpanStats:
    def test_no_cross_doc_duplicates(self, spark):
        docs = mk_docs(
            spark, ["a b c d e f", "g h i j k l", "m n o p q r"]
        )
        out = substring_span_stats(docs, k=3).collect()
        assert all(r.n_dup_spans == 0 for r in out)
        assert all(r.dup_covered_tokens == 0 for r in out)
        assert all(r.dup_span_frac == 0.0 for r in out)
        assert all(r.n_span_positions == 4 for r in out)

    def test_shared_span_counted_both_sides(self, spark):
        # "c d e" appears verbatim in docs 0 and 1
        docs = mk_docs(spark, ["a b c d e", "x c d e y", "p q r s t"])
        rows = {r.doc_id: r for r in substring_span_stats(docs, k=3).collect()}
        assert rows[0].n_dup_spans == 1
        assert rows[0].dup_covered_tokens == 3
        assert rows[0].dup_span_frac == pytest.approx(3 / 5)
        assert rows[1].n_dup_spans == 1
        assert rows[1].dup_covered_tokens == 3
        assert rows[2].n_dup_spans == 0

    def test_overlapping_spans_union_not_sum(self, spark):
        # docs share the 4-token run "a b c d": positions 0 and 1 both
        # duplicated 3-grams; union covers 4 tokens, not 6
        docs = mk_docs(spark, ["a b c d x", "y a b c d"])
        rows = {r.doc_id: r for r in substring_span_stats(docs, k=3).collect()}
        assert rows[0].n_dup_spans == 2
        assert rows[0].dup_covered_tokens == 4
        assert rows[1].dup_covered_tokens == 4

    def test_disjoint_spans_sum(self, spark):
        # two separated shared 3-gram spans in one doc: 3 + 3 tokens
        docs = mk_docs(
            spark,
            [
                "a b c z z z d e f",
                "a b c q q q q q q",
                "w w w w w w d e f",
            ],
        )
        rows = {r.doc_id: r for r in substring_span_stats(docs, k=3).collect()}
        assert rows[0].n_dup_spans == 2
        assert rows[0].dup_covered_tokens == 6

    def test_doc_shorter_than_k(self, spark):
        docs = mk_docs(spark, ["a b", "a b", "a b c d"])
        rows = {r.doc_id: r for r in substring_span_stats(docs, k=3).collect()}
        assert rows[0].n_span_positions == 0
        assert rows[0].n_dup_spans == 0
        assert rows[0].dup_span_frac == 0.0

    def test_within_doc_repeat_not_cross_doc(self, spark):
        # "a b c" repeats WITHIN doc 0 only: min_docs=2 counts distinct
        # documents, so it is not a duplicated span
        docs = mk_docs(spark, ["a b c x a b c", "p q r s t u v"])
        rows = {r.doc_id: r for r in substring_span_stats(docs, k=3).collect()}
        assert rows[0].n_dup_spans == 0

    def test_identical_docs_fully_covered(self, spark):
        docs = mk_docs(spark, ["a b c d e f", "a b c d e f"])
        for r in substring_span_stats(docs, k=3).collect():
            assert r.dup_covered_tokens == r.n_tokens == 6
            assert r.dup_span_frac == 1.0
            assert r.n_dup_spans == r.n_span_positions == 4

    def test_empty_text_zero_rows_survive(self, spark):
        docs = mk_docs(spark, ["", "   ", "a b c", "a b c"])
        rows = {r.doc_id: r for r in substring_span_stats(docs, k=3).collect()}
        assert len(rows) == 4
        assert rows[0].n_tokens == 0 and rows[0].dup_span_frac == 0.0
        assert rows[1].n_tokens == 0
        assert rows[2].dup_covered_tokens == 3


class TestExactTokenQuantiles:
    def _quants(self, spark, counts_by_lang):
        """Run the registered query's quantile logic over synthetic docs
        with exact token counts (k tokens → 'w ' * k)."""
        from propulsion_spark.operators import load_all

        rows = [
            (i, " ".join(["w"] * n), lang, 0)
            for i, (lang, n) in enumerate(
                (lang, n) for lang, ns in counts_by_lang.items() for n in ns
            )
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, n_chars long"
        )
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(os.path.join(d, "documents.parquet"))
            q = load_all()["text_lang_stats"]
            return {r.lang: r for r in q.build(spark, d).collect()}

    def test_rank_edges_tiny_groups(self, spark):
        out = self._quants(
            spark,
            {
                # one doc: every quantile is that doc's count
                "aa": [7],
                # two docs: p50 rank ceil(1.0)=1 → smaller; p90/p99 → larger
                "bb": [3, 9],
                # ten docs 1..10: p50 → 5, p90 → 9, p99 → 10
                "cc": list(range(1, 11)),
            },
        )
        assert (out["aa"].p50_tokens, out["aa"].p99_tokens) == (7, 7)
        assert out["bb"].p50_tokens == 3
        assert out["bb"].p90_tokens == 9
        assert out["cc"].p50_tokens == 5
        assert out["cc"].p90_tokens == 9
        assert out["cc"].p99_tokens == 10

    def test_quantiles_are_actual_values(self, spark):
        out = self._quants(spark, {"aa": [2, 2, 2, 100]})
        # p50 = 2 (rank 2 of 4), p90 = rank ceil(3.6)=4 → 100
        assert out["aa"].p50_tokens == 2
        assert out["aa"].p90_tokens == 100


class TestResampleEpochs:
    def _docs(self, spark, n=400):
        return spark.createDataFrame(
            [
                (i, f"text {i}", ["src0", "src1", "srcX"][i % 3])
                for i in range(n)
            ],
            "doc_id long, text string, source string",
        )

    def test_copy_counts_bounded_by_weight(self, spark):
        from propulsion_spark.operators.textops import resample_epochs

        docs = self._docs(spark)
        out = resample_epochs(
            docs, {"src0": 25000, "src1": 15000, "__default__": 10000}
        )
        per_doc = (
            out.groupBy("doc_id", "source").count().collect()
        )
        for r in per_doc:
            lo, hi = {"src0": (2, 3), "src1": (1, 2), "srcX": (1, 1)}[
                r.source
            ]
            assert lo <= r["count"] <= hi, r
        # expectation holds in aggregate: src0 total within (2, 3)·n/3
        tot = {
            r.source: r.n
            for r in out.groupBy("source")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        n_per = 400 // 3 + 1
        assert 2 * (n_per - 1) <= tot["src0"] <= 3 * n_per
        assert tot["srcX"] == 133  # exactly one copy each

    def test_deterministic_and_partition_invariant(self, spark):
        from propulsion_spark.operators.textops import resample_epochs

        docs = self._docs(spark)
        a = sorted(
            (r.doc_id, r.copy_idx)
            for r in resample_epochs(docs).collect()
        )
        b = sorted(
            (r.doc_id, r.copy_idx)
            for r in resample_epochs(docs.repartition(13)).collect()
        )
        assert a == b
        # copy_idx is a dense 1..n key per doc
        from collections import defaultdict

        by_doc = defaultdict(list)
        for d, c in a:
            by_doc[d].append(c)
        for cs in by_doc.values():
            assert cs == list(range(1, len(cs) + 1))

    def test_quoted_source_name_is_literal_not_sql(self, spark):
        """A source named with a single quote (user input via cli
        --epoch-weights) must compare as a LITERAL: the weight applies
        to exactly that source, the expression never breaks, and no
        other source's weight is rewritten by the stray quote."""
        from propulsion_spark.operators.textops import resample_epochs

        docs = spark.createDataFrame(
            [(i, f"t{i}", "o'reilly" if i % 2 else "plain") for i in range(40)],
            "doc_id long, text string, source string",
        )
        out = resample_epochs(
            docs, {"o'reilly": 20000, "__default__": 10000}
        )
        per = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert per["o'reilly"] == 2 * 20  # exactly two copies each
        assert per["plain"] == 20  # default untouched by the quote

    def test_zero_weight_drops_source(self, spark):
        from propulsion_spark.operators.textops import resample_epochs

        docs = self._docs(spark)
        out = resample_epochs(docs, {"src0": 0, "__default__": 10000})
        assert (
            out.filter(F.col("source") == "src0").count() == 0
        )
        assert out.filter(F.col("source") == "srcX").count() == 133
