"""Round-8 operators: substring-span dedup APPLICATOR (Lee et al. 2021
ExactSubstr — trim the duplicated regions the stats operator measures)
and its curation-pipeline stage."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from propulsion_spark.operators.dedup import trim_duplicated_spans

HEADER = (
    "licensed under the apache license version two point zero "
    "you may not use this file except in compliance"
)  # 18 tokens ≥ k=8 → every header k-gram is shared → full header cut


def _body(i: int) -> str:
    return " ".join(f"uniq{i}w{j}" for j in range(12))


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


class TestTrimDuplicatedSpans:
    def test_planted_header_survives_in_exactly_one_doc(self, spark):
        docs = _docs(
            spark,
            [(i, f"{HEADER} {_body(i)}") for i in range(1, 5)]
            + [(9, _body(9))],
        )
        out = {r["doc_id"]: r for r in trim_duplicated_spans(docs).collect()}
        # keeper = smallest doc_id: text byte-for-byte unchanged
        assert out[1]["text"] == f"{HEADER} {_body(1)}"
        assert out[1]["n_tokens_removed"] == 0
        # every other holder: header gone, body intact
        for i in (2, 3, 4):
            assert out[i]["text"] == _body(i)
            assert out[i]["n_tokens_removed"] == 18
        # clean doc untouched
        assert out[9]["text"] == _body(9)
        assert out[9]["n_tokens_removed"] == 0

    def test_case_insensitive_match_preserves_original_case(self, spark):
        """Gram hashing lowercases (repo tokenization convention), so an
        UPPERCASE copy of the header is still a duplicate — and the
        surviving tokens keep their original bytes."""
        docs = _docs(
            spark,
            [
                (1, f"{HEADER} {_body(1)}"),
                (2, f"{HEADER.upper()} TailWord {_body(2)}"),
            ],
        )
        out = {r["doc_id"]: r for r in trim_duplicated_spans(docs).collect()}
        assert out[1]["n_tokens_removed"] == 0
        assert out[2]["text"] == f"TailWord {_body(2)}"

    def test_untrimmed_docs_pass_through_byte_for_byte(self, spark):
        """Whitespace normalization applies ONLY to rebuilt docs — a doc
        with no duplicated spans keeps tabs/double spaces verbatim."""
        weird = "alpha\tbeta  gamma delta epsilon"
        docs = _docs(spark, [(1, weird), (2, _body(2))])
        out = {r["doc_id"]: r["text"] for r in trim_duplicated_spans(docs).collect()}
        assert out[1] == weird

    def test_partition_invariant_and_deterministic(self, spark):
        docs = _docs(
            spark,
            [(i, f"{_body(i)} {HEADER}") for i in range(1, 8)],
        )
        a = sorted(
            (r["doc_id"], r["text"], r["n_tokens_removed"])
            for r in trim_duplicated_spans(docs).collect()
        )
        b = sorted(
            (r["doc_id"], r["text"], r["n_tokens_removed"])
            for r in trim_duplicated_spans(docs.repartition(7)).collect()
        )
        assert a == b
        # header is a SUFFIX here — interval math must not leak into
        # the preceding body tokens
        assert a[1][1] == _body(2)

    def test_drop_empty_removes_fully_cut_docs(self, spark):
        docs = _docs(
            spark,
            [(1, HEADER), (2, HEADER), (3, _body(3))],
        )
        kept = trim_duplicated_spans(docs).collect()
        assert {r["doc_id"] for r in kept} == {1, 2, 3}
        assert [r["text"] for r in kept if r["doc_id"] == 2] == [""]
        dropped = trim_duplicated_spans(docs, drop_empty=True).collect()
        assert {r["doc_id"] for r in dropped} == {1, 3}

    def test_agrees_with_stats_operator_coverage(self, spark):
        """The applicator removes exactly the coverage the stats
        operator reports for non-keeper docs (same grams, same interval
        union) — evidence and transformation stay one signal."""
        from propulsion_spark.operators.dedup import substring_span_stats

        docs = _docs(
            spark,
            [(i, f"{HEADER} {_body(i)} {HEADER}") for i in range(1, 4)],
        )
        stats = {
            r["doc_id"]: r["dup_covered_tokens"]
            for r in substring_span_stats(docs).collect()
        }
        out = {
            r["doc_id"]: r["n_tokens_removed"]
            for r in trim_duplicated_spans(docs).collect()
        }
        assert out[1] == 0  # keeper holds every shared span
        for i in (2, 3):
            assert out[i] == stats[i]


class TestCurationSpanStage:
    def test_span_stage_trims_before_gates(self, spark, tmp_path):
        """--span-dedup curation stage: the planted passage survives in
        one curated doc only; a header-only doc is cut to empty and
        falls out at the token-bounds gate."""
        from propulsion_spark.pipelines import CurationPipeline

        def body(tag):
            # unique per doc (a shared body would itself be a
            # duplicated span) but alphabetic enough for the gate
            return " ".join(
                f"alpha{tag}word{j} brown fox{j}{tag}" for j in range(6)
            )

        rows = [
            {
                "doc_id": i,
                "text": t,
                "lang": "en",
                "source": "s",
                "n_chars": len(t),
            }
            for i, t in [
                (1, f"{HEADER} {body('a')}"),
                (2, f"{HEADER} {body('b')}"),
                (3, HEADER),  # header-only: empty after trim
                (4, body("c")),  # clean
            ]
        ]
        docs = spark.createDataFrame(
            pd.DataFrame(rows),
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        pipe = CurationPipeline(
            spark, str(tmp_path / "out"), span_dedup=True
        )
        pipe.process_batch(docs)
        kept = {r["doc_id"]: r for r in pipe.curated().collect()}
        assert set(kept) == {1, 2, 4}
        assert kept[1]["text"].startswith(HEADER)  # keeper intact
        assert kept[2]["text"] == body("b")  # header cut
        # stored char count describes the stored (trimmed) text
        assert kept[2]["n_chars"] == len(kept[2]["text"])
        assert pipe.stats["span_trimmed"] == 2  # docs 2 and 3
        assert pipe.stats["rejected_quality"] == 1  # doc 3, post-trim
        assert pipe.stats["kept"] == 3
