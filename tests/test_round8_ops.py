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


# ---------------------------------------------------------------- PII
from propulsion_spark.operators.textops import chunk_documents, redact_pii


class TestRedactPii:
    def test_each_class_scrubbed_and_counted(self, spark):
        docs = _docs(
            spark,
            [
                (1, "mail bob.smith+1@ex-ample.co and jane@x.io today"),
                (2, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.255.1"),
                (3, "clean text with no identifiers at all"),
            ],
        )
        out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
        assert out[1]["text"] == "mail <EMAIL> and <EMAIL> today"
        assert out[1]["pii_hits"] == 2
        assert out[2]["text"] == "ssn <SSN> phone <PHONE> ip <IP>"
        assert out[2]["pii_hits"] == 3
        # clean rows: untouched text, zero count — the scrub is a no-op
        assert out[3]["text"] == "clean text with no identifiers at all"
        assert out[3]["pii_hits"] == 0

    def test_pattern_order_ssn_before_phone(self, spark):
        # 123-45-6789 is SSN-shaped, NOT phone-shaped; a dotted phone
        # must win over the IPv4 pattern that would eat its digits
        docs = _docs(spark, [(1, "a 123-45-6789 b 555.123.4567 c")])
        row = redact_pii(docs).collect()[0]
        assert row["text"] == "a <SSN> b <PHONE> c"

    def test_curation_stage_scrubs_before_store(self, spark, tmp_path):
        from propulsion_spark.pipelines import CurationPipeline

        body = " ".join(f"word{chr(97 + j % 26)}" for j in range(30))
        docs = spark.createDataFrame(
            [(1, f"reach me at alice@corp.example {body}", "en", 1),
             (2, f"{body} no pii here", "en", 1)],
            "doc_id long, text string, lang string, n_chars int",
        ).withColumn("n_chars", F.length("text").cast("long"))
        pipe = CurationPipeline(
            spark, str(tmp_path / "cur"), redact_pii=True, assign_splits=False
        )
        pipe.process_batch(docs)
        out = {r["doc_id"]: r for r in pipe.curated().collect()}
        assert "alice@corp.example" not in out[1]["text"]
        assert "<EMAIL>" in out[1]["text"]
        # stored n_chars describes the stored (redacted) text
        assert out[1]["n_chars"] == len(out[1]["text"])
        assert pipe.stats["pii_redacted"] == 1


# ----------------------------------------------------------- chunking
class TestChunkDocuments:
    def test_round_trip_reassembly(self, spark):
        toks = [f"t{i}" for i in range(23)]
        docs = _docs(spark, [(1, " ".join(toks))])
        rows = sorted(
            chunk_documents(docs, chunk_tokens=8, overlap=3).collect(),
            key=lambda r: r["chunk_id"],
        )
        # chunk 0 whole + each later chunk minus its 3-token overlap
        # reassembles the doc exactly
        rebuilt = rows[0]["chunk_text"].split(" ")
        for r in rows[1:]:
            rebuilt += r["chunk_text"].split(" ")[3:]
        assert rebuilt == toks
        # dense chunk ids, correct window arithmetic: stride 5 →
        # n_chunks = (23-8+4)//5 + 1 = 4
        assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
        # every full window is 8 tokens; the tail carries the remainder
        assert [r["n_chunk_tokens"] for r in rows] == [8, 8, 8, 8]
        # consecutive chunks share exactly the 3-token overlap
        for a, b in zip(rows, rows[1:]):
            assert a["chunk_text"].split(" ")[-3:] == b["chunk_text"].split(" ")[:3]

    def test_short_doc_single_chunk_and_empty_doc_no_rows(self, spark):
        docs = _docs(spark, [(1, "just four little tokens"), (2, "")])
        rows = chunk_documents(docs, chunk_tokens=8, overlap=3).collect()
        assert len(rows) == 1
        assert rows[0]["doc_id"] == 1 and rows[0]["chunk_id"] == 0
        assert rows[0]["chunk_text"] == "just four little tokens"
        assert rows[0]["n_chunk_tokens"] == 4

    def test_ragged_tail_kept(self, spark):
        docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(10)))])
        rows = sorted(
            chunk_documents(docs, chunk_tokens=8, overlap=3).collect(),
            key=lambda r: r["chunk_id"],
        )
        # stride 5: windows [0..8) and [5..10) — tail is 5 tokens
        assert [r["n_chunk_tokens"] for r in rows] == [8, 5]

    def test_rejects_bad_overlap(self, spark):
        import pytest

        docs = _docs(spark, [(1, "a b c")])
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=8, overlap=8)


# ------------------------------------------------------- bigram LM
from propulsion_spark.operators.lm import (
    LM_SCALE,
    lm_likelihood,
    lm_self_score_by_lang,
    train_bigram_lm,
)


def _lm_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en"),
            (2, "the cat sat on the hat", "en"),
            (3, "zork blib quux", "xx"),
            (4, "", "en"),
            (5, "solo", "en"),
        ],
        "doc_id long, text string, lang string",
    )


class TestBigramLm:
    def test_counts_and_conditionals(self, spark):
        lm = {
            (r["lang"], r["gram"]): (r["c"], r["p"])
            for r in train_bigram_lm(_lm_docs(spark), by="lang").collect()
        }
        # 'the' opens 4 bigrams in en: the-cat x2, the-mat, the-hat
        assert lm[("en", "the cat")] == (2, 4)
        assert lm[("en", "the mat")] == (1, 4)
        assert lm[("xx", "zork blib")] == (1, 1)
        # <2-token docs (empty, single) contribute nothing
        assert sum(c for (lg, _), (c, _) in lm.items() if lg == "en") == 10

    def test_join_mode_exact_mean_likelihood(self, spark):
        docs = _lm_docs(spark).filter("lang = 'en'")
        lm = train_bigram_lm(docs)
        out = {
            r["doc_id"]: r
            for r in lm_likelihood(docs, lm, mode="join").collect()
        }
        # doc 1: (.5 + 1 + 1 + 1 + .25) / 5 — integer-scaled, so exact
        assert out[1]["n_grams"] == 5
        assert abs(out[1]["score"] - 0.75) < 1e-9
        assert out[1]["score"] == out[2]["score"]

    def test_broadcast_mode_orders_quality(self, spark):
        docs = _lm_docs(spark)
        lm = train_bigram_lm(docs, by="lang")
        out = {
            r["doc_id"]: r
            for r in lm_likelihood(docs, lm, by="lang", mode="broadcast").collect()
        }
        # in-distribution docs score higher (closer to 0) than a doc
        # scored against a foreign LM would; gram counts match join mode
        assert out[1]["n_grams"] == 5 and out[3]["n_grams"] == 2
        assert out[1]["score"] < 0 and out[3]["score"] < 0
        # degenerate docs: no grams -> NULL score
        assert out[4]["n_grams"] == 0 and out[4]["score"] is None
        # OOV text against the en LM scores far below in-distribution
        oov = spark.createDataFrame(
            [(9, "wibble wobble flurb glorp", "en")],
            "doc_id long, text string, lang string",
        )
        oov_s = lm_likelihood(oov, lm, by="lang", mode="broadcast").collect()[0]
        assert oov_s["score"] < out[1]["score"]

    def test_self_score_matches_per_doc_mean(self, spark):
        out = {
            r["lang"]: r for r in lm_self_score_by_lang(_lm_docs(spark)).collect()
        }
        # en: 10 gram occurrences, mean conditional = 0.75 (hand computed)
        assert out["en"]["lm_grams"] == 10
        assert abs(out["en"]["lm_self_score"] - 0.75) < 1e-9
        # xx: every bigram deterministic -> perfect self-likelihood
        assert out["xx"]["lm_self_score"] == 1.0

    def test_min_count_prunes(self, spark):
        lm = train_bigram_lm(_lm_docs(spark), by="lang", min_count=2)
        grams = {r["gram"] for r in lm.collect()}
        assert "the cat" in grams and "the mat" not in grams


class TestLmGate:
    def test_pipeline_rejects_low_likelihood_docs(self, spark, tmp_path):
        from propulsion_spark.pipelines import CurationPipeline
        from propulsion_spark.operators.lm import train_bigram_lm

        # reference corpus: fluent but varied english-ish text
        base = ("the quick brown fox jumps over the lazy dog while the "
                "calm river flows through the green valley under the sky")
        ref = spark.createDataFrame(
            [(i, base, "en") for i in range(10)],
            "doc_id long, text string, lang string",
        )
        lm = train_bigram_lm(ref)
        gibberish = " ".join(
            # alphabetic (passes the alpha-ratio gate) but zero bigrams
            # shared with the reference corpus → deep OOV log-penalty
            f"xqzjv{chr(97 + j % 26)}kw wplfgh{chr(97 + (j + 7) % 26)}"
            for j in range(12)
        )
        batch = spark.createDataFrame(
            [(1, base, "en", len(base)),
             (2, gibberish, "en", len(gibberish))],
            "doc_id long, text string, lang string, n_chars long",
        )
        pipe = CurationPipeline(
            spark, str(tmp_path / "out"), lm=lm, lm_min_score=-2.0,
            assign_splits=False,
        )
        pipe.process_batch(batch)
        kept = {r["doc_id"] for r in pipe.curated().collect()}
        assert kept == {1}
        assert pipe.stats["rejected_lm"] == 1
        assert pipe.stats["kept"] == 1

    def test_lmtrain_verb_then_gated_sync(self, tmp_path):
        import pandas as pd
        from test_cli import run_cli

        rep = run_cli(
            "lmtrain",
            "--src", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(tmp_path / "lm"),
            "--min-count", "2",
        )
        assert rep["n_grams_kept"] > 0
        assert rep["total_gram_occurrences"] >= rep["n_grams_kept"] * 2
        # the pruned table loads and gates a curation sync end-to-end
        rep2 = run_cli(
            "sync",
            "--from", "documents:/root/testdata/sf0.001",
            "--to", f"curated:{tmp_path}/cur",
            "--checkpoints", f"{tmp_path}/ckpt",
            "--positions", f"{tmp_path}/pos",
            "--curate",
            "--lm-table", str(tmp_path / "lm"),
            "--lm-min-score", "-12.0",
        )
        stats = rep2["curation"] if "curation" in rep2 else rep2
        assert "rejected_lm" in str(stats)


class TestShortDocGrams:
    def test_grams_match_duckdb_on_sub_ngram_docs(self, spark):
        """Spark 4 ANSI mode made element_at THROW on the out-of-range
        tail probes of <3-token docs, where DuckDB yields NULL (the
        designed concat_ws-skip semantics). try_element_at restores the
        cross-engine match — a 1-token doc must not crash the corpus."""
        import duckdb

        from propulsion_spark.operators.dedup import _grams

        rows = [(1, "solo"), (2, "two tokens"), (3, "a b c d"), (4, "")]
        sdf = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: sorted(r["g"])
            for r in sdf.selectExpr("doc_id", f"{_grams('spark')} AS g").collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            "(1,'solo'),(2,'two tokens'),(3,'a b c d'),(4,'')) t(doc_id, text)"
        )
        want = {
            r[0]: sorted(r[1])
            for r in con.execute(
                f"SELECT doc_id, {_grams('duck')} FROM documents"
            ).fetchall()
        }
        assert got == want

    def test_repetition_pipeline_survives_short_docs(self, spark, tmp_path):
        """End-to-end: a curation batch containing 1- and 2-token docs
        must flow through the repetition gate (a _grams consumer), not
        abort the batch."""
        from propulsion_spark.pipelines import CurationPipeline

        body = " ".join(f"alpha{chr(97 + j % 26)} beta{chr(97 + j % 26)}" for j in range(10))
        docs = spark.createDataFrame(
            [(1, "hi", "en", 2), (2, "solo", "en", 4), (3, body, "en", len(body))],
            "doc_id long, text string, lang string, n_chars long",
        )
        pipe = CurationPipeline(spark, str(tmp_path / "cur"), assign_splits=False)
        pipe.process_batch(docs)  # must not raise
        assert pipe.stats["kept"] == 1  # short docs fail the token floor


class TestSubFrameBlobs:
    def test_short_blob_yields_zero_frames(self, spark, tmp_path):
        """A blob smaller than FRAME_BYTES has zero frames — without
        the n_frames >= 1 guard, Spark's sequence(0, -1) yields the
        DESCENDING [0, -1] and fabricates two frame rows the DuckDB
        oracle's generate_series(0, -1) doesn't have."""
        from propulsion_spark.operators.multimodal import (
            FRAME_BYTES,
            q_multimodal_frame_sample,
        )

        spark.createDataFrame(
            [
                (1, "tiny", "en", "s", 4),
                (2, "y" * (FRAME_BYTES * 2), "en", "s", FRAME_BYTES * 2),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        rows = q_multimodal_frame_sample(spark, str(tmp_path)).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
        assert 1 not in by_doc          # sub-frame doc: zero frames
        assert by_doc[2] == [0]         # 2 frames, every-4th sample keeps #0


class TestDegenerateCorpusParity:
    def test_text_queries_match_oracle_on_degenerate_docs(self, spark, tmp_path):
        """Empty / 1-token / whitespace-only docs through the text
        queries, Spark vs DuckDB: no ANSI crash, and the oracle still
        hash-matches (try_divide == DuckDB's x/0→NULL; try_element_at
        == DuckDB's out-of-range NULL)."""
        import duckdb
        import pandas as pd

        from propulsion_spark.operators import load_all

        rows = [
            (1, "", "en", "s", 0),
            (2, "solo", "en", "s", 4),
            (3, "   ", "en", "s", 3),
            (4, "two tokens", "en", "s", 10),
            (5, "a perfectly ordinary document of text", "en", "s", 37),
        ]
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        spark.createDataFrame(
            pdf, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        con = duckdb.connect()
        con.register("documents", pdf)
        reg = load_all()
        for name in (
            "text_metrics", "corpus_curation", "text_repetition",
            "text_lang_stats", "corpus_topk_ngrams", "text_tfidf_keywords",
            "text_winnowing", "corpus_split_assign", "dedup_exact",
            "dedup_minhash_lsh_pairs", "dedup_simhash_buckets",
            "dedup_clusters",
        ):
            got = reg[name].build(spark, str(tmp_path)).toPandas()
            want = con.execute(reg[name].oracle).df()
            cols = sorted(want.columns)
            got = (
                got.reindex(cols, axis=1)
                .sort_values(cols)
                .reset_index(drop=True)
            )
            want = want.reindex(cols, axis=1).sort_values(cols).reset_index(
                drop=True
            )
            assert len(got) == len(want), name
            for col in want.columns:
                a, b = got[col], want[col]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    import numpy as np

                    assert np.allclose(
                        a.astype(float), b.astype(float), equal_nan=True
                    ), (name, col)
                else:
                    assert a.astype(str).tolist() == b.astype(str).tolist(), (
                        name,
                        col,
                    )
