"""Streaming corpus-curation pipeline: quality gates + cross-batch
dedup into a curated store, batch and streaming drive."""

from __future__ import annotations

import pandas as pd
import pytest

from propulsion_spark.pipelines import CurationPipeline

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def doc(doc_id, text, lang="en"):
    return {
        "doc_id": doc_id,
        "text": text,
        "lang": lang,
        "source": "s",
        "n_chars": len(text),
    }


GOOD = "the quick brown fox jumps over the lazy dog and keeps running far " * 2
NUMERIC = "12345 67890 " * 30  # fails alpha ratio
SHORT = "tiny text here"  # fails token lower bound


def mk(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows), DOC_SCHEMA)


class TestCurationPipeline:
    def test_quality_and_cross_batch_dedup(self, spark, tmp_path):
        pipe = CurationPipeline(spark, str(tmp_path / "out"))
        pipe.process_batch(
            mk(
                spark,
                [
                    doc(1, GOOD),
                    doc(2, GOOD + " extra tail"),  # near-dup but distinct fp
                    doc(3, NUMERIC),
                    doc(4, SHORT),
                    doc(5, GOOD),  # intra-batch exact dup of 1
                ],
            )
        )
        # cross-batch: 6 redelivers GOOD, 7 is novel
        pipe.process_batch(mk(spark, [doc(6, GOOD), doc(7, GOOD + " novel suffix")]))
        kept = sorted(r.doc_id for r in pipe.curated().collect())
        assert kept == [1, 2, 7]
        assert pipe.stats["seen"] == 7
        assert pipe.stats["rejected_quality"] == 2
        assert pipe.stats["deduped"] == 2  # intra-batch 5 + cross-batch 6
        assert pipe.stats["kept"] == 3
        stats = {r.lang: r.kept_docs for r in pipe.lang_stats().collect()}
        assert stats == {"en": 3}

    def test_streaming_drive(self, spark, tmp_path):
        import os

        indir = str(tmp_path / "feed")
        os.makedirs(indir)
        pipe = CurationPipeline(spark, str(tmp_path / "out2"))
        mk(spark, [doc(1, GOOD)]).coalesce(1).write.mode("append").parquet(indir)
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(indir)
        q = pipe.run_stream(stream, str(tmp_path / "ck"), availableNow=True)
        q.awaitTermination(120)
        mk(spark, [doc(2, GOOD), doc(3, GOOD + " more")]).coalesce(1).write.mode(
            "append"
        ).parquet(indir)
        q2 = pipe.run_stream(stream, str(tmp_path / "ck"), availableNow=True)
        q2.awaitTermination(120)
        kept = sorted(r.doc_id for r in pipe.curated().collect())
        assert kept == [1, 3]  # 2 deduped against batch-1's fingerprint


REPETITIVE = "spam spam spam spam spam " * 20  # all-alpha, enough tokens,
# but one distinct trigram → dup_trigram_frac ≈ 1


class TestCurationRepetitionAndSplits:
    def test_repetition_gate_and_split_labels(self, spark, tmp_path):
        """VERDICT r4 #7: the Gopher-style repetition filter and the
        hash-range split are pipeline stages, not just standalone
        queries — a repetitive doc is rejected (counted separately from
        alpha/token quality) and every kept doc carries a reproducible
        split label."""
        from pyspark.sql import functions as F

        from propulsion_spark.operators.dedup import SPARK_H64
        from propulsion_spark.operators.textops import TRAIN_PCT, VAL_PCT

        pipe = CurationPipeline(spark, str(tmp_path / "out"))
        pipe.process_batch(
            mk(spark, [doc(1, GOOD), doc(2, REPETITIVE), doc(3, NUMERIC)])
        )
        assert pipe.stats["rejected_repetition"] == 1
        assert pipe.stats["rejected_quality"] == 1
        assert pipe.stats["kept"] == 1
        rows = pipe.curated().collect()
        assert [r.doc_id for r in rows] == [1]
        assert rows[0].split in ("train", "val", "test")
        # the label is the pure hash-range function of doc_id — recompute
        want = (
            spark.range(1, 2)
            .select(
                (F.expr(SPARK_H64.format(x="cast(id as string)")) % 100).alias("b")
            )
            .first()
            .b
        )
        expect = (
            "train" if want < TRAIN_PCT
            else "val" if want < TRAIN_PCT + VAL_PCT
            else "test"
        )
        assert rows[0].split == expect
        splits = {(r.source, r.split): r.n_docs for r in pipe.split_stats().collect()}
        assert splits == {("s", expect): 1}

    def test_splits_can_be_disabled(self, spark, tmp_path):
        pipe = CurationPipeline(spark, str(tmp_path / "out"), assign_splits=False)
        pipe.process_batch(mk(spark, [doc(1, GOOD)]))
        assert "split" not in pipe.curated().columns


class TestCurationNearDedup:
    def test_intra_and_cross_batch_near_dup(self, spark, tmp_path):
        """near_dedup=True: docs that share most MinHash rows collapse —
        within a batch via connected components (min-id canonical kept),
        and across batches via the band table — while genuinely
        different docs survive."""
        base = GOOD + " alpha beta gamma delta epsilon zeta"
        near1 = base.replace("lazy", "sleepy")  # 1-word edit → near-dup
        other = (
            "completely different content about distributed query engines "
            "and shuffle partitioning strategies for large clusters " * 2
        )
        pipe = CurationPipeline(spark, str(tmp_path / "out"), near_dedup=True)
        pipe.process_batch(
            mk(spark, [doc(10, base), doc(11, near1), doc(12, other)])
        )
        kept1 = sorted(r.doc_id for r in pipe.curated().collect())
        assert kept1 == [10, 12]  # 11 clustered with 10, canonical kept
        assert pipe.stats["near_deduped"] == 1

        # cross-batch: a fresh near-dup of batch-1's canonical is dropped
        # by the band table; a novel doc passes
        near2 = base.replace("quick", "rapid")
        novel = (
            "unrelated narrative describing watermark semantics and "
            "stateful stream processing with bounded lateness windows " * 2
        )
        pipe.process_batch(mk(spark, [doc(20, near2), doc(21, novel)]))
        kept2 = sorted(r.doc_id for r in pipe.curated().collect())
        assert kept2 == [10, 12, 21]
        assert pipe.stats["near_deduped"] == 2
        assert pipe.stats["kept"] == 3

    def test_replay_is_idempotent(self, spark, tmp_path):
        """Redelivering the same batch adds nothing: the canonical doc
        itself hits the band table (its own signature is registered) or
        the exact-fingerprint table first."""
        pipe = CurationPipeline(spark, str(tmp_path / "out"), near_dedup=True)
        batch = mk(spark, [doc(1, GOOD)])
        pipe.process_batch(batch)
        pipe.process_batch(batch)
        kept = [r.doc_id for r in pipe.curated().collect()]
        assert kept == [1]


class TestDeltaRegistries:
    def test_register_is_a_delta_not_a_rewrite(self, spark, tmp_path):
        """Each register() appends one O(batch) segment; the log folds
        into a single base after compact_after registers — the same
        O(batch)-not-O(table) invariant PositionsTable keeps."""
        from propulsion_spark.pipelines.curation import _FingerprintTable

        t = _FingerprintTable(spark, str(tmp_path / "fps"), compact_after=3)
        for i in range(3):
            t.register(
                spark.createDataFrame([(f"fp{i}", i)], "fp string, keeper long")
            )
        segs = t.manifest.load([])
        assert len(segs) == 3 and all(s.startswith("d-") for s in segs)
        # 4th register crosses compact_after → folded to one base
        t.register(spark.createDataFrame([("fp0", 99)], "fp string, keeper long"))
        segs = t.manifest.load([])
        assert len(segs) == 1 and segs[0].startswith("v-")
        rows = {r["fp"]: r["keeper"] for r in t.read().collect()}
        # min-keeper fold survived the compaction (99 lost to 0)
        assert rows == {"fp0": 0, "fp1": 1, "fp2": 2}

    def test_multi_segment_read_resolves_newest_wins(self, spark, tmp_path):
        from propulsion_spark.pipelines.curation import _FingerprintTable

        t = _FingerprintTable(spark, str(tmp_path / "fps"), compact_after=10)
        t.register(spark.createDataFrame([("a", 5)], "fp string, keeper long"))
        t.register(spark.createDataFrame([("a", 3)], "fp string, keeper long"))
        rows = {r["fp"]: r["keeper"] for r in t.read().collect()}
        assert rows == {"a": 3}


class TestTokenLengthDriftGauge:
    def test_histogram_accumulates_and_quantiles_export(self, spark, tmp_path):
        """The kept-doc token-length histogram accumulates across
        batches (counts == kept docs per language), quantile estimates
        respect the 2x HDR bound against the curated store, and the
        exporter renders the gauge."""
        from pyspark.sql import functions as F

        from propulsion_spark.streaming.metrics import MetricsExporter

        pipe = CurationPipeline(spark, str(tmp_path / "out"))
        # distinct batch ids: the id keys the histogram's replay
        # idempotence (same id = same delivery)
        pipe.process_batch(
            mk(spark, [doc(1, GOOD), doc(2, GOOD + " tail")]), 0
        )
        pipe.process_batch(
            mk(spark, [doc(3, GOOD + " more words here now"), doc(4, GOOD)]), 1
        )
        hist = pipe.token_hist.summed()
        n_hist = sum(r["c"] for r in hist.collect())
        kept = pipe.curated()
        assert n_hist == kept.count() == 3  # doc 4 is an exact dup of 1
        q = {
            (r["grp"], r["pct"]): r["est"]
            for r in pipe.token_length_quantiles().collect()
        }
        true_toks = sorted(
            r["n"]
            for r in kept.select(
                F.expr("size(split(lower(trim(text)), '\\\\s+'))").alias("n")
            ).collect()
        )
        p50 = true_toks[(len(true_toks) * 50 + 99) // 100 - 1]
        assert q[("en", 50)] >= p50
        assert q[("en", 50)] < 2 * p50 + 2
        text = (
            MetricsExporter(group="t").register_curation(pipe).render()
        )
        assert "propulsion_curation_token_length" in text
        assert 'lang="en"' in text

    def test_histogram_replay_idempotent(self, spark, tmp_path):
        """Redelivered batches and re-registered keyed rows cannot
        double-count the drift histogram."""
        pipe = CurationPipeline(spark, str(tmp_path / "out"))
        batch = mk(spark, [doc(1, GOOD), doc(2, GOOD + " tail")])
        pipe.process_batch(batch, 0)
        before = sorted(
            tuple(r) for r in pipe.token_hist.summed().collect()
        )
        pipe.process_batch(batch, 0)  # full redelivery of batch 0
        # crash-retry shape: histogram rows landed but fingerprints
        # didn't — the re-register of identical keyed rows is absorbed
        from propulsion_spark.operators.sketches import value_log_histogram
        from pyspark.sql import functions as F

        pipe.token_hist.register(
            value_log_histogram(
                batch.select(
                    "lang",
                    F.expr(
                        "CAST(size(split(lower(trim(text)), '\\\\s+')) AS DOUBLE)"
                    ).alias("_ntok"),
                ),
                group_col="lang",
                value_col="_ntok",
            ).withColumn("batch_id", F.lit(0).cast("long"))
        )
        after = sorted(
            tuple(r) for r in pipe.token_hist.summed().collect()
        )
        assert after == before


class TestDecontamStage:
    def test_benchmark_overlap_rejected_before_dedup(self, spark, tmp_path):
        # doc 11 embeds a benchmark 8-gram; doc 12 is its exact dup.
        # With decontam ON, 11 is flagged pre-dedup, so 12 must ALSO be
        # flagged (same text) rather than surviving as "novel".
        leaky = (
            "alpha beta gamma delta epsilon zeta eta theta "
            "plus enough extra clean words to pass every quality gate "
            "and some more padding tokens here"
        )
        bench = spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon zeta eta theta")],
            "bid long, text string",
        )
        pipe = CurationPipeline(
            spark, str(tmp_path / "out"), benchmark=bench
        )
        pipe.process_batch(
            mk(spark, [doc(10, GOOD), doc(11, leaky), doc(12, leaky)])
        )
        kept = sorted(r.doc_id for r in pipe.curated().collect())
        assert kept == [10]
        assert pipe.stats["rejected_benchmark"] == 2
        assert pipe.stats["deduped"] == 0
        assert pipe.stats["kept"] == 1
        # the flagged text never became a fingerprint keeper: a later
        # CLEAN batch reusing doc 11's id-space is unaffected, and the
        # leaky fp is still absent from the registry
        fps = pipe.fingerprints.read().count()
        assert fps == 1  # only GOOD's fingerprint

    def test_no_benchmark_means_no_stage(self, spark, tmp_path):
        pipe = CurationPipeline(spark, str(tmp_path / "out2"))
        pipe.process_batch(mk(spark, [doc(1, GOOD)]))
        assert pipe.stats["rejected_benchmark"] == 0
        assert pipe.stats["kept"] == 1

    def test_bloom_fill_gauge_exported_only_with_benchmark(
        self, spark, tmp_path
    ):
        from propulsion_spark.streaming.metrics import MetricsExporter

        bench = spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon")], "bid long, text string"
        )
        with_b = CurationPipeline(
            spark, str(tmp_path / "g1"), benchmark=bench
        )
        text = MetricsExporter(group="gb").register_curation(with_b).render()
        assert "propulsion_curation_bloom_fill_ratio" in text
        assert 'stage="rejected_benchmark"' in text
        without = CurationPipeline(spark, str(tmp_path / "g2"))
        text2 = (
            MetricsExporter(group="gb2").register_curation(without).render()
        )
        assert "propulsion_curation_bloom_fill_ratio" not in text2


class TestCurationToShardCapstone:
    def test_curate_decontam_shard_streaming_end_to_end(
        self, spark, tmp_path
    ):
        """The full training-output flow, streaming: raw batches →
        quality gates → benchmark decontamination → dedup → curated
        store, each batch's survivors then sharded incrementally.
        Flagged docs never reach a shard; shard offsets tile the kept
        token stream with no gaps across batches."""
        from pyspark.sql import functions as F

        from propulsion_spark.streaming.packing import shard_foreach_batch

        leaky = (
            "omega psi chi phi upsilon tau sigma rho "
            "plus enough extra clean words to pass every quality gate "
            "and some more padding tokens here"
        )
        bench = spark.createDataFrame(
            [(0, "omega psi chi phi upsilon tau sigma rho")],
            "bid long, text string",
        )
        pipe = CurationPipeline(
            spark, str(tmp_path / "cur"), benchmark=bench
        )
        shard = shard_foreach_batch(
            spark, str(tmp_path / "state"), str(tmp_path / "shards"),
            shard_tokens=40,
        )
        batches = [
            [doc(1, GOOD), doc(2, leaky), doc(3, GOOD + " uno")],
            [doc(4, GOOD + " dos"), doc(5, GOOD + " tres")],
        ]
        seen: set[int] = set()
        for bid, rows in enumerate(batches):
            pipe.process_batch(mk(spark, rows), bid)
            kept_now = pipe.curated().filter(
                ~F.col("doc_id").isin(list(seen)) if seen else F.lit(True)
            )
            shard(
                kept_now.withColumn(
                    "n_tokens",
                    F.expr("size(split(lower(trim(text)), '\\\\s+'))"),
                ),
                bid,
            )
            seen.update(r.doc_id for r in kept_now.select("doc_id").collect())
        out = spark.read.parquet(str(tmp_path / "shards"))
        sharded = sorted(
            (r["offset"], r["doc_id"], r["n_tokens"], r["shard_id"])
            for r in out.filter("split = 'train'").collect()
        )
        ids = {d for _, d, _, _ in sharded}
        assert 2 not in ids  # the leaky doc never reached a shard
        assert ids == {i for i in seen if i != 2}
        run = 0
        for off, _did, n, sid in sharded:
            assert off == run and sid == off // 40
            run += n


class TestLearnedQualityGate:
    """r12: the GPT-3-style learned quality gate — fixed model per
    pipeline life, map-only scoring, hard floor or deterministic
    Pareto acceptance, rejected docs never become dedup keepers."""

    def _model(self, spark):
        from propulsion_spark.operators.quality_classifier import train

        pos = spark.createDataFrame(
            [(i, GOOD + f" variation {i}") for i in range(40)],
            "doc_id long, text string",
        )
        neg = spark.createDataFrame(
            [(1000 + i, "buy cheap now click deal free " * 8) for i in range(40)],
            "doc_id long, text string",
        )
        return train(pos, neg, n_features=1 << 12)

    def test_hard_floor_gates_junk_before_dedup(self, spark, tmp_path):
        model = self._model(spark)
        pipe = CurationPipeline(
            spark,
            str(tmp_path / "out"),
            quality_model=model,
            quality_min=0.5,
            quality_n_features=1 << 12,
            min_alpha_ratio=0.0,  # isolate the learned gate...
            max_dup_trigram_frac=1.0,  # ...from the heuristic gates
        )
        junk = "buy cheap now click deal free winner " * 6
        pipe.process_batch(
            mk(spark, [doc(1, GOOD), doc(2, junk), doc(3, GOOD + " tail")])
        )
        kept = sorted(r.doc_id for r in pipe.curated().collect())
        assert kept == [1, 3]
        assert pipe.stats["rejected_lowquality"] == 1
        # the junk doc never registered a fingerprint: a later clean
        # batch re-sending its exact text is judged on its own merits
        assert pipe.fingerprints.read().count() == 2

    def test_pareto_default_and_replay_determinism(self, spark, tmp_path):
        model = self._model(spark)

        def run(path):
            pipe = CurationPipeline(
                spark,
                path,
                quality_model=model,
                quality_n_features=1 << 12,
                min_alpha_ratio=0.0,
                max_dup_trigram_frac=1.0,
            )
            junk_batch = mk(
                spark,
                [doc(i, f"buy cheap now click deal free {i} " * 5)
                 for i in range(60)],
            )
            pipe.process_batch(junk_batch)
            return {r.doc_id for r in pipe.curated().collect()}, pipe.stats

        a, stats_a = run(str(tmp_path / "a"))
        b, _ = run(str(tmp_path / "b"))
        assert a == b  # the Pareto draw is a pure function of doc_id
        # α=9 on ~zero-score junk keeps almost nothing
        assert stats_a["rejected_lowquality"] >= 55

    def test_model_path_loading_and_exclusive_knobs(self, spark, tmp_path):
        model = self._model(spark)
        model.save(str(tmp_path / "m"))
        pipe = CurationPipeline(
            spark,
            str(tmp_path / "out"),
            quality_model=str(tmp_path / "m"),
            quality_min=0.5,
            quality_n_features=1 << 12,
        )
        pipe.process_batch(mk(spark, [doc(1, GOOD)]))
        assert [r.doc_id for r in pipe.curated().collect()] == [1]
        with pytest.raises(ValueError, match="ONE of"):
            CurationPipeline(
                spark,
                str(tmp_path / "x"),
                quality_model=model,
                quality_min=0.5,
                quality_pareto_alpha=9.0,
            )


class TestCurationPerSourceCap:
    """r14 verdict #2: the domain-share bound (RefinedWeb's core
    balancing stage) as a first-class CurationPipeline stage — the
    same durable SourceCountRegistry + monotone admit rule as the
    standalone CapPerSourceStream, run LAST so dedup state still
    covers everything seen and the cap only thins what is written."""

    def _batches(self, spark):
        def rows(rng, source):
            return [
                {**doc(i, GOOD + f" unique tail piece number {i} here"),
                 "source": source}
                for i in rng
            ]

        b1 = mk(spark, rows(range(0, 30), "big") + rows(range(100, 103), "small"))
        b2 = mk(spark, rows(range(30, 60), "big") + rows(range(103, 105), "small"))
        return b1, b2

    def test_capped_source_thinned_small_passes_whole(self, spark, tmp_path):
        b1, b2 = self._batches(spark)
        pipe = CurationPipeline(
            spark, str(tmp_path / "out"), max_per_source=10
        )
        pipe.process_batch(b1, 1)
        pipe.process_batch(b2, 2)
        per_src = {
            r["source"]: r["count"]
            for r in pipe.curated().groupBy("source").count().collect()
        }
        # at/under-cap source passes whole (u < 1 <= cap/N)
        assert per_src.get("small") == 5
        # the 60-doc source is provably thinned (expected ≈ cap plus
        # the greedy early-batch over-admission; far below 60)
        assert 1 <= per_src.get("big", 0) <= 30
        assert pipe.stats["rejected_srccap"] == 65 - per_src["small"] - per_src["big"]
        assert pipe.stats["kept"] == pipe.curated().count()
        # registry accumulated the post-gate counts cross-batch
        tot = {
            r["source"]: r["src_cnt"]
            for r in pipe._srccap.registry.totals().collect()
        }
        assert tot == {"big": 60, "small": 5}

    def test_replay_is_idempotent_with_cap(self, spark, tmp_path):
        b1, _ = self._batches(spark)
        pipe = CurationPipeline(
            spark, str(tmp_path / "out"), max_per_source=10
        )
        pipe.process_batch(b1, 1)
        kept1 = sorted(r.doc_id for r in pipe.curated().collect())
        n_rej1 = pipe.stats["rejected_srccap"]
        pipe.process_batch(b1, 1)  # at-least-once redelivery
        kept2 = sorted(r.doc_id for r in pipe.curated().collect())
        # the replay's survivors dedup away BEFORE the cap stage, so
        # nothing new is written and the registry count is unchanged
        # (content-derived batch id -> append no-ops)
        assert kept2 == kept1
        tot = {
            r["source"]: r["src_cnt"]
            for r in pipe._srccap.registry.totals().collect()
        }
        assert tot["big"] == 30
        assert pipe.stats["rejected_srccap"] == n_rej1

    def test_cli_max_per_source(self, tmp_path):
        from test_cli import run_cli

        rep = run_cli(
            "sync",
            "--from", "documents:/root/testdata/sf0.001",
            "--to", f"curated:{tmp_path / 'corpus'}",
            "--curate", "--max-per-source", "5",
            "--checkpoints", str(tmp_path / "ck"),
        )
        assert rep["caught_up"] is True
        s = rep["stats"]
        assert s["rejected_srccap"] > 0
        assert s["kept"] > 0
        assert s["seen"] == (
            s["kept"] + s["rejected_quality"] + s["rejected_repetition"]
            + s["deduped"] + s["rejected_srccap"]
        )

    def test_rethin_curated_converges_to_batch_bound(self, spark, tmp_path):
        """The curated store's offline convergence twin of retro_thin:
        re-filtering with the admit rule against the FINAL totals must
        equal the batch reference (cap_per_source_monotone over the
        gate/dedup survivor union) — provable here by running an
        uncapped pipeline over the same batches as the reference."""
        from propulsion_spark.streaming.source_cap import (
            cap_per_source_monotone,
        )

        b1, b2 = self._batches(spark)
        capped = CurationPipeline(
            spark, str(tmp_path / "cap"), max_per_source=10
        )
        plain = CurationPipeline(spark, str(tmp_path / "plain"))
        for i, b in enumerate((b1, b2)):
            capped.process_batch(b, i + 1)
            plain.process_batch(b, i + 1)
        rep = capped.rethin_curated()
        survivors = plain.curated().select("doc_id", "source")
        want = sorted(
            r["doc_id"]
            for r in cap_per_source_monotone(survivors, 10).collect()
        )
        got = sorted(r["doc_id"] for r in capped.curated().collect())
        assert got == want
        assert capped.stats["kept"] == len(got)
        rep2 = capped.rethin_curated()  # idempotent
        assert rep2["dropped"] == 0
