"""Round-15 fixes: the per-source count join is AQE-sized instead of
hint-forced (a raw-web crawl's 10^7–10^8 distinct domains must degrade
to a shuffle join, not OOM), repair passes gain empty-result guards and
partition-incremental resume, CurationPipeline grows the domain-cap
stage, and the keeper-registry streams get divergence gauges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestSourceCapJoinSizing:
    """r14 verdict #1: F.broadcast() on the per-source count table
    bypassed autoBroadcastJoinThreshold — correct at every tested
    scale, an executor OOM at the raw-web scale the operator exists
    for. The hint is gone; AQE picks by the aggregate's RUNTIME size."""

    def _docs(self, spark, n=40_000, n_src=20):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % n_src).cast("string").alias("source"),
        )

    def test_small_count_table_still_broadcasts(self, spark):
        """Bench-scale plan pin: with the default threshold, AQE must
        still choose a broadcast join for a curated corpus's tiny
        source table — dropping the hint must not cost the common case
        a shuffle."""
        from propulsion_spark.operators.textops import cap_per_source

        out = cap_per_source(self._docs(spark), 10)
        out.collect()
        assert "BroadcastHashJoin" in _plan(out)

    def test_monotone_rule_small_table_broadcasts(self, spark):
        from propulsion_spark.streaming.source_cap import (
            cap_per_source_monotone,
        )

        out = cap_per_source_monotone(self._docs(spark), 10)
        out.collect()
        assert "BroadcastHashJoin" in _plan(out)

    def test_oversized_count_table_degrades_to_shuffle(self, spark):
        """The raw-web regime, simulated by forbidding broadcast
        (threshold = -1 stands in for 'aggregate larger than the
        threshold'): the join must plan as a shuffle join and still
        produce the same rows — with the old forced hint this config
        still broadcast, which is exactly the OOM path."""
        from propulsion_spark.operators.textops import cap_per_source

        docs = self._docs(spark)
        expected = sorted(
            r["doc_id"] for r in cap_per_source(docs, 10).collect()
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = cap_per_source(docs, 10)
            rows = sorted(r["doc_id"] for r in out.collect())
            plan = _plan(out)
            assert "BroadcastHashJoin" not in plan
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            assert rows == expected  # strategy change, identical answer
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_high_cardinality_sources_without_hint(self, spark):
        """Every doc its own domain (the crawl's shape in miniature):
        200k distinct sources flow through without a forced broadcast,
        and every source at-or-under the cap passes whole."""
        from propulsion_spark.operators.textops import cap_per_source

        docs = spark.range(200_000).select(
            F.col("id").alias("doc_id"),
            F.col("id").cast("string").alias("source"),
        )
        assert cap_per_source(docs, 5).count() == 200_000

    def test_fresh_checkpoint_does_not_clobber_registry(
        self, spark, tmp_path
    ):
        """r14 advice: stream_into used to key registry appends by the
        checkpoint-relative micro-batch id, so re-ingesting through a
        FRESH checkpoint restarted ids at 1 and the dynamic partition
        overwrite REPLACED the first run's count rows — undercounted
        totals, silent over-admission. Content-derived ids
        (lineage.content_batch_id): same batch replayed → same id →
        idempotent no-op; new docs → new id → accumulate. Idempotence
        is per batch CONTENT, so the test pins file-granular triggers
        (maxFilesPerTrigger=1) — the reproducible-boundary shape the
        docstring prescribes for re-ingest."""
        from propulsion_spark.streaming.source_cap import CapPerSourceStream

        src = str(tmp_path / "src")
        docs = spark.range(1_000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 4).cast("string").alias("source"),
        )
        docs.coalesce(1).write.mode("append").parquet(src)
        pipe = CapPerSourceStream(spark, str(tmp_path / "reg"), 10)

        def run(ck: str) -> None:
            q = pipe.stream_into(
                spark.readStream.schema("doc_id long, source string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                str(tmp_path / "out"),
                str(tmp_path / ck),
            )
            q.awaitTermination(300)

        run("ck1")
        tot = {
            r["source"]: r["src_cnt"]
            for r in pipe.registry.totals().collect()
        }
        assert sum(tot.values()) == 1_000
        # FRESH checkpoint, same files: the old id scheme would reuse
        # _batch_id=1 and overwrite; content ids make it a replay no-op
        run("ck2")
        tot = {
            r["source"]: r["src_cnt"]
            for r in pipe.registry.totals().collect()
        }
        assert sum(tot.values()) == 1_000, "re-ingest must not clobber"
        # fresh checkpoint + NEW data: accumulates exactly the delta
        spark.range(1_000, 3_000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 4).cast("string").alias("source"),
        ).coalesce(1).write.mode("append").parquet(src)
        run("ck3")
        tot = {
            r["source"]: r["src_cnt"]
            for r in pipe.registry.totals().collect()
        }
        assert sum(tot.values()) == 3_000

    def test_stream_admit_join_unhinted(self, spark, tmp_path):
        """The streaming admit join and retro_thin carry no hint
        either: under a forbidden-broadcast conf both still run and
        converge to the batch reference."""
        from propulsion_spark.streaming.source_cap import (
            CapPerSourceStream,
            cap_per_source_monotone,
        )

        docs = spark.range(3_000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).cast("string").alias("source"),
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            scap = CapPerSourceStream(spark, str(tmp_path / "reg"), 50)
            scap.run_batch(
                docs.filter("doc_id % 2 = 0"), 1, str(tmp_path / "out")
            )
            scap.run_batch(
                docs.filter("doc_id % 2 = 1"), 2, str(tmp_path / "out")
            )
            scap.retro_thin(str(tmp_path / "out"))
            got = sorted(
                r["doc_id"]
                for r in spark.read.parquet(str(tmp_path / "out")).collect()
            )
            want = sorted(
                r["doc_id"]
                for r in cap_per_source_monotone(docs, 50).collect()
            )
            assert got == want
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


class TestSubstrStreamContentIds:
    def test_fresh_checkpoint_gram_registry_idempotent(
        self, spark, tmp_path
    ):
        """The substring stream's twin of the source-cap lineage fix:
        a fresh-checkpoint re-ingest of the same docs must leave the
        gram registry's totals unchanged (content ids → replay
        no-op), never undercounted or refused."""
        from propulsion_spark.streaming.substring_dedup import (
            SubstrDedupStream,
        )

        src = str(tmp_path / "src")
        docs = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog wins")
             for i in range(40)],
            "doc_id long, text string",
        )
        docs.coalesce(1).write.mode("append").parquet(src)
        pipe = SubstrDedupStream(spark, str(tmp_path / "reg"), n=8)

        def run(ck: str) -> None:
            q = pipe.stream_into(
                spark.readStream.schema("doc_id long, text string")
                .parquet(src),
                str(tmp_path / "out"),
                str(tmp_path / ck),
            )
            q.awaitTermination(300)

        run("ck1")
        tot1 = sorted(
            (r["gh"], r["cnt"]) for r in pipe.registry.totals().collect()
        )
        assert tot1  # the repeated sentence produced gram counts
        run("ck2")  # fresh checkpoint, same file
        tot2 = sorted(
            (r["gh"], r["cnt"]) for r in pipe.registry.totals().collect()
        )
        assert tot2 == tot1


class TestFanoutRefreshOnReadPaths:
    def test_serving_instance_picks_up_rebucket(self, spark, tmp_path):
        """r14 advice: a long-lived LexicalIndex serving queries must
        not keep routing with its construction-time fan-out after
        ANOTHER process runs a fenced compact(n_buckets=…) — the
        stale modulus silently misses postings. The query path now
        re-reads the persisted meta per query."""
        from propulsion_spark.pipelines.lexical_index import LexicalIndex

        path = str(tmp_path / "idx")
        serving = LexicalIndex.build(
            spark, "/root/testdata/sf0.001", path
        )
        before = sorted(
            (r["doc_id"], r["rank"])
            for r in serving.search(("hash", "tree"), k=20).collect()
        )
        assert len(before) == 20
        # another process rebuckets (fresh instance, same path)
        other = LexicalIndex(spark, path)
        old_nb = other.n_buckets_layout()
        other.compact(n_buckets=old_nb * 2)
        # the long-lived instance must serve identical results through
        # the NEW layout (stale cache → wrong buckets → missing rows)
        after = sorted(
            (r["doc_id"], r["rank"])
            for r in serving.search(("hash", "tree"), k=20).collect()
        )
        assert after == before
        assert serving.n_buckets_layout(refresh=True) == old_nb * 2


class TestFencingSchemeDispatch:
    def test_unknown_scheme_logs_caveat(self, caplog):
        """r14 advice: scheme dispatch was a denylist — any scheme not
        local and not a known object store was silently presented a
        HadoopLease as a REAL fence, including filesystems whose
        create-if-absent is client-side check-then-act. Unrecognized
        schemes now get a loud one-time caveat (the lease is still
        taken best-effort — strictly better than unfenced)."""
        import logging

        from propulsion_spark.pipelines import fencing

        fencing._warned_schemes.discard("dbfs")
        with caplog.at_level(logging.WARNING, logger=fencing.__name__):
            try:
                with fencing.index_lease("dbfs://root/idx", {}):
                    pass  # pragma: no cover - no dbfs fs in this env
            except Exception:
                pass  # the lease itself cannot resolve dbfs here
        assert any(
            "ASSUMES" in r.message and "dbfs" in r.message
            for r in caplog.records
        )

    def test_hdfs_allowlist_stays_silent(self):
        from propulsion_spark.pipelines import fencing

        assert "hdfs" in fencing.HDFS_SCHEMES
        assert "viewfs" in fencing.HDFS_SCHEMES
        # object stores keep the unfenced warning path, not the lease
        assert "s3a" in fencing.OBJECT_STORE_SCHEMES


class TestIncrementalRepair:
    """r14 verdict #4: retro_mask/retro_thin rewrote the whole emitted
    output in one static overwrite — at a 100 TB output the blast
    radius of one failed job was the entire corpus rewrite. The shared
    kernel (streaming/repair.py) iterates _batch_id partitions with
    dynamic overwrite, resumable from a marker keyed by the registry's
    content fingerprint."""

    def _docs(self, spark, lo, hi, n_src=3):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % n_src).cast("string").alias("source"),
        )

    def _pipe(self, spark, tmp_path, cap=8):
        from propulsion_spark.streaming.source_cap import CapPerSourceStream

        return CapPerSourceStream(spark, str(tmp_path / "reg"), cap)

    def test_crash_mid_repair_resumes_without_rewriting(
        self, spark, tmp_path, monkeypatch
    ):
        """Crash injected while repairing the second partition: the
        first partition's marker survives, resume skips it (its files
        untouched — asserted by mtime), and the final output still
        equals the batch reference."""
        import glob
        import os

        from propulsion_spark.streaming import repair
        from propulsion_spark.streaming.source_cap import (
            cap_per_source_monotone,
        )

        out = str(tmp_path / "out")
        b1, b2, b3 = (
            self._docs(spark, 0, 400),
            self._docs(spark, 400, 1200),
            self._docs(spark, 1200, 2400),
        )
        pipe = self._pipe(spark, tmp_path)
        for i, b in enumerate((b1, b2, b3)):
            pipe.run_batch(b, i + 1, out)

        real_write = repair._write_marker
        calls = {"n": 0}

        def crash_on_second(*a, **k):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected crash mid-repair")
            return real_write(*a, **k)

        monkeypatch.setattr(repair, "_write_marker", crash_on_second)
        with pytest.raises(RuntimeError, match="injected"):
            pipe.retro_thin(out)
        monkeypatch.undo()
        # partition 1 was repaired and marked; record its file mtimes
        p1 = sorted(glob.glob(os.path.join(out, "_batch_id=1", "*")))
        assert p1
        mtimes = {f: os.path.getmtime(f) for f in p1}
        rep = pipe.retro_thin(out)  # resume
        assert rep["skipped"] == 1  # partition 1 not re-repaired
        assert rep["repaired"] == 2
        assert {f: os.path.getmtime(f) for f in p1} == mtimes
        union = b1.unionByName(b2).unionByName(b3)
        want = sorted(
            r["doc_id"]
            for r in cap_per_source_monotone(union, pipe.cap).collect()
        )
        got = sorted(
            r["doc_id"] for r in spark.read.parquet(out).collect()
        )
        assert got == want

    def test_resume_row_stats_cover_only_pending(
        self, spark, tmp_path, monkeypatch
    ):
        """rows_before / rows_after on a RESUMED repair count only the
        pending partitions — pins the r15 one-job upfront pre-repair
        count (which must exclude resumed-over partitions) against the
        crash-resume path."""
        from propulsion_spark.streaming import repair

        out = str(tmp_path / "out")
        pipe = self._pipe(spark, tmp_path)
        for i, b in enumerate(
            (
                self._docs(spark, 0, 400),
                self._docs(spark, 400, 1200),
                self._docs(spark, 1200, 2400),
            )
        ):
            pipe.run_batch(b, i + 1, out)

        real_write = repair._write_marker
        calls = {"n": 0}

        def crash_on_second(*a, **k):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected crash mid-repair")
            return real_write(*a, **k)

        monkeypatch.setattr(repair, "_write_marker", crash_on_second)
        with pytest.raises(RuntimeError, match="injected"):
            pipe.retro_thin(out)
        monkeypatch.undo()
        # partition 1 repaired + marked; 2 and 3 pending. The resume's
        # rows_before must equal THEIR current rows (not the whole
        # output's), exactly what the kernel's upfront count reads.
        exp_before = (
            spark.read.parquet(out)
            .filter(F.col("_batch_id").isin([2, 3]))
            .count()
        )
        rep = pipe.retro_thin(out)
        assert rep["skipped"] == 1 and rep["repaired"] == 2
        assert rep["rows_before"] == exp_before
        kept = (
            spark.read.parquet(out)
            .filter(F.col("_batch_id").isin([2, 3]))
            .count()
        )
        assert rep["rows_after"] == kept
        # (no drop delta asserted: the crashed attempt already thinned
        # partition 2 before failing its marker write, and the LAST
        # batch was admitted against final counts — idempotent resume
        # legitimately finds nothing left to drop)

    def test_registry_growth_invalidates_marker(self, spark, tmp_path):
        """A registry that ingested more batches after a completed
        repair changes the fingerprint: the next repair must re-visit
        every partition (skipping would freeze verdicts made under
        stale counts)."""
        out = str(tmp_path / "out")
        pipe = self._pipe(spark, tmp_path)
        pipe.run_batch(self._docs(spark, 0, 600), 1, out)
        rep1 = pipe.retro_thin(out)
        assert rep1["repaired"] == 1
        rep_again = pipe.retro_thin(out)
        assert rep_again["skipped"] == 1 and rep_again["repaired"] == 0
        # counts grow → fp changes → full re-repair
        pipe.run_batch(self._docs(spark, 600, 1800), 2, out)
        rep2 = pipe.retro_thin(out)
        assert rep2["skipped"] == 0 and rep2["repaired"] == 2

    def test_all_dropped_output_is_removed_not_poisoned(
        self, spark, tmp_path
    ):
        """r14 advice: retro_thin with a tiny cap can drop EVERY
        emitted row; the old static overwrite then left a file-less
        partitioned dir (unreadable). The all-dropped repair now
        deletes the output path outright — absent is honestly
        empty."""
        import os

        from propulsion_spark.streaming.source_cap import (
            SourceCountRegistry,
        )

        out = str(tmp_path / "out")
        pipe = self._pipe(spark, tmp_path, cap=1)
        pipe.run_batch(self._docs(spark, 0, 300, n_src=1), 1, out)
        assert os.path.exists(out)
        # inflate the source's count so cap/N ~ 3e-9: the final rule
        # admits (essentially) nothing the stream emitted
        reg = SourceCountRegistry(spark, str(tmp_path / "reg"))
        reg.append_counts(
            spark.createDataFrame(
                [("0", 300_000_000)], "source string, cnt long"
            ),
            99,
        )
        rep = pipe.retro_thin(out)
        assert rep["rows_after"] == 0
        assert rep["deleted_partitions"] == 1
        assert not os.path.exists(out)

    def test_run_batch_all_dropped_skips_write(self, spark, tmp_path):
        """The ingest-side twin (r14 advice): a batch whose admitted
        set is empty (cap=1 against an already-huge source) must not
        zero-row-partitionBy-poison a fresh out_path — no dir, no
        crash, registry still counted the batch."""
        import os

        from propulsion_spark.streaming.source_cap import (
            SourceCountRegistry,
        )

        reg = SourceCountRegistry(spark, str(tmp_path / "reg"))
        reg.append_counts(
            spark.createDataFrame(
                [("0", 300_000_000)], "source string, cnt long"
            ),
            99,
        )
        out = str(tmp_path / "out")
        pipe = self._pipe(spark, tmp_path, cap=1)
        pipe.run_batch(self._docs(spark, 0, 200, n_src=1), 1, out)
        assert not os.path.exists(out)
        assert pipe.stats["seen"] == 200
        assert pipe.stats["admitted"] == 0
        tot = {
            r["source"]: r["src_cnt"]
            for r in pipe.registry.totals().collect()
        }
        assert tot["0"] == 300_000_200


class TestKeeperRegistryDivergenceGauges:
    """r14 verdict #3: retro_mask/retro_thin repair their streams
    exactly, but NO drop-only repair can converge SemDedupStream or
    MediaDedupStream to the batch operator — the batch rule's
    witnesses include docs the stream dropped and whose
    vectors/fingerprints are retained NOWHERE (module docs carry the
    argument). These tests demonstrate the impossibility concretely
    and pin the shipped divergence gauge (`keeper_inversions`)."""

    def _codebook(self, spark):
        import pandas as pd

        from propulsion_spark.operators.similarity import centroids_frame

        seed = spark.createDataFrame(
            pd.DataFrame(
                [
                    (100, [1.0, 0.0, 0.0], 0),
                    (101, [0.9, 0.1, 0.0], 0),
                    (102, [0.0, 0.0, 1.0], 1),
                    (103, [0.0, 0.1, 0.9], 1),
                ],
                columns=["vec_id", "embedding", "label"],
            ),
            "vec_id long, embedding array<float>, label int",
        )
        return centroids_frame(seed)

    def _emb_docs(self, spark, rows):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "embedding"]),
            "doc_id long, embedding array<float>",
        )

    def test_sem_representative_inversion_gauged(self, spark, tmp_path):
        """Late-arriving LOWER id within ε of an earlier keeper: the
        stream drops it (first-writer-wins), the batch operator keeps
        it and drops the keeper instead. The dropped doc's row is in
        no output — unrepairable — and the gauge counts exactly 1."""
        from propulsion_spark.operators.similarity import (
            assign_cells,
            normed_frame,
            semdedup_verdicts,
        )
        from propulsion_spark.pipelines import SemDedupStream

        s = SemDedupStream(
            spark, str(tmp_path / "reg"), self._codebook(spark),
            threshold=0.95,
        )
        b1 = self._emb_docs(spark, [(10, [1.0, 0.0, 0.0])])
        b2 = self._emb_docs(spark, [(5, [0.99, 0.01, 0.0])])
        out1 = [r.doc_id for r in s.process_batch(b1, 0).collect()]
        out2 = [r.doc_id for r in s.process_batch(b2, 1).collect()]
        assert out1 == [10] and out2 == []
        assert s.stats["keeper_inversions"] == 1
        # the batch operator's answer over the union: keep 5, drop 10
        union = b1.unionByName(b2).withColumnRenamed("doc_id", "vec_id")
        dropped = {
            r["b_id"]
            for r in semdedup_verdicts(
                normed_frame(union),
                assign_cells(union, self._codebook(spark)),
                threshold=0.95,
            ).collect()
        }
        assert dropped == {10}
        # stream emitted {10}; batch keeps {5}: a drop-only repair of
        # the emitted output can never produce 5 — its row is gone

    def test_sem_chain_overadmission_is_unrepairable(self, spark, tmp_path):
        """The 3-doc chain from the module doc: ids X<Y<Z with
        cos(X,Y) ≥ τ ≥ cos(Y,Z), cos(X,Z) < τ, arriving Z, Y, X. The
        stream emits {Z, X} — pairwise NON-duplicate, so a repair has
        nothing to drop — while the batch keeps only {X} (Z falls via
        the DROPPED witness Y, whose vector survives nowhere)."""
        import math

        from propulsion_spark.operators.similarity import (
            assign_cells,
            normed_frame,
            semdedup_verdicts,
        )
        from propulsion_spark.pipelines import SemDedupStream

        def on_arc(deg):
            r = math.radians(deg)
            return [math.cos(r), math.sin(r), 0.0]

        X, Y, Z = on_arc(0), on_arc(18), on_arc(36)
        # cos(X,Y)=cos(Y,Z)=cos18° ≈ .951 ≥ τ; cos(X,Z)=cos36° ≈ .809 < τ
        s = SemDedupStream(
            spark, str(tmp_path / "reg"), self._codebook(spark),
            threshold=0.95,
        )
        outs = []
        for bid, (i, v) in enumerate([(3, Z), (2, Y), (1, X)]):
            outs += [
                r.doc_id
                for r in s.process_batch(
                    self._emb_docs(spark, [(i, v)]), bid
                ).collect()
            ]
        assert sorted(outs) == [1, 3]  # stream: Z admitted, Y dropped, X admitted
        assert s.stats["keeper_inversions"] == 1  # Y(2) dropped vs Z(3)
        union = self._emb_docs(
            spark, [(1, X), (2, Y), (3, Z)]
        ).withColumnRenamed("doc_id", "vec_id")
        dropped = {
            r["b_id"]
            for r in semdedup_verdicts(
                normed_frame(union),
                assign_cells(union, self._codebook(spark)),
                threshold=0.95,
            ).collect()
        }
        assert dropped == {2, 3}  # batch keeps only X — Z via witness Y
        # the emitted pair (1, 3) is NOT an ε-pair (cos .809 < .95):
        # nothing a drop-only pass could remove, yet the sets differ
        # — the documented impossibility, demonstrated

    def test_media_inversion_gauged(self, spark, tmp_path):
        """The media twin: a late-arriving lower id whose fingerprint
        sits inside an earlier keeper's hamming ball is dropped and
        counted; the batch CC answer keeps the min id instead."""
        from pyspark.sql import functions as F

        from tests.test_multimodal_real import _media_df
        from tests.test_perceptual import rand_img, to_bmp
        from propulsion_spark.pipelines.media_dedup import MediaDedupStream

        eng = MediaDedupStream(spark, str(tmp_path / "reg"))
        g = rand_img(77)

        def batch(rows):
            return _media_df(spark, rows).select(
                "doc_id", "media", F.col("meta.media_type").alias("media_type")
            )

        out = str(tmp_path / "kept")
        eng.run_batch(
            batch([(11, bytearray(to_bmp(g)), ("image/bmp", 0, 0))]), 1, out
        )
        # same image re-encoded with a brightness shift → same pHash
        # ball; id 5 < keeper 11
        eng.run_batch(
            batch([(5, bytearray(to_bmp(g + 14.0)), ("image/bmp", 0, 0))]),
            2,
            out,
        )
        kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert kept == {11}
        assert eng.stats["deduped_cross_batch"] == 1
        assert eng.stats["keeper_inversions"] == 1


class TestAllDroppedBatchWriteGuards:
    """Parity with the srccap/substr streams' r15 guards: a batch
    whose survivors ALL dedup away must not zero-row-partitionBy a
    fresh out_path into an unreadable dir."""

    def test_semdedup_all_dropped_batch(self, spark, tmp_path):
        import os

        import pandas as pd

        from propulsion_spark.operators.similarity import centroids_frame
        from propulsion_spark.pipelines import SemDedupStream

        seed = spark.createDataFrame(
            pd.DataFrame(
                [(100, [1.0, 0.0, 0.0], 0), (102, [0.0, 0.0, 1.0], 1)],
                columns=["vec_id", "embedding", "label"],
            ),
            "vec_id long, embedding array<float>, label int",
        )
        s = SemDedupStream(
            spark, str(tmp_path / "reg"), centroids_frame(seed),
            threshold=0.9,
        )

        def docs(rows):
            return spark.createDataFrame(
                pd.DataFrame(rows, columns=["doc_id", "embedding"]),
                "doc_id long, embedding array<float>",
            )

        out_a = str(tmp_path / "out_a")
        s.run_batch(docs([(1, [1.0, 0.0, 0.0])]), 1, out_a)
        # a FRESH out path whose whole batch is a cross-batch dup
        out_b = str(tmp_path / "out_b")
        s.run_batch(docs([(2, [0.99, 0.01, 0.0])]), 2, out_b)
        assert not os.path.exists(out_b)  # skipped, not poisoned
        assert s.stats["deduped_cross_batch"] == 1
        # an empty micro-batch is skipped outright
        s.run_batch(docs([]), 3, out_b)
        assert not os.path.exists(out_b)

    def test_media_all_dropped_batch(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F

        from tests.test_multimodal_real import _media_df
        from tests.test_perceptual import rand_img, to_bmp
        from propulsion_spark.pipelines.media_dedup import MediaDedupStream

        eng = MediaDedupStream(spark, str(tmp_path / "reg"))
        g = rand_img(5)

        def batch(rows):
            return _media_df(spark, rows).select(
                "doc_id", "media", F.col("meta.media_type").alias("media_type")
            )

        out_a = str(tmp_path / "out_a")
        eng.run_batch(
            batch([(1, bytearray(to_bmp(g)), ("image/bmp", 0, 0))]), 1, out_a
        )
        out_b = str(tmp_path / "out_b")
        eng.run_batch(
            batch([(2, bytearray(to_bmp(g + 9.0)), ("image/bmp", 0, 0))]),
            2,
            out_b,
        )
        assert not os.path.exists(out_b)
        assert eng.stats["deduped_cross_batch"] == 1


class TestUnhintedScaledBroadcasts:
    """r15 sweep of the cap_per_source rationale across the repo's
    remaining F.broadcast() hints on SF/corpus-SCALED tables (kNN
    labels, TPC-H supplier/part, the index watermark table, the
    per-stream wp/req tables): unhinted, AQE still broadcasts them at
    bench scale — pinned here — and degrades to a shuffle at 100 TB
    instead of bypassing the threshold into an OOM. Hints that remain
    are bounded by construction (query sets, codebooks, 1-row stats,
    nation/region's constant 25/5 rows, size-guarded CC)."""

    def test_write_pos_dedup_still_broadcasts_at_bench_scale(self, spark):
        from propulsion_spark.operators import load_all

        out = load_all()["write_pos_dedup"].build(
            spark, "/root/testdata/sf0.001"
        )
        out.collect()
        assert "BroadcastHashJoin" in _plan(out)

    def test_knn_labels_still_broadcast_at_bench_scale(self, spark):
        from propulsion_spark.operators import load_all

        out = load_all()["embedding_knn_classify"].build(
            spark, "/root/testdata/sf0.001"
        )
        out.collect()
        assert "BroadcastHashJoin" in _plan(out)


class TestChunkedRepair:
    def test_chunked_equals_per_partition_with_all_dropped_member(
        self, spark, tmp_path
    ):
        """chunk_size>1 repairs K partitions per dynamic overwrite —
        identical result to per-partition repair, including a chunk
        member whose rows ALL drop (its stale dir must be deleted;
        the overwrite alone would leave it alive)."""
        from propulsion_spark.streaming.source_cap import (
            CapPerSourceStream,
            SourceCountRegistry,
            cap_per_source_monotone,
        )

        def docs(lo, hi, src):
            return spark.range(lo, hi).select(
                F.col("id").alias("doc_id"), F.lit(src).alias("source")
            )

        out = str(tmp_path / "out")
        pipe = CapPerSourceStream(spark, str(tmp_path / "reg"), 8)
        pipe.run_batch(docs(0, 50, "a"), 1, out)
        # batch 2 is SINGLE-source 'kill' — we will inflate its count
        # so the final rule drops the whole partition
        pipe.run_batch(docs(100, 140, "kill"), 2, out)
        pipe.run_batch(docs(200, 260, "a"), 3, out)
        SourceCountRegistry(spark, str(tmp_path / "reg")).append_counts(
            spark.createDataFrame(
                [("kill", 400_000_000)], "source string, cnt long"
            ),
            99,
        )
        rep = pipe.retro_thin(out, chunk_size=2)
        assert rep["repaired"] == 3
        assert rep["deleted_partitions"] == 1  # the 'kill' partition
        import os

        assert not os.path.exists(os.path.join(out, "_batch_id=2"))
        got = sorted(
            r["doc_id"] for r in spark.read.parquet(out).collect()
        )
        union = (
            docs(0, 50, "a")
            .unionByName(docs(100, 140, "kill"))
            .unionByName(docs(200, 260, "a"))
            .unionByName(docs(1_000_000, 400_000_000 + 1_000_000 - 40, "kill").limit(0))
        )
        # batch reference: same totals the registry holds (kill source
        # inflated) — emulate by filtering with the admit rule directly
        from propulsion_spark.streaming.source_cap import _admit_expr

        tot = pipe.registry.totals().withColumnRenamed("source", "source")
        want = sorted(
            r["doc_id"]
            for r in union.join(tot, "source")
            .filter(_admit_expr(8, "-srccap"))
            .collect()
        )
        assert got == want


class TestFoldedReplayBucketFallback:
    """r15 optimization: per-batch bucket lists come from the batch's
    just-written (_batch_id, _bkt) partition dirs (one driver FS
    listing, no Spark job). A replay of a batch compact() already
    FOLDED finds no dirs (append no-ops via the ledger) and must fall
    back to deriving the list from the batch itself — the
    register-then-read replay contract, now exercising the fallback."""

    def test_substr_folded_replay_masks_identically(self, spark, tmp_path):
        from propulsion_spark.streaming.substring_dedup import (
            SubstrDedupStream,
        )

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta one two three four tail a"),
                (2, "alpha beta gamma delta one two three four tail b"),
                (3, "unrelated text with no repeats at all here okay"),
            ],
            "doc_id long, text string",
        )
        sub = SubstrDedupStream(spark, str(tmp_path / "reg"), n=8, min_dup=2)
        first = {
            r["doc_id"]: r["text"]
            for r in sub.process_batch(docs, 1).collect()
        }
        sub.registry.compact()  # folds batch 1 into generation 0
        # replay of the folded batch: append no-ops, its dirs are gone,
        # the bucket list must come from the fallback derivation
        replay = {
            r["doc_id"]: r["text"]
            for r in sub.process_batch(docs, 1).collect()
        }
        assert replay == first

    def test_srccap_folded_replay_admits_identically(self, spark, tmp_path):
        from propulsion_spark.streaming.source_cap import CapPerSourceStream

        docs = spark.createDataFrame(
            [(i, "s%d" % (i % 3)) for i in range(60)],
            "doc_id long, source string",
        )
        cap = CapPerSourceStream(spark, str(tmp_path / "reg"), 5)
        first = sorted(
            r["doc_id"] for r in cap.process_batch(docs, 1).collect()
        )
        cap.registry.compact()
        replay = sorted(
            r["doc_id"] for r in cap.process_batch(docs, 1).collect()
        )
        assert replay == first
