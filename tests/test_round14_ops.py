"""Round-14 fixes: resolution-free per-source cap (the basis-points
rate floored to zero on mega-sources), persisted bucket fan-outs,
fold-ledger write ordering, and the streaming-substring mask-debt
gauge + retro repair pass."""

from __future__ import annotations

import os

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


def _counts_df(spark, rows):
    return spark.createDataFrame(
        rows, "gh long, gh2 int, cnt long, first_doc long, first_start long"
    )


def _docs(spark, lo=0, hi=50):
    return (
        load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )


def _vecs(spark, lo=0, hi=50):
    return (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
    )


class TestFoldLedgerOrdering:
    """r13 advice: the fold marker/ledger must be durable BEFORE the
    overwrite that absorbs the batches — a crash between the two must
    leave either (a) batches intact + already guarded (replays no-op,
    next compact redoes the fold) or never (b) folded data with no
    replay guard (a replayed batch re-appending next to the fold:
    double-counted grams / tf, duplicate vectors)."""

    def test_gram_compact_writes_ledger_before_overwrite(
        self, spark, tmp_path, monkeypatch
    ):
        from propulsion_spark.pipelines import lineage
        from propulsion_spark.streaming.substring_dedup import GramRegistry

        reg = GramRegistry(spark, str(tmp_path / "g"))
        reg.append_counts(_counts_df(spark, [(1, 0, 2, 10, 0)]), 1)
        reg.append_counts(_counts_df(spark, [(1, 0, 3, 11, 0)]), 2)

        def boom(*a, **k):
            raise RuntimeError("crash before the fold overwrite")

        monkeypatch.setattr(lineage, "record_folded_ids", boom)
        with pytest.raises(RuntimeError, match="crash"):
            reg.compact()
        monkeypatch.undo()
        # ledger write failed FIRST -> the batch partitions are intact
        assert reg.n_batches() == 2
        got = {r["gh"]: r["cnt"] for r in reg.totals().collect()}
        assert got == {1: 5}

    def test_gram_crash_after_ledger_is_safe_and_redone(self, spark, tmp_path):
        """The other half of the window, constructed directly: ledger
        recorded, overwrite never ran. A replay of the ledgered batch
        must no-op (its partitions still exist, identical), totals stay
        correct, and the NEXT compact simply completes the fold."""
        from propulsion_spark.pipelines.lineage import record_folded_ids
        from propulsion_spark.streaming.substring_dedup import GramRegistry

        reg = GramRegistry(spark, str(tmp_path / "g2"))
        reg.append_counts(_counts_df(spark, [(7, 0, 2, 10, 0)]), 1)
        reg.append_counts(_counts_df(spark, [(7, 0, 3, 11, 0)]), 2)
        record_folded_ids(spark, reg.path, [1, 2])  # crashed fold's ledger
        # at-least-once replay of a ledgered batch: no-op, not a double
        reg.append_counts(_counts_df(spark, [(7, 0, 2, 10, 0)]), 1)
        assert {r["gh"]: r["cnt"] for r in reg.totals().collect()} == {7: 5}
        reg.compact()  # the redo
        assert reg.n_batches() == 1
        assert {r["gh"]: r["cnt"] for r in reg.totals().collect()} == {7: 5}

    def test_lexical_compact_marks_before_overwrite(
        self, spark, tmp_path, monkeypatch
    ):
        from propulsion_spark.pipelines import lineage
        from propulsion_spark.pipelines.lexical_index import LexicalIndex

        idx = LexicalIndex.build_from(spark, _docs(spark, 0, 30), str(tmp_path / "lex"))
        idx.append(_docs(spark, 30, 60), batch_id=1)
        calls = {"n": 0}
        real = lineage.record_fold

        def boom(*a, **k):
            calls["n"] += 1
            raise RuntimeError("crash before the fold overwrite")

        monkeypatch.setattr(lineage, "record_fold", boom)
        with pytest.raises(RuntimeError, match="crash"):
            idx.compact()
        monkeypatch.setattr(lineage, "record_fold", real)
        # marker write failed FIRST -> both batch partition sets intact
        assert calls["n"] == 1
        assert idx.n_batches() == 2
        idx.compact()  # the redo converges
        assert idx.n_batches() == 1

    def test_ann_reindex_marks_before_overwrite(
        self, spark, tmp_path, monkeypatch
    ):
        from propulsion_spark.pipelines import lineage
        from propulsion_spark.pipelines.ann_index import AnnIndex

        idx = AnnIndex.build_from(spark, _vecs(spark, 0, 40), str(tmp_path / "ann"))
        idx.append(_vecs(spark, 40, 60), batch_id=1)
        real = lineage.record_fold

        def boom(*a, **k):
            raise RuntimeError("crash before the fold overwrite")

        monkeypatch.setattr(lineage, "record_fold", boom)
        with pytest.raises(RuntimeError, match="crash"):
            idx.reindex()
        monkeypatch.setattr(lineage, "record_fold", real)
        assert idx.n_batches() == 2  # vectors untouched
        idx.reindex()
        assert idx.n_batches() == 1


class TestDestBuildLease:
    """r13 advice: a successor build (compact(dest=)/reindex(dest=))
    writes the DEST's stores and fold marker, so it must hold the
    dest root's lease too — acquired in sorted-path order."""

    def test_lexical_dest_build_fenced_against_dest_mutators(
        self, spark, tmp_path
    ):
        from propulsion_spark.pipelines.lexical_index import LexicalIndex
        from propulsion_spark.streaming.mvcc import FileLease

        src = LexicalIndex.build_from(
            spark, _docs(spark, 0, 30), str(tmp_path / "a_src")
        )
        src.lease_timeout_s = 2.0
        dest = str(tmp_path / "b_dest")
        os.makedirs(dest)
        with FileLease(dest, ttl_s=30.0):
            with pytest.raises(TimeoutError, match="lease"):
                src.compact(dest=dest)
        out = src.compact(dest=dest)  # released -> proceeds
        assert out.n_batches() == 1

    def test_ann_dest_build_fenced_against_dest_mutators(
        self, spark, tmp_path
    ):
        from propulsion_spark.pipelines.ann_index import AnnIndex
        from propulsion_spark.streaming.mvcc import FileLease

        src = AnnIndex.build_from(
            spark, _vecs(spark, 0, 40), str(tmp_path / "a_src")
        )
        src.lease_timeout_s = 2.0
        dest = str(tmp_path / "b_dest")
        os.makedirs(dest)
        with FileLease(dest, ttl_s=30.0):
            with pytest.raises(TimeoutError, match="lease"):
                src.reindex(dest=dest)
        out = src.reindex(dest=dest)
        assert out.n_batches() == 1


class TestAnnAutoCompactLiveShare:
    def test_share_uses_live_ids_not_stored_versions(self, spark, tmp_path):
        """r13 advice: superseded duplicate versions of re-appended
        vec_ids must not inflate the tombstone-share denominator.
        40 live ids, 40 re-appended (superseded) versions, 10 deleted:
        share = 10/40 = 0.25, NOT 10/80 = 0.125 — the policy at
        max_tombstone_share=0.2 must trigger."""
        from propulsion_spark.pipelines.ann_index import AnnIndex

        idx = AnnIndex.build_from(spark, _vecs(spark, 0, 40), str(tmp_path / "ann"))
        idx.append(_vecs(spark, 0, 40), batch_id=1)  # superseded copies
        idx.delete(list(range(10)))
        rep = idx.auto_compact(max_batches=99, max_tombstone_share=0.2)
        assert rep is not None
        assert rep["tombstone_share_before"] == pytest.approx(0.25)


class TestPersistedFanout:
    """r13 verdict #1: bucket fan-outs are layout DATA, persisted in
    the store root (store_meta), validated on open, re-bucketed only
    inside the fenced compact/rebucket — a changed module constant
    over an existing layout must never silently mis-prune."""

    def test_gram_registry_persist_validate_rebucket(self, spark, tmp_path):
        from propulsion_spark.streaming.substring_dedup import GramRegistry

        path = str(tmp_path / "g")
        reg = GramRegistry(spark, path, n_buckets=4)
        reg.append_counts(
            _counts_df(spark, [(g, 0, 2, g, 0) for g in range(8)]), 1
        )
        reg.append_counts(
            _counts_df(spark, [(g, 0, 3, g + 1, 0) for g in range(8)]), 2
        )
        # a plain reopen adopts the persisted fan-out
        assert GramRegistry(spark, path).n_buckets() == 4
        # a conflicting explicit open raises — read AND write paths
        bad = GramRegistry(spark, path, n_buckets=8)
        with pytest.raises(ValueError, match="n_buckets=4"):
            bad.n_buckets()
        with pytest.raises(ValueError, match="n_buckets=4"):
            bad.append_counts(_counts_df(spark, [(9, 0, 1, 9, 0)]), 3)
        before = {
            r["gh"]: (r["cnt"], r["first_doc"])
            for r in reg.totals().collect()
        }
        # the sanctioned fan-out change: the fenced rebucketing fold
        reg.compact(n_buckets=8)
        re2 = GramRegistry(spark, path)
        assert re2.n_buckets() == 8
        after = {
            r["gh"]: (r["cnt"], r["first_doc"])
            for r in re2.totals().collect()
        }
        assert after == before
        # pruned-read parity at the NEW fan-out: routing by the stored
        # modulus finds every gram the full read finds
        for g in range(8):
            got = {
                r["gh"]
                for r in re2.totals(buckets=[g % 8]).collect()
            }
            assert g in got

    def test_gram_totals_read_partition_pruned(self, spark, tmp_path):
        """VERDICT r13 #6: the bucket-pruned totals read touches only
        the requested _bkt partitions — pinned on PartitionFilters in
        the executed plan AND on the files execution reads, the way
        the lexical/ANN reads are pinned."""
        from propulsion_spark.streaming.substring_dedup import GramRegistry

        path = str(tmp_path / "g")
        reg = GramRegistry(spark, path, n_buckets=4)
        reg.append_counts(
            _counts_df(spark, [(g, 0, 2, g, 0) for g in range(8)]), 1
        )
        pruned = reg.totals(buckets=[1])
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "_bkt" in plan.split(
            "PartitionFilters", 1
        )[1][:200]
        files = {
            r["f"]
            for r in reg._read()
            .filter(F.col("_bkt") == 1)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
        assert files and all("_bkt=1" in f for f in files)
        all_files = set(reg._read().inputFiles())
        assert len(files) < len(all_files)

    def test_gram_legacy_registry_defaults(self, spark, tmp_path):
        """A registry built before the meta file (simulated by removing
        it) resolves to the frozen module default — the value its
        partitions were in fact built with."""
        from propulsion_spark.streaming import substring_dedup as sd

        path = str(tmp_path / "g")
        reg = sd.GramRegistry(spark, path)
        reg.append_counts(_counts_df(spark, [(1, 0, 2, 1, 0)]), 1)
        os.remove(str(tmp_path / "g" / "layout_meta.json"))
        assert sd.GramRegistry(spark, path).n_buckets() == sd.N_BUCKETS

    def test_lexical_two_fanouts_same_answers(self, spark, tmp_path):
        from propulsion_spark.pipelines.lexical_index import LexicalIndex

        docs = _docs(spark, 0, 120)
        a = LexicalIndex.build_from(spark, docs, str(tmp_path / "a"))
        b = LexicalIndex.build_from(
            spark, docs, str(tmp_path / "b"), n_buckets=8
        )
        assert a.n_buckets_layout() == 64 and b.n_buckets_layout() == 8
        terms = ("hash", "tree")
        want = sorted(
            (r["doc_id"], r["rank"]) for r in a.search(terms).collect()
        )
        got = sorted(
            (r["doc_id"], r["rank"]) for r in b.search(terms).collect()
        )
        assert got == want and want
        # reopen adopts; conflicting open raises before any mis-routed
        # read or mis-bucketed write
        assert LexicalIndex(spark, str(tmp_path / "b")).n_buckets_layout() == 8
        bad = LexicalIndex(spark, str(tmp_path / "b"), n_buckets=16)
        with pytest.raises(ValueError, match="n_buckets=8"):
            bad.search(terms)
        with pytest.raises(ValueError, match="n_buckets=8"):
            bad.append(_docs(spark, 120, 130), batch_id=1)
        # fenced rebucket: layout flips, answers don't
        b.compact(n_buckets=16)
        re2 = LexicalIndex(spark, str(tmp_path / "b"))
        assert re2.n_buckets_layout() == 16
        assert sorted(
            (r["doc_id"], r["rank"]) for r in re2.search(terms).collect()
        ) == want
        buckets_on_disk = {
            d
            for d in os.listdir(str(tmp_path / "b" / "postings" / "_batch_id=0"))
            if d.startswith("bucket=")
        }
        assert buckets_on_disk and all(
            int(d.split("=")[1]) < 16 for d in buckets_on_disk
        )

    def test_semdedup_registry_persist_validate_rebucket(
        self, spark, tmp_path
    ):
        from propulsion_spark.pipelines.semantic_dedup import _SemVecTable

        path = str(tmp_path / "sem")
        t = _SemVecTable(spark, path, n_buckets=4)
        rows = spark.createDataFrame(
            [(c, c * 10, [0.1 * c, 0.2], 1.0) for c in range(6)],
            _SemVecTable.SCHEMA,
        )
        t.register(rows)
        assert _SemVecTable(spark, path).n_buckets() == 4
        bad = _SemVecTable(spark, path, n_buckets=8)
        with pytest.raises(ValueError, match="n_buckets=4"):
            bad.n_buckets()
        # pruned routing at the stored fan-out finds every keeper
        t2 = _SemVecTable(spark, path)
        for c in range(6):
            got = {r["keeper"] for r in t2.read_buckets([c % 4]).collect()}
            assert c * 10 in got
        t2.rebucket(8)
        re2 = _SemVecTable(spark, path)
        assert re2.n_buckets() == 8
        for c in range(6):
            got = {r["keeper"] for r in re2.read_buckets([c % 8]).collect()}
            assert c * 10 in got
        assert re2.read().count() == 6


class TestCliNBuckets:
    def test_lex_build_compact_rebucket_and_policy_guard(
        self, spark, tmp_path
    ):
        from test_cli import run_cli

        from propulsion_spark.pipelines.lexical_index import LexicalIndex

        path = str(tmp_path / "lexnb")
        run_cli(
            "lex", "build", "--path", path, "--sf-dir", SF,
            "--n-buckets", "8",
        )
        assert LexicalIndex(spark, path).n_buckets_layout() == 8
        run_cli("lex", "compact", "--path", path, "--n-buckets", "16")
        assert LexicalIndex(spark, path).n_buckets_layout() == 16
        # policy mode never re-buckets: combining the flags errors
        rep = run_cli(
            "lex", "compact", "--path", path,
            "--max-batches", "5", "--n-buckets", "8",
            expect_rc=2,
        )
        assert "never re-buckets" in rep["error"]


class TestMaskDebtAndRetroMask:
    """r13 verdict #3: gauge the streaming substring dedup's greedy
    keep_first divergence (mask debt) and repair it with a bounded
    batch pass pinned ≡ the batch operator on out-of-order arrival."""

    N, PASSAGE = 4, "alpha beta gamma delta"

    def _corpus(self, spark, ranges, plant_mod=7):
        import random

        rng = random.Random(13)
        frames = []
        for lo, hi in ranges:
            rows = []
            for d in range(lo, hi):
                filler = " ".join(
                    f"w{rng.randrange(500)}" for _ in range(20)
                )
                if d % plant_mod == 0:
                    words = filler.split()
                    text = (
                        " ".join(words[:8])
                        + f" {self.PASSAGE} "
                        + " ".join(words[8:])
                    )
                else:
                    text = filler
                rows.append((d, text))
            frames.append(
                spark.createDataFrame(rows, "doc_id long, text string")
            )
        return frames

    def _batch_want(self, spark, batches, min_dup):
        from propulsion_spark.operators.substring_dedup import (
            mask_repeated_ngrams,
        )

        union = batches[0]
        for b in batches[1:]:
            union = union.unionByName(b)
        return {
            r["doc_id"]: (r["masked_text"], r["n_masked_tokens"])
            for r in mask_repeated_ngrams(
                union, n=self.N, min_dup=min_dup, keep_first=True
            ).collect()
        }

    def test_monotone_min_dup2_accrues_zero_debt(self, spark, tmp_path):
        from propulsion_spark.streaming.substring_dedup import (
            SubstrDedupStream,
        )

        batches = self._corpus(spark, [(0, 30), (30, 60)])
        pipe = SubstrDedupStream(spark, str(tmp_path / "reg"), n=self.N)
        for i, b in enumerate(batches):
            pipe.process_batch(b, batch_id=i + 1)
        assert pipe.stats["mask_debt"] == 0

    def test_out_of_order_debt_gauged_and_retro_mask_repairs(
        self, spark, tmp_path
    ):
        """Reversed arrival: the high-id half streams first, so its
        kept occurrence loses canonical status when the low-id half
        arrives — invisible until now; the gauge must count it and
        retro_mask must converge the emitted output to the batch
        operator exactly."""
        from propulsion_spark.streaming.substring_dedup import (
            SubstrDedupStream,
        )

        batches = self._corpus(spark, [(30, 60), (0, 30)])
        out = str(tmp_path / "out")
        pipe = SubstrDedupStream(spark, str(tmp_path / "reg"), n=self.N)
        for i, b in enumerate(batches):
            pipe.run_batch(b, i + 1, out)
        # batch 1's kept canonical (doc 35) was dethroned by doc 0
        assert pipe.stats["mask_debt"] >= 1
        rep = pipe.retro_mask(out)
        assert rep["repaired_docs"] >= 1
        assert rep["masked_token_delta"] >= self.N
        got = {
            r["doc_id"]: (r["masked_text"], r["n_masked_tokens"])
            for r in spark.read.parquet(out).collect()
        }
        assert got == self._batch_want(spark, batches, min_dup=2)

    def test_min_dup3_crossing_debt_and_repair(self, spark, tmp_path):
        """min_dup=3, monotone arrival, one planted occurrence per
        batch: the 2nd occurrence is emitted unmasked (cnt=2 < 3) and
        becomes debt when the 3rd crosses the threshold — exactly 1;
        retro_mask then matches the batch operator at min_dup=3."""
        from propulsion_spark.streaming.substring_dedup import (
            SubstrDedupStream,
        )

        batches = self._corpus(
            spark, [(0, 7), (7, 14), (14, 21)], plant_mod=7
        )
        out = str(tmp_path / "out")
        pipe = SubstrDedupStream(
            spark, str(tmp_path / "reg"), n=self.N, min_dup=3
        )
        for i, b in enumerate(batches):
            pipe.run_batch(b, i + 1, out)
        assert pipe.stats["mask_debt"] == 1
        pipe.retro_mask(out)
        got = {
            r["doc_id"]: (r["masked_text"], r["n_masked_tokens"])
            for r in spark.read.parquet(out).collect()
        }
        assert got == self._batch_want(spark, batches, min_dup=3)
        # the repair is idempotent: a second pass changes nothing
        rep2 = pipe.retro_mask(out)
        assert rep2["repaired_docs"] == 0
        assert rep2["masked_token_delta"] == 0


class TestHadoopLease:
    """r13 verdict #5: HDFS-semantics schemes get a REAL fence via the
    Hadoop FileSystem API (create(path, overwrite=false) is atomic on
    a namenode); the logged unfenced no-op is reserved for true object
    stores. Contention is driven through the Hadoop API path itself on
    the local filesystem."""

    def test_contention_fails_loudly_then_releases(self, spark, tmp_path):
        from propulsion_spark.fsio import HadoopLease

        root = "file:" + str(tmp_path / "idx")
        with HadoopLease(spark, root, ttl_s=30.0) as held:
            assert held.owns()
            held.verify()
            with pytest.raises(TimeoutError, match="lease"):
                with HadoopLease(spark, root, timeout_s=1.5):
                    pass
        # the holder released -> the same root is acquirable again
        with HadoopLease(spark, root, timeout_s=5.0) as l2:
            assert l2.owns()

    def test_stale_lease_stolen_and_counted(self, spark, tmp_path):
        import time

        from propulsion_spark.fsio import HadoopLease

        root = "file:" + str(tmp_path / "idx2")
        dead = HadoopLease(spark, root, ttl_s=0.5, heartbeat=False)
        assert dead._try_acquire()  # then "crashes": no heartbeat
        time.sleep(0.8)
        c = {"heartbeats": 0, "steals": 0, "lost": 0}
        with HadoopLease(
            spark, root, ttl_s=0.5, timeout_s=10.0, counters=c
        ) as l2:
            assert l2.owns()
        assert c["steals"] == 1
        # the dead holder's fencing check fails loudly
        from propulsion_spark.streaming.mvcc import LeaseLostError

        with pytest.raises(LeaseLostError):
            dead.verify()

    def test_dispatch_hdfs_routes_to_hadoop_lease(
        self, spark, tmp_path, monkeypatch
    ):
        """index_lease on an hdfs://-class root must fence, never
        silently no-op (the pre-r14 behavior)."""
        from propulsion_spark import fsio
        from propulsion_spark.pipelines import fencing

        calls = {}

        class Fake:
            def __init__(self, spark, path, **kw):
                calls["path"] = path

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        monkeypatch.setattr(fsio, "HadoopLease", Fake)
        with fencing.index_lease("hdfs://nn/idx", {}) as lease:
            assert isinstance(lease, Fake)
        assert calls["path"] == "hdfs://nn/idx"

    def test_object_store_schemes_stay_unfenced_warned(self, caplog):
        import logging

        from propulsion_spark.pipelines import fencing

        for scheme in ("s3", "gs", "abfss"):
            fencing._warned_schemes.discard(scheme)
            with caplog.at_level(
                logging.WARNING, logger=fencing.__name__
            ):
                with fencing.index_lease(f"{scheme}://b/idx", {}) as lease:
                    assert lease is None
        assert sum(
            "NOT lease-fenced" in r.message for r in caplog.records
        ) == 3


class TestCliSubstrRepair:
    def test_repair_verb_pays_back_mask_debt(self, spark, tmp_path):
        """`substr --repair` drives retro_mask over a --follow-shaped
        output dir + {out}_state registry — the operational path for
        the mask_debt gauge."""
        from test_cli import run_cli

        from propulsion_spark.operators.substring_dedup import (
            mask_repeated_ngrams,
        )
        from propulsion_spark.streaming.substring_dedup import (
            SubstrDedupStream,
        )

        helper = TestMaskDebtAndRetroMask()
        batches = helper._corpus(spark, [(30, 60), (0, 30)])
        out = str(tmp_path / "masked")
        pipe = SubstrDedupStream(spark, out + "_state", n=4)
        for i, b in enumerate(batches):
            pipe.run_batch(b, i + 1, out)
        rep = run_cli("substr", "--repair", "--out", out, "--n", "4")
        assert rep["repaired_docs"] >= 1
        union = batches[0].unionByName(batches[1])
        want = {
            r["doc_id"]: r["masked_text"]
            for r in mask_repeated_ngrams(
                union, n=4, min_dup=2, keep_first=True
            ).collect()
        }
        got = {
            r["doc_id"]: r["masked_text"]
            for r in spark.read.parquet(out).collect()
        }
        assert got == want
        # missing --src without --repair errors loudly
        rep = run_cli(
            "substr", "--out", out, expect_rc=2
        )
        assert "required" in rep["error"]


class TestHadoopLeaseHeartbeat:
    def test_heartbeat_refreshes_mtime_and_blocks_steal(
        self, spark, tmp_path
    ):
        """The setTimes heartbeat path: a live holder past ttl_s is
        NEVER stolen (its mtime keeps moving), while the counter
        proves the beat ran — the FileLease liveness contract over
        the Hadoop API."""
        import time

        from propulsion_spark.fsio import HadoopLease

        root = "file:" + str(tmp_path / "idx")
        c = {"heartbeats": 0, "steals": 0, "lost": 0}
        with HadoopLease(spark, root, ttl_s=0.8, counters=c) as held:
            time.sleep(1.3)  # > ttl, > one tick (ttl/4 = 0.2s)
            assert c["heartbeats"] >= 1
            thief = HadoopLease(spark, root, ttl_s=0.8, timeout_s=1.2)
            with pytest.raises(TimeoutError):
                thief.__enter__()
            assert held.owns()  # the live holder was never displaced
        assert c["lost"] == 0


class TestCapPerSourceStream:
    """Streaming twin of the per-source cap (r14): durable per-source
    count registry + the monotone-threshold admit rule (nested
    admitted sets), retro_thin pinned ≡ the batch reference."""

    def _docs(self, spark, lo, hi, srcs=4):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % srcs).cast("string").alias("source"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
        )

    def test_single_batch_equals_batch_reference(self, spark, tmp_path):
        from propulsion_spark.streaming.source_cap import (
            CapPerSourceStream,
            cap_per_source_monotone,
        )

        docs = self._docs(spark, 0, 2000)
        pipe = CapPerSourceStream(spark, str(tmp_path / "reg"), 10)
        got = sorted(
            r["doc_id"] for r in pipe.process_batch(docs, 1).collect()
        )
        want = sorted(
            r["doc_id"]
            for r in cap_per_source_monotone(docs, 10).collect()
        )
        assert got == want and 1 <= len(want) <= 120

    def test_multi_batch_nested_then_retro_thin_converges(
        self, spark, tmp_path
    ):
        """Early batches over-admit (looser cap/N); the final rule's
        set is a SUBSET of the emitted union, and retro_thin drops
        exactly the excess — equal to the batch reference over the
        full input union, and idempotent."""
        from propulsion_spark.streaming.source_cap import (
            CapPerSourceStream,
            cap_per_source_monotone,
        )

        batches = [
            self._docs(spark, 0, 500),
            self._docs(spark, 500, 2000),
            self._docs(spark, 2000, 6000),
        ]
        out = str(tmp_path / "out")
        pipe = CapPerSourceStream(spark, str(tmp_path / "reg"), 8)
        for i, b in enumerate(batches):
            pipe.run_batch(b, i + 1, out)
        union = batches[0].unionByName(batches[1]).unionByName(batches[2])
        want = sorted(
            r["doc_id"] for r in cap_per_source_monotone(union, 8).collect()
        )
        emitted = sorted(
            r["doc_id"] for r in spark.read.parquet(out).collect()
        )
        assert set(want) <= set(emitted)  # nesting: never under-admits
        rep = pipe.retro_thin(out)
        assert rep["dropped"] == len(emitted) - len(want)
        got = sorted(
            r["doc_id"] for r in spark.read.parquet(out).collect()
        )
        assert got == want
        rep2 = pipe.retro_thin(out)  # idempotent
        assert rep2["dropped"] == 0

    def test_replay_is_idempotent(self, spark, tmp_path):
        from propulsion_spark.streaming.source_cap import CapPerSourceStream

        b1 = self._docs(spark, 0, 1000)
        pipe = CapPerSourceStream(spark, str(tmp_path / "reg"), 10)
        a = sorted(r["doc_id"] for r in pipe.process_batch(b1, 1).collect())
        # at-least-once replay: registration no-ops (dynamic rewrite of
        # its own partitions), totals unchanged, same admitted rows
        b = sorted(r["doc_id"] for r in pipe.process_batch(b1, 1).collect())
        assert a == b
        tot = {
            r["source"]: r["src_cnt"]
            for r in pipe.registry.totals().collect()
        }
        assert all(v == 250 for v in tot.values())

    def test_mega_source_and_under_cap_source(self, spark, tmp_path):
        """No resolution cliff: a 60k-doc source thins to ≈cap; an
        under-cap source passes whole — across TWO batches."""
        from propulsion_spark.streaming.source_cap import CapPerSourceStream

        mega = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
            F.col("id").alias("doc_id"), F.lit("mega").alias("source")
        )
        tiny = spark.range(5).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.lit("tiny").alias("source"),
        )
        out = str(tmp_path / "out")
        pipe = CapPerSourceStream(spark, str(tmp_path / "reg"), 5)
        pipe.run_batch(mega(0, 30_000).unionByName(tiny), 1, out)
        pipe.run_batch(mega(30_000, 60_000), 2, out)
        pipe.retro_thin(out)
        per_src = {
            r["source"]: r["count"]
            for r in spark.read.parquet(out)
            .groupBy("source")
            .count()
            .collect()
        }
        assert per_src.get("tiny") == 5  # under-cap: intact
        assert 1 <= per_src.get("mega", 0) <= 15  # ≈cap, never zero

    def test_registry_lifecycle_fold_and_fanout(self, spark, tmp_path):
        """The new registry rides the shared lifecycle: compact folds
        to one generation with summed counts (ledger-guarded replay),
        fan-out persists and validates."""
        from propulsion_spark.streaming.source_cap import (
            SourceCountRegistry,
        )

        reg = SourceCountRegistry(spark, str(tmp_path / "reg"), n_buckets=4)
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "source string, cnt long"
        )
        reg.append_counts(mk([("a", 3), ("b", 1)]), 1)
        reg.append_counts(mk([("a", 2)]), 2)
        reg.compact()
        assert reg.n_batches() == 1
        # folded-batch replay no-ops (the ledger)
        reg.append_counts(mk([("a", 3), ("b", 1)]), 1)
        tot = {r["source"]: r["src_cnt"] for r in reg.totals().collect()}
        assert tot == {"a": 5, "b": 1}
        assert SourceCountRegistry(spark, str(tmp_path / "reg")).n_buckets() == 4
        bad = SourceCountRegistry(spark, str(tmp_path / "reg"), n_buckets=8)
        with pytest.raises(ValueError, match="n_buckets=4"):
            bad.append_counts(mk([("c", 1)]), 3)

    def test_stream_into_restart_resumes(self, spark, tmp_path):
        """Checkpointed restart-resume: a second stream_into run over
        the same checkpoint processes ONLY the new files; the count
        registry keeps accumulating, never doubled by a replay."""
        from propulsion_spark.streaming.source_cap import CapPerSourceStream

        src = str(tmp_path / "src")
        self._docs(spark, 0, 1000).coalesce(1).write.mode("append").parquet(src)
        pipe = CapPerSourceStream(spark, str(tmp_path / "reg"), 10)

        def run():
            q = pipe.stream_into(
                spark.readStream.schema(
                    "doc_id long, source string, text string"
                ).parquet(src),
                str(tmp_path / "out"),
                str(tmp_path / "ck"),
            )
            q.awaitTermination(300)

        run()
        tot1 = {
            r["source"]: r["src_cnt"]
            for r in pipe.registry.totals().collect()
        }
        assert sum(tot1.values()) == 1000
        self._docs(spark, 1000, 3000).coalesce(1).write.mode("append").parquet(src)
        run()  # restart: only the new file lands
        tot2 = {
            r["source"]: r["src_cnt"]
            for r in pipe.registry.totals().collect()
        }
        assert sum(tot2.values()) == 3000  # grew by exactly the new docs
        out = spark.read.parquet(str(tmp_path / "out"))
        assert out.select("doc_id").distinct().count() == out.count()

    def test_cli_srccap_batch_follow_repair(self, spark, tmp_path):
        from test_cli import run_cli

        from propulsion_spark.streaming.source_cap import (
            cap_per_source_monotone,
        )

        src = str(tmp_path / "src")
        docs = self._docs(spark, 0, 3000)
        docs.coalesce(2).write.parquet(src)
        # batch one-shot: the residue-rule operator
        rep = run_cli(
            "srccap", "--src", src, "--out", str(tmp_path / "b"),
            "--cap", "10",
        )
        assert 10 <= rep["kept"] <= 80  # 4 sources x ~10
        # streaming + repair converges to the monotone batch answer
        out = str(tmp_path / "f")
        rep = run_cli(
            "srccap", "--src", src, "--out", out, "--cap", "10",
            "--follow",
        )
        assert rep["seen"] == 3000
        rep = run_cli(
            "srccap", "--out", out, "--cap", "10", "--repair"
        )
        want = sorted(
            r["doc_id"]
            for r in cap_per_source_monotone(docs, 10).collect()
        )
        got = sorted(
            r["doc_id"] for r in spark.read.parquet(out).collect()
        )
        assert got == want
        assert rep["kept"] == len(want)
