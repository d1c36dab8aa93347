"""Round-6 surface: vectorized ANN assignment parity, index drift
gauges + reindex, streaming packing twin, CC non-convergence error,
checkpoint-store compaction-race retry, huge-offset seq exactness,
and the pinned plan-audit expectations.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestVectorizedAssignmentParity:
    def test_equals_exact_fixed_point_assignment(self, spark, tmp_path):
        """The serving index's Arrow/BLAS argmin assignment must agree
        with the exact fixed-point path (dim-explode + DECIMAL sums +
        ORDER BY d2, label) on every corpus vector — the contract that
        lets the index keep bit-identical search results while dropping
        the O(n·dims·cells) shuffle."""
        from propulsion_spark import load_table
        from propulsion_spark.operators.similarity import (
            _dist_to_codebook,
            _spark_ivf_expl,
            q_embedding_centroids,
        )
        from propulsion_spark.pipelines.ann_index import AnnIndex

        codebook = q_embedding_centroids(spark, SF).select(
            "label", "dim", F.col("centroid").alias("c")
        )
        dist = _dist_to_codebook(_spark_ivf_expl(spark, SF), codebook)
        w = Window.partitionBy("vec_id").orderBy(F.col("d2"), F.col("label"))
        exact = {
            r["vec_id"]: r["label"]
            for r in dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        }
        idx = AnnIndex(spark, str(tmp_path / "noidx"))
        emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
        got = {
            r["vec_id"]: r["cell"]
            for r in idx._assign_vectorized(emb, codebook).collect()
        }
        assert got == exact and len(got) > 0


class TestAnnIndexDedupAndDrift:
    def test_search_dedups_reingested_vec_id(self, spark, tmp_path):
        """The same vec_id appended in two batches must surface at ONE
        rank (newest batch wins), not burn two top-k slots."""
        from propulsion_spark import load_table
        from propulsion_spark.pipelines.ann_index import AnnIndex

        idx = AnnIndex.build(spark, SF, str(tmp_path / "idx"))
        donor = (
            load_table(spark, SF, "embeddings")
            .filter(F.col("vec_id") == 7)
            .select(F.lit(880001).alias("vec_id"), "embedding")
        )
        idx.append(donor, batch_id=1)
        idx.append(donor, batch_id=2)
        stored = (
            spark.read.parquet(idx._vectors_path)
            .filter(F.col("vec_id") == 880001)
            .collect()
        )
        assert len(stored) == 2  # two physical copies in two batches...
        hits = (
            idx.search(
                load_table(spark, SF, "embeddings")
                .filter(F.col("vec_id") == 7)
                .select(F.col("vec_id").alias("query_id"), "embedding"),
                top_k=50,
            )
            .filter(F.col("neighbor_id") == 880001)
            .collect()
        )
        assert len(hits) == 1  # ...but one served rank

    def test_skew_gauge_and_reindex_recall(self, spark, tmp_path):
        """A drifted append (a tight synthetic cluster far from the
        corpus) piles into few cells: skew rises. reindex() re-learns
        the codebook from the stored vectors; recall@5 for the drifted
        queries against brute force must not degrade, and the skew
        gauge must drop (the cluster gets cells of its own)."""
        from propulsion_spark import load_table
        from propulsion_spark.pipelines.ann_index import AnnIndex
        from propulsion_spark.streaming.metrics import MetricsExporter

        idx = AnnIndex.build(spark, SF, str(tmp_path / "idx2"))
        base_skew = idx.cell_skew()
        assert base_skew["n_cells"] > 1

        dim = len(
            load_table(spark, SF, "embeddings").first()["embedding"]
        )
        # 40 near-identical far-away vectors: v_i = 9.0 everywhere with
        # a tiny per-id wiggle in dim 0 (deterministic, no RNG)
        drifted = spark.range(900000, 900040).select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {dim}), d -> cast("
                "case when d = 1 then 9.0 + (id - 900000) * 0.001 "
                "else 9.0 end as float))"
            ).alias("embedding"),
        )
        idx.append(drifted, batch_id=1)
        drift_skew = idx.cell_skew()
        assert drift_skew["skew"] > base_skew["skew"]

        exporter = MetricsExporter(group="t").register_ann_index("idx2", idx)
        text = exporter.render()
        assert "propulsion_ann_index_cells" in text and 'stat="skew"' in text

        queries = drifted.limit(5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

        def recall_at_5(index):
            from propulsion_spark.operators.similarity import _spark_dot

            all_vecs = (
                spark.read.parquet(index._vectors_path)
                .select("vec_id", "embedding")
                .dropDuplicates(["vec_id"])
            )
            q = queries.select(
                F.col("query_id").alias("qid"), F.col("embedding").alias("qe")
            )
            cos = _spark_dot("qe", "embedding") / (
                F.sqrt(_spark_dot("qe", "qe"))
                * F.sqrt(_spark_dot("embedding", "embedding"))
            )
            wq = Window.partitionBy("qid").orderBy(
                F.col("cos").desc(), F.col("vec_id")
            )
            truth = {
                (r["qid"], r["vec_id"])
                for r in all_vecs.join(
                    F.broadcast(q), F.col("vec_id") != F.col("qid")
                )
                .select("qid", "vec_id", cos.alias("cos"))
                .withColumn("rn", F.row_number().over(wq))
                .filter(F.col("rn") <= 5)
                .collect()
            }
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in index.search(queries, top_k=5).collect()
            }
            return len(got & truth) / len(truth)

        before = recall_at_5(idx)
        idx.reindex()
        after = recall_at_5(idx)
        assert after >= before
        assert idx.cell_skew()["skew"] < drift_skew["skew"]
        # duplicates resolved durably: one physical row per vec_id
        n = spark.read.parquet(idx._vectors_path).count()
        n_ids = (
            spark.read.parquet(idx._vectors_path)
            .select("vec_id")
            .distinct()
            .count()
        )
        assert n == n_ids


class TestStreamingPacking:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "split string, doc_id long, n_tokens long"
        )

    def test_ordered_batches_reproduce_batch_operator(self, spark, tmp_path):
        """Feeding doc_id-ordered batches through the twin yields the
        batch operator's offsets/seqs exactly."""
        from propulsion_spark.operators.packing import pack_documents
        from propulsion_spark.streaming.packing import pack_foreach_batch

        rows = [
            ("train", i, (i * 7) % 23 + 1) for i in range(60)
        ] + [("valid", i, (i * 5) % 17 + 1) for i in range(40)]
        process = pack_foreach_batch(
            spark, str(tmp_path / "state"), str(tmp_path / "out"), seq_len=16
        )
        # three doc_id-ordered batches (splits interleaved)
        cut1 = [r for r in rows if r[1] < 20]
        cut2 = [r for r in rows if 20 <= r[1] < 45]
        cut3 = [r for r in rows if r[1] >= 45]
        for bid, cut in enumerate([cut1, cut2, cut3]):
            process(self._docs(spark, cut), bid)
        got = {
            (r["split"], r["doc_id"]): (
                r["offset"],
                r["first_seq"],
                r["last_seq"],
                r["n_seqs"],
            )
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        }
        want = {
            (r["split"], r["doc_id"]): (
                r["offset"],
                r["first_seq"],
                r["last_seq"],
                r["n_seqs"],
            )
            for r in pack_documents(self._docs(spark, rows), 16).collect()
        }
        assert got == want

    def test_replay_is_idempotent(self, spark, tmp_path):
        """Re-running a batch id (at-least-once delivery) reads the same
        prior state and rewrites the same output partition — offsets
        unchanged, no duplicate rows."""
        from propulsion_spark.streaming.packing import pack_foreach_batch

        process = pack_foreach_batch(
            spark, str(tmp_path / "state"), str(tmp_path / "out"), seq_len=8
        )
        b0 = self._docs(spark, [("train", 0, 5), ("train", 1, 6)])
        b1 = self._docs(spark, [("train", 2, 7), ("valid", 0, 3)])
        process(b0, 0)
        process(b1, 1)
        first = sorted(
            tuple(r)
            for r in spark.read.parquet(str(tmp_path / "out"))
            .drop("_batch_id")
            .collect()
        )
        process(b1, 1)  # replay
        second = sorted(
            tuple(r)
            for r in spark.read.parquet(str(tmp_path / "out"))
            .drop("_batch_id")
            .collect()
        )
        assert first == second

    def test_untouched_split_keeps_carry(self, spark, tmp_path):
        """A split absent from a batch must resume from its carried
        position when it reappears."""
        from propulsion_spark.streaming.packing import pack_foreach_batch

        process = pack_foreach_batch(
            spark, str(tmp_path / "state"), str(tmp_path / "out"), seq_len=8
        )
        process(self._docs(spark, [("train", 0, 5), ("valid", 0, 4)]), 0)
        process(self._docs(spark, [("train", 1, 6)]), 1)  # no valid docs
        process(self._docs(spark, [("valid", 1, 2)]), 2)
        out = {
            (r["split"], r["doc_id"]): r["offset"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        }
        assert out[("valid", 1)] == 4  # resumed after valid-0's 4 tokens
        assert out[("train", 1)] == 5


class TestCurationPackingComposition:
    def test_incremental_curate_then_pack(self, spark, tmp_path):
        """The incremental corpus story end-to-end: curation appends
        survivors to the curated store per batch; the packing twin
        tails the curated store and extends each split's packed token
        stream — corpus growth never reshuffles already-packed
        sequences, and every curated doc is packed exactly once."""
        from propulsion_spark.pipelines import CurationPipeline
        from propulsion_spark.streaming.packing import pack_foreach_batch

        good = (
            "the quick brown fox jumps over the lazy dog and keeps "
            "running far " * 2
        )
        rows1 = [
            (1, good, "en", "s", len(good)),
            (2, good + " extra tail", "en", "s", len(good) + 11),
            (3, "12345 67890 " * 30, "en", "s", 360),  # fails quality
            (4, good, "en", "s", len(good)),  # exact dup of 1
        ]
        rows2 = [
            (5, good, "en", "s", len(good)),  # cross-batch dup: dropped
            (6, good + " novel suffix", "en", "s", len(good) + 13),
        ]
        schema = "doc_id long, text string, lang string, source string, n_chars long"
        pipe = CurationPipeline(spark, str(tmp_path / "cur"))
        pack = pack_foreach_batch(
            spark,
            str(tmp_path / "pstate"),
            str(tmp_path / "packed"),
            seq_len=32,
        )

        def pack_stream():
            """Tail the curated store with a file stream (exactly the
            CLI pack --follow wiring) and drain it."""
            cur = spark.read.parquet(pipe.curated_path)
            q = (
                spark.readStream.schema(cur.schema)
                .parquet(pipe.curated_path)
                .writeStream.foreachBatch(
                    lambda df, bid: pack(
                        df.withColumn(
                            "n_tokens",
                            F.expr(
                                "size(split(lower(trim(text)), '\\\\s+'))"
                            ).cast("long"),
                        ),
                        bid,
                    )
                )
                .option(
                    "checkpointLocation", str(tmp_path / "pck")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        pipe.process_batch(spark.createDataFrame(rows1, schema), 0)
        pack_stream()
        first_wave = {
            r["doc_id"]: r["offset"]
            for r in spark.read.parquet(str(tmp_path / "packed")).collect()
        }
        assert set(first_wave) == {1, 2}

        pipe.process_batch(spark.createDataFrame(rows2, schema), 1)
        pack_stream()
        packed = spark.read.parquet(str(tmp_path / "packed"))
        rows = packed.collect()
        # every curated doc packed exactly once
        assert sorted(r["doc_id"] for r in rows) == [1, 2, 6]
        # growth extended the stream without moving wave-1 docs
        for r in rows:
            if r["doc_id"] in first_wave:
                assert r["offset"] == first_wave[r["doc_id"]]
        # offsets are a contiguous token stream per split
        by_split: dict = {}
        for r in rows:
            by_split.setdefault(r["split"], []).append(r)
        for rs in by_split.values():
            rs.sort(key=lambda r: r["offset"])
            pos = 0
            for r in rs:
                assert r["offset"] == pos
                pos += r["n_tokens"]


class TestStreamingPackingProperty:
    def test_any_ordered_batching_reproduces_batch_packing(
        self, spark, tmp_path
    ):
        """Property (seeded sweep, no Spark-per-example cost blowup):
        for random corpora and random ordered batch boundaries, the
        twin's offsets/seqs equal the batch operator's exactly."""
        import random

        from propulsion_spark.operators.packing import pack_documents
        from propulsion_spark.streaming.packing import pack_foreach_batch

        for trial in range(4):
            rng = random.Random(1000 + trial)
            n = rng.randint(5, 60)
            rows = [
                (
                    rng.choice(["train", "valid", "test"]),
                    i,
                    rng.randint(0, 40),  # zero-token docs included
                )
                for i in range(n)
            ]
            seq_len = rng.choice([1, 7, 16])
            # random ordered batch boundaries
            cuts = sorted(rng.sample(range(n + 1), rng.randint(0, 3)))
            bounds = [0, *cuts, n]
            out = str(tmp_path / f"out{trial}")
            process = pack_foreach_batch(
                spark, str(tmp_path / f"st{trial}"), out, seq_len=seq_len
            )
            bid = 0
            for lo, hi in zip(bounds, bounds[1:]):
                chunk = [r for r in rows if lo <= r[1] < hi]
                process(
                    spark.createDataFrame(
                        chunk or [("train", -1, 0)],
                        "split string, doc_id long, n_tokens long",
                    ).filter(F.col("doc_id") >= 0),
                    bid,
                )
                bid += 1
            got = {
                (r["split"], r["doc_id"]): (
                    r["offset"],
                    r["first_seq"],
                    r["last_seq"],
                )
                for r in spark.read.parquet(out).collect()
            }
            want = {
                (r["split"], r["doc_id"]): (
                    r["offset"],
                    r["first_seq"],
                    r["last_seq"],
                )
                for r in pack_documents(
                    spark.createDataFrame(
                        rows, "split string, doc_id long, n_tokens long"
                    ),
                    seq_len,
                ).collect()
            }
            assert got == want, f"trial {trial} diverged"


class TestSeqColsExactness:
    def test_offsets_beyond_double_precision(self, spark):
        """last_seq must be integer-exact for token offsets past 2^53
        (a 100 TB corpus is ~2.5e13 tokens; double division rounds
        there)."""
        from propulsion_spark.operators.packing import with_seq_cols

        big = (1 << 55) + 1  # not representable as a double
        df = spark.createDataFrame(
            [("train", 1, 3, big)],
            "split string, doc_id long, n_tokens long, offset long",
        )
        r = with_seq_cols(df, 7).first()
        assert r["first_seq"] == big // 7
        assert r["last_seq"] == (big + 2) // 7
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1


class TestCCNonConvergence:
    def test_round_cap_raises_instead_of_wrong_clusters(self, spark):
        from propulsion_spark.operators.dedup import connected_components

        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(6)], "a_id long, b_id long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(chain, max_iters=1)
        # and a sufficient cap still converges on the same input
        labels = connected_components(chain, max_iters=50)
        assert {r["label"] for r in labels.collect()} == {0}


class TestCheckpointCompactionRetry:
    def test_read_retries_on_vanished_segment(self, tmp_path, monkeypatch):
        """A FileNotFoundError mid-read (concurrent compaction) must
        invalidate the whole listing and re-read — never return a view
        missing the compacted rows."""
        import pandas as pd

        from propulsion_spark.streaming.checkpoints import CheckpointStore

        store = CheckpointStore(path=str(tmp_path / "ck"), group="g")
        store._append_now("src", "0", 5, kind="Started")
        store._append_now("src", "0", 9, kind="Checkpointed")

        real = pd.read_parquet
        calls = {"n": 0}

        def flaky(path, *a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                # simulate: this segment was compacted away between the
                # listing and the read
                raise FileNotFoundError(path)
            return real(path, *a, **k)

        monkeypatch.setattr(pd, "read_parquet", flaky)
        assert store.position("src", "0") == 9
        assert calls["n"] >= 3  # first aborted, full re-read followed


class TestPlanAuditPinned:
    def test_flags_stay_within_expected_set(self, spark):
        """tools/plan_audit.py's expected-flag set, enforced: a new
        cartesian/BNLJ/shuffle-pileup on any query OUTSIDE the
        documented expected set fails the suite instead of scrolling by
        in a tool nobody runs."""
        import sys

        sys.path.insert(0, "/root/repo/tools")
        from plan_audit import EXPECTED_FLAGGED, audit

        results = audit(spark, SF)
        assert len(results) == 50
        errors = {n: f for n, f in results.items() if any("ERROR" in x for x in f)}
        assert not errors
        flagged = {n for n, f in results.items() if f}
        assert flagged <= EXPECTED_FLAGGED, (
            f"unexpected plan flags: "
            f"{ {n: results[n] for n in flagged - EXPECTED_FLAGGED} }"
        )


class TestStratifiedSample:
    def test_exact_k_deterministic_and_salted(self, spark):
        from propulsion_spark import load_table
        from propulsion_spark.operators.textops import stratified_sample

        docs = load_table(spark, SF, "documents")
        s1 = stratified_sample(docs, 5)
        per_lang = {
            r["lang"]: r["n"]
            for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        pop = {
            r["lang"]: r["n"]
            for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        for lang, n in per_lang.items():
            assert n == min(5, pop[lang])
        # partition-layout invariant
        ids = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())  # noqa: E731
        assert ids(s1) == ids(stratified_sample(docs.repartition(13), 5))
        # a different salt draws a different (but equally sized) sample
        s2 = stratified_sample(docs, 5, salt="sample-1")
        assert ids(s2) != ids(s1)
        assert len(ids(s2)) == len(ids(s1))

    def test_window_group_limit_in_plan(self, spark):
        """The scale contract: rank<=k is pushed into per-partition
        top-k (WindowGroupLimit) so a stratum never fully sorts."""
        from propulsion_spark import load_table
        from propulsion_spark.operators.textops import stratified_sample

        docs = load_table(spark, SF, "documents")
        plan = (
            stratified_sample(docs, 5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan


class TestSimhashHamming:
    """Multi-index SimHash near-dup (Manku et al., WWW'07): 64-bit
    fingerprints, 16-bit chunk buckets, pigeonhole-complete recall for
    hamming ≤ n_chunks−1 — pinned against an all-pairs brute force."""

    def test_matches_bruteforce_on_corpus(self, spark):
        import numpy as np

        from propulsion_spark import load_table
        from propulsion_spark.operators.dedup import (
            simhash64,
            simhash_hamming_pairs,
        )

        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        sh = simhash64(docs).toPandas().set_index("doc_id")
        ids = sh.index.to_numpy()
        arr = sh.simhash64.astype("uint64").to_numpy()
        expected = set()
        for i in range(len(ids)):
            x = np.bitwise_xor(arr[i + 1 :], arr[i])
            for j, t in enumerate(x):
                if bin(int(t)).count("1") <= 3:
                    a, b = sorted((int(ids[i]), int(ids[i + 1 + j])))
                    expected.add((a, b))
        got = {
            (r.a_id, r.b_id) for r in simhash_hamming_pairs(docs).collect()
        }
        assert got == expected
        assert expected  # non-vacuous: the corpus has near-dups

    def test_identical_docs_at_hamming_zero(self, spark):
        from propulsion_spark.operators.dedup import simhash_hamming_pairs

        d = spark.createDataFrame(
            [
                (1, "same text body here padded out"),
                (2, "same text body here padded out"),
                (3, "entirely different content words"),
            ],
            "doc_id long, text string",
        )
        assert [(r.a_id, r.b_id, r.hamming) for r in
                simhash_hamming_pairs(d).collect()] == [(1, 2, 0)]

    def test_radius_beyond_pigeonhole_guarantee_raises(self, spark):
        from propulsion_spark.operators.dedup import simhash_hamming_pairs

        d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            simhash_hamming_pairs(d, max_hamming=5)
        with pytest.raises(ValueError):
            simhash_hamming_pairs(d, n_chunks=5)

    def test_single_chunk_exact_duplicate_config(self, spark):
        """n_chunks=1 / max_hamming=0 (exact-fingerprint search) is a
        legitimate configuration — a 2^64−1 mask literal used to
        overflow the signed-long parser (review-found)."""
        from propulsion_spark.operators.dedup import simhash_hamming_pairs

        d = spark.createDataFrame(
            [
                (1, "same text body here padded out"),
                (2, "same text body here padded out"),
                (3, "entirely different content words"),
            ],
            "doc_id long, text string",
        )
        got = simhash_hamming_pairs(d, max_hamming=0, n_chunks=1).collect()
        assert [(r.a_id, r.b_id, r.hamming) for r in got] == [(1, 2, 0)]

    def test_bucket_stats_gauge(self, spark):
        """The occupancy gauge must account every doc in every chunk
        index and report the exact candidate-pair count of the
        equi-join."""
        from propulsion_spark import load_table
        from propulsion_spark.operators.dedup import (
            SIMHASH64_CHUNKS,
            hamming_bucket_stats,
        )

        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        n = docs.count()
        stats = {r["chunk_idx"]: r for r in hamming_bucket_stats(docs).collect()}
        assert set(stats) == set(range(SIMHASH64_CHUNKS))
        for r in stats.values():
            assert r["n_docs"] == n
            assert 1 <= r["max_bucket"] <= n
            assert r["n_buckets"] <= n
            # exact pair count: sum b*(b-1)/2 over buckets
            assert r["candidate_pairs"] >= 0
        # near-unique corpus: candidates ≪ n² (the boundedness claim)
        total = sum(r["candidate_pairs"] for r in stats.values())
        assert total < n * (n - 1) // 4

    def test_fingerprints_use_all_64_bits(self, spark):
        """SPARK_H64 is only 60 bits; the 16th md5 hex char must supply
        the top nibble or fingerprint bits 60-63 are permanently zero
        and the top hamming chunk's index degrades 16× (review-found)."""
        from propulsion_spark import load_table
        from propulsion_spark.operators.dedup import simhash64

        sh = simhash64(
            load_table(spark, SF, "documents").select("doc_id", "text")
        )
        n_high = sh.filter("shiftright(simhash64, 60) != 0").count()
        assert n_high > 0


class TestStreamingSharding:
    """Streaming twin of shard_corpus: hash-shuffled within each batch,
    appended at the carried split position — hash-ordered batches
    reproduce the batch operator exactly; replays are idempotent."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "split string, doc_id long, n_tokens long"
        )

    def test_hash_ordered_batches_reproduce_batch_operator(
        self, spark, tmp_path
    ):
        from propulsion_spark.operators.packing import shard_corpus
        from propulsion_spark.streaming.packing import shard_foreach_batch

        rows = [("train", i, (i * 7) % 23 + 1) for i in range(80)] + [
            ("valid", i, (i * 5) % 17 + 1) for i in range(50)
        ]
        whole = shard_corpus(self._docs(spark, rows), 64)
        want = {
            (r["split"], r["doc_id"]): (
                r["offset"],
                r["shard_id"],
                r["shard_offset"],
            )
            for r in whole.collect()
        }
        # cut the stream at each split's 1/3 and 2/3 offset points —
        # arrival order matches the global hash order
        order = sorted(
            ((r["split"], r["offset"]), r["doc_id"], r["n_tokens"])
            for r in whole.collect()
        )
        per_split: dict[str, list] = {}
        for (split, _off), did, ntok in order:
            per_split.setdefault(split, []).append((split, did, ntok))
        cuts = [[], [], []]
        for split, docs in per_split.items():
            third = (len(docs) + 2) // 3
            cuts[0] += docs[:third]
            cuts[1] += docs[third : 2 * third]
            cuts[2] += docs[2 * third :]
        process = shard_foreach_batch(
            spark, str(tmp_path / "state"), str(tmp_path / "out"),
            shard_tokens=64,
        )
        for bid, cut in enumerate(cuts):
            process(self._docs(spark, cut), bid)
        got = {
            (r["split"], r["doc_id"]): (
                r["offset"],
                r["shard_id"],
                r["shard_offset"],
            )
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        }
        assert got == want

    def test_replay_is_idempotent(self, spark, tmp_path):
        from propulsion_spark.streaming.packing import shard_foreach_batch

        process = shard_foreach_batch(
            spark, str(tmp_path / "state"), str(tmp_path / "out"),
            shard_tokens=16,
        )
        b0 = self._docs(spark, [("train", 0, 5), ("train", 1, 6)])
        b1 = self._docs(spark, [("train", 2, 7), ("valid", 0, 3)])
        process(b0, 0)
        process(b1, 1)
        first = sorted(
            tuple(r)
            for r in spark.read.parquet(str(tmp_path / "out"))
            .drop("_batch_id")
            .collect()
        )
        process(b1, 1)  # replay
        second = sorted(
            tuple(r)
            for r in spark.read.parquet(str(tmp_path / "out"))
            .drop("_batch_id")
            .collect()
        )
        assert first == second
        # offsets tile: no gap or overlap across the carried batches
        train = sorted(
            (r["offset"], r["n_tokens"])
            for r in spark.read.parquet(str(tmp_path / "out"))
            .filter("split = 'train'")
            .collect()
        )
        run = 0
        for off, n in train:
            assert off == run
            run += n


class TestDistPathParity:
    def test_map_only_distance_matches_long_form_bit_for_bit(self, spark):
        """r10: the map-only zip_with/decimal-fold distance path (what
        every IVF query now plans) must reproduce the long-form
        explode→join→groupBy-sum aggregate EXACTLY — decimal addition
        is order-independent, so the two folds are the same number."""
        from propulsion_spark import load_table
        from propulsion_spark.operators.similarity import (
            _dist_to_codebook,
            _dist_to_codebook_arrays,
            _spark_ivf_expl,
            q_embedding_centroids,
        )

        codebook = q_embedding_centroids(spark, SF).select(
            "label", "dim", F.col("centroid").alias("c")
        )
        long_form = {
            (r["vec_id"], r["label"]): r["d2"]
            for r in _dist_to_codebook(
                _spark_ivf_expl(spark, SF), codebook
            ).collect()
        }
        emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
        arr_form = {
            (r["vec_id"], r["label"]): r["d2"]
            for r in _dist_to_codebook_arrays(emb, codebook).collect()
        }
        assert long_form == arr_form and len(arr_form) > 0
