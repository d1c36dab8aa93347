"""Round-9 operators: SemDeDup (embedding-cluster semantic dedup,
Abbas et al. 2023), BM25 lexical ranking, priority sampling and the
fuzzy edit-distance join."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from propulsion_spark.operators.similarity import (
    SEMDEDUP_COS,
    _spark_dot,
    _spark_ivf_cells,
    semdedup_verdicts,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _normed(spark, rows):
    """rows: (vec_id, [floats]) → the (vec_id, embedding, nrm) shape
    semdedup_verdicts consumes."""
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]),
        "vec_id long, embedding array<float>",
    )
    return df.withColumn("nrm", F.sqrt(_spark_dot("embedding", "embedding")))


def _cells(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["vec_id", "cell"]),
        "vec_id long, cell int",
    )


class TestSemDeDup:
    def test_duplicate_dropped_with_lowest_witness(self, spark):
        normed = _normed(
            spark,
            [
                (1, [1.0, 0.0, 0.0]),
                (2, [2.0, 0.0, 0.0]),  # same direction as 1 → cos 1.0
                (3, [0.0, 1.0, 0.0]),  # orthogonal → kept
            ],
        )
        cells = _cells(spark, [(1, 0), (2, 0), (3, 0)])
        out = {r["b_id"]: r for r in semdedup_verdicts(normed, cells).collect()}
        assert set(out) == {2}
        assert out[2]["a_id"] == 1
        assert out[2]["cosine"] == 1.0

    def test_cluster_boundary_bounds_the_pair_space(self, spark):
        """Identical vectors in DIFFERENT cells are never compared —
        the pair space is O(Σ cell²), the paper's scaling trick."""
        normed = _normed(
            spark, [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])]
        )
        cells = _cells(spark, [(1, 0), (2, 1), (3, 1)])
        out = {r["b_id"]: r for r in semdedup_verdicts(normed, cells).collect()}
        assert set(out) == {3}  # only the in-cell (2,3) pair fires
        assert out[3]["a_id"] == 2

    def test_epsilon_group_keeps_exactly_one(self, spark):
        """A triple of copies yields two drops, both witnessed by the
        lowest id (ties on cosine resolve to the smallest witness)."""
        normed = _normed(
            spark,
            [(1, [1.0, 1.0]), (2, [2.0, 2.0]), (5, [3.0, 3.0])],
        )
        cells = _cells(spark, [(1, 0), (2, 0), (5, 0)])
        out = {r["b_id"]: r["a_id"] for r in semdedup_verdicts(normed, cells).collect()}
        assert out == {2: 1, 5: 1}

    def test_threshold_respected(self, spark):
        normed = _normed(spark, [(1, [1.0, 0.0]), (2, [1.0, 1.0])])  # cos ≈ .707
        cells = _cells(spark, [(1, 0), (2, 0)])
        assert semdedup_verdicts(normed, cells, threshold=0.8).count() == 0
        assert semdedup_verdicts(normed, cells, threshold=0.7).count() == 1

    def test_joined_kernel_matches_wrapper(self, spark):
        """r15: the pre-joined kernel (what SemDedupStream feeds from
        its persisted frame so the cell assignment runs once, not three
        times per batch) is verdict-identical to the two-frame wrapper,
        cached or not."""
        from propulsion_spark.operators.similarity import (
            semdedup_verdicts_joined,
        )

        normed = _normed(
            spark,
            [(i, [float(i % 5 + 1), float(i % 3), 1.0]) for i in range(30)],
        )
        cells = _cells(spark, [(i, i % 3) for i in range(30)])
        want = sorted(map(tuple, semdedup_verdicts(normed, cells).collect()))
        joined = normed.join(cells, "vec_id").persist()
        try:
            got = sorted(
                map(tuple, semdedup_verdicts_joined(joined).collect())
            )
        finally:
            joined.unpersist()
        assert got == want and len(want) > 0

    def test_partition_invariant(self, spark):
        normed = _normed(
            spark,
            [(i, [float(i % 7 + 1), float(i % 3), 1.0]) for i in range(40)],
        )
        cells = _cells(spark, [(i, i % 4) for i in range(40)])
        a = sorted(
            map(tuple, semdedup_verdicts(normed, cells).collect())
        )
        b = sorted(
            map(
                tuple,
                semdedup_verdicts(
                    normed.repartition(7), cells.repartition(3)
                ).collect(),
            )
        )
        assert a == b and len(a) > 0

    def test_ivf_cells_assign_every_vector_once(self, spark):
        cells = _spark_ivf_cells(spark, SF_SMOKE)
        n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
        assert cells.count() == n_vecs
        assert cells.select("vec_id").distinct().count() == n_vecs

    def test_merged_report_carries_both_arms(self, spark):
        from propulsion_spark.operators.similarity import (
            q_dedup_embedding_cosine,
        )

        rows = q_dedup_embedding_cosine(spark, SF_SMOKE).collect()
        methods = {r["method"] for r in rows}
        assert methods <= {"lsh_pairs", "semdedup"}
        # every semdedup verdict is above its threshold and keeps a
        # lower-id witness
        for r in rows:
            if r["method"] == "semdedup":
                assert r["cosine"] >= SEMDEDUP_COS
                assert r["a_id"] < r["b_id"]


class TestBM25:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]),
            "doc_id long, text string",
        )

    def test_scores_match_reference_formula(self, spark):
        from propulsion_spark.operators.textops import (
            BM25_B,
            BM25_K1,
            bm25_scores,
        )

        docs = self._docs(
            spark,
            [
                (1, "spark spark spark filler filler"),
                (2, "spark filler"),
                (3, "filler filler filler"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in bm25_scores(docs, terms=("spark",)).collect()
        }
        assert set(out) == {1, 2}
        n_docs, avgdl = 3, (5 + 2 + 3) / 3
        df = 2

        def expect(tf, dl):
            idf = (n_docs - df + 0.5) / (df + 0.5)
            return idf * (
                tf * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl / avgdl)))
            )

        assert out[1]["score"] == expect(3, 5)
        assert out[2]["score"] == expect(1, 2)
        assert out[1]["doc_freq"] == df and out[1]["tf"] == 3

    def test_length_normalization_prefers_shorter_doc_at_equal_tf(self, spark):
        from propulsion_spark.operators.textops import bm25_scores

        docs = self._docs(
            spark,
            [
                (1, "spark " + "pad " * 40),
                (2, "spark pad"),
            ],
        )
        out = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ("spark",)).collect()}
        assert out[2] > out[1]

    def test_merged_report_ranks_per_term(self, spark):
        from propulsion_spark.operators.textops import (
            BM25_QUERY_TERMS,
            BM25_TOPK,
            q_text_tfidf_keywords,
        )

        rows = q_text_tfidf_keywords(spark, SF_SMOKE).collect()
        bm = [r for r in rows if r["method"] == "bm25"]
        assert {r["token"] for r in bm} <= set(BM25_QUERY_TERMS)
        by_term: dict = {}
        for r in bm:
            by_term.setdefault(r["token"], []).append(r)
        for term, rs in by_term.items():
            ranks = sorted(r["rank"] for r in rs)
            assert ranks == list(range(1, len(rs) + 1))
            assert len(rs) <= BM25_TOPK
            # rank order == score order
            rs = sorted(rs, key=lambda r: r["rank"])
            scores = [r["score"] for r in rs]
            assert scores == sorted(scores, reverse=True)


class TestPrioritySample:
    def _docs(self, spark, n=200):
        return spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": range(n), "n_chars": [(i * 37) % 501 for i in range(n)]}
            ),
            "doc_id long, n_chars long",
        )

    def test_matches_bruteforce_selection(self, spark):
        from propulsion_spark.operators.textops import _PS_M, priority_sample
        import hashlib

        docs = self._docs(spark)
        got = sorted(
            r["doc_id"] for r in priority_sample(docs, k=25).collect()
        )

        def pri(i, w):
            h = int(hashlib.md5(f"{i}-ps".encode()).hexdigest()[:15], 16)
            u = (float(h % _PS_M) + 1.0) / _PS_M
            return float(w) / u

        rows = [(i, (i * 37) % 501) for i in range(200)]
        want = sorted(
            sorted(rows, key=lambda t: (-pri(*t), t[0]))[:25]
        )
        assert got == [i for i, _ in want]

    def test_partition_invariant(self, spark):
        from propulsion_spark.operators.textops import priority_sample

        docs = self._docs(spark, 300)
        a = sorted(r["doc_id"] for r in priority_sample(docs, k=40).collect())
        b = sorted(
            r["doc_id"]
            for r in priority_sample(docs.repartition(13), k=40).collect()
        )
        assert a == b and len(a) == 40

    def test_growth_only_displaces_never_reshuffles(self, spark):
        """Appending docs can only evict old members past the new
        threshold — every surviving old member keeps its priority, so
        the old sample ⊇ (new sample ∩ old corpus)."""
        from propulsion_spark.operators.textops import priority_sample

        old = self._docs(spark, 150)
        new = self._docs(spark, 300)
        s_old = {r["doc_id"] for r in priority_sample(old, k=30).collect()}
        s_new = {r["doc_id"] for r in priority_sample(new, k=30).collect()}
        assert (s_new & set(range(150))) <= s_old

    def test_plan_is_take_ordered_not_global_sort(self, spark):
        from propulsion_spark.operators.textops import priority_sample

        plan = priority_sample(self._docs(spark), k=10)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestFuzzyEditJoin:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": range(len(texts)), "text": texts}
            ),
            "doc_id long, text string",
        )

    def test_complete_vs_bruteforce(self, spark):
        """The PassJoin segment filter loses NO pair: operator output ==
        all-pairs levenshtein over the fixed-length keys."""
        from propulsion_spark.operators.dedup import (
            FUZZY_LEN,
            FUZZY_MAXD,
            fuzzy_edit_pairs,
            normalized,
        )
        import itertools

        texts = [
            "alpha beta gamma delta",
            "alpha beta gamma delts",      # 1 sub inside the window
            "alpha bets gamma delta",      # 1 sub
            "alpha beta gamma",            # same 16-prefix
            "alphx betx gammx delta",      # 3 subs → out at d=2
            "totally different words",
            "zzz yyy xxx www",
            "alpha  beta   gamma delta",   # whitespace collapses → dup
            "ALPHA BETA GAMMA DELTA",      # case-folds → dup
            "",                            # all-pad key
            "b",                           # near-all-pad
        ]
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
            "doc_id long, text string",
        )
        got = sorted(
            (r["a_id"], r["b_id"], r["dist"])
            for r in fuzzy_edit_pairs(docs).collect()
        )

        from propulsion_spark.operators.dedup import _fuzzy_key

        keys_df = docs.selectExpr(
            "doc_id", f"{_fuzzy_key('spark')} AS k"
        ).collect()
        keys = {r["doc_id"]: r["k"] for r in keys_df}

        def lev(a, b):
            m, n = len(a), len(b)
            dp = list(range(n + 1))
            for i in range(1, m + 1):
                prev, dp[0] = dp[0], i
                for j in range(1, n + 1):
                    cur = dp[j]
                    dp[j] = min(
                        dp[j] + 1,
                        dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]),
                    )
                    prev = cur
            return dp[n]

        want = sorted(
            (a, b, lev(keys[a], keys[b]))
            for a, b in itertools.combinations(sorted(keys), 2)
            if lev(keys[a], keys[b]) <= FUZZY_MAXD
        )
        assert got == want and len(want) >= 4
        assert all(len(k) == FUZZY_LEN for k in keys.values())

    def test_symmetric_and_canonical(self, spark):
        from propulsion_spark.operators.dedup import fuzzy_edit_pairs

        docs = self._docs(spark, ["hello world foo", "hello world fop"])
        rows = fuzzy_edit_pairs(docs).collect()
        assert [(r["a_id"], r["b_id"], r["dist"]) for r in rows] == [(0, 1, 1)]

    def test_partition_invariant(self, spark):
        from propulsion_spark.operators.dedup import fuzzy_edit_pairs

        texts = [f"prefix {i % 9} common tail words" for i in range(60)]
        docs = self._docs(spark, texts)
        a = sorted(map(tuple, fuzzy_edit_pairs(docs).collect()))
        b = sorted(map(tuple, fuzzy_edit_pairs(docs.repartition(11)).collect()))
        assert a == b and len(a) > 0

    def test_merged_report_edit_stage(self, spark):
        from propulsion_spark.operators.dedup import (
            FUZZY_MAXD,
            q_dedup_minhash_lsh_pairs,
        )

        rows = q_dedup_minhash_lsh_pairs(spark, SF_SMOKE).collect()
        stages = {r["stage"] for r in rows}
        assert stages <= {"candidate", "verified", "edit"}
        for r in rows:
            if r["stage"] == "edit":
                assert 0 <= r["score"] <= FUZZY_MAXD
                assert r["a_id"] < r["b_id"]


class TestSemDedupCurationStage:
    DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
    GOOD = "the quick brown fox jumps over the lazy dog and keeps running far "

    def _doc(self, doc_id, text):
        return {
            "doc_id": doc_id,
            "text": text,
            "lang": "en",
            "source": "s",
            "n_chars": len(text),
        }

    def _emb(self, spark, rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]),
            "vec_id long, embedding array<float>, label int",
        )

    def test_semantic_duplicates_dropped_once(self, spark, tmp_path):
        from propulsion_spark.pipelines import CurationPipeline

        # docs 1 and 2: textually distinct (different fps, no shared
        # grams) but embedding-identical → SemDeDup drops 2; doc 3 is
        # embedding-orthogonal and survives.
        docs = spark.createDataFrame(
            pd.DataFrame(
                [
                    self._doc(1, self.GOOD * 2 + "first variant"),
                    self._doc(
                        2,
                        "entirely different prose describing one concept "
                        "using other vocabulary with many more distinct "
                        "tokens than any floor requires today",
                    ),
                    self._doc(
                        3,
                        "unrelated third document whose content shares "
                        "nothing textual nor semantic with either "
                        "neighbour and still passes every quality gate",
                    ),
                ]
            ),
            self.DOC_SCHEMA,
        )
        emb = self._emb(
            spark,
            [
                (1, [1.0, 0.0, 0.0, 0.0], 0),
                (2, [0.9, 0.1, 0.0, 0.0], 0),  # cos ≈ .994 with 1
                (3, [0.0, 0.0, 1.0, 0.0], 1),
            ],
        )
        pipe = CurationPipeline(
            spark, str(tmp_path / "out"), semdedup_embeddings=emb
        )
        pipe.process_batch(docs)
        kept = sorted(r.doc_id for r in pipe.curated().collect())
        assert kept == [1, 3]
        assert pipe.stats["sem_deduped"] == 1
        assert pipe.stats["kept"] == 2

    def test_ids_outside_side_input_pass(self, spark, tmp_path):
        from propulsion_spark.pipelines import CurationPipeline

        docs = spark.createDataFrame(
            pd.DataFrame([self._doc(99, self.GOOD * 2)]), self.DOC_SCHEMA
        )
        emb = self._emb(spark, [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0)])
        pipe = CurationPipeline(
            spark, str(tmp_path / "out"), semdedup_embeddings=emb
        )
        pipe.process_batch(docs)
        assert [r.doc_id for r in pipe.curated().collect()] == [99]
        assert pipe.stats["sem_deduped"] == 0

    def test_frame_cells_match_table_cells(self, spark):
        """ivf_cells (frame-based) reproduces _spark_ivf_cells
        (table-based) on the fixture embeddings."""
        from propulsion_spark import load_table
        from propulsion_spark.operators.similarity import ivf_cells

        emb = load_table(spark, SF_SMOKE, "embeddings")
        a = sorted(map(tuple, ivf_cells(emb).collect()))
        b = sorted(map(tuple, _spark_ivf_cells(spark, SF_SMOKE).collect()))
        assert a == b


class TestZOrderLayout:
    def test_morton_interleave_known_bits(self, spark):
        from propulsion_spark.operators.layout import zorder_key

        df = spark.createDataFrame(
            pd.DataFrame({"x": [0b11, 0b10, 0b00], "y": [0b00, 0b01, 0b11]}),
            "x long, y long",
        )
        out = [
            r["z"]
            for r in df.select(
                zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
            ).collect()
        ]
        # bit b of col i lands at b*2+i: x=11,y=00 → 0101 = 5;
        # x=10,y=01 → x-bit1@pos2 + y-bit0@pos1 = 0110 = 6
        assert out == [0b0101, 0b0110, 0b1010]

    def test_key_width_guard(self, spark):
        from propulsion_spark.operators.layout import zorder_key
        import pytest

        with pytest.raises(ValueError):
            zorder_key([F.lit(0)] * 4, bits=16)

    def test_sql_twin_matches_spark_keys(self, spark):
        """zorder_key_sql / quantize_sql (r10): the portable-SQL twin
        reproduces with_zorder_key's keys bit-for-bit in DuckDB — the
        contract the sketch_distinct_kmv zorder arm hashes on."""
        import duckdb

        from propulsion_spark.operators.layout import (
            quantize_sql,
            with_zorder_key,
            zorder_key_sql,
        )

        pdf = pd.DataFrame(
            {"x": [0.01, 3.7, 250.0, 490.02], "y": [0, 42, 7, 149]}
        )
        df = spark.createDataFrame(pdf, "x double, y long")
        got = sorted(
            (r["zkey"], r["q_x"], r["q_y"])
            for r in with_zorder_key(df, ["x", "y"], keep_quantized=True)
            .select("zkey", "q_x", "q_y")
            .collect()
        )
        con = duckdb.connect()
        con.register("t", pdf)
        want = sorted(
            map(
                tuple,
                con.sql(
                    f"""
            SELECT {zorder_key_sql(['qx', 'qy'])} AS zkey, qx, qy FROM (
              SELECT {quantize_sql('x', 'b.xlo', 'b.xhi')} AS qx,
                     {quantize_sql('y', 'b.ylo', 'b.yhi')} AS qy
              FROM t, (SELECT min(CAST(x AS DOUBLE)) xlo, max(CAST(x AS DOUBLE)) xhi,
                              min(CAST(y AS DOUBLE)) ylo, max(CAST(y AS DOUBLE)) yhi
                       FROM t) b)
            """
                ).fetchall(),
            )
        )
        assert got == want

    def test_prefix_buckets_are_grid_quadrants(self, spark):
        """The top 2k interleaved bits of a 2-column Morton key are the
        interleave of each column's top k bits — so a key-prefix bucket
        is exactly one (2^k × 2^k)-cell grid quadrant and its box
        envelope is ≤ 1/4^k of the space. This is the tight-stats
        invariant the zorder gauge arm (est_distinct ≤ 1/64 at k=3)
        reports; checked here over a randomized grid."""
        import random

        from propulsion_spark.operators.layout import zorder_key

        rng = random.Random(7)
        pdf = pd.DataFrame(
            {
                "x": [rng.randrange(4096) for _ in range(400)],
                "y": [rng.randrange(4096) for _ in range(400)],
            }
        )
        df = spark.createDataFrame(pdf, "x long, y long")
        rows = (
            df.withColumn("zkey", zorder_key([F.col("x"), F.col("y")], 12))
            .groupBy(F.shiftright("zkey", 18).alias("zb"))
            .agg(
                F.min("x").alias("xlo"),
                F.max("x").alias("xhi"),
                F.min("y").alias("ylo"),
                F.max("y").alias("yhi"),
            )
            .collect()
        )
        for r in rows:
            # each bucket confined to one 512-wide cell per dimension
            assert r["xhi"] - r["xlo"] < 512 and r["xlo"] // 512 == r["xhi"] // 512
            assert r["yhi"] - r["ylo"] < 512 and r["ylo"] // 512 == r["yhi"] // 512

    def test_zorder_skips_more_files_than_linear_sort(self, spark, tmp_path):
        """The point of the layout: a box predicate on (x, y) skips most
        z-ordered files, but almost no files of a y-sorted layout when
        filtering on x (and vice versa)."""
        from propulsion_spark.operators.layout import (
            file_skip_stats,
            layout_zorder,
        )

        n = 1 << 14
        df = spark.range(n).select(
            (F.col("id") % 128).alias("x"),
            (F.floor(F.col("id") / 128)).alias("y"),
            F.col("id").alias("payload"),
        )
        z_path = str(tmp_path / "z")
        lin_path = str(tmp_path / "lin")
        layout_zorder(df, ["x", "y"], num_files=16).write.parquet(z_path)
        df.repartitionByRange(16, "y").sortWithinPartitions(
            "y"
        ).write.parquet(lin_path)

        box = {"x": (0, 15), "y": (0, 15)}  # 1/64 of the grid
        z = file_skip_stats(z_path, box)
        # sampling-based range bounds wobble exact counts by a file, so
        # the pinned box claim is a conservative floor, not a horse race
        # against the y-sorted layout (which legitimately prunes a
        # y-BOUNDED box via its own sort dimension)
        assert z["files"] >= 8
        assert z["skipped"] / z["files"] >= 0.5
        # the property that IS z-order's: pruning survives on the
        # dimension the linear layout did NOT sort by — x-only
        # predicates skip nothing in the y-sorted layout and most
        # z-ordered files
        lin_x = file_skip_stats(lin_path, {"x": (0, 15)})
        z_x = file_skip_stats(z_path, {"x": (0, 15)})
        assert lin_x["files"] >= 8 and lin_x["skipped"] == 0
        assert z_x["skipped"] / z_x["files"] >= 0.5

    def test_layout_preserves_rows_and_schema(self, spark, tmp_path):
        from propulsion_spark.operators.layout import layout_zorder

        df = spark.range(1000).select(
            (F.col("id") % 10).alias("x"), F.col("id").alias("y")
        )
        out_path = str(tmp_path / "out")
        layout_zorder(df, ["x", "y"], num_files=4).write.parquet(out_path)
        back = spark.read.parquet(out_path)
        assert back.columns == ["x", "y"]
        assert back.count() == 1000
        assert back.agg(F.sum("y")).collect()[0][0] == 999 * 1000 // 2

    def test_constant_column_quantizes_to_zero(self, spark):
        from propulsion_spark.operators.layout import with_zorder_key

        df = spark.range(10).select(F.lit(7).alias("x"), F.col("id").alias("y"))
        keys = [r["zkey"] for r in with_zorder_key(df, ["x", "y"], bits=4).collect()]
        assert len(set(keys)) > 1  # y still differentiates


class TestDSIR:
    """Data Selection with Importance Resampling over the bigram-LM
    machinery: target-like docs outweigh raw-like docs, the Gumbel
    draw is deterministic."""

    def _mk(self, spark, rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]),
            "doc_id long, text string",
        )

    def _bcs(self, spark):
        from propulsion_spark.operators.lm import broadcast_lm, train_bigram_lm

        target = self._mk(
            spark,
            [(i, "quantum field theory lattice gauge boson " * 4) for i in range(5)],
        )
        raw = self._mk(
            spark,
            [(i, "buy cheap shoes online free shipping deals " * 4) for i in range(5)]
            + [(9, "quantum field theory lattice gauge boson " * 4)],
        )
        return (
            broadcast_lm(spark, train_bigram_lm(target)),
            broadcast_lm(spark, train_bigram_lm(raw)),
        )

    def test_target_like_docs_outweigh_raw_like(self, spark):
        from propulsion_spark.operators.dsir import dsir_weights

        t_bc, r_bc = self._bcs(spark)
        docs = self._mk(
            spark,
            [
                (1, "quantum field theory lattice gauge boson"),
                (2, "buy cheap shoes online free shipping deals"),
                (3, "quantum field theory free shipping deals"),
            ],
        )
        w = {r["doc_id"]: r["logw"] for r in dsir_weights(docs, t_bc, r_bc).collect()}
        assert w[1] > w[3] > w[2]
        assert w[1] > 0 and w[2] < 0

    def test_resample_prefers_target_and_is_deterministic(self, spark):
        from propulsion_spark.operators.dsir import dsir_resample

        t_bc, r_bc = self._bcs(spark)
        docs = self._mk(
            spark,
            [(i, "quantum field theory lattice gauge boson") for i in range(10)]
            + [(i, "buy cheap shoes online free shipping deals") for i in range(10, 40)],
        )
        # low temperature → essentially hard selection on weight
        got = sorted(
            r["doc_id"]
            for r in dsir_resample(docs, k=10, target_bc=t_bc, raw_bc=r_bc, tau=0.01).collect()
        )
        assert got == list(range(10))
        again = sorted(
            r["doc_id"]
            for r in dsir_resample(
                docs.repartition(7), k=10, target_bc=t_bc, raw_bc=r_bc, tau=0.01
            ).collect()
        )
        assert again == got

    def test_tau_zero_is_exact_topk_by_weight(self, spark):
        """τ=0 (advertised "hard top-k") must order by logw directly —
        dividing by 0.0 made ±Inf/NaN keys, and NaN sorts FIRST under
        desc, so zero-weight docs were selected before everything."""
        from propulsion_spark.operators.dsir import dsir_resample, dsir_weights

        t_bc, r_bc = self._bcs(spark)
        docs = self._mk(
            spark,
            [(i, "quantum field theory lattice gauge boson") for i in range(5)]
            # logw == 0 docs (same likelihood under both LMs): the old
            # 0/0 NaN key put these first; they must now rank by weight
            + [(i, "never seen grams xyzzy plugh") for i in range(5, 15)]
            + [(i, "buy cheap shoes online free shipping deals") for i in range(15, 30)],
        )
        w = {r["doc_id"]: r["logw"] for r in dsir_weights(docs, t_bc, r_bc).collect()}
        expect = sorted(w, key=lambda d: (-w[d], d))[:8]
        got = [
            r["doc_id"]
            for r in dsir_resample(docs, k=8, target_bc=t_bc, raw_bc=r_bc, tau=0.0)
            .orderBy(F.col("dsir_key").desc(), "doc_id")
            .collect()
        ]
        assert got == expect

    def test_gramless_docs_never_enter_the_draw(self, spark):
        from propulsion_spark.operators.dsir import dsir_resample

        t_bc, r_bc = self._bcs(spark)
        docs = self._mk(
            spark,
            [(1, "quantum field theory lattice"), (2, "word"), (3, "")],
        )
        got = [r["doc_id"] for r in dsir_resample(docs, 5, t_bc, r_bc).collect()]
        assert got == [1]

    def test_plan_is_take_ordered(self, spark):
        from propulsion_spark.operators.dsir import dsir_resample

        t_bc, r_bc = self._bcs(spark)
        docs = self._mk(spark, [(i, "quantum field theory") for i in range(20)])
        plan = (
            dsir_resample(docs, 3, t_bc, r_bc)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestSemDedupStream:
    """Cross-batch streaming SemDeDup over the durable keeper registry."""

    def _emb_docs(self, spark, rows):
        # rows: (doc_id, [floats])
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "embedding"]),
            "doc_id long, embedding array<float>",
        )

    def _codebook(self, spark):
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

    def _stream(self, spark, tmp_path, **kw):
        from propulsion_spark.pipelines import SemDedupStream

        return SemDedupStream(
            spark, str(tmp_path / "reg"), self._codebook(spark), **kw
        )

    def test_cross_batch_duplicate_caught(self, spark, tmp_path):
        s = self._stream(spark, tmp_path)
        b1 = self._emb_docs(spark, [(1, [1.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0])])
        out1 = sorted(r.doc_id for r in s.process_batch(b1, 0).collect())
        assert out1 == [1, 2]
        # batch 2: 3 ≈ 1 (same direction) → cross-batch drop; 4 novel
        b2 = self._emb_docs(spark, [(3, [2.0, 0.0, 0.0]), (4, [0.0, 1.0, 0.0])])
        out2 = sorted(r.doc_id for r in s.process_batch(b2, 1).collect())
        assert out2 == [4]
        assert s.stats["deduped_cross_batch"] == 1
        assert s.stats["kept"] == 3

    def test_intra_batch_before_registry(self, spark, tmp_path):
        s = self._stream(spark, tmp_path)
        b = self._emb_docs(
            spark,
            [(1, [1.0, 0.0, 0.0]), (2, [3.0, 0.0, 0.0]), (3, [0.0, 0.0, 1.0])],
        )
        out = sorted(r.doc_id for r in s.process_batch(b, 0).collect())
        assert out == [1, 3]
        assert s.stats["deduped_in_batch"] == 1
        assert s.stats["deduped_cross_batch"] == 0

    def test_replay_is_idempotent(self, spark, tmp_path):
        s = self._stream(spark, tmp_path)
        b = self._emb_docs(spark, [(1, [1.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0])])
        first = sorted(r.doc_id for r in s.process_batch(b, 0).collect())
        replay = sorted(r.doc_id for r in s.process_batch(b, 0).collect())
        # a keeper re-seeing its own registration survives again
        assert first == replay == [1, 2]

    def test_unembeddable_rows_kept(self, spark, tmp_path):
        s = self._stream(spark, tmp_path)
        b = spark.createDataFrame(
            pd.DataFrame(
                [
                    (1, [1.0, 0.0, 0.0]),
                    (2, None),
                    (3, [0.0, 0.0, 0.0]),  # zero norm: cosine undefined
                ],
                columns=["doc_id", "embedding"],
            ),
            "doc_id long, embedding array<float>",
        )
        out = sorted(r.doc_id for r in s.process_batch(b, 0).collect())
        assert out == [1, 2, 3]
        assert s.stats["unembeddable"] == 2

    def test_stream_into_availablenow(self, spark, tmp_path):
        import glob

        src = str(tmp_path / "src")
        b = self._emb_docs(
            spark,
            [(i, [1.0, 0.0, 0.0]) for i in range(5)]
            + [(i, [0.0, 0.0, 1.0]) for i in range(10, 15)],
        )
        b.write.parquet(src)
        s = self._stream(spark, tmp_path)
        q = s.stream_into(
            spark.readStream.schema(
                "doc_id long, embedding array<float>"
            ).parquet(src),
            str(tmp_path / "out"),
            str(tmp_path / "ck"),
        )
        q.awaitTermination(120)
        kept = sorted(
            r.doc_id
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        )
        # one keeper per direction
        assert kept == [0, 10]
        assert glob.glob(str(tmp_path / "out") + "/_batch_id=*")

    def test_stats_ride_the_metrics_exporter(self, spark, tmp_path):
        from propulsion_spark.streaming.metrics import MetricsExporter

        s = self._stream(spark, tmp_path)
        s.process_batch(
            self._emb_docs(spark, [(1, [1.0, 0.0, 0.0]), (2, [2.0, 0.0, 0.0])]), 0
        ).count()
        text = MetricsExporter(group="sd").register_semantic_dedup(s).render()
        assert "propulsion_semantic_dedup_total" in text
        assert 'stage="deduped_in_batch"' in text

    def test_registry_compaction_preserves_keepers(self, spark, tmp_path):
        """Crossing compact_after mid-stream folds the delta segments;
        keepers registered before the fold still dedup afterwards."""
        s = self._stream(spark, tmp_path, compact_after=3, threshold=0.9)
        # five single-vector batches, all distinct directions
        dirs = [
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [1.0, 1.0, 0.0],
            [0.0, 1.0, 1.0],
        ]
        for i, d in enumerate(dirs):
            out = s.process_batch(self._emb_docs(spark, [(i, d)]), i)
            assert [r.doc_id for r in out.collect()] == [i]
        # batch 6 redelivers a copy of the FIRST keeper (registered
        # before any compaction) — still caught
        out = s.process_batch(
            self._emb_docs(spark, [(100, [2.0, 0.0, 0.0])]), 6
        )
        assert out.count() == 0
        assert s.stats["deduped_cross_batch"] == 1


    def test_int8_registry_catches_the_same_duplicates(self, spark, tmp_path):
        """int8_registry=True (r10): keepers stored as max-abs int8
        codes (¼ bytes), verify dequantizes the keeper side only — on
        the fixture the SAME cross-batch duplicates are caught and the
        same distinct directions survive (threshold margin ≫ the ~1e-2
        dequantization error)."""
        s = self._stream(spark, tmp_path, int8_registry=True)
        out0 = s.process_batch(
            self._emb_docs(spark, [(1, [1.0, 0.0, 0.0])]), 0
        )
        assert [r.doc_id for r in out0.collect()] == [1]
        # near-duplicate of keeper 1 → caught through the int8 codes
        out1 = s.process_batch(
            self._emb_docs(spark, [(2, [0.98, 0.02, 0.0])]), 1
        )
        assert out1.count() == 0
        assert s.stats["deduped_cross_batch"] == 1
        # a genuinely distinct direction still survives
        out2 = s.process_batch(
            self._emb_docs(spark, [(3, [0.0, 0.0, 1.0])]), 2
        )
        assert [r.doc_id for r in out2.collect()] == [3]
        # the registry really holds codes, not floats
        row = s.registry.read().filter(F.col("keeper") == 1).collect()[0]
        assert -128 <= min(row.qvec) and max(row.qvec) <= 127
        assert row.qscale > 0 and abs(row.nrm - 1.0) < 1e-6

    def test_registry_scan_prunes_to_touched_buckets(self, spark, tmp_path):
        """r10: segments are partitioned by cell bucket and a batch's
        registry join lists ONLY the bucket subdirs its rows touch —
        pinned by the PartitionFilters on every FileScan of the pruned
        read's physical plan."""
        from propulsion_spark.pipelines.semantic_dedup import _SemVecTable

        s = self._stream(spark, tmp_path)
        # keepers in both cells (cell 0 and cell 1 → different buckets)
        s.process_batch(
            self._emb_docs(
                spark, [(1, [1.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0])]
            ),
            0,
        )
        cells = {
            r.cell
            for r in s.registry.read().select("cell").distinct().collect()
        }
        assert len(cells) == 2  # the pin needs two distinct buckets
        b0, b1 = sorted(c % _SemVecTable.N_BUCKETS for c in cells)
        assert b0 != b1
        pruned = s.registry.read_buckets([b0])
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        scans = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert scans, "pruned read lost its partition filters"
        assert all(f"= {b0})" in ln for ln in scans)
        # and the pruned view still resolves exactly bucket b0's keepers
        assert {r.keeper for r in pruned.collect()} == {
            r.keeper
            for r in s.registry.read()
            .filter((F.col("cell") % _SemVecTable.N_BUCKETS) == b0)
            .collect()
        }
        # empty bucket list short-circuits to an empty frame, no scan
        assert s.registry.read_buckets([]).count() == 0

    def test_bucket_pruning_survives_compaction(self, spark, tmp_path):
        """The compacted base is re-partitioned by bucket too — pruned
        reads stay pruned after the fold, and cross-batch dedup still
        catches a redelivered keeper afterwards."""
        s = self._stream(spark, tmp_path, compact_after=2)
        dirs = [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]
        for i, d in enumerate(dirs):
            s.process_batch(self._emb_docs(spark, [(i, d)]), i)
        # compaction crossed: now redeliver keeper 0 — must be caught
        out = s.process_batch(
            self._emb_docs(spark, [(50, [0.99, 0.01, 0.0])]), 9
        )
        assert out.count() == 0
        assert s.stats["deduped_cross_batch"] >= 1
        some_bucket = [
            r[0]
            for r in s.registry.read()
            .select((F.col("cell") % 16).cast("int"))
            .distinct()
            .collect()
        ][:1]
        pruned = s.registry.read_buckets(some_bucket)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        scans = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert scans and all("_bkt" in ln for ln in scans)


class TestRRFFusion:
    def _ranked(self, spark, pairs):
        return spark.createDataFrame(
            pd.DataFrame(pairs, columns=["doc_id", "rank"]),
            "doc_id long, rank long",
        )

    def test_fused_scores_match_formula(self, spark):
        from propulsion_spark.operators.similarity import RRF_K, rrf_fuse

        bm25 = self._ranked(spark, [(1, 1), (2, 2), (3, 3)])
        ann = self._ranked(spark, [(3, 1), (1, 2), (4, 3)])
        out = {r["doc_id"]: r for r in rrf_fuse([bm25, ann]).collect()}
        assert out[1]["rrf_score"] == 1.0 / (RRF_K + 1) + 1.0 / (RRF_K + 2)
        assert out[4]["rrf_score"] == 1.0 / (RRF_K + 3)
        assert out[1]["n_lists"] == 2 and out[4]["n_lists"] == 1
        # doc in both lists outranks single-list docs here
        assert out[1]["fused_rank"] == 1
        ranks = sorted(r["fused_rank"] for r in out.values())
        assert ranks == [1, 2, 3, 4]

    def test_grouped_fusion_ranks_within_each_query(self, spark):
        """by=['query_id'] (r10): fusion and the rank window run per
        group — each query gets its own 1..n fused ranking, the
        multi-query retrieval shape the similarity_recall arm attests."""
        from propulsion_spark.operators.similarity import rrf_fuse

        def ranked(rows):
            return spark.createDataFrame(
                pd.DataFrame(rows, columns=["query_id", "doc_id", "rank"]),
                "query_id long, doc_id long, rank long",
            )

        a = ranked([(0, 10, 1), (0, 7, 2), (1, 5, 1)])
        b = ranked([(0, 20, 1), (0, 7, 2), (1, 6, 1), (1, 5, 2)])
        out = {
            (r["query_id"], r["doc_id"]): r["fused_rank"]
            for r in rrf_fuse([a, b], by=["query_id"]).collect()
        }
        # per-query consensus wins; ranks restart at 1 in each group
        assert out[(0, 7)] == 1
        assert out[(1, 5)] == 1
        assert sorted(v for (q, _), v in out.items() if q == 0) == [1, 2, 3]
        assert sorted(v for (q, _), v in out.items() if q == 1) == [1, 2]

    def test_consensus_beats_single_list_top(self, spark):
        """A doc ranked 2nd by both systems outranks a doc ranked 1st
        by only one — the property RRF is used for."""
        from propulsion_spark.operators.similarity import rrf_fuse

        a = self._ranked(spark, [(10, 1), (7, 2)])
        b = self._ranked(spark, [(20, 1), (7, 2)])
        out = {r["doc_id"]: r["fused_rank"] for r in rrf_fuse([a, b]).collect()}
        assert out[7] == 1

    def test_end_to_end_bm25_plus_ann(self, spark):
        """Fuse real BM25 ranks with real brute-force cosine ranks over
        the fixture tables (doc_id == vec_id)."""
        from propulsion_spark.operators.similarity import (
            q_similarity_topk_bruteforce,
            rrf_fuse,
        )
        from propulsion_spark.operators.textops import bm25_topk
        from propulsion_spark import load_table

        docs = load_table(spark, SF_SMOKE, "documents")
        bm25 = bm25_topk(docs, terms=("hash",), k=10)
        ann = (
            q_similarity_topk_bruteforce(spark, SF_SMOKE)
            .filter(F.col("query_id") == 0)
            .select(F.col("neighbor_id").alias("doc_id"), "rank")
        )
        fused = rrf_fuse([bm25, ann])
        rows = fused.collect()
        assert len(rows) >= 10
        ranks = sorted(r["fused_rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))


class TestFuzzySegmentStats:
    def test_occupancy_and_pair_count(self, spark):
        from propulsion_spark.operators.dedup import (
            FUZZY_MAXD,
            fuzzy_segment_stats,
        )

        # 4 identical keys + 2 distinct → first segment bucket of 4:
        # candidate_pairs = 4*3 = 12 in that bucket
        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": range(6),
                    "text": ["shared prefix words tail"] * 4
                    + ["first unique document text", "second unique other text"],
                }
            ),
            "doc_id long, text string",
        )
        rows = {r["i"]: r for r in fuzzy_segment_stats(docs).collect()}
        assert set(rows) == set(range(FUZZY_MAXD + 1))
        for r in rows.values():
            assert r["max_bucket"] >= 4
            assert r["candidate_pairs"] >= 12
            assert r["n_buckets"] <= 3  # 4 shared + ≤2 unique values

    def test_gauge_predicts_join_work(self, spark):
        """The gauge's candidate_pairs bounds what the join builds:
        uniform keys → tiny buckets → near-zero candidates."""
        from propulsion_spark.operators.dedup import fuzzy_segment_stats

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": range(50),
                    "text": [
                        f"a{i} b{i * 7} c{i * 13} d{i * 31} e{i * 3} f{i * 11}"
                        for i in range(50)
                    ],
                }
            ),
            "doc_id long, text string",
        )
        rows = fuzzy_segment_stats(docs).collect()
        total = sum(r["candidate_pairs"] for r in rows)
        assert total < 50 * 49  # far from all-pairs

    def test_complete_on_randomized_low_entropy_corpus(self, spark):
        """Pigeonhole completeness under stress: a seeded random corpus
        over a 3-char alphabet (maximal segment collisions, heavy
        padding, many ties) still matches all-pairs brute force."""
        import itertools
        import random

        from propulsion_spark.operators.dedup import (
            FUZZY_MAXD,
            _fuzzy_key,
            fuzzy_edit_pairs,
        )

        rng = random.Random(9)
        texts = [
            "".join(rng.choice("ab ") for _ in range(rng.randint(0, 20)))
            for _ in range(40)
        ]
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
            "doc_id long, text string",
        )
        got = sorted(
            (r["a_id"], r["b_id"], r["dist"])
            for r in fuzzy_edit_pairs(docs).collect()
        )
        keys = {
            r["doc_id"]: r["k"]
            for r in docs.selectExpr(
                "doc_id", f"{_fuzzy_key('spark')} AS k"
            ).collect()
        }

        def lev(a, b):
            m, n = len(a), len(b)
            dp = list(range(n + 1))
            for i in range(1, m + 1):
                prev, dp[0] = dp[0], i
                for j in range(1, n + 1):
                    cur = dp[j]
                    dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                    prev = cur
            return dp[n]

        want = sorted(
            (a, b, lev(keys[a], keys[b]))
            for a, b in itertools.combinations(sorted(keys), 2)
            if lev(keys[a], keys[b]) <= FUZZY_MAXD
        )
        assert got == want and len(want) > 0


class TestDSIRCurationGate:
    DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
    TARGETY = (
        "quantum field theory lattice gauge boson operator spectrum "
        "renormalization flows keep this document safely above gates"
    )
    RAWY = (
        "buy cheap shoes online free shipping deals discount voucher "
        "coupon promo codes keep this document safely above gates"
    )

    def _doc(self, doc_id, text):
        return {
            "doc_id": doc_id,
            "text": text,
            "lang": "en",
            "source": "s",
            "n_chars": len(text),
        }

    def _lms(self, spark):
        from propulsion_spark.operators.lm import train_bigram_lm

        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            pd.DataFrame(rows), self.DOC_SCHEMA
        )
        target = mk([self._doc(i, self.TARGETY) for i in range(5)])
        raw = mk(
            [self._doc(i, self.RAWY) for i in range(5)]
            + [self._doc(9, self.TARGETY)]
        )
        return train_bigram_lm(target), train_bigram_lm(raw)

    def test_gate_drops_raw_like_docs(self, spark, tmp_path):
        from propulsion_spark.pipelines import CurationPipeline

        t_lm, r_lm = self._lms(spark)
        docs = spark.createDataFrame(
            pd.DataFrame(
                [self._doc(1, self.TARGETY), self._doc(2, self.RAWY)]
            ),
            self.DOC_SCHEMA,
        )
        pipe = CurationPipeline(
            spark,
            str(tmp_path / "out"),
            dsir_target_lm=t_lm,
            dsir_raw_lm=r_lm,
        )
        pipe.process_batch(docs)
        assert [r.doc_id for r in pipe.curated().collect()] == [1]
        assert pipe.stats["rejected_dsir"] == 1
        assert pipe.stats["kept"] == 1

    def test_both_lms_required(self, spark, tmp_path):
        import pytest

        from propulsion_spark.pipelines import CurationPipeline

        t_lm, _ = self._lms(spark)
        with pytest.raises(ValueError, match="BOTH"):
            CurationPipeline(
                spark, str(tmp_path / "out"), dsir_target_lm=t_lm
            )


class TestSemDedupCellStats:
    def test_occupancy_and_pairs(self, spark):
        from propulsion_spark.operators.similarity import semdedup_cell_stats

        cells = _cells(spark, [(i, i % 3) for i in range(9)] + [(100, 7)])
        row = semdedup_cell_stats(cells).collect()[0]
        assert row["n_cells"] == 4
        assert row["max_cell"] == 3
        # 3 cells of 3 → 3·C(3,2)=9 pairs; singleton adds 0
        assert row["candidate_pairs"] == 9
        assert row["avg_cell"] == 10 / 4


class TestSemDedupGroups:
    def test_chain_groups_and_lowest_centroid_keep(self, spark):
        """Three chained near-dups in one cell form ONE group even when
        the endpoints are below threshold pairwise (the ε-connected
        contract), and the keeper is the member FARTHEST from the
        centroid (lowest cosine), per the paper's diversity rule."""
        from propulsion_spark.operators.similarity import (
            centroids_frame,
            semdedup_groups,
        )

        # cell 0 centroid will be the mean of the seed vectors
        seed = spark.createDataFrame(
            pd.DataFrame(
                [(50, [1.0, 0.0], 0), (51, [0.8, 0.6], 0)],
                columns=["vec_id", "embedding", "label"],
            ),
            "vec_id long, embedding array<float>, label int",
        )
        cent = centroids_frame(seed)
        # chain: 1-2 close, 2-3 close, 1-3 farther; all in cell 0
        normed = _normed(
            spark,
            [(1, [1.0, 0.0]), (2, [0.95, 0.3122499]), (3, [0.8, 0.6])],
        )
        cells = _cells(spark, [(1, 0), (2, 0), (3, 0)])
        rows = {
            r["vec_id"]: r
            for r in semdedup_groups(
                normed, cells, centroids=cent, threshold=0.94
            ).collect()
        }
        assert len({r["group"] for r in rows.values()}) == 1
        keepers = [v for v, r in rows.items() if r["keep"]]
        assert len(keepers) == 1
        # centroid ≈ (0.9, 0.3): vec 1 and vec 3 are the boundary
        # members; exactly one of them (the lower-cosine one) survives
        assert keepers[0] in (1, 3)

    def test_singletons_kept(self, spark):
        from propulsion_spark.operators.similarity import semdedup_groups

        normed = _normed(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
        cells = _cells(spark, [(1, 0), (2, 0)])
        rows = semdedup_groups(normed, cells, threshold=0.9).collect()
        assert all(r["keep"] for r in rows)
        assert {r["group"] for r in rows} == {1, 2}

    def test_lowest_id_fallback_matches_verdicts(self, spark):
        """Without centroids the group resolution keeps the lowest id —
        consistent with semdedup_verdicts' drop set on non-chained
        duplicates."""
        from propulsion_spark.operators.similarity import semdedup_groups

        normed = _normed(
            spark, [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (7, [0.0, 1.0])]
        )
        cells = _cells(spark, [(1, 0), (2, 0), (7, 0)])
        rows = {r["vec_id"]: r for r in semdedup_groups(normed, cells).collect()}
        assert rows[1]["keep"] and not rows[2]["keep"] and rows[7]["keep"]
        drops_v = {
            r["b_id"]
            for r in semdedup_verdicts(normed, cells).collect()
        }
        drops_g = {v for v, r in rows.items() if not r["keep"]}
        assert drops_g == drops_v


class TestZorderKeyProperty:
    def test_interleave_matches_python_reference_randomized(self, spark):
        """One batched check over 300 seeded-random (x, y, z) triples:
        the JVM shift/mask key equals a bit-level Python reference."""
        import random

        from propulsion_spark.operators.layout import zorder_key

        rng = random.Random(17)
        bits = 10
        rows = [
            (
                i,
                rng.randrange(1 << bits),
                rng.randrange(1 << bits),
                rng.randrange(1 << bits),
            )
            for i in range(300)
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["i", "x", "y", "z"]),
            "i long, x long, y long, z long",
        )
        got = {
            r["i"]: r["k"]
            for r in df.select(
                "i",
                zorder_key(
                    [F.col("x"), F.col("y"), F.col("z")], bits=bits
                ).alias("k"),
            ).collect()
        }

        def ref(x, y, z):
            k = 0
            for b in range(bits):
                k |= ((x >> b) & 1) << (b * 3 + 0)
                k |= ((y >> b) & 1) << (b * 3 + 1)
                k |= ((z >> b) & 1) << (b * 3 + 2)
            return k

        for i, x, y, z in rows:
            assert got[i] == ref(x, y, z)
