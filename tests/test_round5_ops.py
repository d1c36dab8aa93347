"""Unit tests for the round-5 operators: connected-components cluster
resolution, TF-IDF keywords, corpus n-gram stats, mixture sampling, and
time-series resample/gap-fill — targeted semantic cases the corpus-wide
oracle parity test (test_oracle_parity) can't isolate.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from propulsion_spark.operators.dedup import connected_components
from propulsion_spark.operators.textops import (
    MIXTURE_BP,
    MIXTURE_DEFAULT_BP,
    _mixture_case,
)


def _labels(spark, pairs):
    edges = spark.createDataFrame(pairs, "a_id long, b_id long")
    return {
        r["node"]: r["label"] for r in connected_components(edges).collect()
    }


class TestConnectedComponents:
    def test_chain_collapses_to_min(self, spark):
        # transitive chain: A~B, B~C never sampled A~C — one cluster
        got = _labels(spark, [(1, 2), (2, 3), (3, 4)])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    def test_disjoint_components_stay_apart(self, spark):
        got = _labels(spark, [(5, 9), (20, 30), (30, 25)])
        assert got == {5: 5, 9: 5, 20: 20, 25: 20, 30: 20}

    def test_long_chain_needs_multiple_rounds(self, spark):
        # path graph of 12 nodes: min-label needs several propagation
        # rounds; convergence detection must not stop early
        n = 12
        got = _labels(spark, [(i, i + 1) for i in range(n)])
        assert set(got.values()) == {0}
        assert len(got) == n + 1

    def test_min_id_is_canonical_regardless_of_edge_order(self, spark):
        # the smallest doc_id arrives via the "wrong" end of the edges
        got = _labels(spark, [(50, 40), (40, 7), (90, 50)])
        assert set(got.values()) == {7}


class TestDedupClustersQuery:
    def test_clusters_partition_the_paired_docs(self, spark):
        from propulsion_spark.operators import load_all

        reg = load_all()
        sf = "/root/testdata/sf0.001"
        rows = reg["dedup_clusters"].build(spark, sf).collect()
        assert rows, "fixture corpus has near-dup pairs"
        by_cluster: dict[int, list] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        for cid, members in by_cluster.items():
            # cluster id is the min member id and exactly one canonical
            assert min(m["doc_id"] for m in members) == cid
            assert sum(1 for m in members if m["is_canonical"]) == 1
            assert all(m["cluster_size"] == len(members) for m in members)
        # every candidate pair lands in ONE cluster (that's the point)
        pairs = (
            reg["dedup_minhash_lsh_pairs"]
            .build(spark, sf)
            .filter(F.col("stage") == "candidate")
            .select("a_id", "b_id")
            .collect()
        )
        label = {r["doc_id"]: r["cluster_id"] for r in rows}
        for p in pairs:
            assert label[p["a_id"]] == label[p["b_id"]]


class TestMixtureSampling:
    def test_case_expression_covers_default(self):
        expr = _mixture_case()
        assert f"ELSE {MIXTURE_DEFAULT_BP}" in expr
        for lang, bp in MIXTURE_BP.items():
            assert f"WHEN '{lang}' THEN {bp}" in expr

    def test_sampling_is_deterministic_and_lang_rated(self, spark):
        from propulsion_spark import load_table
        from propulsion_spark.operators.dedup import SPARK_H64

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        sampled = (
            F.expr(SPARK_H64.format(x="concat(cast(doc_id as string), '-mix')"))
            % 10000
            < F.expr(_mixture_case())
        )
        agg = (
            docs.select("lang", sampled.alias("s"))
            .groupBy("lang")
            .agg(F.count("*").alias("n"), F.sum(F.col("s").cast("long")).alias("k"))
            .collect()
        )
        rates = {r["lang"]: (r["k"], r["n"]) for r in agg}
        # en keeps everything (rate 10000/10000)
        k, n = rates["en"]
        assert k == n
        # zh is downsampled hard (2500 bp): strictly fewer than all
        k, n = rates["zh"]
        assert 0 < k < n
        # deterministic: a second evaluation is identical
        again = (
            docs.select("lang", sampled.alias("s"))
            .groupBy("lang")
            .agg(F.sum(F.col("s").cast("long")).alias("k"))
            .collect()
        )
        assert {r["lang"]: r["k"] for r in again} == {
            lang: k for lang, (k, _) in rates.items()
        }


class TestTimeseriesResample:
    def test_gap_rows_forward_fill(self, spark):
        t0 = dt.datetime(2024, 1, 1, 0, 30)
        rows = [
            (1, t0, 10.0),
            (1, t0 + dt.timedelta(hours=3, minutes=5), 4.0),  # 2-hour gap
            (2, t0, 7.0),
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        ev.createOrReplaceTempView("_r5_events")

        from propulsion_spark.operators.timeseries import q_timeseries_resample
        from unittest import mock

        import propulsion_spark.operators.timeseries as ts_mod

        with mock.patch.object(ts_mod, "load_table", lambda s, d, t: ev):
            out = q_timeseries_resample(spark, "ignored").orderBy(
                "user_id", "hour"
            ).collect()
        u1 = [r for r in out if r["user_id"] == 1]
        assert len(u1) == 4  # hours 0..3 inclusive
        assert [r["n_events"] for r in u1] == [1, 0, 0, 1]
        assert [r["gap_filled"] for r in u1] == [False, True, True, False]
        # the 10.0 observed at hour 0 carries across the two empty hours
        assert [r["hi_ffill"] for r in u1] == [10.0, 10.0, 10.0, 4.0]
        assert [r["volume"] for r in u1] == [10.0, 0.0, 0.0, 4.0]
        u2 = [r for r in out if r["user_id"] == 2]
        assert len(u2) == 1 and u2[0]["n_events"] == 1


class TestTfidfKeywords:
    def test_rare_term_outranks_common(self, spark):
        from unittest import mock

        import propulsion_spark.operators.textops as t_mod
        from propulsion_spark.operators.textops import q_text_tfidf_keywords

        docs = spark.createDataFrame(
            [
                (0, "alpha alpha shared", "en", "s", 18),
                (1, "beta shared shared", "en", "s", 18),
                (2, "gamma shared other", "en", "s", 18),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        with mock.patch.object(t_mod, "load_table", lambda s, d, t: docs):
            out = q_text_tfidf_keywords(spark, "ignored").collect()
        top = {r["doc_id"]: r["token"] for r in out if r["rank"] == 1}
        # doc 0: 'alpha' (tf=2, df=1, score 6) beats 'shared' (tf=1, df=3)
        assert top[0] == "alpha"
        assert top[1] == "beta"
        assert top[2] == "gamma"
        d0 = {r["token"]: r for r in out if r["doc_id"] == 0}
        assert d0["alpha"]["score"] == 2 * 3 / 1


class TestSequencePacking:
    def test_offsets_exact_and_boundary_straddle(self, spark):
        from propulsion_spark.operators.packing import pack_documents

        rows = [
            ("train", 1, 60),
            ("train", 2, 50),  # offset 60 → straddles the 100 boundary
            ("train", 3, 0),   # zero-token doc takes no space
            ("train", 4, 95),  # offset 110
            ("val", 10, 30),   # independent stream per split
        ]
        docs = spark.createDataFrame(rows, "split string, doc_id long, n_tokens long")
        got = {
            r["doc_id"]: (r["offset"], r["first_seq"], r["last_seq"], r["n_seqs"])
            for r in pack_documents(docs, seq_len=100).collect()
        }
        assert got[1] == (0, 0, 0, 1)
        assert got[2] == (60, 0, 1, 2)  # straddles sequences 0 and 1
        assert got[3] == (110, 1, 1, 1)
        assert got[4] == (110, 1, 2, 2)
        assert got[10] == (0, 0, 0, 1)

    def test_offsets_independent_of_partitioning(self, spark):
        """The two-phase prefix sum must produce identical offsets for
        any partition count — the reproducibility contract."""
        from propulsion_spark.operators.packing import pack_documents

        rows = [("train", i, (i * 7) % 13 + 1) for i in range(200)]
        docs = spark.createDataFrame(rows, "split string, doc_id long, n_tokens long")
        a = {
            r["doc_id"]: r["offset"]
            for r in pack_documents(docs, 64, num_partitions=1).collect()
        }
        b = {
            r["doc_id"]: r["offset"]
            for r in pack_documents(docs, 64, num_partitions=7).collect()
        }
        assert a == b
        # offsets are a dense prefix sum in doc_id order
        run = 0
        for i in range(200):
            assert a[i] == run
            run += (i * 7) % 13 + 1


class TestConnectedComponentsRandomized:
    def test_matches_union_find_on_seeded_random_graphs(self, spark):
        """Cross-check the distributed min-label propagation against a
        pure-Python union-find on seeded random graphs (including a
        dense one and a sparse chain-heavy one)."""
        import random

        for seed, n_nodes, n_edges in [(1, 30, 15), (2, 40, 80), (3, 25, 24)]:
            rng = random.Random(seed)
            edges = [
                tuple(rng.sample(range(n_nodes), 2)) for _ in range(n_edges)
            ]
            parent = list(range(n_nodes))

            def find(a):
                while parent[a] != a:
                    parent[a] = parent[parent[a]]
                    a = parent[a]
                return a

            for a, b in edges:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            touched = {x for e in edges for x in e}
            want = {x: find(x) for x in touched}
            got = _labels(spark, [(a, b) for a, b in edges])
            assert got == want, f"seed {seed}"


class TestConnectedComponentsPathological:
    def test_long_path_converges_within_round_cap(self, spark):
        """300-node path graph: one-hop-only min propagation would need
        ~300 rounds — far past CC_MAX_ITERS=50 — so this test fails if
        the pointer-compression step is ever dropped; with it the loop
        converges in O(log n) rounds."""
        got = _labels(spark, [(i, i + 1) for i in range(300)])
        assert set(got.values()) == {0}
        assert len(got) == 301


class TestSequenceManifest:
    def test_per_sequence_doc_lists_and_fill(self, spark):
        from propulsion_spark.operators.packing import (
            pack_documents,
            sequence_manifest,
        )

        rows = [
            ("train", 1, 60),
            ("train", 2, 50),   # straddles seq 0→1
            ("train", 3, 0),    # zero-token doc at offset 110
            ("train", 4, 95),   # offset 110, straddles seq 1→2
        ]
        docs = spark.createDataFrame(rows, "split string, doc_id long, n_tokens long")
        packed = pack_documents(docs, seq_len=100)
        got = {
            r["seq_id"]: (r["doc_ids"], r["n_docs"], r["fill_tokens"])
            for r in sequence_manifest(packed, seq_len=100).collect()
        }
        assert got[0] == ([1, 2], 2, 100)       # 60 + first 40 of doc 2
        assert got[1] == ([2, 3, 4], 3, 100)    # 10 + 0 + first 90 of doc 4
        assert got[2] == ([4], 1, 5)            # the partial tail
