"""Round 12 operators: batched hybrid serving (pipelines/hybrid.py).

The contract is amortization WITHOUT drift: N queries through one
pruned postings scan + one ANN pass + per-query RRF must answer each
query exactly like the single-query path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.operators.similarity import rrf_fuse
from propulsion_spark.pipelines.ann_index import AnnIndex
from propulsion_spark.pipelines.hybrid import hybrid_search_many
from propulsion_spark.pipelines.lexical_index import LexicalIndex

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("hybrid")
    lex = LexicalIndex.build(spark, SF, str(root / "lex"))
    ann = AnnIndex.build(spark, SF, str(root / "ann"), learned=False)
    return lex, ann


def _queries(spark, specs):
    emb = load_table(spark, SF, "embeddings")
    by_id = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(
            F.col("vec_id").isin([v for _, _, v in specs])
        ).collect()
    }
    return spark.createDataFrame(
        [(qid, list(terms), by_id[vid]) for qid, terms, vid in specs],
        "query_id long, terms array<string>, embedding array<double>",
    )


def _ref_substr_spans(texts, n, min_dup, keep_first=False):
    """Pure-Python ExactSubstr reference: same tokenizer equivalence
    (split(lower(trim)), '' artifacts included), gram counting over
    ALL occurrences (self-repetition counts), optional canonical-
    occurrence exemption, interval coalescing."""
    import re
    from collections import defaultdict

    toks = {d: re.split(r"\s+", t.strip().lower()) for d, t in texts.items()}
    occ = defaultdict(list)
    for d in sorted(toks):
        ts = toks[d]
        for i in range(len(ts) - n + 1):
            occ[tuple(ts[i : i + n])].append((d, i))
    hits = defaultdict(set)
    for lst in occ.values():
        if len(lst) >= min_dup:
            first = min(lst)
            for d, i in lst:
                if keep_first and (d, i) == first:
                    continue
                hits[d].add(i)
    spans = {}
    for d, starts in hits.items():
        out = []
        for s in sorted(starts):
            if out and s <= out[-1][1]:
                out[-1][1] = max(out[-1][1], s + n)
            else:
                out.append([s, s + n])
        spans[d] = [tuple(x) for x in out]
    return spans


class TestSubstringDedup:
    """ExactSubstr spans (operators/substring_dedup.py): duplicated
    passages found and masked, exact agreement with the pure-Python
    reference over the same tokenizer."""

    PASSAGE = "the quick brown fox jumps over the lazy dog again"

    def _corpus(self, spark):
        texts = {
            1: f"alpha beta {self.PASSAGE} gamma delta",
            2: f"unrelated opening words here {self.PASSAGE}",
            3: "completely distinct document with no shared passage",
            4: "repeat me now please repeat me now please tail",
        }
        return texts, spark.createDataFrame(
            sorted(texts.items()), "doc_id long, text string"
        )

    def test_planted_passage_spans_exact(self, spark):
        from propulsion_spark.operators.substring_dedup import (
            repeated_ngram_spans,
        )

        texts, docs = self._corpus(spark)
        got = {}
        for r in repeated_ngram_spans(docs, n=4, min_dup=2).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"])
            )
        want = _ref_substr_spans(texts, n=4, min_dup=2)
        assert {d: sorted(v) for d, v in got.items()} == want
        # the 10-token passage coalesces to ONE span of exactly 10
        assert [e - s for s, e in got[1]] == [10]
        assert 3 not in got  # clean doc: no spans
        assert 4 in got  # within-doc self-repetition counts

    def test_random_corpus_matches_reference(self, spark):
        """Adversarial cross-check: a seeded random corpus over a tiny
        vocabulary (forcing real gram collisions), both keep_first
        modes."""
        import random

        from propulsion_spark.operators.substring_dedup import (
            repeated_ngram_spans,
        )

        rng = random.Random(12012)
        vocab = ["a", "b", "c", "d"]
        texts = {
            d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
            for d in range(20)
        }
        docs = spark.createDataFrame(
            sorted(texts.items()), "doc_id long, text string"
        )
        for keep_first in (False, True):
            got = {}
            for r in repeated_ngram_spans(
                docs, n=5, min_dup=3, keep_first=keep_first
            ).collect():
                got.setdefault(r["doc_id"], []).append(
                    (r["span_start"], r["span_end"])
                )
            want = _ref_substr_spans(texts, n=5, min_dup=3, keep_first=keep_first)
            assert {d: sorted(v) for d, v in got.items()} == want, keep_first

    def test_mask_removes_exactly_the_spans(self, spark):
        from propulsion_spark.operators.substring_dedup import (
            mask_repeated_ngrams,
        )

        texts, docs = self._corpus(spark)
        rows = {
            r["doc_id"]: r
            for r in mask_repeated_ngrams(docs, n=4, min_dup=2).collect()
        }
        spans = _ref_substr_spans(texts, n=4, min_dup=2)
        import re

        for d, text in texts.items():
            toks = re.split(r"\s+", text.strip().lower())
            drop = {
                i for s, e in spans.get(d, []) for i in range(s, e)
            }
            want = " ".join(t for i, t in enumerate(toks) if i not in drop)
            assert rows[d]["masked_text"] == want, d
            assert rows[d]["n_masked_tokens"] == len(drop), d
        assert rows[3]["n_masked_tokens"] == 0
        # keep_first leaves exactly one copy of the passage serving
        kept = {
            r["doc_id"]: r
            for r in mask_repeated_ngrams(
                docs, n=4, min_dup=2, keep_first=True
            ).collect()
        }
        survivors = [
            d for d in (1, 2) if self.PASSAGE in kept[d]["masked_text"]
        ]
        assert len(survivors) == 1

    def test_cli_substr_verb(self, spark, tmp_path):
        """substr verb e2e: masked corpus written, mass reported."""
        import json as _json
        import subprocess
        import sys

        _, docs = self._corpus(spark)
        docs.write.mode("overwrite").parquet(str(tmp_path / "src"))
        proc = subprocess.run(
            [sys.executable, "-m", "propulsion_spark.cli", "substr",
             "--src", str(tmp_path / "src"), "--out", str(tmp_path / "out"),
             "--n", "4", "--min-dup", "2"],
            capture_output=True, text=True, timeout=240, cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        rep = _json.loads(proc.stdout.strip().splitlines()[-1])
        assert rep["n_docs"] == 4
        assert rep["n_docs_masked"] == 3  # docs 1, 2 and the self-repeater
        assert rep["tokens_masked"] >= 20  # two 10-token passages + doc 4
        out = {r["doc_id"]: r for r in spark.read.parquet(
            str(tmp_path / "out")).collect()}
        assert self.PASSAGE not in out[1]["masked_text"]
        assert out[3]["n_masked_tokens"] == 0

    def test_plan_windows_stay_per_doc(self, spark):
        import sys

        from propulsion_spark.operators.substring_dedup import (
            repeated_ngram_spans,
        )

        sys.path.insert(0, "/root/repo/tools")
        from plan_audit import _has_global_window

        _, docs = self._corpus(spark)
        plan = (
            repeated_ngram_spans(docs, n=4, min_dup=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert not _has_global_window(plan)


class TestQualityClassifier:
    """Learned quality filter (operators/quality_classifier.py):
    hashed-ngram logistic regression + deterministic Lomax-Pareto
    acceptance."""

    @staticmethod
    def _corpora(spark, n=120, seed=7):
        """Deterministic separable corpora: 'clean' docs draw short
        sentences from a structured vocab; 'junk' docs keyword-stuff
        from a disjoint spam vocab with heavy repetition."""
        import random

        rng = random.Random(seed)
        clean_vocab = (
            "the data engine reads ordered event streams and folds them "
            "into durable positions with exact replay semantics"
        ).split()
        junk_vocab = "buy cheap now click deal free winner prize".split()
        pos, neg = [], []
        for i in range(n):
            pos.append(
                (i, " ".join(rng.choice(clean_vocab) for _ in range(30)))
            )
            stuffed = rng.choice(junk_vocab)
            neg.append(
                (
                    10_000 + i,
                    " ".join(
                        stuffed if j % 2 == 0 else rng.choice(junk_vocab)
                        for j in range(30)
                    ),
                )
            )
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "doc_id long, text string"
        )
        return mk(pos), mk(neg)

    def test_separates_held_out_docs(self, spark):
        from propulsion_spark.operators.quality_classifier import (
            score_quality,
            train,
        )

        pos, neg = self._corpora(spark)
        tr_pos, ho_pos = pos.filter("doc_id % 5 != 0"), pos.filter(
            "doc_id % 5 = 0"
        )
        tr_neg, ho_neg = neg.filter("doc_id % 5 != 0"), neg.filter(
            "doc_id % 5 = 0"
        )
        model = train(tr_pos, tr_neg, n_features=1 << 14)
        qp = [
            r["quality"]
            for r in score_quality(ho_pos, model, n_features=1 << 14).collect()
        ]
        qn = [
            r["quality"]
            for r in score_quality(ho_neg, model, n_features=1 << 14).collect()
        ]
        assert qp and qn
        # held-out separation: every clean doc above every junk doc
        # (the corpora are deterministic and linearly separable)
        assert min(qp) > max(qn)
        assert sum(q > 0.5 for q in qp) / len(qp) >= 0.95
        assert sum(q < 0.5 for q in qn) / len(qn) >= 0.95

    def test_model_roundtrips_and_scoring_deterministic(self, spark, tmp_path):
        from pyspark.ml.classification import LogisticRegressionModel

        from propulsion_spark.operators.quality_classifier import (
            score_quality,
            train,
        )

        pos, neg = self._corpora(spark, n=40)
        model = train(pos, neg, n_features=1 << 12)
        model.save(str(tmp_path / "m"))
        loaded = LogisticRegressionModel.load(str(tmp_path / "m"))
        a = {
            r["doc_id"]: r["quality"]
            for r in score_quality(pos, model, n_features=1 << 12).collect()
        }
        b = {
            r["doc_id"]: r["quality"]
            for r in score_quality(pos, loaded, n_features=1 << 12).collect()
        }
        assert a == b  # bit-identical through persistence

    def test_feature_space_derived_from_model(self, spark, tmp_path):
        """r13 (ADVICE r12): scoring derives the feature space from
        the fitted model (model.numFeatures) — no flag to re-supply;
        an explicit override is only a cross-check and a MISMATCH
        raises a clear error instead of an opaque BLAS dimension
        failure (or silently wrong buckets at equal sizes)."""
        import pytest

        from propulsion_spark.operators.quality_classifier import (
            score_quality,
            train,
        )

        pos, neg = self._corpora(spark, n=40)
        model = train(pos, neg, n_features=1 << 12)
        derived = {
            r["doc_id"]: r["quality"]
            for r in score_quality(pos, model).collect()
        }
        explicit = {
            r["doc_id"]: r["quality"]
            for r in score_quality(pos, model, n_features=1 << 12).collect()
        }
        assert derived == explicit
        with pytest.raises(ValueError, match="numFeatures"):
            score_quality(pos, model, n_features=1 << 14)

    def test_cli_quality_train_score(self, spark, tmp_path):
        """quality verb e2e: train on trusted-vs-junk samples, score +
        Pareto-filter a mixed corpus — junk mass drops."""
        import json as _json
        import subprocess
        import sys

        pos, neg = self._corpora(spark, n=60)
        pos.write.mode("overwrite").parquet(str(tmp_path / "pos"))
        neg.write.mode("overwrite").parquet(str(tmp_path / "neg"))
        pos.unionByName(neg).write.mode("overwrite").parquet(
            str(tmp_path / "mixed")
        )

        def run(*a):
            proc = subprocess.run(
                [sys.executable, "-m", "propulsion_spark.cli", *a],
                capture_output=True, text=True, timeout=300, cwd="/root/repo",
            )
            assert proc.returncode == 0, proc.stderr[-2000:]
            return _json.loads(proc.stdout.strip().splitlines()[-1])

        run(
            "quality", "train", "--pos", str(tmp_path / "pos"),
            "--neg", str(tmp_path / "neg"), "--model", str(tmp_path / "m"),
            "--n-features", str(1 << 14),
        )
        rep = run(
            "quality", "score", "--model", str(tmp_path / "m"),
            "--src", str(tmp_path / "mixed"), "--out", str(tmp_path / "out"),
            "--n-features", str(1 << 14), "--filter",
        )
        assert rep["filtered"] is True
        # the trusted half survives ~fully, the junk half ~2^-9 of it
        assert 55 <= rep["n_docs"] <= 75
        assert rep["mean_quality"] > 0.9
        kept = spark.read.parquet(str(tmp_path / "out"))
        assert kept.filter("doc_id < 10000").count() >= 55  # clean docs
        assert kept.filter("doc_id >= 10000").count() <= 5  # junk docs

    def test_threshold_for_keep_rate(self, spark):
        from propulsion_spark.operators.quality_classifier import (
            threshold_for_keep_rate,
        )

        n = 2000
        scored = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") / float(n)).alias("quality"),
        )
        thr = threshold_for_keep_rate(scored, 0.25)
        kept = scored.filter(F.col("quality") >= thr).count()
        assert abs(kept - n * 0.25) <= n * 0.02  # approxQuantile tolerance
        import pytest as _pt

        with _pt.raises(ValueError):
            threshold_for_keep_rate(scored, 0.0)
        # an empty scored frame is a clear error, not an IndexError
        with _pt.raises(ValueError, match="non-null"):
            threshold_for_keep_rate(scored.filter("quality > 2"), 0.5)

    def test_pareto_filter_deterministic_and_shaped(self, spark):
        from propulsion_spark.operators.quality_classifier import (
            pareto_filter,
        )

        n = 4000
        perfect = spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit(1.0).alias("quality")
        )
        zero = spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("quality")
        )
        assert pareto_filter(perfect).count() == n  # q=1 always survives
        k0 = pareto_filter(zero).count()
        # q=0 survives with probability 2^-9 ≈ 0.00195: expect ~8/4000
        assert 0 < k0 < n * 0.02
        # deterministic: same salt → same set; new salt → a different draw
        a = {r["doc_id"] for r in pareto_filter(zero).collect()}
        b = {r["doc_id"] for r in pareto_filter(zero).collect()}
        assert a == b
        c = {r["doc_id"] for r in pareto_filter(zero, salt="quality-1").collect()}
        assert a != c
        # mid-score keep rate sits between the extremes and matches the
        # Lomax survival (1/(2-q))^alpha within sampling tolerance
        half = spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit(0.5).alias("quality")
        )
        kh = pareto_filter(half).count()
        expect = n * (1.0 / 1.5) ** 9.0
        assert 0.5 * expect < kh < 2.0 * expect


class TestHybridSearchMany:
    SPECS = [
        (0, ("hash", "tree"), 0),
        (1, ("hash",), 1),
        (2, ("tree", "data"), 2),
    ]

    def test_matches_single_query_path_exactly(self, spark, indexes):
        """Per-query fused rows from the batch equal the single-query
        fusion (lex.search + ann.search + global rrf_fuse) — same
        doc_ids, same IEEE rrf_scores, same ranks."""
        lex, ann = indexes
        k, cand = 10, 40
        fused = hybrid_search_many(
            lex, ann, _queries(spark, self.SPECS), k=k, n_probes=2
        )
        got = {}
        for r in fused.collect():
            got.setdefault(r["query_id"], set()).add(
                (r["doc_id"], r["rrf_score"], r["n_lists"], r["fused_rank"])
            )
        for qid, terms, vid in self.SPECS:
            q1 = (
                load_table(spark, SF, "embeddings")
                .filter(F.col("vec_id") == vid)
                .select(F.lit(qid).alias("query_id"), "embedding")
            )
            ann_ranks = ann.search(q1, top_k=cand, n_probes=2).select(
                F.col("neighbor_id").alias("doc_id"), "rank"
            )
            want = {
                (r["doc_id"], r["rrf_score"], r["n_lists"], r["fused_rank"])
                for r in rrf_fuse([lex.search(terms, k=cand), ann_ranks])
                .filter(F.col("fused_rank") <= k)
                .collect()
            }
            assert got[qid] == want, qid

    def test_plan_has_no_global_window(self, spark, indexes):
        """The per-query rank windows must run as WindowGroupLimit
        heaps (rank<=k pushed below the shuffle), and nothing in the
        batched plan may collapse to a single-partition window."""
        import sys

        sys.path.insert(0, "/root/repo/tools")
        from plan_audit import _has_global_window

        lex, ann = indexes
        plan = (
            hybrid_search_many(
                lex, ann, _queries(spark, self.SPECS), k=10, n_probes=2
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan
        assert not _has_global_window(plan)

    def test_max_df_share_rides_to_lexical_arm(self, spark, indexes):
        """The common-terms lever through the batch path: a threshold
        above every term's share changes nothing; a threshold below
        everything degrades every query to ANN-only rows (n_lists=1)
        instead of failing."""
        lex, ann = indexes
        q = _queries(spark, self.SPECS)
        plain = {
            (r["query_id"], r["doc_id"], r["fused_rank"])
            for r in hybrid_search_many(lex, ann, q, k=10).collect()
        }
        high = {
            (r["query_id"], r["doc_id"], r["fused_rank"])
            for r in hybrid_search_many(
                lex, ann, q, k=10, max_df_share=1.0
            ).collect()
        }
        assert high == plain
        ann_only = hybrid_search_many(
            lex, ann, q, k=10, max_df_share=1e-9
        ).collect()
        assert {r["query_id"] for r in ann_only} == {0, 1, 2}
        assert all(r["n_lists"] == 1 for r in ann_only)

    def test_request_id_decoupled_from_corpus_id(self, spark, indexes):
        """The r12 review's finding, pinned: when query_id is a request
        id (≠ the example's corpus vec_id), the ANN arm's
        never-your-own-neighbor rule must key on vec_id — the probe doc
        must NOT return as its own neighbor, and the innocent doc whose
        id equals the request id must stay eligible."""
        lex, ann = indexes
        emb = load_table(spark, SF, "embeddings")
        by_id = {
            r["vec_id"]: r["embedding"]
            for r in emb.filter(F.col("vec_id") == 3).collect()
        }
        q = spark.createDataFrame(
            [(777, ["zzz-non-token"], by_id[3], 3)],
            "query_id long, terms array<string>, embedding array<double>,"
            " vec_id long",
        )
        rows = hybrid_search_many(lex, ann, q, k=10, n_probes=2).collect()
        got = {r["doc_id"] for r in rows}
        assert 3 not in got  # the probe's own corpus doc is excluded
        # and the result equals the single path keyed on the corpus id
        q_single = spark.createDataFrame(
            [(3, ["zzz-non-token"], by_id[3])],
            "query_id long, terms array<string>, embedding array<double>",
        )
        want = {
            r["doc_id"]
            for r in hybrid_search_many(
                lex, ann, q_single, k=10, n_probes=2
            ).collect()
        }
        assert got == want

    def test_unmatched_query_contributes_no_rows(self, spark, indexes):
        """A query whose terms miss the corpus still fuses its ANN arm
        (n_lists=1 rows), and a query id never silently drops."""
        lex, ann = indexes
        q = _queries(spark, [(7, ("zzz-not-a-token-zzz",), 3)])
        rows = hybrid_search_many(lex, ann, q, k=5, n_probes=2).collect()
        assert rows and all(r["query_id"] == 7 for r in rows)
        assert all(r["n_lists"] == 1 for r in rows)  # ANN arm only
        assert sorted(r["fused_rank"] for r in rows) == list(range(1, 6))
