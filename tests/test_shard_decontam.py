"""Round-6 ops: Bloom-filter benchmark decontamination and
shuffle-and-shard. Contracts pinned here:

- decontam: partition-invariant filter build, merge == union, bloom
  hits ⊇ exact hits per doc (NO false negatives — the safety
  property), occurrence counting identical between the Bloom scan and
  the exact explode-join reference, end-to-end kept/flagged split.
- shard: offsets tile each split's token stream exactly, assignment is
  invariant to input partitioning and cluster width, re-salting is an
  independent re-draw, docs never split across shards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from propulsion_spark.operators.decontam import (
    NgramBloom,
    _flat_ngram_hashes,
    build_ngram_bloom,
    contamination_scores,
    decontaminate,
    exact_overlap_scores,
)
from propulsion_spark.operators.packing import shard_corpus, shard_manifest


# ---------------------------------------------------------------- pure
class TestFlatNgramHashes:
    def test_windows_stay_inside_docs(self):
        h, d = _flat_ngram_hashes(pd.Series(["a b c d", "b c", "x"]), 2)
        # doc0: (a b)(b c)(c d); doc1: (b c); doc2 too short
        assert d.tolist() == [0, 0, 0, 1]
        # the shared bigram "b c" hashes identically across docs
        assert h[1] == h[3]
        assert len(set(h.tolist())) == 3

    def test_unigrams_and_empty(self):
        h, d = _flat_ngram_hashes(pd.Series(["a a b", "", None]), 1)
        assert d.tolist() == [0, 0, 0]
        assert h[0] == h[1] != h[2]

    def test_case_and_whitespace_normalized(self):
        h1, _ = _flat_ngram_hashes(pd.Series(["Foo  Bar"]), 2)
        h2, _ = _flat_ngram_hashes(pd.Series(["  foo bar "]), 2)
        assert h1.tolist() == h2.tolist()

    def test_java_ws_semantics_not_unicode(self, spark):
        """Tokenization must match Spark's split('\\\\s+') — the Java
        ASCII \\s class. A non-breaking space (U+00A0) is NOT a
        separator there; pandas' default Unicode split would break the
        exact-vs-bloom occurrence parity (review-found)."""
        from pyspark.sql import functions as F

        text = "alpha beta gamma"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        n_spark = df.select(
            F.expr(
                "size(filter(split(lower(trim(text)), '\\\\s+'),"
                " _t -> _t != ''))"
            ).alias("n")
        ).first()["n"]
        h, d = _flat_ngram_hashes(pd.Series([text]), 1)
        assert len(h) == n_spark == 2  # 'alpha\xa0beta' stays one token
        # and the full exact-vs-bloom contract holds on such a doc
        from propulsion_spark.operators.decontam import (
            build_ngram_bloom,
            contamination_scores,
            exact_overlap_scores,
        )

        bench = spark.createDataFrame(
            [(0, "alpha beta gamma")], "bid long, text string"
        )
        bl = contamination_scores(
            df, build_ngram_bloom(bench, n=2)
        ).first()
        ex = exact_overlap_scores(df, bench, n=2).first()
        assert (bl["n_ngrams"], bl["n_hits"]) == (
            ex["n_ngrams"],
            ex["n_hits"],
        ) == (1, 1)


# ------------------------------------------------------------- decontam
@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"body{i} alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
        for i in range(40)
    ] + [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "we hold these truths to be self evident plus padding"),
        (102, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [
            (0, "quick brown fox jumps over the lazy"),
            (1, "to be self evident"),
            (2, "an eval item sharing nothing with the corpus body"),
        ],
        "bid long, text string",
    )


class TestBloomDecontam:
    N = 3

    def test_build_partition_invariant(self, bench):
        b1 = build_ngram_bloom(bench.repartition(1), n=self.N)
        b7 = build_ngram_bloom(bench.repartition(7), n=self.N)
        assert b1.data == b7.data

    def test_merge_equals_union(self, spark, bench):
        a = bench.filter("bid < 1")
        b = bench.filter("bid >= 1")
        merged = build_ngram_bloom(a, n=self.N).merge(
            build_ngram_bloom(b, n=self.N)
        )
        assert merged.data == build_ngram_bloom(bench, n=self.N).data

    def test_merge_param_mismatch_raises(self, bench):
        b = build_ngram_bloom(bench, n=self.N)
        other = build_ngram_bloom(bench, n=self.N, m_bits=1 << 22)
        with pytest.raises(ValueError):
            b.merge(other)

    def test_bad_params_raise(self):
        with pytest.raises(ValueError):
            NgramBloom(3, 1000, 4, b"\0" * 125)  # not a power of two
        with pytest.raises(ValueError):
            NgramBloom(3, 1 << 10, 4, b"\0" * 3)  # wrong byte length

    def test_no_false_negatives_vs_exact(self, corpus, bench):
        bloom = build_ngram_bloom(bench, n=self.N)
        sc = (
            contamination_scores(corpus, bloom)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        ex = (
            exact_overlap_scores(corpus, bench, n=self.N)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        # identical occurrence counting on both paths
        assert (sc.n_ngrams == ex.n_ngrams).all()
        # the safety property: a real overlap is never missed
        assert (sc.n_hits >= ex.n_hits).all()
        # at this corpus size / default m_bits the filter is FP-free
        # (deterministic hashing — this is a fixed fact, not luck)
        assert (sc.n_hits == ex.n_hits).all()
        assert sc.loc[100].n_hits > 0 and sc.loc[101].n_hits > 0
        assert sc.loc[102].n_ngrams == 0

    def test_decontaminate_end_to_end(self, corpus, bench):
        kept, flagged = decontaminate(corpus, bench, n=self.N)
        assert sorted(r.doc_id for r in flagged.select("doc_id").collect()) == [
            100,
            101,
        ]
        assert kept.count() == corpus.count() - 2
        assert "contaminated_frac" not in kept.columns

    def test_fill_ratio_counts_set_bits(self):
        raw = np.zeros(1 << 4, dtype=np.uint64)
        raw[0] = np.uint64(0b101)
        b = NgramBloom(2, 1 << 10, 2, raw.tobytes())
        assert b.fill_ratio == 2 / (1 << 10)


# ---------------------------------------------------------------- shard
@pytest.fixture(scope="module")
def shard_docs(spark):
    # two splits, doc sizes 5..40 tokens, ids interleaved across splits
    rows = [
        (i, "train" if i % 3 else "val", 5 + (i * 7) % 36) for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, split string, n_tokens long"
    ).cache()


SHARD_T = 500


class TestShardCorpus:
    def _pdf(self, df):
        return df.toPandas().sort_values(["split", "offset"]).reset_index(
            drop=True
        )

    def test_offsets_tile_per_split(self, shard_docs):
        out = self._pdf(shard_corpus(shard_docs, SHARD_T))
        for split, grp in out.groupby("split"):
            run = 0
            for _, r in grp.iterrows():
                assert r.offset == run
                assert r.shard_id == run // SHARD_T
                assert r.shard_offset == run - r.shard_id * SHARD_T
                run += r.n_tokens
        # every doc exactly once
        assert len(out) == shard_docs.count()

    def test_partition_and_width_invariant(self, shard_docs):
        a = self._pdf(shard_corpus(shard_docs.repartition(13), SHARD_T))
        b = self._pdf(
            shard_corpus(shard_docs.coalesce(1), SHARD_T, num_partitions=3)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_resalt_is_independent_redraw(self, shard_docs):
        a = self._pdf(shard_corpus(shard_docs, SHARD_T, salt="shard-0"))
        b = self._pdf(shard_corpus(shard_docs, SHARD_T, salt="shard-1"))
        # same corpus totals per split…
        pd.testing.assert_series_equal(
            a.groupby("split").n_tokens.sum(),
            b.groupby("split").n_tokens.sum(),
        )
        # …but a different permutation (some doc moved shards)
        am = a.set_index("doc_id").shard_id
        bm = b.set_index("doc_id").shard_id
        assert (am != bm.loc[am.index]).any()

    def test_manifest_consistent_and_sizes_bounded(self, shard_docs):
        sh = shard_corpus(shard_docs, SHARD_T)
        man = shard_manifest(sh).toPandas().sort_values(["split", "shard_id"])
        docs = self._pdf(sh)
        max_doc = int(docs.n_tokens.max())
        for split, grp in man.groupby("split"):
            ids = grp.shard_id.tolist()
            assert ids == list(range(len(ids)))  # contiguous from 0
            # all but the last shard start a doc past their boundary:
            # realized size stays within one doc of the target
            for _, r in grp.iloc[:-1].iterrows():
                assert SHARD_T - max_doc < r.n_tokens < SHARD_T + max_doc
            assert grp.n_tokens.sum() == docs[docs.split == split].n_tokens.sum()
            assert grp.n_docs.sum() == (docs.split == split).sum()

    def test_whole_corpus_single_split(self, shard_docs):
        out = self._pdf(shard_corpus(shard_docs, SHARD_T, split_col=None))
        assert out.split.unique().tolist() == ["all"]
        assert out.offset.max() + out.iloc[-1].n_tokens == out.n_tokens.sum()
