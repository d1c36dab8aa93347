"""BPE trainer/encoder correctness (operators/bpe.py).

The merge loop is not SQL-expressible, so instead of a DuckDB oracle
the gate here is: exact equivalence between the incremental
`_merge_loop` and a from-scratch recount-per-iteration reference
implementation (same deterministic tie-break) on randomized corpora,
plus roundtrip / determinism / coverage properties end-to-end through
Spark.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from propulsion_spark.operators.bpe import (
    END,
    _PRETOK_RE,
    _merge_loop,
    bpe_encode,
    broadcast_merges,
    train_bpe,
    word_counts,
)


def _naive_merge_loop(words, n_merges):
    """Reference BPE: recount every pair from scratch each iteration
    (Sennrich et al. 2016, Algorithm 1 verbatim), same deterministic
    tie-break as the production loop."""
    words = [(list(s), c) for s, c in words]
    merges = []
    for _ in range(n_merges):
        pc: dict = {}
        for s, c in words:
            for pair in zip(s, s[1:]):
                pc[pair] = pc.get(pair, 0) + c
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        merges.append(best)
        new = best[0] + best[1]
        nxt = []
        for s, c in words:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(new)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt.append((out, c))
        words = nxt
    return merges


class TestMergeLoopExact:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_incremental_equals_recount_reference(self, seed):
        rng = random.Random(seed)
        alphabet = "abcde"
        words = []
        for _ in range(rng.randint(5, 40)):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            words.append((tuple(w) + (END,), rng.randint(1, 9)))
        n = rng.randint(1, 60)
        assert _merge_loop(list(words), n) == _naive_merge_loop(words, n)

    def test_exhausts_gracefully(self):
        # single 1-char word: one possible merge (x, </w>), then done
        assert _merge_loop([(("x", END), 3)], 10) == [("x", END)]

    def test_repeated_pair_within_word(self):
        # 'aaaa': overlapping pairs must count non-overlapping merges
        # correctly through the rewrite (the classic subtle case)
        words = [(tuple("aaaa") + (END,), 2)]
        assert _merge_loop(list(words), 3) == _naive_merge_loop(words, 3)


class TestTrainEncodeE2E:
    CORPUS = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )

    def _docs(self, spark, n_parts=2):
        rows = [(i, " ".join(self.CORPUS)) for i in range(3)]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]),
            "doc_id long, text string",
        ).repartition(n_parts)

    def test_roundtrip_and_counts(self, spark):
        docs = self._docs(spark)
        wc = word_counts(docs)
        merges, coverage = train_bpe(wc, n_merges=12)
        assert coverage == 1.0
        bc = broadcast_merges(spark, merges)
        out = bpe_encode(docs, bc, with_tokens=True).collect()
        assert len(out) == 3
        for r in out:
            text = " ".join(self.CORPUS)
            pretoks = _PRETOK_RE.findall(text)
            assert r["n_words"] == len(pretoks)
            # roundtrip: concatenating tokens and stripping the
            # end-of-word sentinel reconstructs the pre-token stream
            joined = "".join(r["bpe_tokens"]).replace(END, "")
            assert joined == "".join(pretoks)
            # every word ends on an END-terminated symbol
            assert r["n_bpe_tokens"] == len(r["bpe_tokens"])
            # learned merges actually compress: fewer tokens than chars
            assert r["n_bpe_tokens"] < sum(len(w) + 1 for w in pretoks)

    def test_training_deterministic_under_partitioning(self, spark):
        a, _ = train_bpe(word_counts(self._docs(spark, 1)), 10)
        b, _ = train_bpe(word_counts(self._docs(spark, 7)), 10)
        assert [tuple(r) for r in a.orderBy("rank").collect()] == [
            tuple(r) for r in b.orderBy("rank").collect()
        ]

    def test_unseen_word_falls_back_to_chars(self, spark):
        docs = self._docs(spark)
        merges, _ = train_bpe(word_counts(docs), 8)
        bc = broadcast_merges(spark, merges)
        novel = spark.createDataFrame(
            pd.DataFrame([(1, "zyx")], columns=["doc_id", "text"]),
            "doc_id long, text string",
        )
        r = bpe_encode(novel, bc, with_tokens=True).collect()[0]
        # no merge covers these chars; tokens may still pair with END
        assert "".join(r["bpe_tokens"]).replace(END, "") == "zyx"
        assert r["n_words"] == 1

    def test_max_words_coverage_gauge(self, spark):
        docs = self._docs(spark)
        wc = word_counts(docs)
        merges, coverage = train_bpe(wc, n_merges=5, max_words=2)
        # top-2 words by count: newest (6), low (5) of 16 total words
        assert coverage == pytest.approx((6 + 5) / 16)
        assert merges.count() == 5

    def test_feeds_sequence_packing(self, spark):
        """The pipeline integration the encoder exists for: BPE token
        counts (not regex approximations) drive pack_documents' global
        offsets — `token_col="n_bpe_tokens"` slots straight in."""
        from propulsion_spark.operators.packing import pack_documents

        docs = self._docs(spark)
        merges, _ = train_bpe(word_counts(docs), 12)
        bc = broadcast_merges(spark, merges)
        counted = docs.join(
            bpe_encode(docs, bc), "doc_id"
        ).withColumn("split", F.lit("train"))
        packed = {
            r["doc_id"]: r
            for r in pack_documents(
                counted, seq_len=32, token_col="n_bpe_tokens"
            ).collect()
        }
        # all three docs are identical → identical n_tokens; offsets
        # tile the stream exactly (0, n, 2n) in doc_id order
        n = packed[0]["n_tokens"]
        assert n > 0
        assert [packed[i]["offset"] for i in range(3)] == [0, n, 2 * n]

    def test_min_count_prunes_tail(self, spark):
        docs = self._docs(spark)
        kept = {r["word"] for r in word_counts(docs, min_count=3 * 3).collect()}
        # per-doc corpus repeated over 3 docs: counts are 3x
        assert kept == {"low", "newest", "widest"}
