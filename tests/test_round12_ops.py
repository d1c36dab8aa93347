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

    def test_unmatched_query_contributes_no_rows(self, spark, indexes):
        """A query whose terms miss the corpus still fuses its ANN arm
        (n_lists=1 rows), and a query id never silently drops."""
        lex, ann = indexes
        q = _queries(spark, [(7, ("zzz-not-a-token-zzz",), 3)])
        rows = hybrid_search_many(lex, ann, q, k=5, n_probes=2).collect()
        assert rows and all(r["query_id"] == 7 for r in rows)
        assert all(r["n_lists"] == 1 for r in rows)  # ANN arm only
        assert sorted(r["fused_rank"] for r in rows) == list(range(1, 6))
