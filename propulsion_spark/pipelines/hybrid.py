"""Batched hybrid retrieval: N queries through ONE pruned postings
scan, ONE ANN pass, and per-query RRF fusion.

The r11 serving indexes (``LexicalIndex``, ``AnnIndex``) exist to
amortize per-query cost; this is the amortization realized for the
query BATCH — the shape a retrieval endpoint actually runs (a request
queue drains as a batch, a training-data miner scores thousands of
probes). Per-query results equal the single-query path exactly
(pinned by test): the lexical arm is ``LexicalIndex.search_many``
(one partition-pruned postings read over the union of every query's
term buckets), the ANN arm is ``AnnIndex.search`` which was
multi-query from day one (one probed-cell partition filter covering
every query's probe set), and fusion is ``rrf_fuse(by=["query_id"])``
— per-query rank windows that Spark executes as WindowGroupLimit
heaps, never a global sort.

Reference parity: jet/propulsion has no retrieval surface; this is
LLM-pipeline extension surface next to the indexes it serves
(SURVEY.md "beyond the reference" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propulsion_spark.operators.similarity import rrf_fuse
from propulsion_spark.pipelines.ann_index import AnnIndex
from propulsion_spark.pipelines.lexical_index import LexicalIndex


def hybrid_search_many(
    lex: LexicalIndex,
    ann: AnnIndex,
    queries: DataFrame,
    k: int = 10,
    n_probes: int = 2,
    cand: "int | None" = None,
    max_df_share: "float | None" = None,
) -> DataFrame:
    """Fused top-k per query for a BATCH of hybrid queries.

    ``queries`` is ``(query_id long, terms array<string>, embedding
    array<double>[, vec_id long])`` — free-text terms feed the BM25
    arm, the embedding feeds query-by-example ANN. Include ``vec_id``
    (the example vector's corpus id) whenever ``query_id`` is a
    request id rather than the corpus id: the ANN arm's
    never-your-own-neighbor exclusion keys on it. Returns
    ``(query_id, doc_id, rrf_score, n_lists, fused_rank)`` with
    ``fused_rank <= k``.

    ``cand`` is the per-arm candidate depth (default ``4*k``, the
    single-path ``cmd_search`` rule): RRF quality depends on arms
    overlapping below the cut, so each arm contributes more
    candidates than the final page.

    Cost shape: O(distinct terms' postings buckets) + O(probed cells)
    regardless of N queries — the whole point vs N single calls, which
    pay N scan setups and N windows for the same bytes.

    ``max_df_share`` rides through to the lexical arm's common-terms
    lever (saturated terms drop before their postings are read — the
    batch's distinct-term union makes one stopword-class term
    everyone's cost); the ANN arm is unaffected, and RRF degrades
    gracefully to ANN-only rows (n_lists=1) for queries whose terms
    all dropped.
    """
    cand = cand or max(k * 4, k)
    lex_ranks = lex.search_many(
        queries.select("query_id", "terms"), k=cand,
        max_df_share=max_df_share,
    )
    # AnnIndex.search's "a vector is never its own neighbor" rule keys
    # on the query column it is given. query_id is a REQUEST id here —
    # when the query-by-example vector's corpus id rides along (a
    # ``vec_id`` column), the ANN arm must key on THAT id, or the
    # probe document returns as its own rank-1 neighbor while the
    # innocent doc whose id equals the request id is silently excluded
    # (the r12 review's finding). Without ``vec_id``, query_id is
    # assumed to BE the corpus id (the doc_id == vec_id convention).
    if "vec_id" in queries.columns:
        ann_ranks = (
            ann.search(
                queries.select(
                    F.col("vec_id").alias("query_id"), "embedding"
                ).distinct(),
                top_k=cand,
                n_probes=n_probes,
            )
            .withColumnRenamed("query_id", "vec_id")
            .join(
                F.broadcast(queries.select("query_id", "vec_id")), "vec_id"
            )
            .select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
        )
    else:
        ann_ranks = ann.search(
            queries.select("query_id", "embedding"),
            top_k=cand,
            n_probes=n_probes,
        ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse(
        [lex_ranks, ann_ranks], id_col="doc_id", by=["query_id"]
    ).filter(F.col("fused_rank") <= k)
