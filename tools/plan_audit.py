"""Physical-plan audit: scan every registered query for scale red flags
(cartesian products, nested-loop joins, excessive shuffles) and report
pushdown/broadcast evidence.

Usage: python tools/plan_audit.py [sf_dir]

Expected flags (by design, documented in the query docs and pinned as a
regression test — ``tests/test_plan_audit.py`` asserts the flagged set
stays a subset of ``EXPECTED_FLAGGED``):
- similarity_topk_bruteforce / embedding_knn_classify /
  similarity_recall: BroadcastNestedLoopJoin of a ≤10-row query set
  against candidates — the exact ground-truth baseline the ANN
  variants (similarity_lsh_topk, similarity_ivf_topk) replace at scale.
- similarity_ivf_topk (all three branches: seeded 1-probe, seeded
  multi-probe, learned): multi-stage (codebook + assignment + probe
  selection + search, plus one Lloyd iteration for the learned
  codebook); at production scale codebook + cell assignments are
  materialized once, not per query.
- revenue_kpis: BroadcastNestedLoopJoin of three SINGLE-ROW aggregates
  (Q6 forecast × Q14 promo share × event funnel) — 1×1 cross joins,
  by design.
- text_tfidf_keywords: one BroadcastNestedLoopJoin of the SINGLE-ROW
  corpus count against the tf×df join — a broadcast scalar, by design
  (plus >4 exchanges from the merged tfidf+bm25 long-format arms).
- dedup_embedding_cosine / similarity_ivf_topk / similarity_recall
  (r10): the map-only IVF distance path cross-joins each vector
  against the BROADCAST ≤16-row codebook-array table — Catalyst plans
  a BroadcastNestedLoopJoin, which here is n×16 against a broadcast
  side, the intended shape (NOT an n×n nested loop); exchange counts
  are the sum of each merged arm's own shuffle-minimal pipeline.
  (The audit runs with finalize() disabled — r10 — so these plans are
  the REAL pipelines, not checkpoint scans; persisted intermediates
  still summarize as InMemoryTableScan.)
- priority_reports / sketch_distinct_kmv: >4 exchanges by
  construction — long-format UNIONs where each arm keeps its own
  optimal aggregate (5 sub-reports / KMV+HLL branches); the union
  itself is concatenation, not a shuffle.
- text_lang_stats (r8): >4 exchanges by construction — the merged
  per-language report joins three independently-keyed aggregations
  (doc rollup on lang; token-count histogram + cumsum window on
  (lang, n_tokens); bigram-LM counts + prefix-window + rollup on
  (lang, prefix, gram)). Each arm is individually shuffle-minimal
  (the LM arm is one corpus scan — see operators/lm.py); the join of
  three per-language one-row-per-group tables is broadcast-sized.
- status_rollup (r8): >4 exchanges by construction — CASCADED
  re-aggregation replaces Spark's rollup(), which would Expand every
  corpus row ×3 before the shuffle and emits NO grand-total row on
  empty input (vs ANSI ROLLUP's one () row — the empty-tables gate
  divergence). Exactly one exchange carries the corpus (the
  (flag,status) partial agg); the flag-level and grand re-aggs and
  the pivot join shuffle ≤6 grouped rows each.
"""

from __future__ import annotations

import contextlib
import re
import sys

sys.path.insert(0, "/root/repo")


@contextlib.contextmanager
def _audit_mode():
    """Audit the TRUE plans: finalize() eagerly localCheckpoints query
    results (so persisted intermediates can be released), which would
    truncate the audited plan to a checkpoint scan — the r10 blind spot
    this context removes. Every operator module's imported ``finalize``
    name is swapped for an identity for the audit's duration."""
    import propulsion_spark.operators as ops

    real = ops.finalize

    def identity(result, *intermediates):
        return result

    patched = []
    for mod in list(sys.modules.values()):
        if getattr(mod, "__name__", "").startswith("propulsion_spark") and (
            getattr(mod, "finalize", None) is real
        ):
            mod.finalize = identity
            patched.append(mod)
    try:
        yield
    finally:
        for mod in patched:
            mod.finalize = real

#: queries whose audited plan may legitimately carry a flag — every
#: member is annotated in the module docstring; anything OUTSIDE this
#: set that flags is a regression (pinned by tests/test_plan_audit.py)
EXPECTED_FLAGGED = {
    "similarity_topk_bruteforce",
    "embedding_knn_classify",
    "similarity_recall",
    "similarity_ivf_topk",
    "revenue_kpis",
    "text_tfidf_keywords",
    "dedup_embedding_cosine",
    "priority_reports",
    "sketch_distinct_kmv",
    "text_lang_stats",
    "status_rollup",
}


def audit_plan(plan: str) -> list[str]:
    """Scale red flags present in one executed-plan string."""
    bad = []
    if "CartesianProduct" in plan:
        bad.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan:
        bad.append("BNLJ")
    n_exch = plan.count("Exchange hashpartitioning")
    if n_exch > 4:
        bad.append(f"{n_exch} exchanges")
    return bad


def audit(spark, sf_dir: str, registry=None) -> "dict[str, list[str]]":
    """Run the audit over every registered query; returns
    ``{name: [flags...]}`` (empty list = clean, ``["ERROR: ..."]`` on
    build failure)."""
    if registry is None:
        from propulsion_spark.operators import load_all

        registry = load_all()
    out: dict[str, list[str]] = {}
    with _audit_mode():
        for name, q in sorted(registry.items()):
            try:
                plan = (
                    q.build(spark, sf_dir)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
            except Exception as ex:  # noqa: BLE001
                out[name] = [f"ERROR: {ex}"]
                continue
            finally:
                spark.catalog.clearCache()  # un-finalized persists
            out[name] = audit_plan(plan)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from propulsion_spark import get_spark
    from propulsion_spark.operators import load_all

    registry = load_all()
    spark = get_spark("plan-audit")
    flagged = 0
    with _audit_mode():
      for name, q in sorted(registry.items()):
        try:
            plan = q.build(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {ex}")
            flagged += 1
            continue
        finally:
            spark.catalog.clearCache()
        bad = audit_plan(plan)
        n_exch = plan.count("Exchange hashpartitioning")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]+\]", plan))
        bcast = plan.count("BroadcastHashJoin")
        status = "FLAG" if bad else "ok  "
        flagged += bool(bad)
        print(
            f"{status} {name}: exchanges={n_exch} broadcast_joins={bcast} "
            f"pushed_filter_scans={pushed}{' ' + ','.join(bad) if bad else ''}"
        )
    print(f"\n{flagged} flagged (see module docstring for the expected set)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
