"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick pre-training documents that look like a target
domain by importance weights under two cheap bag-of-ngrams language
models, then resample by weight instead of taking a hard top-k.

The engine mapping:
- the paper's hashed-ngram unigram models → the repo's bigram LM
  machinery (``operators/lm.py``): counts trained distributedly, pruned,
  broadcast once, scored map-only and vectorized;
- log importance weight  log p_target(x) − log p_raw(x)  =
  n_grams · (mean_target − mean_raw) over the SAME gram stream, so the
  OOV conventions cancel structurally where both LMs miss;
- the resample is Gumbel-top-k (Kool et al. 2019): key =
  logw/τ + G, G = −ln(−ln(u)) with u a salted-hash uniform — a
  deterministic, reproducible draw from softmax(logw/τ) without
  replacement. τ→0 degenerates to hard top-k by weight; larger τ mixes
  in diversity. Selection is TakeOrderedAndProject (per-partition
  k-heaps), the same no-global-sort shape as priority_sample.

Library surface (no oracle row): the weights are log-scale floats from
libm, which the repo's oracle discipline excludes from hash gates (the
same reason lm.py's gate score is engine-side only); behavior is pinned
by tests instead (target-domain docs outrank raw-domain docs, the draw
is deterministic and partition-invariant).

jet/propulsion has no data-selection analogue — this extends the
LLM-pipeline surface alongside decontam/curation (SURVEY §2 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from propulsion_spark.operators.lm import lm_likelihood_bc

_DSIR_M = 1 << 20  # u = (h%M + 0.5)/M in (0, 1) exclusive: ln(-ln u) finite

#: the oracle-attested selection facet's constants (corpus_curation):
#: pseudo-target slice + draw size, deterministic functions of doc_id
DSIR_SEL_K = 200
DSIR_TARGET_MOD = 7


def dsir_select_exact(
    docs: DataFrame,
    k: int = DSIR_SEL_K,
    target_mod: int = DSIR_TARGET_MOD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, dsir_w): the τ=0 (hard top-k) DSIR selection under the
    LINEAR-domain importance surrogate — the integer-attestable twin of
    :func:`dsir_resample` (r11, VERDICT r10 #6).

    The log-domain weight ranks by Σ_g [ln p_t(g) − ln p_r(g)]; libm
    ``ln`` is excluded from the repo's hash gates, so this facet ranks
    by the linear-domain surrogate Σ_g n(d,g)·[s_t(g) − s_r(g)] with
    s(g) = (c·2^30) div p — the SAME integer-scaled conditional
    estimate ``lm_likelihood(mode="join")`` and ``text_lang_stats``
    already attest. BIGINT throughout (scaled ≤ 2^30 per gram × ≤10^5
    grams per doc ≪ 2^63), ties by doc_id: the selected ids are
    bit-reproducible on any engine/partitioning. The target LM trains
    on the deterministic ``doc_id % target_mod = 0`` slice, the raw LM
    on the whole corpus; a gram absent from the target slice scores 0
    there (no smoothing — the add-α OOV constant cancels into ranking
    noise in the linear domain).

    Scale shape: ONE corpus explode → per-(doc, gram) counts (one
    shuffle, map-side combine) → BOTH LMs' counts from one vocab-sized
    re-aggregate (conditional sum over the target slice — no second
    corpus scan) → prefix totals as windows over the VOCAB table → one
    vocab-sized join back → per-doc sum → TakeOrderedAndProject. No
    broadcast-LM collect on the driver, no libm anywhere.
    """
    from propulsion_spark.operators.lm import LM_SCALE, _bigram_pairs_expr

    dg = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(F.expr(_bigram_pairs_expr(text_col))).alias("pr"),
        )
        .groupBy("_id", F.col("pr.w1").alias("prefix"), F.col("pr.w2").alias("w2"))
        .agg(F.count("*").alias("n"))
    )
    voc = dg.groupBy("prefix", "w2").agg(
        F.sum("n").alias("cr"),
        F.sum(
            F.when((F.col("_id") % target_mod) == 0, F.col("n")).otherwise(0)
        ).alias("ct"),
    )
    wp = Window.partitionBy("prefix")
    voc = voc.withColumn("pr_", F.sum("cr").over(wp)).withColumn(
        "pt_", F.sum("ct").over(wp)
    )
    s_t = F.when(
        (F.col("ct") > 0) & (F.col("pt_") > 0),
        F.expr(f"(ct * {LM_SCALE}L) div pt_"),
    ).otherwise(F.lit(0))
    s_r = F.expr(f"(cr * {LM_SCALE}L) div pr_")
    scored = dg.join(
        voc.select("prefix", "w2", (s_t - s_r).alias("_ds")), ["prefix", "w2"]
    )
    dw = scored.groupBy("_id").agg(F.sum(F.col("n") * F.col("_ds")).alias("dsir_w"))
    return (
        dw.orderBy(F.col("dsir_w").desc(), F.col("_id"))
        .limit(k)
        .select(F.col("_id").alias(id_col), "dsir_w")
    )


def dsir_weights(
    docs: DataFrame,
    target_bc,
    raw_bc,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_grams, logw): per-document DSIR log importance weight.

    Two map-only broadcast-LM passes over the same rows (zero shuffle;
    the join back is id-keyed on two frames that inherit the input's
    partitioning). Docs with no grams (<2 tokens) get logw NULL — the
    caller's length gate owns those.
    """
    t = lm_likelihood_bc(docs, target_bc, text_col=text_col, id_col=id_col)
    r = lm_likelihood_bc(docs, raw_bc, text_col=text_col, id_col=id_col)
    t = t.select(
        F.col(id_col), "n_grams", F.col("score").alias("_st")
    )
    r = r.select(F.col(id_col), F.col("score").alias("_sr"))
    return t.join(r, id_col).select(
        id_col,
        "n_grams",
        (F.col("n_grams") * (F.col("_st") - F.col("_sr"))).alias("logw"),
    )


def dsir_resample(
    docs: DataFrame,
    k: int,
    target_bc,
    raw_bc,
    tau: float = 1.0,
    salt: str = "dsir-0",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The k-document Gumbel-top-k draw from softmax(logw/τ) — the
    paper's "resample, don't rank" step (a hard top-k overfits the LM's
    quirks; the Gumbel draw keeps diversity in proportion to weight).

    Deterministic: the Gumbel noise comes from a salted md5 of the doc
    id, so re-runs, repartitions and appends reproduce the draw
    (appends only displace past the k-th key, never reshuffle
    survivors — same contract as priority_sample). Docs without a
    weight (no grams) never enter the draw.
    """
    w = dsir_weights(docs, target_bc, raw_bc, text_col=text_col, id_col=id_col)
    weighted = docs.join(w.filter(F.col("logw").isNotNull()), id_col)
    if tau <= 0:
        # τ=0 is the advertised "hard top-k by weight" degenerate case:
        # softmax(logw/0) puts all mass on the argmax, so the draw IS the
        # deterministic top-k.  Dividing by 0.0 would make ±Inf/NaN keys
        # (NaN sorts first under desc) — order by logw directly instead.
        keyed = weighted.withColumn("dsir_key", F.col("logw"))
    else:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}-"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        # +0.5 keeps u strictly inside (0, 1): u=1 would make
        # -log(-log(u)) NULL and silently drop ~1/2^20 of the corpus.
        u = ((h % _DSIR_M).cast("double") + 0.5) / _DSIR_M
        gumbel = -F.log(-F.log(u))
        keyed = weighted.withColumn(
            "dsir_key", F.col("logw") / F.lit(float(tau)) + gumbel
        )
    return (
        keyed.orderBy(F.col("dsir_key").desc(), F.col(id_col))
        .limit(k)
        .drop("n_grams")
    )
