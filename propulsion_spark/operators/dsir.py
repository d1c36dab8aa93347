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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propulsion_spark.operators.lm import lm_likelihood_bc

_DSIR_M = 1 << 20  # u = (h%M + 0.5)/M in (0, 1) exclusive: ln(-ln u) finite


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
