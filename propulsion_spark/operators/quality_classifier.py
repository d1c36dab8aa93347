"""Learned document-quality filter — the GPT-3/CCNet-style linear
classifier over hashed n-gram features, Spark-ML-native.

The heuristic quality gates (`textops.quality_scores`: length, punct,
stopword ratios) catch structural junk; the LEARNED filter catches
distributional junk — text that is well-formed but unlike the target
corpus (SEO spam, keyword stuffing, boilerplate soup). The published
recipe (GPT-3 appendix A; CCNet uses an LM the engine already has in
`operators/lm.py`): train a linear classifier with positive = a
trusted corpus sample, negative = raw crawl, score everything, keep a
document when ``score > 1 - X`` with ``X ~ Pareto(α)`` so high-quality
text is kept almost surely while low-quality text still gets sampled
in proportion — the filter shapes the distribution rather than
guillotining it.

Spark shapes, all JVM-side:

- featurize: the corpus-standard ``_toks`` split + bigrams, hashing
  trick into a fixed ``n_features`` space (``HashingTF``, murmur3 —
  map-only, no vocabulary state to ship);
- train: ``pyspark.ml`` LogisticRegression — distributed L-BFGS,
  each iteration one treeAggregate over the training set;
- score: ``model.transform`` — map-only against the broadcast
  coefficient vector;
- Pareto acceptance: DETERMINISTIC per document — the uniform draw is
  a salted md5 of doc_id mapped through the Pareto inverse CDF (the
  split-assignment idiom: stable under repartitioning, replayable in
  a streaming twin), never ``rand()``.

Train/serve symmetry is structural: one ``_featurize`` builds both
sides, so a skew between training features and serving features
cannot exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propulsion_spark.operators.textops import _toks

N_FEATURES = 1 << 18
PARETO_ALPHA = 9.0  # GPT-3's filter shape parameter


def _featurize(docs: DataFrame, n_features: int) -> DataFrame:
    """``docs`` (any columns + ``text``) with a hashed unigram+bigram
    count ``features`` vector appended (``text`` and the temporary
    gram array dropped). Tokens are the corpus-standard split (textops
    ``_toks``); bigrams ride in the same hashed space with a ``2_``
    prefix so they only collide with unigrams by hash."""
    from pyspark.ml.feature import HashingTF

    # bigrams via zip_with over shifted SLICES, never element_at(i)
    # indexing back into the array: Catalyst freely inlines column
    # aliases into lambda bodies (projection collapse + filter
    # pushdown), and an inlined `element_at(split(text), i)` lambda
    # re-tokenizes the document PER ELEMENT — O(tokens²) per row, 6×
    # slower end-to-end and quadratically worse with doc length. The
    # zip_with form's lambda touches only its element arguments, so
    # every inlined copy of the split stays one linear pass.
    grams = docs.withColumn("_t", F.expr(_toks("spark"))).withColumn(
        "_grams",
        F.expr(
            "concat(_t, zip_with("
            "  slice(_t, 1, greatest(size(_t) - 1, 0)),"
            "  slice(_t, 2, greatest(size(_t) - 1, 0)),"
            "  (a, b) -> concat('2_', a, ' ', b)))"
        ),
    )
    tf = HashingTF(
        inputCol="_grams", outputCol="features", numFeatures=n_features
    )
    return tf.transform(grams).drop("_grams", "_t", "text")


def train(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    n_features: int = N_FEATURES,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the linear quality model: positive = trusted corpus sample,
    negative = raw crawl. Returns the fitted
    ``LogisticRegressionModel`` (Spark ML persistence: ``.save(path)``
    / ``LogisticRegressionModel.load(path)``). Sampling the bigger
    side down is the caller's imbalance knob, as in the published
    recipes."""
    from pyspark.ml.classification import LogisticRegression

    labeled = (
        pos_docs.select("text").withColumn("label", F.lit(1.0))
        .unionByName(neg_docs.select("text").withColumn("label", F.lit(0.0)))
    )
    train_df = _featurize(labeled, n_features).select("features", "label")
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    return lr.fit(train_df)


def score_quality(
    docs: DataFrame, model, n_features: "int | None" = None
) -> DataFrame:
    """(doc_id, quality): P(trusted | text) under the fitted model —
    map-only scoring against the broadcast coefficient vector.

    The feature-space size is DERIVED from the fitted model
    (``model.numFeatures``) — scoring in any other space is silently
    meaningless (same-size: wrong buckets; different-size: an opaque
    BLAS dimension error — the r12 ADVICE finding). ``n_features`` is
    accepted only as a cross-check and must match the model."""
    from pyspark.ml.functions import vector_to_array

    model_n = int(model.numFeatures)
    if n_features is not None and int(n_features) != model_n:
        raise ValueError(
            f"n_features={n_features} does not match the fitted model's "
            f"feature space (model.numFeatures={model_n}); the model "
            "decides — drop the override or retrain"
        )
    scored = model.transform(
        _featurize(docs.select("doc_id", "text"), model_n)
    )
    return scored.select(
        "doc_id",
        vector_to_array("probability").getItem(1).alias("quality"),
    )


def threshold_for_keep_rate(
    scored: DataFrame,
    keep_rate: float,
    quality_col: str = "quality",
    rel_err: float = 0.001,
) -> float:
    """The hard-floor threshold that keeps approximately ``keep_rate``
    of the scored corpus — the budget-first way to pick
    ``quality_min`` (production often fixes the kept-token budget and
    derives the cut, rather than trusting absolute probabilities from
    an uncalibrated linear model). One distributed approxQuantile pass
    (Greenwald-Khanna, driver gets one float); apply with
    ``scored.filter(col >= threshold)``."""
    if not 0.0 < keep_rate <= 1.0:
        raise ValueError("keep_rate must be in (0, 1]")
    q = scored.approxQuantile(quality_col, [1.0 - keep_rate], rel_err)
    if not q:  # empty frame / all-null column: no quantile exists
        raise ValueError(
            "threshold_for_keep_rate needs at least one non-null "
            f"'{quality_col}' row to derive a threshold from"
        )
    return q[0]


def pareto_filter(
    scored: DataFrame,
    alpha: float = PARETO_ALPHA,
    salt: str = "quality-0",
    quality_col: str = "quality",
) -> DataFrame:
    """Apply the GPT-3 acceptance rule: keep a document when
    ``quality > 1 - X`` with ``X ~ numpy.random.pareto(alpha)`` — the
    LOMAX (Pareto II) distribution, support [0, ∞): a perfect score
    always survives, a zero score still survives with probability
    ``2^-alpha`` (≈0.2% at the published α=9), and in between the
    filter shapes rather than guillotines. The draw is deterministic:
    ``u = md5(salt ‖ doc_id)`` mapped through the Lomax inverse
    survival ``X = u^(-1/alpha) - 1`` — stable under repartitioning
    and replay (the split-assignment idiom); re-salt for an
    independent draw. Returns the kept rows unchanged."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), F.col("doc_id"))), 1, 15
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**15))
    )
    # guard u=0 (would blow up the inverse CDF); the md5 space makes it
    # measure-zero but floats are not measure theory
    x = F.pow(F.greatest(u, F.lit(1e-18)), F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.filter(F.col(quality_col) > (F.lit(1.0) - x))
