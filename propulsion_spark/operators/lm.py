"""N-gram language-model quality scoring (the CCNet/KenLM-style LM
filter every pre-training curation pipeline runs): train bigram counts
over a reference corpus, then score documents by their mean bigram
likelihood — low-likelihood docs are gibberish/OCR noise, very-high
ones are boilerplate/templates.

Spark-first shapes, in scale order:

- **train**: one explode → groupBy(gram) count (map-side combine
  absorbs the corpus; the count table is O(distinct grams), pruned by
  ``min_count``) plus the same for prefixes. Two shuffles total.
- **corpus self-score** (the ``text_lang_stats`` facet): needs NO
  re-join against the corpus at all — every occurrence of gram g has
  the same probability, so per-group likelihood is
  ``sum(c · P(g)) / sum(c)`` over the *counts table only*.
- **per-doc score, exact** (``lm_likelihood(mode="join")``): explode
  doc bigrams → join the counts table → per-doc mean. The counts join
  is broadcastable once ``min_count`` prunes the tail; per-doc agg is
  map-side-combined (a doc's grams live in one partition).
- **per-doc score, 100 TB** (``mode="broadcast"``): the pruned LM is
  collected once into a broadcast dict and a vectorized Pandas UDF
  scores each partition map-only — zero shuffle, the shape to fuse
  into a curation scan. Log-probability with add-alpha OOV smoothing
  (floats are fine here: nothing cross-engine to match).

Cross-engine float rule: the oracle-attested path never sums raw
doubles. Per-gram probability is integer-scaled ``(c · 2^30) div p``
(pure BIGINT ops, bit-identical on Spark and DuckDB — the repo's
``floor(x·2^k)`` rule from embedding_centroids), summed as BIGINT,
divided once at the end (double division of identical integers is
correctly rounded, hence identical). Overflow bound: ``scaled ≤ 2^30``
(c ≤ p always), so the per-group sum ``Σ c·scaled ≤ 2^30 · Σc`` —
safe in BIGINT up to ~2^33 grams per group; for a 100 TB corpus
(≈1e13 grams/group) drop ``LM_SCALE_BITS`` to ~16 or sum per-language
partials in DECIMAL(38,0).

jet/propulsion has no LM-filter analogue — this is part of the
LLM-data-pipeline extension surface, alongside dedup/decontam/packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LM_SCALE_BITS = 30
LM_SCALE = 1 << LM_SCALE_BITS

_TOKS = "split(lower(trim(text)), '\\\\s+')"


def _bigram_pairs_expr(text_col: str = "text") -> str:
    """SQL expr: ``array<struct<w1,w2>>`` of adjacent token pairs.

    Two deliberate shapes (both measured classes in this repo):
    - the token split is LET-BOUND (``dedup.let_bound``) so it runs
      once per row — inlined, Catalyst re-executes the regex split for
      every ``element_at``, O(tokens²) per document (the r7 decontam
      bug class);
    - pairs stay a (w1, w2) STRUCT, not a concatenated string — the
      per-occurrence concat only to be re-split later cost ~2× on the
      sf0.1 train; the human-readable gram string is built once per
      DISTINCT gram on the tiny counts table instead.

    A doc with <2 tokens (including the ``['']`` empty-split artifact)
    contributes no pairs: the one out-of-range pair built by the
    ``greatest`` floor has a NULL w2 and is filtered (post-split tokens
    are never legitimately NULL).
    """
    from propulsion_spark.operators.dedup import let_bound

    toks = f"split(lower(trim({text_col})), '\\\\s+')"
    body = (
        # try_element_at: the one out-of-range probe on a <2-token doc
        # must yield NULL (to be filtered), not an ANSI-mode throw
        "filter(transform(sequence(1, greatest(size(x) - 1, 1)), "
        "i -> struct(element_at(x, i) AS w1, try_element_at(x, i + 1) AS w2)), "
        "p -> p.w2 IS NOT NULL)"
    )
    return let_bound(toks, body)


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    by: str | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Bigram count table: (``by``?, prefix, gram, c, p) where ``c`` is
    the gram count and ``p`` the prefix (first-token) count —
    P(w2|w1) = c/p, kept as INTEGERS so callers pick their own float
    discipline. ``by`` trains one LM per group (e.g. per language);
    ``min_count`` prunes the long tail so the table broadcasts.

    Scale: explode → ONE hash-aggregate (map-side combine absorbs the
    corpus; post-shuffle rows are O(distinct grams)), then the prefix
    total is a window sum OVER THE COUNTS TABLE — same result as a
    counts↔prefix-counts self-join but with one corpus scan instead of
    two and no join (lazy evaluation would otherwise recompute the
    whole explode+aggregate for the prefix side). Window partitions
    are (keys, prefix) — bounded by the vocabulary, never the corpus.
    ``min_count`` filters AFTER the window, so ``p`` still counts the
    pruned tail (probabilities stay true, the table just omits rare
    grams — OOV handling is the scorer's job).
    """
    keys = [by] if by else []
    pairs = docs.select(
        *keys, F.explode(F.expr(_bigram_pairs_expr(text_col))).alias("pr")
    ).select(*keys, F.col("pr.w1").alias("prefix"), F.col("pr.w2").alias("_w2"))
    counts = pairs.groupBy(*keys, "prefix", "_w2").agg(
        F.count("*").alias("c")
    )
    w = Window.partitionBy(*keys, "prefix")
    out = (
        counts.withColumn("p", F.sum("c").over(w))
        # gram string built once per DISTINCT gram, on the tiny table
        .withColumn("gram", F.concat_ws(" ", "prefix", "_w2"))
        .select(*keys, "prefix", "gram", "c", "p")
    )
    if min_count > 1:
        out = out.filter(F.col("c") >= min_count)
    return out


def lm_likelihood(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str | None = None,
    mode: str = "broadcast",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document LM score: (id, n_grams, score).

    ``mode="join"``: exact linear mean likelihood — each doc bigram
    joins the LM table, OOV grams contribute 0, score =
    mean(c/p). Integer-scaled internally, so the result is
    deterministic to the bit on any engine/partitioning.

    ``mode="broadcast"``: the 100 TB path — mean LOG-likelihood with
    add-alpha OOV smoothing via a vectorized Pandas UDF over a
    broadcast {gram: (c, p)} dict. Map-only: no explode row blowup
    crosses a shuffle, no join. Train with ``min_count`` so the dict
    stays executor-memory-bounded.
    """
    keys = [by] if by else []
    if mode == "join":
        grams = docs.select(
            id_col,
            *keys,
            F.explode(F.expr(_bigram_pairs_expr(text_col))).alias("pr"),
        ).select(
            id_col,
            *keys,
            F.concat_ws(" ", "pr.w1", "pr.w2").alias("gram"),
        )
        scored = grams.join(
            F.broadcast(lm.select(*keys, "gram", "c", "p")), [*keys, "gram"], "left"
        ).withColumn(
            # BIGINT throughout: (c·2^30) div p, never a double until
            # the final one-shot division (the repo's floor(x·2^k) rule)
            "scaled",
            F.coalesce(
                F.expr(f"(c * {LM_SCALE}L) div p"), F.lit(0)
            ).cast("long"),
        )
        return scored.groupBy(id_col).agg(
            F.count("*").alias("n_grams"),
            (
                F.sum("scaled").cast("double")
                / (F.count("*") * F.lit(float(LM_SCALE)))
            ).alias("score"),
        )
    if mode != "broadcast":
        raise ValueError(f"unknown mode {mode!r}")
    bc = broadcast_lm(docs.sparkSession, lm, by=by, alpha=alpha)
    return lm_likelihood_bc(docs, bc, text_col=text_col, id_col=id_col, by=by)


def broadcast_lm(spark, lm: DataFrame, by: str | None = None, alpha: float = 0.1):
    """Collect a (pruned) LM counts table once and broadcast it for the
    life of a pipeline — the same one-broadcast discipline as the
    decontamination Bloom bitset (pipelines re-broadcasting per batch
    leak driver memory and re-ship the table every trigger)."""
    keys = [by] if by else []
    rows = lm.select(*keys, "gram", "c", "p").collect()
    if by:
        table: dict = {}
        for r in rows:
            table.setdefault(r[by], {})[r["gram"]] = (r["c"], r["p"])
    else:
        table = {None: {r["gram"]: (r["c"], r["p"]) for r in rows}}
    # vocab size per group for the add-alpha denominator
    vocab = {g: len(t) for g, t in table.items()}
    return spark.sparkContext.broadcast((table, vocab, alpha))


def lm_likelihood_bc(
    docs: DataFrame,
    bc,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str | None = None,
) -> DataFrame:
    """`lm_likelihood(mode="broadcast")` against an already-broadcast
    LM (see :func:`broadcast_lm`): map-only, zero shuffle.

    Per-token work is vectorized (repo hot-path rule): the gram→logp
    table is precomputed ONCE per task per group from the broadcast
    counts (O(LM) floats, same bound as the dict itself), each row's
    grams go through one ``Series.map`` with the constant OOV
    log-probability as the fill — log((0+α)/(0+α·V)) = -log V, since
    an absent gram carries no prefix count — and per-doc sums are a
    ``bincount``. Only the gram-string build remains Python-level.
    """
    import math

    import numpy as np
    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()
    grp_col = F.col(by) if by else F.lit(None).cast("string")
    narrow = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text"),
        grp_col.alias("_grp"),
    )

    def per_batch(batches):
        tbl, voc, a = bc.value
        tables: dict = {}  # grp -> (logp dict | None, oov, no_lm_score)

        def _tables(g):
            hit = tables.get(g)
            if hit is None:
                lmt = tbl.get(g) or {}
                v = voc.get(g, 0) or 1
                logp = {
                    k: math.log((c + a) / (p + a * v))
                    for k, (c, p) in lmt.items()
                } or None
                hit = tables[g] = (logp, math.log(a / (a * v)), math.log(a / v))
            return hit

        for pdf in batches:
            toks_per_row = [
                str(t).lower().strip().split() for t in pdf["_text"]
            ]
            ng = np.fromiter(
                (max(len(ts) - 1, 0) for ts in toks_per_row),
                dtype="int64",
                count=len(toks_per_row),
            )
            scores: list = [None] * len(toks_per_row)
            by_grp: dict = {}
            for i, g in enumerate(pdf["_grp"]):
                by_grp.setdefault(g, []).append(i)
            for g, idxs in by_grp.items():
                logp, oov, no_lm = _tables(g)
                if logp is None:
                    for i in idxs:
                        if ng[i] > 0:
                            scores[i] = no_lm
                    continue
                flat = [
                    ts[j] + " " + ts[j + 1]
                    for i in idxs
                    for ts in (toks_per_row[i],)
                    for j in range(len(ts) - 1)
                ]
                if not flat:
                    continue
                vals = (
                    pd.Series(flat, dtype="object")
                    .map(logp)
                    .to_numpy(dtype="float64", na_value=oov)
                )
                rix = np.repeat(np.asarray(idxs, dtype="int64"), ng[idxs])
                sums = np.bincount(rix, weights=vals, minlength=len(scores))
                for i in idxs:
                    if ng[i] > 0:
                        scores[i] = sums[i] / ng[i]
            yield pd.DataFrame(
                {id_col: pdf["_id"], "n_grams": ng, "score": scores}
            )

    return narrow.mapInPandas(
        per_batch, f"{id_col} {id_type}, n_grams long, score double"
    )


def lm_self_score_by_lang(docs: DataFrame) -> DataFrame:
    """Per-language corpus self-likelihood from the counts table alone
    (the ``text_lang_stats`` facet): every occurrence of gram g scores
    the same, so the corpus mean is Σ c·scaled(g) / (Σc · 2^30) — no
    re-join against the corpus, all-integer until one final division.
    """
    lm = train_bigram_lm(docs, by="lang")
    scaled = F.expr(f"(c * {LM_SCALE}L) div p")
    return lm.groupBy("lang").agg(
        F.sum("c").cast("long").alias("lm_grams"),
        F.sum(F.col("c") * scaled).cast("long").alias("lm_scaled"),
    ).select(
        "lang",
        "lm_grams",
        "lm_scaled",
        (
            F.col("lm_scaled").cast("double")
            / (F.col("lm_grams").cast("double") * F.lit(float(LM_SCALE)))
        ).alias("lm_self_score"),
    )
