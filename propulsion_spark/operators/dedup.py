"""Deduplication operators over the ``documents`` table — the
training-data-pipeline surface (exact hash, MinHash+LSH, SimHash).

All hashing is built from md5 (available and bit-identical in both
Spark and DuckDB), so every stage is oracle-checkable. Spark-side
everything stays in whole-stage codegen: higher-order array functions
(transform/array_min/aggregate), no Python UDFs, and the only shuffles
are the groupBy/join on the dedup keys themselves — the minimum any
dedup needs. At 100 TB the LSH band join is the standard scale path:
candidates are generated per band bucket instead of O(n²).

Production note: the signature stage is compute-bound on md5 (one
digest per distinct shingle — measured ~half the pairs query at
sf0.1). md5 is the deliberate ORACLE-portable design point; a
deployment that doesn't need cross-engine hash equality swaps
``SPARK_H64`` for ``xxhash64(x)`` (JVM-intrinsic, ~5-10× faster, same
map-only shape) without touching any other stage — the banding,
joins and verification are hash-agnostic.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.operators import finalize, register

# 64-bit portable hash: first 15 hex digits of md5 → BIGINT (60 bits).
SPARK_H64 = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"
DUCK_H64 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def normalized(dialect: str, col: str = "text") -> str:
    """lower + trim + collapse-whitespace, expressed per dialect.

    Spark SQL string literals process backslash escapes ('\\\\s+' in SQL
    text); DuckDB literals do not, and its regexp_replace needs the 'g'
    flag to replace all matches (Spark replaces all by default).
    """
    if dialect == "spark":
        return f"lower(trim(regexp_replace({col}, '\\\\s+', ' ')))"
    return f"lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"


# MinHash family: h_k(x) = h(x) XOR seed_k (one md5 per shingle, K cheap mixes).
NUM_HASHES = 8
BANDS = 2  # 2 bands × 4 rows — biased to high-similarity pairs
SEEDS = [0] + [
    int.from_bytes(hashlib.md5(f"propulsion-seed-{k}".encode()).digest()[:7], "big")
    for k in range(1, NUM_HASHES)
]
SHINGLE = 5  # character shingles
MH_NAMES = [f"mh{k}" for k in range(NUM_HASHES)]
ROWS_PER_BAND = NUM_HASHES // BANDS
BAND_DEFS = [
    (f"b{b}", MH_NAMES[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND])
    for b in range(BANDS)
]


# ------------------------------------------------------------ exact dedup
@register(
    "dedup_exact",
    f"""
SELECT md5({normalized('duck')}) AS fp,
       min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY 1
""",
    doc="Exact dedup: group by content hash of normalized text, keep the "
    "lowest doc_id. Hash-groupBy shuffles once on the fingerprint.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", F.expr(f"md5({normalized('spark')})"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
    )


# ----------------------------------------------------------- minhash sigs
def _shingle_hashes(dialect: str, distinct: bool = False) -> str:
    """Expression for the array of 64-bit shingle hashes over ``norm``.

    ``distinct=True`` deduplicates shingles BEFORE hashing — correct
    ONLY for consumers insensitive to multiplicity and position
    (MinHash: min-over-hashes is unchanged by repeats, and on
    boilerplate-heavy corpora the distinct set is a small fraction of
    the occurrence stream). Winnowing must keep the positional stream:
    its sliding windows are over text positions."""
    if dialect == "spark":
        shingles = (
            f"transform(sequence(1, greatest(length(norm) - {SHINGLE - 1}, 1)),"
            f" i -> substring(norm, i, {SHINGLE}))"
        )
        if distinct:
            shingles = f"array_distinct({shingles})"
        return f"transform({shingles}, s -> {SPARK_H64.format(x='s')})"
    shingles = (
        f"list_transform(generate_series(1, greatest(length(norm) - {SHINGLE - 1}, 1)),"
        f" i -> substr(norm, CAST(i AS INT), {SHINGLE}))"
    )
    if distinct:
        shingles = f"list_distinct({shingles})"
    return f"list_transform({shingles}, s -> {DUCK_H64.format(x='s')})"


def _minhash_cols(dialect: str) -> list[str]:
    """Min over seed-mixed shingle hashes; ``hs`` computed once upstream."""
    if dialect == "spark":
        return [
            f"array_min(transform(hs, h -> h ^ {seed})) AS mh{k}"
            for k, seed in enumerate(SEEDS)
        ]
    return [
        f"list_min(list_transform(hs, h -> xor(h, {seed}))) AS mh{k}"
        for k, seed in enumerate(SEEDS)
    ]


_DUCK_SIGS = f"""
  SELECT doc_id, {', '.join(_minhash_cols('duck'))}
  FROM (
    SELECT doc_id, {_shingle_hashes('duck', distinct=True)} AS hs
    FROM (SELECT doc_id, {normalized('duck')} AS norm FROM documents)
  )
"""


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """MinHash signatures over any frame with (doc_id, text): 5-char
    shingles → 64-bit hash → 8 xor-mixed min-hashes per doc. Pure map
    stage (no shuffle); JVM-side higher-order functions, one md5 per
    DISTINCT shingle (multiplicity cannot change a min)."""
    return (
        docs.withColumn("norm", F.expr(normalized("spark")))
        .withColumn("hs", F.expr(_shingle_hashes("spark", distinct=True)))
        .selectExpr("doc_id", *_minhash_cols("spark"))
    )


def q_dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-table binding of :func:`minhash_signatures`.
    Oracle-verified through ``dedup_minhash_lsh_pairs`` (whose DuckDB
    oracle recomputes the full signature matrix from scratch)."""
    return minhash_signatures(load_table(spark, sf_dir, "documents"))


def with_bands(sigs: DataFrame) -> DataFrame:
    """Attach the band keys (concatenated signature rows) to a
    signature frame."""
    for name, cols in BAND_DEFS:
        sigs = sigs.withColumn(name, F.concat_ws("_", *cols))
    return sigs


def minhash_with_bands(
    spark: SparkSession, sf_dir: str, persist: bool = False
) -> DataFrame:
    df = with_bands(q_dedup_minhash_signatures(spark, sf_dir))
    if persist:
        # materialize signatures once: every band self-join reads them
        # 2×, and recomputing means re-hashing every shingle (the
        # standard LSH practice of persisting the signature matrix)
        df = df.persist()
    return df


_DUCK_SIGS_BANDED = f"""
sigs AS (
  SELECT *, {', '.join(f"concat_ws('_', {', '.join(cols)}) AS {name}" for name, cols in BAND_DEFS)}
  FROM ({_DUCK_SIGS})
)
"""

_MATCHES = "+".join(
    f"(CASE WHEN a.mh{k} = b.mh{k} THEN 1 ELSE 0 END)" for k in range(NUM_HASHES)
)

# ---- exact n-gram verification knobs (the verify stage below) ----
NGRAM = 3  # word 3-grams
JACCARD_CUTOFF = 0.2


def let_bound(value_expr: str, body_with_x: str) -> str:
    """Spark-SQL let-binding: evaluate ``value_expr`` ONCE per row, make
    it available to ``body_with_x`` as the lambda variable ``x``.

    ``transform(array(v), x -> body)[0]`` — the single-element array is
    evaluated once and the HOF binds ``x`` to it, so every reference to
    ``x`` inside the body reads the bound value. A plain two-projection
    select does NOT achieve this: Catalyst collapses the projections and
    re-inlines the alias into each reference, re-running the expression
    per reference (measured on the 3-gram builder at sf0.1: 8.9 s
    inlined vs 0.55 s let-bound — the token split was re-executed for
    every element_at call, O(tokens²) regex splits per document).
    """
    return f"element_at(transform(array({value_expr}), x -> {body_with_x}), 1)"


def _grams(dialect: str) -> str:
    """Distinct word 3-gram array over ``text`` (both dialects skip
    NULL tail elements identically via concat_ws).

    The tail probes are ``try_element_at``: Spark 4's ANSI mode makes
    plain ``element_at`` THROW on the out-of-range i+1/i+2 of a
    <3-token document (DuckDB's ``toks[i+1]`` yields NULL there, which
    is the designed concat_ws-skip semantics — pre-ANSI Spark matched
    it silently; ``try_element_at`` restores the match explicitly).
    The test corpus never has 1–2-token docs, so this only bites real
    corpora — found via the lm.py bigram builder hitting the same wall.
    """
    if dialect == "spark":
        toks = "split(lower(trim(text)), '\\\\s+')"
        body = (
            f"array_distinct(transform(sequence(1, greatest(size(x) - {NGRAM - 1}, 1)), "
            "i -> concat_ws(' ', element_at(x, cast(i as int)), "
            "try_element_at(x, cast(i+1 as int)), try_element_at(x, cast(i+2 as int)))))"
        )
        return let_bound(toks, body)
    toks = "string_split_regex(lower(trim(text)), '\\s+')"
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(length({toks}) - {NGRAM - 1}, 1)), "
        f"i -> concat_ws(' ', {toks}[i], {toks}[i+1], {toks}[i+2])))"
    )


# Shared by the pairs report, the n-gram verify stage, and the cluster
# operator: every (a_id < b_id) doc pair co-bucketed in ANY band, with
# its signature-match count.
_DUCK_BAND_PAIRS = f"""
band_pairs AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, ({_MATCHES}) AS matches
  FROM sigs a JOIN sigs b
    ON a.doc_id < b.doc_id AND ({' OR '.join(f'a.{name} = b.{name}' for name, _ in BAND_DEFS)})
)
"""


def signature_matches() -> F.Column:
    """Signature-agreement count between aliased sides ``a`` and ``b``."""
    matches = None
    for k in range(NUM_HASHES):
        term = F.when(F.col(f"a.mh{k}") == F.col(f"b.mh{k}"), 1).otherwise(0)
        matches = term if matches is None else (matches + term)
    return matches


def band_pairs_from_sigs(sigs: DataFrame) -> DataFrame:
    """All banded co-bucketed doc pairs ``(a_id, b_id, matches)`` from a
    banded-signature frame.

    One equi-join per band (shuffle-hash on the band key — the LSH scale
    shape), then union+distinct. An OR of band predicates would deny
    Spark an equi-join and fall back to a nested-loop O(n²) scan."""
    matches = signature_matches()
    per_band = []
    for name, _ in BAND_DEFS:
        a = sigs.alias("a")
        b = sigs.alias("b")
        per_band.append(
            a.join(b, F.col(f"a.{name}") == F.col(f"b.{name}"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"),
                matches.alias("matches"),
            )
        )
    out = per_band[0]
    for df in per_band[1:]:
        out = out.unionByName(df)
    # matches is a pure function of the pair, so distinct collapses the
    # per-band duplicates exactly
    return out.distinct()


def lsh_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-table binding of :func:`band_pairs_from_sigs`; signatures
    persisted once across the band joins."""
    return band_pairs_from_sigs(minhash_with_bands(spark, sf_dir, persist=True))


# ---- fuzzy edit-distance join (r9): PassJoin segment signatures ----
# Key length picks the segment entropy: at 16 the ~11-char segments of
# a low-entropy corpus (synthetic 30-word vocabulary) collapse to a few
# hot values and the candidate join goes quadratic inside them (10.1 s
# at sf0.1); at 32 each segment spans ~2 words and candidates are
# near-linear (1.9 s, measured) — same lever as LSH bucket width.
FUZZY_LEN = 32  # fixed-length normalized prefix key
FUZZY_MAXD = 2  # levenshtein bound


def _ed_segments(length: int = FUZZY_LEN, d: int = FUZZY_MAXD):
    """(idx, start, len) of the d+1 contiguous key segments (1-based
    starts), longer segments first — the PassJoin partition scheme."""
    n = d + 1
    base, rem = divmod(length, n)
    segs, start = [], 1
    for i in range(n):
        seg_len = base + (1 if i < rem else 0)
        segs.append((i, start, seg_len))
        start += seg_len
    return segs


def _fuzzy_key(dialect: str, text_col: str = "text") -> str:
    """Fixed-length record-linkage key: the first FUZZY_LEN chars of the
    normalized text, '#'-padded so every key has exactly FUZZY_LEN chars
    (the fixed length is what makes the segment scheme complete)."""
    if dialect == "spark":
        return f"rpad(substring({normalized('spark', text_col)}, 1, {FUZZY_LEN}), {FUZZY_LEN}, '#')"
    return f"rpad(substr({normalized('duck', text_col)}, 1, {FUZZY_LEN}), {FUZZY_LEN}, '#')"


def fuzzy_edit_pairs(
    docs: DataFrame,
    max_dist: int = FUZZY_MAXD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(a_id, b_id, dist): all doc pairs whose fixed-length prefix keys
    are within ``max_dist`` levenshtein edits — the record-linkage /
    fuzzy-join verb (near-identical titles, headers, URLs).

    Candidate generation is the PassJoin partition scheme (Li, Deng,
    Feng VLDB'11): each key splits into d+1 contiguous segments; by
    pigeonhole, ed(a,b) <= d means at least one of a's segments occurs
    verbatim in b within a ±d position shift, so candidates come from
    ONE equi-join on (segment_idx, segment_text) — never O(n²) — and
    the exact levenshtein verify runs on candidates only. Explode
    fan-out is (d+1) rows on the probe side and ≤ (d+1)(2d+1) on the
    build side, constants at any corpus size; skewed segments (shared
    boilerplate prefixes) behave like hot LSH buckets and are handled
    the same way (AQE skew join).
    """
    segs = _ed_segments(FUZZY_LEN, max_dist)
    seg_structs = ", ".join(
        f"named_struct('i', {i}, 's', {s}, 'l', {l})" for i, s, l in segs
    )
    keys = docs.selectExpr(
        f"{id_col} AS doc_id", f"{_fuzzy_key('spark', text_col)} AS k"
    )
    asegs = keys.selectExpr(
        "doc_id AS a_id", "k AS ka", f"explode(array({seg_structs})) AS g"
    ).selectExpr("a_id", "g.i AS i", "substring(ka, g.s, g.l) AS seg")
    bsubs = (
        keys.selectExpr(
            "doc_id AS b_id", "k AS kb", f"explode(array({seg_structs})) AS g"
        )
        .selectExpr(
            "b_id",
            "kb",
            "g.i AS i",
            "g.l AS l",
            f"explode(sequence(greatest(1, g.s - {max_dist}),"
            f" least(g.s + {max_dist}, {FUZZY_LEN} - g.l + 1))) AS st",
        )
        .selectExpr("b_id", "kb", "i", "substring(kb, st, l) AS seg")
    )
    cands = (
        asegs.join(bsubs, ["i", "seg"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
        )
        .distinct()
    )
    ka = keys.select(F.col("doc_id").alias("a_id"), F.col("k").alias("ka"))
    kb = keys.select(F.col("doc_id").alias("b_id"), F.col("k").alias("kb"))
    return (
        cands.join(ka, "a_id")
        .join(kb, "b_id")
        .withColumn("dist", F.levenshtein("ka", "kb").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("a_id", "b_id", "dist")
    )


def fuzzy_segment_stats(
    docs: DataFrame,
    max_dist: int = FUZZY_MAXD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per segment index: bucket-occupancy gauge for the fuzzy
    join's candidate stage — n_buckets, max/avg bucket size, and the
    exact candidate-pair count Σ n·(n−1) the (idx, seg) equi-join will
    materialize. The lsh_bucket_stats twin for PassJoin: this round's
    hot-segment incident (a 16-char key collapsed to a few segment
    values and the join went quadratic inside them — 10.1 s → 1.9 s
    after widening to 32) is exactly what this gauge makes visible
    BEFORE the join runs at 100 TB. Aggregate-only: the gauge itself
    never builds a pair."""
    segs = _ed_segments(FUZZY_LEN, max_dist)
    seg_structs = ", ".join(
        f"named_struct('i', {i}, 's', {s}, 'l', {l})" for i, s, l in segs
    )
    keys = docs.selectExpr(
        f"{id_col} AS doc_id", f"{_fuzzy_key('spark', text_col)} AS k"
    )
    buckets = (
        keys.selectExpr("doc_id", "k", f"explode(array({seg_structs})) AS g")
        .selectExpr("g.i AS i", "substring(k, g.s, g.l) AS seg")
        .groupBy("i", "seg")
        .agg(F.count("*").alias("n"))
    )
    return buckets.groupBy("i").agg(
        F.count("*").alias("n_buckets"),
        F.max("n").alias("max_bucket"),
        (F.sum("n").cast("double") / F.count("*")).alias("avg_bucket"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("candidate_pairs"),
    )


def _fuzzy_duck() -> str:
    """DuckDB twin of fuzzy_edit_pairs at the default (LEN, D)."""
    segs = _ed_segments()
    seg_rows = ", ".join(f"({i}, {s}, {l})" for i, s, l in segs)
    return f"""
fkeys AS (
  SELECT doc_id, {_fuzzy_key('duck')} AS k FROM documents
),
fsegs AS (
  SELECT doc_id AS a_id, i, substr(k, s, l) AS seg
  FROM fkeys, (VALUES {seg_rows}) segs(i, s, l)
),
fsubs AS (
  SELECT b_id, i, substr(k, CAST(st AS INT), l) AS seg
  FROM (
    SELECT doc_id AS b_id, k, i, l,
           unnest(generate_series(greatest(1, s - {FUZZY_MAXD}),
                                  least(s + {FUZZY_MAXD}, {FUZZY_LEN} - l + 1))) AS st
    FROM fkeys, (VALUES {seg_rows}) segs(i, s, l)
  )
),
fcand AS (
  SELECT DISTINCT least(a_id, b_id) AS a_id, greatest(a_id, b_id) AS b_id
  FROM fsegs JOIN fsubs USING (i, seg) WHERE a_id != b_id
),
fuzzy AS (
  SELECT a_id, b_id, levenshtein(ka.k, kb.k) AS dist
  FROM fcand JOIN fkeys ka ON ka.doc_id = a_id JOIN fkeys kb ON kb.doc_id = b_id
  WHERE levenshtein(ka.k, kb.k) <= {FUZZY_MAXD}
)
"""


@register(
    "dedup_minhash_lsh_pairs",
    f"""
WITH {_DUCK_SIGS_BANDED}, {_DUCK_BAND_PAIRS},
{_fuzzy_duck().strip()},
grams AS (SELECT doc_id, {_grams('duck')} AS g FROM documents)
SELECT 'candidate' AS stage, a_id, b_id,
       CAST(matches AS DOUBLE) / {NUM_HASHES} AS score
FROM band_pairs WHERE matches >= {NUM_HASHES // 2}
UNION ALL
SELECT 'verified', a_id, b_id,
       length(list_intersect(ga.g, gb.g)) /
       (length(ga.g) + length(gb.g) - length(list_intersect(ga.g, gb.g)))
FROM band_pairs
JOIN grams ga ON ga.doc_id = a_id
JOIN grams gb ON gb.doc_id = b_id
WHERE length(list_intersect(ga.g, gb.g)) /
      (length(ga.g) + length(gb.g) - length(list_intersect(ga.g, gb.g))) >= {JACCARD_CUTOFF}
UNION ALL
SELECT 'edit', a_id, b_id, CAST(dist AS DOUBLE) FROM fuzzy
""",
    doc="The near-dup pair pipeline in one report. stage='candidate': "
    "MinHash-LSH band-bucket pairs at estimated Jaccard ≥ 0.5 (score = "
    "signature agreement; shuffle on band key, never O(n²)). "
    "stage='verified': exact word-3-gram Jaccard ≥ 0.2 computed on the "
    "banded candidates only (cheap LSH recall → exact precision, the "
    "100 TB scale shape — verification cost scales with candidates, not "
    "with the corpus squared). Merged r5 from dedup_minhash_lsh_pairs + "
    "dedup_ngram_jaccard so the driver gate attests both stages. "
    f"stage='edit' (r9): the fuzzy edit-distance join — levenshtein ≤ "
    f"{FUZZY_MAXD} over fixed-{FUZZY_LEN}-char normalized prefix keys, "
    "candidates from the complete PassJoin segment scheme (one "
    "equi-join on (segment_idx, segment_text)); score = the distance.",
)
def q_dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = minhash_with_bands(spark, sf_dir, persist=True)
    pairs = band_pairs_from_sigs(sigs).persist()
    candidates = pairs.filter(F.col("matches") >= NUM_HASHES // 2).select(
        F.lit("candidate").alias("stage"),
        "a_id",
        "b_id",
        (F.col("matches").cast("double") / NUM_HASHES).alias("score"),
    )
    grams = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_grams('spark')} AS g"
    )
    ga = grams.select(F.col("doc_id").alias("a_id"), F.col("g").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("b_id"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    jaccard = inter / (F.size("ga") + F.size("gb") - inter)
    verified = (
        pairs.select("a_id", "b_id")
        .join(ga, "a_id")
        .join(gb, "b_id")
        .select(
            F.lit("verified").alias("stage"),
            "a_id",
            "b_id",
            jaccard.alias("score"),
        )
        .filter(F.col("score") >= JACCARD_CUTOFF)
    )
    edit = fuzzy_edit_pairs(load_table(spark, sf_dir, "documents")).select(
        F.lit("edit").alias("stage"),
        "a_id",
        "b_id",
        F.col("dist").cast("double").alias("score"),
    )
    return finalize(
        candidates.unionByName(verified).unionByName(edit), pairs, sigs
    )


# ----------------------------------------------------- winnowing
WINNOW_WINDOW = 8  # min-sample 1 fingerprint per window of shingle hashes


def _winnow_fps(dialect: str) -> str:
    """Distinct winnowed fingerprints over the shingle-hash array ``hs``:
    the minimum hash of every sliding window — the classic winnowing
    (MOSS) scheme guaranteeing a match for any shared run ≥ window+k-1
    chars. Built entirely from array HOFs (no shuffle until the explode)."""
    if dialect == "spark":
        wins = (
            f"transform(sequence(1, greatest(size(hs) - {WINNOW_WINDOW - 1}, 1)), "
            f"i -> array_min(slice(hs, i, {WINNOW_WINDOW})))"
        )
        return f"array_distinct({wins})"
    wins = (
        f"list_transform(generate_series(1, greatest(length(hs) - {WINNOW_WINDOW - 1}, 1)), "
        f"i -> list_min(hs[i:i+{WINNOW_WINDOW - 1}]))"
    )
    return f"list_distinct({wins})"


@register(
    "text_winnowing",
    f"""
SELECT doc_id, unnest({_winnow_fps('duck')}) AS fingerprint
FROM (
  SELECT doc_id, {_shingle_hashes('duck')} AS hs
  FROM (SELECT doc_id, {normalized('duck')} AS norm FROM documents)
)
""",
    doc=f"Winnowing fingerprints (rolling-hash min-sampling, window "
    f"{WINNOW_WINDOW}): the MOSS/local-fingerprinting scheme — any shared "
    "substring beyond the guarantee threshold shares a fingerprint, so a "
    "groupBy(fingerprint) finds copied passages at corpus scale.",
)
def q_text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("norm", F.expr(normalized("spark")))
        .withColumn("hs", F.expr(_shingle_hashes("spark")))
    )
    return docs.select(
        "doc_id", F.explode(F.expr(_winnow_fps("spark"))).alias("fingerprint")
    )


# ----------------------------------------------- substring-span dedup
SPAN_K = 8  # span length in word tokens (matches the decontam n-gram n)


def substring_span_stats(
    docs: DataFrame,
    k: int = SPAN_K,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated-SPAN coverage (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): for
    every document, how many of its tokens sit inside a ``k``-token
    span that also appears in at least ``min_docs - 1`` OTHER
    documents. Exact-substring dedup trims or drops those regions;
    this operator computes the per-doc evidence (MinHash answers
    "are these docs similar?" — this answers "which exact passages
    are shared?", the boilerplate/license-header/template signal).

    One row per input document:
    ``(id_col, n_tokens, n_span_positions, n_dup_spans,
    dup_covered_tokens, dup_span_frac)`` — ``dup_covered_tokens`` is
    the exact size of the union of the duplicated ``[pos, pos+k)``
    intervals (equal-length intervals: after sorting positions the
    union adds ``min(k, pos - prev_pos)`` per element, no sweep-line
    state needed), ``dup_span_frac`` that union over ``n_tokens``.

    Scale shape (the suffix-array alternative is not partitionable;
    the n-gram formulation is the standard 100 TB approximation):
    position explode is O(corpus tokens); duplicated-gram detection
    is distinct (gram, doc) → groupBy(gram) with map-side partial
    aggregation; the join back is a gram-key equi-join; the interval
    union is one per-doc window over ONLY the duplicated positions
    (a small fraction of the corpus after the semi-join). No driver
    collect, no Python UDF; integer arithmetic end-to-end so the
    oracle hash-matches bit-exact.
    """
    from propulsion_spark.operators.decontam import _ngram_array_sql

    # Spans shuffle as 60-bit md5 fingerprints, not gram strings: the
    # distinct/groupBy/join pipeline moves 8 bytes per position instead
    # of ~6k·8 chars. Both engines compute the identical hash, so the
    # oracle stays bit-exact; a fingerprint collision falsely marking a
    # span duplicated is the standard accepted error of hash-based
    # substring dedup (exact alternative: suffix arrays, which don't
    # partition).
    grams = _ngram_array_sql(text_col, k)
    hashed = f"transform({grams}, _g -> {SPARK_H64.format(x='_g')})"
    pos = docs.select(
        id_col,
        F.posexplode(F.expr(hashed)).alias("pos", "h"),
    )
    dup = (
        pos.select("h", id_col)
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    cov = (
        pos.join(dup, "h")
        .withColumn(
            "add_cov",
            F.least(
                F.lit(k),
                F.col("pos")
                - F.coalesce(F.lag("pos").over(w), F.col("pos") - k),
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_dup_spans"),
            F.sum("add_cov").alias("dup_covered_tokens"),
        )
    )
    tk = f"filter(split(lower(trim({text_col})), '\\\\s+'), _tk -> _tk != '')"
    base = docs.selectExpr(
        id_col, f"CAST(size({tk}) AS BIGINT) AS n_tokens"
    )
    return base.join(cov, id_col, "left").select(
        id_col,
        "n_tokens",
        F.greatest(F.col("n_tokens") - (k - 1), F.lit(0))
        .cast("long")
        .alias("n_span_positions"),
        F.coalesce(F.col("n_dup_spans"), F.lit(0))
        .cast("long")
        .alias("n_dup_spans"),
        F.coalesce(F.col("dup_covered_tokens"), F.lit(0))
        .cast("long")
        .alias("dup_covered_tokens"),
        (
            F.coalesce(F.col("dup_covered_tokens"), F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1))
        ).alias("dup_span_frac"),
    )


def trim_duplicated_spans(
    docs: DataFrame,
    k: int = SPAN_K,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    drop_empty: bool = False,
) -> DataFrame:
    """APPLY cross-document substring-span dedup (the transformation
    behind :func:`substring_span_stats`'s evidence — Lee et al. 2021's
    ExactSubstr step): every ``k``-token span shared by ≥ ``min_docs``
    documents survives in exactly ONE document (the smallest ``id_col``
    among its holders — deterministic, partition-invariant); all other
    documents have the covered region CUT from their text.

    Returns ``docs`` with ``text_col`` rewritten and an appended
    ``n_tokens_removed`` (long). Untrimmed documents pass through with
    their ORIGINAL text byte-for-byte; trimmed documents are rebuilt
    from the surviving whitespace tokens joined by single spaces (the
    standard normalization of token-level dedup — intra-token bytes are
    preserved, inter-token whitespace is not). ``drop_empty=True``
    drops documents whose every token was cut.

    Scale shape (same skeleton as the stats operator): spans shuffle as
    60-bit fingerprints; the per-gram keeper is one groupBy(h) with
    map-side partials; removal intervals are merged per doc by a
    gaps-and-islands window over ONLY the duplicated positions; and the
    token-rebuild posexplode runs over AFFECTED documents only (semi-
    join first), so an already-clean corpus pays the detection scan and
    nothing else. No driver collect, no Python UDF.

    Keeper semantics: the keeper document keeps its text UNCHANGED for
    that span (including intra-document repeats of it) — "remove all
    but one occurrence" resolved at document granularity, which is the
    partitionable form: per-occurrence global ordering would serialize
    on a total order over (doc, pos) pairs for no measurable corpus
    difference.

    For OCCURRENCE-level semantics — self-repetition within one
    document counted toward the threshold, remove-ALL-copies (the
    published method's default) or a gram-canonical single survivor —
    use the sibling ``operators/substring_dedup.py`` (r12); this
    function stays the cross-document, doc-granularity form the
    CurationPipeline's streaming span stage needs.
    """
    from propulsion_spark.operators.decontam import _ngram_array_sql

    grams = _ngram_array_sql(text_col, k)
    hashed = f"transform({grams}, _g -> {SPARK_H64.format(x='_g')})"
    pos = docs.select(
        id_col, F.posexplode(F.expr(hashed)).alias("pos", "h")
    )
    keepers = (
        pos.select("h", id_col)
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("_nd"), F.min(id_col).alias("_keep"))
        .filter(F.col("_nd") >= min_docs)
        .select("h", "_keep")
    )
    rem = (
        pos.join(keepers, "h")
        .filter(F.col(id_col) != F.col("_keep"))
        .select(id_col, "pos")
        .distinct()
    )
    # merge overlapping/adjacent [pos, pos+k) intervals per doc:
    # island starts where pos exceeds the running max end of prior rows
    w = Window.partitionBy(id_col).orderBy("pos")
    run_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    iv = (
        rem.withColumn(
            "_new",
            F.when(run_end.isNull() | (F.col("pos") > run_end), 1).otherwise(0),
        )
        .withColumn("_gid", F.sum("_new").over(w))
        .groupBy(id_col, "_gid")
        .agg(F.min("pos").alias("_s"), (F.max("pos") + k).alias("_e"))
    )
    covered = iv.select(
        id_col, F.explode(F.expr("sequence(_s, _e - 1)")).alias("_ti")
    )
    nrem = covered.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens_removed")
    )
    # rebuild ONLY affected docs from their surviving original-case
    # tokens (lowercasing in the gram hash never moves whitespace, so
    # gram position == original token index)
    tk = f"filter(split(trim({text_col}), '\\\\s+'), _tk -> _tk != '')"
    affected = docs.join(nrem.select(id_col), id_col)
    toks = affected.select(
        id_col, F.posexplode(F.expr(tk)).alias("_ti", "_tok")
    )
    rebuilt = (
        toks.join(covered, [id_col, "_ti"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(_ti, _tok)))"
                    ", s -> s._tok)"
                ),
            ).alias("_new_text")
        )
    )
    out = (
        docs.join(nrem, id_col, "left")
        .join(rebuilt, id_col, "left")
        .withColumn(
            "n_tokens_removed",
            F.coalesce(F.col("n_tokens_removed"), F.lit(0)).cast("long"),
        )
        .withColumn(
            text_col,
            F.when(
                F.col("n_tokens_removed") > 0,
                F.coalesce(F.col("_new_text"), F.lit("")),
            ).otherwise(F.col(text_col)),
        )
        .drop("_new_text")
    )
    if drop_empty:
        out = out.filter(
            (F.col("n_tokens_removed") == 0) | (F.col(text_col) != "")
        )
    return out


# --------------------------------------------------------------- simhash
SIMHASH_BITS = 16


def _token_hashes(dialect: str) -> str:
    """Array of 64-bit hashes of whitespace tokens of ``text``."""
    if dialect == "spark":
        toks = "split(lower(trim(text)), '\\\\s+')"
        return f"transform({toks}, t -> {SPARK_H64.format(x='t')})"
    toks = "string_split_regex(lower(trim(text)), '\\s+')"
    return f"list_transform({toks}, t -> {DUCK_H64.format(x='t')})"


def _simhash_over_th(dialect: str) -> str:
    """16-bit simhash given a precomputed hash array column ``th``: per
    bit, majority vote of token-hash bits (+1/−1), weighted by token
    frequency. ``th`` is computed once upstream (one md5 per token)."""
    if dialect == "spark":
        bit_sums = [
            f"aggregate(th, 0L, (acc, h) -> acc + (CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END))"
            for b in range(SIMHASH_BITS)
        ]
    else:
        bit_sums = [
            f"list_sum(list_transform(th, h -> CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END))"
            for b in range(SIMHASH_BITS)
        ]
    terms = [
        f"(CASE WHEN ({s}) > 0 THEN {1 << b} ELSE 0 END)"
        for b, s in enumerate(bit_sums)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_DUCK_SIMHASH = f"""
  SELECT doc_id, {_simhash_over_th('duck')} AS simhash
  FROM (SELECT doc_id, {_token_hashes('duck')} AS th FROM documents)
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints: 16-bit majority-vote of token-hash bits.
    Map-only (no shuffle); near-dups land at small hamming distance.
    Oracle-verified through ``dedup_simhash_buckets`` (whose oracle
    recomputes every per-doc simhash from scratch)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "th", F.expr(_token_hashes("spark"))
    )
    return docs.selectExpr("doc_id", f"{_simhash_over_th('spark')} AS simhash")


@register(
    "dedup_simhash_buckets",
    f"""
SELECT simhash, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keeper
FROM ({_DUCK_SIMHASH})
GROUP BY simhash
HAVING count(*) > 1
""",
    doc="SimHash collision buckets: documents sharing an identical "
    "fingerprint are duplicate candidates; keep the lowest doc_id.",
)
def q_dedup_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    sims = q_dedup_simhash(spark, sf_dir)
    return (
        sims.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


# ----------------------------------------- simhash hamming-ball search
SIMHASH64_CHUNKS = 4


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document — the fingerprint width hamming-ball
    search needs (the 16-bit ``q_dedup_simhash`` variant keeps the
    oracle's integer arithmetic small; 16 bits cannot bucket a corpus).

    Map-only (no shuffle): the token-hash array is let-bound (one md5
    pass per token), then 64 flat ``aggregate`` folds — one per bit —
    produce the vote sums. Measured 2.7× faster at sf0.1 than the
    "clever" single-pass zip_with accumulator, which allocates a
    64-element array PER TOKEN inside the interpreted HOF; flat folds
    allocate nothing. (An explode + codegen groupBy formulation ties
    on steady-state time but adds a shuffle and a multi-second codegen
    compile of the 64-sum aggregate — map-only wins at scale.)
    Majority vote per bit sets the fingerprint; bit sums use +1/−1
    weighted by token frequency, matching the 16-bit operator.
    Distinct powers of two never carry, so summing them composes the
    bit pattern exactly (bit 63 is Long.MIN_VALUE — still exact).

    Token hashes must fill all 64 bits: ``SPARK_H64`` alone is 15 hex
    chars of md5 = 60 bits, which would leave fingerprint bits 60-63
    permanently zero (every vote −n) and collapse the top hamming
    chunk's index from 2^16 to 2^12 values (review-found). The 16th
    md5 hex char supplies the top nibble; low 60 and high 4 bits are
    disjoint, so the sum is exact. The md5 is let-bound inside the
    lambda so each token digests once, not twice.
    """
    terms = []
    for b in range(64):
        vote = (
            f"aggregate(x, 0L, (acc, h) -> "
            f"acc + IF((shiftright(h, {b}) & 1) = 1, 1L, -1L))"
        )
        terms.append(f"IF(({vote}) > 0, shiftleft(1L, {b}), 0L)")
    fingerprint = " + ".join(terms)
    toks = f"split(lower(trim({text_col})), '\\\\s+')"
    h64 = (
        "cast(conv(substring(m, 1, 15), 16, 10) as bigint) + "
        "shiftleft(cast(conv(substring(m, 16, 1), 16, 10) as bigint), 60)"
    )
    th = (
        f"transform({toks}, t -> "
        f"element_at(transform(array(md5(t)), m -> {h64}), 1))"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(let_bound(th, f"CAST({fingerprint} AS BIGINT)")).alias(
            "simhash64"
        ),
    )


def _simhash_chunks(sh: DataFrame, n_chunks: int) -> DataFrame:
    """Explode ``(doc_id, simhash64)`` to one row per fingerprint chunk
    — the bucket key of the hamming equi-join."""
    width = 64 // n_chunks
    # width 64 (n_chunks=1, exact-duplicate-only search): the full
    # fingerprint IS the chunk — a 2^64−1 mask literal would overflow
    # the signed-long parser
    mask = (1 << width) - 1 if width < 64 else None
    return sh.select(
        "doc_id",
        "simhash64",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"shiftright(simhash64, {c * width}) & {mask}L"
                        if mask is not None
                        else "simhash64"
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )


def hamming_bucket_stats(
    docs: DataFrame,
    n_chunks: int = SIMHASH64_CHUNKS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bucket-occupancy gauge for the hamming search — the same
    boundedness rule the LSH band joins report (``lsh_bucket_stats``):
    per chunk index, how many distinct buckets exist, the largest
    bucket, and the exact candidate-pair count the equi-join will
    generate (Σ b·(b−1)/2 over buckets). Run this before pointing
    :func:`simhash_hamming_pairs` at a new corpus: if
    ``candidate_pairs`` is quadratic-looking, the chunk width
    under-selects — raise it by lowering ``max_hamming``/raising chunk
    width, or pre-partition by a coarser key.

    No persist: unlike the pairs operator (both join sides read the
    fingerprints), this is one linear aggregation chain — caching the
    whole fingerprint table for a single consumer would be pure
    block-store churn."""
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    sh = simhash64(docs, text_col=text_col, id_col=id_col)
    occ = (
        _simhash_chunks(sh, n_chunks)
        .groupBy("chunk_idx", "chunk_val")
        .agg(F.count("*").alias("b"))
    )
    return occ.groupBy("chunk_idx").agg(
        F.count("*").alias("n_buckets"),
        F.sum("b").alias("n_docs"),
        F.max("b").alias("max_bucket"),
        F.sum(F.expr("b * (b - 1) div 2")).alias("candidate_pairs"),
    )


def hamming_pairs64(
    fps: DataFrame,
    max_hamming: int = 3,
    n_chunks: int = SIMHASH64_CHUNKS,
    fp_col: str = "simhash64",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs within a hamming ball over ANY 64-bit fingerprint
    table ``(id, fp64)`` — the multi-index method (Manku/Jain/Sarma,
    WWW'07 — public), factored out of the SimHash path so perceptual
    media fingerprints (``operators/perceptual.py``) and any future
    64-bit sketch reuse the same exact-recall join: split each
    fingerprint into ``n_chunks`` equal chunks; by pigeonhole, two
    fingerprints within hamming distance ``n_chunks − 1`` agree on at
    least one chunk, so a per-chunk equi-join finds EVERY such pair
    (enforced: ``max_hamming ≤ n_chunks − 1`` or this raises).
    Candidates are verified with one ``bit_count(xor)`` — returns
    ``(a_id, b_id, hamming)``, a_id < b_id.

    Scale shape: ``n_chunks`` equi-joins keyed by (chunk index, chunk
    value) — 2^(64/n_chunks) buckets per index; no all-pairs product.
    Bucket occupancy bounds the candidate count exactly like the LSH
    band joins (gauge: ``hamming_bucket_stats``). The fingerprint
    table is persisted for the duration (both join sides and the
    verify read it; without pinning the self-join recomputes the
    upstream fingerprint expression per side — measured 10 s vs 3 s at
    sf0.1 for SimHash) and released via ``finalize``.
    """
    from propulsion_spark.operators import finalize

    if max_hamming > n_chunks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_chunks ≥ {max_hamming + 1} "
            "for exact pigeonhole recall"
        )
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    sh = fps.select(
        F.col(id_col).alias("doc_id"), F.col(fp_col).alias("simhash64")
    ).persist()
    chunks = _simhash_chunks(sh, n_chunks)
    a = chunks.select(
        F.col("doc_id").alias("a_id"),
        F.col("simhash64").alias("a_sh"),
        "chunk_idx",
        "chunk_val",
    )
    b = chunks.select(
        F.col("doc_id").alias("b_id"),
        F.col("simhash64").alias("b_sh"),
        "chunk_idx",
        "chunk_val",
    )
    pairs = (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sh", "b_sh")
        .distinct()  # a pair may share several chunks: verify once
        .withColumn(
            "hamming", F.expr("CAST(bit_count(a_sh ^ b_sh) AS BIGINT)")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
    return finalize(pairs, sh)


def simhash_hamming_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    n_chunks: int = SIMHASH64_CHUNKS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Text near-dup pairs: 64-bit SimHash fingerprints →
    :func:`hamming_pairs64` multi-index join (see there for the recall
    proof and scale shape)."""
    return hamming_pairs64(
        simhash64(docs, text_col=text_col, id_col=id_col),
        max_hamming=max_hamming,
        n_chunks=n_chunks,
    )


# ------------------------------------------- near-dup cluster resolution
CC_MAX_ITERS = 50
#: per-round label tables at or below this node count broadcast to the
#: edge-list join (2 longs/row → ≈32 MB at the cap); larger graphs use
#: the shuffle join
CC_BROADCAST_NODES = 2_000_000
#: edge lists at or below this row count (collect-capped probe, two
#: longs per row → ≈64 MB at the cap) resolve on the DRIVER with the
#: vectorized numpy kernel below: a distributed iterative loop costs
#: ~4 driver-scheduled jobs PER ROUND plus ~10 fixed jobs for the
#: contraction — pure fixed cost for any graph one process can hold
#: (the GraphFrames/GraphX systems make the same small-graph trade).
#: Larger graphs take the contraction + quotient-loop path unchanged.
CC_LOCAL_EDGES = 4_000_000


def _cc_local_numpy(spark: SparkSession, rows, max_iters: int) -> DataFrame:
    """Exact connected components on the driver: vectorized min-label
    propagation with pointer jumping over a sorted adjacency layout —
    O(E) per round, ≤ ~log₂(n)+1 rounds, all numpy C kernels. Labels
    are component-minimum node ids, bit-identical to the distributed
    loop's fixpoint (both compute min reachable id). The round scheme
    mirrors the distributed loop exactly — seed at min(node, N(node)),
    then ``max_iters`` rounds of one-hop propagation + pointer
    compression, failing loudly past the cap — so the caller-visible
    convergence contract does not depend on which path ran."""
    import numpy as np
    import pandas as pd

    if not rows:
        return spark.createDataFrame([], "node bigint, label bigint")
    e = np.asarray([[r[0], r[1]] for r in rows], dtype=np.int64)
    ids = np.unique(e)  # sorted: index order == id order
    u = np.searchsorted(ids, e[:, 0])
    v = np.searchsorted(ids, e[:, 1])
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    order = np.argsort(src, kind="stable")
    sdst = dst[order]
    ssrc = src[order]
    starts = np.flatnonzero(np.r_[True, ssrc[1:] != ssrc[:-1]])
    # every node appears as a src in the doubled edge list, so the
    # group list covers all n nodes in index order
    own = np.arange(len(ids), dtype=np.int64)
    # seed l0(x) = min(x, N(x)) — the labels0 step, not a loop round
    lab = np.minimum(own, np.minimum.reduceat(sdst, starts))
    converged = False
    for _ in range(max_iters):
        neigh_min = np.minimum.reduceat(lab[sdst], starts)
        new = np.minimum(lab, neigh_min)
        new = new[new]  # pointer jump: halves distance-to-minimum
        if np.array_equal(new, lab):
            converged = True
            break
        lab = new
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iters="
            f"{max_iters}; raise the cap (rounds needed ~ log2(diameter))"
        )
    pdf = pd.DataFrame({"node": ids, "label": ids[lab]})
    return spark.createDataFrame(pdf)


def connected_components(edges: DataFrame, max_iters: int = CC_MAX_ITERS) -> DataFrame:
    """Connected components over an undirected edge list ``(a_id,
    b_id)`` → ``(node, label)`` with label = the smallest node id
    reachable from ``node``.

    r15 shape: ONE graph-contraction step, then min-label propagation
    on the quotient graph. The seed labeling l₀(x) = min(x, N(x)) is
    computed in a single groupBy of the edge list; contracting every
    edge to (l₀(u), l₀(v)) and dropping self-loops collapses the
    band-intersection cliques LSH emits into single quotient nodes, so
    the iterative loop runs over the (orders-of-magnitude smaller)
    cluster-stitching graph instead of re-joining the FULL edge list
    every round — at sf0.1 the 894k edge-directions contract to a few
    hundred quotient edges, and at 100 TB per-round cost drops from
    O(edges) to O(contracted edges), the standard contraction play
    (Kiveris et al.'s alternation performs the same shrink). The
    quotient preserves components (l₀(x) is always a member of x's
    component), and the quotient component minima ARE the original
    minima: the smallest node x* of a component has l₀(x*) = x*, and
    every l₀ value is a component member ≥ x*. Final labels compose
    the two maps with one (broadcast-guarded) join.

    r16: edge lists that fit on the driver (collect capped at
    ``CC_LOCAL_EDGES``; numeric ids only, so driver and engine orderings
    cannot diverge) skip the distributed loop entirely — one bounded
    collect + the vectorized numpy kernel + one local-relation return
    replace ~10 fixed jobs plus ~4 jobs per propagation round. The
    limit+collect probe reads at most cap+1 rows, so an at-scale edge
    list pays one cheap partial scan before taking the loop below.
    """
    spark = edges.sparkSession
    dt = dict(edges.dtypes)
    if dt.get("a_id") in ("bigint", "int") and dt.get("b_id") in (
        "bigint",
        "int",
    ):
        head = (
            edges.select("a_id", "b_id").limit(CC_LOCAL_EDGES + 1).collect()
        )
        if len(head) <= CC_LOCAL_EDGES:
            return _cc_local_numpy(spark, head, max_iters)
    both = edges.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(
        edges.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
    )
    # localCheckpoint (not persist) on the per-round state: persist
    # caches the data but keeps the logical plan, so round N re-analyzes
    # a plan N joins deep — O(rounds²) planning that dwarfs execution.
    # Checkpointing truncates lineage each round; the recompute-on-
    # executor-loss caveat is the accepted trade for iterative batch
    # queries (the whole query simply re-runs on failure — nothing
    # durable depends on these intermediates).
    both = both.localCheckpoint(eager=True)
    # seed labels at min(node, min(neighbors)) — the first propagation
    # round folded into the SAME shuffle a node-list distinct() would
    # pay (groupBy(src) hashes the identical key). The fixpoint is
    # unchanged (min-label propagation from ANY pointwise-≥ start
    # converges to the same component minima).
    labels0 = (
        both.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("_mn"))
        .select("node", F.least(F.col("node"), F.col("_mn")).alias("label"))
        .localCheckpoint(eager=True)
    )
    n_nodes = labels0.count()
    bcast = (
        (lambda df: F.broadcast(df))
        if n_nodes <= CC_BROADCAST_NODES
        else (lambda df: df)
    )
    # contract: every edge to its endpoints' seed labels, self-loops
    # dropped, canonical direction, deduped — the quotient edge list
    # the loop below iterates on. One pass over the edge list (two
    # label joins, broadcast-guarded like the loop's) + one distinct.
    la = labels0.select(
        F.col("node").alias("src"), F.col("label").alias("_la")
    )
    lb = labels0.select(
        F.col("node").alias("dst"), F.col("label").alias("_lb")
    )
    cedges = (
        both.join(bcast(la), "src")
        .join(bcast(lb), "dst")
        .filter(F.col("_la") != F.col("_lb"))
        .select(
            F.least("_la", "_lb").alias("a_id"),
            F.greatest("_la", "_lb").alias("b_id"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if cedges.isEmpty():
        # every component collapsed to one quotient node already
        return labels0
    quotient = _cc_min_label(spark, cedges, max_iters)
    # compose: label(x) = quotient(l₀(x)), falling back to l₀(x) for
    # quotient nodes the contracted graph never connected further
    q = quotient.select(
        F.col("node").alias("label"), F.col("label").alias("_q")
    )
    return (
        labels0.join(bcast(q), "label", "left")
        .select("node", F.coalesce("_q", "label").alias("label"))
        .localCheckpoint(eager=True)
    )


def _cc_min_label(
    spark: SparkSession, edges: DataFrame, max_iters: int
) -> DataFrame:
    """Min-label propagation with pointer compression over a deduped
    undirected edge list — each round (1) joins the current labels
    across the edges and keeps the per-node minimum, then (2)
    compresses pointers — l(x) ← l(l(x)), a label-table self-join — so
    the distance from any node to its component minimum HALVES per
    round on top of the one-hop propagation: O(log n) rounds even for
    adversarial path-graph inputs (a pure one-hop loop needs
    O(diameter) — a 300-node chain converges in ~O(log) rounds here,
    pinned by test). Labels only ever decrease, so sum(label) is a
    strictly-decreasing convergence witness and one single-row
    aggregate per round is the only driver traffic. Per-round cost:
    one shuffle of the edge list + the label-table joins; each round's
    state is checkpointed and the previous round's evicted, so lineage
    stays O(1) in rounds. localCheckpoint (not persist) on the
    per-round state: persist caches the data but keeps the logical
    plan, so round N re-analyzes a plan N joins deep — O(rounds²)
    planning that dwarfs execution. The recompute-on-executor-loss
    caveat is the accepted trade for iterative batch queries (the
    whole query simply re-runs on failure — nothing durable depends on
    these intermediates)."""
    both = (
        edges.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionByName(
            edges.select(
                F.col("b_id").alias("src"), F.col("a_id").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        both.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("_mn"))
        .select("node", F.least(F.col("node"), F.col("_mn")).alias("label"))
        .localCheckpoint(eager=True)
    )
    prev_sum, n_nodes = labels.agg(F.sum("label"), F.count("*")).collect()[0]
    # Right-size the loop's shuffle width to the graph: each round runs
    # ~6 stages, and at the session default (≈2×cores) a small edge
    # list fans into thousands of near-empty tasks whose scheduling
    # overhead dwarfs the work (measured at sf0.1: 450k edges × 64
    # partitions ⇒ task dispatch was the bottleneck). One partition per
    # ~250k edge-directions, floored at 8 — a 100 TB graph keeps the
    # session's cluster-sized width. Restored in finally: the conf is
    # session-global and must not leak into other queries.
    n_edges = both.count()  # cached blocks: O(partitions) metadata job
    cur_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    loop_parts = max(8, min(cur_parts, int(n_edges // 250_000) + 1))
    # The label table is one row per NODE, while the edge list is one
    # row per edge-direction — orders of magnitude larger for near-dup
    # graphs. localCheckpoint strips the stats Catalyst would use to
    # pick a broadcast join, so without a hint every round shuffles the
    # FULL edge list twice. Below the threshold (node row = two longs;
    # 2M nodes ≈ 32 MB) broadcast the per-round label table explicitly:
    # the only remaining shuffle per round is the groupBy(node) of the
    # propagated edges. Above it, the shuffle join is the right plan.
    bcast = (lambda df: F.broadcast(df)) if n_nodes <= CC_BROADCAST_NODES else (lambda df: df)
    converged = False
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        for _ in range(max_iters):
            propagated = both.join(
                bcast(labels), both.src == labels.node
            ).select(F.col("dst").alias("node"), "label")
            # persisted (r15): the compression join consumes merged on
            # BOTH sides — the probe and the broadcast parents build.
            # Without the cache each round ran the union+groupBy shuffle
            # twice (Spark does not dedupe common subplans); with it the
            # build side materializes the blocks and the probe reads
            # them. Released right after the round's checkpoint pins
            # its output.
            merged = (
                propagated.unionByName(labels)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .persist()
            )
            # pointer compression: follow one extra hop through the label
            # table (every label IS a node, but the left join + coalesce
            # keeps this robust rather than relying on it)
            parents = merged.select(
                F.col("node").alias("label"), F.col("label").alias("_grand")
            )
            new_labels = (
                merged.join(bcast(parents), "label", "left")
                .select("node", F.coalesce("_grand", "label").alias("label"))
                .localCheckpoint(eager=True)
            )
            new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
            merged.unpersist()
            labels = new_labels
            if new_sum == prev_sum:
                converged = True
                break
            prev_sum = new_sum
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(cur_parts))
    if not converged:
        # Unconverged labels are WRONG clusters (nodes still pointing at
        # a non-minimal label); handing them back silently would corrupt
        # downstream canonical-keeper decisions. Pointer compression
        # makes the default cap astronomically sufficient (O(log n)
        # rounds), so hitting it means the cap was set too low — fail
        # loudly rather than return wrong answers.
        raise RuntimeError(
            f"connected_components did not converge within max_iters="
            f"{max_iters}; raise the cap (rounds needed ~ log2(diameter))"
        )
    return labels


@register(
    "dedup_clusters",
    f"""
WITH RECURSIVE {_DUCK_SIGS_BANDED}, {_DUCK_BAND_PAIRS},
cand AS (
  SELECT a_id, b_id FROM band_pairs WHERE matches >= {NUM_HASHES // 2}
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM cand
  UNION ALL
  SELECT b_id, a_id FROM cand
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
sizes AS (SELECT cluster_id, count(*) AS n FROM comp GROUP BY cluster_id)
SELECT node AS doc_id, cluster_id, CAST(n AS BIGINT) AS cluster_size,
       node = cluster_id AS is_canonical
FROM comp JOIN sizes USING (cluster_id)
""",
    doc="Duplicate-cluster resolution: connected components over the "
    "MinHash-LSH candidate pairs (est. Jaccard ≥ 0.5), one row per "
    "clustered doc with its cluster id (= smallest doc_id in the "
    "component), cluster size, and the canonical-keeper flag — the stage "
    "that turns pairwise near-dup evidence into 'keep one copy per "
    "group', which pairwise reports alone cannot express (A~B and B~C "
    "must collapse to ONE kept doc even when A~C was never sampled by "
    "a band). Min-label propagation in DataFrame joins, O(diameter) "
    "rounds, edge-list-sized shuffles; the oracle recomputes components "
    "independently via a recursive transitive-closure CTE.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = minhash_with_bands(spark, sf_dir, persist=True)
    cand = band_pairs_from_sigs(sigs).filter(
        F.col("matches") >= NUM_HASHES // 2
    ).select("a_id", "b_id")
    labels = connected_components(cand)
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    out = labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("node") == F.col("label")).alias("is_canonical"),
    )
    return finalize(out, sigs)
