"""Text-analysis operators over ``documents``: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All map-only (no shuffle) and fully declarative — built-in string/regex
functions inside whole-stage codegen; a 100 TB corpus runs these at
scan speed. Ratios divide identical integers in both engines, so the
double results are bit-identical for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.operators import finalize, register
from propulsion_spark.operators.lm import LM_SCALE
from propulsion_spark.operators.dsir import DSIR_SEL_K, DSIR_TARGET_MOD
from propulsion_spark.operators.dedup import (
    DUCK_H64,
    SPAN_K,
    SPARK_H64,
    _grams,
    normalized,
)

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
_BPE_RE_SPARK = "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]'"
_BPE_RE_DUCK = "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'"


def _toks(dialect: str) -> str:
    if dialect == "spark":
        return "split(lower(trim(text)), '\\\\s+')"
    return "string_split_regex(lower(trim(text)), '\\s+')"


# ------------------------------------------------------- token counting
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex pre-tokenizer
    (letter runs / digit runs / single symbols). Oracle-verified through
    the merged ``text_metrics`` query."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        f"CAST(size({_toks('spark')}) AS BIGINT) AS ws_tokens",
        f"CAST(size(regexp_extract_all(text, {_BPE_RE_SPARK}, 0)) AS BIGINT) AS bpe_tokens",
        "CAST(length(text) AS BIGINT) AS chars",
    )


# ------------------------------------------------------ quality scoring
_QUALITY_SPARK = [
    f"size({_toks('spark')}) AS n_tokens",
    # try_divide: ANSI Spark throws on the 0-length empty-text doc where
    # DuckDB yields NULL — try_divide IS DuckDB's x/0 semantics. The
    # size() denominators need no guard: split('') returns [''] (size 1)
    "try_divide(length(regexp_replace(text, '[^A-Za-z]', '')), length(text)) AS alpha_ratio",
    f"size(filter({_toks('spark')}, t -> t IN ({_SW_LIST}))) / size({_toks('spark')}) AS stopword_ratio",
    f"length(regexp_replace(text, '\\\\s', '')) / size({_toks('spark')}) AS avg_token_len",
]

_QUALITY_DUCK = f"""
  CAST(length({_toks('duck')}) AS INT) AS n_tokens,
  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text) AS alpha_ratio,
  length(list_filter({_toks('duck')}, t -> t IN ({_SW_LIST}))) / length({_toks('duck')}) AS stopword_ratio,
  length(regexp_replace(text, '\\s', '', 'g')) / length({_toks('duck')}) AS avg_token_len
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: alphabetic ratio, stopword ratio, token-length
    stats folded into a [0,1] score — the classic pre-training filter
    features (C4/Gopher-style heuristics). Oracle-verified through the
    merged ``text_metrics`` query."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.selectExpr("doc_id", *_QUALITY_SPARK)
    return base.selectExpr(
        "doc_id",
        "n_tokens",
        "alpha_ratio",
        "stopword_ratio",
        "avg_token_len",
        "0.4 * alpha_ratio + 0.4 * least(stopword_ratio * 10, 1.0)"
        " + 0.2 * (CASE WHEN n_tokens BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.0 END)"
        " AS quality",
    )


# ------------------------------------------------- language-ID heuristic
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram/stopword heuristic: English-stopword density
    threshold. Oracle-verified through the merged ``text_metrics``."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.selectExpr(
        "doc_id",
        "lang",
        f"size(filter({_toks('spark')}, t -> t IN ({_SW_LIST})))"
        f" / size({_toks('spark')}) AS stop_ratio",
    )
    pred = F.when(F.col("stop_ratio") >= 0.04, F.lit("en")).otherwise(F.lit("unk"))
    return base.select(
        "doc_id",
        "lang",
        pred.alias("predicted"),
        (F.col("lang") == pred).alias("hit"),
    )


# ------------------------------------------------------- fingerprinting
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: 64-bit content hash of normalized text
    plus a 100-char-prefix hash. Oracle-verified through ``text_metrics``."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        f"{SPARK_H64.format(x=normalized('spark'))} AS fp64",
        f"{SPARK_H64.format(x='substring(' + normalized('spark') + ', 1, 100)')} AS fp_prefix",
    )


# ------------------------------------------------------- PII redaction
# Curation-stage PII scrub (the C4/Dolma-style pre-training hygiene
# pass): emails, US-SSN-shaped ids, phone numbers, IPv4 addresses.
# ORDER MATTERS and is part of the contract — each pattern is counted
# on, then scrubbed from, the text as redacted by the patterns before
# it (SSN before the more general phone shape; both before IPv4 so a
# dotted phone is not half-eaten as an address). Patterns are plain
# ASCII character-class regexes on purpose: they mean the same thing
# to Java regex (Spark) and RE2 (DuckDB), which is what lets the
# text_metrics oracle attest the redacted output hash bit-for-bit.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)


def _pii_sql_duck(text_expr: str = "text") -> tuple[str, str]:
    """(pii_hits expr, redacted-text expr) in DuckDB SQL — the oracle
    twin of `_pii_cols`, same progressive-redaction order."""
    t = text_expr
    counts = []
    for tag, pat in PII_PATTERNS:
        counts.append(f"length(regexp_extract_all({t}, '{pat}'))")
        t = f"regexp_replace({t}, '{pat}', '<{tag}>', 'g')"
    return " + ".join(counts), t


# ----------------------------------------------------- document chunking
# RAG/training-window chunking: fixed token windows with overlap.
CHUNK_TOKENS = 32  # oracle-facet window (library callers pick their own)
CHUNK_OVERLAP = 8


def _chunk_sql_duck(w: int, overlap: int, toks_expr: str) -> tuple[str, str]:
    """(n_chunks expr, chr(31)-joined chunks expr) in DuckDB SQL over a
    token-list expression — the oracle twin of `_chunk_arrays`."""
    stride = w - overlap
    n0 = (
        f"(CASE WHEN length({toks_expr}) = 1 AND ({toks_expr})[1] = '' "
        f"THEN 0 ELSE length({toks_expr}) END)"
    )
    n_chunks = (
        f"(CASE WHEN {n0} = 0 THEN 0 ELSE "
        f"(greatest({n0} - {w}, 0) + {stride - 1}) // {stride} + 1 END)"
    )
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join(empty) is '' — a zero-chunk doc must hash md5('') on
    # both engines (caught by the degenerate-corpus parity test)
    joined = (
        f"coalesce(array_to_string(list_transform(range(0, CAST({n_chunks} AS BIGINT)), "
        f"i -> array_to_string(list_slice({toks_expr}, i*{stride} + 1, "
        f"i*{stride} + {w}), ' ')), chr(31)), '')"
    )
    return n_chunks, joined


# ---------------------------------------------- merged per-doc metrics
_PRED_DUCK = "CASE WHEN stopword_ratio >= 0.04 THEN 'en' ELSE 'unk' END"


_PII_HITS_DUCK, _PII_RED_DUCK = _pii_sql_duck("text")
_NCHUNKS_DUCK, _CHUNKS_JOIN_DUCK = _chunk_sql_duck(
    CHUNK_TOKENS, CHUNK_OVERLAP, "toks0"
)


@register(
    "text_metrics",
    f"""
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS ws_tokens,
       CAST(length(regexp_extract_all(text, {_BPE_RE_DUCK})) AS BIGINT) AS bpe_tokens,
       CAST(length(text) AS BIGINT) AS chars,
       alpha_ratio, stopword_ratio, avg_token_len,
       0.4 * alpha_ratio + 0.4 * least(stopword_ratio * 10, 1.0)
           + 0.2 * (CASE WHEN n_tokens BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.0 END)
           AS quality,
       lang,
       {_PRED_DUCK} AS predicted,
       (lang = ({_PRED_DUCK})) AS hit,
       {DUCK_H64.format(x=normalized('duck'))} AS fp64,
       {DUCK_H64.format(x=f"substr({normalized('duck')}, 1, 100)")} AS fp_prefix,
       CAST({_PII_HITS_DUCK} AS BIGINT) AS pii_hits,
       {DUCK_H64.format(x=_PII_RED_DUCK)} AS redacted_fp64,
       CAST({_NCHUNKS_DUCK} AS BIGINT) AS n_chunks,
       {DUCK_H64.format(x=_CHUNKS_JOIN_DUCK)} AS chunks_fp64
FROM (SELECT doc_id, lang, text, {_toks('duck')} AS toks0, {_QUALITY_DUCK}
      FROM documents)
""",
    doc="Per-document text metrics in ONE scan: token counting "
    "(whitespace + BPE-ish regex), quality scoring (C4/Gopher-style "
    "alpha/stopword/token-length heuristics), stopword-density language "
    "ID, 64-bit content + prefix fingerprints, PII scrubbing (hit count "
    "+ hash of the redacted text attests the scrub itself), and "
    "fixed-token-window chunking with overlap (chunk count + hash of "
    "the joined chunks attests the window/stride slicing). Map-only, no "
    "shuffle, whole-stage codegen — a 100 TB corpus runs this at scan "
    "speed; merging the six metric families into one pass reads the "
    "text column once instead of six times.",
)
def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.selectExpr("doc_id", "lang", "text", *_QUALITY_SPARK)
    pred = F.when(F.col("stopword_ratio") >= 0.04, F.lit("en")).otherwise(F.lit("unk"))
    return base.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("ws_tokens"),
        F.expr(f"CAST(size(regexp_extract_all(text, {_BPE_RE_SPARK}, 0)) AS BIGINT)").alias(
            "bpe_tokens"
        ),
        F.length("text").cast("long").alias("chars"),
        "alpha_ratio",
        "stopword_ratio",
        "avg_token_len",
        F.expr(
            "0.4 * alpha_ratio + 0.4 * least(stopword_ratio * 10, 1.0)"
            " + 0.2 * (CASE WHEN n_tokens BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.0 END)"
        ).alias("quality"),
        "lang",
        pred.alias("predicted"),
        (F.col("lang") == pred).alias("hit"),
        F.expr(SPARK_H64.format(x=normalized("spark"))).alias("fp64"),
        F.expr(
            SPARK_H64.format(x="substring(" + normalized("spark") + ", 1, 100)")
        ).alias("fp_prefix"),
        *_metric_facet_cols(),
    )


def _h64(col):
    """Column-API twin of SPARK_H64 (same 60-bit md5-prefix hash)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _metric_facet_cols():
    """PII + chunking facet columns for the merged text_metrics row."""
    hits, red = _pii_cols("text")
    _, n_chunks, chunks = _chunk_arrays(CHUNK_TOKENS, CHUNK_OVERLAP, "text")
    return [
        hits.alias("pii_hits"),
        _h64(red).alias("redacted_fp64"),
        n_chunks.alias("n_chunks"),
        _h64(F.array_join(chunks, "\x1f")).alias("chunks_fp64"),
    ]


# ------------------------------------------------- corpus curation
@register(
    "corpus_curation",
    f"""
WITH scored AS (
  SELECT doc_id, lang, n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text) AS alpha_ratio,
         CAST(length({_toks('duck')}) AS INT) AS n_tokens,
         md5({normalized('duck')}) AS fp
  FROM documents
),
keepers AS (SELECT fp, min(doc_id) AS keeper FROM scored GROUP BY fp),
dg AS (
  SELECT doc_id, t[i] AS prefix, t[i + 1] AS w2, count(*) AS n
  FROM (
    SELECT doc_id, t, unnest(range(1, len(t))) AS i
    FROM (SELECT doc_id,
                 string_split_regex(lower(trim(text)), '\\s+') AS t
          FROM documents)
  )
  GROUP BY 1, 2, 3
),
voc AS (
  SELECT prefix, w2, sum(n) AS cr,
         sum(CASE WHEN doc_id % {DSIR_TARGET_MOD} = 0 THEN n ELSE 0 END) AS ct
  FROM dg GROUP BY 1, 2
),
vocp AS (
  SELECT prefix, w2,
         CASE WHEN ct > 0 AND pt_ > 0 THEN (ct * {LM_SCALE}) // pt_
              ELSE 0 END - (cr * {LM_SCALE}) // pr_ AS ds
  FROM (SELECT *, sum(cr) OVER (PARTITION BY prefix) AS pr_,
               sum(ct) OVER (PARTITION BY prefix) AS pt_ FROM voc)
),
dsel AS (
  SELECT doc_id FROM (
    SELECT doc_id, sum(n * ds) AS dsir_w
    FROM dg JOIN vocp USING (prefix, w2) GROUP BY 1
  ) ORDER BY dsir_w DESC, doc_id LIMIT {DSIR_SEL_K}
)
SELECT lang, CAST(count(*) AS BIGINT) AS kept_docs,
       CAST(sum(n_chars) AS BIGINT) AS kept_chars,
       CAST(sum(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dsir,
       CAST(sum(CASE WHEN s.doc_id IS NOT NULL THEN n_chars ELSE 0 END) AS BIGINT)
           AS dsir_chars
FROM scored JOIN keepers ON doc_id = keeper
LEFT JOIN dsel s USING (doc_id)
WHERE alpha_ratio >= 0.7 AND n_tokens BETWEEN 10 AND 5000
GROUP BY lang
""",
    doc="The end-to-end curation composite every pre-training pipeline "
    "runs: quality gates (alpha ratio, token bounds) + exact-dedup keeper "
    "selection → per-language kept-corpus totals. One scan, one dedup "
    "shuffle, one rollup. r11 adds the DSIR selection facet "
    "(operators/dsir.py dsir_select_exact — Xie et al. 2023 importance "
    "resampling at τ=0): n_dsir/dsir_chars count the kept docs the "
    f"{DSIR_SEL_K}-doc hard top-k draw toward the deterministic "
    f"doc_id % {DSIR_TARGET_MOD} = 0 pseudo-target selects. The weight "
    "is the LINEAR-domain surrogate Σ n(d,g)·[s_t(g) − s_r(g)] with "
    "s(g) = (c·2^30) div p — BIGINT throughout (the floor(x·2^k) rule; "
    "the paper's log-domain weight needs libm ln, which hash gates "
    "exclude), so the selected id set is bit-identical on both engines. "
    "The log-domain Gumbel draw (dsir_resample) stays the production "
    "surface; this facet attests the shared machinery: gram stream, "
    "conditional two-LM count aggregate, prefix-window totals, the "
    "top-k selection plumbing.",
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.selectExpr(
        "doc_id",
        "lang",
        "n_chars",
        # try_divide = DuckDB's x/0→NULL; the NULL then fails the >= gate
        # on both engines, so an empty-text doc is rejected, not a crash
        "try_divide(length(regexp_replace(text, '[^A-Za-z]', '')), length(text)) AS alpha_ratio",
        f"CAST(size({_toks('spark')}) AS INT) AS n_tokens",
        f"md5({normalized('spark')}) AS fp",
    )
    keepers = scored.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    from propulsion_spark.operators.dsir import dsir_select_exact

    sel = dsir_select_exact(docs).withColumn("_dsir", F.lit(1))
    return (
        scored.join(keepers, scored.doc_id == keepers.keeper)
        .filter((F.col("alpha_ratio") >= 0.7) & F.col("n_tokens").between(10, 5000))
        .join(sel.select("doc_id", "_dsir"), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("n_chars").alias("kept_chars"),
            F.sum(F.coalesce(F.col("_dsir"), F.lit(0)))
            .cast("long")
            .alias("n_dsir"),
            F.sum(
                F.when(F.col("_dsir").isNotNull(), F.col("n_chars")).otherwise(0)
            ).alias("dsir_chars"),
        )
    )


# --------------------------------------------------- per-language rollup
@register(
    "text_lang_stats",
    f"""
WITH d AS (
  SELECT lang, n_chars,
         CAST(length({_toks('duck')}) AS BIGINT) AS n_tokens
  FROM documents
),
base AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         quantile_cont(n_chars, 0.5) AS median_chars
  FROM d GROUP BY lang
),
hist AS (SELECT lang, n_tokens, count(*) AS cnt FROM d GROUP BY 1, 2),
cum AS (
  SELECT lang, n_tokens,
         sum(cnt) OVER (PARTITION BY lang ORDER BY n_tokens) AS cum
  FROM hist
),
qs AS (
  SELECT cum.lang,
         min(CASE WHEN cum >= (n_docs * 50 + 99) // 100 THEN n_tokens END)
             AS p50_tokens,
         min(CASE WHEN cum >= (n_docs * 90 + 99) // 100 THEN n_tokens END)
             AS p90_tokens,
         min(CASE WHEN cum >= (n_docs * 99 + 99) // 100 THEN n_tokens END)
             AS p99_tokens
  FROM cum JOIN base USING (lang) GROUP BY 1
),
bgrams AS (
  SELECT lang,
         unnest(list_transform(range(1, length(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS gram
  FROM (SELECT lang, {_toks('duck')} AS toks FROM documents)
),
gcounts AS (
  SELECT lang, split_part(gram, ' ', 1) AS prefix, gram, count(*) AS c
  FROM bgrams GROUP BY 1, 2, 3
),
pcounts AS (SELECT lang, prefix, sum(c) AS p FROM gcounts GROUP BY 1, 2),
lmstat AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS lm_grams,
         CAST(sum(c * ((c * {LM_SCALE}) // p)) AS BIGINT) AS lm_scaled
  FROM gcounts JOIN pcounts USING (lang, prefix) GROUP BY 1
)
SELECT base.*, CAST(p50_tokens AS BIGINT) AS p50_tokens,
       CAST(p90_tokens AS BIGINT) AS p90_tokens,
       CAST(p99_tokens AS BIGINT) AS p99_tokens,
       lm_grams, lm_scaled,
       CAST(lm_scaled AS DOUBLE) / (CAST(lm_grams AS DOUBLE) * {float(LM_SCALE)})
           AS lm_self_score
FROM base JOIN qs USING (lang) JOIN lmstat USING (lang)
""",
    doc="Corpus rollup per language: doc/char/token totals, the exact "
    "median doc length, and EXACT discrete token-count quantiles "
    "(p50/p90/p99). The quantiles use the histogram-cumsum shape — "
    "groupBy(lang, n_tokens) histogram (map-side partial agg absorbs "
    "the corpus), then a window over the DISTINCT-VALUE rows only, "
    "then pick the first value whose cumulative count reaches "
    "rank ⌈q·n⌉ — so the per-group sort is over the value domain "
    "(thousands of rows), never the corpus: the scale-correct exact "
    "alternative to sorting 100 TB per group. Rank arithmetic is "
    "integer division; discrete quantiles return actual BIGINT data "
    "values, so no interpolation floats cross engines (the one "
    "interpolated stat kept is the dyadic 0.5 char median). r8 adds "
    "the per-language bigram-LM self-likelihood facet (operators/lm.py "
    "— the CCNet-style LM quality signal): likelihood needs NO re-join "
    "against the corpus because every occurrence of gram g scores the "
    "same — sum(c·scaled(g))/sum(c) over the counts table alone, "
    "probabilities integer-scaled ((c·2^30) div p, BIGINT throughout) "
    "so both engines agree to the bit with one final division.",
)
def q_text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.expr(f"size({_toks('spark')})").cast("long")
    )
    base = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        F.expr("percentile(n_chars, 0.5d)").alias("median_chars"),
    )
    hist = docs.groupBy("lang", "n_tokens").agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("lang")
        .orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    qcols = [
        F.min(
            F.when(
                F.expr(f"cum >= (n_docs * {p} + 99) div 100"),
                F.col("n_tokens"),
            )
        )
        .cast("long")
        .alias(f"p{p}_tokens")
        for p in (50, 90, 99)
    ]
    qs = (
        cum.join(base.select("lang", "n_docs"), "lang")
        .groupBy("lang")
        .agg(*qcols)
    )
    from propulsion_spark.operators.lm import lm_self_score_by_lang

    # inner join on BOTH engines: a language whose docs are all <2
    # tokens has no LM and drops from the report symmetrically
    return base.join(qs, "lang").join(lm_self_score_by_lang(docs), "lang")


# --------------------------------------------------- repetition filter
REP_THRESHOLD = 0.5  # dup-trigram fraction above which a doc is "repetitive"


def repetition_counts_expr() -> str:
    """``struct<n, d>`` — total and distinct word-trigram counts, with
    the token split and the gram build let-bound so each is evaluated
    once per reference instead of once per gram (see
    :func:`propulsion_spark.operators.dedup.let_bound`)."""
    from propulsion_spark.operators.dedup import let_bound

    tg = let_bound(
        "split(text, ' ')",
        "transform(sequence(1, greatest(size(x) - 2, 1)), "
        "i -> concat_ws(' ', slice(x, cast(i as int), 3)))",
    )
    return let_bound(
        tg, "named_struct('n', size(x), 'd', size(array_distinct(x)))"
    )


@register(
    "text_repetition",
    f"""
WITH rep AS (
  SELECT doc_id,
         CAST(len(tg) AS BIGINT) AS n_trigrams,
         CAST(len(list_distinct(tg)) AS BIGINT) AS n_distinct_trigrams,
         1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg) AS dup_trigram_frac,
         (1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)) > {REP_THRESHOLD}
             AS repetitive
  FROM (
    SELECT doc_id,
           list_transform(
             generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
             i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')) AS tg
    FROM documents
  )
),
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     t -> t != '') AS tk
  FROM documents
),
pos AS (
  SELECT doc_id, i - 1 AS pos,
         {DUCK_H64.format(x=f"array_to_string(tk[i:i+{SPAN_K - 1}], ' ')")} AS h
  FROM toks,
       unnest(generate_series(1, greatest(len(tk) - {SPAN_K} + 1, 0))) AS u(i)
),
dup AS (
  SELECT h FROM (
    SELECT h, count(DISTINCT doc_id) AS nd FROM pos GROUP BY 1
  ) WHERE nd >= 2
),
gaps AS (
  SELECT doc_id, pos,
         least({SPAN_K}, pos - coalesce(
           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
           pos - {SPAN_K})) AS add_cov
  FROM pos JOIN dup USING (h)
),
cov AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         CAST(sum(add_cov) AS BIGINT) AS dup_covered_tokens
  FROM gaps GROUP BY 1
),
base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM toks)
SELECT rep.*, base.n_tokens,
       CAST(greatest(base.n_tokens - {SPAN_K - 1}, 0) AS BIGINT) AS n_span_positions,
       coalesce(cov.n_dup_spans, 0) AS n_dup_spans,
       coalesce(cov.dup_covered_tokens, 0) AS dup_covered_tokens,
       CAST(coalesce(cov.dup_covered_tokens, 0) AS DOUBLE)
           / greatest(base.n_tokens, 1) AS dup_span_frac
FROM rep JOIN base USING (doc_id) LEFT JOIN cov USING (doc_id)
""",
    doc=f"Repetition report, within- and across-document. Within: the "
    "Gopher-style duplicate-trigram fraction per doc (docs above "
    f"{REP_THRESHOLD} flagged) — map-only array HOFs inside whole-stage "
    "codegen. Across: exact-substring duplicated-span coverage "
    f"(Lee et al. 2021) — per doc, the union size of its {SPAN_K}-token "
    "spans that appear verbatim in ≥2 documents (operators/dedup.py::"
    "substring_span_stats: position explode → distinct (gram, doc) → "
    "gram-count semi-join → per-doc interval-union window over only "
    "the duplicated positions). Integer arithmetic end-to-end; the two "
    "fractions are single IEEE divisions, bit-identical across engines.",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propulsion_spark.operators.dedup import substring_span_stats

    docs = load_table(spark, sf_dir, "documents")
    st = repetition_counts_expr()
    rep = docs.select(
        "doc_id",
        F.expr(f"({st}).n").cast("long").alias("n_trigrams"),
        F.expr(f"({st}).d").cast("long").alias("n_distinct_trigrams"),
        F.expr(
            f"1.0D - cast(({st}).d as double) / ({st}).n"
        ).alias("dup_trigram_frac"),
        F.expr(
            f"(1.0D - cast(({st}).d as double) / ({st}).n) > {REP_THRESHOLD}"
        ).alias("repetitive"),
    )
    return rep.join(substring_span_stats(docs), "doc_id")


# ------------------------------------------- corpus n-gram statistics
TOPK_NGRAMS = 5


@register(
    "corpus_topk_ngrams",
    f"""
WITH grams AS (
  SELECT lang, doc_id, unnest({_grams('duck')}) AS gram FROM documents
),
dfq AS (SELECT lang, gram, count(*) AS doc_freq FROM grams GROUP BY 1, 2)
SELECT lang, CAST(rank AS BIGINT) AS rank, gram,
       CAST(doc_freq AS BIGINT) AS doc_freq
FROM (
  SELECT lang, gram, doc_freq,
         row_number() OVER (PARTITION BY lang
                            ORDER BY doc_freq DESC, gram) AS rank
  FROM dfq
) WHERE rank <= {TOPK_NGRAMS}
""",
    doc=f"Corpus n-gram statistics: the top-{TOPK_NGRAMS} word trigrams "
    "per language by document frequency (ties → lexicographic) — the "
    "boilerplate/contamination census run before and after dedup (a "
    "trigram in half the corpus is template text; a benchmark trigram "
    "in train is leakage). Per-doc-distinct trigrams mean one explode + "
    "count(*) IS doc frequency; partial aggregation absorbs the explode "
    "fan-out map-side, and the final top-k window runs over the "
    "(lang, gram) aggregate — corpus-scale input, vocabulary-scale "
    "shuffle.",
)
def q_corpus_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "lang", F.explode(F.expr(_grams("spark"))).alias("gram")
    )
    dfq = grams.groupBy("lang", "gram").agg(F.count("*").alias("doc_freq"))
    w = Window.partitionBy("lang").orderBy(F.col("doc_freq").desc(), F.col("gram"))
    return (
        dfq.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK_NGRAMS)
        .select("lang", "rank", "gram", F.col("doc_freq").cast("long").alias("doc_freq"))
    )


# ---------------------------- TF-IDF keywords + BM25 ranking (merged)
TFIDF_TOPK = 3
# BM25 constants are DYADIC on purpose (exactly representable in both
# decimal and binary): DuckDB parses bare decimal literals as DECIMAL
# before converting, so a non-dyadic 1.2 would be 1 ulp off Spark's
# double literal, while 1.25/0.75 convert exactly on both engines.
BM25_K1 = 1.25
BM25_B = 0.75
BM25_TOPK = 3
BM25_QUERY_TERMS = ("hash", "spark", "window")


def bm25_scores(
    docs: DataFrame,
    terms: "tuple[str, ...]" = BM25_QUERY_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    tf_all: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, token, tf, doc_freq, score): Okapi BM25 of every document
    against each query term — the lexical-retrieval complement to the
    ANN surface (a RAG/search pipeline runs both and fuses).

    The idf is the RATIONAL Robertson form (N − df + 0.5)/(df + 0.5) —
    a monotone transform of the usual ln(·+1) idf, so per-term ranking
    is identical while every operation stays inside +,·,/ (exactly-
    rounded IEEE, bit-identical across engines; ln drifts in the last
    ulp between libm builds — the same rule as the linear idf above).

    Plan: the term filter pushes into the exploded token stream before
    the (doc, term) tf aggregate (map-side partial agg), the per-term
    df aggregate is |terms|-sized, corpus stats are a single broadcast
    row — no shuffle wider than the tf table, O(corpus) one scan.
    ``tf_all`` lets a caller that already aggregated (doc_id, token, tf)
    over ALL tokens (the merged tfidf report) share it instead of
    re-exploding the corpus: dl = sum(tf) per doc, identical integers.
    """
    if tf_all is not None:
        dls = tf_all.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        qtf = tf_all.filter(F.col("token").isin(list(terms)))
    else:
        toks = docs.select(
            "doc_id", F.explode(F.expr(_toks("spark"))).alias("token")
        )
        dls = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
        qtf = (
            toks.filter(F.col("token").isin(list(terms)))
            .groupBy("doc_id", "token")
            .agg(F.count("*").alias("tf"))
        )
    qdf = qtf.groupBy("token").agg(F.count("*").alias("doc_freq"))
    stats = dls.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    idf = (F.col("n_docs").cast("double") - F.col("doc_freq") + 0.5) / (
        F.col("doc_freq").cast("double") + 0.5
    )
    denom = F.col("tf").cast("double") + k1 * (
        (1.0 - b) + b * (F.col("dl").cast("double") / F.col("avgdl"))
    )
    score = idf * ((F.col("tf").cast("double") * (k1 + 1.0)) / denom)
    return (
        qtf.join(qdf, "token")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "token", "tf", "doc_freq", score.alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    terms: "tuple[str, ...]" = BM25_QUERY_TERMS,
    k: int = 40,
    tf_all: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, rank): the k best documents by summed multi-term BM25 —
    the lexical arm a hybrid (BM25 + ANN + RRF) retrieval feeds into
    ``rrf_fuse``.

    Scale shape: per-doc score sums flow into ``orderBy(...).limit(k)``
    which compiles to TakeOrderedAndProject — every partition keeps a
    local k-heap, the driver merges O(partitions) k-sized heaps, no
    global sort. The rank window then runs over the ≤k survivors only,
    partitioned by a non-foldable constant (``bounded_window_key``) so
    its spec survives Catalyst folding and the plan never goes through
    AllTuples (the r10 scale defect — one task holding EVERY per-doc
    score — that this helper retires). Ties break on doc_id in both
    the heap and the window, so ranks are deterministic and identical
    to a full-corpus ranking's top k.
    """
    from propulsion_spark.operators import bounded_window_key

    scored = (
        bm25_scores(docs, terms=terms, tf_all=tf_all)
        .groupBy("doc_id")
        .agg(F.sum("score").alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    w = Window.partitionBy(bounded_window_key("doc_id")).orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("doc_id", "rank")


def _bm25_duck(terms: "tuple[str, ...]" = BM25_QUERY_TERMS) -> str:
    """DuckDB twin of bm25_scores: term-for-term the same double
    expression tree (every operand cast to DOUBLE before the op, dyadic
    constants), so scores are bit-identical."""
    in_list = ", ".join("'{}'".format(t.replace("'", "''")) for t in sorted(terms))
    return f"""
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dls
),
qtf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks
  WHERE token IN ({in_list}) GROUP BY 1, 2
),
qdf AS (SELECT token, count(*) AS doc_freq FROM qtf GROUP BY 1),
bm AS (
  SELECT doc_id, token, tf, doc_freq,
         ((CAST(n_docs AS DOUBLE) - doc_freq + 0.5)
            / (CAST(doc_freq AS DOUBLE) + 0.5))
         * ((CAST(tf AS DOUBLE) * {BM25_K1 + 1.0})
            / (CAST(tf AS DOUBLE)
               + {BM25_K1} * ({1.0 - BM25_B}
                              + {BM25_B} * (CAST(dl AS DOUBLE) / avgdl)))) AS score
  FROM qtf JOIN qdf USING (token) JOIN dls USING (doc_id) CROSS JOIN stats
)
"""


@register(
    "text_tfidf_keywords",
    f"""
WITH toks AS (
  SELECT doc_id, unnest({_toks('duck')}) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
{_bm25_duck().strip()}
SELECT 'tfidf' AS method, doc_id, CAST(rank AS BIGINT) AS rank, token,
       CAST(tf AS BIGINT) AS tf, CAST(doc_freq AS BIGINT) AS doc_freq, score
FROM (
  SELECT doc_id, token, tf, doc_freq,
         CAST(tf * n_docs AS DOUBLE) / doc_freq AS score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY CAST(tf * n_docs AS DOUBLE) / doc_freq DESC,
                                     token) AS rank
  FROM tf JOIN dfq USING (token) CROSS JOIN n
) WHERE rank <= {TFIDF_TOPK}
UNION ALL
SELECT 'bm25' AS method, doc_id, CAST(rank AS BIGINT) AS rank, token,
       CAST(tf AS BIGINT) AS tf, CAST(doc_freq AS BIGINT) AS doc_freq, score
FROM (
  SELECT doc_id, token, tf, doc_freq, score,
         row_number() OVER (PARTITION BY token
                            ORDER BY score DESC, doc_id) AS rank
  FROM bm
) WHERE rank <= {BM25_TOPK}
""",
    doc=f"Keyword/retrieval report, two arms. method='tfidf': top-"
    f"{TFIDF_TOPK} terms per document scored tf × (N / df) — the "
    "linear-idf variant, deliberately: one integer product and ONE "
    "exactly-rounded IEEE division ranks identically to tf·(N/df) and "
    "is bit-identical across engines, where ln(N/df) would drift in "
    "the last ulp between libm builds. method='bm25' (r9): Okapi BM25 "
    f"top-{BM25_TOPK} documents per query term (rational Robertson "
    "idf, dyadic k1/b constants — same no-transcendentals rule), the "
    "lexical-retrieval complement to the ANN surface. Plan shape: "
    "term-frequency aggregate (doc-key shuffle absorbed map-side by "
    "partial agg), vocabulary-sized doc-frequency aggregate, corpus "
    "stats broadcast as a single-row cross join, top-k windows per doc "
    "(tfidf) / per term (bm25).",
)
def q_text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.expr(_toks("spark"))).alias("token"))
    # both arms read the (doc, token, tf) aggregate: persist it once
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf")).persist()
    dfq = tf.groupBy("token").agg(F.count("*").alias("doc_freq"))
    n = docs.agg(F.count("*").alias("n_docs"))
    score = (F.col("tf") * F.col("n_docs")).cast("double") / F.col("doc_freq")
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token"))
    tfidf = (
        tf.join(dfq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select(
            F.lit("tfidf").alias("method"),
            "doc_id",
            "rank",
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            "score",
        )
    )
    wb = Window.partitionBy("token").orderBy(F.col("score").desc(), F.col("doc_id"))
    bm25 = (
        bm25_scores(docs, tf_all=tf)
        .withColumn("rank", F.row_number().over(wb).cast("long"))
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            F.lit("bm25").alias("method"),
            "doc_id",
            "rank",
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            "score",
        )
    )
    return finalize(tfidf.unionByName(bm25), tf)


# --------------------------------------------------- reproducible splits
TRAIN_PCT, VAL_PCT = 80, 10  # remainder → test

# Domain-mixture sampling rates in basis points of 10000, keyed by
# language: the up/down-weighting every pre-training data recipe
# applies per domain/language before tokenization. Deterministic: a
# doc is sampled iff H64(md5(doc_id||'-mix')) % 10000 < its rate, so
# the sample is reproducible and a corpus re-run never flips old docs.
MIXTURE_BP = {"en": 10000, "zh": 2500}
MIXTURE_DEFAULT_BP = 5000


def _mixture_case() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {bp}" for lang, bp in sorted(MIXTURE_BP.items())
    )
    return f"CASE lang {whens} ELSE {MIXTURE_DEFAULT_BP} END"


# Training-mixture EPOCH weights in basis points of 10000 per source:
# >10000 up-samples (the doc appears in multiple epochs of one training
# pass — high-quality/curated sources), <10000 down-samples. The
# fractional epoch is resolved per doc by an independent deterministic
# hash, so repeats are reproducible and composition-stable: a corpus
# re-run or append never changes an old doc's copy count.
EPOCH_BP = {"src0": 25000, "src1": 15000}
EPOCH_DEFAULT_BP = 10000


def _epoch_copies_sql(dialect: str, weights: "dict[str, int] | None" = None) -> str:
    """Integer copy count per doc: ``bp div 10000`` whole epochs plus one
    more iff the doc's hash falls inside the fractional remainder —
    E[copies] = bp/10000 exactly, all integer arithmetic."""
    weights = EPOCH_BP if weights is None else weights
    # source names are USER INPUT (cli --epoch-weights): single quotes
    # are SQL-escaped by doubling so a name like "x'y" compares as a
    # literal instead of rewriting the expression (H64 rule, see
    # shard_corpus's salt note); weights are forced to int so a
    # non-numeric value can never splice into the SQL either
    whens = " ".join(
        "WHEN '{}' THEN {}".format(str(s).replace("'", "''"), int(bp))
        for s, bp in sorted(weights.items())
    )
    default = int(weights.get("__default__", EPOCH_DEFAULT_BP))
    bp = f"CASE source {whens} ELSE {default} END"
    if dialect == "spark":
        h = SPARK_H64.format(x="concat(cast(doc_id as string), '-epoch')")
        return (
            f"(({bp}) div 10000) + "
            f"(CASE WHEN {h} % 10000 < ({bp}) % 10000 THEN 1 ELSE 0 END)"
        )
    h = DUCK_H64.format(x="concat(CAST(doc_id AS VARCHAR), '-epoch')")
    return (
        f"(({bp}) // 10000) + "
        f"(CASE WHEN {h} % 10000 < ({bp}) % 10000 THEN 1 ELSE 0 END)"
    )


# --------------------------------------------- priority sampling (r9)
PSAMPLE_K = 100
_PS_M = 1 << 20  # u = (h%M + 1)/M is exact: M is a power of two, so the
# division only shifts the exponent — u is the same double on both engines


def _priority_expr(dialect: str, weight: str = "n_chars", id_col: str = "doc_id") -> str:
    """w / u: the Duffield-Lund-Thorup priority (JACM '07 "Priority
    sampling for estimation of arbitrary subset sums"). Top-K by this
    key is a weighted without-replacement sample with unbiased
    subset-sum estimators. Chosen over A-ES (u^(1/w)) deliberately:
    the priority needs only exactly-rounded IEEE division, where the
    exponentiation key would drift between libm builds (the repo's
    no-transcendentals rule)."""
    if dialect == "spark":
        h = SPARK_H64.format(x=f"concat(cast({id_col} as string), '-ps')")
    else:
        h = DUCK_H64.format(x=f"concat(CAST({id_col} AS VARCHAR), '-ps')")
    u = f"(CAST(({h}) % {_PS_M} AS DOUBLE) + 1.0) / {_PS_M}"
    return f"CAST({weight} AS DOUBLE) / ({u})"


def priority_sample(
    df: DataFrame, k: int = PSAMPLE_K, weight: str = "n_chars", id_col: str = "doc_id"
) -> DataFrame:
    """The k rows with the largest priorities (ties → lowest id) plus
    their ``ps_priority`` — a deterministic size-weighted sample whose
    inclusion never flips for an old row when the corpus grows, only
    the threshold moves.

    Scale shape: orderBy(...).limit(k) compiles to
    TakeOrderedAndProject — every partition keeps a local k-heap and
    the driver merges k-sized heaps; no global sort, no wide shuffle,
    O(k) driver memory. The anti-pattern (row_number over an
    unpartitioned window → single-task sort) is exactly what this
    avoids."""
    pri = F.expr(_priority_expr("spark", weight=weight, id_col=id_col))
    return (
        df.withColumn("ps_priority", pri)
        .orderBy(F.col("ps_priority").desc(), F.col(id_col))
        .limit(k)
    )



# per-SOURCE cap (RefinedWeb/Gopher-style domain-share bound): a
# boilerplate-heavy domain must not dominate the mixture. Exact top-N
# per source needs a per-source window (one mega-domain = one skewed
# sort partition at 100 TB), so the scalable form is deterministic
# RATE thinning: keep a doc iff an independent salted hash lands in
# the bottom `cap` residues mod its source's count —
# H64(id·salt) % src_cnt < cap. Resolution-free by construction
# (the earlier basis-points rate, (10000·cap) div src_cnt, floored to
# ZERO once src_cnt > 10000·cap, silently dropping exactly the
# mega-domains the cap exists to thin): keep probability is
# cap/src_cnt at EVERY source size, expected kept = cap, and a
# source at or under the cap passes whole (residue < src_cnt ≤ cap).
# ONE count aggregate + an AQE-sized join + a map-only filter, all
# integer arithmetic (bit-exact across engines). Unlike the split
# assignment, the keep flag is corpus-state-dependent BY DESIGN (the
# cap exists to bound a source's SHARE, so rates move as sources
# grow); within one corpus state it is a pure function of doc_id.
SRC_CAP = 10


def _src_keep_sql(
    dialect: str, cap: int, id_col: str = "doc_id", salt: str = "-srccap"
) -> str:
    """keep-predicate over a row that carries ``src_cnt``: salted H64
    of the id mod the source count lands under ``cap``."""
    if dialect == "spark":
        h = SPARK_H64.format(x=f"concat(cast({id_col} as string), '{salt}')")
    else:
        h = DUCK_H64.format(x=f"concat(CAST({id_col} AS VARCHAR), '{salt}')")
    return f"(({h}) % src_cnt) < {cap}"


def cap_per_source(
    docs: DataFrame,
    max_per_source: int = SRC_CAP,
    salt: str = "-srccap",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus thinned so each source keeps ≈ ``max_per_source``
    docs (deterministic hash-residue thinning — see the block
    comment). Sources at or under the cap pass through whole; no
    source size can floor the rate to zero.

    The count-table join carries NO broadcast hint: the hint would
    BYPASS spark.sql.autoBroadcastJoinThreshold, and the exact regime
    this operator exists for — domain capping over a raw web crawl —
    is the one where distinct sources run 10^7–10^8 and the forced
    broadcast OOMs the executors. AQE still broadcasts when the
    aggregated table's RUNTIME size is under the threshold (every
    curated corpus; plan-pinned by test), and degrades to a shuffle
    join past it instead of dying (SCALE.md 'per-source cap')."""
    cnts = docs.groupBy(source_col).agg(F.count("*").alias("src_cnt"))
    keep = F.expr(
        _src_keep_sql("spark", int(max_per_source), id_col=id_col, salt=salt)
    )
    return docs.join(cnts, source_col).filter(keep).drop("src_cnt")


# benchmark-decontamination facet of corpus_split_assign: the
# pseudo-benchmark is the doc_id % BENCH_MOD == 0 slice (both engines
# derive it identically); a doc is bench-hit when it shares ≥1 word
# DECONTAM_N-gram with any benchmark doc. The Spark side answers with
# the BLOOM scan (operators/decontam.py) while the oracle recomputes
# the overlap exactly — so the driver's hash gate attests that the
# filter has no false positive on this corpus (it can never have a
# false negative).
BENCH_MOD = 97
DECONTAM_N = 8


@register(
    "corpus_split_assign",
    f"""
WITH srccnt AS (
  SELECT source, count(*) AS src_cnt FROM documents GROUP BY source
),
base AS (
  SELECT doc_id, source, n_chars,
         CASE WHEN b < {TRAIN_PCT} THEN 'train'
              WHEN b < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split,
         fp, sampled, src_keep
  FROM (
    SELECT doc_id, source, n_chars,
           {DUCK_H64.format(x="CAST(doc_id AS VARCHAR)")} % 100 AS b,
           md5({normalized('duck')}) AS fp,
           ({DUCK_H64.format(x="concat(CAST(doc_id AS VARCHAR), '-mix')")} % 10000
              < {_mixture_case()}) AS sampled,
           ({_src_keep_sql('duck', SRC_CAP)}) AS src_keep
    FROM documents JOIN srccnt USING (source)
  )
),
fps AS (
  SELECT fp, count(DISTINCT split) AS n_splits FROM base GROUP BY fp
),
grams AS (
  -- empty tokens filtered: matches the Bloom scan's pandas split()
  -- semantics for empty/whitespace-only docs
  SELECT doc_id, array_to_string(t[i:i+{DECONTAM_N - 1}], ' ') AS g
  FROM (
    SELECT doc_id, t,
           unnest(range(1, greatest(len(t) - {DECONTAM_N - 2}, 1))) AS i
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x != '') AS t
          FROM documents)
  )
),
bench_hits AS (
  SELECT DISTINCT doc_id FROM grams WHERE g IN
    (SELECT DISTINCT g FROM grams WHERE doc_id % {BENCH_MOD} = 0)
),
psample AS (
  SELECT doc_id FROM base
  ORDER BY {_priority_expr('duck')} DESC, doc_id LIMIT {PSAMPLE_K}
)
SELECT source, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated,
       CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN sampled THEN n_chars ELSE 0 END) AS BIGINT)
           AS sampled_chars,
       CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bench_hit,
       CAST(sum(epoch_copies) AS BIGINT) AS epoch_copies,
       CAST(sum(epoch_copies * n_chars) AS BIGINT) AS epoch_chars,
       CAST(sum(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_psample,
       CAST(sum(CASE WHEN p.doc_id IS NOT NULL THEN n_chars ELSE 0 END) AS BIGINT)
           AS psample_chars,
       CAST(sum(CASE WHEN src_keep THEN 1 ELSE 0 END) AS BIGINT)
           AS n_src_capped,
       CAST(sum(CASE WHEN src_keep THEN n_chars ELSE 0 END) AS BIGINT)
           AS src_capped_chars
FROM (SELECT *, {{EPOCH_COPIES_DUCK}} AS epoch_copies FROM base) base
JOIN fps USING (fp)
LEFT JOIN bench_hits h USING (doc_id)
LEFT JOIN psample p USING (doc_id)
GROUP BY source, split
""".replace(
        "{EPOCH_COPIES_DUCK}", _epoch_copies_sql("duck")
    ),
    doc=f"Reproducible train/val/test assignment ({TRAIN_PCT}/{VAL_PCT}/"
    f"{100 - TRAIN_PCT - VAL_PCT}) by md5(doc_id) hash range — the split "
    "is a pure function of the document id, so it is stable across "
    "engines, runs, repartitions, and corpus growth (a new doc never "
    "moves an old one between splits) — PLUS per-cell contamination: "
    "n_contaminated counts docs whose normalized-text fingerprint also "
    "appears in a different split (train/test leakage, the check every "
    "eval pipeline needs before trusting held-out metrics) — PLUS "
    "domain-mixture sampling: n_sampled/sampled_chars count the docs a "
    "per-language mixture recipe (MIXTURE_BP basis points, e.g. en "
    "kept fully, zh downsampled to 25%) would keep, selected by an "
    "independent deterministic hash so the sample composes with the "
    "split instead of correlating with it. One map-side scan + one "
    "fp-keyed aggregate join — no cross product, scales with corpus "
    "size — PLUS benchmark decontamination (r6): n_bench_hit counts "
    f"docs sharing a word {DECONTAM_N}-gram with the pseudo-benchmark "
    f"slice (doc_id % {BENCH_MOD} = 0). The Spark side answers with "
    "the broadcast-Bloom scan (operators/decontam.py — map-only, no "
    "shuffle, the 100 TB shape) while the oracle recomputes the "
    "overlap exactly, so the hash gate doubles as a proof the filter "
    "is FP-free on this corpus — PLUS epoch resampling (r7): "
    "epoch_copies/epoch_chars total the deterministic per-source "
    "training-mixture copy counts (EPOCH_BP; >1 epoch up-samples "
    "curated sources) that resample_epochs materializes — the "
    "token-budget accounting a mixture recipe is planned against — "
    f"PLUS priority sampling (r9): n_psample/psample_chars count the "
    f"global top-{PSAMPLE_K} size-weighted priority sample "
    "(Duffield-Lund-Thorup w/u priorities; TakeOrderedAndProject, no "
    "global sort) per cell — the weighted inspection/eval draw whose "
    "subset-sum estimators are unbiased — PLUS per-source caps (r13): "
    f"n_src_capped/src_capped_chars count the docs a {SRC_CAP}-per-"
    "source cap (RefinedWeb/Gopher domain-share bound) keeps under "
    "deterministic hash-rate thinning — one count aggregate + "
    "broadcast join + map filter, integer arithmetic, never a "
    "per-source window (one mega-domain would be one skewed sort "
    "partition at 100 TB).",
)
def q_corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propulsion_spark.operators.decontam import (
        build_ngram_bloom,
        contamination_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    b = F.expr(SPARK_H64.format(x="cast(doc_id as string)")) % 100
    split = (
        F.when(b < TRAIN_PCT, "train")
        .when(b < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    sampled = (
        F.expr(SPARK_H64.format(x="concat(cast(doc_id as string), '-mix')")) % 10000
        < F.expr(_mixture_case())
    )
    srccnt = docs.groupBy("source").agg(F.count("*").alias("src_cnt"))
    src_keep = F.expr(_src_keep_sql("spark", SRC_CAP))
    # unhinted (the cap_per_source rationale): AQE broadcasts the
    # source-count aggregate while it is small, shuffles past the
    # threshold instead of OOMing on a 10^7-domain crawl
    base = docs.join(srccnt, "source").select(
        "doc_id",
        "source",
        "n_chars",
        split.alias("split"),
        F.expr(f"md5({normalized('spark')})").alias("fp"),
        sampled.alias("sampled"),
        src_keep.alias("src_keep"),
        F.expr(_epoch_copies_sql("spark")).cast("long").alias("epoch_copies"),
    )
    fps = base.groupBy("fp").agg(F.countDistinct("split").alias("n_splits"))
    bloom = build_ngram_bloom(
        docs.filter(F.col("doc_id") % BENCH_MOD == 0), n=DECONTAM_N
    )
    bench_hit = contamination_scores(docs, bloom).select(
        "doc_id", (F.col("n_hits") > 0).alias("bench_hit")
    )
    psample = priority_sample(docs.select("doc_id", "n_chars")).select(
        "doc_id", F.lit(True).alias("in_ps")
    )
    return (
        base.join(fps, "fp")
        .join(bench_hit, "doc_id")
        .join(F.broadcast(psample), "doc_id", "left")
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum((F.col("n_splits") > 1).cast("long")).alias("n_contaminated"),
            F.sum(F.col("sampled").cast("long")).alias("n_sampled"),
            F.sum(F.when(F.col("sampled"), F.col("n_chars")).otherwise(0)).alias(
                "sampled_chars"
            ),
            F.sum(F.col("bench_hit").cast("long")).alias("n_bench_hit"),
            F.sum("epoch_copies").alias("epoch_copies"),
            F.sum(F.col("epoch_copies") * F.col("n_chars")).alias(
                "epoch_chars"
            ),
            F.sum(F.when(F.col("in_ps"), 1).otherwise(0)).alias("n_psample"),
            F.sum(F.when(F.col("in_ps"), F.col("n_chars")).otherwise(0)).alias(
                "psample_chars"
            ),
            F.sum(F.col("src_keep").cast("long")).alias("n_src_capped"),
            F.sum(
                F.when(F.col("src_keep"), F.col("n_chars")).otherwise(0)
            ).alias("src_capped_chars"),
        )
    )


# ------------------------------------------------ stratified sampling
def stratified_sample(
    docs: DataFrame,
    k: int,
    strata: "tuple[str, ...]" = ("lang",),
    id_col: str = "doc_id",
    salt: str = "sample-0",
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample — eval-set / inspection
    carving without an RNG: rank docs inside each stratum by a salted
    md5 of their id and keep the k smallest (a stratum with fewer than k
    docs is taken whole). Reproducible across runs, partitionings, and
    cluster sizes; different ``salt`` values draw independent samples
    (re-salting is the re-draw, the same trick as the split assigner).

    Scale shape: the rank filter is a window, but Spark's
    WindowGroupLimit rewrite pushes ``rank <= k`` into per-partition
    top-k before the shuffle, so each stratum moves O(partitions·k)
    rows, not its whole population. Strata are the parallelism unit —
    fine for (lang), (lang, source); for a single giant stratum use the
    Bernoulli hash-range sampler in corpus_split_assign instead.
    """
    # column API, not SQL interpolation: a salt containing a quote must
    # salt the hash, not rewrite the expression (same H64 rule)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}-"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(*strata).orderBy(h.alias("_h"), F.col(id_col))
    return (
        docs.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


# ------------------------------------------------ epoch resampling
def resample_epochs(
    docs: DataFrame, weights_bp: "dict[str, int] | None" = None
) -> DataFrame:
    """Materialized epoch resampling: one output row per (doc, copy) —
    the repeated-epochs view a tokenizer/packer consumes when a mixture
    recipe up-samples a source (copies = ``weights_bp[source]`` /
    10000 in expectation, resolved deterministically per doc).

    Map-only: the copy count is a pure function of (source, doc_id) and
    the explode multiplies rows in place — no shuffle, no state; a
    downstream global shuffle (``shard_corpus``) spreads the copies so
    repeats never land adjacent in the training order. ``copy_idx`` is
    1-based so (doc_id, copy_idx) is a stable global key for resume /
    lineage.
    """
    copies = F.expr(_epoch_copies_sql("spark", weights_bp))
    return (
        docs.withColumn("n_copies", copies)
        .filter(F.col("n_copies") > 0)
        .select(
            "*",
            F.explode(F.expr("sequence(1, n_copies)")).alias("copy_idx"),
        )
        .drop("n_copies")
    )




def _pii_cols(text_col: str = "text"):
    """(pii_hits, redacted_text) column pair over ``text_col``.

    Built with the column API, not SQL interpolation — the patterns
    hold backslashes and braces that SQL-literal escaping would mangle
    (the repo's standing H64 rule). Pure scan-speed map work: four
    regex passes inside whole-stage codegen, no shuffle, no UDF.
    """
    col = F.col(text_col)
    hits = F.lit(0).cast("long")
    for tag, pat in PII_PATTERNS:
        hits = hits + F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        col = F.regexp_replace(col, pat, f"<{tag}>")
    return hits, col


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub PII in-place: ``text_col`` is replaced by the redacted
    text (each match becomes ``<EMAIL>``/``<SSN>``/``<PHONE>``/``<IP>``)
    and a ``pii_hits`` long counts the matches scrubbed from each row.

    Map-only — at 100 TB this runs at scan speed alongside whatever
    projection feeds it; it belongs fused into the first pass over the
    text (CurationPipeline runs it before the quality gates so every
    downstream stage — fingerprints, spans, shards — sees only the
    redacted text and raw PII never reaches a training shard).
    """
    hits, red = _pii_cols(text_col)
    return df.withColumn("pii_hits", hits).withColumn(text_col, red)






def _chunk_arrays(w: int, overlap: int, text_col: str = "text"):
    """(n_tokens, n_chunks, chunks array<string>) columns.

    Chunk i covers tokens [i*stride, i*stride + w) with
    stride = w - overlap; the last chunk is the (possibly short)
    remainder, and a doc with n <= w tokens is exactly one chunk.
    n_chunks = (max(n - w, 0) + stride - 1) // stride + 1 — pure
    integer math so Spark and the DuckDB oracle agree bit-for-bit.
    """
    if not 0 <= overlap < w:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap=} {w=}")
    stride = w - overlap
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # split('') yields [''] in both engines: treat it as zero tokens
    n = F.when(
        (F.size(toks) == 1) & (F.element_at(toks, 1) == F.lit("")), F.lit(0)
    ).otherwise(F.size(toks))
    n_chunks = (
        F.when(n == 0, F.lit(0))
        .otherwise(
            F.floor((F.greatest(n - F.lit(w), F.lit(0)) + F.lit(stride - 1)) / F.lit(stride))
            + 1
        )
        .cast("long")
    )
    chunks = F.when(
        n_chunks == 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
            lambda i: F.array_join(F.slice(toks, i * stride + 1, w), " "),
        )
    )
    return n, n_chunks, chunks


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode documents into overlapping fixed-token-window chunks:
    (id, chunk_id, chunk_text, n_chunk_tokens), chunk_id dense from 0
    in document order. The RAG / context-window preparation step; pair
    with pack_sequences for training-batch layout.

    Scale shape: map-only — tokenize, window, posexplode, all inside
    one narrow stage; no shuffle, so 100 TB chunks at scan speed and
    inherits the input's partitioning. Empty docs yield zero rows.
    """
    _, _, chunks = _chunk_arrays(chunk_tokens, overlap, text_col)
    return (
        df.select(id_col, F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .withColumn(
            "n_chunk_tokens", F.size(F.split(F.col("chunk_text"), r"\s+")).cast("long")
        )
    )


