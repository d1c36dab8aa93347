"""Exact repeated-substring (n-gram span) deduplication — the
ExactSubstr method of Lee et al. 2021 ("Deduplicating Training Data
Makes Language Models Better"), re-expressed as DataFrame ops.

This is the OCCURRENCE-level half of the engine's ExactSubstr pair —
its sibling, ``operators/dedup.py::trim_duplicated_spans`` (the
CurationPipeline's span-dedup stage), is the cross-DOCUMENT half.
Pick by the question asked:

- ``trim_duplicated_spans``: a span shared by ≥ ``min_docs`` DISTINCT
  documents survives in exactly one document (doc-granularity keeper,
  original text bytes preserved for untrimmed docs) — the streaming-
  curation shape, where "who keeps it" must be decided per document.
- this module: a window duplicated ≥ ``min_dup`` TIMES anywhere —
  including within one document (self-repetition, which min_docs
  counting is blind to) — has all its occurrences masked (the
  published method's actual semantics, "leaving potentially zero
  copies"), or all but the gram-canonical one (``keep_first``).

Both find the duplicated PASSAGES themselves — boilerplate headers,
license blocks, templated paragraphs — where MinHash/SimHash judge
whole documents and winnowing only fingerprints. The reference
implementation builds a corpus-wide suffix array (single-node,
O(corpus) RAM); the Spark-native shape replaces it with fixed-length
n-gram hashing:

1. tokenize (the corpus-standard ``_toks`` split) and hash every
   n-token window under TWO independent hash functions (96 key bits —
   "exact" here means exact-modulo-hash; see ``_gram_hits`` for the
   collision math that makes the residual risk negligible at 100 TB,
   the r12 ADVICE finding) — map-only, one row per window (the
   tokenize-op row count, same as any text operator);
2. count occurrences per gram hash pair — ONE shuffle, map-side
   combined, O(distinct grams) reduce side;
3. join windows back to the ≥ ``min_dup`` gram set on the pair — the
   duplicated-gram side is usually small (broadcast), but the join is
   left to AQE so a boilerplate-heavy corpus degrades to a shuffle
   join instead of a driver OOM;
4. coalesce each document's hit windows into maximal spans — the
   gaps-and-islands pattern, windows partitioned by doc_id (never
   global).

A window of n tokens duplicated anywhere in the corpus (including
within the same document — self-repetition counts, as in the
reference) marks all its occurrences; overlapping/abutting marked
windows merge, so a duplicated passage of L ≥ n tokens yields ONE
span of exactly L tokens. Like the reference tool, the default
removes EVERY occurrence of a duplicated span ("leaving potentially
zero copies" — Lee et al. §4.1); ``keep_first=True`` instead protects
the corpus-canonical occurrence (min (doc_id, start)) of each gram,
the common production variant.

Spans are token-index intervals (start inclusive, end exclusive) over
the ``_toks`` token sequence, so they compose with ``chunk_documents``
and the packing operators, which count the same tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from propulsion_spark.operators.textops import _toks


def _gram_hits(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, start, gh, gh2): one row per n-token window, keyed by
    TWO independent hashes of the space-joined window — gh = xxhash64
    (64-bit), gh2 = hash (murmur3, 32-bit) — 96 key bits total. Both
    are computed INSIDE the higher-order transform so full window
    strings never leave the row.

    Why two: every downstream count/join groups on the pair, so a
    false duplicate needs a simultaneous collision in both functions.
    One 64-bit hash is "exact-modulo-hash" with a real false-positive
    channel at scale (the r12 ADVICE finding): at 10¹² distinct grams
    (the 100 TB corpus) the birthday bound gives ~2.7% odds of SOME
    xxhash64 collision (≈n²/2⁶⁵) — innocent text masked with no error.
    At 96 bits the same bound is ~6×10⁻⁷ (≈n²/2⁹⁷), negligible. The
    window string itself can't be carried to verification without
    shuffling O(corpus × n) token bytes — the pair is the published
    method's semantics at an extra murmur3 per window."""
    return (
        docs.select("doc_id", F.expr(_toks("spark")).alias("t"))
        .filter(F.size("t") >= n)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(t) - {n}), "
                    f"i -> struct("
                    f"xxhash64(concat_ws(' ', slice(t, i + 1, {n}))) AS gh, "
                    f"hash(concat_ws(' ', slice(t, i + 1, {n}))) AS gh2))"
                )
            ).alias("start", "g"),
        )
        .select("doc_id", "start", "g.gh", "g.gh2")
    )


def repeated_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    min_dup: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """(doc_id, span_start, span_end): maximal token spans covered by
    n-gram windows that occur ≥ ``min_dup`` times in the corpus.
    Spans within a document never overlap (abutting/overlapping hit
    windows coalesce). ``keep_first=True`` exempts each gram's
    corpus-canonical occurrence (min (doc_id, start)), so one copy of
    every duplicated passage survives masking."""
    grams = _gram_hits(docs, n)
    per_gram = grams.groupBy("gh", "gh2").agg(
        F.count("*").alias("cnt"),
        F.min(F.struct("doc_id", "start")).alias("first_at"),
    )
    dup = per_gram.filter(F.col("cnt") >= min_dup)
    hits = grams.join(dup, ["gh", "gh2"])
    if keep_first:
        hits = hits.filter(
            ~(
                (F.col("doc_id") == F.col("first_at.doc_id"))
                & (F.col("start") == F.col("first_at.start"))
            )
        )
    return coalesce_spans(hits.select("doc_id", "start"), n)


def coalesce_spans(hits: DataFrame, n: int) -> DataFrame:
    """(doc_id, span_start, span_end) from (doc_id, start) hit
    windows: the gaps-and-islands kernel shared by the batch operator
    and the streaming twin — a hit window starting beyond the running
    max end opens a new island; islands become maximal spans. Windows
    partition by doc_id (never global)."""
    w = Window.partitionBy("doc_id").orderBy("start")
    run_end = F.max(F.col("start") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    island = F.sum(
        F.when(run_end.isNull() | (F.col("start") > run_end), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        hits.withColumn("_island", island)
        .groupBy("doc_id", "_island")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + n).alias("span_end"),
        )
        .select(
            "doc_id",
            F.col("span_start").cast("long"),
            F.col("span_end").cast("long"),
        )
    )


def mask_repeated_ngrams(
    docs: DataFrame,
    n: int = 8,
    min_dup: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """(doc_id, text, masked_text, n_masked_tokens): the corpus with
    duplicated spans removed from ``masked_text`` (tokens outside
    spans re-joined with single spaces — masking normalizes
    whitespace, the tokenizer's equivalence class). Documents with no
    duplicated spans pass through with ``n_masked_tokens = 0`` and
    ``masked_text`` = the space-normalized token join, so downstream
    text is uniformly normalized. Map-only except the span
    computation itself; the span list per document is bounded (spans
    are disjoint), so the join side stays small."""
    return mask_spans(
        docs,
        repeated_ngram_spans(docs, n=n, min_dup=min_dup, keep_first=keep_first),
    )


def mask_spans(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """Apply (doc_id, span_start, span_end) spans to the corpus — the
    masking kernel shared by the batch operator and the streaming
    twin. Tokens outside spans re-join with single spaces (masking
    normalizes whitespace, the tokenizer's equivalence class);
    documents with no spans pass through with ``n_masked_tokens = 0``
    and the space-normalized token join, so downstream text is
    uniformly normalized. Map-only; the per-doc span list is bounded
    (spans are disjoint), so the join side stays small."""
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias(
            "n_masked_tokens"
        ),
    )
    kept = (
        "concat_ws(' ', transform(filter("
        "  transform(t, (tok, i) -> struct(tok AS tok, CAST(i AS BIGINT) AS i)),"
        "  s -> NOT exists(_spans, sp -> s.i >= sp.span_start"
        "                               AND s.i < sp.span_end)"
        "), x -> x.tok))"
    )
    return (
        docs.select("doc_id", "text", F.expr(_toks("spark")).alias("t"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "text",
            F.when(F.col("_spans").isNull(), F.expr("concat_ws(' ', t)"))
            .otherwise(F.expr(kept))
            .alias("masked_text"),
            F.coalesce(F.col("n_masked_tokens"), F.lit(0))
            .cast("long")
            .alias("n_masked_tokens"),
        )
    )
