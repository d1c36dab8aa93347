"""Benchmark decontamination — remove evaluation-set text from a
training corpus before it leaks into the model.

The standard method (GPT-3 appendix C, Gopher §A.6, both public) flags
a training document when it shares an ``n``-token word n-gram with any
benchmark document. The naive implementation shuffles every training
n-gram into a join against the benchmark n-grams — at 100 TB that is a
shuffle of the whole corpus keyed by n-gram, dwarfing the benchmark
side by many orders of magnitude.

This module exploits the asymmetry: the benchmark side is SMALL by
definition (eval suites are megabytes, the corpus is terabytes), so it
compresses into a Bloom-filter bitset that broadcasts to every
executor, and the 100 TB side is scanned exactly once, map-only, with
zero shuffle:

1. :func:`build_ngram_bloom` — one distributed pass over the benchmark
   table; each partition sets bits in a local numpy bitset
   (Arrow-batched, vectorized hashing), the driver ORs the
   O(partitions) partial bitsets (bit-OR is commutative and
   associative, so the result is partition-invariant — property-tested).
2. :func:`contamination_scores` — the bitset rides a Spark broadcast
   into a ``mapInPandas`` scan of the corpus; per document it reports
   how many of its n-grams hit the filter. No shuffle, no join: the
   plan is scan → project, and Catalyst prunes the scan to
   (id, text).

Bloom semantics give the safe failure direction for this use case: NO
false negatives (a real benchmark n-gram always hits, so contamination
is never missed) and a tunable false-positive rate (a clean document
can be flagged and over-removed — the conservative direction; size
``m_bits`` so the expected FP count is ≪ 1, the default 2^23 bits /
k=4 holds ~1.2 M benchmark n-grams at < 1e-4 FP rate).

Tokenization matches the repo-wide convention (dedup.py
``_token_hashes``): whitespace split of lowercased, trimmed text.
:func:`exact_overlap_scores` computes the same scores exactly with a
distributed explode + join — the test reference the Bloom path is
pinned against (bloom hits ⊇ exact hits per document), and the
right tool when the "benchmark" side is NOT small.

Reference parity note: jet/Propulsion has no decontamination operator —
this is part of the LLM-data-pipeline surface the build brief adds on
top of the reference inventory.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pandas' siphash key — exactly 16 bytes; fixing it makes token hashes
# deterministic across processes, runs, and cluster sizes
_HASH_KEY = "propulsion-dcnt0"
_FNV64 = np.uint64(1099511628211)

# Java \s (what Spark's split('\\s+') matches) is the ASCII class
# [ \t\n\x0B\f\r] — NOT Unicode whitespace. pandas' default
# .str.split() splits on Unicode whitespace (e.g. U+00A0), which would
# tokenize differently from every Spark-side operator and break the
# exact-vs-bloom occurrence-counting contract (review-found); the
# explicit class keeps both engines on the same rule.
_WS_RE = "[ \\t\\n\\x0b\\f\\r]+"


def _ws_tokens(texts: "pd.Series") -> "pd.Series":
    """Lowercased ASCII-whitespace tokens of a text batch, exploded to
    one row per token (empty tokens from leading/trailing separators
    dropped — mirroring the SQL paths' ``!= ''`` filter)."""
    toks = texts.fillna("").str.lower().str.split(_WS_RE, regex=True)
    exploded = toks.explode()
    return exploded[exploded.notna() & (exploded != "")]


def _flat_ngram_hashes(
    texts: "pd.Series", n: int
) -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized rolling n-gram hashes for a batch of documents.

    Returns ``(hashes, doc_idx)`` — one uint64 hash per n-token window
    that lies wholly inside a single document, and the batch-local row
    index of the document owning each window. The whole batch is
    flattened to ONE token array: per-token hashes come from pandas'
    cythonized ``hash_array`` and the n-window combine is ``n``
    vectorized multiply-adds (wrapping uint64 polynomial) — no per-row
    Python loop anywhere.
    """
    exploded = _ws_tokens(texts)
    flat = exploded.to_numpy(dtype=object)
    if len(flat) < n:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    # batch-local row index (0..len(batch)-1) per flattened token
    pos_of_label = pd.Series(
        np.arange(len(texts), dtype=np.int64), index=texts.index
    )
    doc_idx = pos_of_label.loc[exploded.index].to_numpy()
    th = pd.util.hash_array(flat, hash_key=_HASH_KEY)
    m = len(flat) - n + 1
    with np.errstate(over="ignore"):
        h = np.zeros(m, dtype=np.uint64)
        for j in range(n):
            h = h * _FNV64 + th[j : j + m]
    # a window is valid only when its first and last token share a doc
    valid = doc_idx[: m] == doc_idx[n - 1 : n - 1 + m]
    return h[valid], doc_idx[:m][valid]


def _km_slots(h: "np.ndarray", i: int, m: int) -> "np.ndarray":
    """Slot array for hash index ``i`` — Kirsch-Mitzenmacher double
    hashing: slot_i = h1 + i·h2 (mod m, m a power of two). The ONE
    slot rule every numpy-side sketch shares (Bloom bit positions,
    Count-Min row buckets), so cross-sketch hashing stays consistent."""
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    with np.errstate(over="ignore"):
        return (h + np.uint64(i) * h2) & np.uint64(m - 1)


def _bloom_word_bit(
    h: "np.ndarray", i: int, m_bits: int
) -> "tuple[np.ndarray, np.ndarray]":
    """(word index, bit mask) arrays for hash slot ``i``."""
    idx = _km_slots(h, i, m_bits)
    return idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63))


@dataclass(frozen=True)
class NgramBloom:
    """An immutable Bloom bitset over word n-grams.

    ``data`` is the packed bitset as ``m_bits // 64`` uint64 words.
    Filters built from different partitionings of the same rows are
    byte-identical; :meth:`merge` of per-subset filters equals the
    filter of the union (bit-OR) — the mergeability contract every
    distributed sketch in this repo honors (see sketches.py).
    """

    n: int
    m_bits: int
    k: int
    data: bytes

    def __post_init__(self):
        if self.m_bits & (self.m_bits - 1):
            raise ValueError("m_bits must be a power of two")
        if len(self.data) != self.m_bits // 8:
            raise ValueError(
                f"bitset is {len(self.data)} bytes, want {self.m_bits // 8}"
            )

    def _words(self) -> "np.ndarray":
        return np.frombuffer(self.data, dtype=np.uint64)

    def contains(self, h: "np.ndarray") -> "np.ndarray":
        """Vectorized membership for an array of n-gram hashes."""
        words = self._words()
        member = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            w, bit = _bloom_word_bit(h, i, self.m_bits)
            member &= (words[w] & bit) != 0
        return member

    def merge(self, other: "NgramBloom") -> "NgramBloom":
        if (self.n, self.m_bits, self.k) != (other.n, other.m_bits, other.k):
            raise ValueError("cannot merge filters with different parameters")
        return NgramBloom(
            self.n,
            self.m_bits,
            self.k,
            np.bitwise_or(self._words(), other._words()).tobytes(),
        )

    @property
    def fill_ratio(self) -> float:
        """Fraction of set bits — the capacity gauge: past ~0.5 the
        false-positive rate degrades; rebuild with a larger m_bits."""
        return float(
            np.unpackbits(np.frombuffer(self.data, dtype=np.uint8)).sum()
        ) / self.m_bits


def build_ngram_bloom(
    bench: DataFrame,
    text_col: str = "text",
    n: int = 8,
    m_bits: int = 1 << 23,
    k: int = 4,
) -> NgramBloom:
    """One distributed pass over the benchmark table → an
    :class:`NgramBloom`.

    Control-plane cost is O(partitions · m_bits/8) bytes collected (one
    bitset per partition, OR-reduced on the driver) — with the 1 MiB
    default and a benchmark table of bounded partitions this is
    megabytes. The benchmark side is the SMALL side by definition; for
    a large "benchmark" (corpus-vs-corpus overlap) use
    :func:`exact_overlap_scores` instead.
    """
    words = m_bits // 64

    def per_partition(
        batches: "Iterator[pd.DataFrame]",
    ) -> "Iterator[pd.DataFrame]":
        bits = np.zeros(words, dtype=np.uint64)
        for pdf in batches:
            h, _ = _flat_ngram_hashes(pdf[text_col], n)
            for i in range(k):
                w, bit = _bloom_word_bit(h, i, m_bits)
                # bitwise_or.at handles duplicate word indices that a
                # plain fancy-index assignment would silently drop
                np.bitwise_or.at(bits, w, bit)
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = (
        bench.select(F.col(text_col).cast("string").alias(text_col))
        .mapInPandas(per_partition, "bits binary")
        .collect()
    )
    agg = np.zeros(words, dtype=np.uint64)
    for row in parts:
        agg |= np.frombuffer(row["bits"], dtype=np.uint64)
    return NgramBloom(n, m_bits, k, agg.tobytes())


_SCORE_FIELDS = (
    "n_ngrams long, n_hits long, contaminated_frac double"
)


def broadcast_bloom(spark, bloom: NgramBloom):
    """Ship the bitset to executors ONCE and hand the Broadcast back to
    the caller. Long-running pipelines (curation's per-micro-batch
    decontamination stage) pass this to :func:`contamination_scores`
    instead of the raw ``NgramBloom`` so the multi-MiB payload is not
    re-broadcast every batch with cleanup left to driver GC."""
    return spark.sparkContext.broadcast(
        (bloom.n, bloom.m_bits, bloom.k, bloom.data)
    )


def contamination_scores(
    docs: DataFrame,
    bloom,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document contamination against a broadcast Bloom filter.

    Map-only over the corpus: scan → mapInPandas → project; no shuffle,
    no join, scan pruned to (id, text). Returns one row per doc:
    ``(id_col, n_ngrams, n_hits, contaminated_frac)`` where ``n_hits``
    counts n-grams present in the filter (⊇ the true overlap; never
    misses a real one). Docs shorter than ``n`` tokens have
    ``n_ngrams = 0`` and frac 0.

    ``bloom``: an :class:`NgramBloom` (broadcast here, per call) or a
    pre-made :func:`broadcast_bloom` Broadcast (reused across calls).
    """
    spark = docs.sparkSession
    b = (
        broadcast_bloom(spark, bloom)
        if isinstance(bloom, NgramBloom)
        else bloom
    )
    id_field = docs.schema[id_col]

    def per_batch(
        batches: "Iterator[pd.DataFrame]",
    ) -> "Iterator[pd.DataFrame]":
        n, m_bits, k, raw = b.value
        filt = NgramBloom(n, m_bits, k, raw)
        for pdf in batches:
            h, doc_idx = _flat_ngram_hashes(pdf[text_col], n)
            member = filt.contains(h)
            n_ngrams = np.bincount(doc_idx, minlength=len(pdf)).astype(
                "int64"
            )
            n_hits = np.bincount(
                doc_idx[member], minlength=len(pdf)
            ).astype("int64")
            frac = n_hits / np.maximum(n_ngrams, 1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_ngrams": n_ngrams,
                    "n_hits": n_hits,
                    "contaminated_frac": frac,
                }
            )

    schema = f"{id_col} {id_field.dataType.simpleString()}, {_SCORE_FIELDS}"
    return docs.select(id_col, text_col).mapInPandas(per_batch, schema)


def _ngram_array_sql(text_col: str, n: int) -> str:
    """Spark SQL expression: array of word n-gram strings of ``text_col``
    (whitespace tokens, lowercased/trimmed — the repo convention).

    Empty tokens are filtered so empty/whitespace-only documents yield
    ZERO n-grams at any ``n`` — Spark's ``split('', '\\\\s+')`` returns
    ``['']`` (one empty token) where pandas ``''.split()`` returns
    none, and the Bloom scan is pinned to identical occurrence
    counting (review-found divergence at n=1).

    The token array is let-bound: referenced inside the transform
    lambda it would otherwise be re-split per position — O(tokens²)
    regex work per document (the measured pitfall behind
    ``dedup.let_bound``; 4.3 s → 0.5 s on the sf0.1 position explode).
    """
    from propulsion_spark.operators.dedup import let_bound

    t = f"filter(split(lower(trim({text_col})), '\\\\s+'), _tk -> _tk != '')"
    return let_bound(
        t,
        f"CASE WHEN size(x) >= {n} THEN "
        f"transform(sequence(0, size(x) - {n}), "
        f"i -> concat_ws(' ', slice(x, i + 1, {n}))) "
        f"ELSE array() END",
    )


def exact_overlap_scores(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-document benchmark-n-gram overlap — the reference the
    Bloom path is pinned against, and the fallback when the benchmark
    side is too large to broadcast as a bitset.

    Distributed shape: the corpus side explodes every n-gram WINDOW
    (occurrences, not distinct — the same counting the Bloom scan does,
    so the two paths agree row-for-row when the filter has no false
    positive), the benchmark side deduplicates before the join (a
    repeated eval phrase costs once), then a left join keyed on the
    n-gram string and one aggregate back to docs. This shuffles the
    corpus n-grams — exactly the cost the Bloom path avoids.
    """
    grams = F.expr(_ngram_array_sql(text_col, n))
    doc_grams = docs.select(
        id_col, F.explode_outer(grams).alias("_gram")
    )
    bench_grams = (
        bench.select(F.explode(grams).alias("_gram")).distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        doc_grams.join(bench_grams, "_gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("_gram").alias("n_ngrams"),
            F.count("_hit").alias("n_hits"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_hits",
            (
                F.col("n_hits") / F.greatest(F.col("n_ngrams"), F.lit(1))
            ).alias("contaminated_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 23,
    k: int = 4,
) -> "tuple[DataFrame, DataFrame]":
    """Build the filter, score the corpus, and split it.

    Returns ``(kept, flagged)``: docs whose contaminated fraction is
    ≤ / > ``threshold`` (default 0: any shared n-gram flags the doc —
    the GPT-3/Gopher stance). Bloom false positives only ever move a
    doc from kept to flagged (conservative over-removal); size
    ``m_bits`` by the benchmark n-gram count to bound that.
    """
    bloom = build_ngram_bloom(
        bench, text_col=text_col, n=n, m_bits=m_bits, k=k
    )
    scores = contamination_scores(
        docs, bloom, text_col=text_col, id_col=id_col
    )
    scored = docs.join(scores.drop("n_ngrams"), id_col, "left").fillna(
        {"n_hits": 0, "contaminated_frac": 0.0}
    )
    kept = scored.filter(F.col("contaminated_frac") <= threshold).drop(
        "n_hits", "contaminated_frac"
    )
    flagged = scored.filter(F.col("contaminated_frac") > threshold)
    return kept, flagged
