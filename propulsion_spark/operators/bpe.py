"""BPE tokenizer training and map-only encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokenizer-learning step of a pre-training data pipeline, distributed the
way practice distributes it:

- :func:`word_counts` — pre-tokenize with the repo's BPE-ish regex
  (``textops._BPE_RE_SPARK``) and aggregate ONE corpus-wide
  ``groupBy(word)`` count. This is the only shuffle in the family; the
  output is O(distinct pre-tokens), min_count-pruned.
- :func:`train_bpe` — the EXACT Sennrich merge loop, run driver-side
  over the collected word-frequency table with incremental pair-count
  maintenance (each merge touches only the words that contain the
  pair). Driver-side is the honest design, not a shortcut: BPE's merge
  choice is a strict global argmax per iteration, so a "distributed"
  trainer would still need a full barrier per merge (32k merges = 32k
  shuffle rounds over the corpus); every production trainer
  (subword-nmt, SentencePiece, HF tokenizers) therefore runs the loop
  on a word-frequency DICT, and the distributed part is building that
  dict — which is exactly the one groupBy above. The dict is bounded:
  ``min_count`` pruning plus the ``max_words`` top-K cap keep it
  O(vocab), and the dropped token mass is REPORTED (``coverage``), not
  silently truncated (repo "no silent caps" rule).
- :func:`bpe_encode` — scoring side for 100 TB: the learned merge
  ranks broadcast once, applied by a vectorized-where-it-counts
  mapInPandas with a per-batch word→encoding memo (Zipf makes the memo
  hit rate ~99%: encoding cost is O(distinct words in batch), not
  O(tokens)). Zero shuffle, no explode row blowup, fuses into a
  curation scan.

jet/propulsion has no tokenizer analogue — this module is part of the
LLM-data-pipeline extension surface (SURVEY §2.8), alongside
dedup/decontam/packing/lm. Not oracle-attested: the merge loop is an
iterative argmax DuckDB SQL cannot express; correctness is pinned by
``tests/test_bpe.py`` (exact equivalence to a from-scratch reference
reimplementation on randomized corpora, roundtrip and determinism
properties).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Same pre-tokenizer as textops token counting: letter runs | digit
# runs | single non-space symbol. Lowercased (repo tokenization rule).
_PRETOK_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")

END = "</w>"  # end-of-word sentinel symbol (classic Sennrich marker)


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(word, c) frequency table — the distributed half of BPE training.

    One explode → one hash aggregate; map-side combine absorbs the
    corpus, post-shuffle rows are O(distinct pre-tokens). ``min_count``
    prunes the hapax tail (at 100 TB this is what keeps the table
    driver-collectable; the retained-mass gauge lives in
    :func:`train_bpe`).
    """
    from propulsion_spark.operators.textops import _BPE_RE_SPARK

    wc = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), {_BPE_RE_SPARK}, 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    if min_count > 1:
        wc = wc.filter(F.col("c") >= min_count)
    return wc


def _merge_loop(words: "list[tuple[tuple[str, ...], int]]", n_merges: int):
    """Exact Sennrich merge loop with incremental pair-count updates.

    ``words`` is [(symbol_tuple, count)]; returns the ordered merge
    list [(left, right)]. Argmax ties break on the lexicographically
    smallest pair so training is deterministic regardless of dict /
    partition order (subword-nmt breaks ties arbitrarily; determinism
    is this repo's reproducibility rule).

    Incremental maintenance: pair→count and pair→{word indices} are
    built once; each merge rescans only the words containing the
    chosen pair, subtracting their old adjacent pairs and adding the
    new ones — O(occurrences of the merged pair) per iteration, not
    O(vocab). This is the standard subword-nmt optimization, written
    from the paper's description.
    """
    syms = [list(w) for w, _ in words]
    counts = [c for _, c in words]
    pair_count: dict = {}
    pair_words: dict = {}

    def _add(pair, c, wi):
        pair_count[pair] = pair_count.get(pair, 0) + c
        if pair_count[pair] <= 0:
            del pair_count[pair]
            pair_words.pop(pair, None)
        elif c > 0:
            pair_words.setdefault(pair, set()).add(wi)

    for wi, s in enumerate(syms):
        c = counts[wi]
        for a, b in zip(s, s[1:]):
            _add((a, b), c, wi)

    merges: list = []
    for _ in range(n_merges):
        if not pair_count:
            break
        # deterministic argmax: max count, then smallest pair
        best = min(pair_count, key=lambda p: (-pair_count[p], p))
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            s = syms[wi]
            c = counts[wi]
            # remove this word's old adjacent-pair contributions
            for a, b in zip(s, s[1:]):
                _add((a, b), -c, wi)
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[wi] = out
            for a, b in zip(out, out[1:]):
                _add((a, b), c, wi)
        pair_count.pop(best, None)
        pair_words.pop(best, None)
    return merges


def train_bpe(
    wc: DataFrame,
    n_merges: int,
    max_words: int | None = None,
) -> "tuple[DataFrame, float]":
    """Learn ``n_merges`` BPE merges from a (word, c) table; returns
    (merges DataFrame ``(rank, left, right)``, retained-mass coverage).

    ``max_words`` caps the driver-side table at the top-K words by
    count (ties broken by word, deterministic); ``coverage`` is the
    fraction of total token mass those K words carry — the gauge that
    makes the cap a measured tradeoff instead of a silent one. With
    Zipfian text, 1M words ≈ 99.9%+ mass; the merge loop's memory is
    O(K · avg word length).
    """
    spark = wc.sparkSession
    total = wc.agg(F.sum("c")).collect()[0][0] or 0
    top = wc.orderBy(F.col("c").desc(), "word")
    if max_words is not None:
        top = top.limit(max_words)
    rows = top.collect()
    kept = sum(r["c"] for r in rows)
    coverage = (kept / total) if total else 1.0

    words = [
        (tuple(r["word"]) + (END,), r["c"]) for r in rows if r["word"]
    ]
    merges = _merge_loop(words, n_merges)
    out = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )
    return out, coverage


def _encode_word(word: str, ranks: dict, memo: dict) -> "list[str]":
    """Greedy lowest-rank merge application to one pre-token (the
    standard BPE inference loop), memoized per batch."""
    hit = memo.get(word)
    if hit is not None:
        return hit
    s = list(word) + [END]
    while len(s) > 1:
        best_i, best_r = -1, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    memo[word] = s
    return s


def broadcast_merges(spark: SparkSession, merges: DataFrame):
    """Collect the (tiny, O(n_merges)) merge table once and broadcast
    the rank dict for the life of a pipeline — the same one-broadcast
    discipline as the decontam Bloom bitset and the LM gram dict."""
    ranks = {
        (r["left"], r["right"]): r["rank"] for r in merges.collect()
    }
    return spark.sparkContext.broadcast(ranks)


def bpe_encode(
    docs: DataFrame,
    bc,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_tokens: bool = False,
) -> DataFrame:
    """Per-document BPE token counts (and optionally the token arrays):
    (id, n_words, n_bpe_tokens[, bpe_tokens]).

    Map-only: merge ranks arrive via broadcast (``broadcast_merges``);
    the merge loop runs once per DISTINCT word per task (Zipf memo),
    and the per-token work is vectorized — C-regex pre-tokenization,
    one ``Series.map`` of the flat token stream against the memo, and
    a ``bincount`` for per-row sums; no per-token Python bytecode.
    ``with_tokens=False`` keeps the output narrow for counting/packing
    consumers — token arrays multiply the row width ~10× and should
    only cross the wire when a writer needs them (that path pays the
    per-word list build).
    """
    import numpy as np
    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()
    narrow = docs.select(
        F.col(id_col).alias("_id"), F.lower(F.col(text_col)).alias("_text")
    )
    schema = f"{id_col} {id_type}, n_words long, n_bpe_tokens long"
    if with_tokens:
        schema += ", bpe_tokens array<string>"

    def per_batch(batches):
        ranks = bc.value
        memo: dict = {}  # word -> encoded token list
        nlen: dict = {}  # word -> token count (the narrow-path memo)
        for pdf in batches:
            per_row = [
                _PRETOK_RE.findall(t) if isinstance(t, str) else []
                for t in pdf["_text"]
            ]
            counts = np.fromiter(
                (len(ws) for ws in per_row), dtype="int64", count=len(per_row)
            )
            flat = pd.Series(
                [w for ws in per_row for w in ws], dtype="object"
            )
            for w in flat.unique() if len(flat) else ():
                if w not in nlen:
                    nlen[w] = len(_encode_word(w, ranks, memo))
            tok_lens = flat.map(nlen).to_numpy(dtype="int64", na_value=0) if len(flat) else np.zeros(0, dtype="int64")
            row_ix = np.repeat(np.arange(len(per_row)), counts)
            n_toks = np.bincount(
                row_ix, weights=tok_lens, minlength=len(per_row)
            ).astype("int64")
            data = {id_col: pdf["_id"], "n_words": counts, "n_bpe_tokens": n_toks}
            if with_tokens:
                data["bpe_tokens"] = [
                    [s for w in ws for s in memo[w]] for ws in per_row
                ]
            yield pd.DataFrame(data)

    return narrow.mapInPandas(per_batch, schema)
