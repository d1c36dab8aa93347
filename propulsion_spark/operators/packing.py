"""Sequence packing — the concat-and-chunk step every pre-training
pipeline runs after curation: documents are laid out as one contiguous
token stream per split (deterministic doc_id order) and cut into
fixed-length training sequences; each doc's global token offset decides
which sequence(s) it lands in, and docs straddling a boundary span two.

The hard part at 100 TB is the GLOBAL running token offset: a single
`sum() OVER (ORDER BY doc_id)` window puts the whole corpus in one
task. This implements the classic two-phase distributed prefix sum
instead:

1. range-partition by (split, doc_id) and sort within partitions — the
   global order becomes (partition id, row order);
2. one Arrow-batched pass per partition computes local running sums
   (mapInPandas with a per-split carry across the partition's batches —
   no shuffle, no whole-partition materialization);
3. per-(partition, split) totals — one bounded row per partition — are
   collected, prefix-summed on the driver (control-plane: O(partitions)
   rows), and broadcast-joined back as each partition's starting
   offset.

Offsets are deterministic for a given (split, doc_id) order regardless
of partition boundaries, so re-runs and different cluster sizes produce
identical packing — the reproducibility contract training jobs need.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOCAL_SCHEMA_SUFFIX = [
    T.StructField("_pid", T.IntegerType(), False),
    T.StructField("_local_cum", T.LongType(), False),
]


def _with_local_cumsum(ranged: DataFrame, split_col: str, token_col: str) -> DataFrame:
    """Add per-partition running token sums (carry kept across the
    partition's Arrow batches) and the physical partition id."""
    import pandas as pd  # noqa: F401
    from pyspark import TaskContext

    out_schema = T.StructType(list(ranged.schema.fields) + _LOCAL_SCHEMA_SUFFIX)

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        pid = TaskContext.get().partitionId()
        carry: dict[str, int] = {}
        for pdf in batches:
            # vectorized: grouped cumsum at C speed + per-split carry
            # lookup via Series.map (no per-row Python iteration)
            toks = pdf[token_col].astype("int64")
            splits = pdf[split_col]
            cum = toks.groupby(splits, sort=False).cumsum()
            base = splits.map(carry).fillna(0).astype("int64")
            pdf = pdf.assign(_pid=pid, _local_cum=(cum + base).astype("int64"))
            for s, tot in toks.groupby(splits, sort=False).sum().items():
                carry[s] = carry.get(s, 0) + int(tot)
            yield pdf

    return ranged.mapInPandas(run, out_schema)


def pack_documents(
    docs: DataFrame,
    seq_len: int,
    split_col: str = "split",
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Input needs (split_col, order_col, token_col) columns; returns one
    row per doc: ``split, doc_id, n_tokens, offset`` (global token
    offset within the split's stream), ``first_seq``/``last_seq`` (the
    fixed-``seq_len`` training sequences the doc occupies — equal
    unless the doc straddles a boundary), and ``n_seqs`` spanned.
    Zero-token docs take no space (first_seq = last_seq = the sequence
    at their offset).
    """
    base = docs.select(
        F.col(split_col).alias("split"),
        F.col(order_col).alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )
    packed = _global_token_offsets(
        base, order_cols=["doc_id"], num_partitions=num_partitions
    ).select("split", "doc_id", "n_tokens", "offset")
    return with_seq_cols(packed, seq_len)


def _global_token_offsets(
    base: DataFrame,
    order_cols: "list[str]",
    num_partitions: int | None = None,
) -> DataFrame:
    """The two-phase distributed prefix sum (module docstring steps
    1-3), shared by :func:`pack_documents` (order = doc_id) and
    :func:`shard_corpus` (order = salted hash, i.e. a deterministic
    global shuffle). ``base`` needs (split, n_tokens, *order_cols);
    returns it plus ``offset`` — each row's global running-token start
    within its split under the (split, *order_cols) total order.

    Range partition ids ascend with the sort key, so the driver-side
    prefix over per-(partition, split) totals — O(partitions) rows, the
    only driver traffic — reconstructs the global order exactly.
    """
    spark = base.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = base.repartitionByRange(
        n_parts, "split", *order_cols
    ).sortWithinPartitions("split", *order_cols)
    local = _with_local_cumsum(ranged, "split", "n_tokens")
    # bounded control plane: one row per (physical partition, split)
    totals = (
        local.groupBy("_pid", "split")
        .agg(F.max("_local_cum").alias("_part_total"))
        .collect()
    )
    prefix: dict[tuple[int, str], int] = {}
    running: dict[str, int] = {}
    for row in sorted(totals, key=lambda r: (r["split"], r["_pid"])):
        prefix[(row["_pid"], row["split"])] = running.get(row["split"], 0)
        running[row["split"]] = (
            running.get(row["split"], 0) + row["_part_total"]
        )
    prefix_df = spark.createDataFrame(
        [(pid, split, off) for (pid, split), off in prefix.items()],
        "_pid int, split string, _prefix long",
    )
    return local.join(F.broadcast(prefix_df), ["_pid", "split"]).select(
        *base.columns,
        (F.col("_prefix") + F.col("_local_cum") - F.col("n_tokens")).alias(
            "offset"
        ),
    )


def with_seq_cols(packed: DataFrame, seq_len: int) -> DataFrame:
    """Derive ``first_seq``/``last_seq``/``n_seqs`` from global token
    offsets (shared by the batch operator and the streaming twin, which
    shifts offsets by the carried stream position first). Integer
    ``div`` throughout: double division loses exactness for token
    offsets beyond 2^53."""
    first_seq = F.expr(f"offset div {seq_len}")
    last_seq = F.expr(
        f"(offset + greatest(n_tokens - 1, CAST(0 AS LONG))) div {seq_len}"
    )
    return packed.select(
        "split",
        "doc_id",
        "n_tokens",
        "offset",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).alias("n_seqs"),
    )


def sequence_manifest(packed: DataFrame, seq_len: int) -> DataFrame:
    """One row per training sequence: the documents that occupy it.

    Input is :func:`pack_documents` output. Each doc explodes to the
    sequences it spans (bounded by n_seqs, which straddling keeps at
    ≤ ⌈n_tokens/seq_len⌉+1 — never a corpus-wide fan-out), then one
    aggregate per (split, seq_id) collects the doc list and the number
    of its tokens actually inside the sequence window — full sequences
    report fill_tokens == seq_len; only each split's last sequence may
    be partial. Zero-token docs ride along with 0 contribution (they
    occupy a boundary, not space).
    """
    spans = packed.select(
        "split",
        "doc_id",
        "n_tokens",
        "offset",
        F.explode(F.expr("sequence(first_seq, last_seq)")).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_len
    covered = F.greatest(
        F.lit(0),
        F.least(F.col("offset") + F.col("n_tokens"), seq_start + seq_len)
        - F.greatest(F.col("offset"), seq_start),
    )
    return spans.groupBy("split", "seq_id").agg(
        F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        F.count("*").alias("n_docs"),
        F.sum(covered).alias("fill_tokens"),
    )


# ------------------------------------------------ shuffle-and-shard
def shard_corpus(
    docs: DataFrame,
    shard_tokens: int,
    split_col: str | None = "split",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    salt: str = "shard-0",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle + bounded-token shard assignment —
    the "shuffle and shard" step that turns a curated corpus into
    training-ready output files.

    Source-ordered corpora train badly (a shard of all-arxiv then
    all-web is a curriculum nobody asked for), but a real random
    shuffle of 100 TB is neither reproducible nor resumable. Instead
    docs are totally ordered by a salted 64-bit hash of their id (the
    repo's re-salt-is-the-re-draw convention: a different ``salt`` is
    an independent permutation, the same salt replays bit-identically
    on any cluster size), and the packing prefix sum turns that order
    into global token offsets; ``shard_id = offset div shard_tokens``.

    Docs are never split across shards: a doc straddling a boundary
    belongs to the shard its offset starts in, so realized shard sizes
    vary by at most one document around ``shard_tokens`` — the price of
    keeping assignment embarrassingly parallel (a greedy exact-fill
    packer is inherently sequential). Each split is sharded
    independently; pass ``split_col=None`` to shard the corpus whole.

    Returns one row per doc: (split, id, n_tokens, offset, shard_id,
    shard_offset). Write the physical files with
    ``result.repartition("split", "shard_id").write.partitionBy(...)``
    — one shuffle keyed by the bounded-size shards.
    """
    split_expr = (
        F.col(split_col) if split_col else F.lit("all")
    )
    # column API, not SQL interpolation: a salt containing a quote must
    # salt the hash, not rewrite the expression (same H64 rule:
    # 60 bits of md5)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}-"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    base = docs.select(
        split_expr.alias("split"),
        h.alias("_shuf"),
        F.col(id_col).alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )
    # doc_id tiebreak keeps the order total under hash collisions
    offs = _global_token_offsets(
        base, order_cols=["_shuf", "doc_id"], num_partitions=num_partitions
    )
    return with_shard_cols(offs, shard_tokens)


def with_shard_cols(offs: DataFrame, shard_tokens: int) -> DataFrame:
    """Derive ``shard_id``/``shard_offset`` from global token offsets
    (shared by the batch operator and the streaming twin, which shifts
    offsets by the carried split position first — same pattern as
    :func:`with_seq_cols`). Integer ``div`` for 2^53-exactness."""
    shard_id = F.expr(f"offset div {shard_tokens}")
    return offs.select(
        "split",
        "doc_id",
        "n_tokens",
        "offset",
        shard_id.alias("shard_id"),
        (F.col("offset") - shard_id * shard_tokens).alias("shard_offset"),
    )


def shard_manifest(sharded: DataFrame) -> DataFrame:
    """One row per (split, shard): doc/token counts — the sidecar a
    training loader reads to plan epochs without listing data files."""
    return sharded.groupBy("split", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("offset").alias("first_offset"),
    )
