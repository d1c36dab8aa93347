"""Multi-dimensional data layout: Z-order (Morton) clustering for
min/max file skipping.

The 100 TB problem this solves: a table laid out by ingestion order (or
sorted by ONE column) has tight parquet min/max stats on at most that
column — a selective predicate on any other column still reads every
file. Interleaving the bits of several columns into one sort key
(Morton order) makes every participating column's values locally
clustered, so each file's [min, max] interval is tight on ALL of them
and a scan with a box predicate skips most files on any dimension —
the open-Spark equivalent of Delta/Databricks ``OPTIMIZE ZORDER BY``
(public technique: Morton 1966; Bayer's UB-tree; the Delta docs).

Everything is JVM-side column arithmetic (shift/mask/or inside
whole-stage codegen — no UDF), one single-row stats aggregate for the
quantization bounds, and one range shuffle: ``repartitionByRange`` on
the key gives non-overlapping key ranges per output file (tight stats),
``sortWithinPartitions`` tightens row-group stats inside each file.
Cost at scale = exactly one extra shuffle at write time, amortized over
every subsequent selective scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 12  # per-column resolution; n_cols * bits <= 63


def zorder_key(cols: "list[Column]", bits: int = ZORDER_BITS) -> Column:
    """Morton-interleave already-quantized integer columns (each in
    [0, 2^bits)) into one long: bit b of column i lands at position
    b * n_cols + i. Pure shift/mask/or — codegen-friendly, no UDF."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def _quantize(c: Column, lo, hi, bits: int) -> Column:
    """Scale a numeric column to [0, 2^bits) against collected bounds.
    Degenerate bounds (constant column, or None from an empty/all-null
    input) quantize to 0 everywhere."""
    if lo is None or hi is None:
        return F.lit(0).cast("long")
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (c.cast("double") - float(lo)) / span * ((1 << bits) - 1)
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def zorder_key_sql(cols: "list[str]", bits: int = ZORDER_BITS) -> str:
    """The ``zorder_key`` bit arithmetic as engine-portable ANSI SQL —
    term-for-term the same shift/mask/or chain, so an external engine
    (the DuckDB oracle, a lakehouse maintenance job) reproduces the key
    bit-identically from the same quantized inputs."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    return " | ".join(
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    )


def quantize_sql(col: str, lo: str, hi: str, bits: int = ZORDER_BITS) -> str:
    """``_quantize`` as portable SQL over the same IEEE expression
    order — ``((x - lo) / (hi - lo)) * (2^bits - 1)``, floored and
    clamped — for oracles that must match ``with_zorder_key``'s keys.
    ``lo``/``hi`` are SQL expressions (typically min/max subqueries)."""
    m = (1 << bits) - 1
    return (
        f"LEAST(GREATEST(CAST(floor(((CAST({col} AS DOUBLE) - {lo})"
        f" / ({hi} - {lo})) * {float(m)}) AS BIGINT), 0), {m})"
    )


def with_zorder_key(
    df: DataFrame,
    cols: "list[str]",
    bits: int = ZORDER_BITS,
    keep_quantized: bool = False,
) -> DataFrame:
    """``df`` plus a ``zkey`` Morton key over ``cols``.
    ``keep_quantized`` also emits the per-column grid coordinates as
    ``q_<col>`` — the inputs a layout gauge needs to measure how tight
    each file's box envelope is on every dimension.

    Quantization bounds come from ONE single-row min/max aggregate
    (control-plane collect — same class as codebook reads): ranks would
    need per-row window sorts, while linear quantization is map-only
    and good enough for skipping unless a column is pathologically
    skewed (pre-transform such a column, e.g. log of a byte size).
    Timestamps quantize via their numeric representation."""
    stats = df.agg(
        *[
            f
            for name in cols
            for f in (
                F.min(F.col(name).cast("double")).alias(f"_lo_{name}"),
                F.max(F.col(name).cast("double")).alias(f"_hi_{name}"),
            )
        ]
    ).collect()[0]
    quantized = [
        _quantize(F.col(name), stats[f"_lo_{name}"], stats[f"_hi_{name}"], bits)
        for name in cols
    ]
    out = df.withColumn("zkey", zorder_key(quantized, bits))
    if keep_quantized:
        for name, q in zip(cols, quantized):
            out = out.withColumn(f"q_{name}", q)
    return out


def layout_zorder(
    df: DataFrame,
    cols: "list[str]",
    num_files: int = 32,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional min/max skipping: Morton key
    → range partition into ``num_files`` non-overlapping key ranges →
    in-file sort. Write the result with ``.write.parquet(...)`` (one
    file per partition); the key column is dropped from the output.

    Plan shape: one single-row stats job + one range shuffle (sampled
    range bounds, Spark's RangePartitioner) + in-partition sort — no
    wide aggregate, no driver data. At 1000 executors this is the same
    shuffle a sort-by-one-column write already pays; the win is that
    min/max stats become tight on EVERY z-ordered column instead of
    one."""
    keyed = with_zorder_key(df, cols, bits)
    return (
        keyed.repartitionByRange(num_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
    )


def file_skip_stats(
    path: str, predicates: "dict[str, tuple[float, float]]"
) -> "dict[str, int]":
    """Footer-level skipping gauge: for every parquet file under
    ``path``, decide from its column min/max statistics whether a box
    predicate ``{col: (lo, hi)}`` could skip it (some predicate
    column's file-level [min, max] envelope disjoint from its bound).
    Returns ``{"files": N, "skipped": M}`` — what a stats-aware scan
    (Spark parquet filter pushdown, or any lakehouse file index) would
    avoid reading. Driver-side pyarrow footer reads only — no data IO."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = md.schema.names
        env: "dict[str, tuple]" = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                name = names[ci] if ci < len(names) else None
                st = g.column(ci).statistics
                if name in predicates and st is not None and st.has_min_max:
                    lo, hi = env.get(name, (st.min, st.max))
                    env[name] = (min(lo, st.min), max(hi, st.max))
        for name, (plo, phi) in predicates.items():
            if name in env:
                flo, fhi = env[name]
                if fhi < plo or flo > phi:
                    skipped += 1
                    break
    return {"files": len(files), "skipped": skipped}
