"""Deterministic sketch operators — mergeable approximate aggregates
whose results are bit-identical across engines, so they stay inside the
exact-match oracle gate (unlike HLL++, whose register layout is
implementation-defined: Spark's ``approx_count_distinct`` and DuckDB's
``approx_count_distinct`` give different answers by design).

``sketch_distinct_kmv``: K-minimum-values distinct-count sketch. Keep
the K smallest values of a uniform hash per group; if fewer than K
distinct hashes exist the count is exact, otherwise the kth-smallest
hash position estimates the distinct count as ``(K-1) · M / kth``
(Beyer et al., "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD'07). KMV sets are trivially mergeable
(union, re-take K smallest) — the property that makes the sketch useful
for 100 TB rollups where per-partition sketches combine without a
global distinct shuffle.

Determinism: the hash is the first 13 hex digits (52 bits) of
``md5(value)`` — 52 bits so every hash, and the ``(K-1)·M/kth``
division's operands, are exact in BOTH a BIGINT and an IEEE double;
the estimate is then bit-identical in Spark and DuckDB. Production note:
for raw speed Spark's native ``approx_count_distinct`` (HLL++, partial
aggregation, no window) is the right tool; this operator is the
oracle-checkable design point demonstrating the sketch shape itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.operators import register
from propulsion_spark.operators.layout import (
    ZORDER_BITS,
    quantize_sql,
    zorder_key_sql,
)

KMV_K = 64
HASH_BITS = 52
HASH_SPACE = float(1 << HASH_BITS)  # M

# Z-order gauge design point (r10): 12-bit grid per column; the top
# 6 interleaved key bits = the 64 "files" a range write on the key
# would produce. By Morton construction each prefix bucket is exactly
# one 8×8 quadrant of the (user_id × value) grid, so every bucket's
# box-envelope volume is ≤ 1/64 of the space — the tight-stats
# invariant min/max file skipping relies on, attested exactly.
ZPREFIX_BITS = 6
_Z_SHIFT = 2 * ZORDER_BITS - ZPREFIX_BITS
_Z_CELLS = float((1 << ZORDER_BITS) ** 2)

_DUCK_ZORDER_ARM = f"""
SELECT 'zorder' AS method,
       'z-' || CAST(zb AS VARCHAR) AS event_type,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(max(zkey) AS BIGINT) AS detail,
       CAST((max(qu) - min(qu) + 1) * (max(qv) - min(qv) + 1) AS DOUBLE)
           / {_Z_CELLS} AS est_distinct,
       CAST(count(DISTINCT zkey) AS BIGINT) AS exact_distinct
FROM (
  SELECT qu, qv, zkey, zkey >> {_Z_SHIFT} AS zb FROM (
    SELECT qu, qv, {zorder_key_sql(["qu", "qv"])} AS zkey FROM (
      SELECT {quantize_sql("user_id", "b.ulo", "b.uhi")} AS qu,
             {quantize_sql("value", "b.vlo", "b.vhi")} AS qv
      FROM events, (SELECT min(CAST(user_id AS DOUBLE)) AS ulo,
                           max(CAST(user_id AS DOUBLE)) AS uhi,
                           min(CAST(value AS DOUBLE)) AS vlo,
                           max(CAST(value AS DOUBLE)) AS vhi FROM events) b
    )
  )
)
GROUP BY zb
"""

# HLL design point: 2^8 = 256 registers from the first byte of md5;
# rho from the next 52 bits. Registers, their integer power sum, and
# the raw estimate are all exact-arithmetic → bit-identical on both
# engines (unlike HLL++'s implementation-defined layout).
HLL_B = 8
HLL_M = 1 << HLL_B
_POW53 = 1 << 53
# alpha_256 from integer-valued doubles only (a bare 0.7213 literal
# parses as DECIMAL in DuckDB — 1-ulp portability trap, see _duck_dot)
_ALPHA_SQL = f"((7213.0/10000.0) / (1.0 + (1079.0/1000.0)/{HLL_M}.0))"
# raw HLL estimate: alpha·m²/Σ2^-M_j with the power sum kept INTEGER
# (Σ 2^(53-M_j) ≤ 256·2^52 < 2^63): a float Σ2^-M_j would round
# order-dependently under partial aggregation; the integer sum cannot.
_HLL_EST_SQL = f"{_ALPHA_SQL} * {HLL_M * HLL_M}.0 * {_POW53}.0 / CAST(s AS DOUBLE)"

_DUCK_HLL = f"""
hll_regs AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2)) AS BIGINT)
             AS bucket,
         max(53 - length(bin(
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 13)) AS BIGINT)
         ))) AS m_j
  FROM events GROUP BY 1, 2
),
hll AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_used,
         CAST(sum(CAST(1 AS BIGINT) << (53 - m_j)) AS BIGINT)
           + ({HLL_M} - count(*)) * CAST({_POW53} AS BIGINT) AS s
  FROM hll_regs GROUP BY event_type
),
hll_exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
)
"""


# ---- deterministic log2 histogram (quantile sketch) -------------------
# Bucket = bit length of floor(value · 2^20): a base-2 HDR-histogram
# whose bucketing is PURE INTEGER arithmetic (no log(), whose last-ulp
# rounding is not portable). Bucket counts are trivially mergeable
# (sum), quantile estimates come off the cumulative histogram with a
# guaranteed ≤2× relative error (bucket b spans [2^(b-1), 2^b)), and
# rank k = ceil(p·n) is computed as (n·pct + 99) div 100 — integer
# again, so Spark and DuckDB agree bit-for-bit end to end.
QH_SCALE = 1 << 20
QH_PCTS = [50, 90, 99]


def value_log_histogram(
    df: DataFrame, group_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """(group, bucket, c): the mergeable sketch state — counts per
    base-2 bucket of a non-negative value column. Map + one groupBy;
    merging partial histograms = summing counts per (group, bucket)
    (pinned by test: sketch-of-union == merge-of-partials)."""
    bucket = F.expr(
        f"CAST(length(bin(CAST(floor({value_col} * {QH_SCALE}.0) AS BIGINT)))"
        " AS BIGINT)"
    )
    return (
        df.select(F.col(group_col).alias("grp"), bucket.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def merge_histograms(*hists: DataFrame) -> DataFrame:
    """Union partial sketch states and re-aggregate — the 100 TB rollup
    shape (per-partition/day sketches combine without re-reading data)."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("grp", "bucket").agg(F.sum("c").cast("long").alias("c"))


def histogram_quantiles(hist: DataFrame, pcts: "list[int]" = QH_PCTS) -> DataFrame:
    """Quantile estimates off the cumulative histogram: one row per
    (grp, pct) with the chosen bucket, its dyadic upper-bound estimate,
    bucket count, and total n."""
    w_cum = Window.partitionBy("grp").orderBy("bucket")
    w_all = Window.partitionBy("grp")
    cum = (
        hist.withColumn("cum", F.sum("c").over(w_cum))
        .withColumn("n", F.sum("c").over(w_all))
        .withColumn("n_buckets", F.count("*").over(w_all))
    )
    arms = []
    for pct in pcts:
        k = F.expr(f"(n * {pct} + 99) div 100")
        arms.append(
            cum.filter(F.col("cum") >= k)
            .groupBy("grp")
            .agg(
                F.lit(pct).cast("long").alias("pct"),
                F.min("bucket").alias("bucket"),
                F.min("n_buckets").alias("n_buckets"),
                F.min("n").alias("n"),
            )
            .withColumn(
                "est",
                F.expr(
                    "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))"
                    f" AS DOUBLE) / {QH_SCALE}.0"
                ),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


_DUCK_QHIST = f"""
qhist AS (
  SELECT event_type AS grp,
         CAST(length(bin(CAST(floor(value * {QH_SCALE}.0) AS BIGINT))) AS BIGINT)
             AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
qcum AS (
  SELECT grp, bucket, c,
         sum(c) OVER (PARTITION BY grp ORDER BY bucket) AS cum,
         sum(c) OVER (PARTITION BY grp) AS n,
         count(*) OVER (PARTITION BY grp) AS n_buckets
  FROM qhist
),
qranked AS (
  SELECT event_type AS grp, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)
             AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
"""


def _duck_qhist_arm(pct: int) -> str:
    return f"""
SELECT 'qhist_p{pct}' AS method, s.grp AS event_type,
       CAST(s.n_buckets AS BIGINT) AS n_kept,
       CAST(s.bucket AS BIGINT) AS detail,
       CAST((CAST(1 AS BIGINT) << s.bucket) AS DOUBLE) / {QH_SCALE}.0
           AS est_distinct,
       CAST(floor(x.value * {QH_SCALE}.0) AS BIGINT) AS exact_distinct
FROM (
  SELECT grp, min(bucket) AS bucket, min(n_buckets) AS n_buckets,
         min(n) AS n
  FROM qcum WHERE cum >= (n * {pct} + 99) // 100 GROUP BY grp
) s
JOIN qranked x ON x.grp = s.grp AND x.rn = (s.n * {pct} + 99) // 100
"""


@register(
    "sketch_distinct_kmv",
    f"""
WITH {_DUCK_HLL.strip()},
{_DUCK_QHIST.strip()}
SELECT 'kmv' AS method, event_type,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(max(h) AS BIGINT) AS detail,
       CASE WHEN count(*) < {KMV_K} THEN CAST(count(*) AS DOUBLE)
            ELSE ({KMV_K} - 1) * CAST({1 << HASH_BITS} AS DOUBLE) / max(h)
            END AS est_distinct,
       CAST(min(exact_distinct) AS BIGINT) AS exact_distinct
FROM (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY event_type) AS exact_distinct
  FROM (
    SELECT DISTINCT event_type,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT) AS h
    FROM events
  )
)
WHERE rn <= {KMV_K}
GROUP BY event_type
UNION ALL
SELECT 'hll', event_type, n_used, s, {_HLL_EST_SQL}, exact_distinct
FROM hll JOIN hll_exact USING (event_type)
UNION ALL {_duck_qhist_arm(50)}
UNION ALL {_duck_qhist_arm(90)}
UNION ALL {_duck_qhist_arm(99)}
UNION ALL
SELECT 'cmin' AS method, token AS event_type, CAST(n AS BIGINT) AS n_kept,
       CAST(1 AS BIGINT) AS detail, CAST(n AS DOUBLE) AS est_distinct,
       CAST(n AS BIGINT) AS exact_distinct
FROM (
  SELECT token, count(*) AS n
  FROM (SELECT unnest(list_filter(string_split_regex(lower(trim(text)),
                                                     '\\s+'),
                                  x -> x != '')) AS token
        FROM documents)
  GROUP BY token
  HAVING count(*) >= (SELECT count(*) FROM documents)
)
UNION ALL {_DUCK_ZORDER_ARM}
""",
    doc=f"THREE mergeable sketch families per event type in one "
    "long-format report, every branch bit-identical across engines. "
    "method='qhist_p50/p90/p99' (r6): base-2 HDR-style value histogram "
    "— bucket = bit length of floor(value·2^20), pure integer (no "
    "log()); detail = the chosen bucket, est = its dyadic upper bound "
    "(≤2× relative error by construction), exact = the true order "
    "statistic (rank ceil(p·n) as integer (n·pct+99) div 100) scaled "
    "to the same fixed point; n_kept = buckets used (the sketch's "
    "whole state — counts per bucket — merges by addition, the 100 TB "
    "rollup shape). "
    f"method='kmv': "
    f"K-minimum-values (K={KMV_K}; Beyer et al. SIGMOD'07) — detail is "
    "the kth-smallest 52-bit md5 hash. method='hll': a deterministic "
    f"HyperLogLog ({HLL_M} registers from the md5 first byte, rho from "
    "the next 52 bits; raw estimate only — the small-range linear-"
    "counting correction needs ln(), whose last-ulp rounding is not "
    "portable, so the consumer applies it from n_kept = used registers) "
    "— detail is the integer register power sum Σ2^(53-M_j), which IS "
    "the mergeable state (min per register under union ⇒ take max M_j). "
    "Exact distinct alongside for error inspection. method='cmin' (r8): "
    "the Count-Min two-pass heavy-hitter census over the documents "
    "table (threshold = corpus doc count) — the Spark side answers via "
    "the SKETCH prefilter (build_count_min + broadcast scan) while the "
    "oracle recomputes the census exactly, so the driver's hash gate "
    "attests zero false negatives (guaranteed) AND that the HAVING "
    "cleanup dropped every overestimated straggler — the same "
    "attestation shape as the decontamination Bloom row; detail=1 is "
    "the per-token witness that the estimate never undercounted. "
    "Production note: Spark's native approx_count_distinct (HLL++) is "
    "the raw-speed tool; these are the oracle-checkable design points. "
    "method='zorder' (r10): the multi-dimensional LAYOUT gauge — events "
    "(user_id, value) quantized to the 12-bit grid, Morton-interleaved "
    "with layout.zorder_key, bucketed by the top-6-bit key prefix (the "
    "64 files a range write would produce); per bucket the row count, "
    "max key (detail), the box-envelope volume fraction min/max "
    "skipping would see (est_distinct — ≤ 1/64 by Morton construction, "
    "the tight-stats invariant attested exactly), and distinct keys "
    "(exact_distinct). Pure shift/mask/or + one grid-stats aggregate, "
    "bit-identical across engines.",
)
def q_sketch_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    wc = Window.partitionBy("event_type")
    kept = (
        hashed.withColumn("rn", F.row_number().over(w))
        .withColumn("exact_distinct", F.count("*").over(wc))
        .filter(F.col("rn") <= KMV_K)
    )
    kmv = kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("detail"),
        F.when(F.count("*") < KMV_K, F.count("*").cast("double"))
        .otherwise((KMV_K - 1) * F.lit(HASH_SPACE) / F.max("h"))
        .alias("est_distinct"),
        F.min("exact_distinct").alias("exact_distinct"),
    ).select(F.lit("kmv").alias("method"), "*")

    md = F.md5(F.col("user_id").cast("string"))
    regs = (
        ev.select(
            "event_type",
            F.conv(F.substring(md, 1, 2), 16, 10).cast("long").alias("bucket"),
            F.conv(F.substring(md, 3, 13), 16, 10).cast("long").alias("hh"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max(F.lit(53) - F.length(F.expr("bin(hh)"))).alias("m_j"))
    )
    hll = regs.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        (
            F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - m_j)"))
            + (HLL_M - F.count("*")) * F.lit(_POW53)
        ).alias("s"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    hll = hll.join(exact, "event_type").select(
        F.lit("hll").alias("method"),
        "event_type",
        "n_kept",
        F.col("s").alias("detail"),
        F.expr(_HLL_EST_SQL).alias("est_distinct"),
        "exact_distinct",
    )

    # quantile-histogram branches: sketch state + estimates from the
    # shared library kernel, exact order statistic alongside
    hist = value_log_histogram(ev)
    quants = histogram_quantiles(hist)
    w_rank = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_n = Window.partitionBy("event_type")
    ranked = ev.select(
        F.col("event_type").alias("grp"),
        "value",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )
    quants = quants.withColumnRenamed("n", "qn").withColumnRenamed(
        "grp", "qgrp"
    )
    qarms = quants.join(
        ranked,
        (quants.qgrp == ranked.grp)
        & (ranked.rn == F.expr("(qn * pct + 99) div 100")),
    ).select(
        F.concat(F.lit("qhist_p"), quants.pct.cast("string")).alias("method"),
        F.col("qgrp").alias("event_type"),
        F.col("n_buckets").alias("n_kept"),
        F.col("bucket").alias("detail"),
        F.col("est").alias("est_distinct"),
        F.expr(f"CAST(floor(value * {QH_SCALE}.0) AS BIGINT)").alias(
            "exact_distinct"
        ),
    )
    # Count-Min heavy-hitter arm: sketch-prefiltered exact census over
    # the documents table (threshold = doc count — scale-adaptive and
    # expressible on both engines); the witness column re-scores every
    # heavy hitter against the broadcast sketch so a sketch that ever
    # undercounted would emit detail=0 and hash-mismatch the oracle
    import numpy as np
    import pandas as pd

    from propulsion_spark.operators.decontam import _HASH_KEY

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # bounded control-plane scalar
    cm = build_count_min(docs)
    hh = heavy_hitters(docs, min_count=n_docs, cm=cm)
    bc = spark.sparkContext.broadcast((cm.depth, cm.width, cm.data))

    def witness(batches):
        d, w, raw = bc.value
        m = np.frombuffer(raw, dtype=np.int64).reshape(d, w)
        for pdf in batches:
            if not len(pdf):
                continue
            h = pd.util.hash_array(
                pdf["token"].to_numpy(dtype=object), hash_key=_HASH_KEY
            )
            est = CountMinSketch._estimate_hashed(m, h, d, w)
            yield pdf.assign(ok=(est >= pdf["n"].to_numpy()).astype("int64"))

    cmin = (
        hh.mapInPandas(witness, "token string, n long, ok long")
        .select(
            F.lit("cmin").alias("method"),
            F.col("token").alias("event_type"),
            F.col("n").alias("n_kept"),
            F.col("ok").alias("detail"),
            F.col("n").cast("double").alias("est_distinct"),
            F.col("n").alias("exact_distinct"),
        )
    )
    # Z-order layout gauge arm (r10): Morton keys from the layout
    # module's own arithmetic (the code path `layout_zorder` writes
    # with), grouped by the key prefix a range write files on. One
    # map-only key computation + one 64-group aggregate.
    from propulsion_spark.operators.layout import with_zorder_key

    zkeyed = with_zorder_key(
        ev.select("user_id", "value"), ["user_id", "value"], keep_quantized=True
    )
    zarm = (
        zkeyed.groupBy(F.shiftright(F.col("zkey"), _Z_SHIFT).alias("zb"))
        .agg(
            F.count("*").alias("n_kept"),
            F.max("zkey").alias("detail"),
            (
                (
                    (F.max("q_user_id") - F.min("q_user_id") + 1)
                    * (F.max("q_value") - F.min("q_value") + 1)
                ).cast("double")
                / F.lit(_Z_CELLS)
            ).alias("est_distinct"),
            F.countDistinct("zkey").alias("exact_distinct"),
        )
        .select(
            F.lit("zorder").alias("method"),
            F.concat(F.lit("z-"), F.col("zb").cast("string")).alias("event_type"),
            "n_kept",
            "detail",
            "est_distinct",
            "exact_distinct",
        )
    )
    return (
        kmv.unionByName(hll)
        .unionByName(qarms)
        .unionByName(cmin)
        .unionByName(zarm)
    )


# ---- Count-Min sketch (token frequency / heavy hitters) ----------------
# Cormode & Muthukrishnan, "An Improved Data Stream Summary: The
# Count-Min Sketch and its Applications" (J. Algorithms 2005) — public.
# The frequency-side sibling of the decontamination Bloom filter: a
# depth×width counter matrix summarizes token frequencies of an
# arbitrarily large corpus in ONE map-only pass (per-partition numpy
# matrices, O(partitions · depth · width · 8 bytes) driver traffic,
# elementwise-ADD merge), with the classic one-sided guarantee:
# estimate ≥ true count always, overestimate ≤ εN with prob 1−δ for
# width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. Token hashing reuses the
# decontamination module's fixed-key pandas cython hashing, so sketches
# built anywhere (any partitioning, any cluster) are bit-identical.


class CountMinSketch:
    """Immutable depth×width int64 counter matrix over whitespace
    tokens. ``merge`` (elementwise add) of per-subset sketches equals
    the sketch of the union — the mergeability contract of every
    distributed sketch in this module."""

    def __init__(self, depth: int, width: int, data: bytes):
        import numpy as np

        if width <= 0 or width & (width - 1):
            raise ValueError("width must be a positive power of two")
        if len(data) != depth * width * 8:
            raise ValueError(
                f"matrix is {len(data)} bytes, want {depth * width * 8}"
            )
        self.depth = depth
        self.width = width
        self.data = data
        self._m = np.frombuffer(data, dtype=np.int64).reshape(depth, width)

    @staticmethod
    def _rows(h, depth: int, width: int):
        """Per-row bucket indices — the shared Kirsch-Mitzenmacher
        slot rule (``decontam._km_slots``, same as the Bloom filter's
        bit slots)."""
        import numpy as np

        from propulsion_spark.operators.decontam import _km_slots

        return [
            _km_slots(h, i, width).astype(np.int64) for i in range(depth)
        ]

    @staticmethod
    def _estimate_hashed(m, h, depth: int, width: int):
        """min-over-rows estimates for prehashed tokens — the ONE
        kernel shared by :meth:`estimate` and the heavy-hitters
        broadcast prefilter, so the two can never diverge."""
        import numpy as np

        est = None
        for i, idx in enumerate(CountMinSketch._rows(h, depth, width)):
            row = m[i][idx]
            est = row if est is None else np.minimum(est, row)
        return est

    def estimate(self, tokens: "list[str]"):
        """Vectorized point estimates: min over rows. Tokens are
        lowercased to match the build-side tokenizer."""
        import pandas as pd

        from propulsion_spark.operators.decontam import _HASH_KEY

        toks = pd.Series(tokens, dtype=object).str.lower()
        h = pd.util.hash_array(
            toks.to_numpy(dtype=object), hash_key=_HASH_KEY
        )
        return self._estimate_hashed(self._m, h, self.depth, self.width)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("cannot merge sketches with different shapes")
        return CountMinSketch(
            self.depth, self.width, (self._m + other._m).tobytes()
        )

    @property
    def total(self) -> int:
        """N — total tokens counted (any row sums to it)."""
        return int(self._m[0].sum())


def build_count_min(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1 << 16,
) -> CountMinSketch:
    """One distributed pass over the corpus → a :class:`CountMinSketch`
    of whitespace-token frequencies. Map-only: no shuffle, Arrow
    batches, vectorized hashing + ``np.add.at`` scatter; the driver
    sums O(partitions) partial matrices (2 MiB each at the default
    4×65536)."""
    import numpy as np
    import pandas as pd

    from propulsion_spark.operators.decontam import _HASH_KEY, _ws_tokens

    # fail fast: a wrong shape must raise BEFORE the whole-corpus scan,
    # not after it (the constructor re-validates the merged result)
    if width <= 0 or width & (width - 1):
        raise ValueError("width must be a positive power of two")
    if depth < 1:
        raise ValueError("depth must be >= 1")

    def per_partition(batches):
        m = np.zeros((depth, width), dtype=np.int64)
        for pdf in batches:
            # the repo-convention ASCII-whitespace tokenizer (shared
            # with the Bloom path) — pandas' default Unicode split
            # would tokenize differently from Spark's split('\\s+')
            # and break the one-sided estimate ≥ true guarantee for
            # tokens containing non-ASCII whitespace
            toks = _ws_tokens(pdf[text_col])
            if not len(toks):
                continue
            h = pd.util.hash_array(
                toks.to_numpy(dtype=object), hash_key=_HASH_KEY
            )
            for i, idx in enumerate(
                CountMinSketch._rows(h, depth, width)
            ):
                np.add.at(m[i], idx, 1)
        yield pd.DataFrame({"m": [m.tobytes()]})

    parts = (
        docs.select(F.col(text_col).cast("string").alias(text_col))
        .mapInPandas(per_partition, "m binary")
        .collect()
    )
    agg = np.zeros((depth, width), dtype=np.int64)
    for row in parts:
        agg += np.frombuffer(row["m"], dtype=np.int64).reshape(depth, width)
    return CountMinSketch(depth, width, agg.tobytes())


def heavy_hitters(
    docs: DataFrame,
    min_count: int,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1 << 16,
    cm: "CountMinSketch | None" = None,
) -> DataFrame:
    """EXACT counts of every token occurring ≥ ``min_count`` times —
    the two-pass Count-Min pattern that makes a frequency census
    feasible at 100 TB: a full-token groupBy shuffles every token
    occurrence; instead pass 1 builds the sketch (map-only), pass 2
    re-scans with the sketch broadcast and forwards ONLY tokens whose
    estimate reaches the threshold into the groupBy.

    The result is exact, not approximate: the sketch never
    undercounts, so no qualifying token can be filtered out (zero
    false negatives), and overestimated stragglers are exact-counted
    and dropped by the final ``HAVING``. The shuffle shrinks from all
    occurrences to occurrences-of-candidates — for Zipfian token
    distributions and a sane threshold, orders of magnitude. Pass a
    prebuilt ``cm`` to reuse a sketch across thresholds."""
    import numpy as np
    import pandas as pd

    from propulsion_spark.operators.decontam import _HASH_KEY, _ws_tokens

    if cm is None:
        cm = build_count_min(docs, text_col=text_col, depth=depth, width=width)
    spark = docs.sparkSession
    b = spark.sparkContext.broadcast((cm.depth, cm.width, cm.data))

    def per_batch(batches):
        d, w, raw = b.value
        m = np.frombuffer(raw, dtype=np.int64).reshape(d, w)
        for pdf in batches:
            toks = _ws_tokens(pdf[text_col])
            if not len(toks):
                continue
            arr = toks.to_numpy(dtype=object)
            h = pd.util.hash_array(arr, hash_key=_HASH_KEY)
            est = CountMinSketch._estimate_hashed(m, h, d, w)
            keep = est >= min_count
            if keep.any():
                yield pd.DataFrame({"token": arr[keep]})

    survivors = docs.select(
        F.col(text_col).cast("string").alias(text_col)
    ).mapInPandas(per_batch, "token string")
    return (
        survivors.groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
