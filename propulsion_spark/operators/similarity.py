"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the 100 TB scale path (candidates per hyperplane-sign bucket
instead of a full cross join).

Float determinism vs the oracle: per-element products are computed in
double (IEEE-identical in Spark and DuckDB) and folded left-to-right in
an *intra-row* array fold, the same order in both engines — so the dot
products, cosines, and top-k ranking are bit-identical without decimal
casts (which cost ~10× in interpreter overhead at 48 planes/row). The
only decimal sums left are *cross-row* aggregates (IVF distances),
where Spark's partial-aggregation order is nondeterministic and exact
decimal addition is what makes the sum order-insensitive.

Spark-side the fold is `aggregate(zip_with(...))` — JVM higher-order
functions inside whole-stage codegen, no Python, no explode shuffle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propulsion_spark import load_table
from propulsion_spark.operators import register

DIM = 64
N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5


def _spark_dot(a: str, b: str) -> F.Column:
    # Plain double fold, NOT a decimal one: both engines evaluate the
    # identical float products in the identical left-to-right order, so
    # the sums are bit-identical (verified element-wise at sf0.1) —
    # decimal casts here would only cost ~10× interpreter overhead.
    # The one portability trap is on the DuckDB side: see _duck_dot.
    prods = F.zip_with(
        F.col(a),
        F.col(b),
        lambda x, y: x.cast("double") * y.cast("double"),
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def _duck_dot(a: str, b: str) -> str:
    # list_sum folds left-to-right over the same double products Spark's
    # aggregate() folds — bit-identical by construction. (Bare decimal
    # literals would NOT be: DuckDB parses them as DECIMAL first, 1 ulp
    # off the correctly-rounded double parse — see _plane_sign's e0.)
    return (
        f"list_sum(list_transform(generate_series(1, {DIM}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


_DUCK_NORMED = f"""
normed AS (
  SELECT vec_id, label, embedding,
         sqrt({_duck_dot('embedding', 'embedding')}) AS nrm
  FROM embeddings
)
"""


def _spark_normed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.withColumn("nrm", F.sqrt(_spark_dot("embedding", "embedding")))


# ------------------------------------------------- brute-force top-k
@register(
    "similarity_topk_bruteforce",
    f"""
WITH {_DUCK_NORMED}
SELECT query_id, neighbor_id, rank, cosine
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine,
         CAST(row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) DESC,
                      c.vec_id) AS BIGINT) AS rank
  FROM normed q JOIN normed c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
) WHERE rank <= {TOP_K}
""",
    doc=f"Brute-force cosine top-{TOP_K}: query set broadcast against all "
    "candidates, exact decimal dot products, windowed rank. The "
    "correctness baseline for ANN variants.",
)
def q_similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    normed = _spark_normed(spark, sf_dir)
    q = (
        normed.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    pairs = normed.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cosine = _spark_dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


# ------------------------------------------------ label centroids
_CENTROID_SCALE = 1 << 30  # floor(x·2^30): exact & engine-identical (no
# decimal rounding ties — raw floats are dyadic, their expansions end in 5)


@register(
    "embedding_centroids",
    f"""
SELECT label, CAST(i AS BIGINT) AS dim,
       CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * {_CENTROID_SCALE}) AS BIGINT)) AS DOUBLE)
           / (count(*) * {_CENTROID_SCALE}) AS centroid,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS i) dims
GROUP BY label, i
""",
    doc="Per-label centroids (long form: one row per label×dimension) — "
    "the cluster-statistics shape behind IVF coarse quantizers and "
    "label-conditioned sampling. Components are fixed-point (2^-30 "
    "quantized) so the aggregate is an exact integer sum: deterministic "
    "under any partitioning/ordering. Partial aggregation per dimension.",
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select("label", (F.col("pos") + 1).cast("long").alias("dim"), "x")
    scaled = F.floor(F.col("x").cast("double") * _CENTROID_SCALE).cast("long")
    return exploded.groupBy("label", "dim").agg(
        (
            F.sum(scaled).cast("double") / (F.count("*") * _CENTROID_SCALE)
        ).alias("centroid"),
        F.count("*").alias("n_vecs"),
    )


# ------------------------------------------------ kNN classification
@register(
    "embedding_knn_classify",
    f"""
WITH {_DUCK_NORMED},
topk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) DESC,
                        c.vec_id) AS BIGINT) AS rank
    FROM normed q JOIN normed c ON c.vec_id != q.vec_id
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rank <= {TOP_K}
)
SELECT query_id, CAST(label AS BIGINT) AS predicted_label, CAST(votes AS BIGINT) AS votes
FROM (
  SELECT query_id, e.label, count(*) AS votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY count(*) DESC, e.label) AS rn
  FROM topk JOIN embeddings e ON e.vec_id = neighbor_id
  GROUP BY query_id, e.label
) WHERE rn = 1
""",
    doc=f"kNN classification: majority label among the top-{TOP_K} cosine "
    "neighbors (ties → lowest label). The label-propagation shape for "
    "semi-supervised corpus tagging.",
)
def q_embedding_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    topk = q_similarity_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    labels = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"), "label"
    )
    votes = (
        topk.join(F.broadcast(labels), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("label").cast("long").alias("predicted_label"),
            F.col("votes").cast("long").alias("votes"),
        )
    )


# ------------------------------------- LSH-bucketed ANN (scale path)
# Multi-table random-hyperplane LSH: L tables of k sign bits each. A
# pair is a candidate when co-bucketed in ANY table — recall
# 1-(1-p^k)^L where p = 1 - θ/π, the standard tunable ANN structure
# (one table of many bits has near-zero recall on small cells).
#
# Parameter rule for corpus size n (see lsh_params): bits-per-table k
# must grow with n to keep buckets bounded (k ≈ log2(n / target bucket
# size)), and tables L buys recall back (L ≈ ln(1-R) / ln(1-p^k)). The
# defaults below measure recall@5 = 0.88 at sf0.1 / 0.80 at sf0.01 on
# the synthetic corpus — near-iid-random embeddings, ANN's worst case;
# real embedding corpora cluster, so p is higher and fewer tables reach
# the same recall.
N_TABLES = 12
BITS_PER_TABLE = 4
N_PLANES = N_TABLES * BITS_PER_TABLE


def lsh_params(n: int, target_bucket: int = 256, recall: float = 0.8,
               p_bit: float = 0.75) -> tuple[int, int]:
    """Scale-aware (tables, bits) for a corpus of ``n`` vectors.

    ``k = log2(n / target_bucket)`` keeps per-table buckets at
    ~target_bucket vectors so the per-table self-join stays
    O(n · target_bucket) at any scale (the 100 TB rule: bucket count
    grows with n, bucket size does not). ``L`` then restores the recall
    target given the per-bit collision probability ``p_bit`` of a
    true-neighbor pair (1 - θ/π; ~0.75 for cos θ ≈ 0.7 neighbors).
    """
    import math

    k = max(3, math.ceil(math.log2(max(2, n / target_bucket))))
    p_all = p_bit**k
    L = max(1, math.ceil(math.log(1 - recall) / math.log(1 - p_all)))
    return L, k
# Deterministic pseudo-random hyperplanes, shared by both engines:
# INTEGER weight w(p,d) = md5("plane-p-d") % 2001 - 1000 ∈ [-1000, 1000].
# Embeddings are quantized once to integers floor(x · 2^20), so every
# plane dot Σ floor(x·2^20)·w is EXACT integer arithmetic (|Σ| ≤
# 64·2^20·1000 < 2^53): order-independent, which frees each engine to
# use its fastest evaluation — numpy matmul on the Spark side
# (Arrow-vectorized), a relational join+sum on the DuckDB side — with
# bit-identical buckets guaranteed by exactness, not by matching fold
# order. The 2^-20 quantization can only flip signs where the true
# |dot| < 64·1000·2^-20 ≈ 0.06 — immaterial to ANN recall.
_W1000 = [
    [
        int.from_bytes(hashlib.md5(f"plane-{p}-{d}".encode()).digest()[:8], "big")
        % 2001
        - 1000
        for d in range(DIM)
    ]
    for p in range(N_PLANES)
]
_EMB_SCALE = 1 << 20

_buckets_udf = None


def _lsh_buckets_udf():
    """Vectorized bucket-id computation: one Arrow batch in, one
    (n, N_PLANES) float64 matmul (exact — every operand and partial is
    an integer < 2^53), bit-packed into N_TABLES bucket ids per row.
    The only Python on the LSH path, and it is numpy-vectorized — the
    same mapInArrow/pandas_udf shape a real embedding scorer takes at
    100 TB, vs 48 interpreted HOF folds per row which dominated
    wall-clock when this was pure SQL expressions."""
    global _buckets_udf
    if _buckets_udf is None:
        import numpy as np
        import pandas as pd

        W = np.array(_W1000, dtype=np.float64)
        pow2 = np.array([1 << b for b in range(BITS_PER_TABLE)], dtype=np.int64)

        def buckets(emb):
            if len(emb) == 0:
                return pd.Series([], dtype=object)
            X = np.floor(np.stack(emb.values).astype(np.float64) * _EMB_SCALE)
            S = (X @ W.T) > 0
            B = (S.reshape(len(X), N_TABLES, BITS_PER_TABLE) * pow2).sum(axis=2)
            return pd.Series(list(B.astype(np.int64)))

        # explicit annotations: the module's `from __future__ import
        # annotations` would stringify inline ones, which pandas_udf
        # can't interpret
        buckets.__annotations__ = {"emb": pd.Series, "return": pd.Series}
        _buckets_udf = F.pandas_udf(buckets, "array<bigint>")
    return _buckets_udf


def _spark_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normed + ``bks array<bigint>`` (one bucket id per LSH table),
    persisted — plane dots are computed once; every candidate join
    reads this twice."""
    df = _spark_normed(spark, sf_dir)
    return df.withColumn("bks", _lsh_buckets_udf()("embedding")).persist()


def _spark_tb_pairs(bucketed: DataFrame) -> DataFrame:
    """(vec_id, t, bk): one row per (vector, table) — candidate
    generation is then ONE equi-join on (t, bk) instead of N_TABLES
    separate join branches (identical candidate set; at scale one
    shuffle keyed by (table, bucket) instead of N_TABLES shuffles)."""
    return bucketed.select("vec_id", F.posexplode("bks").alias("t", "bk"))


_DUCK_TB = f"""
planes AS (
  SELECT p, d,
         CAST(CAST(('0x' || substr(md5('plane-' || p || '-' || d), 1, 16)) AS UBIGINT)
              % 2001 AS BIGINT) - 1000 AS w
  FROM generate_series(0, {N_PLANES - 1}) g1(p), generate_series(0, {DIM - 1}) g2(d)
),
sx AS (
  SELECT vec_id, i - 1 AS d,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_EMB_SCALE}) AS BIGINT) AS x
  FROM embeddings, generate_series(1, {DIM}) g(i)
),
dots AS (
  SELECT vec_id, p, sum(x * w) AS dot
  FROM sx JOIN planes USING (d) GROUP BY vec_id, p
),
tb AS (
  SELECT vec_id, CAST(p // {BITS_PER_TABLE} AS BIGINT) AS t,
         CAST(sum(CASE WHEN dot > 0 THEN 1 << (p % {BITS_PER_TABLE}) ELSE 0 END)
              AS BIGINT) AS bk
  FROM dots GROUP BY vec_id, p // {BITS_PER_TABLE}
)
"""


def q_similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH bucketing: N_TABLES × BITS_PER_TABLE hyperplane
    sign bits, one bucket-id column per table. Map-only; at scale each
    table's bucket id is the shuffle key for candidate generation.
    Oracle-verified through ``similarity_lsh_topk`` /
    ``similarity_lsh_recall`` (whose oracles recompute every bucket
    from scratch)."""
    b = _spark_bucketed(spark, sf_dir)
    return b.select(
        "vec_id",
        *[F.element_at(F.col("bks"), t + 1).alias(f"b{t}") for t in range(N_TABLES)],
    )


def _spark_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (query_id, neighbor_id) co-bucketed in any table: one
    equi-join on the composite (table, bucket) key (never an OR join —
    and never a union of per-table joins, which costs N_TABLES plan
    branches and shuffles for the same candidate set)."""
    tb = _spark_tb_pairs(_spark_bucketed(spark, sf_dir))
    q = tb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "t", "bk"
    )
    return (
        q.join(tb, ["t", "bk"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )


_DUCK_LSH_CANDS = f"""
cands AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM tb a JOIN tb b ON a.t = b.t AND a.bk = b.bk AND a.vec_id != b.vec_id
  WHERE a.vec_id < {N_QUERIES}
)
"""

_DUCK_ANN_TOPK = f"""
  SELECT query_id, neighbor_id, rank, cosine FROM (
    SELECT query_id, neighbor_id,
           {_duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {_duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) DESC,
                        neighbor_id) AS BIGINT) AS rank
    FROM cands JOIN normed q ON q.vec_id = query_id
               JOIN normed c ON c.vec_id = neighbor_id
  ) WHERE rank <= {TOP_K}
"""


@register(
    "similarity_lsh_topk",
    f"""
WITH {_DUCK_NORMED},
{_DUCK_TB.strip()},
{_DUCK_LSH_CANDS.strip()}
{_DUCK_ANN_TOPK}
""",
    doc="ANN top-k over multi-table LSH candidates: one equi-join on the "
    "(table, bucket) key generates candidates (O(n·bucket) per table), "
    "exact cosine ranks them. Recall vs similarity_topk_bruteforce.",
)
def q_similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cands = _spark_lsh_candidates(spark, sf_dir)
    normed = _spark_normed(spark, sf_dir)
    q = normed.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = normed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cosine = _spark_dot("q_emb", "c_emb") / (F.col("q_nrm") * F.col("c_nrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cands.join(q, "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


_BF_SUBQUERY = f"""
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) DESC,
                        c.vec_id) AS BIGINT) AS rank
    FROM normed q JOIN normed c ON c.vec_id != q.vec_id
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rank <= {TOP_K}
"""


@register(
    "similarity_lsh_recall",
    f"""
WITH {_DUCK_NORMED},
{_DUCK_TB.strip()},
{_DUCK_LSH_CANDS.strip()},
bf AS ({_BF_SUBQUERY}),
ann AS ({_DUCK_ANN_TOPK})
SELECT bf.query_id,
       CAST(count(ann.neighbor_id) AS BIGINT) AS n_hit,
       count(ann.neighbor_id) / {TOP_K} AS recall
FROM bf LEFT JOIN ann USING (query_id, neighbor_id)
GROUP BY bf.query_id
""",
    doc=f"ANN quality gauge: recall@{TOP_K} of the multi-table LSH search "
    "vs the brute-force ground truth — the measurement every approximate "
    "index must report before it replaces the exact path.",
)
def q_similarity_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = q_similarity_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    ann = q_similarity_lsh_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("ann_neighbor")
    )
    joined = bf.join(
        ann,
        (bf.query_id == ann.query_id) & (bf.neighbor_id == ann.ann_neighbor),
        "left",
    ).select(bf.query_id, "ann_neighbor")
    return joined.groupBy("query_id").agg(
        F.count("ann_neighbor").alias("n_hit"),
        (F.count("ann_neighbor") / TOP_K).alias("recall"),
    )


# ------------------------------------- embedding-cosine near-dup
NEAR_DUP_COSINE = 0.35  # synthetic corpus: ~99.9th pct of pair similarity


@register(
    "dedup_embedding_cosine",
    f"""
WITH {_DUCK_NORMED},
{_DUCK_TB.strip()},
pair_cands AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM tb a JOIN tb b ON a.t = b.t AND a.bk = b.bk AND a.vec_id < b.vec_id
)
SELECT a_id, b_id,
       {_duck_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
FROM pair_cands JOIN normed a ON a.vec_id = a_id JOIN normed b ON b.vec_id = b_id
WHERE {_duck_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {NEAR_DUP_COSINE}
""",
    doc=f"Embedding-space near-duplicate pairs: cosine >= {NEAR_DUP_COSINE} "
    "among multi-table LSH candidates — semantic dedup for a 100 TB corpus "
    "(candidates per bucket, O(n·bucket) not O(n²)).",
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    tb = _spark_tb_pairs(_spark_bucketed(spark, sf_dir))
    a = tb.select(F.col("vec_id").alias("a_id"), "t", "bk")
    b = tb.select(F.col("vec_id").alias("b_id"), "t", "bk")
    cands = (
        a.join(b, ["t", "bk"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    normed = _spark_normed(spark, sf_dir)
    a = normed.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = normed.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    cosine = _spark_dot("a_emb", "b_emb") / (F.col("a_nrm") * F.col("b_nrm"))
    return (
        cands.join(a, "a_id")
        .join(b, "b_id")
        .select("a_id", "b_id", cosine.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
    )


# ------------------------------------------------- IVF-style ANN
_DUCK_IVF_CELLS = f"""
dims AS (SELECT unnest(generate_series(1, {DIM})) AS dim),
cent AS (
  SELECT label, dim,
         CAST(sum(CAST(floor(CAST(embedding[dim] AS DOUBLE) * {_CENTROID_SCALE}) AS BIGINT)) AS DOUBLE)
             / (count(*) * {_CENTROID_SCALE}) AS c
  FROM embeddings CROSS JOIN dims GROUP BY label, dim
),
expl AS (
  SELECT vec_id, dim, CAST(embedding[dim] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN dims
),
dist AS (
  SELECT vec_id, label,
         CAST(sum(CAST((x - c) * (x - c) AS DECIMAL(20,12))) AS DOUBLE) AS d2
  FROM expl JOIN cent USING (dim) GROUP BY vec_id, label
),
cells AS (
  SELECT vec_id, label AS cell FROM (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
    FROM dist
  ) WHERE rn = 1
)
"""


@register(
    "similarity_ivf_topk",
    f"""
WITH {_DUCK_NORMED},
{_DUCK_IVF_CELLS.strip()}
SELECT query_id, neighbor_id, rank, cosine
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine,
         CAST(row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) DESC,
                      c.vec_id) AS BIGINT) AS rank
  FROM (SELECT n.*, cl.cell FROM normed n JOIN cells cl USING (vec_id)) q
  JOIN (SELECT n.*, cl.cell FROM normed n JOIN cells cl USING (vec_id)) c
    ON c.vec_id != q.vec_id AND c.cell = q.cell
  WHERE q.vec_id < {N_QUERIES}
) WHERE rank <= {TOP_K}
""",
    doc="IVF-style ANN: vectors are assigned to the nearest coarse-codebook "
    "centroid cell (codebook = deterministic per-label centroids, standing "
    "in for a trained k-means — the assignment/cell-probe plumbing is the "
    "real IVF shape), and each query probes only its own cell. Work is "
    "O(n·cell_size); the join shuffles on cell id. Complements the "
    "hyperplane-LSH variant; recall measured against the brute force.",
)
def q_similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent = q_embedding_centroids(spark, sf_dir).select(
        "label", "dim", F.col("centroid").alias("c")
    )
    expl = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    diff = F.col("x") - F.col("c")
    dist = (
        expl.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label")
        .agg(
            F.sum((diff * diff).cast("decimal(20,12)")).cast("double").alias("d2")
        )
    )
    w_cell = Window.partitionBy("vec_id").orderBy(F.col("d2"), F.col("label"))
    cells = (
        dist.withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("label").alias("cell"))
    )
    normed = _spark_normed(spark, sf_dir).join(cells, "vec_id")
    q = normed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("cell").alias("q_cell"),
    )
    pairs = normed.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("query_id")) & (F.col("cell") == F.col("q_cell")),
    )
    cosine = _spark_dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )
