"""Round-9 operators: SemDeDup (embedding-cluster semantic dedup,
Abbas et al. 2023), BM25 lexical ranking, priority sampling and the
fuzzy edit-distance join."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from propulsion_spark.operators.similarity import (
    SEMDEDUP_COS,
    _spark_dot,
    _spark_ivf_cells,
    semdedup_verdicts,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _normed(spark, rows):
    """rows: (vec_id, [floats]) → the (vec_id, embedding, nrm) shape
    semdedup_verdicts consumes."""
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]),
        "vec_id long, embedding array<float>",
    )
    return df.withColumn("nrm", F.sqrt(_spark_dot("embedding", "embedding")))


def _cells(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["vec_id", "cell"]),
        "vec_id long, cell int",
    )


class TestSemDeDup:
    def test_duplicate_dropped_with_lowest_witness(self, spark):
        normed = _normed(
            spark,
            [
                (1, [1.0, 0.0, 0.0]),
                (2, [2.0, 0.0, 0.0]),  # same direction as 1 → cos 1.0
                (3, [0.0, 1.0, 0.0]),  # orthogonal → kept
            ],
        )
        cells = _cells(spark, [(1, 0), (2, 0), (3, 0)])
        out = {r["b_id"]: r for r in semdedup_verdicts(normed, cells).collect()}
        assert set(out) == {2}
        assert out[2]["a_id"] == 1
        assert out[2]["cosine"] == 1.0

    def test_cluster_boundary_bounds_the_pair_space(self, spark):
        """Identical vectors in DIFFERENT cells are never compared —
        the pair space is O(Σ cell²), the paper's scaling trick."""
        normed = _normed(
            spark, [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])]
        )
        cells = _cells(spark, [(1, 0), (2, 1), (3, 1)])
        out = {r["b_id"]: r for r in semdedup_verdicts(normed, cells).collect()}
        assert set(out) == {3}  # only the in-cell (2,3) pair fires
        assert out[3]["a_id"] == 2

    def test_epsilon_group_keeps_exactly_one(self, spark):
        """A triple of copies yields two drops, both witnessed by the
        lowest id (ties on cosine resolve to the smallest witness)."""
        normed = _normed(
            spark,
            [(1, [1.0, 1.0]), (2, [2.0, 2.0]), (5, [3.0, 3.0])],
        )
        cells = _cells(spark, [(1, 0), (2, 0), (5, 0)])
        out = {r["b_id"]: r["a_id"] for r in semdedup_verdicts(normed, cells).collect()}
        assert out == {2: 1, 5: 1}

    def test_threshold_respected(self, spark):
        normed = _normed(spark, [(1, [1.0, 0.0]), (2, [1.0, 1.0])])  # cos ≈ .707
        cells = _cells(spark, [(1, 0), (2, 0)])
        assert semdedup_verdicts(normed, cells, threshold=0.8).count() == 0
        assert semdedup_verdicts(normed, cells, threshold=0.7).count() == 1

    def test_partition_invariant(self, spark):
        normed = _normed(
            spark,
            [(i, [float(i % 7 + 1), float(i % 3), 1.0]) for i in range(40)],
        )
        cells = _cells(spark, [(i, i % 4) for i in range(40)])
        a = sorted(
            map(tuple, semdedup_verdicts(normed, cells).collect())
        )
        b = sorted(
            map(
                tuple,
                semdedup_verdicts(
                    normed.repartition(7), cells.repartition(3)
                ).collect(),
            )
        )
        assert a == b and len(a) > 0

    def test_ivf_cells_assign_every_vector_once(self, spark):
        cells = _spark_ivf_cells(spark, SF_SMOKE)
        n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
        assert cells.count() == n_vecs
        assert cells.select("vec_id").distinct().count() == n_vecs

    def test_merged_report_carries_both_arms(self, spark):
        from propulsion_spark.operators.similarity import (
            q_dedup_embedding_cosine,
        )

        rows = q_dedup_embedding_cosine(spark, SF_SMOKE).collect()
        methods = {r["method"] for r in rows}
        assert methods <= {"lsh_pairs", "semdedup"}
        # every semdedup verdict is above its threshold and keeps a
        # lower-id witness
        for r in rows:
            if r["method"] == "semdedup":
                assert r["cosine"] >= SEMDEDUP_COS
                assert r["a_id"] < r["b_id"]
