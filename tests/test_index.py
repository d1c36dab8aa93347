"""CDC span-index tests, mirroring the reference's AppendsEpochTests
(dedup/gap classification, exactly-once re-ingest, epoch close) and
the index-driven source with hydration (S2).
"""

from __future__ import annotations

import pytest

from propulsion_spark.streaming.checkpoints import CheckpointStore
from propulsion_spark.streaming.event_store import EventStoreTable
from propulsion_spark.streaming.index import (
    AppendsIndex,
    decode_checkpoint,
    encode_checkpoint,
    index_source,
)

from test_sources import CollectingSink
from test_streaming_sinks import envelope_rows, mk_df


def spans_df(spark, rows):
    return spark.createDataFrame(
        rows, "stream_name string, span_lo long, span_hi long"
    )


def report_map(df):
    return {r.stream_name: r for r in df.collect()}


@pytest.fixture()
def index(spark, tmp_path):
    return AppendsIndex(spark, str(tmp_path / "index"), max_items_per_epoch=10)


class TestIngestClassification:
    def test_fresh_append(self, spark, index):
        rep = report_map(index.ingest(spans_df(spark, [("user-1", 0, 5)])))
        assert rep["user-1"].verdict == "appended"
        wm = {r.stream_name: r.watermark for r in index.watermarks().collect()}
        assert wm == {"user-1": 5}

    def test_duplicate_discarded(self, spark, index):
        index.ingest(spans_df(spark, [("user-1", 0, 5)]))
        rep = report_map(index.ingest(spans_df(spark, [("user-1", 0, 5)])))
        assert rep["user-1"].verdict == "discarded"
        assert index.read().count() == 1  # exactly-once

    def test_overlap_truncated(self, spark, index):
        index.ingest(spans_df(spark, [("user-1", 0, 5)]))
        rep = report_map(index.ingest(spans_df(spark, [("user-1", 3, 8)])))
        assert rep["user-1"].verdict == "appended"
        assert rep["user-1"].appended_lo == 5
        rows = index.read().filter("stream_name = 'user-1'").orderBy("span_lo").collect()
        assert [(r.span_lo, r.span_hi) for r in rows] == [(0, 5), (5, 8)]

    def test_gap_rejected(self, spark, index):
        index.ingest(spans_df(spark, [("user-1", 0, 3)]))
        rep = report_map(index.ingest(spans_df(spark, [("user-1", 7, 9)])))
        assert rep["user-1"].verdict == "gap"
        wm = {r.stream_name: r.watermark for r in index.watermarks().collect()}
        assert wm == {"user-1": 3}  # unchanged

    def test_epoch_closes_at_cap(self, spark, index):
        index.ingest(spans_df(spark, [("user-1", 0, 6)]))  # epoch 0: 6 items
        index.ingest(spans_df(spark, [("user-2", 0, 6)]))  # epoch 0: 12 ≥ cap
        index.ingest(spans_df(spark, [("user-3", 0, 2)]))  # → epoch 1
        epochs = {r.stream_name: r.epoch for r in index.read().collect()}
        assert epochs == {"user-1": 0, "user-2": 0, "user-3": 1}
        assert index.active_epoch()[0] == 1

    def test_checkpoint_encoding(self):
        pos = encode_checkpoint(3, 1234)
        assert decode_checkpoint(pos) == (3, 1234)


class TestIndexSource:
    def test_hydrating_source_replays_epochs(self, spark, tmp_path):
        store = EventStoreTable(spark, str(tmp_path / "es"))
        store.sync(mk_df(spark, envelope_rows("user-1", 0, 6)))
        store.sync(mk_df(spark, envelope_rows("user-2", 0, 4)))
        index = AppendsIndex(spark, str(tmp_path / "idx"), max_items_per_epoch=6)
        index.ingest(spans_df(spark, [("user-1", 0, 6)]))  # epoch 0 full
        index.ingest(spans_df(spark, [("user-2", 0, 4)]))  # epoch 1
        sink = CollectingSink()
        ckpt = CheckpointStore(str(tmp_path / "ck"), group="g1", commit_interval_s=0)
        src = index_source(spark, index, sink, ckpt, event_store=store)
        src.run_until_caught_up(timeout=120)
        rows = [r for b in sink.batches for r in b]
        assert len(rows) == 10  # fully hydrated bodies
        assert {r.stream_name for r in rows} == {"user-1", "user-2"}
        assert ckpt.position("index", "0") == 2

    def test_index_only_mode(self, spark, tmp_path):
        index = AppendsIndex(spark, str(tmp_path / "idx2"))
        index.ingest(spans_df(spark, [("user-1", 0, 3)]))
        sink = CollectingSink()
        ckpt = CheckpointStore(str(tmp_path / "ck2"), group="g1", commit_interval_s=0)
        src = index_source(spark, index, sink, ckpt, event_store=None)
        src.run_until_caught_up(timeout=60)
        rows = [r for b in sink.batches for r in b]
        assert [(r.stream_name, r.span_lo, r.span_hi) for r in rows] == [("user-1", 0, 3)]

    def test_sink_outcome_indexing(self, spark, tmp_path):
        """DynamoStoreIndexer wiring: StreamsSink outcomes → index spans."""
        from propulsion_spark.streaming import StreamsSink

        def handle(stream, events):
            return "ok", int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(spark, handle, str(tmp_path / "pos"))
        out = sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 4)))
        index = AppendsIndex(spark, str(tmp_path / "idx3"))
        rep = report_map(index.ingest_from_outcomes(out))
        assert rep["user-1"].verdict == "appended"
        rows = index.read().collect()
        assert [(r.span_lo, r.span_hi) for r in rows] == [(0, 4)]
