"""BackfillSource chunked replay (S13 analog), RenderedSummary codec
(F7), latency stats, and unfolds through the stateful kernel."""

from __future__ import annotations

import json

import pytest

from propulsion_spark.functions.codec import render_summary
from propulsion_spark.sources.backfill import backfill_event_store
from propulsion_spark.streaming import CheckpointStore, StreamsSink
from propulsion_spark.streaming.event_store import EventStoreTable

from test_sources import CollectingSink
from test_streaming_sinks import envelope_rows, mk_df


class TestBackfill:
    def test_chunked_ordered_replay(self, spark, tmp_path):
        store = EventStoreTable(spark, str(tmp_path / "es"))
        store.sync(mk_df(spark, envelope_rows("user-1", 0, 10)))
        sink = CollectingSink()
        ckpt = CheckpointStore(str(tmp_path / "ck"), group="g", commit_interval_s=0)
        src = backfill_event_store(spark, store, sink, ckpt, chunk_size=4)
        assert src.n_chunks == 3  # 10 events / 4 per chunk
        src.run_until_caught_up(timeout=120)
        # chunks delivered strictly in order, all events exactly once
        per_batch = [sorted(r.event_id for r in b) for b in sink.batches]
        assert per_batch == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
        assert ckpt.position("backfill", "0") == 3

    def test_resume_at_chunk_boundary(self, spark, tmp_path):
        store = EventStoreTable(spark, str(tmp_path / "es2"))
        store.sync(mk_df(spark, envelope_rows("user-1", 0, 10)))
        ckpt = CheckpointStore(str(tmp_path / "ck2"), group="g", commit_interval_s=0)
        ckpt.start("backfill", "0", 0)
        ckpt.commit("backfill", "0", 2)
        ckpt.flush()
        sink = CollectingSink()
        src = backfill_event_store(spark, store, sink, ckpt, chunk_size=4)
        src.run_until_caught_up(timeout=60)
        assert [sorted(r.event_id for r in b) for b in sink.batches] == [[8, 9]]


class TestRenderedSummary:
    def test_freshest_unfolds_only(self, spark):
        rows = envelope_rows("user-1", 0, 3)
        old_unfold = envelope_rows("user-1", 1, 1)
        new_unfolds = envelope_rows("user-1", 2, 1) + envelope_rows("user-1", 2, 1)
        for i, u in enumerate(old_unfold + new_unfolds):
            u["is_unfold"] = True
            u["event_type"] = f"Snap{i}"
        df = mk_df(spark, rows + old_unfold + new_unfolds)
        msgs = render_summary(df).collect()
        assert len(msgs) == 1
        payload = json.loads(msgs[0].value)
        assert payload["s"] == "user-1" and payload["i"] == 2
        assert sorted(u["c"] for u in payload["u"]) == ["Snap1", "Snap2"]


class TestLatencyStats:
    def test_latency_recorded_per_outcome(self, spark, tmp_path):
        def handle(stream, events):
            return "ok", int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(spark, handle, str(tmp_path / "pos"))
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 3)))
        lat = sink.stats.as_dict()["latency_ms"]
        assert "ok" in lat and lat["ok"]["max"] >= 0.0 and lat["ok"]["avg"] >= 0.0


class TestStatefulUnfolds:
    def test_unfolds_ride_dispatch(self, spark, tmp_path):
        from test_state_kernel import StreamHarness

        h = StreamHarness(spark, tmp_path)
        rows = envelope_rows("user-1", 0, 3)
        unfold = envelope_rows("user-1", 2, 1)
        unfold[0]["is_unfold"] = True
        unfold[0]["event_type"] = "Snapshot"
        h.push(rows + unfold)
        out = h.outcomes()[-1]
        # 3 events + the riding unfold dispatched together
        assert out["outcome"] == "ok"
        assert out["dispatched"] == 4
        assert out["write_pos"] == 3
        h.stop()
