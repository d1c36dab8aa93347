"""Capstone composition: the full reaction-pipeline loop the reference
was built for (SURVEY §3.1/§3.3), all through the public API —

  change-feed dir → StreamsSink (ordered, deduped) → EventStoreTable
  (idempotent write) → AppendsIndex (CDC spans, exactly-once) →
  index_source (hydrating) → second consumer builds a derived view,
  with both consumers checkpointing in the same consumer-group store.
"""

from __future__ import annotations

import pandas as pd

from propulsion_spark.sources.parquet_feed import ChangeFeedSource
from propulsion_spark.streaming import CheckpointStore, StreamsSink
from propulsion_spark.streaming.event_store import EventStoreTable
from propulsion_spark.streaming.index import AppendsIndex, index_source

from test_streaming_sinks import envelope_rows, mk_df


class TestReactionPipeline:
    def test_full_loop(self, spark, tmp_path):
        feed_dir = tmp_path / "feed"
        feed_dir.mkdir()
        store = EventStoreTable(spark, str(tmp_path / "store"))
        index = AppendsIndex(spark, str(tmp_path / "index"), max_items_per_epoch=6)

        # ---- stage 1: change feed → sink → event store + CDC index ----
        class StoreAndIndexSink:
            """handle = idempotent store write; outcomes feed the index
            (DynamoStoreIndexer wiring)."""

            def __init__(self):
                self.outcomes = []

            def process_batch(self, df, batch_id=0):
                report = store.sync(df)
                rows = report.collect()
                self.outcomes.extend(rows)
                spans = spark.createDataFrame(
                    [
                        (r.stream_name, r.prev_tail, r.new_tail)
                        for r in rows
                        if r.appended > 0
                    ]
                    or [],
                    "stream_name string, span_lo long, span_hi long",
                )
                if spans.count():
                    index.ingest(spans)

        sink1 = StoreAndIndexSink()
        ckpt = CheckpointStore(str(tmp_path / "ck"), group="writer", commit_interval_s=0)
        # two appended files, the second partially redelivers the first
        mk_df(spark, envelope_rows("user-1", 0, 4) + envelope_rows("user-2", 0, 3)).coalesce(
            1
        ).write.mode("append").parquet(str(feed_dir))
        mk_df(spark, envelope_rows("user-1", 2, 4)).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed_dir))
        src = ChangeFeedSource(
            spark, str(feed_dir), sink1, ckpt, stop_at_tail=True
        )
        src.run_until_caught_up(timeout=180)

        # store is exactly-once despite the overlap
        stored = sorted((r.stream_name, r.idx) for r in store.read().collect())
        assert stored == [("user-1", i) for i in range(6)] + [
            ("user-2", i) for i in range(3)
        ]
        # index recorded the appends across epochs (cap 6 → 2 epochs)
        spans = sorted(
            (r.stream_name, r.span_lo, r.span_hi) for r in index.read().collect()
        )
        assert spans == [("user-1", 0, 4), ("user-1", 4, 6), ("user-2", 0, 3)]

        # ---- stage 2: index-driven consumer builds a derived view ----
        view = {}

        class ViewSink:
            def process_batch(self, df, batch_id=0):
                for r in (
                    df.groupBy("stream_name").count().collect()
                ):
                    view[r.stream_name] = view.get(r.stream_name, 0) + r["count"]

        ckpt2 = CheckpointStore(str(tmp_path / "ck"), group="reader", commit_interval_s=0)
        src2 = index_source(
            spark, index, ViewSink(), ckpt2, event_store=store, source_id="idx"
        )
        src2.run_until_caught_up(timeout=180)
        assert view == {"user-1": 6, "user-2": 3}
        # consumer groups isolated in one store: writer vs reader cursors
        assert ckpt.position("changefeed", "0") == 2
        assert ckpt2.position("idx", "0") == index.active_epoch()[0] + 1
