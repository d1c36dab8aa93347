"""Feed-source lifecycle tests, mirroring the reference's SourceTests
(ref: tests/Propulsion.Tests/SourceTests.fs:23-51): run-to-completion,
stop semantics, checkpoint resume, error retry, and the deterministic
MemorySource wait.
"""

from __future__ import annotations

import threading

import pandas as pd
import pytest

from propulsion_spark.envelope import STREAM_EVENT_SCHEMA
from propulsion_spark.sources import (
    Batch,
    MemorySource,
    PeriodicSource,
    SinglePassFeedSource,
)
from propulsion_spark.streaming import CheckpointStore, StreamsSink
from propulsion_spark.streaming.sinks import OutcomeKind

from test_streaming_sinks import envelope_rows, mk_df


class CollectingSink:
    """Test double: records batches driver-side (no Spark handler)."""

    def __init__(self):
        self.batches = []
        self.lock = threading.Lock()

    def process_batch(self, df, batch_id=0):
        with self.lock:
            self.batches.append(df.collect())


def paged_feed(spark, pages_per_tranche):
    """Feed fixture: dict tranche → list of row-lists."""

    def read_tranches():
        return list(pages_per_tranche)

    def read_page(tranche, pos):
        pages = pages_per_tranche[tranche]
        if pos >= len(pages):
            return Batch(items=None, checkpoint=pos, is_tail=True)
        df = mk_df(spark, pages[pos])
        return Batch(items=df, checkpoint=pos + 1, is_tail=pos + 1 >= len(pages))

    return read_tranches, read_page


class TestSinglePassFeedSource:
    def test_runs_to_completion(self, spark, tmp_path):
        rt, rp = paged_feed(
            spark,
            {
                "0": [envelope_rows("user-1", 0, 3), envelope_rows("user-1", 3, 3)],
                "1": [envelope_rows("user-2", 0, 4)],
            },
        )
        sink = CollectingSink()
        ckpt = CheckpointStore(str(tmp_path / "ck"), group="g1", commit_interval_s=0)
        src = SinglePassFeedSource(spark, rt, rp, sink, ckpt, source_id="t")
        src.run_until_caught_up(timeout=60)
        assert src.ran_to_completion
        assert sum(len(b) for b in sink.batches) == 10
        assert ckpt.position("t", "0") == 2
        assert ckpt.position("t", "1") == 1

    def test_resumes_from_checkpoint(self, spark, tmp_path):
        seen_positions = []

        def read_tranches():
            return ["0"]

        def read_page(tranche, pos):
            seen_positions.append(pos)
            return Batch(items=None, checkpoint=pos, is_tail=True)

        ckpt = CheckpointStore(str(tmp_path / "ck2"), group="g1", commit_interval_s=0)
        ckpt.start("t", "0", 0)
        ckpt.commit("t", "0", 7)
        ckpt.flush()
        src = SinglePassFeedSource(
            spark, read_tranches, read_page, CollectingSink(), ckpt, source_id="t"
        )
        src.run_until_caught_up(timeout=30)
        assert seen_positions == [7]

    def test_read_errors_swallowed_and_retried(self, spark, tmp_path):
        attempts = []

        def read_tranches():
            return ["0"]

        def read_page(tranche, pos):
            attempts.append(pos)
            if len(attempts) == 1:
                raise IOError("transient")
            return Batch(items=None, checkpoint=pos, is_tail=True)

        ckpt = CheckpointStore(str(tmp_path / "ck3"), group="g1", commit_interval_s=0)
        src = SinglePassFeedSource(
            spark, read_tranches, read_page, CollectingSink(), ckpt, source_id="t"
        )
        src.tail_sleep_s = 0.01
        src.run_until_caught_up(timeout=30)
        assert len(attempts) >= 2

    def test_abend_propagates(self, spark, tmp_path):
        def read_tranches():
            return ["0"]

        def read_page(tranche, pos):
            return Batch(items=mk_df(spark, envelope_rows("user-1", 0, 1)), checkpoint=1, is_tail=True)

        class FailingSink:
            def process_batch(self, df, batch_id=0):
                raise RuntimeError("sink exploded")

        ckpt = CheckpointStore(str(tmp_path / "ck4"), group="g1", commit_interval_s=0)
        src = SinglePassFeedSource(
            spark, read_tranches, read_page, FailingSink(), ckpt, source_id="t"
        )
        src.start()
        with pytest.raises(RuntimeError, match="sink exploded"):
            src.await_completion(timeout=30)
        src.stop()


class TestMemorySource:
    def test_deterministic_await(self, spark, tmp_path):
        sink = CollectingSink()
        ckpt = CheckpointStore(str(tmp_path / "ckm"), group="g1", commit_interval_s=0)
        src = MemorySource(spark, sink, ckpt, schema=STREAM_EVENT_SCHEMA)
        src.submit(pd.DataFrame(envelope_rows("user-1", 0, 3)))
        src.start()
        assert src.await_completion(timeout=60)
        assert sum(len(b) for b in sink.batches) == 3
        # submit more after catch-up; await again
        src.submit(pd.DataFrame(envelope_rows("user-1", 3, 2)))
        assert src.await_completion(timeout=60)
        assert sum(len(b) for b in sink.batches) == 5
        src.stop()

    def test_category_filter(self, spark, tmp_path):
        sink = CollectingSink()
        ckpt = CheckpointStore(str(tmp_path / "ckf"), group="g1", commit_interval_s=0)
        src = MemorySource(
            spark, sink, ckpt, schema=STREAM_EVENT_SCHEMA, category_filter="user"
        )
        src.submit(
            pd.DataFrame(envelope_rows("user-1", 0, 2) + envelope_rows("cart-9", 0, 2))
        )
        src.start()
        assert src.await_completion(timeout=60)
        names = {r.stream_name for b in sink.batches for r in b}
        assert names == {"user-1"}
        src.stop()


class TestPeriodicSource:
    def test_recrawl_encodes_wallclock_positions(self, spark, tmp_path):
        sink = CollectingSink()
        ckpt = CheckpointStore(str(tmp_path / "ckp"), group="g1", commit_interval_s=0)

        def crawl(tranche):
            return mk_df(spark, envelope_rows("user-1", 0, 2))

        src = PeriodicSource(
            spark, crawl, sink, ckpt, refresh_interval_s=0.05, source_id="p"
        )
        src.start()
        assert src.await_completion(timeout=60)
        src.stop()
        pos = ckpt.position("p", "0")
        assert pos is not None and pos > 1_000_000_000 * 1_000_000_000  # ns-encoded wall clock
        assert sum(len(b) for b in sink.batches) >= 2


class TestEndToEnd:
    def test_feed_to_streams_sink_with_redelivery(self, spark, tmp_path):
        """The full slice: paged feed → StreamsSink (write-pos dedup) →
        positions + consumer checkpoints; page 2 redelivers page 1."""

        def handle(stream, events):
            return OutcomeKind.OK, int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(spark, handle, str(tmp_path / "pos"))
        pages = {
            "0": [
                envelope_rows("user-1", 0, 4),
                envelope_rows("user-1", 2, 4),  # overlap: idx 2..5
                envelope_rows("user-2", 0, 3),
            ]
        }
        rt, rp = paged_feed(spark, pages)
        ckpt = CheckpointStore(str(tmp_path / "ck"), group="g1", commit_interval_s=0)
        src = SinglePassFeedSource(spark, rt, rp, sink, ckpt, source_id="e2e")
        src.run_until_caught_up(timeout=120)
        pos = {r.stream_name: r.pos for r in sink.positions.read().collect()}
        assert pos == {"user-1": 6, "user-2": 3}
        assert ckpt.position("e2e", "0") == 3
        assert sink.stats.outcomes.get(OutcomeKind.PARTIAL_DUPLICATE, 0) == 1
