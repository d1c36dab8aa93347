"""Striped backfill — bounded catch-up over a historical range
(SURVEY.md §2.1 S13; ref: src/Propulsion.EventStore/EventStoreReader.fs:94-107
chunk math + StripedIngester.fs series re-serialization).

The reference stripes the EventStoreDB ``$all`` log into 256 MiB chunks
read by concurrent readers, then re-serializes chunk results in order.
The Spark translation: the historical range is partitioned into offset
windows (chunks); each *page* is one window, scanned as a distributed
job (Spark's parallel scan partitions are the intra-chunk stripes), and
pages are delivered strictly in order — parallel inside a chunk,
serialized across chunks, exactly the reference's contract. Positions
are window ordinals, so an interrupted backfill resumes at the chunk
boundary.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propulsion_spark.sources.feed import Batch, SinglePassFeedSource
from propulsion_spark.streaming.checkpoints import CheckpointStore


class BackfillSource(SinglePassFeedSource):
    """Replays ``read_range(lo, hi)`` windows of a bounded offset domain
    ``[min_offset, max_offset]`` in chunk order."""

    def __init__(
        self,
        spark: SparkSession,
        read_range: Callable[[int, int], DataFrame],
        min_offset: int,
        max_offset: int,
        chunk_size: int,
        sink,
        checkpoints: CheckpointStore,
        source_id: str = "backfill",
    ):
        self.read_range = read_range
        self.min_offset = min_offset
        self.max_offset = max_offset
        self.chunk_size = chunk_size
        n = max(0, max_offset - min_offset + 1)
        self.n_chunks = (n + chunk_size - 1) // chunk_size
        super().__init__(
            spark, lambda: ["0"], self._read_page, sink, checkpoints, source_id=source_id
        )

    def chunk_bounds(self, chunk: int) -> tuple[int, int]:
        lo = self.min_offset + chunk * self.chunk_size
        return lo, min(lo + self.chunk_size, self.max_offset + 1)

    def _read_page(self, tranche: str, pos: int) -> Batch:
        if pos >= self.n_chunks:
            return Batch(items=None, checkpoint=pos, is_tail=True)
        lo, hi = self.chunk_bounds(pos)
        df = self.read_range(lo, hi)
        return Batch(items=df, checkpoint=pos + 1, is_tail=pos + 1 >= self.n_chunks)


def backfill_event_store(
    spark: SparkSession,
    store,
    sink,
    checkpoints: CheckpointStore,
    chunk_size: int = 100_000,
    source_id: str = "backfill",
) -> BackfillSource:
    """Backfill an EventStoreTable's history by event_id windows; each
    chunk's scan pushes the range predicate to parquet."""
    bounds = store.read().agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    ).collect()[0]
    lo = int(bounds.lo) if bounds.lo is not None else 0
    hi = int(bounds.hi) if bounds.hi is not None else -1

    def read_range(a: int, b: int) -> DataFrame:
        return store.read().filter(
            (F.col("event_id") >= a) & (F.col("event_id") < b)
        )

    return BackfillSource(
        spark, read_range, lo, hi, chunk_size, sink, checkpoints, source_id=source_id
    )
