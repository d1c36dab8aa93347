"""Change-feed analog over an append-only parquet directory
(SURVEY.md §2.1 S1; ref: src/Propulsion.CosmosStore/CosmosStoreSource.fs).

The CosmosDB change feed is "tail everything appended to the store,
partitioned, with manual checkpoints". Without Delta CDF in this
environment, the honest Spark analog is the Structured Streaming file
source over a directory that writers append parquet files to: each
discovered file becomes part of a micro-batch, `maxFilesPerTrigger`
is the read-ahead knob, and Spark's offset log (file list) plays the
lease/continuation-token role.

``changefeed_stream`` returns the streaming envelope DataFrame; pair it
with ``StreamsSink.run_stream`` or ``stateful_stream``. For consumers
that need the consumer-group table instead of Spark's checkpoint dir,
``ChangeFeedSource`` wraps the same directory as a paged feed (page =
new files since last position by modification order).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from propulsion_spark.envelope import STREAM_EVENT_SCHEMA
from propulsion_spark.sources.feed import Batch, FeedSource
from propulsion_spark.streaming.checkpoints import CheckpointStore


def changefeed_stream(
    spark: SparkSession,
    path: str,
    schema=STREAM_EVENT_SCHEMA,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Structured-Streaming tail of an append-only parquet directory."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


class ChangeFeedSource(FeedSource):
    """Paged-feed variant: one page = the next appended file (ordered by
    (mtime, name)); position = number of files consumed. Lets the
    consumer-group CheckpointStore own progress instead of Spark's
    checkpoint directory."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        sink,
        checkpoints: CheckpointStore,
        schema=STREAM_EVENT_SCHEMA,
        source_id: str = "changefeed",
        tail_sleep_s: float = 1.0,  # ref: CosmosStoreSource.fs:55
        stop_at_tail: bool = False,
    ):
        self.dir_path = path
        self.schema = schema
        super().__init__(
            spark, lambda: ["0"], self._read_page, sink, checkpoints, source_id=source_id
        )
        self.tail_sleep_s = tail_sleep_s
        self.stop_at_tail = stop_at_tail

    def _ordered_files(self) -> list[str]:
        entries = [
            os.path.join(self.dir_path, f)
            for f in os.listdir(self.dir_path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        return sorted(entries, key=lambda p: (os.path.getmtime(p), p))

    def _read_page(self, tranche: str, pos: int) -> Batch:
        files = self._ordered_files()
        if pos >= len(files):
            return Batch(items=None, checkpoint=pos, is_tail=True)
        df = self.spark.read.schema(self.schema).parquet(files[pos])
        return Batch(items=df, checkpoint=pos + 1, is_tail=pos + 1 >= len(files))
