"""MemorySource — deterministic in-memory feed for tests
(SURVEY.md §2.1 S12; ref: src/Propulsion.MemoryStore/MemoryStoreSource.fs:10-74).

The reference subscribes to an in-memory store's committed events with
deterministic epoch numbering and an ``AwaitCompletion`` that makes
reaction tests flake-free (ref: :87-131). Here: the test submits
pandas/Rows batches, each becomes one feed page (epoch = arrival
number), and ``await_completion`` from the base class waits until the
sink has finished everything submitted — the ``processAllAvailable``
analog.
"""

from __future__ import annotations

import threading
from typing import Optional

import pandas as pd
from pyspark.sql import SparkSession

from propulsion_spark.sources.feed import Batch, FeedSource
from propulsion_spark.streaming.checkpoints import CheckpointStore


class MemorySource(FeedSource):
    tail_sleep_s = 0.02

    def __init__(
        self,
        spark: SparkSession,
        sink,
        checkpoints: CheckpointStore,
        schema=None,
        category_filter: Optional[str] = None,
        source_id: str = "memory",
    ):
        self.schema = schema
        self.category_filter = category_filter
        self._lock = threading.Lock()
        self._submitted: list[pd.DataFrame] = []
        self._completed_epoch = -1
        super().__init__(
            spark,
            lambda: ["0"],
            self._read_page,
            sink,
            checkpoints,
            source_id=source_id,
        )

    # ---- test surface ---------------------------------------------------
    def submit(self, rows) -> int:
        """Submit one batch (list of dicts or pandas DataFrame); returns
        its epoch (deterministic arrival number)."""
        pdf = rows if isinstance(rows, pd.DataFrame) else pd.DataFrame(rows)
        with self._lock:
            self._submitted.append(pdf)
            return len(self._submitted) - 1

    def await_completion(self, timeout: float = 60.0) -> bool:
        """Deterministic wait: every submitted epoch processed AND the
        pump observed the tail (ref: MemoryStoreSource.fs:87-124)."""
        import time

        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if self._exceptions:
                raise self._exceptions[0]
            st = self.tranches.get("0")
            with self._lock:
                n = len(self._submitted)
            if st is not None and st.reached_tail and st.pos >= n:
                self.checkpoints.flush(force=True)
                return True
            time.sleep(0.02)
        return False

    # ---- feed page -------------------------------------------------------
    def _read_page(self, tranche: str, pos: int) -> Batch:
        with self._lock:
            n = len(self._submitted)
            if pos >= n:
                return Batch(items=None, checkpoint=pos, is_tail=True)
            pdf = self._submitted[pos]
        df = (
            self.spark.createDataFrame(pdf, schema=self.schema)
            if self.schema is not None
            else self.spark.createDataFrame(pdf)
        )
        if self.category_filter is not None:
            from pyspark.sql import functions as F

            df = df.filter(
                F.substring_index(F.col("stream_name"), "-", 1) == self.category_filter
            )
        is_tail = pos + 1 >= n
        return Batch(items=df, checkpoint=pos + 1, is_tail=is_tail)
