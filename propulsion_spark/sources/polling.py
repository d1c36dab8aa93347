"""Category-polling source — the MessageDb/SqlStreamStore analog
(SURVEY.md §2.1 S4/S5; ref: src/Propulsion.MessageDb/MessageDbSource.fs:9-110,
src/Propulsion.SqlStreamStore/SqlStreamStoreSource.fs).

The reference polls ``get_category_messages(category, pos, batch_size)``
per **category** (tranche = category) and checkpoints
``global_position + 1``. Here the backing store is anything readable as
a DataFrame with a monotone ``global_position`` column — a JDBC table
(``spark.read.jdbc`` with a pushed ``WHERE global_position > ?``) or,
in this environment, a parquet table. Each page is a distributed
filtered scan; the position predicate pushes down to the source, so a
poll reads only the increment.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propulsion_spark.sources.feed import Batch, FeedSource, SinglePassFeedSource
from propulsion_spark.streaming.checkpoints import CheckpointStore


class CategoryPollingSource(FeedSource):
    """Polls a global-position-ordered table per category.

    ``read_table()`` → DataFrame with at least (category, global_position)
    plus the payload columns; ``parse`` maps a page to envelope rows.
    """

    def __init__(
        self,
        spark: SparkSession,
        read_table: Callable[[], DataFrame],
        categories: Sequence[str],
        sink,
        checkpoints: CheckpointStore,
        parse: Callable[[DataFrame], DataFrame] | None = None,
        batch_size: int = 1000,
        source_id: str = "messageDb",
        tail_sleep_s: float = 1.0,
        stop_at_tail: bool = False,
        category_col: str = "category",
        position_col: str = "global_position",
    ):
        self.read_table = read_table
        self.parse = parse
        self.batch_size = batch_size
        self.category_col = category_col
        self.position_col = position_col
        super().__init__(
            spark,
            lambda: list(categories),  # tranche = category (ref: :19-27)
            self._read_page,
            sink,
            checkpoints,
            source_id=source_id,
        )
        self.tail_sleep_s = tail_sleep_s
        self.stop_at_tail = stop_at_tail

    def _read_page(self, category: str, pos: int) -> Batch:
        # the filter pushes to the store scan: only the increment is read
        page = (
            self.read_table()
            .filter(
                (F.col(self.category_col) == category)
                & (F.col(self.position_col) >= pos)
            )
            .orderBy(self.position_col)
            .limit(self.batch_size)
        )
        stats = page.agg(
            F.count("*").alias("n"), F.max(self.position_col).alias("hi")
        ).collect()[0]
        if stats.n == 0:
            return Batch(items=None, checkpoint=pos, is_tail=True)
        items = self.parse(page) if self.parse is not None else page
        # checkpoint = last consumed global position + 1 (ref: :56-64)
        return Batch(
            items=items,
            checkpoint=int(stats.hi) + 1,
            is_tail=stats.n < self.batch_size,
        )


class SinglePassCategoryPollingSource(CategoryPollingSource, SinglePassFeedSource):
    def __init__(self, *a, **kw):
        kw["stop_at_tail"] = True
        CategoryPollingSource.__init__(self, *a, **kw)
        self.stop_at_tail = True
        self.tail_sleep_s = 0.0
