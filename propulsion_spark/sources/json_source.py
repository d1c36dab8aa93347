"""JsonSource — newline-delimited JSON file feed with line-number
checkpoints (SURVEY.md §2.1 S11; ref: src/Propulsion/Feed/JsonSource.fs:14-43).

The file is read distributed (``spark.read.json`` / ``text``) once per
page window; the checkpoint is the line number, ``skip``/``truncate_to``
bound the range, and EOF yields the final ``is_tail`` batch. Built on
:class:`SinglePassFeedSource`, so progress commits through the same
consumer-group store as every other feed.

Line numbering uses a zipWithIndex-style pass: at 100 TB a single
NDJSON file is the wrong input anyway (the driver loop pages it), but
the distributed read keeps per-page parsing parallel.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propulsion_spark.sources.feed import Batch, SinglePassFeedSource
from propulsion_spark.streaming.checkpoints import CheckpointStore


class JsonSource(SinglePassFeedSource):
    def __init__(
        self,
        spark: SparkSession,
        file_path: str,
        sink,
        checkpoints: CheckpointStore,
        parse: Optional[Callable[[DataFrame], DataFrame]] = None,
        skip: int = 0,
        truncate_to: Optional[int] = None,
        page_lines: int = 100_000,
        source_id: str = "jsonSource",
    ):
        self.file_path = file_path
        self.parse = parse
        self.skip = skip
        self.truncate_to = truncate_to
        self.page_lines = page_lines
        self._numbered: DataFrame | None = None
        self._total: int | None = None
        super().__init__(
            spark,
            lambda: ["0"],
            self._read_page,
            sink,
            checkpoints,
            source_id=source_id,
            establish_origin=skip,
        )

    def _load(self) -> None:
        if self._numbered is not None:
            return
        lines = self.spark.read.text(self.file_path)
        # deterministic line numbers: zipWithIndex preserves file order
        numbered = (
            lines.rdd.zipWithIndex()
            .map(lambda t: (t[1], t[0].value))
            .toDF(["line_no", "line"])
        )
        self._numbered = numbered.cache()
        total = self._numbered.count()
        if self.truncate_to is not None:
            total = min(total, self.truncate_to)
        self._total = total

    def _read_page(self, tranche: str, pos: int) -> Batch:
        self._load()
        assert self._numbered is not None and self._total is not None
        if pos >= self._total:
            return Batch(items=None, checkpoint=pos, is_tail=True)
        end = min(pos + self.page_lines, self._total)
        page = self._numbered.filter(
            (F.col("line_no") >= pos) & (F.col("line_no") < end)
        )
        # the parser maps (line_no, line) → envelope rows, typically via
        # from_json with the caller's schema (parseFeedDoc analog)
        df = self.parse(page) if self.parse is not None else page
        return Batch(items=df, checkpoint=end, is_tail=end >= self._total)
