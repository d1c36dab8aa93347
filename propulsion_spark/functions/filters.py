"""StreamFilter — composable allow/deny filters over category, stream
name and event type (SURVEY.md §2.3 F1/F2; ref:
src/Propulsion/StreamFilter.fs:6-46 and Feed/FeedSource.fs:126-141).

Compiles to a single Catalyst predicate (pushed into the scan when the
columns come straight off a source), mirroring the reference's CLI
surface: ``--category/-c``, ``--stream/-s``, ``--event-type/-e`` with
regex and literal forms, plus the default system-stream ('$'-prefix)
exclusion.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_match(col: Column, literals: Sequence[str], regexes: Sequence[str]) -> Optional[Column]:
    conds = []
    if literals:
        conds.append(col.isin(list(literals)))
    for rx in regexes:
        conds.append(col.rlike(rx))
    if not conds:
        return None
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


@dataclass
class StreamFilter:
    allow_categories: Sequence[str] = ()
    deny_categories: Sequence[str] = ()
    allow_category_regex: Sequence[str] = ()
    deny_category_regex: Sequence[str] = ()
    allow_streams: Sequence[str] = ()
    deny_streams: Sequence[str] = ()
    allow_stream_regex: Sequence[str] = ()
    deny_stream_regex: Sequence[str] = ()
    allow_event_types: Sequence[str] = ()
    deny_event_types: Sequence[str] = ()
    allow_event_type_regex: Sequence[str] = ()
    deny_event_type_regex: Sequence[str] = ()
    include_system: bool = False  # '$'-prefixed streams excluded by default
    _extra: list = field(default_factory=list)

    def predicate(
        self,
        stream_col: str = "stream_name",
        category_col: str = "category",
        event_type_col: str = "event_type",
    ) -> Column:
        stream, cat, et = F.col(stream_col), F.col(category_col), F.col(event_type_col)
        pred = F.lit(True)
        if not self.include_system:
            pred = pred & ~stream.startswith("$")
        allow_c = _any_match(cat, self.allow_categories, self.allow_category_regex)
        if allow_c is not None:
            pred = pred & allow_c
        deny_c = _any_match(cat, self.deny_categories, self.deny_category_regex)
        if deny_c is not None:
            pred = pred & ~deny_c
        allow_s = _any_match(stream, self.allow_streams, self.allow_stream_regex)
        if allow_s is not None:
            pred = pred & allow_s
        deny_s = _any_match(stream, self.deny_streams, self.deny_stream_regex)
        if deny_s is not None:
            pred = pred & ~deny_s
        allow_e = _any_match(et, self.allow_event_types, self.allow_event_type_regex)
        if allow_e is not None:
            pred = pred & allow_e
        deny_e = _any_match(et, self.deny_event_types, self.deny_event_type_regex)
        if deny_e is not None:
            pred = pred & ~deny_e
        for extra in self._extra:
            pred = pred & extra
        return pred

    def where(self, extra: Column) -> "StreamFilter":
        """Compose a custom predicate (categoryFilter ∘ custom, ref:
        FeedSource.fs:126-141)."""
        self._extra.append(extra)
        return self

    def apply(self, df: DataFrame, **cols) -> DataFrame:
        return df.filter(self.predicate(**cols))
