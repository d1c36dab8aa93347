"""Pure span algebra — the data semantics of the reference's stream
buffer, re-derived from observed behavior (SURVEY.md §2.2 P5/P6;
ref: src/Propulsion/Streams.fs:81-147).

A *span* is a list of events with strictly contiguous ascending
indexes. A stream's buffer holds a list of disjoint, non-adjacent
spans sorted by start index (gaps between spans are preserved — they
represent events not yet seen). *Unfolds* are state-snapshot rows that
ride at an index; only the freshest set (highest index, one per
arrival batch) is meaningful.

These functions are pure Python over plain tuples so they can be
property-tested without Spark and reused verbatim inside the
`applyInPandasWithState` stateful kernel (streaming/state_kernel.py).
On the hot path Spark executes the vectorized SQL equivalents
(operators/queries.py); this module is the semantic reference.
"""

from __future__ import annotations

from typing import NamedTuple


class Event(NamedTuple):
    """Minimal event for kernel purposes: index + identity + payload."""

    idx: int
    event_type: str = ""
    data: str = ""
    is_unfold: bool = False
    size: int = 0


Span = tuple[Event, ...]


def _events_of(span) -> Span:
    return tuple(span)


def span_index(span: Span) -> int:
    return span[0].idx


def span_next(span: Span) -> int:
    """Index after the last event of the span (the 'version' it takes
    the stream to)."""
    return span[-1].idx + 1


def drop_before(span: Span, pos: int) -> Span:
    """Drop events already handled (idx < pos). Unfolds survive only if
    they are at-or-ahead of the write position — a snapshot of handled
    state carries no information (ref semantics: Streams.fs:111-117).
    """
    return tuple(e for e in span if e.idx >= pos)


def slice_span(span: Span, max_events: int, max_bytes: int) -> Span:
    """Trim a dispatch batch to at most ``max_events`` / ``max_bytes``,
    always keeping >=1 event, and never splitting an unfold set from the
    event it rides with (ref semantics: Streams.fs:89-107).
    """
    if not span:
        return span
    out: list[Event] = []
    budget = max_bytes
    for e in span:
        if out:
            if len(out) >= max_events or budget - e.size < 0:
                break
        out.append(e)
        budget -= e.size
    # never split unfolds at the same idx from their anchor event
    while out and len(out) < len(span):
        nxt = span[len(out)]
        if nxt.is_unfold and nxt.idx == out[-1].idx:
            out.append(nxt)
        else:
            break
    return tuple(out)


def coalesce_spans(spans: list[Span]) -> list[Span]:
    """Merge overlapping/adjacent spans into the minimal list of
    contiguous spans, preserving genuine gaps (ref semantics:
    Streams.fs:118-147). Duplicate indexes resolve first-writer-wins.
    """
    flat = [e for s in spans for e in s if not e.is_unfold]
    if not flat:
        return []
    by_idx: dict[int, Event] = {}
    for e in flat:
        by_idx.setdefault(e.idx, e)
    out: list[list[Event]] = []
    cur: list[Event] = []
    for i in sorted(by_idx):
        if cur and i != cur[-1].idx + 1:
            out.append(cur)
            cur = []
        cur.append(by_idx[i])
    if cur:
        out.append(cur)
    return [tuple(s) for s in out]


def strip_unfolds(spans: list[Span], keep_freshest: bool = True) -> tuple[list[Span], Span]:
    """Separate unfolds from events. Returns (event_spans, freshest_unfolds).

    Only the freshest unfold set is retained: the unfolds with the
    highest index; among several at that index, all are kept (they are
    one snapshot set). Older unfolds are superseded and dropped
    (ref semantics: Streams.fs:143-147, 229-231).
    """
    unfolds = [e for s in spans for e in s if e.is_unfold]
    event_spans = coalesce_spans(spans)
    if not unfolds or not keep_freshest:
        return event_spans, ()
    top = max(e.idx for e in unfolds)
    freshest = tuple(e for e in unfolds if e.idx == top)
    return event_spans, freshest


def merge(write_pos: int, spans: list[Span]) -> list[Span]:
    """Full buffer normalization: drop handled events, coalesce,
    preserve gaps. The result satisfies the invariants checked by the
    property tests: sorted, disjoint, non-adjacent, all idx >= write_pos.
    """
    trimmed = [drop_before(s, write_pos) for s in spans]
    return coalesce_spans([s for s in trimmed if s])


def next_gap(write_pos: int, spans: list[Span]) -> tuple[int, int] | None:
    """First missing index range blocking dispatch under `requireAll`
    semantics (ref: Streams.fs:370-373): returns (gap_start, next_known)
    or None if the head span is dispatchable from write_pos.
    """
    merged = merge(write_pos, spans)
    if not merged:
        return None
    head = merged[0]
    if span_index(head) > write_pos:
        return (write_pos, span_index(head))
    return None
