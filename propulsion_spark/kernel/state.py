"""Per-stream scheduler state — the value held per key in the state
store (SURVEY.md §2.2 P7; ref: src/Propulsion/Streams.fs:169-187,
327-431).

``StreamState`` is deliberately tiny: a write position (with sentinels
for unknown / malformed), a revision counter bumped when fresh unfolds
arrive, and the buffered spans. The streaming kernel
(streaming/state_kernel.py) serializes this into the Spark state store;
batch operators reconstruct it from a positions table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from propulsion_spark.kernel.spans import (
    Event,
    Span,
    merge,
    next_gap,
    span_index,
    span_next,
    strip_unfolds,
)

WRITE_POS_UNKNOWN = -2
WRITE_POS_MALFORMED = -3


@dataclass
class StreamState:
    write_pos: int = WRITE_POS_UNKNOWN
    revision: int = 0
    spans: list[Span] = field(default_factory=list)
    unfolds: Span = ()

    @property
    def is_malformed(self) -> bool:
        return self.write_pos == WRITE_POS_MALFORMED

    def effective_write_pos(self) -> int:
        return self.write_pos if self.write_pos >= 0 else 0

    def ingest(self, events: list[Event]) -> None:
        """Add a batch's events for this stream, renormalizing the buffer.

        Redeliveries below the write position vanish; fresh unfolds
        supersede buffered ones and bump the revision (ref:
        Streams.fs:184-187, 282-285).
        """
        if self.is_malformed:
            return
        incoming: list[Span] = [tuple(events)] if events else []
        all_spans = self.spans + incoming + ([self.unfolds] if self.unfolds else [])
        event_spans, freshest = strip_unfolds(all_spans)
        self.spans = merge(self.effective_write_pos(), event_spans)
        new_unfolds = tuple(e for e in events if e.is_unfold)
        if new_unfolds and (not self.unfolds or freshest != self.unfolds):
            self.revision += 1
        self.unfolds = freshest

    def mark_malformed(self) -> None:
        self.write_pos = WRITE_POS_MALFORMED
        self.spans = []
        self.unfolds = ()

    def record_progress(self, new_pos: int) -> None:
        """Advance the write position after a successful handler call;
        drops everything the handler covered."""
        if self.is_malformed:
            return
        self.write_pos = max(self.effective_write_pos(), new_pos)
        self.spans = merge(self.write_pos, self.spans)
        if self.unfolds and self.unfolds[0].idx < self.write_pos:
            self.unfolds = ()

    def choose_dispatchable(self, require_all: bool = False) -> Span | None:
        """Head span ready for a handler, or None.

        With ``require_all`` the head span must start exactly at the
        write position (gap guard, ref: Streams.fs:370-373); otherwise
        any buffered head span is dispatchable (out-of-order tolerated).
        """
        if self.is_malformed or not self.spans:
            return None
        head = self.spans[0]
        if require_all and self.write_pos >= 0 and span_index(head) > self.write_pos:
            return None
        span = head
        if self.unfolds and span_next(span) == self.unfolds[0].idx + 1:
            span = span + self.unfolds
        return span

    def gap(self) -> tuple[int, int] | None:
        if self.write_pos < 0:
            return None
        return next_gap(self.write_pos, self.spans)

    @property
    def queued_events(self) -> int:
        return sum(len(s) for s in self.spans)

    @property
    def is_empty(self) -> bool:
        """Purge candidate (ref: Streams.fs:904-913)."""
        return not self.spans and not self.unfolds
