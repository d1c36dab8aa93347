"""Property tests for the span/state kernel.

Mirrors the reference's FsCheck suites (SURVEY.md §5; ref:
tests/Propulsion.Tests/StreamStateTests.fs:112-173 and
SpanQueueTests.fs:43-145): merge ordering, gap preservation,
freshest-unfold retention, idempotence, write-pos monotonicity.
Pure Python — no Spark needed.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from propulsion_spark.kernel import (
    Event,
    coalesce_spans,
    drop_before,
    merge,
    next_gap,
    slice_span,
    strip_unfolds,
)
from propulsion_spark.kernel.state import StreamState


def mk_span(start: int, length: int, unfold_tail: int = 0):
    events = tuple(Event(idx=start + i, event_type=f"e{start + i}", size=10) for i in range(length))
    unfolds = tuple(
        Event(idx=start + length - 1, event_type=f"u{j}", is_unfold=True, size=5)
        for j in range(unfold_tail)
    )
    return events + unfolds


spans_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(1, 8)).map(lambda t: mk_span(*t)),
    min_size=0,
    max_size=8,
)


def all_indexes(spans):
    return {e.idx for s in spans for e in s}


@given(spans_strategy, st.integers(0, 50))
@settings(max_examples=500)
def test_merge_invariants(spans, write_pos):
    merged = merge(write_pos, spans)
    # spans sorted, internally contiguous, mutually non-adjacent
    for s in merged:
        assert list(e.idx for e in s) == list(range(s[0].idx, s[-1].idx + 1))
        assert all(not e.is_unfold for e in s)
        assert s[0].idx >= write_pos
    for a, b in zip(merged, merged[1:]):
        assert b[0].idx > a[-1].idx + 1  # gap strictly preserved
    # index set preserved exactly (above write_pos)
    expected = {i for i in all_indexes([tuple(e for e in s if not e.is_unfold) for s in spans]) if i >= write_pos}
    assert all_indexes(merged) == expected


@given(spans_strategy, st.integers(0, 50))
@settings(max_examples=200)
def test_merge_idempotent(spans, write_pos):
    once = merge(write_pos, spans)
    twice = merge(write_pos, once)
    assert [[e.idx for e in s] for s in once] == [[e.idx for e in s] for s in twice]


@given(spans_strategy)
@settings(max_examples=200)
def test_coalesce_preserves_event_identity(spans):
    merged = coalesce_spans(spans)
    # first-writer-wins: every output event appears in some input span
    originals = {(e.idx, e.event_type) for s in spans for e in s if not e.is_unfold}
    for s in merged:
        for e in s:
            assert (e.idx, e.event_type) in originals


@given(st.integers(0, 30), st.integers(1, 10), st.integers(0, 40))
def test_drop_before(start, length, pos):
    span = mk_span(start, length)
    out = drop_before(span, pos)
    assert all(e.idx >= pos for e in out)
    assert len(out) == len([e for e in span if e.idx >= pos])


@given(st.integers(1, 20), st.integers(1, 6), st.integers(1, 25), st.integers(50, 2000))
def test_slice_bounds(length, unfolds, max_events, max_bytes):
    span = mk_span(0, length, unfold_tail=unfolds)
    out = slice_span(span, max_events, max_bytes)
    assert len(out) >= 1  # always makes progress
    non_unfold = [e for e in out if not e.is_unfold]
    # events beyond the first obey the budget (unfold riders exempt)
    assert len(non_unfold) <= max(max_events, 1)
    # never split an unfold set from its anchor: if the anchor of the
    # unfolds is included and any unfold is included, all are
    if out[-1].is_unfold:
        anchors = [e for e in span if e.is_unfold]
        assert sum(1 for e in out if e.is_unfold) == len(anchors)


def test_strip_unfolds_keeps_freshest_only():
    s1 = mk_span(0, 3, unfold_tail=2)  # unfolds at idx 2
    s2 = mk_span(5, 2, unfold_tail=1)  # unfolds at idx 6 (fresher)
    event_spans, freshest = strip_unfolds([s1, s2])
    assert [e.idx for e in freshest] == [6]
    assert all(not e.is_unfold for s in event_spans for e in s)


def test_next_gap_detects_missing_prefix():
    assert next_gap(0, [mk_span(3, 2)]) == (0, 3)
    assert next_gap(3, [mk_span(3, 2)]) is None
    assert next_gap(0, []) is None


@given(spans_strategy, st.integers(0, 50), st.integers(0, 5))
@settings(max_examples=200, deadline=None)  # first example pays pyspark import
def test_state_encode_decode_roundtrip(spans, write_pos, revision):
    """The streaming kernel's state serialization must be lossless."""
    from propulsion_spark.streaming.state_kernel import _decode, _encode

    st_ = StreamState(write_pos=write_pos, revision=revision)
    for s in spans:
        st_.ingest(list(s))
    back = _decode(_encode(st_))
    assert back.write_pos == st_.write_pos
    assert back.revision == st_.revision
    assert [[tuple(e) for e in s] for s in back.spans] == [
        [tuple(e) for e in s] for s in st_.spans
    ]
    assert tuple(map(tuple, back.unfolds)) == tuple(map(tuple, st_.unfolds))


def test_sql_views_register(tmp_path):
    # module-level import keeps this file Spark-free except here
    import sys

    sys.path.insert(0, "/root/repo")
    from propulsion_spark import get_spark
    from propulsion_spark import views as V

    spark = get_spark("views-test", cpus="4", shuffle_partitions=4)
    names = V.register(spark, "/root/testdata/sf0.001")
    assert "stream_events" in names
    n = spark.sql(
        "SELECT count(DISTINCT stream_name) AS c FROM stream_events"
    ).collect()[0].c
    assert n == 15
    joined = spark.sql(
        """SELECT count(*) AS c FROM stream_events e
           JOIN events raw ON e.event_id = raw.event_id"""
    ).collect()[0].c
    assert joined == 1000


class TestStreamState:
    def test_ingest_dedups_below_write_pos(self):
        st_ = StreamState(write_pos=5)
        st_.ingest(list(mk_span(0, 10)))
        assert st_.queued_events == 5  # idx 5..9 only
        assert st_.spans[0][0].idx == 5

    def test_redelivery_is_noop(self):
        st_ = StreamState(write_pos=0)
        st_.ingest(list(mk_span(0, 5)))
        before = [[e.idx for e in s] for s in st_.spans]
        st_.ingest(list(mk_span(0, 5)))
        assert [[e.idx for e in s] for s in st_.spans] == before

    def test_gap_blocks_require_all(self):
        st_ = StreamState(write_pos=0)
        st_.ingest(list(mk_span(3, 2)))
        assert st_.choose_dispatchable(require_all=True) is None
        assert st_.choose_dispatchable(require_all=False) is not None
        assert st_.gap() == (0, 3)

    def test_progress_advances_and_trims(self):
        st_ = StreamState(write_pos=0)
        st_.ingest(list(mk_span(0, 10)))
        st_.record_progress(7)
        assert st_.write_pos == 7
        assert st_.queued_events == 3

    def test_progress_never_regresses(self):
        st_ = StreamState(write_pos=0)
        st_.ingest(list(mk_span(0, 10)))
        st_.record_progress(7)
        st_.record_progress(3)
        assert st_.write_pos == 7

    def test_unfold_revision_bumps(self):
        st_ = StreamState(write_pos=0)
        st_.ingest(list(mk_span(0, 3, unfold_tail=1)))
        r1 = st_.revision
        st_.ingest(list(mk_span(3, 2, unfold_tail=1)))
        assert st_.revision > r1
        assert st_.unfolds[0].idx == 4

    def test_malformed_quarantine(self):
        st_ = StreamState(write_pos=0)
        st_.ingest(list(mk_span(0, 3)))
        st_.mark_malformed()
        assert st_.is_malformed
        st_.ingest(list(mk_span(3, 2)))
        assert st_.choose_dispatchable() is None

    def test_dispatch_includes_riding_unfolds(self):
        st_ = StreamState(write_pos=0)
        st_.ingest(list(mk_span(0, 3, unfold_tail=2)))
        span = st_.choose_dispatchable()
        assert [e.is_unfold for e in span] == [False, False, False, True, True]

    def test_purge_candidate(self):
        st_ = StreamState(write_pos=0)
        st_.ingest(list(mk_span(0, 3)))
        st_.record_progress(3)
        assert st_.is_empty
