"""Idempotent event-store writer tests (W1/W2 semantics,
ref: CosmosStoreSink outcome classification + CosmosStorePruner).
"""

from __future__ import annotations

import pytest

from propulsion_spark.streaming.event_store import EventStoreTable
from propulsion_spark.streaming.sinks import OutcomeKind

from test_streaming_sinks import envelope_rows, mk_df


@pytest.fixture()
def store(spark, tmp_path):
    return EventStoreTable(spark, str(tmp_path / "events"))


def sync_map(store, df):
    return {r.stream_name: r for r in store.sync(df).collect()}


class TestEventStoreSync:
    def test_fresh_append_ok(self, spark, store):
        out = sync_map(store, mk_df(spark, envelope_rows("user-1", 0, 4)))
        assert out["user-1"].outcome == OutcomeKind.OK
        assert out["user-1"].new_tail == 4
        assert store.read().count() == 4

    def test_exact_redelivery_duplicate(self, spark, store):
        store.sync(mk_df(spark, envelope_rows("user-1", 0, 4)))
        out = sync_map(store, mk_df(spark, envelope_rows("user-1", 0, 4)))
        assert out["user-1"].outcome == OutcomeKind.DUPLICATE
        assert out["user-1"].appended == 0
        assert store.read().count() == 4  # no double writes

    def test_partial_overlap_appends_suffix(self, spark, store):
        store.sync(mk_df(spark, envelope_rows("user-1", 0, 4)))
        out = sync_map(store, mk_df(spark, envelope_rows("user-1", 2, 4)))
        assert out["user-1"].outcome == OutcomeKind.PARTIAL_DUPLICATE
        assert out["user-1"].appended == 2
        assert out["user-1"].new_tail == 6
        idxs = sorted(r.idx for r in store.read().collect())
        assert idxs == list(range(6))

    def test_gap_rejected_prefix_missing(self, spark, store):
        store.sync(mk_df(spark, envelope_rows("user-1", 0, 2)))
        out = sync_map(store, mk_df(spark, envelope_rows("user-1", 5, 2)))
        assert out["user-1"].outcome == OutcomeKind.PREFIX_MISSING
        assert out["user-1"].appended == 0
        assert store.read().count() == 2

    def test_sync_report_survives_prune_traffic(self, spark, store, monkeypatch):
        """A held distributed-path sync report must stay readable across
        subsequent prune() calls (advice r4: a rotation shared by sync
        and prune rmtree'd the sync spool after any two later calls of
        either verb)."""
        from propulsion_spark.streaming import event_store as es

        monkeypatch.setattr(es, "DRIVER_REPORT_CAP", 1)  # force spooled path
        report = store.sync(
            mk_df(
                spark,
                envelope_rows("user-1", 0, 2)
                + envelope_rows("user-2", 0, 2)
                + envelope_rows("user-3", 0, 2),
            )
        )
        req = spark.createDataFrame(
            [("user-1", 0)], "stream_name string, until_idx long"
        )
        store.prune(req)
        store.prune(req)
        # two completed prunes later, the sync report still reads
        assert report.count() == 3

    def test_multi_stream_batch(self, spark, store):
        store.sync(mk_df(spark, envelope_rows("user-1", 0, 3)))
        batch = mk_df(
            spark,
            envelope_rows("user-1", 3, 2)  # OK
            + envelope_rows("user-2", 0, 2)  # OK (new stream)
            + envelope_rows("user-3", 4, 1),  # PrefixMissing
        )
        out = sync_map(store, batch)
        assert out["user-1"].outcome == OutcomeKind.OK
        assert out["user-2"].outcome == OutcomeKind.OK
        assert out["user-3"].outcome == OutcomeKind.PREFIX_MISSING
        assert store.read().count() == 7


class TestPruner:
    def test_prune_deletes_below_index(self, spark, store):
        store.sync(mk_df(spark, envelope_rows("user-1", 0, 6)))
        store.sync(mk_df(spark, envelope_rows("user-2", 0, 4)))
        req = spark.createDataFrame(
            [("user-1", 2)], "stream_name string, until_idx long"
        )
        report = {r.stream_name: r for r in store.prune(req).collect()}
        assert report["user-1"].deleted == 3
        assert report["user-1"].remaining == 3
        left = sorted((r.stream_name, r.idx) for r in store.read().collect())
        assert left == [("user-1", 3), ("user-1", 4), ("user-1", 5)] + [
            ("user-2", i) for i in range(4)
        ]

    def test_unfold_compact_keeps_freshest(self, spark, store):
        rows = envelope_rows("user-1", 0, 3)
        unfolds = envelope_rows("user-1", 3, 1) + envelope_rows("user-1", 4, 1)
        for u in unfolds:
            u["is_unfold"] = True
            u["event_type"] = "snapshot"
        store.sync(mk_df(spark, rows + unfolds))
        store.unfold_compact()
        kept = [r for r in store.read().collect() if r.is_unfold]
        assert len(kept) == 1 and kept[0].idx == 4

    def test_unfold_compact_opens_only_tracked_buckets(self, spark, tmp_path):
        """VERDICT r2 #4: unfold-bearing buckets are recorded in the
        manifest at append time, so unfold_compact never scans the full
        store — its reads touch ONLY buckets that hold unfold rows."""
        from propulsion_spark.streaming.event_store import EventStoreTable

        store = EventStoreTable(spark, str(tmp_path / "es"), n_buckets=16)
        # many unfold-free streams spread across buckets...
        for i in range(8):
            store.sync(mk_df(spark, envelope_rows(f"plain-{i}", 0, 5)))
        # ...plus one stream with an unfold
        rows = envelope_rows("snappy", 0, 2)
        unf = envelope_rows("snappy", 2, 1)
        unf[0]["is_unfold"] = True
        unf[0]["event_type"] = "snapshot"
        store.sync(mk_df(spark, rows + unf))
        m = store._load()
        unfold_b = {
            str(r.b)
            for r in spark.createDataFrame([("snappy",)], "stream_name string")
            .select(store._bucket_col().cast("string").alias("b"))
            .collect()
        }
        assert m["unfold_buckets"] == sorted(unfold_b)
        # spy on _data_paths: every read during unfold_compact must be
        # bucket-restricted to the tracked set (no buckets=None scan)
        seen: list = []
        orig = store._data_paths

        def spy(m_, buckets=None):
            seen.append(buckets)
            return orig(m_, buckets)

        store._data_paths = spy
        store.unfold_compact()
        assert seen, "unfold_compact read nothing"
        for b in seen:
            assert b is not None and set(b) <= unfold_b
        # freshest unfold retained, tracked set unchanged afterwards
        kept = [r for r in store.read().collect() if r.is_unfold]
        assert len(kept) == 1
        assert store._load()["unfold_buckets"] == sorted(unfold_b)


class TestDataCompaction:
    def test_auto_compact_folds_worst_buckets(self, spark, store):
        """Each sync appends one segment per touched bucket; the
        OPTIMIZE-analog policy folds over-threshold buckets back to one
        segment, worst first, bounded per call — with identical data
        before and after."""
        for i in range(4):
            store.sync(mk_df(spark, envelope_rows("user-1", i * 3, 3)))
        counts = store.bucket_segment_counts()
        assert max(counts.values()) == 4  # read amplification accrued
        before = sorted(
            (r.stream_name, r.idx) for r in store.read().collect()
        )
        done = store.auto_compact(max_segments=1)
        assert done  # the accrued bucket was compacted
        after_counts = store.bucket_segment_counts()
        assert max(after_counts.values()) == 1
        after = sorted((r.stream_name, r.idx) for r in store.read().collect())
        assert after == before  # rewrite, not data change

    def test_auto_compact_respects_caps(self, spark, store):
        for u in ("user-1", "user-2", "user-3"):
            for i in range(3):
                store.sync(mk_df(spark, envelope_rows(u, i * 2, 2)))
        over = [b for b, n in store.bucket_segment_counts().items() if n > 1]
        done = store.auto_compact(max_segments=1, max_buckets=1)
        assert len(done) == 1  # bounded maintenance slice
        assert done[0] in over
        # a second call keeps draining
        store.auto_compact(max_segments=1)
        assert max(store.bucket_segment_counts().values()) == 1

    def test_compact_interleaves_with_sync(self, spark, store):
        store.sync(mk_df(spark, envelope_rows("user-1", 0, 3)))
        store.sync(mk_df(spark, envelope_rows("user-1", 3, 3)))
        store.auto_compact(max_segments=1)
        out = sync_map(store, mk_df(spark, envelope_rows("user-1", 6, 2)))
        assert out["user-1"].outcome == OutcomeKind.OK
        assert out["user-1"].new_tail == 8
        assert store.read().count() == 8


class TestReadStreams:
    def test_point_read_prunes_buckets_and_matches_full_scan(
        self, spark, store
    ):
        from pyspark.sql import functions as F

        names = [f"user-{i}" for i in range(40)]
        df = mk_df(
            spark,
            [r for i, n in enumerate(names) for r in envelope_rows(n, 0, 3)],
        )
        store.sync(df)
        want = ["user-3", "user-17"]
        got = store.read_streams(want)
        # same rows as filtering the full scan
        full = store.read().filter(F.col("stream_name").isin(want))
        assert sorted(
            (r.stream_name, r.idx) for r in got.collect()
        ) == sorted((r.stream_name, r.idx) for r in full.collect())
        assert got.count() == 6
        # the scan is PRUNED: strictly fewer files than the full store
        # (manifest-level bucket pruning — the only files listed are
        # the named streams' bucket segments)
        assert 0 < len(got.inputFiles()) < len(store.read().inputFiles())

    def test_driver_side_bucket_rule_matches_writer(self, spark, store):
        """zlib.crc32 and Spark's crc32(cast binary) share the
        polynomial — the no-Spark-job bucket computation must agree
        with the bucket column the writer partitioned by."""
        import zlib

        from pyspark.sql import functions as F

        names = [f"s-{i}" for i in range(64)] + ["Cat-αβ", "weird name/x"]
        df = spark.createDataFrame([(n,) for n in names], "stream_name string")
        spark_buckets = {
            r.stream_name: r.b
            for r in df.select(
                "stream_name",
                (F.crc32(F.col("stream_name").cast("binary")) % store.n_buckets)
                .cast("int")
                .alias("b"),
            ).collect()
        }
        for n in names:
            assert zlib.crc32(n.encode("utf-8")) % store.n_buckets == (
                spark_buckets[n] % store.n_buckets
            )

    def test_missing_stream_returns_empty(self, spark, store):
        store.sync(mk_df(spark, envelope_rows("user-1", 0, 2)))
        assert store.read_streams(["absent-stream"]).count() == 0

    def test_unstamped_manifest_falls_back_to_full_scan(self, spark, store):
        """A manifest without the n_buckets stamp (legacy layouts)
        predates the recorded fan-out: pruning by the constructor
        default could silently miss events, so point reads must scan
        every bucket instead (review-found)."""
        import json
        import os

        names = [f"user-{i}" for i in range(10)]
        store.sync(
            mk_df(spark, [r for n in names for r in envelope_rows(n, 0, 2)])
        )
        # strip the stamp in place (simulating a pre-stamp manifest)
        with open(store.manifest.pointer) as f:
            m = json.load(f)
        del m["n_buckets"]
        tmp = store.manifest.pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, store.manifest.pointer)
        fresh = EventStoreTable(spark, store.path, n_buckets=7)  # wrong guess
        got = sorted(
            (r.stream_name, r.idx)
            for r in fresh.read_streams(["user-3"]).collect()
        )
        assert got == [("user-3", 0), ("user-3", 1)]
        # …but WRITE verbs must refuse: syncing (or pruning) with a
        # guessed fan-out would interleave a second bucket layout and
        # stamp the guess as truth, silently breaking every later
        # pruned read (review-found — the read fallback alone only
        # protects until the first write)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="n_buckets"):
            fresh.sync(mk_df(spark, envelope_rows("user-3", 2, 1)))
        with _pytest.raises(ValueError, match="n_buckets"):
            fresh.prune(
                spark.createDataFrame(
                    [("user-3", 1)], "stream_name string, until_idx long"
                )
            )
        # compact_bucket re-hashes survivors with _bucket_col(), so it is
        # guarded by the same stamping contract (review-found: it was the
        # one write verb that slipped past the fan-out guard)
        some_bucket = next(iter(fresh.bucket_segment_counts()))
        with _pytest.raises(ValueError, match="n_buckets"):
            fresh.compact_bucket(some_bucket)
        # stamping a fan-out smaller than existing bucket keys must be
        # refused: data in bucket '37' is unreachable under n_buckets=7
        # (read_streams would prune to buckets that can never match)
        with _pytest.raises(ValueError, match="not addressable"):
            fresh.stamp_fanout()
        # the explicit migration: construct with the ORIGINAL fan-out
        # and stamp it once — writes unblock
        orig = EventStoreTable(spark, store.path, n_buckets=64)
        orig.stamp_fanout()
        orig.sync(mk_df(spark, envelope_rows("user-3", 2, 1)))
        assert sorted(
            r.idx for r in orig.read_streams(["user-3"]).collect()
        ) == [0, 1, 2]

    def test_reader_with_mismatched_bucket_default_adopts_stamp(
        self, spark, tmp_path
    ):
        """A store written with n_buckets=16 must serve point reads from
        a reader constructed with the 64 default: the manifest-stamped
        fan-out drives the bucket rule, not the constructor arg (a
        review-found bug pruned to the wrong buckets when read_streams
        hashed before the first _load)."""
        writer = EventStoreTable(spark, str(tmp_path / "es16"), n_buckets=16)
        names = [f"user-{i}" for i in range(20)]
        writer.sync(
            mk_df(
                spark, [r for n in names for r in envelope_rows(n, 0, 2)]
            )
        )
        reader = EventStoreTable(spark, str(tmp_path / "es16"))  # default 64
        for want in ("user-0", "user-7", "user-19"):
            got = sorted(
                (r.stream_name, r.idx)
                for r in reader.read_streams([want]).collect()
            )
            assert got == [(want, 0), (want, 1)], want
