"""deltalite: the native minimal Delta-protocol log
(`streaming/deltalite.py`) — protocol shape, log-replay reads,
put-if-absent commit atomicity, optimistic compaction, vacuum grace."""

from __future__ import annotations

import json
import os

import pytest

from propulsion_spark.streaming.deltalite import (
    CommitConflict,
    DeltaliteLog,
    DeltalitePositionsTable,
)

SCHEMA = "stream_name string, pos long, revision long, malformed boolean"


def _merge(tbl, spark, rows):
    tbl.merge(spark.createDataFrame(rows, SCHEMA))


class TestProtocolShape:
    def test_version_zero_carries_protocol_and_metadata(self, spark, tmp_path):
        tbl = DeltalitePositionsTable(spark, str(tmp_path / "t"))
        log_dir = os.path.join(tbl.path, "_delta_log")
        v0 = os.path.join(log_dir, f"{0:020d}.json")
        actions = [json.loads(x) for x in open(v0) if x.strip()]
        kinds = [next(iter(a)) for a in actions]
        assert kinds == ["protocol", "metaData"]
        assert actions[0]["protocol"] == {
            "minReaderVersion": 1,
            "minWriterVersion": 2,
        }
        md = actions[1]["metaData"]
        assert md["format"]["provider"] == "parquet"
        assert "stream_name" in md["schemaString"]

    def test_versions_are_contiguous_and_adds_reference_real_files(
        self, spark, tmp_path
    ):
        tbl = DeltalitePositionsTable(spark, str(tmp_path / "t"))
        for i in range(3):
            _merge(tbl, spark, [(f"s-{i}", i + 1, 0, False)])
        log = DeltaliteLog(tbl.path)
        assert log.versions() == [0, 1, 2, 3]
        _, files = log.snapshot()
        assert len(files) == 3
        assert all(os.path.exists(f) for f in files)

    def test_readers_replay_the_log_not_the_directory(self, spark, tmp_path):
        """An orphaned parquet file (crashed writer: data written,
        commit never landed) is invisible — the protocol's whole
        point."""
        tbl = DeltalitePositionsTable(spark, str(tmp_path / "t"))
        _merge(tbl, spark, [("s", 5, 0, False)])
        # forge an orphan with a conflicting row
        spark.createDataFrame([("s", 999, 9, True)], SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(str(tmp_path / "orphan"))
        part = next(
            f
            for f in os.listdir(str(tmp_path / "orphan"))
            if f.endswith(".parquet")
        )
        os.replace(
            os.path.join(str(tmp_path / "orphan"), part),
            os.path.join(tbl.path, "part-orphan.parquet"),
        )
        (row,) = tbl.read().collect()
        assert row.pos == 5 and not row.malformed


class TestCommitAtomicity:
    def test_put_if_absent_rejects_the_second_writer(self, spark, tmp_path):
        log = DeltaliteLog(str(tmp_path / "t"))
        log.try_commit(0, [{"protocol": {"minReaderVersion": 1}}])
        with pytest.raises(CommitConflict):
            log.try_commit(0, [{"protocol": {"minReaderVersion": 1}}])

    def test_publish_is_atomic_link_with_full_content(self, spark, tmp_path):
        """The version file is published via os.link of a fully-written
        tmp — a reader can never observe it empty or torn (the r9 bug:
        O_CREAT|O_EXCL then write let a compaction's removes land before
        its add). Here: content is complete at publish, and no tmp
        litter survives success or conflict."""
        log = DeltaliteLog(str(tmp_path / "t"))
        actions = [{"remove": {"path": f"old-{i}.parquet"}} for i in range(200)]
        actions.append({"add": {"path": "base.parquet", "size": 1}})
        log.try_commit(0, actions)
        got = [json.loads(x) for x in open(log._vfile(0)) if x.strip()]
        assert got == actions
        with pytest.raises(CommitConflict):
            log.try_commit(0, [{"add": {"path": "loser.parquet"}}])
        # conflict did not clobber the winner, and no tmp files remain
        assert [json.loads(x) for x in open(log._vfile(0)) if x.strip()] == got
        assert not [f for f in os.listdir(log.log_dir) if ".tmp-" in f]

    def test_merge_retries_past_a_squatted_version(self, spark, tmp_path):
        tbl = DeltalitePositionsTable(spark, str(tmp_path / "t"))
        _merge(tbl, spark, [("a", 1, 0, False)])
        # another writer owns version 2 (adds nothing)
        tbl.log.try_commit(2, [])
        _merge(tbl, spark, [("b", 2, 0, False)])  # lands at 3 via retry
        assert tbl.log.versions() == [0, 1, 2, 3]
        rows = {r.stream_name: r.pos for r in tbl.read().collect()}
        assert rows == {"a": 1, "b": 2}


def _occ_writer(table_dir, writer_id, n_commits, barrier, out_q):
    """Spawned-process body: land ``n_commits`` tagged commits through
    the public retry discipline (read latest → try_commit(latest+1) →
    on CommitConflict re-read and retry). Module-level so the spawn
    start method can pickle it."""
    from propulsion_spark.streaming.deltalite import (
        CommitConflict,
        DeltaliteLog,
    )

    log = DeltaliteLog(table_dir)
    conflicts = 0
    barrier.wait()  # maximize same-version contention
    for seq in range(n_commits):
        while True:
            versions = log.versions()
            v = (versions[-1] if versions else -1) + 1
            try:
                log.try_commit(
                    v,
                    [{"commitInfo": {"writer": writer_id, "seq": seq}}],
                )
                break
            except CommitConflict:
                conflicts += 1
    out_q.put((writer_id, conflicts))


class TestMultiProcessOCC:
    def test_exactly_one_winner_per_version_across_processes(self, tmp_path):
        """VERDICT r10 #7: deltalite now backs checkpoints, zorder
        writes and a native read format, but hypothesis only covered op
        INTERLEAVINGS in one process. Here 4 spawned processes race
        ``try_commit`` flat-out on the same version counter: the
        os.link put-if-absent must admit exactly one winner per version
        and the losers' retries must land every payload exactly once,
        with no torn or empty version file anywhere."""
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        table_dir = str(tmp_path / "t")
        n_writers, n_commits = 4, 12
        barrier = ctx.Barrier(n_writers)
        out_q = ctx.Queue()
        procs = [
            ctx.Process(
                target=_occ_writer,
                args=(table_dir, w, n_commits, barrier, out_q),
            )
            for w in range(n_writers)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join(120)
            assert p.exitcode == 0
        reported = dict(out_q.get(timeout=10) for _ in range(n_writers))
        assert set(reported) == set(range(n_writers))
        # with a start barrier at least someone lost a race; the retry
        # loop must have absorbed every loss
        log = DeltaliteLog(table_dir)
        total = n_writers * n_commits
        assert log.versions() == list(range(total))  # contiguous, no gaps
        seen: dict = {}
        for v in log.versions():
            actions = [
                json.loads(x) for x in open(log._vfile(v)) if x.strip()
            ]
            assert len(actions) == 1  # never torn, never empty
            info = actions[0]["commitInfo"]
            key = (info["writer"], info["seq"])
            assert key not in seen, f"{key} committed twice"
            seen[key] = v
        assert len(seen) == total  # every payload landed exactly once
        # per-writer sequences are monotone in version order (each
        # writer's seq n committed before its seq n+1)
        for w in range(n_writers):
            vs = [seen[(w, s)] for s in range(n_commits)]
            assert vs == sorted(vs)
        assert not [f for f in os.listdir(log.log_dir) if ".tmp-" in f]


class TestCompactionAndVacuum:
    def test_threshold_compaction_folds_to_one_live_file(self, spark, tmp_path):
        tbl = DeltalitePositionsTable(
            spark, str(tmp_path / "t"), compact_after=3
        )
        for i in range(3):
            _merge(tbl, spark, [("s", i + 1, i, False)])
        _, files = tbl.log.snapshot()
        assert len(files) == 1  # merge 3 crossed the threshold → folded
        (row,) = tbl.read().collect()
        assert (row.pos, row.revision) == (3, 2)

    def test_vacuum_respects_the_grace_window(self, spark, tmp_path):
        tbl = DeltalitePositionsTable(
            spark, str(tmp_path / "t"), compact_after=2
        )
        for i in range(4):
            _merge(tbl, spark, [("s", i + 1, 0, False)])
        # retired files survive a graceful vacuum, die at grace 0
        assert tbl.vacuum(grace_s=3600) == []
        dropped = tbl.vacuum(grace_s=0.0)
        assert dropped
        (row,) = tbl.read().collect()
        assert row.pos == 4

    def test_newest_wins_semantics_match_parquet_backend(self, spark, tmp_path):
        from propulsion_spark.streaming.positions import PositionsTable

        lite = DeltalitePositionsTable(spark, str(tmp_path / "a"))
        ref = PositionsTable(spark, str(tmp_path / "b"))
        batches = [
            [("s", 5, 1, False), ("t", 1, 0, False)],
            [("s", 3, 2, True)],
            [("s", 4, 0, False), ("t", 2, 1, False)],
        ]
        for b in batches:
            _merge(lite, spark, b)
            ref.merge(spark.createDataFrame(b, SCHEMA))
        a = sorted(map(tuple, lite.read().collect()))
        b = sorted(map(tuple, ref.read().collect()))
        assert a == b


class TestDeltaliteCheckpointStore:
    def _mk(self, tmp_path, **kw):
        from propulsion_spark.streaming.deltalite import (
            DeltaliteCheckpointStore,
        )

        return DeltaliteCheckpointStore(
            path=str(tmp_path / "ck"), group="g", **kw
        )

    def test_start_commit_flush_roundtrip(self, spark, tmp_path):
        ck = self._mk(tmp_path)
        assert ck.start("src", "0", establish_origin=7) == 7
        ck.commit("src", "0", 42)
        ck.flush()
        assert ck.position("src", "0") == 42
        # a fresh store (new process) resolves from the log
        again = self._mk(tmp_path)
        assert again.start("src", "0") == 42

    def test_newest_wins_across_commits(self, spark, tmp_path):
        ck = self._mk(tmp_path)
        ck.start("src", "0", establish_origin=0)
        for pos in (5, 3, 9):
            ck.commit("src", "0", pos)
            ck.flush()
        assert self._mk(tmp_path).start("src", "0") == 9

    def test_compaction_folds_log(self, spark, tmp_path):
        ck = self._mk(tmp_path)
        ck.start("s", "0", establish_origin=0)
        for i in range(70):
            ck.commit("s", "0", i + 1)
            ck.flush()
        # _maybe_compact(max_files=64) crossed: live set folded
        assert len(ck._files()) <= 64
        assert self._mk(tmp_path).start("s", "0") == 70

    def test_orphan_segment_invisible(self, spark, tmp_path):
        import os

        import pandas as pd

        ck = self._mk(tmp_path)
        ck.start("src", "0", establish_origin=3)
        # forge an uncommitted segment claiming a huge position
        pd.DataFrame(
            [
                {
                    "source": "src",
                    "tranche": "0",
                    "grp": "g",
                    "pos": 999,
                    "seq": 10**18,
                    "updated_at": pd.Timestamp.utcnow().tz_localize(None),
                }
            ]
        ).to_parquet(os.path.join(ck.path, "ckpt-orphan.parquet"))
        assert self._mk(tmp_path).start("src", "0") == 3


class TestCheckpointsAndStats:
    """r10: parquet checkpoints + _last_checkpoint + add.stats — the
    protocol gaps the module docstring used to list as unimplemented."""

    def test_checkpoint_written_at_interval(self, spark, tmp_path):
        from propulsion_spark.streaming.deltalite import CHECKPOINT_INTERVAL

        tbl = DeltalitePositionsTable(
            spark, str(tmp_path / "t"), compact_after=10**9
        )
        for i in range(CHECKPOINT_INTERVAL):
            _merge(tbl, spark, [(f"s-{i}", i + 1, 0, False)])
        ck = tbl.log.last_checkpoint()
        # versions 0..9 are ten commits → the interval fires at v9
        assert ck == CHECKPOINT_INTERVAL - 1
        assert os.path.exists(tbl.log._ckpt_file(ck))
        ptr = json.load(open(os.path.join(tbl.log.log_dir, "_last_checkpoint")))
        assert ptr["version"] == ck and ptr["size"] >= 2  # protocol+metaData

    def test_reader_starts_from_checkpoint_not_version_zero(
        self, spark, tmp_path
    ):
        """Delta's metadata-cleanup contract: once a checkpoint exists,
        commits at or below it are never opened — proven by DELETING
        them and reading anyway."""
        tbl = DeltalitePositionsTable(
            spark, str(tmp_path / "t"), compact_after=10**9
        )
        for i in range(12):
            _merge(tbl, spark, [(f"s-{i}", i + 1, 0, False)])
        ck = tbl.log.last_checkpoint()
        assert ck is not None
        for v in range(ck + 1):
            os.remove(tbl.log._vfile(v))
        rows = {r.stream_name: r.pos for r in tbl.read().collect()}
        assert rows == {f"s-{i}": i + 1 for i in range(12)}
        # and writes continue past the cleaned prefix
        _merge(tbl, spark, [("s-new", 99, 0, False)])
        assert {r.stream_name: r.pos for r in tbl.read().collect()}[
            "s-new"
        ] == 99

    def test_adds_carry_footer_stats(self, spark, tmp_path):
        tbl = DeltalitePositionsTable(spark, str(tmp_path / "t"))
        _merge(tbl, spark, [("a", 5, 0, False), ("b", 2, 1, False)])
        _, live = tbl.log.snapshot_adds()
        (add,) = live.values()
        stats = json.loads(add["stats"])
        assert stats["numRecords"] == 2
        assert stats["minValues"]["pos"] == 2 and stats["maxValues"]["pos"] == 5
        assert stats["nullCount"]["pos"] == 0

    def test_checkpoint_survives_stats_and_conflict_replay(
        self, spark, tmp_path
    ):
        """Stats recorded before the checkpoint are still served from
        the checkpoint replay (they ride inside the folded add)."""
        from propulsion_spark.streaming.deltalite import CHECKPOINT_INTERVAL

        tbl = DeltalitePositionsTable(
            spark, str(tmp_path / "t"), compact_after=10**9
        )
        for i in range(CHECKPOINT_INTERVAL):
            _merge(tbl, spark, [(f"s-{i}", i + 1, 0, False)])
        assert tbl.log.last_checkpoint() is not None
        _, live = tbl.log.snapshot_adds()
        assert all(json.loads(a["stats"])["numRecords"] == 1 for a in live.values())


class TestDeltaliteDataTable:
    ROWS = "x long, y double"

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, self.ROWS)

    def test_write_read_append_overwrite(self, spark, tmp_path):
        from propulsion_spark.streaming.deltalite import DeltaliteTable

        t = DeltaliteTable(spark, str(tmp_path / "d"))
        t.write(self._df(spark, [(1, 1.0), (2, 2.0)]).coalesce(1))
        t.write(self._df(spark, [(3, 3.0)]).coalesce(1), mode="append")
        assert sorted(r.x for r in t.read().collect()) == [1, 2, 3]
        v = t.write(self._df(spark, [(9, 9.0)]).coalesce(1), mode="overwrite")
        assert [r.x for r in t.read().collect()] == [9]
        assert v >= 3
        # overwritten files are retired, not deleted, until vacuum
        assert t.vacuum(grace_s=3600) == []
        assert len(t.vacuum(grace_s=0.0)) >= 2

    def test_skip_stats_from_log_matches_footer_gauge(self, spark, tmp_path):
        """The z-order loop closed: layout_zorder → deltalite write →
        add.stats → skip_stats prunes from the log with the SAME answer
        as the footer-level gauge, without opening a single data file."""
        import random

        from propulsion_spark.operators.layout import (
            file_skip_stats,
            layout_zorder,
        )
        from propulsion_spark.streaming.deltalite import DeltaliteTable

        rng = random.Random(3)
        df = self._df(
            spark,
            [(rng.randrange(10_000), rng.random() * 100.0) for _ in range(4000)],
        )
        t = DeltaliteTable(spark, str(tmp_path / "z"))
        t.write(layout_zorder(df, ["x", "y"], num_files=16), mode="overwrite")
        box = {"x": (0.0, 500.0)}
        from_log = t.skip_stats(box)
        from_footers = file_skip_stats(t.path, box)
        assert from_log == from_footers
        assert from_log["files"] >= 8
        assert from_log["skipped"] >= from_log["files"] // 2  # layout pays

    def test_empty_table_reads_schema_from_metadata(self, spark, tmp_path):
        from propulsion_spark.streaming.deltalite import DeltaliteTable

        t = DeltaliteTable(spark, str(tmp_path / "d"))
        t.write(self._df(spark, []).coalesce(1))
        out = t.read()
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["x", "y"]


class TestLogModelConformance:
    """Model-based conformance: a random interleaving of merges,
    checkpoints, metadata cleanups and vacuums must always read back
    exactly the newest-wins dict model — the property the protocol's
    whole machinery (replay, checkpoints, atomic commits, retention)
    exists to preserve."""

    def test_random_op_sequences_match_model(self, spark, tmp_path):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from propulsion_spark.streaming.deltalite import (
            DeltalitePositionsTable,
        )

        op = st.one_of(
            st.tuples(
                st.just("merge"),
                st.lists(
                    st.tuples(
                        st.sampled_from(["a", "b", "c", "d"]),
                        st.integers(0, 50),
                        st.integers(0, 3),
                    ),
                    min_size=1,
                    max_size=3,
                ),
            ),
            st.tuples(st.just("checkpoint"), st.none()),
            st.tuples(st.just("cleanup"), st.none()),
            st.tuples(st.just("vacuum"), st.none()),
        )

        case_no = [0]

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        @given(st.lists(op, min_size=2, max_size=8))
        def run(ops):
            case_no[0] += 1
            tbl = DeltalitePositionsTable(
                spark, str(tmp_path / f"t{case_no[0]}"), compact_after=3
            )
            model: dict[str, tuple] = {}
            for kind, arg in ops:
                if kind == "merge":
                    rows = [(s, p, r, False) for s, p, r in arg]
                    _merge(tbl, spark, rows)
                    for s, p, r in arg:
                        # the table's fold is per-column monotonic max
                        # (positions/revisions only advance)
                        cur = model.get(s, (-1, -1))
                        model[s] = (max(cur[0], p), max(cur[1], r))
                elif kind == "checkpoint":
                    tbl.log.checkpoint()
                elif kind == "cleanup":
                    ck = tbl.log.last_checkpoint()
                    if ck is not None:
                        for v in range(ck + 1):
                            try:
                                os.remove(tbl.log._vfile(v))
                            except FileNotFoundError:
                                pass
                elif kind == "vacuum":
                    tbl.vacuum(grace_s=0.0)
                got = {
                    r.stream_name: (r.pos, r.revision)
                    for r in tbl.read().collect()
                }
                assert got == model, (kind, got, model)

        run()


class TestTimeTravel:
    def test_read_version_as_of(self, spark, tmp_path):
        """versionAsOf over the data table: every committed version
        stays readable (until vacuum), overwrites included."""
        from propulsion_spark.streaming.deltalite import DeltaliteTable

        t = DeltaliteTable(spark, str(tmp_path / "d"))
        v1 = t.write(
            spark.createDataFrame([(1,)], "x long").coalesce(1)
        )
        v2 = t.write(
            spark.createDataFrame([(2,)], "x long").coalesce(1), mode="append"
        )
        v3 = t.write(
            spark.createDataFrame([(9,)], "x long").coalesce(1),
            mode="overwrite",
        )
        assert sorted(r.x for r in t.read(version=v1).collect()) == [1]
        assert sorted(r.x for r in t.read(version=v2).collect()) == [1, 2]
        assert sorted(r.x for r in t.read(version=v3).collect()) == [9]
        assert sorted(r.x for r in t.read().collect()) == [9]

    def test_time_travel_ignores_a_newer_checkpoint(self, spark, tmp_path):
        """A checkpoint NEWER than the asked-for version must not feed
        the replay — the snapshot comes from the commit prefix alone."""
        tbl = DeltalitePositionsTable(
            spark, str(tmp_path / "t"), compact_after=10**9
        )
        for i in range(12):
            _merge(tbl, spark, [(f"s-{i}", i + 1, 0, False)])
        assert tbl.log.last_checkpoint() is not None
        _, files = tbl.log.snapshot(version=3)
        assert len(files) == 3  # merges 1..3 only

    def test_cleaned_prefix_raises_for_old_versions(self, spark, tmp_path):
        """After metadata cleanup, versions below the checkpoint are
        gone — asking for one raises instead of answering wrong."""
        tbl = DeltalitePositionsTable(
            spark, str(tmp_path / "t"), compact_after=10**9
        )
        for i in range(12):
            _merge(tbl, spark, [(f"s-{i}", i + 1, 0, False)])
        ck = tbl.log.last_checkpoint()
        for v in range(ck + 1):
            os.remove(tbl.log._vfile(v))
        with pytest.raises(FileNotFoundError):
            tbl.log.snapshot(version=max(ck - 1, 0))
        # at-or-after the checkpoint still answers
        assert tbl.log.snapshot(version=ck)[1]


class TestNativeFormat:
    """r10: spark.read.format('propulsion-deltalite') — snapshot
    isolation + versionAsOf for vanilla readers."""

    def test_snapshot_read_hides_orphans_and_time_travels(
        self, spark, tmp_path
    ):
        from propulsion_spark.streaming.deltalite import (
            DeltaliteTable,
            register_deltalite,
        )

        register_deltalite(spark)
        t = DeltaliteTable(spark, str(tmp_path / "d"))
        v1 = t.write(spark.createDataFrame([(1, 2.0)], "x long, y double").coalesce(1))
        t.write(
            spark.createDataFrame([(3, 4.0)], "x long, y double").coalesce(1),
            mode="append",
        )
        # forge an orphan (crashed writer): invisible to the format,
        # visible to a raw parquet scan — the point of the log
        spark.createDataFrame([(99, 0.0)], "x long, y double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(tmp_path / "orphan"))
        part = next(
            f for f in os.listdir(str(tmp_path / "orphan")) if f.endswith(".parquet")
        )
        os.replace(
            os.path.join(str(tmp_path / "orphan"), part),
            os.path.join(t.path, "part-orphan.parquet"),
        )
        fmt = spark.read.format("propulsion-deltalite").option("path", t.path)
        assert sorted(r.x for r in fmt.load().collect()) == [1, 3]
        assert sorted(
            r.x for r in fmt.option("versionAsOf", str(v1)).load().collect()
        ) == [1]
        raw = {r.x for r in spark.read.parquet(t.path).collect()}
        assert 99 in raw  # the raw scan DOES see the orphan

    def test_schema_comes_from_the_log_metadata(self, spark, tmp_path):
        from propulsion_spark.streaming.deltalite import (
            DeltaliteTable,
            register_deltalite,
        )

        register_deltalite(spark)
        t = DeltaliteTable(spark, str(tmp_path / "d"))
        t.write(spark.createDataFrame([], "a string, b long").coalesce(1))
        df = (
            spark.read.format("propulsion-deltalite")
            .option("path", t.path)
            .load()
        )
        assert [f.name for f in df.schema.fields] == ["a", "b"]
        assert df.count() == 0
