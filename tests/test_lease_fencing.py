"""Fencing/heartbeat behavior of the FileLease (ADVICE r2 high item).

The three failure modes the round-2 review identified, each pinned:

1. a LIVE holder inside a long commit must not be stolen from — the
   heartbeat keeps the lock fresh however long the critical section runs;
2. a genuinely-stale holder (no heartbeat — crashed or wedged process)
   IS stolen from, but its later manifest flip must fail LOUDLY
   (LeaseLostError) instead of silently overwriting the thief's commit;
3. releasing a lost lease must never unlink the successor's lock file.
"""

from __future__ import annotations

import os
import threading
import time

import pytest

from propulsion_spark.streaming.mvcc import FileLease, JsonManifest, LeaseLostError
from propulsion_spark.streaming.positions import PositionsTable


class TestLeaseFencing:
    def test_heartbeat_prevents_steal_of_live_slow_holder(self, tmp_path):
        """A holder whose commit runs 3× past ttl_s keeps the lease: the
        heartbeat refreshes mtime, so a peer's steal never fires."""
        d = str(tmp_path)
        with FileLease(d, ttl_s=0.4) as a:
            time.sleep(1.2)  # "long Spark job" inside the critical section
            with pytest.raises(TimeoutError):
                with FileLease(d, ttl_s=0.4, timeout_s=1.0):
                    raise AssertionError("live holder must not be stolen from")
            a.verify()  # still the owner after the contention
        assert not os.path.exists(os.path.join(d, "_LOCK"))

    def test_paused_holder_flip_fails_loudly(self, tmp_path):
        """Holder sleeps > ttl_s mid-commit with no heartbeat (the
        wedged/crashed inference is then CORRECT to act on); the stealer
        proceeds; the stale holder's later flip must raise, not drop the
        stealer's segments."""
        d = str(tmp_path)
        man_a = JsonManifest(d)
        man_a.flip(["base"])
        a = FileLease(d, ttl_s=0.4, heartbeat=False)
        a.__enter__()
        man_a.fence = a
        try:
            time.sleep(1.0)  # paused past ttl — lease now legitimately stale
            with FileLease(d, ttl_s=0.4, timeout_s=5.0) as b:
                man_b = JsonManifest(d)
                man_b.fence = b
                man_b.flip(["base", "seg-from-b"])
            with pytest.raises(LeaseLostError):
                man_a.flip(["seg-from-a-only"])
            # the thief's commit survived; no in-flight .tmp debris either
            assert JsonManifest(d).load(None) == ["base", "seg-from-b"]
            assert not [p for p in os.listdir(d) if ".tmp" in p]
        finally:
            a.__exit__()

    def test_release_never_unlinks_successor_lease(self, tmp_path):
        d = str(tmp_path)
        a = FileLease(d, ttl_s=0.3, heartbeat=False)
        a.__enter__()
        time.sleep(0.8)
        b = FileLease(d, ttl_s=0.3, timeout_s=5.0)
        b.__enter__()
        a.__exit__()  # lost the lease; must leave b's lock alone
        assert b.owns()
        b.__exit__()
        assert not os.path.exists(os.path.join(d, "_LOCK"))

    def test_steal_leaves_fresh_lease_alone(self, tmp_path):
        d = str(tmp_path)
        with FileLease(d, ttl_s=30.0) as a:
            thief = FileLease(d, ttl_s=30.0, timeout_s=0.1)
            thief._steal_if_stale()  # fresh lease: must be a no-op
            assert a.owns()

    def test_flip_without_fence_unchanged(self, tmp_path):
        man = JsonManifest(str(tmp_path))
        man.flip(["s1"])
        assert man.load(None) == ["s1"]


class TestHeartbeatResilience:
    def test_heartbeat_survives_transient_lock_absence(self, tmp_path):
        """A racing steal's rename→restore window makes the lock vanish
        for a moment; the heartbeat must NOT give up on one missed tick —
        after the restore it keeps refreshing and the holder stays safe
        past ttl_s."""
        d = str(tmp_path)
        lock = os.path.join(d, "_LOCK")
        with FileLease(d, ttl_s=0.8) as a:
            os.replace(lock, lock + ".steal.test")  # vanish for < 1 tick
            time.sleep(0.1)
            os.replace(lock + ".steal.test", lock)  # restored
            time.sleep(1.6)  # 2× ttl: without a live heartbeat this is stale
            assert a._hb_thread is not None and a._hb_thread.is_alive()
            thief = FileLease(d, ttl_s=0.8, timeout_s=0.5)
            with pytest.raises(TimeoutError):
                thief.__enter__()
            a.verify()

    def test_heartbeat_stops_after_confirmed_token_mismatch(self, tmp_path):
        """A genuinely-replaced token (two consecutive ticks) stops the
        heartbeat — it must never refresh a thief's lease into
        immortality."""
        d = str(tmp_path)
        lock = os.path.join(d, "_LOCK")
        with FileLease(d, ttl_s=0.4) as a:
            with open(lock, "w") as f:
                f.write("feedfeedfeedfeed:0:0")  # thief's token
            time.sleep(0.5)  # > 2 ticks (tick = 0.1s)
            assert a._hb_thread is not None
            a._hb_thread.join(timeout=2.0)
            assert not a._hb_thread.is_alive()
            with pytest.raises(LeaseLostError):
                a.verify()


class TestVacuumDebris:
    def test_vacuum_reclaims_aged_steal_files(self, tmp_path):
        """_LOCK.steal.* leaked by a crash mid-steal are deleted once
        older than grace_s; fresh ones (a steal in flight) survive."""
        d = str(tmp_path)
        man = JsonManifest(d)
        man.flip(["seg-live"])
        os.makedirs(os.path.join(d, "seg-live"), exist_ok=True)
        old_steal = os.path.join(d, "_LOCK.steal.deadbeef")
        new_steal = os.path.join(d, "_LOCK.steal.cafebabe")
        for p in (old_steal, new_steal):
            with open(p, "w") as f:
                f.write("tok:0:0")
        past = time.time() - 7200
        os.utime(old_steal, (past, past))
        removed = man.vacuum(grace_s=3600.0)
        assert "_LOCK.steal.deadbeef" in removed
        assert os.path.exists(new_steal)
        assert os.path.exists(os.path.join(d, "seg-live"))

    def test_vacuum_spares_fence_file(self, tmp_path):
        d = str(tmp_path)
        man = JsonManifest(d)
        lease = FileLease(d)
        with lease:
            man.fence = lease
            man.flip(["seg-a"])  # creates _FENCE under flock
        past = time.time() - 7200
        fence = os.path.join(d, "_FENCE")
        assert os.path.exists(fence)
        os.utime(fence, (past, past))
        removed = man.vacuum(grace_s=3600.0)
        assert "_FENCE" not in removed
        assert os.path.exists(fence)


class TestSlowCommitIntegration:
    def test_slow_commit_with_heartbeat_survives_concurrent_driver(
        self, spark, tmp_path
    ):
        """Two 'drivers' share a positions path with a short ttl; driver A's
        commit stalls 3× past ttl inside the lease. With the heartbeat, B
        waits instead of stealing, and both merges survive."""
        path = str(tmp_path / "pos")
        a = PositionsTable(spark, path, lease_ttl_s=0.5)
        b = PositionsTable(spark, path, lease_ttl_s=0.5)
        schema = "stream_name string, pos long, revision long, malformed boolean"

        orig_flip = a.manifest.flip

        def slow_flip(value):
            time.sleep(1.5)  # long tail of a big compaction job
            orig_flip(value)

        a.manifest.flip = slow_flip
        errors: list[Exception] = []

        def run(tbl, stream):
            try:
                tbl.merge(spark.createDataFrame([(stream, 9, 0, False)], schema))
            except Exception as ex:  # noqa: BLE001
                errors.append(ex)

        t1 = threading.Thread(target=run, args=(a, "slow-a"))
        t2 = threading.Thread(target=run, args=(b, "fast-b"))
        t1.start()
        time.sleep(0.1)  # a acquires first
        t2.start()
        t1.join(), t2.join()
        assert not errors
        assert {r.stream_name for r in a.read().collect()} == {"slow-a", "fast-b"}
