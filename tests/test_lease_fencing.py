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
