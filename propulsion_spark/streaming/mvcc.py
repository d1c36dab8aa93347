"""Shared MVCC primitives for the hand-rolled durable tables
(:class:`PositionsTable`, :class:`EventStoreTable`, AppendsIndex).

Two pieces:

- :class:`FileLease` — a cross-process mutation lock. ``threading.Lock``
  only serializes writers inside one driver; two drivers sharing a
  table path (the reference's consumer groups routinely run replicas —
  e.g. lease-based CFP partition balancing,
  ref: src/Propulsion.CosmosStore/ChangeFeedProcessor.fs:37-49) need an
  on-disk lease. Acquisition is ``O_CREAT|O_EXCL`` (atomic on POSIX);
  the holder's identity is a unique **owner token** written into the
  lock file, and a daemon **heartbeat** refreshes the lock mtime every
  ``ttl_s/4`` while held — so a live holder running long Spark jobs
  inside its critical section is never mistaken for a crashed one.
  Stale leases (no heartbeat for > ``ttl_s``) are broken via an atomic
  rename-steal that re-verifies the token it observed before breaking
  (a fresh lease that raced in is restored, or — if yet another lease
  appeared — left to fail its own fencing check).

- :class:`JsonManifest` — the Delta-log-style segment list. Mutations
  write new immutable segment dirs then atomically replace the manifest
  pointer; readers resolve whatever manifest version they loaded
  (snapshot isolation). One retired generation is kept so plans still
  holding the previous version can finish (Delta's vacuum-retention
  analog, hard-coded to one generation here). The pointer flip is
  **fenced**: when a lease is attached (``manifest.fence``), the flip
  verifies the lock file still carries the holder's token and raises
  :class:`LeaseLostError` otherwise — a holder whose lease was broken
  fails LOUDLY instead of silently overwriting the new holder's commit
  and dropping its segments.

Defense in depth: the heartbeat makes wrongful steals rare (a holder
must be wedged for a full ``ttl_s`` with no heartbeat), and the fence
turns any residual mutual-exclusion failure into an exception before
the manifest is overwritten. The unavoidable check-to-replace windows
(microseconds, no Spark work inside them) are documented at each site.

Non-POSIX deployment story (100 TB, object stores): S3/GCS/ABFS have no
atomic create-if-absent file primitive, so ``FileLease`` as written
targets POSIX-complete filesystems (local, NFSv4, HDFS, DBFS-on-FUSE).
On object stores use one of the named mechanisms instead, behind the
same ``with table.lease():`` surface:

- **Conditional writes**: S3 ``PutObject`` with ``If-None-Match: *``
  (since 2024), GCS ``x-goog-if-generation-match: 0``, ABFS ETag
  preconditions — a direct drop-in for create-if-absent + token check.
- **A lock table**: DynamoDB conditional ``PutItem`` / ZooKeeper
  ephemeral nodes (the classic Delta-on-S3 ``LogStore`` recipe).
- **Delta Lake's log-based OCC** (``delta.DeltaTable``): its commit
  protocol subsumes both the lease and the manifest — see
  ``streaming/delta_backend.py`` for adapters that swap these tables
  for Delta MERGE/DELETE/OPTIMIZE with the same public API.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid


class LeaseLostError(RuntimeError):
    """The holder's lease was broken (stolen after apparent staleness)
    while a commit was in flight; the commit must NOT flip the manifest."""


class FileLease:
    """Cross-process mutual exclusion for read-modify-write commits.

    Usage::

        with FileLease(table_path) as lease:
            ... read manifest, write segments ...
            lease.verify()          # or manifest.fence = lease → flip checks
            ... flip manifest ...
    """

    def __init__(
        self,
        dir_path: str,
        ttl_s: float = 30.0,
        timeout_s: float = 60.0,
        heartbeat: bool = True,
        counters: dict | None = None,
    ):
        self.lock_path = os.path.join(dir_path, "_LOCK")
        self.ttl_s = ttl_s
        self.timeout_s = timeout_s
        #: unique owner identity — doubles as the fencing token
        self.token = uuid.uuid4().hex
        self.heartbeat = heartbeat
        self._hb_stop: threading.Event | None = None
        self._hb_thread: threading.Thread | None = None
        self._held = False
        #: liveness counters, exported as ``propulsion_lease_*`` by
        #: MetricsExporter (GIL-atomic increments; approximate by design).
        #: Leases are per-commit ephemerals — pass the owning table's
        #: dict so totals accumulate across commits.
        self.counters = (
            counters
            if counters is not None
            else {"heartbeats": 0, "steals": 0, "lost": 0}
        )

    # ---- token helpers ----------------------------------------------------
    def _read_token(self) -> str | None:
        try:
            with open(self.lock_path) as f:
                return f.read().split(":", 1)[0]
        except (FileNotFoundError, OSError):
            return None

    def owns(self) -> bool:
        return self._held and self._read_token() == self.token

    def verify(self) -> None:
        """Fencing check: raise if the lock no longer carries our token
        (a peer judged us stale and stole the lease mid-commit)."""
        if not self.owns():
            self.counters["lost"] += 1
            raise LeaseLostError(
                f"lease {self.lock_path} lost mid-commit (token {self.token[:8]}… "
                "no longer on the lock file) — refusing to flip the manifest"
            )

    # ---- acquisition ------------------------------------------------------
    def _try_acquire(self) -> bool:
        try:
            fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.write(fd, f"{self.token}:{os.getpid()}:{time.time()}".encode())
        os.close(fd)
        self._held = True
        if self.heartbeat:
            self._hb_stop = threading.Event()
            self._hb_thread = threading.Thread(
                target=self._hb_loop, name="lease-heartbeat", daemon=True
            )
            self._hb_thread.start()
        return True

    def _hb_loop(self) -> None:
        # refresh mtime at 4× the staleness rate so a live holder inside a
        # long Spark job never looks stale. Two failure modes must NOT
        # kill the heartbeat (a dead heartbeat silently re-opens the
        # wrongful-steal window this thread exists to close):
        # - transient OSErrors (NFS blip): retry next tick;
        # - a momentarily-absent/foreign token (a racing steal's
        #   rename→link-restore window): require the mismatch on TWO
        #   consecutive ticks (fresh open+read each time) before giving
        #   up, and log when we do — a real thief holds the lock for
        #   far longer than one tick, a restore round-trip does not.
        assert self._hb_stop is not None
        misses = 0
        while not self._hb_stop.wait(self.ttl_s / 4):
            try:
                with open(self.lock_path) as f:
                    tok = f.read().split(":", 1)[0]
            except FileNotFoundError:
                tok = None
            except OSError:
                continue  # transient — keep heartbeating
            if tok != self.token:
                misses += 1
                if misses >= 2:
                    import logging

                    logging.getLogger(__name__).warning(
                        "lease heartbeat for %s stopping: token %s… replaced "
                        "on two consecutive ticks (lease stolen); the next "
                        "fenced flip will abort",
                        self.lock_path,
                        self.token[:8],
                    )
                    self.counters["lost"] += 1
                    return
                continue
            misses = 0
            try:
                os.utime(self.lock_path, None)
                self.counters["heartbeats"] += 1
            except OSError:
                pass  # transient — retry next tick

    def _steal_if_stale(self) -> None:
        # fd-coherent observation: fstat + read describe the SAME lease
        # generation (same inode), so age and token can't come from two
        # different leases
        try:
            fd = os.open(self.lock_path, os.O_RDONLY)
        except (FileNotFoundError, OSError):
            return
        try:
            st = os.fstat(fd)
            observed = os.read(fd, 256).decode(errors="replace").split(":", 1)[0]
        finally:
            os.close(fd)
        if time.time() - st.st_mtime <= self.ttl_s:
            return
        # break the apparently-dead holder's lease; os.replace is atomic so
        # two stealers can't both win (the loser's rename source vanishes)
        stolen = self.lock_path + f".steal.{uuid.uuid4().hex}"
        try:
            os.replace(self.lock_path, stolen)
        except (FileNotFoundError, OSError):
            return
        try:
            with open(stolen) as f:
                actual = f.read().split(":", 1)[0]
        except OSError:
            actual = None
        if actual == observed:
            os.unlink(stolen)  # confirmed: we broke the stale lease we observed
            self.counters["steals"] += 1
            return
        # A FRESH lease raced in between our read and the rename — restore
        # it atomically iff no newer one has appeared since (os.link fails
        # with EEXIST rather than clobbering). HDFS / DBFS-on-FUSE have no
        # hard links: fall back to os.replace guarded by a re-check that
        # no newer lease appeared (a narrow window, acceptable because if
        # the restore loses or double-restores, the affected holder's next
        # verify()/fenced flip fails loudly — fencing, not this steal
        # path, is the correctness backstop).
        try:
            os.link(stolen, self.lock_path)
        except FileExistsError:
            pass  # a newer lease beat us; leave it be
        except OSError:
            if not os.path.exists(self.lock_path):
                try:
                    os.replace(stolen, self.lock_path)
                    return  # replace consumed the stolen file
                except OSError:
                    pass
        try:
            os.unlink(stolen)
        except OSError:
            pass

    def __enter__(self) -> "FileLease":
        deadline = time.time() + self.timeout_s
        delay = 0.005
        while True:
            if self._try_acquire():
                return self
            self._steal_if_stale()
            if time.time() > deadline:
                raise TimeoutError(f"could not acquire lease {self.lock_path}")
            time.sleep(delay)
            delay = min(delay * 2, 0.25)

    def __exit__(self, *exc) -> None:
        if not self._held:
            return
        if self._hb_stop is not None:
            self._hb_stop.set()
            if self._hb_thread is not None:
                self._hb_thread.join(timeout=5.0)
            self._hb_stop = self._hb_thread = None
        # release only what we still own — never unlink a thief's lease
        # (the read→unlink window is lock-free microseconds; a thief that
        # slips in loses its lock file but is protected by its own fence)
        try:
            if self._read_token() == self.token:
                os.unlink(self.lock_path)
        except (FileNotFoundError, OSError):
            pass
        self._held = False


class JsonManifest:
    """Atomic JSON manifest pointer with one-generation segment grace
    and an optional fencing lease checked at every flip."""

    def __init__(self, dir_path: str, name: str = "_VERSION"):
        self.dir = dir_path
        self.pointer = os.path.join(dir_path, name)
        self._retired: list[str] = []
        #: when set (by the table's commit scope), flip() verifies this
        #: lease's token right before the pointer swap
        self.fence: FileLease | None = None
        os.makedirs(dir_path, exist_ok=True)

    def load(self, default):
        try:
            with open(self.pointer) as f:
                raw = f.read().strip()
            return json.loads(raw) if raw else default
        except FileNotFoundError:
            return default

    def segments_of(self, value) -> set[str]:
        """Every segment path referenced by a manifest value (top-level
        dirs only — 'seg-x/bucket=3' retires with 'seg-x')."""
        out: set[str] = set()

        def walk(v):
            if isinstance(v, str):
                out.add(v.split("/", 1)[0])
            elif isinstance(v, list):
                for x in v:
                    walk(x)
            elif isinstance(v, dict):
                for x in v.values():
                    walk(x)

        walk(value)
        return out

    def flip(self, new_value) -> None:
        """Atomically replace the manifest; retire segments dropped by the
        *previous* flip (one generation of grace for in-flight readers).

        Fenced: if a lease is attached, verify its token immediately
        before the pointer swap — a holder whose lease was stolen raises
        :class:`LeaseLostError` here instead of silently overwriting the
        thief's commit. The verify→replace pair runs under an
        ``fcntl.flock`` on a stable ``_FENCE`` file (never renamed by the
        steal path, auto-released by the kernel on crash), so on local /
        NFSv4 filesystems no scheduler pause between verify and replace
        can interleave another flip: a stale holder paused there blocks
        the thief's flip until its own replace lands, and its verify —
        serialized under the same flock — already sees the thief's token
        and aborts. On filesystems without flock semantics this degrades
        to the previous microseconds-wide window, with the heartbeat
        still shrinking wrongful steals to full-``ttl_s`` wedges."""
        import shutil

        old = self.load(None)
        tmp = self.pointer + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(new_value))
        if self.fence is not None:
            fence_fd = None
            try:
                try:
                    import fcntl

                    fence_fd = os.open(
                        os.path.join(self.dir, "_FENCE"), os.O_CREAT | os.O_RDWR
                    )
                    fcntl.flock(fence_fd, fcntl.LOCK_EX)
                except (ImportError, OSError):
                    if fence_fd is not None:
                        os.close(fence_fd)
                    fence_fd = None  # degrade: verify-then-replace
                try:
                    self.fence.verify()
                except LeaseLostError:
                    os.unlink(tmp)
                    raise
                os.replace(tmp, self.pointer)
            finally:
                if fence_fd is not None:
                    os.close(fence_fd)  # releases the flock
        else:
            os.replace(tmp, self.pointer)
        gone = (
            self.segments_of(old) - self.segments_of(new_value)
            if old is not None
            else set()
        )
        for stale in self._retired:
            shutil.rmtree(os.path.join(self.dir, stale), ignore_errors=True)
        self._retired = sorted(gone)

    def vacuum(self, grace_s: float = 3600.0) -> list[str]:
        """Remove segment dirs the current manifest does not reference
        and that are older than ``grace_s`` (Delta VACUUM analog).

        Two leak paths need this: a crash between segment write and
        manifest flip (the segment is never referenced), and a crash
        before the flip *after* the one that retired a generation (the
        in-memory ``_retired`` grace list dies with the process). The
        age guard keeps (a) segments a concurrent commit has written
        but not yet flipped and (b) the read-grace generation safe —
        callers hold the table lease, so no flip races the scan itself.

        Returns the removed names (for operator logs)."""
        import shutil

        keep = self.segments_of(self.load(None))
        base = os.path.basename(self.pointer)
        removed: list[str] = []
        now = time.time()
        for entry in os.listdir(self.dir):
            if (
                entry == base
                or entry == "_LOCK"
                or entry == "_FENCE"
                or entry == "_cdc"
                or (
                    entry.startswith(base + ".")
                    and not entry.endswith(".tmp")
                )
            ):
                continue  # pointer, lease, fence, change-feed log
            # pointer tmp files leaked by a crash mid-flip (the unlink
            # only runs on the fenced-abort path) fall through to the
            # age-guarded delete, like _LOCK.steal.* leaks
            # NOTE: _LOCK.steal.* files (leaked by a crash between a
            # steal's os.replace and os.unlink) deliberately fall through
            # to the age-guarded delete below, so they are reclaimed once
            # older than grace_s instead of accumulating forever.
            # _SPOOL-* dirs fall through too: LIVE sinks refresh their
            # retained spools' mtimes on every batch (_SpoolRotation.next),
            # keeping them inside the grace window; spools of DEAD sinks
            # stop being refreshed and age out here.
            if entry in keep:
                continue
            path = os.path.join(self.dir, entry)
            try:
                if now - os.stat(path).st_mtime <= grace_s:
                    continue
            except FileNotFoundError:
                continue
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            else:
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
            removed.append(entry)
        self._retired = [r for r in self._retired if r not in removed]
        return sorted(removed)
