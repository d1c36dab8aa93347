"""Shared MVCC primitives for the hand-rolled durable tables
(:class:`PositionsTable`, :class:`EventStoreTable`, AppendsIndex).

Two pieces:

- :class:`FileLease` — a cross-process mutation lock. ``threading.Lock``
  only serializes writers inside one driver; two drivers sharing a
  table path (the reference's consumer groups routinely run replicas —
  e.g. lease-based CFP partition balancing,
  ref: src/Propulsion.CosmosStore/ChangeFeedProcessor.fs:37-49) need an
  on-disk lease. Acquisition is ``O_CREAT|O_EXCL`` (atomic on POSIX and
  on the object stores' rename-if-absent analogs); stale leases (holder
  crashed) are broken after ``ttl_s`` via an atomic rename-steal, so a
  dead driver never wedges the table.

- :class:`JsonManifest` — the Delta-log-style segment list. Mutations
  write new immutable segment dirs then atomically replace the manifest
  pointer; readers resolve whatever manifest version they loaded
  (snapshot isolation). One retired generation is kept so plans still
  holding the previous version can finish (Delta's vacuum-retention
  analog, hard-coded to one generation here).

On a cluster with Delta available, both are subsumed by Delta's
optimistic-concurrency commit protocol; the table classes keep the same
public API either way.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class FileLease:
    """Cross-process mutual exclusion for read-modify-write commits.

    Usage::

        with FileLease(table_path):
            ... read manifest, write segments, flip manifest ...
    """

    def __init__(self, dir_path: str, ttl_s: float = 30.0, timeout_s: float = 60.0):
        self.lock_path = os.path.join(dir_path, "_LOCK")
        self.ttl_s = ttl_s
        self.timeout_s = timeout_s
        self._fd: int | None = None

    def _try_acquire(self) -> bool:
        try:
            fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.write(fd, f"{os.getpid()}:{time.time()}".encode())
        os.close(fd)
        self._fd = 1
        return True

    def _steal_if_stale(self) -> None:
        try:
            age = time.time() - os.stat(self.lock_path).st_mtime
        except FileNotFoundError:
            return
        if age > self.ttl_s:
            # break the dead holder's lease; os.replace is atomic so two
            # stealers can't both win (the loser's rename source vanishes)
            stolen = self.lock_path + f".steal.{uuid.uuid4().hex}"
            try:
                os.replace(self.lock_path, stolen)
                os.unlink(stolen)
            except FileNotFoundError:
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
        if self._fd is not None:
            try:
                os.unlink(self.lock_path)
            except FileNotFoundError:
                pass
            self._fd = None


class JsonManifest:
    """Atomic JSON manifest pointer with one-generation segment grace."""

    def __init__(self, dir_path: str, name: str = "_VERSION"):
        self.dir = dir_path
        self.pointer = os.path.join(dir_path, name)
        self._retired: list[str] = []
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
        *previous* flip (one generation of grace for in-flight readers)."""
        import shutil

        old = self.load(None)
        tmp = self.pointer + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(new_value))
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
            if entry == base or entry == "_LOCK" or entry.startswith(base + "."):
                continue  # pointer, lease, in-flight pointer tmp
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
