"""Consumer-group checkpoint store — durable positions per
(source, tranche, group).

Mirrors the reference's ``IFeedCheckpointStore`` surface
(ref: src/Propulsion/Feed/Feed.fs:31-35) and ReaderCheckpoint
semantics (ref: src/Propulsion.CosmosStore/ReaderCheckpoint.fs:88-155):
``start`` resolves the origin (establishOrigin when absent),
``commit`` persists the newest position, ``override_position`` resets,
and commits are throttled (``commit_interval_s``, ref default 5 s —
src/Propulsion/Ingestion.fs:131-135) with the newest-wins rule of
ProgressWriter (ref: src/Propulsion/Ingestion.fs:11-33).

Storage: an append-only parquet log of position records; the current
position of a key is the row with the highest ``seq``. Appends are
tiny single-row files (one per commit, throttled), compacted when the
log grows — the same shape as the reference's event-sourced checkpoint
streams with periodic snapshots. At cluster scale this becomes a Delta
table MERGE; the API is identical. Volume is one row per consumer
group per commit interval — never a data-plane bottleneck.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from dataclasses import dataclass, field

import pandas as pd


@dataclass
class _Pending:
    pos: int
    dirty: bool = False


@dataclass
class CheckpointStore:
    path: str
    group: str
    commit_interval_s: float = 5.0
    _pending: dict[tuple[str, str], _Pending] = field(default_factory=dict)
    _last_commit: float = 0.0

    def __post_init__(self) -> None:
        # tranche pumps commit concurrently; pending-dict mutation and
        # the flush/compact read-modify-write must serialize
        self._lock = threading.Lock()
        os.makedirs(self.path, exist_ok=True)

    # ---- storage primitives -------------------------------------------
    def _files(self) -> list[str]:
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".parquet")
        )

    def _read_all(self) -> pd.DataFrame:
        # A concurrent _maybe_compact removes segments after writing the
        # compacted file; a listing taken BEFORE that rename could both
        # miss the compacted file and hit FileNotFoundError on the removed
        # segments — skipping those would silently drop every compacted
        # row (a start() on that view would roll positions back to
        # origin).  Any FileNotFoundError therefore invalidates the whole
        # listing: re-list and re-read until one listing reads cleanly.
        # Bounded: a PERSISTENT phantom (e.g. a dangling symlink left by
        # an external tool) is listed on every pass but never readable —
        # raise loudly instead of spinning forever.
        for _attempt in range(50):
            files = self._files()
            frames = []
            clean = True
            for f in files:
                try:
                    frames.append(pd.read_parquet(f))
                except FileNotFoundError:
                    failing = f
                    clean = False
                    break
            if clean:
                break
            time.sleep(0.01)
        else:
            raise RuntimeError(
                f"checkpoint store {self.path}: segment {failing} is "
                "listed but unreadable after 50 attempts — not a "
                "compaction race; remove the dangling entry"
            )
        if not frames:
            return pd.DataFrame(
                columns=["source", "tranche", "grp", "pos", "seq", "updated_at"]
            )
        return pd.concat(frames, ignore_index=True)

    def _append(self, rows: list[dict]) -> None:
        # tmp + atomic rename: tranche pumps read (start/snapshot) without
        # the writer lock, so a segment must never be visible under its
        # final name until its bytes are complete — a direct to_parquet
        # exposes a partial file to a concurrent reader (observed as an
        # ArrowInvalid "file size is 4 bytes" crash under parallel pumps)
        df = pd.DataFrame(rows)
        tmp = os.path.join(self.path, f"ckpt-{uuid.uuid4().hex}.tmp")
        df.to_parquet(tmp)
        os.replace(tmp, os.path.join(self.path, f"ckpt-{uuid.uuid4().hex}.parquet"))

    def snapshot(self) -> pd.DataFrame:
        """Current position per (source, tranche, group): newest-wins."""
        df = self._read_all()
        if df.empty:
            return df
        df = df.sort_values("seq")
        return df.groupby(["source", "tranche", "grp"], as_index=False).last()

    # ---- IFeedCheckpointStore surface ---------------------------------
    def start(self, source: str, tranche: str, establish_origin=None) -> int:
        """Resolve the starting position for a tranche; persist the
        established origin when the store has none (ref: ReaderCheckpoint
        ``Start`` + ``establishOrigin``)."""
        snap = self.snapshot()
        if not snap.empty:
            hit = snap[
                (snap.source == source)
                & (snap.tranche == tranche)
                & (snap.grp == self.group)
            ]
            if len(hit):
                return int(hit.pos.iloc[0])
        origin = int(establish_origin() if callable(establish_origin) else (establish_origin or 0))
        self._append_now(source, tranche, origin, kind="Started")
        return origin

    def commit(self, source: str, tranche: str, pos: int) -> None:
        """Record the newest validated position; actual write is throttled
        to ``commit_interval_s`` (newest wins, dirty retried next tick)."""
        with self._lock:
            key = (source, tranche)
            cur = self._pending.get(key)
            if cur is None or pos > cur.pos:
                self._pending[key] = _Pending(pos=int(pos), dirty=True)
        self.flush(force=False)

    def flush(self, force: bool = True) -> None:
        with self._lock:
            now = time.monotonic()
            if not force and now - self._last_commit < self.commit_interval_s:
                return
            dirty = [(k, p) for k, p in self._pending.items() if p.dirty]
            if not dirty:
                return
            seq = time.time_ns()
            rows = []
            for (source, tranche), p in dirty:
                rows.append(
                    {
                        "source": source,
                        "tranche": tranche,
                        "grp": self.group,
                        "pos": p.pos,
                        "seq": seq,
                        "updated_at": pd.Timestamp.utcnow().tz_localize(None),
                    }
                )
                p.dirty = False
            self._append(rows)
            self._last_commit = now
            self._maybe_compact()

    def override_position(self, source: str, tranche: str, pos: int) -> None:
        """Unconditional reset (ref: ReaderCheckpoint ``Override``)."""
        self._pending.pop((source, tranche), None)
        self._append_now(source, tranche, pos, kind="Overrode")

    def position(self, source: str, tranche: str) -> int | None:
        key = (source, tranche)
        if key in self._pending:
            return self._pending[key].pos
        snap = self.snapshot()
        if snap.empty:
            return None
        hit = snap[
            (snap.source == source)
            & (snap.tranche == tranche)
            & (snap.grp == self.group)
        ]
        return int(hit.pos.iloc[0]) if len(hit) else None

    # ---- internals -----------------------------------------------------
    def _append_now(self, source: str, tranche: str, pos: int, kind: str) -> None:
        self._append(
            [
                {
                    "source": source,
                    "tranche": tranche,
                    "grp": self.group,
                    "pos": int(pos),
                    "seq": time.time_ns(),
                    "updated_at": pd.Timestamp.utcnow().tz_localize(None),
                }
            ]
        )

    def _maybe_compact(self, max_files: int = 64) -> None:
        """Fold the log into one snapshot file once it grows (the
        reference's snapshot/unfold trick, ReaderCheckpoint.fs:74-87)."""
        files = self._files()
        if len(files) <= max_files:
            return
        snap = self.snapshot()
        tmp = os.path.join(self.path, f"compact-{uuid.uuid4().hex}.parquet.tmp")
        snap.to_parquet(tmp)
        os.rename(tmp, os.path.join(self.path, f"ckpt-{uuid.uuid4().hex}.parquet"))
        for f in files:
            os.remove(f)

    def to_json(self) -> str:
        snap = self.snapshot()
        return json.dumps(
            {
                f"{r.source}/{r.tranche}/{r.grp}": int(r.pos)
                for r in snap.itertuples()
            }
        )
