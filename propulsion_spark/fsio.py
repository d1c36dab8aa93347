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
