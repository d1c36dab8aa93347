"""propulsion_spark — a PySpark-native event-stream processing & analytics engine.

A from-scratch re-expression of the capabilities of jet/Propulsion 3.x
(reference surveyed in SURVEY.md) on top of Apache Spark:

- the ``StreamEvent`` envelope (``envelope``) — fixed StructType over
  opaque JSON bodies (ref: src/Propulsion/Streams.fs:150);
- a pure-Python span/state kernel (``kernel``) — write-position dedup,
  span coalescing, slicing, freshest-unfold retention
  (ref: src/Propulsion/Streams.fs:81-147);
- declarative stream/batch operators (``operators``) expressed as
  DataFrame plans so Catalyst handles pushdown/pruning/join selection;
- feed sources (``sources``) built on Structured Streaming micro-batch
  semantics (ref: src/Propulsion/Feed/*);
- sink factories, consumer-group checkpoints, and the stateful span
  buffer (``streaming``) (ref: src/Propulsion/Sinks.fs,
  src/Propulsion.CosmosStore/ReaderCheckpoint.fs);
- large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) as first-class extensions.

Design stance (SURVEY.md §7): Spark's driver loop, offset log, state
store, and task scheduler play the roles of Propulsion's
Ingester/Submitter/Scheduler/Dispatcher; we implement only the data
semantics on top.
"""

__version__ = "0.1.0"

from propulsion_spark.session import get_spark  # noqa: F401

_SHIPPED: set[str] = set()


def ensure_shipped(spark) -> None:
    """Make this package importable inside Spark's Python workers.

    Executor-side code (grouped-map handlers, the stateful kernel)
    pickles closures that reference this module by name; workers must
    be able to import it. On a cluster this is the --py-files story;
    here we zip the package once per SparkContext and addPyFile it, so
    the engine works regardless of the driver process's cwd/sys.path.
    """
    import os
    import shutil
    import tempfile

    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(tempfile.gettempdir(), f"propulsion_spark_{os.getpid()}")
    zip_path = shutil.make_archive(base, "zip", os.path.dirname(pkg_dir), "propulsion_spark")
    sc.addPyFile(zip_path)
    _SHIPPED.add(app_id)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark, sf_dir: str, name: str):
    """Load one of the driver-generated parquet tables.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read it as raw nanos and truncate to microseconds —
    exactly what DuckDB does on scan, so both engines see identical ts.
    """
    # Deterministic time semantics regardless of host/session defaults
    # (window/date_trunc operate in session TZ).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dict(df.dtypes).get("ts") == "timestamp_ntz":
            # Driver-generated parquet stores tz-naive micros; Spark 4
            # infers TIMESTAMP_NTZ, which epoch functions (unix_micros)
            # reject. With the session TZ pinned to UTC above, the cast
            # maps wall-clock → the identical instant DuckDB sees, so
            # both engines keep computing on the same values.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
