"""SparkSession factory tuned for the engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same
config block is what we would ship as cluster defaults (AQE on,
shuffle partitions sized to parallelism, Arrow enabled, UTC session
timezone so results are comparable across engines).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "propulsion-spark",
    cpus: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    # local mode: shuffle partitions ~ cores; on a real cluster this is
    # left to AQE coalescing from a higher initial value.
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus in ("*", "") else max(int(cpus), 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cluster_conf(
    executors: int = 1000,
    cores_per_executor: int = 4,
    target_partition_mb: int = 256,
) -> dict:
    """Recommended configuration for the 100 TB deployment — the same
    engine code, sized for a real cluster instead of local[32].

    Rationale per knob:

    - shuffle partitions ≈ 2-3× total cores as the AQE *initial* value;
      ``advisoryPartitionSizeInBytes`` lets AQE coalesce down so
      post-filter stages don't run thousands of empty tasks.
    - ``files.maxPartitionBytes`` sizes scan splits so a 100 TB input
      yields partitions that fit executor memory with headroom
      (spill-aware: shuffle spill remains enabled, compressed).
    - skew-join splitting handles hot streams/buckets (a viral stream,
      a stop-word shingle) without manual salting.
    - RocksDB state store keeps the stateful span buffer off-heap and
      incremental-checkpointed — required once per-stream state exceeds
      executor heap.
    - Kryo + Arrow batch size tune the serialization paths the sinks use.
    """
    total_cores = executors * cores_per_executor
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": f"{target_partition_mb}m",
        "spark.sql.shuffle.partitions": str(total_cores * 2),
        "spark.sql.files.maxPartitionBytes": f"{target_partition_mb}m",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        "spark.shuffle.spill.compress": "true",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
    }
