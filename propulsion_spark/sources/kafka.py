"""Kafka source/sink wiring (SURVEY.md §2.1 S6, §2.4 W4-W6; ref:
src/Propulsion.Kafka/Consumers.fs:48-128, ProducerSinks.fs, Producers.fs).

No broker (or kafka connector jars) ship in this container, so these
builders are import/config-guarded: they construct the full Structured
Streaming plans and translate the reference's tuning knobs, raising a
clear error only when actually started without the connector.

Knob translation (ref defaults in parentheses):

- ``maxBatchSize``/read-ahead byte budget  → ``maxOffsetsPerTrigger``
  (built-in backpressure; ref InFlightMessageCounter, Consumers.fs:97-125)
- per-TopicPartition buffering/ordering    → source partition = tranche
- ``StoreOffset(highWaterMark)`` commits   → Spark's offset/commit log
- producer linger 5ms / LZ4 (Producers.fs:12-27) → kafka.linger.ms /
  kafka.compression.type options
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propulsion_spark.envelope import parse_with_default_category, with_synthetic_index


def kafka_available(spark: SparkSession) -> bool:
    """True when the kafka DSv2 connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    max_offsets_per_trigger: int | None = 100_000,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream plan for Kafka; raises if the connector is absent."""
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka connector (spark-sql-kafka-0-10) is not on the classpath; "
            "add the package to use KafkaSource"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def kafka_messages_to_envelope(
    messages: DataFrame,
    default_category: str = "kafka",
    base_positions: DataFrame | None = None,
) -> DataFrame:
    """Kafka records → envelope rows (F4/F5 analog; ref:
    Consumers.fs:241-328): the key parses to ``{category}-{id}`` (null
    keys get a synthetic name from topic/partition), the synthetic
    per-stream index comes from the offset order, context =
    (topic, partition, offset) rides in meta.

    ``base_positions`` (stream_name, pos) continues each stream's index
    from its sink position instead of 0 — the cross-batch monotonicity
    of the reference's StreamNameSequenceGenerator (which keeps a
    running per-stream counter for the consumer's lifetime,
    ref: src/Propulsion.Kafka/Consumers.fs:241-266). Without it a
    second batch of an already-seen stream restarts at idx 0 and the
    sink's write-pos dedup would swallow genuinely-new messages.

    Works identically on a batch DataFrame with the same columns —
    that is how it is tested without a broker.
    """
    named = messages.select(
        parse_with_default_category(
            F.coalesce(
                F.col("key").cast("string"),
                F.concat_ws("_", F.lit("Messages"), F.col("topic"), F.col("partition")),
            ),
            default_category,
        ).alias("stream_name"),
        F.col("value").cast("string").alias("data"),
        F.col("timestamp").alias("ts"),
        F.to_json(F.struct("topic", "partition", "offset")).alias("meta"),
        F.col("offset"),
    )
    named = named.select(
        "*", F.substring_index("stream_name", "-", 1).alias("category")
    )
    indexed = with_synthetic_index(named, "stream_name", ["offset"])
    if base_positions is not None:
        base = base_positions.select(
            "stream_name", F.col("pos").alias("_base_pos")
        )
        indexed = indexed.join(base, "stream_name", "left").withColumn(
            "idx", F.col("idx") + F.coalesce(F.col("_base_pos"), F.lit(0))
        )
    return indexed.select(
        "stream_name",
        "category",
        "idx",
        F.lit("Message").alias("event_type"),
        "data",
        "meta",
        F.col("offset").alias("event_id"),
        "ts",
        F.lit(False).alias("is_unfold"),
        F.length("data").cast("long").alias("size"),
    )


def kafka_producer_sink(
    rendered: DataFrame,
    brokers: str,
    topic: str,
    checkpoint_location: str,
    linger_ms: int = 5,  # ref: Producers.fs:12-27
    compression: str = "lz4",
):
    """writeStream plan for ordered per-key production (W5 analog):
    ``rendered`` must have (key, value) — see functions.codec.render_spans.
    Per-stream ordering is preserved by the key partitioner."""
    if not kafka_available(rendered.sparkSession):
        raise RuntimeError(
            "Kafka connector (spark-sql-kafka-0-10) is not on the classpath"
        )
    return (
        rendered.selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("kafka.linger.ms", str(linger_ms))
        .option("kafka.compression.type", compression)
        .option("checkpointLocation", checkpoint_location)
        .start()
    )
