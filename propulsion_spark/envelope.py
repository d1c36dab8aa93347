"""The StreamEvent envelope — the atom of every pipeline.

Mirrors the reference's data model (SURVEY.md §1):

- ``StreamEvent`` = (StreamName, ITimelineEvent) — ref:
  src/Propulsion/Streams.fs:150;
- ``ITimelineEvent`` fields (Index, EventType, Data, Meta, EventId,
  Timestamp, IsUnfold) — ref: src/Propulsion/Feed/PeriodicSource.fs:39-40;
- stream names are ``{category}-{streamId}`` — ref:
  src/Propulsion/Streams.fs:61-78.

The envelope is a fixed StructType; the event body stays an opaque
STRING/BINARY column (``FsCodec.Encoded`` analog, ref:
src/Propulsion/Sinks.fs:8) and is parsed with ``from_json`` /
``get_json_object`` only at the operators that need it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fixed envelope schema: engine core manipulates only these columns.
STREAM_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("stream_name", T.StringType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("idx", T.LongType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("data", T.StringType(), True),  # opaque JSON body
        T.StructField("meta", T.StringType(), True),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("is_unfold", T.BooleanType(), False),
        T.StructField("size", T.LongType(), True),  # body byte budget
    ]
)

# Write-position sentinels (ref: src/Propulsion/Streams.fs:166).
WRITE_POS_UNKNOWN = -2
WRITE_POS_MALFORMED = -3


def categorize(stream_name: Column) -> Column:
    """Category = text before the first '-' (ref: Streams.fs:76-78)."""
    return F.substring_index(stream_name, "-", 1)


def stream_id(stream_name: Column) -> Column:
    """StreamId = everything after the first '-'."""
    return F.substr(stream_name, F.instr(stream_name, "-") + 1)


def parse_with_default_category(raw: Column, default_category: str) -> Column:
    """Normalize an arbitrary key to a well-formed ``{category}-{id}``
    stream name (ref: src/Propulsion/Streams.fs:66-69): keys without a
    '-' get the default category prefixed.
    """
    return F.when(
        F.instr(raw, "-") == 0, F.concat(F.lit(default_category), F.lit("-"), raw)
    ).otherwise(raw)


def with_synthetic_index(
    df: DataFrame, stream_col: str, order_cols: list[str], out_col: str = "idx"
) -> DataFrame:
    """Assign synthetic monotonic per-stream indexes to unindexed input
    (StreamNameSequenceGenerator analog, ref:
    src/Propulsion.Kafka/Consumers.fs:267-328).

    Scale note: a window over ``partitionBy(stream)`` shuffles once on the
    stream key — the same shuffle any per-stream operator needs anyway, and
    per-stream data is small by construction (streams are fine-grained).
    """
    w = Window.partitionBy(stream_col).orderBy(*order_cols)
    return df.withColumn(out_col, (F.row_number().over(w) - 1).cast("long"))


def derive_stream_events(events: DataFrame) -> DataFrame:
    """Build the envelope from the driver's ``events`` fixture
    (FIXTURES.md §1): stream per user, index = arrival order within the
    stream (ts, then event_id as the unique global tiebreaker).
    """
    # Window over the stream key *attribute* (not user_id, and not the
    # concat expression): every downstream per-stream operator (fold,
    # coalesce, gaps, sessions) shuffles on stream_name, and partitioning
    # carried by an output attribute propagates through projections, so
    # Catalyst reuses this one exchange for the whole per-stream pipeline.
    named = events.withColumn(
        "stream_name", F.concat(F.lit("user-"), F.col("user_id"))
    )
    w = Window.partitionBy("stream_name").orderBy("ts", "event_id")
    return named.select(
        F.col("stream_name"),
        F.lit("user").alias("category"),
        (F.row_number().over(w) - 1).cast("long").alias("idx"),
        F.col("event_type"),
        F.col("props").alias("data"),
        F.lit(None).cast("string").alias("meta"),
        F.col("event_id"),
        F.col("ts"),
        F.lit(False).alias("is_unfold"),
        F.length("props").cast("long").alias("size"),
        F.col("user_id"),
        F.col("value"),
    )


# DuckDB-oracle equivalent of derive_stream_events (kept adjacent so the
# two stay in sync; used by __spark_entry__.oracle_sql).
STREAM_EVENTS_SQL = """
SELECT concat('user-', user_id) AS stream_name,
       'user' AS category,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS idx,
       event_type,
       props AS data,
       CAST(NULL AS VARCHAR) AS meta,
       event_id,
       ts,
       false AS is_unfold,
       CAST(length(props) AS BIGINT) AS size,
       user_id,
       value
FROM events
"""
