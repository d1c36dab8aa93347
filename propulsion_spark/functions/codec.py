"""Wire codecs — span ⇄ JSON for transport (SURVEY.md §2.3 F6/F7;
ref: src/Propulsion.Kafka/Codec.fs:46-108) and change-feed document
parsing (F3; ref: EquinoxSystemTextJsonParser.fs:11-81).

RenderedSpan wire shape (verbatim-JSON bodies ride untouched):

    {"s": "<stream>", "i": <first index>,
     "e": [{"c": "<event type>", "t": "<iso ts>", "d": <data>, "m": <meta>}]}

``render_spans`` packs contiguous envelope spans into one message per
span with ``to_json``; ``parse_rendered_spans`` explodes messages back
into envelope rows with ``from_json`` + ``posexplode`` — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

RENDERED_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField(
            "e",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("c", T.StringType()),
                        T.StructField("t", T.TimestampType()),
                        T.StructField("d", T.StringType()),
                        T.StructField("m", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def render_spans(envelope: DataFrame) -> DataFrame:
    """Envelope rows → one JSON message per contiguous span
    (RenderedSpan.ofStreamSpan analog). Output: (key, value) ready for a
    Kafka-shaped sink; per-stream ordering preserved by the key."""
    w = Window.partitionBy("stream_name").orderBy("idx")
    spans = envelope.withColumn("grp", F.col("idx") - F.row_number().over(w))
    packed = (
        spans.groupBy("stream_name", "grp")
        .agg(
            F.min("idx").alias("i"),
            F.array_sort(
                F.collect_list(F.struct("idx", "event_type", "ts", "data", "meta"))
            ).alias("evs"),
        )
        .select(
            F.col("stream_name").alias("key"),
            F.to_json(
                F.struct(
                    F.col("stream_name").alias("s"),
                    F.col("i"),
                    F.transform(
                        F.col("evs"),
                        lambda e: F.struct(
                            e["event_type"].alias("c"),
                            e["ts"].alias("t"),
                            e["data"].alias("d"),
                            e["meta"].alias("m"),
                        ),
                    ).alias("e"),
                )
            ).alias("value"),
        )
    )
    return packed


def parse_rendered_spans(messages: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON span messages → envelope rows (RenderedSpan.parse/enum
    analog): from_json + posexplode reconstructs per-event indexes."""
    parsed = messages.select(
        F.from_json(F.col(value_col), RENDERED_SPAN_SCHEMA).alias("span")
    )
    return parsed.select(
        F.col("span.s").alias("stream_name"),
        F.substring_index(F.col("span.s"), "-", 1).alias("category"),
        F.posexplode(F.col("span.e")).alias("off", "ev"),
        F.col("span.i").alias("_i"),
    ).select(
        "stream_name",
        "category",
        (F.col("_i") + F.col("off")).alias("idx"),
        F.col("ev.c").alias("event_type"),
        F.col("ev.d").alias("data"),
        F.col("ev.m").alias("meta"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ev.t").alias("ts"),
        F.lit(False).alias("is_unfold"),
        F.length(F.col("ev.d")).cast("long").alias("size"),
    )


def render_summary(envelope: DataFrame, version_col: str = "idx") -> DataFrame:
    """State-summary messages (RenderedSummary analog, ref:
    src/Propulsion.Kafka/Codec.fs:78-108): one versioned message per
    stream carrying only its freshest unfold rows (all `u` entries)."""
    unfolds = envelope.filter(F.col("is_unfold"))
    w = Window.partitionBy("stream_name")
    freshest = unfolds.withColumn(
        "_top", F.max(version_col).over(w)
    ).filter(F.col(version_col) == F.col("_top"))
    return (
        freshest.groupBy("stream_name")
        .agg(
            F.max(version_col).alias("i"),
            F.array_sort(
                F.collect_list(F.struct("event_type", "data"))
            ).alias("us"),
        )
        .select(
            F.col("stream_name").alias("key"),
            F.to_json(
                F.struct(
                    F.col("stream_name").alias("s"),
                    F.col("i"),
                    F.transform(
                        F.col("us"),
                        lambda u: F.struct(
                            u["event_type"].alias("c"), u["data"].alias("d")
                        ),
                    ).alias("u"),
                )
            ).alias("value"),
        )
    )


RENDERED_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField(
            "u",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("c", T.StringType()),
                        T.StructField("d", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def parse_rendered_summary(messages: DataFrame, value_col: str = "value") -> DataFrame:
    """Summary messages → envelope unfold rows (RenderedSummary.parse
    analog, ref: src/Propulsion.Kafka/Codec.fs:94-108): every ``u``
    entry becomes an ``is_unfold=true`` row at the summary's version
    index, so a consumer of summary topics can re-ingest them through
    the same sinks as ordinary events."""
    parsed = messages.select(
        F.from_json(F.col(value_col), RENDERED_SUMMARY_SCHEMA).alias("sm")
    ).filter(F.col("sm.s").isNotNull())
    return parsed.select(
        F.col("sm.s").alias("stream_name"),
        F.substring_index(F.col("sm.s"), "-", 1).alias("category"),
        F.col("sm.i").alias("idx"),
        F.explode(F.col("sm.u")).alias("uf"),
    ).select(
        "stream_name",
        "category",
        "idx",
        F.col("uf.c").alias("event_type"),
        F.col("uf.d").alias("data"),
        F.lit(None).cast("string").alias("meta"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(True).alias("is_unfold"),
        F.length(F.col("uf.d")).cast("long").alias("size"),
    )


def parse_changefeed_documents(
    docs: DataFrame, doc_col: str = "doc"
) -> DataFrame:
    """Change-feed document parser (EquinoxSystemTextJsonParser analog):
    each document carries a stream ``p``, base index ``i``, events ``e``
    and optional unfolds ``u`` — project to N envelope rows.

    Document shape: {"p": stream, "i": base_idx,
                     "e": [{"c": type, "t": ts, "d": data}],
                     "u": [{"c": type, "d": data}]}
    """
    schema = T.StructType(
        [
            T.StructField("p", T.StringType()),
            T.StructField("i", T.LongType()),
            T.StructField(
                "e",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("c", T.StringType()),
                            T.StructField("t", T.TimestampType()),
                            T.StructField("d", T.StringType()),
                        ]
                    )
                ),
            ),
            T.StructField(
                "u",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("c", T.StringType()),
                            T.StructField("d", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
    parsed = docs.select(F.from_json(F.col(doc_col), schema).alias("x")).filter(
        F.col("x.p").isNotNull()
    )
    events = parsed.select(
        F.col("x.p").alias("stream_name"),
        F.posexplode("x.e").alias("off", "ev"),
        F.col("x.i").alias("_i"),
    ).select(
        "stream_name",
        F.substring_index("stream_name", "-", 1).alias("category"),
        (F.col("_i") + F.col("off")).alias("idx"),
        F.col("ev.c").alias("event_type"),
        F.col("ev.d").alias("data"),
        F.lit(None).cast("string").alias("meta"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ev.t").alias("ts"),
        F.lit(False).alias("is_unfold"),
        F.length("ev.d").cast("long").alias("size"),
    )
    tail = parsed.select(
        F.col("x.p").alias("stream_name"),
        (F.col("x.i") + F.size("x.e") - 1).alias("idx"),
        F.explode("x.u").alias("uf"),
    ).select(
        "stream_name",
        F.substring_index("stream_name", "-", 1).alias("category"),
        "idx",
        F.col("uf.c").alias("event_type"),
        F.col("uf.d").alias("data"),
        F.lit(None).cast("string").alias("meta"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(True).alias("is_unfold"),
        F.length("uf.d").cast("long").alias("size"),
    )
    return events.unionByName(tail)
