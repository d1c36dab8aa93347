"""Stream-semantics queries (SURVEY.md §2.7 Q-STREAM … Q-JOIN).

Each operator's *data semantics* — the deterministic core of the
reference's scheduling machinery — expressed as a declarative DataFrame
plan (Catalyst handles pushdown/pruning) with a DuckDB oracle.

Scale notes apply throughout: per-stream windows shuffle once on the
stream key (the natural partitioning for every downstream stateful
operator); checkpoint/write-position tables are tiny and broadcast;
aggregations are partial (map-side combine) by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propulsion_spark.operators import register
from propulsion_spark.operators.fixtures import (
    BATCH_SIZE,
    GAPPED_CTE,
    TRANCHES,
    WP_CTE,
    gapped,
    prelude,
    stream_events,
    with_batch,
    with_tranche,
    with_unfold_flag,
    write_positions,
)

ENVELOPE_COLS = [
    "stream_name",
    "category",
    "idx",
    "event_type",
    "data",
    "event_id",
    "ts",
    "is_unfold",
    "size",
]


# ---------------------------------------------------------------- Q-STREAM
@register(
    "stream_envelope",
    prelude()
    + f"""
SELECT {', '.join(ENVELOPE_COLS)} FROM stream_events
""",
    doc="Envelope derivation: stream name + synthetic per-stream index "
    "(ref: src/Propulsion/Streams.fs:61-78,150; F8/F4).",
)
def q_stream_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_events(spark, sf_dir).select(*ENVELOPE_COLS)


# ------------------------------------------------------------------- Q-CAT
@register(
    "category_filter",
    prelude()
    + """
SELECT stream_name, idx, event_type, data
FROM stream_events
WHERE category = 'user'
  AND event_type NOT IN ('error')
  AND stream_name NOT LIKE '$%'
  AND regexp_matches(stream_name, '^user-[0-9]*[02468]$')
""",
    doc="StreamFilter: category allow-list, event-type deny-list, system-"
    "stream exclusion, stream regex (ref: src/Propulsion/StreamFilter.fs:6-46).",
)
def q_category_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = stream_events(spark, sf_dir)
    return se.filter(
        (F.col("category") == "user")
        & (~F.col("event_type").isin("error"))
        & (~F.col("stream_name").startswith("$"))
        & F.col("stream_name").rlike("^user-[0-9]*[02468]$")
    ).select("stream_name", "idx", "event_type", "data")


# ----------------------------------------------------------------- Q-DEDUP
@register(
    "write_pos_dedup",
    prelude(WP_CTE)
    + """
SELECT e.stream_name, e.idx, e.event_type, e.data, e.event_id
FROM stream_events e LEFT JOIN wp USING (stream_name)
WHERE e.idx >= coalesce(wp.pos, 0)
""",
    doc="Write-position dedup: redelivered events below the checkpoint "
    "vanish (ref: src/Propulsion/Streams.fs:111-117; DOCUMENTATION.md:402-432).",
)
def q_write_pos_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = stream_events(spark, sf_dir)
    wp = write_positions(se)
    return (
        # unhinted (r15): wp is O(distinct streams) — corpus-scaled at
        # 100 TB; AQE broadcasts while small, shuffles past the threshold
        se.join(wp, "stream_name", "left")
        .filter(F.col("idx") >= F.coalesce(F.col("pos"), F.lit(0)))
        .select("stream_name", "idx", "event_type", "data", "event_id")
    )


# -------------------------------------------------------------- Q-COALESCE
@register(
    "span_coalesce",
    prelude(GAPPED_CTE)
    + """
SELECT stream_name, min(idx) AS span_start, CAST(count(*) AS BIGINT) AS span_len
FROM (
  SELECT stream_name, idx,
         idx - row_number() OVER (PARTITION BY stream_name ORDER BY idx) AS grp
  FROM gapped
) GROUP BY stream_name, grp
""",
    doc="Span coalescing: contiguous index runs become single spans, gaps "
    "preserved (ref: src/Propulsion/Streams.fs:118-147; P5).",
)
def q_span_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = gapped(stream_events(spark, sf_dir))
    w = Window.partitionBy("stream_name").orderBy("idx")
    return (
        g.withColumn("grp", F.col("idx") - F.row_number().over(w))
        .groupBy("stream_name", "grp")
        .agg(F.min("idx").alias("span_start"), F.count("*").alias("span_len"))
        .select("stream_name", "span_start", "span_len")
    )


# ------------------------------------------------------------------ Q-REQS
@register(
    "batch_reqs",
    prelude()
    + f"""
SELECT event_id // {BATCH_SIZE} AS batch_id, stream_name,
       max(idx) + 1 AS required_pos, CAST(count(*) AS BIGINT) AS n_events
FROM stream_events
GROUP BY 1, 2
""",
    doc="Per-batch stream requirements: batch completes when every stream "
    "reaches max(idx)+1 (ref: src/Propulsion/Streams.fs:262-293; P4).",
)
def q_batch_reqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = with_batch(stream_events(spark, sf_dir))
    return (
        se.groupBy("batch_id", "stream_name")
        .agg((F.max("idx") + 1).alias("required_pos"), F.count("*").alias("n_events"))
    )


# ------------------------------------------------------------------ Q-CKPT
@register(
    "checkpoint_advance",
    prelude()
    + f"""
SELECT 'events' AS source, CAST(user_id % {TRANCHES} AS VARCHAR) AS tranche,
       'g1' AS grp, max(event_id // {BATCH_SIZE}) AS pos
FROM stream_events
GROUP BY 1, 2, 3
""",
    doc="Checkpoint advance: newest completed epoch per (source, tranche, "
    "group) (ref: src/Propulsion/Ingestion.fs:11-33; W8/P2).",
)
def q_checkpoint_advance(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = with_tranche(with_batch(stream_events(spark, sf_dir)))
    return (
        se.groupBy("tranche")
        .agg(F.max("batch_id").alias("pos"))
        .select(
            F.lit("events").alias("source"),
            "tranche",
            F.lit("g1").alias("grp"),
            "pos",
        )
    )


# ----------------------------------------------------------------- Q-SLICE
@register(
    "span_slice",
    prelude(WP_CTE)
    + """
SELECT e.stream_name, e.idx, e.event_type
FROM stream_events e LEFT JOIN wp USING (stream_name)
WHERE e.idx >= coalesce(wp.pos, 0) AND e.idx < coalesce(wp.pos, 0) + 5
""",
    doc="Dispatch slicing: at most maxEvents=5 from the write position "
    "(ref: src/Propulsion/Streams.fs:89-107; P6).",
)
def q_span_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = stream_events(spark, sf_dir)
    wp = write_positions(se)
    pos = F.coalesce(F.col("pos"), F.lit(0))
    return (
        # unhinted (r15): the write_pos_dedup rationale
        se.join(wp, "stream_name", "left")
        .filter((F.col("idx") >= pos) & (F.col("idx") < pos + 5))
        .select("stream_name", "idx", "event_type")
    )


# ---------------------------------------------------------------- Q-UNFOLD
@register(
    "unfold_freshest",
    prelude()
    + f"""
SELECT stream_name, event_type, idx, data
FROM (
  SELECT stream_name, event_type, idx, data,
         row_number() OVER (PARTITION BY stream_name, event_type
                            ORDER BY idx DESC, event_id DESC) AS rn
  FROM stream_events WHERE event_id % 10 = 0
) WHERE rn = 1
""",
    doc="Freshest-unfold retention: only the newest snapshot per (stream, "
    "event_type) survives (ref: src/Propulsion/Streams.fs:143-147,229-231).",
)
def q_unfold_freshest(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = with_unfold_flag(stream_events(spark, sf_dir)).filter("is_unfold")
    w = Window.partitionBy("stream_name", "event_type").orderBy(
        F.col("idx").desc(), F.col("event_id").desc()
    )
    return (
        se.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("stream_name", "event_type", "idx", "data")
    )


# ------------------------------------------------------------------- Q-GAP
@register(
    "gap_detect",
    prelude(GAPPED_CTE)
    + """
SELECT stream_name, coalesce(prev, -1) + 1 AS gap_start, idx AS next_known
FROM (
  SELECT stream_name, idx,
         lag(idx) OVER (PARTITION BY stream_name ORDER BY idx) AS prev
  FROM gapped
) WHERE idx - coalesce(prev, -1) > 1
""",
    doc="Gap detection feeding the requireAll dispatch guard "
    "(ref: src/Propulsion/Streams.fs:370-373,828-843).",
)
def q_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = gapped(stream_events(spark, sf_dir))
    w = Window.partitionBy("stream_name").orderBy("idx")
    return (
        g.withColumn("prev", F.lag("idx").over(w))
        .filter(F.col("idx") - F.coalesce(F.col("prev"), F.lit(-1)) > 1)
        .select(
            "stream_name",
            (F.coalesce(F.col("prev"), F.lit(-1)) + 1).alias("gap_start"),
            F.col("idx").alias("next_known"),
        )
    )


# ----------------------------------------------------------------- Q-PRUNE
@register(
    "prune_survivors",
    prelude()
    + """
SELECT e.stream_name, e.idx, e.event_type
FROM stream_events e
JOIN (
  SELECT stream_name, max(idx) // 2 AS until_idx
  FROM stream_events WHERE user_id % 2 = 0 GROUP BY stream_name
) r USING (stream_name)
WHERE e.idx > r.until_idx
""",
    doc="Pruner: delete events at or below the submitted index; survivors "
    "remain (ref: src/Propulsion.CosmosStore/CosmosStorePruner.fs:9-84; W2).",
)
def q_prune_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = stream_events(spark, sf_dir)
    req = (
        se.filter(F.col("user_id") % 2 == 0)
        .groupBy("stream_name")
        .agg(F.expr("max(idx) div 2").alias("until_idx"))
    )
    return (
        # unhinted (r15): req is O(distinct streams), the same class
        se.join(req, "stream_name")
        .filter(F.col("idx") > F.col("until_idx"))
        .select("stream_name", "idx", "event_type")
    )


# ------------------------------------------------------------------- Q-LAG
@register(
    "feed_lag",
    prelude()
    + f"""
SELECT CAST(user_id % {TRANCHES} AS VARCHAR) AS tranche,
       max(event_id) AS tail_pos,
       max(CASE WHEN event_id % 5 != 0 THEN event_id END) AS committed_pos,
       max(event_id) - max(CASE WHEN event_id % 5 != 0 THEN event_id END) AS lag
FROM stream_events GROUP BY 1
""",
    doc="Change-feed lag estimation: tail vs committed position per tranche "
    "(ref: src/Propulsion.CosmosStore/ChangeFeedProcessor.fs:50-71; M8).",
)
def q_feed_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = with_tranche(stream_events(spark, sf_dir))
    committed = F.max(F.when(F.col("event_id") % 5 != 0, F.col("event_id")))
    return se.groupBy("tranche").agg(
        F.max("event_id").alias("tail_pos"),
        committed.alias("committed_pos"),
        (F.max("event_id") - committed).alias("lag"),
    )


# ----------------------------------------------------------------- Q-STATS
@register(
    "handler_stats",
    prelude()
    + """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(length(data)) AS BIGINT) AS bytes,
       CAST(count(DISTINCT stream_name) AS BIGINT) AS n_streams
FROM stream_events GROUP BY event_type
""",
    doc="Outcome/stat accumulation by event type "
    "(ref: src/Propulsion/Streams.fs:606-707; M1).",
)
def q_handler_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = stream_events(spark, sf_dir)
    return se.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.length("data")).alias("bytes"),
        F.countDistinct("stream_name").alias("n_streams"),
    )


# ------------------------------------------------------------------- Q-AGG
@register(
    "stream_fold",
    prelude()
    + """
SELECT stream_name, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
       max(ts) AS last_ts, max(idx) + 1 AS write_pos
FROM stream_events GROUP BY stream_name
""",
    doc="The flagship handler projection: per-stream fold to an outcome row "
    "(count/sum/last) — the minimum end-to-end slice of SURVEY §7 step 2.",
)
def q_stream_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = stream_events(spark, sf_dir)
    return se.groupBy("stream_name").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"),
        F.max("ts").alias("last_ts"),
        (F.max("idx") + 1).alias("write_pos"),
    )


# ------------------------------------------------------------------ Q-JOIN
@register(
    "hydration_join",
    prelude()
    + """
SELECT i.stream_name, i.idx, e.event_type, e.data
FROM (SELECT stream_name, idx FROM stream_events WHERE event_id % 5 = 0) i
JOIN stream_events e USING (stream_name, idx)
""",
    doc="Index-driven hydration join: spans index → event bodies "
    "(ref: src/Propulsion.DynamoStore/DynamoStoreSource.fs:114-144; S2).",
)
def q_hydration_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = stream_events(spark, sf_dir)
    idx = se.filter(F.col("event_id") % 5 == 0).select("stream_name", "idx")
    return idx.join(se, ["stream_name", "idx"]).select(
        "stream_name", "idx", "event_type", "data"
    )


# ---------------------------------------------------------- props JSON
@register(
    "props_extract",
    prelude()
    + """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(data, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(sum(CAST(json_extract_string(data, '$.k') AS BIGINT)) AS BIGINT) / count(*) AS avg_k
FROM stream_events GROUP BY event_type
""",
    doc="Opaque-body JSON projection at the edge (the parser boundary, "
    "ref: EquinoxSystemTextJsonParser semantics): get_json_object pulls a "
    "field out of the event body only where the operator needs it.",
)
def q_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = stream_events(spark, sf_dir)
    k = F.get_json_object("data", "$.k").cast("long")
    return se.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        (F.sum(k) / F.count("*")).alias("avg_k"),
    )


# --------------------------------------------------------------- Q-RENDER
@register(
    "rendered_spans",
    prelude(GAPPED_CTE)
    + """
SELECT stream_name, span_start,
       '{"s":"' || stream_name || '","i":' || span_start || ',"e":[' ||
       string_agg('{"c":"' || event_type || '","id":' || event_id || '}', ',' ORDER BY idx)
       || ']}' AS rendered
FROM (
  SELECT stream_name, idx, event_type, event_id,
         min(idx) OVER (PARTITION BY stream_name, grp) AS span_start
  FROM (
    SELECT *, idx - row_number() OVER (PARTITION BY stream_name ORDER BY idx) AS grp
    FROM gapped
  )
) GROUP BY stream_name, span_start
""",
    doc="RenderedSpan wire codec: one canonical JSON message per contiguous "
    "span (ref: src/Propulsion.Kafka/Codec.fs:46-75; F6).",
)
def q_rendered_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = gapped(stream_events(spark, sf_dir))
    w = Window.partitionBy("stream_name").orderBy("idx")
    spans = g.withColumn("grp", F.col("idx") - F.row_number().over(w)).withColumn(
        "span_start", F.min("idx").over(Window.partitionBy("stream_name", "grp"))
    )
    return (
        spans.groupBy("stream_name", "span_start")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("idx", "event_type", "event_id"))
            ).alias("evs")
        )
        .select(
            "stream_name",
            "span_start",
            F.concat(
                F.lit('{"s":"'),
                F.col("stream_name"),
                F.lit('","i":'),
                F.col("span_start").cast("string"),
                F.lit(',"e":['),
                F.array_join(
                    F.transform(
                        F.col("evs"),
                        lambda x: F.concat(
                            F.lit('{"c":"'),
                            x["event_type"],
                            F.lit('","id":'),
                            x["event_id"].cast("string"),
                            F.lit("}"),
                        ),
                    ),
                    ",",
                ),
                F.lit("]}"),
            ).alias("rendered"),
        )
    )


# ------------------------------------------------------- F7 round-trip
@register(
    "rendered_summary_roundtrip",
    prelude()
    + """
SELECT stream_name, idx, event_type, data,
       CAST(length(data) AS BIGINT) AS size
FROM (
  SELECT stream_name, idx, event_type, data,
         max(idx) OVER (PARTITION BY stream_name) AS top
  FROM stream_events WHERE event_id % 10 = 0
) WHERE idx = top
""",
    doc="RenderedSummary wire codec ROUND-TRIP (render → JSON → parse; "
    "ref: src/Propulsion.Kafka/Codec.fs:78-108 incl. parse): freshest "
    "unfold set per stream rendered as one versioned summary message, "
    "then parsed back to envelope unfold rows — proving a consumer of "
    "summary topics can re-ingest them. The oracle computes the "
    "expected fixed point directly (top-version unfolds per stream).",
)
def q_rendered_summary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propulsion_spark.functions.codec import (
        parse_rendered_summary,
        render_summary,
    )

    env = with_unfold_flag(stream_events(spark, sf_dir)).filter("is_unfold")
    parsed = parse_rendered_summary(render_summary(env))
    return parsed.select("stream_name", "idx", "event_type", "data", "size")
