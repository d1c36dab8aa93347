"""Engine CLI — the `propulsion sync` analog (SURVEY.md §3.3; ref:
tools/Propulsion.Tool/Program.fs:7-26, Sync.fs:219-320).

    python -m propulsion_spark.cli sync --from <src> --to <dst> [...]
    python -m propulsion_spark.cli stats --sf-dir <dir>
    python -m propulsion_spark.cli checkpoint --path <ckpt> [--override N]

Sources: ``events:<sf_dir>`` (the fixture via envelope derivation),
``changefeed:<dir>`` (append-only parquet tail), ``json:<file>``.
Sinks:   ``stats`` (count/report only), ``store:<dir>`` (idempotent
event-store writer), ``parquet:<dir>`` (rendered span messages).
``--follow`` keeps tailing; default runs until caught up then exits
(ref non-follow mode: Sync.fs:308-320).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _build_filter(args) -> "StreamFilter":
    from propulsion_spark.functions.filters import StreamFilter

    return StreamFilter(
        allow_categories=args.category or (),
        deny_categories=args.deny_category or (),
        allow_stream_regex=args.stream or (),
        deny_stream_regex=args.deny_stream or (),
        allow_event_types=args.event_type or (),
        deny_event_types=args.deny_event_type or (),
    )


def cmd_sync(args) -> int:
    from propulsion_spark import get_spark
    from propulsion_spark.envelope import derive_stream_events
    from propulsion_spark import load_table
    from propulsion_spark.sources import ChangeFeedSource, JsonSource
    from propulsion_spark.sources.feed import Batch, SinglePassFeedSource, TailingFeedSource
    from propulsion_spark.streaming import CheckpointStore, StreamsSink
    from propulsion_spark.streaming.event_store import EventStoreTable

    spark = get_spark("propulsion-cli")
    sfilter = _build_filter(args)
    ckpt = CheckpointStore(args.checkpoints, group=args.group)

    # ---- sink ----
    kind, _, dst = args.to.partition(":")
    if getattr(args, "curate", False):
        # the flagship LLM-data story as one pipeline: quality gates →
        # repetition filter → cross-batch dedup → split assignment →
        # curated store. --to is the output root (curated:<path> or a
        # bare path); document sources bypass the stream filter (docs
        # have no stream envelope).
        from propulsion_spark.pipelines import CurationPipeline

        lm_table = getattr(args, "lm_table", None)
        lm_kwargs = {}
        if lm_table:
            lm_kwargs["lm"] = spark.read.parquet(lm_table)
            if getattr(args, "lm_min_score", None) is not None:
                lm_kwargs["lm_min_score"] = args.lm_min_score
        sem_table = getattr(args, "semdedup_embeddings", None)
        if sem_table:
            lm_kwargs["semdedup_embeddings"] = spark.read.parquet(sem_table)
            if getattr(args, "semdedup_cos", None) is not None:
                lm_kwargs["semdedup_cos"] = args.semdedup_cos
        dsir_t = getattr(args, "dsir_target_lm", None)
        dsir_r = getattr(args, "dsir_raw_lm", None)
        if bool(dsir_t) != bool(dsir_r):
            # same JSON-error + exit-2 convention as cmd_dsir's own flag
            # validation — not an unhandled ValueError traceback.
            print(json.dumps({
                "error": "--dsir-target-lm and --dsir-raw-lm must be given together"
            }))
            return 2
        if dsir_t or dsir_r:
            lm_kwargs["dsir_target_lm"] = spark.read.parquet(dsir_t) if dsir_t else None
            lm_kwargs["dsir_raw_lm"] = spark.read.parquet(dsir_r) if dsir_r else None
            if getattr(args, "dsir_min_logw", None) is not None:
                lm_kwargs["dsir_min_logw"] = args.dsir_min_logw
        substr_reg = getattr(args, "substr_registry", None)
        if substr_reg:
            lm_kwargs["substr_registry"] = substr_reg
            if getattr(args, "substr_n", None) is not None:
                lm_kwargs["substr_n"] = args.substr_n
            if getattr(args, "substr_min_dup", None) is not None:
                lm_kwargs["substr_min_dup"] = args.substr_min_dup
        qmodel = getattr(args, "quality_model", None)
        if qmodel:
            lm_kwargs["quality_model"] = qmodel  # path: pipeline loads it
            if getattr(args, "quality_min", None) is not None:
                lm_kwargs["quality_min"] = args.quality_min
            if getattr(args, "quality_n_features", None) is not None:
                lm_kwargs["quality_n_features"] = args.quality_n_features
        if getattr(args, "max_per_source", None) is not None:
            lm_kwargs["max_per_source"] = args.max_per_source
            if getattr(args, "srccap_registry", None):
                lm_kwargs["srccap_registry"] = args.srccap_registry
        pipe = CurationPipeline(
            spark,
            dst if kind == "curated" else args.to,
            near_dedup=getattr(args, "near_dedup", False),
            redact_pii=getattr(args, "redact_pii", False),
            span_dedup=getattr(args, "span_dedup", False),
            **lm_kwargs,
        )

        class CurateSink:
            def __init__(self):
                self.stats = pipe.stats
                self.pipe = pipe

            def process_batch(self, df, batch_id=0):
                pipe.process_batch(df, batch_id)

        sink = CurateSink()
    elif kind == "stats":
        counters = {"events": 0, "streams": set()}

        def handle(stream, events):
            return "ok", int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(spark, handle, args.positions)
    elif kind == "store":
        store = EventStoreTable(spark, dst)

        class StoreSink:
            def __init__(self):
                self.outcomes = {}

            def process_batch(self, df, batch_id=0):
                for r in store.sync(df).collect():
                    self.outcomes[r.outcome] = self.outcomes.get(r.outcome, 0) + 1

        sink = StoreSink()
    elif kind == "parquet":
        from propulsion_spark.functions.codec import render_spans

        class RenderSink:
            def __init__(self):
                self.n = 0

            def process_batch(self, df, batch_id=0):
                out = render_spans(df)
                out.write.mode("append").parquet(dst)
                self.n += 1

        sink = RenderSink()
    else:
        print(f"unknown sink: {args.to}", file=sys.stderr)
        return 2

    # wrap the sink with the stream filter (documents have no stream
    # envelope, so the curation path is not wrapped)
    inner = sink
    if not getattr(args, "curate", False):

        class FilteredSink:
            def process_batch(self, df, batch_id=0):
                return inner.process_batch(sfilter.apply(df), batch_id)

        sink = FilteredSink()

    # ---- source ----
    skind, _, src = args.source.partition(":")
    if skind == "events":
        envelope = derive_stream_events(load_table(spark, src, "events"))

        def read_page(tranche, pos):
            if pos >= 1:
                return Batch(items=None, checkpoint=pos, is_tail=True)
            return Batch(items=envelope, checkpoint=1, is_tail=True)

        cls = TailingFeedSource if args.follow else SinglePassFeedSource
        source = cls(spark, lambda: ["0"], read_page, sink, ckpt, source_id="events")
    elif skind == "documents":
        docs = load_table(spark, src, "documents")

        def read_doc_page(tranche, pos):
            if pos >= 1:
                return Batch(items=None, checkpoint=pos, is_tail=True)
            return Batch(items=docs, checkpoint=1, is_tail=True)

        source = SinglePassFeedSource(
            spark, lambda: ["0"], read_doc_page, sink, ckpt, source_id="documents"
        )
    elif skind == "changefeed":
        source = ChangeFeedSource(
            spark, src, sink, ckpt, stop_at_tail=not args.follow
        )
    elif skind == "store-cdc":
        # react to committed appends of an engine store (the reference's
        # flagship shape: store change feed → handler → checkpoint)
        from propulsion_spark.sources.store_cdc import store_cdc_feed

        source = store_cdc_feed(
            spark, EventStoreTable(spark, src), sink, ckpt
        )
        source.stop_at_tail = not args.follow
    elif skind == "json":
        # each line is a JSON event; project the envelope fields out of it
        from pyspark.sql import functions as F2

        def parse_lines(page):
            g = lambda f: F2.get_json_object(F2.col("line"), f"$.{f}")  # noqa: E731
            return page.select(
                F2.coalesce(g("stream_name"), F2.lit("json-0")).alias("stream_name"),
                F2.substring_index(
                    F2.coalesce(g("stream_name"), F2.lit("json-0")), "-", 1
                ).alias("category"),
                F2.coalesce(g("idx").cast("long"), F2.col("line_no")).alias("idx"),
                F2.coalesce(g("event_type"), F2.lit("Message")).alias("event_type"),
                F2.col("line").alias("data"),
                F2.lit(None).cast("string").alias("meta"),
                F2.col("line_no").alias("event_id"),
                g("ts").cast("timestamp").alias("ts"),
                F2.lit(False).alias("is_unfold"),
                F2.length("line").cast("long").alias("size"),
            )

        source = JsonSource(spark, src, sink, ckpt, parse=parse_lines)
    else:
        print(f"unknown source: {args.source}", file=sys.stderr)
        return 2

    if args.follow:
        source.start()
        try:
            source.await_completion(timeout=args.timeout)
        finally:
            source.stop()
    else:
        source.run_until_caught_up(timeout=args.timeout)

    report = {"source": args.source, "to": args.to, "caught_up": source.ran_to_completion}
    if hasattr(inner, "stats"):
        s = inner.stats
        report["stats"] = s if isinstance(s, dict) else s.as_dict()
    if hasattr(inner, "outcomes"):
        report["outcomes"] = inner.outcomes
    if hasattr(inner, "pipe"):
        report["splits"] = [
            r.asDict() for r in inner.pipe.split_stats().collect()
        ]
    print(json.dumps(report))
    spark.stop()
    return 0


def cmd_stats(args) -> int:
    from propulsion_spark import get_spark
    from propulsion_spark.operators import load_all

    spark = get_spark("propulsion-stats")
    registry = load_all()
    q = registry["handler_stats"].build(spark, args.sf_dir)
    rows = [r.asDict() for r in q.collect()]
    print(json.dumps({"sf_dir": args.sf_dir, "event_types": rows}, default=str))
    spark.stop()
    return 0


def cmd_init(args) -> int:
    """Provision the engine's storage layout (the `propulsion init`
    analog): store/positions/index/checkpoints directories."""
    import os

    for sub in ("store", "positions", "index", "checkpoints"):
        os.makedirs(f"{args.path}/{sub}", exist_ok=True)
    print(json.dumps({"initialized": args.path}))
    return 0


def cmd_compact(args) -> int:
    """Fold multi-segment buckets back to one segment each (the OPTIMIZE
    maintenance verb): bounded per call, each bucket its own fenced
    commit, safe alongside live writers."""
    from propulsion_spark import get_spark
    from propulsion_spark.streaming.event_store import EventStoreTable

    spark = get_spark("propulsion-compact")
    store = EventStoreTable(spark, args.store)
    before = store.bucket_segment_counts()
    done = store.auto_compact(
        max_segments=args.max_segments, max_buckets=args.max_buckets
    )
    after = store.bucket_segment_counts()
    print(
        json.dumps(
            {
                "store": args.store,
                "compacted_buckets": done,
                "max_segments_before": max(before.values()) if before else 0,
                "max_segments_after": max(after.values()) if after else 0,
                "total_segments_before": sum(before.values()),
                "total_segments_after": sum(after.values()),
            }
        )
    )
    spark.stop()
    return 0


def cmd_index(args) -> int:
    """Build/extend the CDC span index from an event-store table
    (the `propulsion index` verb analog)."""
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark
    from propulsion_spark.streaming.event_store import EventStoreTable
    from propulsion_spark.streaming.index import AppendsIndex

    spark = get_spark("propulsion-index")
    store = EventStoreTable(spark, args.store)
    index = AppendsIndex(spark, args.index)
    spans = (
        store.read()
        .groupBy("stream_name")
        .agg(F.min("idx").alias("span_lo"), (F.max("idx") + 1).alias("span_hi"))
    )
    report = index.ingest(spans)
    verdicts = {
        r.verdict: r.n
        for r in report.groupBy("verdict").agg(F.count("*").alias("n")).collect()
    }
    epoch, items = index.active_epoch()
    print(json.dumps({"verdicts": verdicts, "active_epoch": epoch, "items": items}))
    spark.stop()
    return 0


def cmd_checkpoint(args) -> int:
    from propulsion_spark.streaming.checkpoints import CheckpointStore

    store = CheckpointStore(args.path, group=args.group)
    if args.override is not None:
        store.override_position(args.source, args.tranche, args.override)
    print(store.to_json())
    return 0


def cmd_queries(args) -> int:
    """List every registered query (name + one-line doc)."""
    from propulsion_spark.operators import load_all

    registry = load_all()
    out = {
        name: (q.doc.split(". ")[0] if q.doc else "")
        for name, q in sorted(registry.items())
    }
    print(json.dumps({"n": len(out), "queries": out}))
    return 0


def cmd_query(args) -> int:
    """Run one registered query against a fixture dir; print rows as
    JSON lines (bounded by --limit) or write the full result to
    --out as parquet — the ad-hoc face of the same registry the
    driver's correctness gate verifies."""
    from propulsion_spark import get_spark
    from propulsion_spark.operators import load_all

    registry = load_all()
    if args.name not in registry:
        print(json.dumps({"error": f"unknown query {args.name!r}",
                          "available": sorted(registry)}))
        return 2
    spark = get_spark("propulsion-query")
    df = registry[args.name].build(spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"query": args.name, "out": args.out}))
    else:
        rows = df.limit(args.limit).collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    spark.stop()
    return 0


def cmd_pack(args) -> int:
    """Sequence-pack a (curated) corpus: assign every document its
    global token offset and fixed-length training-sequence span (the
    concat-and-chunk step downstream of `sync --curate`), write the
    assignment parquet, and report per-split sequence totals."""
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark
    from propulsion_spark.operators.packing import pack_documents

    spark = get_spark("propulsion-pack")

    def derive(df):
        if "n_tokens" not in df.columns:
            df = df.withColumn(
                "n_tokens", F.expr("size(split(lower(trim(text)), '\\\\s+'))")
            )
        if "split" not in df.columns:
            df = df.withColumn("split", F.lit("train"))
        return df

    docs = derive(spark.read.parquet(args.src))
    if getattr(args, "follow", False):
        # incremental: pack new documents as they land in src, carrying
        # each split's stream position across micro-batches
        from propulsion_spark.streaming.packing import pack_foreach_batch

        base = args.out.rstrip("/")
        inner = pack_foreach_batch(
            spark, args.state or base + "_state", args.out, args.seq_len
        )
        stream = spark.readStream.schema(
            spark.read.parquet(args.src).schema
        ).parquet(args.src)
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: inner(derive(df), bid)
            )
            .option("checkpointLocation", base + "_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    else:
        packed = pack_documents(docs, args.seq_len)
        packed.write.mode("overwrite").parquet(args.out)
    if getattr(args, "manifest", None):
        from propulsion_spark.operators.packing import sequence_manifest

        sequence_manifest(
            spark.read.parquet(args.out), args.seq_len
        ).write.mode("overwrite").parquet(args.manifest)
    stats = {
        r["split"]: {
            "n_docs": r["n_docs"],
            "n_tokens": r["n_tokens"],
            "n_seqs": r["n_seqs"],
        }
        for r in spark.read.parquet(args.out)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            (F.max("last_seq") + 1).alias("n_seqs"),
        )
        .collect()
    }
    print(json.dumps({"seq_len": args.seq_len, "out": args.out, "splits": stats}))
    spark.stop()
    return 0


def cmd_srccap(args) -> int:
    """Per-source cap (RefinedWeb/Gopher domain-share bound): thin a
    corpus so no source keeps more than ≈--cap docs — batch one-shot
    (the oracle-attested residue rule), --follow (streaming over a
    durable per-source count registry at {out}_state; monotone
    threshold rule so later repair only DROPS), or --repair (converge
    a finished --follow run's output to the batch answer under the
    final counts). One JSON line, the shard/substr verb convention."""
    from propulsion_spark import get_spark

    if not getattr(args, "repair", False) and not args.src:
        print(json.dumps({"error": "--src is required (except with --repair)"}))
        return 2
    spark = get_spark("propulsion-srccap")
    base = args.out.rstrip("/")
    if getattr(args, "repair", False):
        from propulsion_spark.streaming.source_cap import CapPerSourceStream

        pipe = CapPerSourceStream(spark, base + "_state", args.cap)
        rep = pipe.retro_thin(args.out)
        print(json.dumps({"repaired": args.out, "cap": args.cap, **rep}))
        spark.stop()
        return 0
    if getattr(args, "follow", False):
        from propulsion_spark.streaming.source_cap import CapPerSourceStream

        pipe = CapPerSourceStream(
            spark, base + "_state", args.cap,
            auto_compact={"max_batches": 16},
        )
        stream = spark.readStream.schema(
            spark.read.parquet(args.src).schema
        ).parquet(args.src)
        q = pipe.stream_into(stream, args.out, base + "_ckpt")
        q.awaitTermination()
        print(
            json.dumps(
                {
                    "out": args.out,
                    "cap": args.cap,
                    "semantics": "monotone threshold (run --repair to "
                    "converge to the batch answer)",
                    **pipe.stats,
                }
            )
        )
        spark.stop()
        return 0
    from propulsion_spark.operators.textops import cap_per_source

    docs = spark.read.parquet(args.src)
    cap_per_source(docs, args.cap).write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"out": args.out, "cap": args.cap, "kept": n}))
    spark.stop()
    return 0


def cmd_substr(args) -> int:
    """Exact repeated-substring dedup (Lee et al. 2021 ExactSubstr as
    n-gram hashing, operators/substring_dedup.py): mask duplicated
    passages out of a document corpus, write the masked corpus, and
    report the mass removed — one JSON line, the shard/decontam verb
    convention."""
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark
    from propulsion_spark.operators.substring_dedup import (
        mask_repeated_ngrams,
    )

    if not getattr(args, "repair", False) and not args.src:
        print(json.dumps({"error": "--src is required (except with --repair)"}))
        return 2
    spark = get_spark("propulsion-substr")
    if getattr(args, "repair", False):
        # retro-mask a --follow run's emitted output against the FINAL
        # gram registry ({out}_state): pays back the streaming greedy
        # prefix's mask debt — occurrences emitted before their gram
        # crossed --min-dup, and canonicals dethroned by late smaller
        # doc ids — converging the output to the batch operator's
        # keep_first answer exactly (pinned by test). Bounded batch
        # job; idempotent.
        from propulsion_spark.streaming.substring_dedup import (
            SubstrDedupStream,
        )

        base = args.out.rstrip("/")
        pipe = SubstrDedupStream(
            spark, base + "_state", n=args.n, min_dup=args.min_dup
        )
        rep = pipe.retro_mask(args.out)
        print(
            json.dumps(
                {
                    "repaired": args.out,
                    "n": args.n,
                    "min_dup": args.min_dup,
                    **rep,
                }
            )
        )
        spark.stop()
        return 0
    if getattr(args, "follow", False):
        # streaming twin: cross-batch gram registry at {out}_state,
        # replay-idempotent masked output partitioned by _batch_id.
        # Streaming semantics are ALWAYS keep_first (already-emitted
        # batches can't be retro-masked) — see
        # streaming/substring_dedup.py for the equivalence contract.
        from propulsion_spark.streaming.substring_dedup import (
            SubstrDedupStream,
        )

        base = args.out.rstrip("/")
        pipe = SubstrDedupStream(
            spark,
            base + "_state",
            n=args.n,
            min_dup=args.min_dup,
            auto_compact={"max_batches": 16},
        )
        stream = spark.readStream.schema(
            spark.read.parquet(args.src).schema
        ).parquet(args.src)
        q = pipe.stream_into(stream, args.out, base + "_ckpt")
        q.awaitTermination()
        print(
            json.dumps(
                {
                    "out": args.out,
                    "n": args.n,
                    "min_dup": args.min_dup,
                    "semantics": "keep_first (streaming)",
                    **pipe.stats,
                }
            )
        )
        spark.stop()
        return 0
    docs = spark.read.parquet(args.src).select("doc_id", "text")
    mask_repeated_ngrams(
        docs, n=args.n, min_dup=args.min_dup, keep_first=args.keep_first
    ).write.mode("overwrite").parquet(args.out)
    rep = (
        spark.read.parquet(args.out)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_masked_tokens").alias("tokens_masked"),
            F.sum(
                F.when(F.col("n_masked_tokens") > 0, 1).otherwise(0)
            ).alias("n_docs_masked"),
        )
        .first()
    )
    print(
        json.dumps(
            {
                "out": args.out,
                "n": args.n,
                "min_dup": args.min_dup,
                "keep_first": bool(args.keep_first),
                "n_docs": rep["n_docs"],
                "n_docs_masked": rep["n_docs_masked"],
                "tokens_masked": int(rep["tokens_masked"] or 0),
            }
        )
    )
    spark.stop()
    return 0


def _index_policy_mode(args, idx, spark) -> "int | None":
    """Shared --max-batches/--max-tombstone-share handling for the
    `lex compact` / `ann reindex` maintenance verbs (one
    implementation so the policy/report contract cannot drift — the
    tombstones.py rationale). Returns an exit code when policy mode
    handled the invocation, None when the verb should run its plain
    in-place/successor path. Policy mode is IN-PLACE maintenance by
    definition; combining it with --dest would silently rebuild the
    live index in place while never creating the successor (the r13
    review's finding) — rejected loudly instead."""
    if args.max_batches is None and args.max_tombstone_share is None:
        return None
    if getattr(args, "n_buckets", None) is not None:
        print(
            json.dumps(
                {
                    "error": "policy mode (--max-batches/"
                    "--max-tombstone-share) never re-buckets; run the "
                    "verb with --n-buckets and no thresholds for an "
                    "explicit re-bucketing fold"
                }
            )
        )
        spark.stop()
        return 2
    if getattr(args, "dest", None):
        print(
            json.dumps(
                {
                    "error": "policy mode (--max-batches/"
                    "--max-tombstone-share) is in-place maintenance "
                    "and cannot target --dest; run the verb without "
                    "thresholds for a successor build"
                }
            )
        )
        spark.stop()
        return 2
    kw = {}
    if args.max_batches is not None:
        kw["max_batches"] = args.max_batches
    if args.max_tombstone_share is not None:
        kw["max_tombstone_share"] = args.max_tombstone_share
    rep = idx.auto_compact(**kw)
    print(
        json.dumps(
            {
                "path": args.path,
                "policy": kw,
                "triggered": rep is not None,
                **(rep or {}),
            }
        )
    )
    spark.stop()
    return 0


def cmd_quality(args) -> int:
    """Learned quality filter (operators/quality_classifier.py):
    train the hashed-ngram linear model on trusted-vs-raw samples,
    then score / Pareto-filter a corpus with it — one JSON line per
    invocation (the shard/decontam verb convention)."""
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark
    from propulsion_spark.operators.quality_classifier import (
        N_FEATURES,
        PARETO_ALPHA,
        pareto_filter,
        score_quality,
        train,
    )

    if args.action == "train" and not (args.pos and args.neg):
        print(json.dumps({"error": "quality train requires --pos and --neg"}))
        return 2
    if args.action == "score" and not (args.src and args.out):
        print(json.dumps({"error": "quality score requires --src and --out"}))
        return 2
    spark = get_spark("propulsion-quality")
    if args.action == "train":
        n_features = args.n_features or N_FEATURES
        model = train(
            spark.read.parquet(args.pos).select("doc_id", "text"),
            spark.read.parquet(args.neg).select("doc_id", "text"),
            n_features=n_features,
        )
        model.write().overwrite().save(args.model)
        print(
            json.dumps(
                {
                    "model": args.model,
                    "n_features": n_features,
                    "intercept": model.intercept,
                }
            )
        )
    else:  # score
        from pyspark.ml.classification import LogisticRegressionModel

        model = LogisticRegressionModel.load(args.model)
        docs = spark.read.parquet(args.src).select("doc_id", "text")
        # the feature space comes from the model; --n-features is only
        # a consistency check (mismatch raises in score_quality before
        # it could become an opaque BLAS error or silently wrong buckets)
        scored = score_quality(docs, model, n_features=args.n_features).join(
            docs, "doc_id"
        )
        if args.filter:
            scored = pareto_filter(
                scored, alpha=args.pareto_alpha, salt=args.salt
            )
        scored.write.mode("overwrite").parquet(args.out)
        rep = (
            spark.read.parquet(args.out)
            .agg(
                F.count("*").alias("n_docs"),
                F.avg("quality").alias("mean_quality"),
            )
            .first()
        )
        print(
            json.dumps(
                {
                    "out": args.out,
                    "filtered": bool(args.filter),
                    "alpha": args.pareto_alpha if args.filter else None,
                    "n_docs": rep["n_docs"],
                    "mean_quality": rep["mean_quality"],
                }
            )
        )
    spark.stop()
    return 0


def cmd_shard(args) -> int:
    """Shuffle-and-shard a packed/curated corpus: deterministic
    hash-order global shuffle, bounded-token shard assignment, the
    per-shard manifest. Batch mode writes output parquet partitioned
    by (split, shard_id) — one bounded file set per shard; --follow
    writes the standard streaming-twin layout instead (partitioned by
    _batch_id for replay-idempotent rewrites; shard_id is a column)."""
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark
    from propulsion_spark.operators.packing import shard_corpus, shard_manifest

    spark = get_spark("propulsion-shard")

    def derive(df):
        if "n_tokens" not in df.columns:
            df = df.withColumn(
                "n_tokens",
                F.expr("size(split(lower(trim(text)), '\\\\s+'))"),
            )
        if "split" not in df.columns:
            df = df.withColumn("split", F.lit("train"))
        return df

    fmt = getattr(args, "format", "parquet")
    epoch_weights = None
    if getattr(args, "epoch_weights", None):
        epoch_weights = {}
        for part in args.epoch_weights.split(","):
            key, _, bp = part.partition("=")
            key = key.strip()
            epoch_weights["__default__" if key == "default" else key] = int(bp)

    if getattr(args, "follow", False):
        if fmt != "parquet" or epoch_weights:
            print(
                json.dumps(
                    {
                        "error": "--format jsonl / --epoch-weights are "
                        "batch-mode options (the streaming twin writes "
                        "the replay-idempotent parquet layout)"
                    }
                )
            )
            return 2
        # incremental: shard new documents as they land in --src,
        # carrying each split's stream position across micro-batches
        from propulsion_spark.streaming.packing import shard_foreach_batch

        base = args.out.rstrip("/")
        inner = shard_foreach_batch(
            spark, base + "_state", args.out, args.shard_tokens,
            salt=args.salt,
        )
        stream = spark.readStream.schema(
            spark.read.parquet(args.src).schema
        ).parquet(args.src)
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: inner(derive(df), bid)
            )
            .option("checkpointLocation", base + "_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    else:
        docs = derive(spark.read.parquet(args.src))
        id_col = "doc_id"
        if epoch_weights:
            # epoch resampling ahead of the global shuffle: copies get a
            # unique (doc_id, copy_idx) identity so the shard prefix sum
            # orders them independently — repeats spread across shards
            # instead of landing adjacent
            from propulsion_spark.operators.textops import resample_epochs

            docs = resample_epochs(docs, epoch_weights).withColumn(
                "pack_id",
                F.concat_ws(
                    "#",
                    F.col("doc_id").cast("string"),
                    F.col("copy_idx").cast("string"),
                ),
            )
            id_col = "pack_id"
        sharded = shard_corpus(
            docs, args.shard_tokens, salt=args.salt, id_col=id_col
        )
        # one shuffle keyed by the bounded-size shards → one file set
        # per shard
        writer = (
            sharded.repartition("split", "shard_id")
            .write.mode("overwrite")
            .partitionBy("split", "shard_id")
        )
        if fmt == "jsonl":
            writer.json(args.out)
        else:
            writer.parquet(args.out)
    man = shard_manifest(
        spark.read.json(args.out)
        if fmt == "jsonl"
        else spark.read.parquet(args.out)
    )
    if args.manifest:
        man.write.mode("overwrite").parquet(args.manifest)
    stats = {
        r["split"]: {"n_shards": r["n_shards"], "n_tokens": r["n_tokens"]}
        for r in man.groupBy("split")
        .agg(
            F.count("*").alias("n_shards"), F.sum("n_tokens").alias("n_tokens")
        )
        .collect()
    }
    print(
        json.dumps(
            {
                "shard_tokens": args.shard_tokens,
                "salt": args.salt,
                "out": args.out,
                "splits": stats,
            }
        )
    )
    spark.stop()
    return 0


def cmd_lmtrain(args) -> int:
    """Train the bigram-LM counts table once, offline, for reuse by
    `sync --curate --lm-table` (the LM is then broadcast once per
    pipeline life — never retrained per batch)."""
    from propulsion_spark import get_spark
    from propulsion_spark.operators.lm import train_bigram_lm

    spark = get_spark("propulsion-lmtrain")
    docs = spark.read.parquet(args.src)
    lm = train_bigram_lm(docs, min_count=args.min_count)
    lm.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    agg = out.selectExpr(
        "count(*) AS n_grams_kept", "sum(c) AS total_gram_occurrences"
    ).collect()[0]
    print(
        json.dumps(
            {
                "min_count": args.min_count,
                "n_grams_kept": agg["n_grams_kept"],
                "total_gram_occurrences": agg["total_gram_occurrences"],
                "out": args.out,
            }
        )
    )
    spark.stop()
    return 0


def cmd_dsir(args) -> int:
    """DSIR data selection: importance-resample --k docs from --src
    toward the --target domain (two bigram LMs trained here, or reuse
    pre-trained counts via --target-lm/--raw-lm), write the selection."""
    from propulsion_spark import get_spark
    from propulsion_spark.operators.dsir import dsir_resample
    from propulsion_spark.operators.lm import broadcast_lm, train_bigram_lm

    if not args.target and not args.target_lm:
        print(json.dumps({"error": "one of --target / --target-lm required"}))
        return 2
    spark = get_spark("propulsion-dsir")
    docs = spark.read.parquet(args.src)
    if args.target_lm:
        target_lm = spark.read.parquet(args.target_lm)
    else:
        target_lm = train_bigram_lm(
            spark.read.parquet(args.target), min_count=args.min_count
        )
    if args.raw_lm:
        raw_lm = spark.read.parquet(args.raw_lm)
    else:
        raw_lm = train_bigram_lm(docs, min_count=args.min_count)
    t_bc = broadcast_lm(spark, target_lm)
    r_bc = broadcast_lm(spark, raw_lm)
    picked = dsir_resample(
        docs, k=args.k, target_bc=t_bc, raw_bc=r_bc, tau=args.tau,
        salt=args.salt,
    )
    picked.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    agg = out.selectExpr(
        "count(*) AS n_selected",
        "min(logw) AS min_logw",
        "max(logw) AS max_logw",
    ).collect()[0]
    print(
        json.dumps(
            {
                "k": args.k,
                "tau": args.tau,
                "n_selected": agg["n_selected"],
                "min_logw": agg["min_logw"],
                "max_logw": agg["max_logw"],
                "out": args.out,
            }
        )
    )
    spark.stop()
    return 0


def cmd_decontam(args) -> int:
    """Remove benchmark n-grams from a corpus: build the Bloom bitset
    from --bench, score every --src doc map-only, write kept/flagged."""
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark
    from propulsion_spark.operators.decontam import (
        build_ngram_bloom,
        contamination_scores,
    )

    spark = get_spark("propulsion-decontam")
    docs = spark.read.parquet(args.src)
    bench = spark.read.parquet(args.bench)
    bloom = build_ngram_bloom(bench, n=args.ngram, m_bits=1 << args.log2_bits)
    # score ONCE and pin: the kept write, the flagged count/write, and
    # the summary each trigger an action, and the mapInPandas hashing
    # scan is the expensive part — it must not re-run per action
    scores = contamination_scores(docs, bloom).persist()
    try:
        scored = docs.join(scores.drop("n_ngrams"), "doc_id")
        kept = scored.filter(
            F.col("contaminated_frac") <= args.threshold
        ).drop("n_hits", "contaminated_frac")
        flagged = scored.filter(F.col("contaminated_frac") > args.threshold)
        kept.write.mode("overwrite").parquet(args.out)
        n_flagged = flagged.count()
        if args.flagged:
            flagged.write.mode("overwrite").parquet(args.flagged)
        agg = scores.selectExpr(
            "count(*) AS n_docs",
            "sum(n_hits) AS total_hits",
        ).collect()[0]
    finally:
        scores.unpersist()
    print(
        json.dumps(
            {
                "ngram": args.ngram,
                "threshold": args.threshold,
                "n_docs": agg["n_docs"],
                "n_flagged": n_flagged,
                "total_ngram_hits": agg["total_hits"],
                "bloom_fill_ratio": round(bloom.fill_ratio, 8),
                "out": args.out,
            }
        )
    )
    spark.stop()
    return 0


def cmd_ann(args) -> int:
    """Build or query the materialized partition-pruned ANN index
    (pipelines/ann_index.py) from the corpus embeddings table."""
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark, load_table
    from propulsion_spark.pipelines.ann_index import AnnIndex

    spark = get_spark("propulsion-ann")
    if args.action == "build":
        idx = AnnIndex.build(spark, args.sf_dir, args.path, learned=args.learned)
        vec = spark.read.parquet(idx._vectors_path)
        print(
            json.dumps(
                {
                    "built": args.path,
                    "codebook": "learned" if args.learned else "seeded",
                    "n_vectors": vec.count(),
                    "n_cells": vec.select("cell").distinct().count(),
                }
            )
        )
    elif args.action == "stats":
        idx = AnnIndex(spark, args.path)
        print(json.dumps(idx.cell_skew()))
    elif args.action == "reindex":
        from propulsion_spark.fsio import fs_exists

        idx = AnnIndex(spark, args.path)
        if not fs_exists(spark, idx._vectors_path):
            # same JSON-error contract as `lex compact` (r13): a
            # never-built index is an operator error, not a traceback
            print(
                json.dumps(
                    {
                        "error": "no ANN index at --path "
                        f"(missing {idx._vectors_path}); build first"
                    }
                )
            )
            spark.stop()
            return 2
        rc = _index_policy_mode(args, idx, spark)
        if rc is not None:
            return rc
        before = idx.cell_skew()
        out = idx.reindex(dest=args.dest)
        print(
            json.dumps(
                {
                    "reindexed": out.path,
                    "skew_before": before["skew"],
                    "skew_after": out.cell_skew()["skew"],
                }
            )
        )
    elif args.action == "delete":
        idx = AnnIndex(spark, args.path)
        ids = [int(v) for v in args.ids.split(",") if v.strip()]
        if not ids:
            print(json.dumps({"error": "delete requires a non-empty --ids list"}))
            spark.stop()
            return 2
        idx.delete(ids, batch_id=args.del_batch)
        t = idx._tombstones()
        print(
            json.dumps(
                {
                    "deleted": len(ids),
                    "tombstones_live": t.count() if t is not None else 0,
                    "path": args.path,
                }
            )
        )
    else:
        idx = AnnIndex(spark, args.path)
        queries = (
            load_table(spark, args.sf_dir, "embeddings")
            .filter(F.col("vec_id") < args.queries)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        rows = idx.search(
            queries,
            top_k=args.top_k,
            n_probes=args.n_probes,
            quantized=getattr(args, "quantized", False),
            pq=getattr(args, "pq", False),
        ).collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    spark.stop()
    return 0


def cmd_lex(args) -> int:
    """Build or query the materialized lexical (inverted) index
    (pipelines/lexical_index.py) from the corpus documents table."""
    from propulsion_spark import get_spark
    from propulsion_spark.pipelines.lexical_index import LexicalIndex

    spark = get_spark("propulsion-lex")
    idx = LexicalIndex(spark, args.path)
    if args.action == "build":
        idx = LexicalIndex.build(
            spark, args.sf_dir, args.path, n_buckets=args.n_buckets
        )
        n_docs, total_dl = idx.stats()
        print(
            json.dumps(
                {
                    "built": args.path,
                    "n_docs": n_docs,
                    "total_tokens": total_dl,
                }
            )
        )
    elif args.action == "stats":
        n_docs, total_dl = idx.stats()
        heavy = (
            [r.asDict() for r in idx.token_stats(top=args.top_k).collect()]
            if n_docs
            else []
        )
        # lifecycle gauges alongside the skew report: batch
        # fragmentation is the `compact` signal, live tombstones are
        # the deleted mass still riding ranking stats until then
        n_batches = idx.n_batches()
        t = idx.tombstones()
        n_tombstones = t.count() if t is not None else 0
        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "total_tokens": total_dl,
                    "n_batches": n_batches,
                    "n_tombstones": n_tombstones,
                    "heaviest_tokens": heavy,
                }
            )
        )
    elif args.action == "delete":
        ids = [int(v) for v in args.ids.split(",") if v.strip()]
        if not ids:
            print(json.dumps({"error": "delete requires a non-empty --ids list"}))
            spark.stop()
            return 2
        idx.delete(ids, batch_id=args.del_batch)
        print(json.dumps({"deleted": len(ids), "path": args.path}))
    elif args.action == "compact":
        # a missing / never-built index is an operator error, not a
        # raw AnalysisException traceback — the JSON-line contract the
        # other verbs follow (the r12 ADVICE finding)
        from propulsion_spark.fsio import fs_exists

        if not fs_exists(spark, idx._postings_path):
            print(
                json.dumps(
                    {
                        "error": "no lexical index at --path "
                        f"(missing {idx._postings_path}); build or "
                        "ingest first"
                    }
                )
            )
            spark.stop()
            return 2
        rc = _index_policy_mode(args, idx, spark)
        if rc is not None:
            return rc
        files_before = len(spark.read.parquet(idx._postings_path).inputFiles())
        out = idx.compact(dest=args.dest, n_buckets=args.n_buckets)
        n_docs, total_dl = out.stats()
        try:
            files_after = len(
                spark.read.parquet(out._postings_path).inputFiles()
            )
        except Exception:
            files_after = 0  # all-deleted corpus compacts to nothing
        print(
            json.dumps(
                {
                    "compacted": out.path,
                    "n_docs": n_docs,
                    "total_tokens": total_dl,
                    "postings_files_before": files_before,
                    "postings_files_after": files_after,
                }
            )
        )
    else:  # search
        terms = tuple(t.strip() for t in args.terms.split(",") if t.strip())
        if not terms:
            print(json.dumps({"error": "--terms must name at least one term"}))
            spark.stop()
            return 2
        if args.max_df_share is not None:
            # the common-terms lever is never silent: report what the
            # threshold dropped before the (kept-terms-exact) results
            kept, dropped = idx.split_saturated(terms, args.max_df_share)
            print(
                json.dumps(
                    {
                        "max_df_share": args.max_df_share,
                        "kept_terms": list(kept),
                        "dropped_terms": dropped,
                    }
                )
            )
            terms = kept
        for r in idx.search(terms, k=args.top_k).collect():
            print(json.dumps(r.asDict()))
    spark.stop()
    return 0


def cmd_deltalite(args) -> int:
    """Maintenance for a deltalite table (the engine's native
    Delta-protocol log): describe the log's health, force a parquet
    checkpoint, vacuum retired files, or count rows as of a version
    (time travel)."""
    from propulsion_spark import get_spark
    from propulsion_spark.streaming.deltalite import DeltaliteLog, DeltaliteTable

    log = DeltaliteLog(args.path)
    if args.action == "describe":
        latest, live = log.snapshot_adds()
        ck = log.last_checkpoint()
        print(
            json.dumps(
                {
                    "path": args.path,
                    "version": latest,
                    "checkpoint": ck,
                    "commits_since_checkpoint": (
                        latest - ck if ck is not None else latest + 1
                    ),
                    "live_files": len(live),
                    "live_files_with_stats": sum(
                        1 for a in live.values() if a.get("stats")
                    ),
                    "live_bytes": sum(a.get("size", 0) for a in live.values()),
                }
            )
        )
        return 0
    if args.action == "checkpoint":
        v = log.checkpoint()
        print(json.dumps({"checkpointed": v, "path": args.path}))
        return 0
    spark = get_spark("propulsion-deltalite")
    table = DeltaliteTable(spark, args.path)
    if args.action == "vacuum":
        dropped = table.vacuum(grace_s=args.grace)
        print(json.dumps({"dropped": len(dropped), "grace_s": args.grace}))
    else:  # read
        df = table.read(version=args.version)
        print(
            json.dumps(
                {
                    "version": args.version,
                    "rows": df.count(),
                    "columns": df.columns,
                }
            )
        )
    spark.stop()
    return 0


def cmd_search(args) -> int:
    """Hybrid retrieval end-to-end: BM25 lexical ranks + ANN cosine
    ranks fused with reciprocal-rank fusion — the RAG-shaped consumer
    the three components exist to serve. The query is free-text terms
    (``--terms``, the lexical arm) plus query-by-example (``--query-id``
    names a corpus vec_id; doc_id == vec_id across the corpus tables).
    Reports the fused top-k and a recall gauge of both the ANN arm and
    the fused list against the brute-force cosine ground truth — the
    honest number a hybrid deployment watches."""
    from propulsion_spark import get_spark, load_table
    from propulsion_spark.operators.similarity import _spark_dot, rrf_fuse
    from propulsion_spark.operators.textops import bm25_topk
    from propulsion_spark.pipelines.ann_index import AnnIndex

    if args.queries_file:
        return _cmd_search_batch(args)
    terms = tuple(t.strip() for t in args.terms.split(",") if t.strip())
    if not terms:
        print(json.dumps({"error": "--terms must name at least one term"}))
        return 2
    if args.query_id is None:
        print(json.dumps({"error": "--query-id is required without --queries-file"}))
        return 2
    spark = get_spark("propulsion-search")
    from propulsion_spark.fsio import fs_exists

    idx = AnnIndex(spark, args.index)
    if not fs_exists(spark, idx._vectors_path):
        idx = AnnIndex.build(spark, args.sf_dir, args.index)
    docs = load_table(spark, args.sf_dir, "documents")
    cand = max(args.k * 4, args.k)  # per-arm candidate depth
    # lexical arm: multi-term BM25 top-cand via TakeOrderedAndProject
    # (distributed partial heaps — never a single-task global window),
    # materialized ONCE: the ≤cand rows feed both the fuse and the
    # n_bm25_candidates gauge (r10 re-executed the whole arm for the
    # count). With --lexical-index the arm serves from the materialized
    # inverted index instead — O(terms' postings buckets), no corpus
    # scan per query (bit-identical ranking, pinned by test).
    if args.lexical_index:
        from propulsion_spark.pipelines.lexical_index import LexicalIndex

        if fs_exists(spark, LexicalIndex(spark, args.lexical_index)._postings_path):
            lex = LexicalIndex(spark, args.lexical_index)
        else:
            lex = LexicalIndex.build(spark, args.sf_dir, args.lexical_index)
        bm25_rows = lex.search(terms, k=cand).collect()
    else:
        bm25_rows = bm25_topk(docs, terms=terms, k=cand).collect()
    bm25 = spark.createDataFrame(
        [(r["doc_id"], r["rank"]) for r in bm25_rows],
        "doc_id long, rank long",
    )
    # ANN arm: query-by-example through the materialized index
    emb = load_table(spark, args.sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == args.query_id).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    if q.isEmpty():
        print(json.dumps({"error": f"vec_id {args.query_id} not in embeddings"}))
        return 2
    ann = idx.search(q, top_k=cand, n_probes=args.n_probes).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse([bm25, ann]).filter(F.col("fused_rank") <= args.k)
    results = [r.asDict() for r in fused.orderBy("fused_rank").collect()]
    # recall gauge vs exact cosine top-k (one broadcast of the single
    # query row against the corpus — the measurement, not hope)
    qq = q.select(
        F.col("embedding").alias("q_emb"),
        F.sqrt(_spark_dot("embedding", "embedding")).alias("q_nrm"),
    )
    cosine = _spark_dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))
    bf_ids = {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") != args.query_id)
        .withColumn("nrm", F.sqrt(_spark_dot("embedding", "embedding")))
        .crossJoin(F.broadcast(qq))
        .select("vec_id", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(args.k)
        .collect()
    }
    ann_ids = {r["doc_id"] for r in ann.filter(F.col("rank") <= args.k).collect()}
    fused_ids = {r["doc_id"] for r in results}
    print(
        json.dumps(
            {
                "terms": list(terms),
                "query_id": args.query_id,
                "k": args.k,
                "results": results,
                "ann_recall": len(ann_ids & bf_ids) / args.k,
                "fused_recall": len(fused_ids & bf_ids) / args.k,
                "n_bm25_candidates": len(bm25_rows),
            }
        )
    )
    spark.stop()
    return 0


def _cmd_search_batch(args) -> int:
    """Batched hybrid serving: every query in --queries-file answered
    by ONE pruned postings scan + ONE ANN pass + per-query RRF
    (pipelines/hybrid.py) — the amortized shape a retrieval endpoint
    runs. Prints one JSON line per query."""
    from propulsion_spark import get_spark, load_table
    from propulsion_spark.pipelines.ann_index import AnnIndex
    from propulsion_spark.pipelines.hybrid import hybrid_search_many
    from propulsion_spark.pipelines.lexical_index import LexicalIndex

    if not args.lexical_index:
        print(json.dumps({"error": "--queries-file requires --lexical-index"}))
        return 2
    reqs = []
    with open(args.queries_file) as fh:
        for line in fh:
            if line.strip():
                reqs.append(json.loads(line))
    if not reqs:
        print(json.dumps({"error": "--queries-file holds no queries"}))
        return 2
    spark = get_spark("propulsion-search")
    from propulsion_spark.fsio import fs_exists

    idx = AnnIndex(spark, args.index)
    if not fs_exists(spark, idx._vectors_path):
        idx = AnnIndex.build(spark, args.sf_dir, args.index)
    lex = LexicalIndex(spark, args.lexical_index)
    if not fs_exists(spark, lex._postings_path):
        lex = LexicalIndex.build(spark, args.sf_dir, args.lexical_index)
    emb = load_table(spark, args.sf_dir, "embeddings")
    vec_ids = {int(r["vec_id"]) for r in reqs}
    emb_by_id = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").isin(list(vec_ids))).collect()
    }
    missing = sorted(vec_ids - set(emb_by_id))
    if missing:
        print(json.dumps({"error": f"vec_ids not in embeddings: {missing}"}))
        spark.stop()
        return 2
    term_lists = [[str(t) for t in r["terms"]] for r in reqs]
    if args.max_df_share is not None:
        # the lever is never silent: report the batch-wide decision,
        # then apply the already-computed split locally instead of
        # having search_many recompute it (one stats() + one pruned
        # df-table read, not two of each)
        all_terms = tuple(
            dict.fromkeys(t for ts in term_lists for t in ts)
        )
        kept, dropped = lex.split_saturated(all_terms, args.max_df_share)
        print(
            json.dumps(
                {
                    "max_df_share": args.max_df_share,
                    "kept_terms": list(kept),
                    "dropped_terms": dropped,
                }
            )
        )
        term_lists = [
            [t for t in ts if t not in dropped] for ts in term_lists
        ]
    queries = spark.createDataFrame(
        [
            (int(r["query_id"]), ts, emb_by_id[int(r["vec_id"])],
             int(r["vec_id"]))
            for r, ts in zip(reqs, term_lists)
        ],
        "query_id long, terms array<string>, embedding array<double>,"
        " vec_id long",
    )
    fused = hybrid_search_many(
        lex, idx, queries, k=args.k, n_probes=args.n_probes
    )
    by_q: dict = {}
    for r in fused.orderBy("query_id", "fused_rank").collect():
        by_q.setdefault(r["query_id"], []).append(
            {
                "doc_id": r["doc_id"],
                "rrf_score": r["rrf_score"],
                "n_lists": r["n_lists"],
                "fused_rank": r["fused_rank"],
            }
        )
    for req in reqs:
        qid = int(req["query_id"])
        print(
            json.dumps(
                {
                    "query_id": qid,
                    "k": args.k,
                    "results": by_q.get(qid, []),
                }
            )
        )
    spark.stop()
    return 0


def cmd_zorder(args) -> int:
    """Rewrite a parquet table in Z-order (Morton) layout over the given
    columns INTO a deltalite table — each output file's min/max envelope
    lands in the transaction log's ``add.stats`` — then report the
    file-skipping a probe box buys, answered from the log (zero data
    IO) with the footer-level gauge alongside as the cross-check."""
    from propulsion_spark import get_spark
    from propulsion_spark.operators.layout import (
        file_skip_stats,
        layout_zorder,
    )
    from propulsion_spark.streaming.deltalite import DeltaliteTable

    spark = get_spark("propulsion-zorder")
    cols = [c.strip() for c in args.cols.split(",") if c.strip()]
    df = spark.read.parquet(args.src)
    table = DeltaliteTable(spark, args.out)
    version = table.write(
        layout_zorder(df, cols, num_files=args.num_files), mode="overwrite"
    )
    report = {
        "cols": cols,
        "num_files": args.num_files,
        "rows": table.read().count(),
        "out": args.out,
        "log_version": version,
    }
    if args.probe:
        # probe format: col=lo:hi[,col=lo:hi...]
        box = {}
        for term in args.probe.split(","):
            name, _, rng = term.partition("=")
            lo, _, hi = rng.partition(":")
            box[name.strip()] = (float(lo), float(hi))
        report["probe"] = {k: list(v) for k, v in box.items()}
        report["skip"] = table.skip_stats(box)
        report["skip_footer"] = file_skip_stats(args.out, box)
    print(json.dumps(report))
    spark.stop()
    return 0


def cmd_datacard(args) -> int:
    """One-command corpus data card (the Datasheets-for-Datasets
    practice, Gebru et al. 2018): composes already-attested registered
    queries into a single JSON summary — size and language mix, exact
    token-length quantiles, exact-duplicate rate, cross-split
    contamination, benchmark overlap, mixture/epoch/priority-sample
    accounting. Every number comes from an oracle-verified query, so
    the card inherits the driver's correctness gate."""
    from propulsion_spark import get_spark
    from propulsion_spark.operators import load_all

    spark = get_spark("propulsion-datacard")
    reg = load_all()
    sf = args.sf_dir

    lang_rows = [
        r.asDict() for r in reg["text_lang_stats"].build(spark, sf).collect()
    ]
    langs = {
        r["lang"]: {
            k: r[k]
            for k in (
                "n_docs",
                "total_tokens",
                "p50_tokens",
                "p90_tokens",
                "p99_tokens",
                "lm_self_score",
            )
            if r.get(k) is not None
        }
        for r in lang_rows
    }
    dup = reg["dedup_exact"].build(spark, sf)
    n_fps = dup.count()
    n_docs = int(
        dup.agg(F.sum("n_copies").alias("n")).collect()[0]["n"] or 0
    )
    split_rows = [
        r.asDict()
        for r in reg["corpus_split_assign"].build(spark, sf).collect()
    ]
    card = {
        "sf_dir": sf,
        "n_docs": n_docs,
        "n_unique_fingerprints": n_fps,
        "exact_dup_rate": round(1 - n_fps / n_docs, 6) if n_docs else 0.0,
        "languages": langs,
        "splits": sorted(
            (
                {
                    "source": r["source"],
                    "split": r["split"],
                    "n_docs": r["n_docs"],
                    "total_chars": r["total_chars"],
                    "n_contaminated": r["n_contaminated"],
                    "n_bench_hit": r["n_bench_hit"],
                    "n_sampled": r["n_sampled"],
                    "epoch_copies": r["epoch_copies"],
                    "n_psample": r["n_psample"],
                }
                for r in split_rows
            ),
            key=lambda d: (d["source"], d["split"]),
        ),
    }
    print(json.dumps(card))
    spark.stop()
    return 0


def cmd_semdedup(args) -> int:
    """SemDeDup verdicts over an embeddings table: k-means cell
    assignment (label-seeded fixed-point centroids) + in-cell cosine
    eps-ball drops, written as (a_id witness, b_id dropped, cosine)."""
    from propulsion_spark import get_spark
    from propulsion_spark.operators.similarity import (
        SEMDEDUP_COS,
        semdedup_verdicts_joined,
        ivf_cells,
        normed_frame,
    )

    spark = get_spark("propulsion-semdedup")
    emb = spark.read.parquet(args.src)
    threshold = SEMDEDUP_COS if args.cos is None else args.cos
    # persisted-join form (see semdedup_verdicts_joined): four columns
    # only, so corpora with extra metadata columns don't bloat the cache
    joined = (
        normed_frame(emb)
        .join(ivf_cells(emb), "vec_id")
        .select("vec_id", "embedding", "nrm", "cell")
        .persist()
    )
    try:
        verdicts = semdedup_verdicts_joined(joined, threshold=threshold)
        verdicts.write.mode("overwrite").parquet(args.out)
    finally:
        joined.unpersist()
    written = spark.read.parquet(args.out)
    print(
        json.dumps(
            {
                "n_vectors": emb.count(),
                "n_dropped": written.count(),
                "cos": threshold,
                "out": args.out,
            }
        )
    )
    spark.stop()
    return 0


def cmd_mediadedup(args) -> int:
    """Perceptual near-duplicate media pairs: map-only decode+fingerprint
    (pHash for image/bmp, spectral fingerprint for audio/wav), then the
    multi-index hamming pair join — media bytes never shuffle."""
    from pyspark.sql import functions as F

    from propulsion_spark import get_spark
    from propulsion_spark.operators.perceptual import (
        media_fingerprints,
        perceptual_dedup_pairs,
    )

    spark = get_spark("propulsion-mediadedup")
    media = spark.read.parquet(args.src)
    fps = media_fingerprints(
        media,
        media_col=args.media_col,
        type_col=args.type_col,
        id_col=args.id_col,
    ).persist()  # fingerprint scan is the expensive part: pin across
    try:  # the pair join + the two summary counts
        pairs = perceptual_dedup_pairs(fps, max_hamming=args.max_hamming)
        pairs.write.mode("overwrite").parquet(args.out)
        written = spark.read.parquet(args.out)
        summary = {
            "n_media": fps.count(),
            "n_fingerprinted": fps.filter(F.col("fp64").isNotNull()).count(),
            "n_pairs": written.count(),
            "max_hamming": args.max_hamming,
            "out": args.out,
        }
    finally:
        fps.unpersist()
    print(json.dumps(summary))
    spark.stop()
    return 0


def cmd_vacuum(args) -> int:
    """Remove orphaned MVCC segments (crashed commits) past the grace
    age — the Delta VACUUM analog for the store/positions layouts."""
    from propulsion_spark.streaming.mvcc import FileLease, JsonManifest

    with FileLease(args.path):
        removed = JsonManifest(args.path).vacuum(args.grace_s)
    print(json.dumps({"path": args.path, "removed": removed}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="propulsion_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("sync", help="pump a source into a sink until caught up")
    s.add_argument(
        "--from",
        dest="source",
        required=True,
        help="events:<sf_dir> | documents:<sf_dir> | changefeed:<dir> | "
        "store-cdc:<store_dir> | json:<file>",
    )
    s.add_argument("--to", required=True)
    s.add_argument("--group", default="default")
    s.add_argument("--checkpoints", default="/tmp/propulsion-ckpt")
    s.add_argument("--positions", default="/tmp/propulsion-pos")
    s.add_argument("--follow", action="store_true")
    s.add_argument("--timeout", type=float, default=300.0)
    s.add_argument("-c", "--category", action="append")
    s.add_argument("--deny-category", action="append")
    s.add_argument("-s", "--stream", action="append")
    s.add_argument("--deny-stream", action="append")
    s.add_argument("-e", "--event-type", action="append")
    s.add_argument("--deny-event-type", action="append")
    s.add_argument(
        "--curate",
        action="store_true",
        help="route document batches through the curation pipeline "
        "(quality + repetition gates, dedup, split assignment)",
    )
    s.add_argument(
        "--near-dedup",
        action="store_true",
        help="with --curate: also drop MinHash-LSH near-duplicates "
        "(intra-batch connected-components canonical keep + cross-batch "
        "band table)",
    )
    s.add_argument(
        "--lm-table",
        help="with --curate: parquet dir of bigram-LM counts (written "
        "by the `lmtrain` verb); enables the LM likelihood gate",
    )
    s.add_argument(
        "--lm-min-score",
        type=float,
        default=None,
        help="with --lm-table: reject docs whose mean bigram "
        "log-likelihood is below this (default -8.0)",
    )
    s.add_argument(
        "--redact-pii",
        action="store_true",
        help="with --curate: scrub emails/SSNs/phones/IPv4s to typed "
        "placeholders before every other stage, so fingerprints, spans "
        "and shards only ever see redacted text",
    )
    s.add_argument(
        "--span-dedup",
        action="store_true",
        help="with --curate: cut cross-document duplicated k-token "
        "spans before the gates (Lee et al. 2021 ExactSubstr; intra-"
        "batch span table — run single-batch for corpus-wide spans)",
    )
    s.add_argument(
        "--substr-registry",
        help="with --curate: durable gram-count registry dir enabling "
        "CROSS-batch repeated-passage masking before the gates "
        "(streaming ExactSubstr, keep_first semantics, "
        "replay-idempotent, auto-compacted)",
    )
    s.add_argument("--substr-n", type=int, default=None)
    s.add_argument("--substr-min-dup", type=int, default=None)
    s.add_argument(
        "--semdedup-embeddings",
        help="with --curate: parquet dir of (vec_id, embedding, label) "
        "rows keyed by doc_id — drops semantic near-duplicates "
        "(SemDeDup: in-cell cosine eps-balls over a k-means "
        "assignment; drop set computed once per pipeline life)",
    )
    s.add_argument(
        "--semdedup-cos",
        type=float,
        help="with --semdedup-embeddings: cosine threshold for the "
        "eps-ball (default SEMDEDUP_COS)",
    )
    s.add_argument(
        "--dsir-target-lm",
        help="with --curate: parquet LM counts of the TARGET domain "
        "(lmtrain) — gates docs by DSIR log importance weight",
    )
    s.add_argument(
        "--dsir-raw-lm",
        help="with --dsir-target-lm: parquet LM counts of the RAW "
        "corpus (lmtrain)",
    )
    s.add_argument(
        "--dsir-min-logw",
        type=float,
        help="with the DSIR gate: minimum log importance weight "
        "(default 0.0 — at least as target-like as raw)",
    )
    s.add_argument(
        "--quality-model",
        help="--curate: saved quality-classifier model dir (train with "
        "the `quality train` verb); default acceptance is the "
        "deterministic Pareto rule",
    )
    s.add_argument(
        "--quality-min", type=float,
        help="with --quality-model: hard score floor instead of the "
        "Pareto-shaped sampling",
    )
    s.add_argument(
        "--quality-n-features", type=int,
        help="with --quality-model: feature-space size the model was "
        "trained with (default 2^18)",
    )
    s.add_argument(
        "--max-per-source", type=int,
        help="with --curate: cross-batch per-source (domain) cap — "
        "survivors of a source beyond this expected count are thinned "
        "by the monotone admit rule over a durable count registry "
        "(default registry: <out>/_src_counts; converge exactly with "
        "`srccap --repair`)",
    )
    s.add_argument(
        "--srccap-registry",
        help="with --max-per-source: explicit count-registry dir "
        "(shareable with a standalone srccap stream)",
    )
    s.set_defaults(fn=cmd_sync)

    st = sub.add_parser("stats", help="event-type stats over a fixture dir")
    st.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    st.set_defaults(fn=cmd_stats)

    ini = sub.add_parser("init", help="provision the storage layout")
    ini.add_argument("--path", required=True)
    ini.set_defaults(fn=cmd_init)

    cp = sub.add_parser(
        "compact", help="fold multi-segment store buckets (OPTIMIZE analog)"
    )
    cp.add_argument("--store", required=True)
    cp.add_argument("--max-segments", type=int, default=16)
    cp.add_argument("--max-buckets", type=int, default=None)
    cp.set_defaults(fn=cmd_compact)

    ix = sub.add_parser("index", help="build the CDC span index from a store")
    ix.add_argument("--store", required=True)
    ix.add_argument("--index", required=True)
    ix.set_defaults(fn=cmd_index)

    ck = sub.add_parser("checkpoint", help="inspect/override consumer positions")
    ck.add_argument("--path", required=True)
    ck.add_argument("--group", default="default")
    ck.add_argument("--source", default="events")
    ck.add_argument("--tranche", default="0")
    ck.add_argument("--override", type=int)
    ck.set_defaults(fn=cmd_checkpoint)

    va = sub.add_parser("vacuum", help="remove orphaned MVCC segments")
    va.add_argument("--path", required=True)
    va.add_argument("--grace-s", type=float, default=3600.0)
    va.set_defaults(fn=cmd_vacuum)

    pk = sub.add_parser(
        "pack", help="sequence-pack a curated corpus into training sequences"
    )
    pk.add_argument("--src", required=True, help="curated-corpus parquet dir")
    pk.add_argument("--out", required=True, help="packing-assignment output dir")
    pk.add_argument("--seq-len", type=int, default=2048)
    pk.add_argument(
        "--manifest",
        help="also write the per-sequence doc manifest to this dir",
    )
    pk.add_argument(
        "--follow",
        action="store_true",
        help="incremental: pack documents as they land in --src, "
        "carrying each split's stream position across micro-batches",
    )
    pk.add_argument(
        "--state",
        help="--follow: per-split carry-state dir (default <out>_state)",
    )
    pk.set_defaults(fn=cmd_pack)

    sh = sub.add_parser(
        "shard",
        help="deterministic shuffle + bounded-token shards for training",
    )
    sh.add_argument("--src", required=True, help="corpus parquet dir")
    sh.add_argument("--out", required=True, help="sharded output dir")
    sh.add_argument("--shard-tokens", type=int, default=1 << 20)
    sh.add_argument(
        "--salt", default="shard-0",
        help="re-salting draws an independent permutation",
    )
    sh.add_argument(
        "--manifest", help="also write the per-shard manifest to this dir"
    )
    sh.add_argument(
        "--follow",
        action="store_true",
        help="incremental: shard documents as they land in --src, "
        "carrying each split's stream position across micro-batches",
    )
    sh.add_argument(
        "--format",
        choices=["parquet", "jsonl"],
        default="parquet",
        help="physical shard format: parquet (default) or JSON-lines "
        "(one .json file set per shard dir — the layout tokenizer "
        "pipelines ingest); batch mode only",
    )
    sh.add_argument(
        "--epoch-weights",
        help="apply epoch resampling before sharding: "
        "'src0=25000,src1=15000[,default=10000]' basis points of 10000 "
        "per source (>10000 up-samples); batch mode only",
    )
    sh.set_defaults(fn=cmd_shard)

    su = sub.add_parser(
        "substr",
        help="exact repeated-substring dedup: mask duplicated n-gram "
        "spans (ExactSubstr) and write the masked corpus",
    )
    su.add_argument(
        "--src", default=None,
        help="corpus parquet dir (required except with --repair)",
    )
    su.add_argument("--out", required=True, help="masked output dir")
    su.add_argument("--n", type=int, default=8, help="gram length (tokens)")
    su.add_argument(
        "--min-dup", type=int, default=2,
        help="mask grams occurring at least this many times corpus-wide",
    )
    su.add_argument(
        "--keep-first", action="store_true",
        help="exempt each gram's corpus-canonical occurrence "
        "(one copy of every duplicated passage survives)",
    )
    su.add_argument(
        "--follow", action="store_true",
        help="streaming twin: ingest --src incrementally, masking "
        "against the durable cross-batch gram registry at "
        "{out}_state (keep_first semantics; replay-idempotent)",
    )
    su.add_argument(
        "--repair", action="store_true",
        help="retro-mask a --follow run's output at --out against its "
        "final gram registry: pays back the streaming mask debt "
        "(the mask_debt gauge), converging to the batch keep_first "
        "answer; bounded and idempotent",
    )
    su.set_defaults(fn=cmd_substr)

    sc = sub.add_parser(
        "srccap",
        help="per-source cap: thin a corpus so no source keeps more "
        "than ~N docs (RefinedWeb/Gopher domain-share bound)",
    )
    sc.add_argument(
        "--src", default=None,
        help="corpus parquet dir (required except with --repair)",
    )
    sc.add_argument("--out", required=True, help="thinned output dir")
    sc.add_argument("--cap", type=int, default=10, help="docs kept per source")
    sc.add_argument(
        "--follow", action="store_true",
        help="streaming twin: ingest --src incrementally against the "
        "durable per-source count registry at {out}_state (monotone "
        "threshold rule; early batches over-admit, --repair converges)",
    )
    sc.add_argument(
        "--repair", action="store_true",
        help="re-evaluate a --follow run's output under the FINAL "
        "source counts and drop the early over-admissions; idempotent",
    )
    sc.set_defaults(fn=cmd_srccap)

    qu = sub.add_parser(
        "quality",
        help="learned quality filter: train a hashed-ngram linear "
        "model (trusted vs raw), score / Pareto-filter a corpus",
    )
    qu.add_argument("action", choices=["train", "score"])
    qu.add_argument("--pos", help="train: trusted-sample parquet dir")
    qu.add_argument("--neg", help="train: raw-sample parquet dir")
    qu.add_argument("--model", required=True, help="model dir")
    qu.add_argument("--src", help="score: corpus parquet dir")
    qu.add_argument("--out", help="score: scored/filtered output dir")
    qu.add_argument(
        "--n-features", type=int, default=None,
        help="train: feature-space size (default 2^18). score: the "
        "space is DERIVED from the fitted model (model.numFeatures); "
        "a value here is only a consistency check against it",
    )
    qu.add_argument(
        "--filter", action="store_true",
        help="score: apply the Pareto acceptance rule (GPT-3's "
        "quality-shaped sampling) instead of keeping every row",
    )
    qu.add_argument("--pareto-alpha", type=float, default=9.0)
    qu.add_argument("--salt", default="quality-0")
    qu.set_defaults(fn=cmd_quality)

    dc = sub.add_parser(
        "decontam", help="remove benchmark n-grams from a training corpus"
    )
    dc.add_argument("--src", required=True, help="corpus parquet dir")
    dc.add_argument(
        "--bench", required=True, help="benchmark/eval-set parquet dir"
    )
    dc.add_argument("--out", required=True, help="kept-docs output dir")
    dc.add_argument("--flagged", help="also write flagged docs to this dir")
    dc.add_argument("--ngram", type=int, default=8)
    dc.add_argument("--threshold", type=float, default=0.0)
    dc.add_argument(
        "--log2-bits", type=int, default=23,
        help="Bloom bitset size: 2^N bits (default 1 MiB)",
    )
    dc.set_defaults(fn=cmd_decontam)

    lt = sub.add_parser(
        "lmtrain",
        help="train a bigram-LM counts table for the curation LM gate",
    )
    lt.add_argument("--src", required=True, help="reference corpus parquet dir")
    lt.add_argument("--out", required=True, help="LM counts output dir")
    lt.add_argument(
        "--min-count", type=int, default=2,
        help="prune grams seen fewer times (keeps the table broadcastable)",
    )
    lt.set_defaults(fn=cmd_lmtrain)

    ds = sub.add_parser(
        "dsir",
        help="importance-resample k docs toward a target domain (DSIR)",
    )
    ds.add_argument("--src", required=True, help="raw corpus parquet dir")
    ds.add_argument(
        "--target", help="target-domain docs parquet dir (trains the target LM)"
    )
    ds.add_argument("--target-lm", help="pre-trained target LM counts (lmtrain)")
    ds.add_argument("--raw-lm", help="pre-trained raw LM counts (lmtrain)")
    ds.add_argument("--out", required=True)
    ds.add_argument("--k", type=int, required=True)
    ds.add_argument("--tau", type=float, default=1.0,
                    help="resampling temperature (0 → hard top-k)")
    ds.add_argument("--salt", default="dsir-0",
                    help="re-salt for an independent draw")
    ds.add_argument("--min-count", type=int, default=2)
    ds.set_defaults(fn=cmd_dsir)

    lx = sub.add_parser(
        "lex",
        help="build/search the materialized lexical (inverted) index",
    )
    lx.add_argument(
        "action", choices=["build", "search", "stats", "delete", "compact"]
    )
    lx.add_argument("--path", required=True)
    lx.add_argument(
        "--dest", default=None,
        help="compact: write the folded index here instead of in place",
    )
    lx.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    lx.add_argument("--terms", default="", help="search: comma-separated terms")
    lx.add_argument("--top-k", type=int, default=10)
    lx.add_argument(
        "--ids", default="", help="delete: comma-separated doc_ids to tombstone"
    )
    lx.add_argument(
        "--del-batch", type=int, default=None,
        help="delete: tombstone batch id (default: current max _batch_id)",
    )
    lx.add_argument(
        "--max-df-share", type=float, default=None,
        help="search: drop query terms whose doc-freq share exceeds "
        "this (the Lucene common-terms lever) — dropped terms are "
        "reported, results are exact over the kept terms",
    )
    lx.add_argument(
        "--max-batches", type=int, default=None,
        help="compact: only fold when the policy trips (n_batches > "
        "this or tombstone share > --max-tombstone-share) — the "
        "auto_compact maintenance mode",
    )
    lx.add_argument(
        "--max-tombstone-share", type=float, default=None,
        help="compact: tombstoned-docs share threshold for the policy "
        "mode (default 0.2 when --max-batches is given)",
    )
    lx.add_argument(
        "--n-buckets", type=int, default=None,
        help="build: token-bucket fan-out for the new index; compact: "
        "re-bucket the fold to this fan-out (the persisted layout_meta "
        "flips with it — the SCALE.md raise-with-corpus-size knob)",
    )
    lx.set_defaults(fn=cmd_lex)

    an = sub.add_parser(
        "ann", help="build/search the materialized partition-pruned ANN index"
    )
    an.add_argument(
        "action", choices=["build", "search", "stats", "reindex", "delete"]
    )
    an.add_argument(
        "--ids", default="",
        help="delete: comma-separated vec_ids to tombstone",
    )
    an.add_argument(
        "--del-batch", type=int, default=None,
        help="delete: tombstone batch id (default: current max _batch_id "
        "— kill every copy that exists right now)",
    )
    an.add_argument(
        "--pq", action="store_true",
        help="search: rank by ADC over stored PQ codes, exact re-rank",
    )
    an.add_argument("--path", required=True)
    an.add_argument(
        "--dest", default=None,
        help="reindex: write the rebuilt index here instead of in place",
    )
    an.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    an.add_argument("--learned", action="store_true")
    an.add_argument("--top-k", type=int, default=5)
    an.add_argument("--n-probes", type=int, default=2)
    an.add_argument(
        "--queries", type=int, default=10,
        help="use the first N corpus vectors as the query set",
    )
    an.add_argument(
        "--quantized", action="store_true",
        help="rank candidates by their stored int8 quantization",
    )
    an.add_argument(
        "--max-batches", type=int, default=None,
        help="reindex: only rebuild when the policy trips (n_batches "
        "> this or tombstone share > --max-tombstone-share) — the "
        "auto_compact maintenance mode",
    )
    an.add_argument(
        "--max-tombstone-share", type=float, default=None,
        help="reindex: tombstoned share threshold for the policy mode "
        "(default 0.2 when --max-batches is given)",
    )
    an.set_defaults(fn=cmd_ann)

    dl = sub.add_parser(
        "delta",
        help="deltalite table maintenance: describe / checkpoint / "
        "vacuum / versioned read (time travel)",
    )
    dl.add_argument("action", choices=["describe", "checkpoint", "vacuum", "read"])
    dl.add_argument("--path", required=True, help="deltalite table dir")
    dl.add_argument("--grace", type=float, default=3600.0,
                    help="vacuum: retention grace seconds")
    dl.add_argument("--version", type=int, default=None,
                    help="read: versionAsOf (default latest)")
    dl.set_defaults(fn=cmd_deltalite)

    se = sub.add_parser(
        "search",
        help="hybrid retrieval: BM25 + ANN-index search fused with RRF, "
        "with a recall gauge vs brute force",
    )
    se.add_argument(
        "--terms", default="", help="comma-separated lexical query terms"
    )
    se.add_argument(
        "--query-id", type=int, default=None,
        help="query-by-example: a corpus vec_id (doc_id == vec_id)",
    )
    se.add_argument(
        "--queries-file", default=None,
        help="batched serving: JSON-lines file of "
        '{"query_id": N, "terms": [...], "vec_id": N} — one pruned '
        "postings scan + one ANN pass + per-query RRF for ALL queries "
        "(requires --lexical-index)",
    )
    se.add_argument(
        "--max-df-share", type=float, default=None,
        help="batched serving: the lexical arm's common-terms lever — "
        "drop query terms whose doc-freq share exceeds this before "
        "their postings are read (dropped terms reported)",
    )
    se.add_argument(
        "--index", required=True, help="ANN index dir (built here if absent)"
    )
    se.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    se.add_argument("--k", type=int, default=10)
    se.add_argument("--n-probes", type=int, default=2)
    se.add_argument(
        "--lexical-index", default=None,
        help="materialized inverted-index dir (built here if absent); "
        "the BM25 arm then reads the terms' postings buckets instead "
        "of scanning the corpus",
    )
    se.set_defaults(fn=cmd_search)

    md = sub.add_parser(
        "mediadedup",
        help="perceptual near-duplicate media pairs (pHash / audio FP)",
    )
    md.add_argument("--src", required=True, help="media parquet dir")
    md.add_argument("--out", required=True, help="pairs output dir")
    md.add_argument("--max-hamming", type=int, default=3)
    md.add_argument("--media-col", default="media")
    md.add_argument(
        "--type-col", default="media_type",
        help="column holding image/bmp | audio/wav (dotted paths OK)",
    )
    md.add_argument("--id-col", default="doc_id")
    md.set_defaults(fn=cmd_mediadedup)

    sd = sub.add_parser(
        "semdedup",
        help="semantic near-duplicate verdicts over an embeddings table",
    )
    sd.add_argument(
        "--src", required=True,
        help="embeddings parquet dir: (vec_id, embedding, label)",
    )
    sd.add_argument("--out", required=True, help="verdicts output dir")
    sd.add_argument("--cos", type=float, help="eps-ball cosine threshold")
    sd.set_defaults(fn=cmd_semdedup)

    dc = sub.add_parser(
        "datacard",
        help="one-JSON corpus data card from the attested query surface",
    )
    dc.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    dc.set_defaults(fn=cmd_datacard)

    zo = sub.add_parser(
        "zorder",
        help="rewrite a parquet table in Z-order layout for file skipping",
    )
    zo.add_argument("--src", required=True, help="input parquet dir")
    zo.add_argument("--out", required=True, help="z-ordered output dir")
    zo.add_argument(
        "--cols", required=True, help="comma-separated layout columns"
    )
    zo.add_argument("--num-files", type=int, default=32)
    zo.add_argument(
        "--probe",
        help="optional box predicate col=lo:hi[,col=lo:hi] — reports how "
        "many files a stats-aware scan would skip",
    )
    zo.set_defaults(fn=cmd_zorder)

    qs = sub.add_parser("queries", help="list registered queries")
    qs.set_defaults(fn=cmd_queries)

    qr = sub.add_parser("query", help="run a registered query")
    qr.add_argument("name")
    qr.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    qr.add_argument("--limit", type=int, default=20)
    qr.add_argument("--out", help="write full result as parquet instead")
    qr.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
