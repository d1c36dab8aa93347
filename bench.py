"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end through the noop sink (full compute,
no write cost). BASELINE.md's bar: within 2× of plain PySpark doing
the same work — our operators ARE declarative PySpark plans, so the
comparison is plan quality (pushdown, broadcast, shuffle count), not
framework overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "stream_fold",
    "stream_envelope",
    "write_pos_dedup",
    "span_coalesce",
    "hydration_join",
    "pricing_summary",
    "revenue_by_nation",
    "priority_reports",
    "window_aggregates",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_buckets",
    "text_metrics",
    "text_repetition",
    "similarity_topk_bruteforce",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "lsh_bucket_stats",
    "multimodal_frame_features",
    "asof_join_orders",
    "range_join_events_1h",
    "timeseries_resample",
    "sketch_distinct_kmv",
    "dedup_clusters",
    "corpus_topk_ngrams",
    "text_tfidf_keywords",
    "corpus_split_assign",
]


def bench_pipelines(spark, sf_dir: str) -> dict[str, float]:
    """BASELINE.md's pipeline workloads: min of two full passes (fresh
    state each pass — same steady-state methodology as the headline
    queries; pipeline numbers are single Spark actions, so one host
    noise spike would otherwise poison a round)."""
    runs = [_bench_pipelines_once(spark, sf_dir) for _ in range(2)]
    return {k: min(r[k] for r in runs) for k in runs[0]}


def _bench_pipelines_once(spark, sf_dir: str) -> dict[str, float]:
    """One pass over the pipeline workloads: the ingest slice,
    stateful-sink redelivery dedup, the idempotent store writer on
    redelivered batches, and a bounded AvailableNow e2e run."""
    import shutil
    import tempfile

    from propulsion_spark.operators.fixtures import stream_events
    from propulsion_spark.sources.parquet_feed import changefeed_stream
    from propulsion_spark.streaming import StreamsSink
    from propulsion_spark.streaming.event_store import EventStoreTable

    tmp = tempfile.mkdtemp(prefix="propulsion-bench-")
    timings: dict[str, float] = {}
    try:
        envelope = stream_events(spark, sf_dir)

        # ingest slice: envelope → per-stream ordered sink → positions
        def handle(stream, events):
            return "ok", int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(spark, handle, f"{tmp}/pos")
        t0 = time.time()
        sink.process_batch(envelope)
        timings["pipeline_ingest_sink"] = round(time.time() - t0, 3)

        # redelivery of the same batch: write-pos dedup path
        t0 = time.time()
        sink.process_batch(envelope)
        timings["pipeline_redelivery_dedup"] = round(time.time() - t0, 3)

        # same handler through the mapInPandas fast path (many streams
        # per Arrow batch instead of one exchange per stream)
        fsink = StreamsSink.start_concurrent(
            spark, handle, f"{tmp}/fpos", fast_path=True
        )
        t0 = time.time()
        fsink.process_batch(envelope)
        timings["pipeline_ingest_fastpath"] = round(time.time() - t0, 3)

        # unordered item-level fan-out (ParallelSink): handler outputs
        # spooled durably to parquet — tracks the spool-write cost that
        # replaced localCheckpoint (r5)
        import pandas as pd
        from propulsion_spark.streaming import ParallelSink

        def handle_items(pdf: "pd.DataFrame") -> "pd.DataFrame":
            return pd.DataFrame(
                {"stream_name": pdf["stream_name"], "double_idx": pdf["idx"] * 2}
            )

        psink = ParallelSink(
            spark,
            handle_items,
            "stream_name string, double_idx long",
            spool_dir=f"{tmp}/pspool",
        )
        t0 = time.time()
        psink.process_batch(envelope)
        timings["pipeline_parallel_sink"] = round(time.time() - t0, 3)

        # the same fold, fully declarative (no Python handler hop)
        from pyspark.sql import functions as F
        from propulsion_spark.streaming import DeclarativeSink

        dsink = DeclarativeSink.start(
            spark,
            {
                "n": F.count("*"),
                "total": F.sum(F.col("value").cast("decimal(38,6)")).cast("double"),
                "last_ts": F.max("ts"),
            },
            f"{tmp}/dpos",
        )
        t0 = time.time()
        dsink.process_batch(envelope)
        timings["pipeline_ingest_declarative"] = round(time.time() - t0, 3)

        # idempotent store writer, then full redelivery (conflict path)
        store = EventStoreTable(spark, f"{tmp}/store")
        t0 = time.time()
        store.sync(envelope)
        timings["pipeline_store_sync"] = round(time.time() - t0, 3)
        t0 = time.time()
        store.sync(envelope)
        timings["pipeline_store_resync"] = round(time.time() - t0, 3)

        # change-data feed drain: read everything the store committed
        # through the CDC log (segment-direct reads, no store scan)
        t0 = time.time()
        cdf, _ = store.changes(0)
        cdf.write.format("noop").mode("overwrite").save()
        timings["pipeline_store_cdc_drain"] = round(time.time() - t0, 3)

        # bounded e2e: changefeed dir → AvailableNow streaming run
        envelope.drop("user_id", "value").coalesce(4).write.mode("overwrite").parquet(
            f"{tmp}/feed"
        )
        sink2 = StreamsSink.start_concurrent(spark, handle, f"{tmp}/pos2")
        t0 = time.time()
        q = sink2.run_stream(
            changefeed_stream(spark, f"{tmp}/feed"), f"{tmp}/ck", availableNow=True
        )
        q.awaitTermination(600)
        timings["pipeline_e2e_availablenow"] = round(time.time() - t0, 3)

        # stateful span kernel: gapped spans buffered across micro-batches,
        # then filled, then redelivered — the requireAll-with-memory path
        # (applyInPandasWithState) whose per-batch cost the bench tracks
        # like the stateless sinks'. Three 1-file triggers: batch 1 buffers
        # every stream's gapped suffix, batch 2 fills the gaps (dispatch),
        # batch 3 full-duplicate redelivery (state-hit dedup).
        from propulsion_spark.envelope import STREAM_EVENT_SCHEMA
        from propulsion_spark.streaming.state_kernel import stateful_stream

        cols = [f.name for f in STREAM_EVENT_SCHEMA.fields]
        sub = envelope.filter(F.col("user_id") % 10 == 0).select(*cols)
        indir = f"{tmp}/skin"
        sub.filter(F.col("idx") % 3 != 1).coalesce(1).write.mode("append").parquet(indir)
        fills = sub.filter(F.col("idx") % 3 == 1).coalesce(1)
        fills.write.mode("append").parquet(indir)
        fills.write.mode("append").parquet(indir)  # redelivery batch
        outcomes = stateful_stream(
            spark.readStream.schema(STREAM_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(indir),
            handle,
        )
        t0 = time.time()
        q = (
            outcomes.writeStream.format("noop")
            .option("checkpointLocation", f"{tmp}/skck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        timings["pipeline_state_kernel_gapped"] = round(time.time() - t0, 3)

        # materialized ANN index: one-time build, then the steady-state
        # partition-pruned search the serving path pays per query batch
        from propulsion_spark import load_table
        from propulsion_spark.pipelines.ann_index import AnnIndex

        t0 = time.time()
        aidx = AnnIndex.build(spark, sf_dir, f"{tmp}/annidx")
        timings["pipeline_ann_build"] = round(time.time() - t0, 3)
        queries = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < 10)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        t0 = time.time()
        aidx.search(queries).write.format("noop").mode("overwrite").save()
        timings["pipeline_ann_search"] = round(time.time() - t0, 3)

        # IVF-PQ serving path: ADC shortlist over the stored 8-byte PQ
        # codes, exact re-rank of the bounded shortlist — the read side
        # that buys the build-path encode cost
        t0 = time.time()
        aidx.search(queries, pq=True).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["pipeline_ann_search_pq"] = round(time.time() - t0, 3)

        # ANN build at a 10× vector-count design point: the vectorized
        # argmin assignment moves each vector once (O(n) rows), so the
        # build scales ~linearly in corpus size — the separation from
        # the old O(n·dims·cells) dim-explode shape shows here
        emb10 = (
            load_table(spark, sf_dir, "embeddings")
            .select(
                "vec_id",
                "embedding",
                F.explode(F.expr("sequence(0, 9)")).alias("rep"),
            )
            .select(
                (F.col("vec_id") * 10 + F.col("rep")).alias("vec_id"),
                "embedding",
            )
        )
        t0 = time.time()
        AnnIndex.build_from(spark, emb10, f"{tmp}/annidx10", n_cells=64)
        timings["pipeline_ann_build_10x"] = round(time.time() - t0, 3)

        # sequence packing over the documents table: the two-phase
        # distributed prefix sum + vectorized per-partition cumsum
        from propulsion_spark.operators.packing import pack_documents

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.expr(
                "case when doc_id % 50 = 0 then 'valid' else 'train' end"
            ).alias("split"),
            F.expr("size(split(lower(trim(text)), '\\\\s+'))")
            .cast("long")
            .alias("n_tokens"),
        )
        t0 = time.time()
        pack_documents(docs, 2048).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["pipeline_pack"] = round(time.time() - t0, 3)

        # shuffle-and-shard: hash-order deterministic global shuffle
        # over the same doc stats, bounded-token shard assignment
        from propulsion_spark.operators.packing import shard_corpus

        t0 = time.time()
        shard_corpus(docs, 1 << 18).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["pipeline_shard"] = round(time.time() - t0, 3)

        # benchmark decontamination: bitset from a 1% "benchmark" slice,
        # then the map-only Bloom scan of the whole documents table
        from propulsion_spark.operators.decontam import (
            build_ngram_bloom,
            contamination_scores,
        )

        full = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        bench_docs = full.filter("doc_id % 100 = 0")
        t0 = time.time()
        bloom = build_ngram_bloom(bench_docs, n=8)
        contamination_scores(full, bloom).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["pipeline_decontam"] = round(time.time() - t0, 3)

        # bigram-LM quality scoring: train (explode → one combine-heavy
        # aggregate + window prefix totals, min_count-pruned), broadcast
        # once, then the zero-shuffle mapInPandas scoring scan
        from propulsion_spark.operators.lm import (
            broadcast_lm,
            lm_likelihood_bc,
            train_bigram_lm,
        )

        t0 = time.time()
        lm_bc = broadcast_lm(
            spark, train_bigram_lm(full, min_count=2), alpha=0.1
        )
        lm_likelihood_bc(full, lm_bc).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["pipeline_lm_train_score"] = round(time.time() - t0, 3)

        # PII scrub + overlapping-window chunking: two map-only passes
        # over the corpus text (regex codegen; posexplode, no shuffle)
        from propulsion_spark.operators.textops import (
            chunk_documents,
            redact_pii,
        )

        t0 = time.time()
        chunk_documents(
            redact_pii(full), chunk_tokens=512, overlap=64
        ).write.format("noop").mode("overwrite").save()
        timings["pipeline_pii_chunk"] = round(time.time() - t0, 3)

        # BPE tokenizer: one corpus shuffle to the word-frequency
        # table, exact driver-side merge loop on the pruned table,
        # broadcast ranks, zero-shuffle memoized encode scan
        from propulsion_spark.operators.bpe import (
            bpe_encode,
            broadcast_merges,
            train_bpe,
            word_counts,
        )

        t0 = time.time()
        merges, _cov = train_bpe(
            word_counts(full, min_count=2), n_merges=256, max_words=50_000
        )
        bpe_bc = broadcast_merges(spark, merges)
        bpe_encode(full, bpe_bc).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["pipeline_bpe_train_encode"] = round(time.time() - t0, 3)

        # hamming-ball simhash near-dup: 64-bit fingerprints, 4×16-bit
        # chunk-bucket joins, bit_count verify — exact recall at ≤3.
        # min-of-2 like the headline queries: the 64-fold fingerprint
        # expression pays a one-time codegen compile (~7 s) that is not
        # a plan property
        from propulsion_spark.operators.dedup import simhash_hamming_pairs

        runs = []
        for _ in range(2):
            t0 = time.time()
            simhash_hamming_pairs(full).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.time() - t0)
        timings["dedup_simhash_hamming"] = round(min(runs), 3)

        # Count-Min token-frequency sketch: one map-only pass, driver
        # merges O(partitions) 2 MiB matrices
        from propulsion_spark.operators.sketches import build_count_min

        t0 = time.time()
        build_count_min(full.select("text"))
        timings["sketch_count_min"] = round(time.time() - t0, 3)

        # perceptual media dedup: synthesize 4k 64×64 BMPs executor-side
        # (consecutive ids share a base image, odd ids brightness-shifted
        # → 2k planted perceptual dupes), then map-only decode+pHash and
        # the multi-index hamming pair join — media bytes never shuffle
        import pandas as _pd

        from propulsion_spark.operators.perceptual import (
            media_fingerprints,
            perceptual_dedup_pairs,
        )

        def _gen_bmps(batches):
            import numpy as _np

            from propulsion_spark.operators.multimodal import encode_bmp
            from propulsion_spark.operators.perceptual import resize_bilinear

            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    rng = _np.random.RandomState(int(i) // 2)
                    base = resize_bilinear(rng.rand(8, 8) * 235.0, 64, 64)
                    if i % 2:
                        base = base + 15.0
                    g = base.astype(_np.uint8).astype(_np.float64)
                    rows.append(
                        {
                            "doc_id": int(i),
                            "media": encode_bmp(_np.stack([g, g, g], axis=2)),
                            "media_type": "image/bmp",
                        }
                    )
                yield _pd.DataFrame(rows)

        media = (
            spark.range(4000)
            .repartition(32)
            .mapInPandas(
                _gen_bmps, "doc_id long, media binary, media_type string"
            )
        )
        t0 = time.time()
        perceptual_dedup_pairs(
            media_fingerprints(media, type_col="media_type")
        ).write.format("noop").mode("overwrite").save()
        timings["pipeline_media_phash_dedup"] = round(time.time() - t0, 3)

        # z-order layout write (r9): morton key + range shuffle +
        # in-file sort over events — the one-extra-shuffle cost that
        # buys multi-dimensional min/max file skipping
        from propulsion_spark import load_table as _lt
        from propulsion_spark.operators.layout import layout_zorder

        ev = _lt(spark, sf_dir, "events").select("user_id", "value", "event_type")
        t0 = time.time()
        layout_zorder(ev, ["user_id", "value"], num_files=32).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/zorder")
        timings["pipeline_zorder_layout"] = round(time.time() - t0, 3)

        # DSIR selection (r9): train target + raw bigram LMs, broadcast,
        # two map-only scoring passes, Gumbel-top-k draw
        from propulsion_spark.operators.dsir import dsir_resample
        from propulsion_spark.operators.lm import broadcast_lm, train_bigram_lm

        t0 = time.time()
        target_lm = train_bigram_lm(full.filter("doc_id % 7 = 0"), min_count=2)
        raw_lm = train_bigram_lm(full, min_count=2)
        t_bc = broadcast_lm(spark, target_lm)
        r_bc = broadcast_lm(spark, raw_lm)
        dsir_resample(full, k=500, target_bc=t_bc, raw_bc=r_bc).write.format(
            "noop"
        ).mode("overwrite").save()
        timings["pipeline_dsir_select"] = round(time.time() - t0, 3)

        # streaming semantic dedup (r9): codebook from the embeddings
        # table, two halves of the corpus as consecutive micro-batches —
        # tracks assignment + eps-ball + registry round-trips per batch
        from propulsion_spark.operators.similarity import centroids_frame
        from propulsion_spark.pipelines import SemDedupStream

        emb = _lt(spark, sf_dir, "embeddings")
        sds = SemDedupStream(
            spark, f"{tmp}/semreg", centroids_frame(emb)
        )
        half = emb.selectExpr("vec_id AS doc_id", "embedding")
        t0 = time.time()
        sds.process_batch(half.filter("doc_id % 2 = 0"), 0).count()
        sds.process_batch(half.filter("doc_id % 2 = 1"), 1).count()
        timings["pipeline_semdedup_stream"] = round(time.time() - t0, 3)

        # hybrid retrieval (r10): BM25 lexical arm over the corpus +
        # ANN-index query-by-example arm + per-query RRF fusion — the
        # RAG-shaped consumer; measures the serving path (index built
        # outside the timing: build cost is pipeline_ann_build)
        from propulsion_spark.operators.similarity import rrf_fuse
        from propulsion_spark.pipelines.ann_index import AnnIndex
        from propulsion_spark.pipelines.lexical_index import LexicalIndex

        idx = AnnIndex.build(spark, sf_dir, f"{tmp}/searchidx")
        # ONE lexical index serves every arm below (r12: the build was
        # previously duplicated); its one-time cost is the
        # pipeline_lexical_build row
        t0 = time.time()
        hlex = LexicalIndex.build(spark, sf_dir, f"{tmp}/searchlex")
        timings["pipeline_lexical_build"] = round(time.time() - t0, 3)
        t0 = time.time()
        # both arms serve from their materialized indexes (builds
        # outside the timing, same as the ANN arm since r10): the
        # lexical arm reads the terms' postings buckets (bit-identical
        # to the bm25_topk corpus scan, pinned by test); the scan path
        # itself is benched by text_tfidf_keywords + the r11
        # pipeline_lexical_* rows
        bm25 = hlex.search(("hash", "tree"), k=40)
        q10 = emb.filter("vec_id < 10").selectExpr(
            "vec_id AS query_id", "embedding"
        )
        ann = idx.search(q10, top_k=40, n_probes=2).select(
            F.col("query_id"), F.col("neighbor_id").alias("doc_id"), "rank"
        )
        # fuse the one lexical list against each query's ANN list
        fused = rrf_fuse(
            [ann, bm25.crossJoin(ann.select("query_id").distinct())],
            id_col="doc_id",
            by=["query_id"],
        ).filter("fused_rank <= 10")
        fused.write.format("noop").mode("overwrite").save()
        timings["pipeline_hybrid_search"] = round(time.time() - t0, 3)

        # batched hybrid serving (r12): 8 hybrid queries through ONE
        # pruned postings scan + ONE ANN pass + per-query RRF — the
        # amortization the materialized indexes exist for. Compare
        # per-query cost against pipeline_hybrid_search (single).
        from propulsion_spark.pipelines.hybrid import hybrid_search_many

        qspecs = [
            (i, ["hash", "tree"] if i % 2 == 0 else ["hash", "data"])
            for i in range(8)
        ]
        qemb = {
            r["vec_id"]: r["embedding"]
            for r in emb.filter("vec_id < 8").collect()
        }
        qdf = spark.createDataFrame(
            [(qid, terms, qemb[qid]) for qid, terms in qspecs],
            "query_id long, terms array<string>, embedding array<double>",
        )
        hybrid_search_many(hlex, idx, qdf, k=10, n_probes=2).write.format(
            "noop"
        ).mode("overwrite").save()  # warm
        t0 = time.time()
        hybrid_search_many(hlex, idx, qdf, k=10, n_probes=2).write.format(
            "noop"
        ).mode("overwrite").save()
        timings["pipeline_hybrid_search_many"] = round(time.time() - t0, 3)

        # exact repeated-substring dedup (r12, Lee et al. 2021
        # ExactSubstr as n-gram hashing): find + mask duplicated
        # passages — one gram-count shuffle, AQE join back, per-doc
        # span windows
        from propulsion_spark.operators.substring_dedup import (
            mask_repeated_ngrams,
        )

        t0 = time.time()
        mask_repeated_ngrams(full, n=8, min_dup=2).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["pipeline_substr_dedup"] = round(time.time() - t0, 3)

        # streaming twin (r13): two half-corpus micro-batches through
        # the durable gram registry — per batch one gram pass + one
        # count shuffle + O(batch-grams) delta write + bucket-pruned
        # totals join; the cross-batch masking path sync --curate runs
        from propulsion_spark.streaming.substring_dedup import (
            SubstrDedupStream,
        )

        t0 = time.time()
        sub = SubstrDedupStream(spark, f"{tmp}/substr_reg", n=8, min_dup=2)
        sub.process_batch(full.filter("doc_id % 2 = 0"), 1).write.format(
            "noop"
        ).mode("overwrite").save()
        sub.process_batch(full.filter("doc_id % 2 = 1"), 2).write.format(
            "noop"
        ).mode("overwrite").save()
        timings["pipeline_substr_stream"] = round(time.time() - t0, 3)

        # streaming per-source cap (r14): two half-corpus micro-batches
        # through the durable count registry + the retro_thin repair —
        # per batch one count aggregate + a bucket-pruned totals read +
        # one broadcast join; repair is a bounded re-filter of the
        # emitted rows against the tiny final count table
        from propulsion_spark.streaming.source_cap import CapPerSourceStream

        full_src = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        t0 = time.time()
        scap = CapPerSourceStream(spark, f"{tmp}/srccap_reg", 64)
        scap.run_batch(
            full_src.filter("doc_id % 2 = 0"), 1, f"{tmp}/srccap_out"
        )
        scap.run_batch(
            full_src.filter("doc_id % 2 = 1"), 2, f"{tmp}/srccap_out"
        )
        scap.retro_thin(f"{tmp}/srccap_out")
        timings["pipeline_srccap_stream"] = round(time.time() - t0, 3)

        # learned quality filter (r12): hashed-ngram LR scoring +
        # deterministic Pareto acceptance — the map-only serving path
        # (training is one-time, outside the timing like the index
        # builds; the negative sample is a keyword-stuffed corruption
        # of the corpus, the separable-junk shape)
        from propulsion_spark.operators.quality_classifier import (
            pareto_filter,
            score_quality,
            train as q_train,
        )

        neg = full.filter("doc_id % 7 = 0").selectExpr(
            "doc_id + 1000000 AS doc_id",
            "concat_ws(' ', array_repeat(concat_ws(' ', 'buy', 'now', "
            "substring(text, 1, 8)), 12)) AS text",
        )
        qmodel = q_train(
            full.filter("doc_id % 7 = 0"), neg, n_features=1 << 16
        )
        t0 = time.time()
        pareto_filter(
            score_quality(full, qmodel, n_features=1 << 16)
        ).write.format("noop").mode("overwrite").save()
        timings["pipeline_quality_score"] = round(time.time() - t0, 3)

        # steady-state lexical serving (r11): the BM25 arm at O(terms'
        # postings buckets) instead of a corpus scan per query
        hlex.search(("hash", "tree"), k=40).write.format("noop").mode(
            "overwrite"
        ).save()  # warm (parquet footers), like the headline queries
        t0 = time.time()
        hlex.search(("hash", "tree"), k=40).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["pipeline_lexical_search"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return timings


def host_calibration(spark) -> float:
    """Host-speed calibration row (r13, the r12 verdict's #2): a FIXED
    pure-Spark workload — deterministic generate → hash → shuffle-agg
    → reduce, zero engine code — timed min-of-2 in every bench run.
    Round-over-round driver totals drifted +21% over r10→r12 with
    every step attributed to ambient host variance by per-query A/Bs;
    this row lets BENCH_HISTORY normalize that drift out
    (TOTAL / calib) instead of re-litigating it with a worktree A/B
    each round. Changing this workload invalidates the normalization
    baseline — don't."""
    runs = []
    for _ in range(2):
        t0 = time.time()
        df = spark.range(0, 20_000_000, 1, 32).selectExpr(
            "id",
            "id % 9973 AS k",
            "xxhash64(id) AS h",
            "cast(id % 1000 as double) / 7.0 AS x",
        )
        (
            df.groupBy("k")
            .agg(
                {"h": "max", "x": "sum", "id": "count"}
            )
            .agg({"max(h)": "max", "sum(x)": "sum", "count(id)": "sum"})
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        runs.append(time.time() - t0)
    return round(min(runs), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    from propulsion_spark import get_spark
    from propulsion_spark.operators import load_all

    registry = load_all()
    spark = get_spark("propulsion-bench")
    spark.range(1_000).count()  # JVM/session warmup outside the timings
    # touch each table's footer/schema once so per-query numbers measure
    # steady-state plans, not one-time IO setup (the events nanos-conf
    # switch in particular re-plans the first scan)
    from propulsion_spark import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).schema
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        q = registry[name]
        # min of two runs: steady-state plan cost (same methodology as
        # tools/baseline_compare.py — one-shot timings swing ±20% with
        # background load; cold-start effects are not a plan property).
        # Cache cleared per run: queries that persist intermediates
        # (the LSH signature matrix) register them in Spark's
        # CacheManager keyed by analyzed plan, so a second build would
        # silently reuse run 1's materialization and under-report.
        runs = []
        try:
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            timings[name] = round(min(runs), 3)
        except Exception as exc:  # one broken query must not zero the round
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
    try:
        timings.update(bench_pipelines(spark, sf_dir))
    except Exception as exc:
        errors["pipelines"] = f"{type(exc).__name__}: {exc}"[:500]
    total = round(sum(timings.values()), 3)
    try:
        calib = host_calibration(spark)
    except Exception as exc:
        calib = None
        errors["calibration"] = f"{type(exc).__name__}: {exc}"[:500]
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # host-speed gauge, NOT part of the total: engine-seconds
        # divide by this to compare rounds across ambient host drift
        "calibration": calib,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    # Stop Spark BEFORE printing the JSON line, then hard-exit: the JVM's
    # shutdown (StateStore maintenance thread, executor teardown) logs
    # asynchronously, and round 6's driver run had a WARN land *after*
    # the JSON line, making the output unparseable as "last line = JSON".
    # Order: stop → drain a beat → print → flush → _exit (no interpreter
    # teardown hooks, no late log-forwarder writes).
    try:
        spark.stop()
    except Exception:
        pass
    time.sleep(1.0)  # let py4j's stderr/stdout forwarder drain JVM output
    sys.stdout.flush()
    sys.stderr.flush()
    print(json.dumps(out), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
