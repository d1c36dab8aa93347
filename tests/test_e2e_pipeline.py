"""Capstone composition: the full reaction-pipeline loop the reference
was built for (SURVEY §3.1/§3.3), all through the public API —

  change-feed dir → StreamsSink (ordered, deduped) → EventStoreTable
  (idempotent write) → AppendsIndex (CDC spans, exactly-once) →
  index_source (hydrating) → second consumer builds a derived view,
  with both consumers checkpointing in the same consumer-group store.
"""

from __future__ import annotations

import pandas as pd

from propulsion_spark.sources.parquet_feed import ChangeFeedSource
from propulsion_spark.streaming import CheckpointStore, StreamsSink
from propulsion_spark.streaming.event_store import EventStoreTable
from propulsion_spark.streaming.index import AppendsIndex, index_source

from test_streaming_sinks import envelope_rows, mk_df


class TestReactionPipeline:
    def test_full_loop(self, spark, tmp_path):
        feed_dir = tmp_path / "feed"
        feed_dir.mkdir()
        store = EventStoreTable(spark, str(tmp_path / "store"))
        index = AppendsIndex(spark, str(tmp_path / "index"), max_items_per_epoch=6)

        # ---- stage 1: change feed → sink → event store + CDC index ----
        class StoreAndIndexSink:
            """handle = idempotent store write; outcomes feed the index
            (DynamoStoreIndexer wiring)."""

            def __init__(self):
                self.outcomes = []

            def process_batch(self, df, batch_id=0):
                report = store.sync(df)
                rows = report.collect()
                self.outcomes.extend(rows)
                spans = spark.createDataFrame(
                    [
                        (r.stream_name, r.prev_tail, r.new_tail)
                        for r in rows
                        if r.appended > 0
                    ]
                    or [],
                    "stream_name string, span_lo long, span_hi long",
                )
                if spans.count():
                    index.ingest(spans)

        sink1 = StoreAndIndexSink()
        ckpt = CheckpointStore(str(tmp_path / "ck"), group="writer", commit_interval_s=0)
        # two appended files, the second partially redelivers the first
        mk_df(spark, envelope_rows("user-1", 0, 4) + envelope_rows("user-2", 0, 3)).coalesce(
            1
        ).write.mode("append").parquet(str(feed_dir))
        mk_df(spark, envelope_rows("user-1", 2, 4)).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed_dir))
        src = ChangeFeedSource(
            spark, str(feed_dir), sink1, ckpt, stop_at_tail=True
        )
        src.run_until_caught_up(timeout=180)

        # store is exactly-once despite the overlap
        stored = sorted((r.stream_name, r.idx) for r in store.read().collect())
        assert stored == [("user-1", i) for i in range(6)] + [
            ("user-2", i) for i in range(3)
        ]
        # index recorded the appends across epochs (cap 6 → 2 epochs)
        spans = sorted(
            (r.stream_name, r.span_lo, r.span_hi) for r in index.read().collect()
        )
        assert spans == [("user-1", 0, 4), ("user-1", 4, 6), ("user-2", 0, 3)]

        # ---- stage 2: index-driven consumer builds a derived view ----
        view = {}

        class ViewSink:
            def process_batch(self, df, batch_id=0):
                for r in (
                    df.groupBy("stream_name").count().collect()
                ):
                    view[r.stream_name] = view.get(r.stream_name, 0) + r["count"]

        ckpt2 = CheckpointStore(str(tmp_path / "ck"), group="reader", commit_interval_s=0)
        src2 = index_source(
            spark, index, ViewSink(), ckpt2, event_store=store, source_id="idx"
        )
        src2.run_until_caught_up(timeout=180)
        assert view == {"user-1": 6, "user-2": 3}
        # consumer groups isolated in one store: writer vs reader cursors
        assert ckpt.position("changefeed", "0") == 2
        assert ckpt2.position("idx", "0") == index.active_epoch()[0] + 1


class TestLlmDataPipeline:
    def test_curate_featurize_index_search(self, spark, tmp_path):
        """The flagship training-data loop through public APIs only:

        raw docs → CurationPipeline (PII scrub → quality gates → LM
        likelihood gate → exact & near dedup)
        → chunk_documents (overlapping training windows)
        → extract_features (Arrow-batched mapInPandas featurizer)
        → AnnIndex.build_from (hash-seeded one-Lloyd codebook)
        → partition-pruned search finds the semantically-identical doc.
        """
        from pyspark.sql import functions as F

        from propulsion_spark.operators.lm import train_bigram_lm
        from propulsion_spark.operators.multimodal import extract_features
        from propulsion_spark.operators.textops import chunk_documents
        from propulsion_spark.pipelines import AnnIndex, CurationPipeline

        base = (
            "the quick brown fox jumps over the lazy dog and keeps running far "
            * 2
        )
        other = (
            "completely different content about distributed query engines "
            "and shuffle partitioning strategies for large clusters " * 2
        )
        third = (
            "a third narrative describing watermark semantics and stateful "
            "stream processing with bounded lateness and session windows " * 2
        )
        gibberish = " ".join(
            f"zzqxv{chr(97 + j % 26)}w jkwpfh{chr(97 + (j + 5) % 26)}q"
            for j in range(20)
        )
        rows = [
            # doc 1 carries planted PII: the scrub must reach the store
            {"doc_id": 1, "text": f"contact alice@corp.example {base}",
             "lang": "en", "source": "s", "n_chars": 0},
            {"doc_id": 2, "text": f"contact alice@corp.example {base}",
             "lang": "en", "source": "s", "n_chars": 0},  # exact dup → dropped
            {"doc_id": 3, "text": other, "lang": "en", "source": "s",
             "n_chars": len(other)},
            {"doc_id": 4, "text": third, "lang": "en", "source": "s",
             "n_chars": len(third)},
            {"doc_id": 5, "text": gibberish, "lang": "en", "source": "s",
             "n_chars": len(gibberish)},  # LM gate → dropped
        ]
        import pandas as pd

        docs = spark.createDataFrame(
            pd.DataFrame(rows),
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        # reference LM from the fluent corpus rows (trained offline in
        # production via the lmtrain verb)
        lm = train_bigram_lm(
            spark.createDataFrame(
                pd.DataFrame([{"text": base}, {"text": other}, {"text": third}])
            )
        )
        pipe = CurationPipeline(
            spark, str(tmp_path / "cur"), near_dedup=True,
            redact_pii=True, lm=lm, lm_min_score=-2.5,
        )
        pipe.process_batch(docs)
        curated = pipe.curated()
        assert sorted(r.doc_id for r in curated.collect()) == [1, 3, 4]
        assert pipe.stats["rejected_lm"] == 1
        assert pipe.stats["pii_redacted"] == 2
        kept1 = curated.filter("doc_id = 1").first()["text"]
        assert "alice@corp.example" not in kept1 and "<EMAIL>" in kept1

        # chunk the curated corpus into overlapping training windows:
        # every chunk re-assembles from its doc, no chunk crosses docs
        chunks = chunk_documents(curated, chunk_tokens=16, overlap=4)
        per_doc = {
            r["doc_id"]: r["n"]
            for r in chunks.groupBy("doc_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert set(per_doc) == {1, 3, 4} and all(n >= 2 for n in per_doc.values())

        # featurize the curated docs (deterministic fake decode — the
        # real embedder slots into the same mapInPandas signature)
        feats = extract_features(
            curated.select(
                "doc_id",
                F.encode(F.col("text"), "utf-8").alias("media"),
            )
        ).select(
            F.col("doc_id").alias("vec_id"),
            F.col("features").cast("array<float>").alias("embedding"),
        )
        idx = AnnIndex.build_from(spark, feats, str(tmp_path / "idx"), n_cells=2)

        # a fresh doc with doc 1's STORED (redacted) text must retrieve
        # doc 1 as its top neighbor (cosine 1.0): what the index serves
        # is the curated store's content, post-scrub
        probe = extract_features(
            spark.createDataFrame(
                pd.DataFrame([{"doc_id": 100, "text": kept1}]),
                "doc_id long, text string",
            ).select("doc_id", F.encode(F.col("text"), "utf-8").alias("media"))
        ).select(
            F.col("doc_id").alias("query_id"),
            F.col("features").cast("array<float>").alias("embedding"),
        )
        top = idx.search(probe, top_k=2).filter(F.col("rank") == 1).first()
        assert top["neighbor_id"] == 1
        assert abs(top["cosine"] - 1.0) < 1e-6
