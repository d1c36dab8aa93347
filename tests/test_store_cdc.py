"""Change-data feed over EventStoreTable: commit-log CDC records,
paged changes() reads, retention contract under compaction, the
consumer-group feed pump, and the native PySpark DataSource
(spark.readStream.format("propulsion-store-cdc")).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from propulsion_spark.operators.fixtures import stream_events
from propulsion_spark.streaming.event_store import (
    CdcRetentionError,
    EventStoreTable,
)

SF = "/root/testdata/sf0.001"


def _halves(spark):
    env = stream_events(spark, SF)
    cols = [
        "stream_name",
        "category",
        "idx",
        "event_type",
        "data",
        "meta",
        "event_id",
        "ts",
        "is_unfold",
        "size",
    ]
    env = env.select(*cols)
    # prefix split per stream: the second half starts exactly at each
    # stream's tail after the first sync (no PREFIX_MISSING gaps)
    return (env.filter(F.col("idx") < 2), env.filter(F.col("idx") >= 2))


class TestCdcLog:
    def test_appends_emit_records_duplicates_do_not(self, spark, tmp_path):
        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        assert store.cdc_latest_seq() == 0
        store.sync(a)
        assert store.cdc_latest_seq() == 1
        store.sync(a)  # full-duplicate redelivery: nothing appended
        assert store.cdc_latest_seq() == 1
        store.sync(b)
        assert store.cdc_latest_seq() == 2

    def test_changes_pages_exactly_the_appended_rows(self, spark, tmp_path):
        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        df1, w1 = store.changes(0)
        assert w1 == 1
        assert df1.count() == a.count()
        store.sync(b)
        df2, w2 = store.changes(w1)
        assert w2 == 2
        got = {(r["stream_name"], r["idx"]) for r in df2.collect()}
        want = {(r["stream_name"], r["idx"]) for r in b.collect()}
        assert got == want
        # full feed == full store
        all_df, w = store.changes(0)
        assert w == 2 and all_df.count() == store.read().count()
        # caught-up read is empty, watermark unchanged
        empty, w3 = store.changes(w2)
        assert w3 == w2 and empty.count() == 0

    def test_retention_error_after_compaction(self, spark, tmp_path):
        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"), n_buckets=2)
        store.sync(a)
        store.sync(b)
        for bucket in list(store.bucket_segment_counts()):
            store.compact_bucket(bucket)
        store.vacuum(grace_s=0.0)  # drop the retired generation
        with pytest.raises(CdcRetentionError):
            store.changes(0)
        # recovery contract: snapshot + latest watermark still serve
        assert store.cdc_earliest_readable() >= store.cdc_latest_seq() - 1
        assert store.read().count() == a.count() + b.count()

    def test_vacuum_keeps_the_cdc_log(self, spark, tmp_path):
        a, _ = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        store.vacuum(grace_s=0.0)
        assert store.cdc_latest_seq() == 1


class TestCdcFeedPump:
    def test_consumer_group_pump_drains_the_feed(self, spark, tmp_path):
        from propulsion_spark.sources.store_cdc import store_cdc_feed
        from propulsion_spark.streaming.checkpoints import CheckpointStore

        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        store.sync(b)

        seen: list = []

        class CollectingSink:
            def process_batch(self, df, batch_id=0):
                seen.extend(
                    (r["stream_name"], r["idx"]) for r in df.collect()
                )

        ck = CheckpointStore(path=str(tmp_path / "ck"), group="g1")
        src = store_cdc_feed(
            spark, store, CollectingSink(), ck, page_seqs=1
        )
        src.stop_at_tail = True
        assert src.start().await_completion(timeout=120)
        want = {(r["stream_name"], r["idx"]) for r in store.read().collect()}
        assert set(seen) == want and len(seen) == len(want)
        # position committed at the feed tail; a second pump re-reads
        # nothing
        ck.flush()
        assert ck.position("store-cdc", "0") == store.cdc_latest_seq()
        seen.clear()
        src2 = store_cdc_feed(
            spark, store, CollectingSink(), ck, page_seqs=1
        )
        src2.stop_at_tail = True
        assert src2.start().await_completion(timeout=120)
        assert seen == []


class TestCdcCli:
    def test_sync_from_store_cdc_to_stats(self, spark, tmp_path):
        """`sync --from store-cdc:<store> --to stats:` — the reference's
        flagship wiring (store change feed → handler → checkpoint) as
        one CLI invocation."""
        import json
        import subprocess
        import sys

        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        store.sync(b)
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "propulsion_spark.cli",
                "sync",
                "--from",
                f"store-cdc:{store.path}",
                "--to",
                "stats:",
                "--checkpoints",
                str(tmp_path / "ck"),
                "--positions",
                str(tmp_path / "pos"),
            ],
            capture_output=True,
            text=True,
            timeout=300,
            cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        rep = json.loads(proc.stdout.strip().splitlines()[-1])
        assert rep["caught_up"] is True
        assert rep["stats"]["events"] == store.read().count()


class TestNativeDataSource:
    def test_readstream_native_source_end_to_end(self, spark, tmp_path):
        """The PySpark-native source: offsets ride Spark's own commit
        log; a restarted query resumes past already-served commits."""
        from propulsion_spark.sources.store_cdc import register_store_cdc

        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        register_store_cdc(spark)

        got: list = []

        def run_once():
            q = (
                spark.readStream.format("propulsion-store-cdc")
                .option("path", store.path)
                .load()
                .writeStream.foreachBatch(
                    lambda df, bid: got.extend(
                        (r["stream_name"], r["idx"]) for r in df.collect()
                    )
                )
                .option("checkpointLocation", str(tmp_path / "qck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        run_once()
        want_a = {(r["stream_name"], r["idx"]) for r in a.collect()}
        assert set(got) == want_a and len(got) == len(want_a)

        got.clear()
        store.sync(b)
        run_once()  # same checkpoint: only the new commit is served
        want_b = {(r["stream_name"], r["idx"]) for r in b.collect()}
        assert set(got) == want_b and len(got) == len(want_b)

    def test_batch_read_is_manifest_snapshot(self, spark, tmp_path):
        """The batch face: spark.read on the same format serves the
        CURRENT committed manifest (crash orphans invisible) and equals
        store.read()."""
        import os

        from propulsion_spark.sources.store_cdc import register_store_cdc

        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        store.sync(b)
        # an orphaned segment dir (crash between write and flip) must
        # not leak into the snapshot
        orphan = os.path.join(store.path, "seg-orphan", "bucket=0")
        os.makedirs(orphan)
        a.limit(5).write.mode("overwrite").parquet(orphan)
        register_store_cdc(spark)
        snap = (
            spark.read.format("propulsion-store-cdc")
            .option("path", store.path)
            .load()
        )
        got = {(r["stream_name"], r["idx"]) for r in snap.collect()}
        want = {(r["stream_name"], r["idx"]) for r in store.read().collect()}
        assert got == want and snap.count() == store.read().count()

    def test_schema_and_values_roundtrip(self, spark, tmp_path):
        from propulsion_spark.sources.store_cdc import register_store_cdc

        a, _ = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        register_store_cdc(spark)
        # batch-compare through the native source's arrow read path
        rows: list = []
        q = (
            spark.readStream.format("propulsion-store-cdc")
            .option("path", store.path)
            .load()
            .writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "qck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        want = {
            (r["stream_name"], r["idx"]): (r["event_type"], r["ts"], r["size"])
            for r in store.read().collect()
        }
        got = {
            (r["stream_name"], r["idx"]): (r["event_type"], r["ts"], r["size"])
            for r in rows
        }
        assert got == want


class TestSyncKafkaFromStore:
    def test_store_feed_to_kafka_producer_roundtrip(self, spark, tmp_path):
        """The reference's flagship tool wiring (`propulsion sync kafka
        from cosmos`, SURVEY §3.3) closed on OUR store: store change
        feed → rendered-span producer → (fake) Kafka topic → parse back
        — every appended event arrives exactly once, per-stream order
        preserved inside spans."""
        from propulsion_spark.functions.codec import (
            parse_rendered_spans,
            render_spans,
        )
        from propulsion_spark.sources.kafka_fake import (
            FileTopic,
            produce_rendered,
        )
        from propulsion_spark.sources.store_cdc import store_cdc_feed
        from propulsion_spark.streaming.checkpoints import CheckpointStore

        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        store.sync(b)
        topic = FileTopic(str(tmp_path / "topic"))

        class ProducerSink:
            def process_batch(self, df, batch_id=0):
                produce_rendered(render_spans(df), topic)

        ck = CheckpointStore(path=str(tmp_path / "ck"), group="kprod")
        src = store_cdc_feed(spark, store, ProducerSink(), ck, page_seqs=1)
        src.stop_at_tail = True
        assert src.start().await_completion(timeout=120)

        import glob

        import pandas as pd

        lines = []
        for p in glob.glob(str(tmp_path / "topic" / "p*.jsonl")):
            lines.append(pd.read_json(p, lines=True))
        raw = pd.concat(lines, ignore_index=True)
        msgs = spark.createDataFrame(raw[["key", "value"]])
        got = {
            (r["stream_name"], r["idx"], r["event_type"])
            for r in parse_rendered_spans(msgs).collect()
        }
        want = {
            (r["stream_name"], r["idx"], r["event_type"])
            for r in store.read().collect()
        }
        assert got == want and len(got) == store.read().count()


class TestStoreReplicationLoop:
    def test_store_to_kafka_to_store(self, spark, tmp_path):
        """The full reference replication topology: store A's change
        feed → rendered spans → (fake) Kafka → consumer pages the topic
        → parse → idempotent sync into store B. B converges to A's
        event set; a consumer redelivery (uncommitted page re-poll)
        cannot duplicate B's log."""
        from propulsion_spark.functions.codec import (
            parse_rendered_spans,
            render_spans,
        )
        from propulsion_spark.sources.kafka_fake import (
            FileTopic,
            produce_rendered,
        )
        from propulsion_spark.sources.store_cdc import store_cdc_feed
        from propulsion_spark.streaming.checkpoints import CheckpointStore

        a, b = _halves(spark)
        store_a = EventStoreTable(spark, str(tmp_path / "A"))
        store_a.sync(a)
        store_a.sync(b)
        topic = FileTopic(str(tmp_path / "topic"))

        class ProducerSink:
            def process_batch(self, df, batch_id=0):
                produce_rendered(render_spans(df), topic)

        src = store_cdc_feed(
            spark,
            store_a,
            ProducerSink(),
            CheckpointStore(path=str(tmp_path / "ckp"), group="prod"),
            page_seqs=1,
        )
        src.stop_at_tail = True
        assert src.start().await_completion(timeout=120)

        store_b = EventStoreTable(spark, str(tmp_path / "B"))
        group = "replica"
        first_page = True
        while True:
            msgs = topic.poll(spark, group, 200)
            bounds = (
                msgs.groupBy("partition")
                .agg((F.max("offset") + 1).alias("nxt"))
                .collect()
            )
            if not bounds:
                break
            as_str = lambda df: df.withColumn(  # noqa: E731
                "value", F.col("value").cast("string")
            )
            env = parse_rendered_spans(as_str(msgs))
            store_b.sync(env)
            if first_page:
                # redelivery: crash before commit — re-poll serves the
                # same page; the idempotent writer absorbs it
                store_b.sync(
                    parse_rendered_spans(as_str(topic.poll(spark, group, 200)))
                )
                first_page = False
            topic.commit(group, {r["partition"]: r["nxt"] for r in bounds})

        key = lambda df: sorted(  # noqa: E731
            (r["stream_name"], r["idx"], r["event_type"], r["data"])
            for r in df.collect()
        )
        assert key(store_b.read()) == key(store_a.read())


class TestCdcGauges:
    def test_exporter_renders_feed_window(self, spark, tmp_path):
        from propulsion_spark.streaming.metrics import MetricsExporter

        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        store.sync(b)
        text = (
            MetricsExporter(group="t").register_store("s1", store).render()
        )
        assert 'propulsion_store_cdc_seq{group="t",stat="latest",store="s1"} 2' in text
        assert 'stat="earliest_readable"' in text


class TestManifestOverIncrementalPacking:
    def test_follow_manifest_equals_batch_manifest(self, spark, tmp_path):
        """sequence_manifest over the --follow output (batch-id
        partitioned, straddles across batch boundaries) equals the
        manifest of one-shot batch packing of the same corpus."""
        from propulsion_spark.operators.packing import (
            pack_documents,
            sequence_manifest,
        )
        from propulsion_spark.streaming.packing import pack_foreach_batch

        rows = [("train", i, (i * 7) % 23 + 1) for i in range(50)]
        mk = lambda rs: spark.createDataFrame(  # noqa: E731
            rs, "split string, doc_id long, n_tokens long"
        )
        process = pack_foreach_batch(
            spark, str(tmp_path / "st"), str(tmp_path / "out"), seq_len=16
        )
        process(mk([r for r in rows if r[1] < 23]), 0)
        process(mk([r for r in rows if r[1] >= 23]), 1)
        inc = {
            (r["split"], r["seq_id"]): (
                tuple(r["doc_ids"]),
                r["n_docs"],
                r["fill_tokens"],
            )
            for r in sequence_manifest(
                spark.read.parquet(str(tmp_path / "out")), 16
            ).collect()
        }
        full = {
            (r["split"], r["seq_id"]): (
                tuple(r["doc_ids"]),
                r["n_docs"],
                r["fill_tokens"],
            )
            for r in sequence_manifest(pack_documents(mk(rows), 16), 16).collect()
        }
        assert inc == full


class TestCdcDurability:
    def test_missing_head_record_is_repaired_from_manifest(
        self, spark, tmp_path
    ):
        """Crash between the manifest flip and the record write: the
        committed sync must still reach the feed (the manifest carries
        the CDC head; readers re-materialize it)."""
        import os

        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        store.sync(b)
        # simulate the crash: the newest record file never landed
        os.unlink(os.path.join(store.path, "_cdc", "c-000000000002.json"))
        assert store.cdc_latest_seq() == 2  # manifest knows
        df, w = store.changes(1)
        assert w == 2
        assert df.count() == b.count()  # nothing silently vanished
        # and a subsequent sync continues the sequence, no reuse
        more = b.limit(0)
        store.sync(a)  # all-duplicate: no new seq
        assert store.cdc_latest_seq() == 2
        del more

    def test_gc_gap_raises_instead_of_silent_skip(self, spark, tmp_path):
        """A reader positioned before a vacuumed-away record must get
        the retention error, never a silently gapped feed."""
        import os

        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        store.sync(b)
        os.unlink(os.path.join(store.path, "_cdc", "c-000000000001.json"))
        with pytest.raises(CdcRetentionError):
            store.changes(0)
        # from the gap edge onward still serves
        df, w = store.changes(1)
        assert w == 2 and df.count() == b.count()

    def test_vacuum_gcs_dead_records_but_keeps_head(self, spark, tmp_path):
        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"), n_buckets=2)
        store.sync(a)
        store.sync(b)
        for bucket in list(store.bucket_segment_counts()):
            store.compact_bucket(bucket)
        removed = store.vacuum(grace_s=0.0)
        assert any("_cdc/c-000000000001" in r for r in removed)
        # the manifest's own head record is never GC'd
        import os

        assert os.path.exists(
            os.path.join(store.path, "_cdc", "c-000000000002.json")
        )


class TestBucketTranches:
    def test_per_bucket_tranches_cover_the_feed(self, spark, tmp_path):
        """by_bucket=True: one tranche per store bucket (the reference's
        tranche-per-partition model) — independent positions, union of
        tranche outputs == the store, per-stream rows stay in one
        tranche."""
        from propulsion_spark.sources.store_cdc import store_cdc_feed
        from propulsion_spark.streaming.checkpoints import CheckpointStore

        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"), n_buckets=4)
        store.sync(a)
        store.sync(b)

        import threading

        lock = threading.Lock()
        by_stream: dict = {}
        seen: list = []

        class CollectingSink:
            def process_batch(self, df, batch_id=0):
                rows = df.collect()
                with lock:
                    for r in rows:
                        seen.append((r["stream_name"], r["idx"]))

        ck = CheckpointStore(path=str(tmp_path / "ck"), group="gb")
        src = store_cdc_feed(
            spark, store, CollectingSink(), ck, by_bucket=True, page_seqs=1
        )
        src.stop_at_tail = True
        assert src.start().await_completion(timeout=240)
        want = {(r["stream_name"], r["idx"]) for r in store.read().collect()}
        assert set(seen) == want and len(seen) == len(want)  # no dupes
        # every bucket tranche committed to the feed tail independently
        ck.flush()
        for bkt in range(4):
            assert ck.position("store-cdc", str(bkt)) == store.cdc_latest_seq()
        del by_stream


class TestReviewHardening:
    def test_mid_log_gap_raises(self, spark, tmp_path):
        """A record GC'd from the MIDDLE of the requested range (its
        buckets compacted while neighbors survive) must raise, not be
        silently skipped with the watermark advanced past it."""
        import os

        env = _halves(spark)[0].unionByName(_halves(spark)[1])
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(env.filter(F.col("idx") < 1))
        store.sync(env.filter(F.col("idx") == 1))
        store.sync(env.filter(F.col("idx") >= 2))
        os.unlink(os.path.join(store.path, "_cdc", "c-000000000002.json"))
        with pytest.raises(CdcRetentionError):
            store.changes(0)
        with pytest.raises(CdcRetentionError):
            store.changes(1)
        df, w = store.changes(2)  # past the gap: serves
        assert w == 3 and df.count() > 0

    def test_prune_duplicate_requests_do_not_duplicate_rows(
        self, spark, tmp_path
    ):
        """Duplicate/conflicting prune request rows must not fan the
        rewrite join out into duplicated surviving events."""
        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"), n_buckets=4)
        store.sync(a)
        store.sync(b)
        some_stream = store.read().select("stream_name").first()["stream_name"]
        requests = spark.createDataFrame(
            [(some_stream, 0), (some_stream, 1)],
            "stream_name string, until_idx long",
        )
        store.prune(requests)
        after = store.read()
        n = after.count()
        n_distinct = after.select("stream_name", "idx").distinct().count()
        assert n == n_distinct  # no duplicated surviving rows
        # highest watermark won
        remaining = after.filter(F.col("stream_name") == some_stream)
        assert remaining.filter(F.col("idx") <= 1).count() == 0

    def test_n_buckets_adopted_from_manifest(self, spark, tmp_path):
        """A store written with n_buckets=8 must be read/pruned/tailed
        with 8, whatever the reopening constructor's default says."""
        a, _ = _halves(spark)
        store8 = EventStoreTable(spark, str(tmp_path / "store"), n_buckets=8)
        store8.sync(a)
        reopened = EventStoreTable(spark, str(tmp_path / "store"))  # default 64
        reopened._load()
        assert reopened.n_buckets == 8

    def test_retention_error_abends_the_pump(self, spark, tmp_path):
        """A permanent retention gap must abend the feed pump (surface
        the re-seed recovery), not spin in swallow-and-retry forever."""
        import os

        from propulsion_spark.sources.store_cdc import store_cdc_feed
        from propulsion_spark.streaming.checkpoints import CheckpointStore

        a, b = _halves(spark)
        store = EventStoreTable(spark, str(tmp_path / "store"))
        store.sync(a)
        store.sync(b)
        os.unlink(os.path.join(store.path, "_cdc", "c-000000000001.json"))

        class NullSink:
            def process_batch(self, df, batch_id=0):
                pass

        src = store_cdc_feed(
            spark,
            store,
            NullSink(),
            CheckpointStore(path=str(tmp_path / "ck"), group="g"),
        )
        src.stop_at_tail = True
        src.start()
        with pytest.raises(CdcRetentionError):
            src.await_completion(timeout=60)

    def test_envelope_ddl_and_arrow_names_track_schema(self, spark):
        from propulsion_spark.envelope import STREAM_EVENT_SCHEMA
        from propulsion_spark.sources import store_cdc as sc

        assert sc._ENVELOPE_COLS == [f.name for f in STREAM_EVENT_SCHEMA.fields]
        # the declared source schema parses back to the same field set
        from pyspark.sql.types import _parse_datatype_string

        parsed = _parse_datatype_string(sc._ENVELOPE_DDL)
        assert [f.name for f in parsed.fields] == sc._ENVELOPE_COLS
