"""CategoryPollingSource (MessageDb analog) + MetricsExporter +
StreamsSink.run_stream (Structured Streaming attachment) tests."""

from __future__ import annotations

import pandas as pd
import pytest

from propulsion_spark.envelope import STREAM_EVENT_SCHEMA
from propulsion_spark.sources.polling import SinglePassCategoryPollingSource
from propulsion_spark.streaming import CheckpointStore, StreamsSink
from propulsion_spark.streaming.metrics import MetricsExporter
from propulsion_spark.streaming.monitor import BusyMonitor

from test_sources import CollectingSink
from test_streaming_sinks import envelope_rows, mk_df


def message_table(spark):
    rows = []
    gp = 0
    for cat, n in (("user", 7), ("cart", 5)):
        for i in range(n):
            rows.append(
                {
                    "category": cat,
                    "global_position": gp,
                    "stream_name": f"{cat}-1",
                    "idx": i,
                    "event_type": "e",
                    "data": "{}",
                }
            )
            gp += 1
    pdf = pd.DataFrame(rows)
    return lambda: spark.createDataFrame(pdf)


class TestCategoryPolling:
    def test_polls_per_category_with_position_checkpoints(self, spark, tmp_path):
        sink = CollectingSink()
        ckpt = CheckpointStore(str(tmp_path / "ck"), group="g", commit_interval_s=0)
        src = SinglePassCategoryPollingSource(
            spark,
            message_table(spark),
            ["user", "cart"],
            sink,
            ckpt,
            batch_size=3,
        )
        src.run_until_caught_up(timeout=120)
        rows = [r for b in sink.batches for r in b]
        assert len(rows) == 12
        # checkpoint = last global_position + 1 per category tranche
        assert ckpt.position("messageDb", "user") == 7
        assert ckpt.position("messageDb", "cart") == 12

    def test_resume_reads_only_increment(self, spark, tmp_path):
        sink = CollectingSink()
        ckpt = CheckpointStore(str(tmp_path / "ck2"), group="g", commit_interval_s=0)
        ckpt.start("messageDb", "user", 0)
        ckpt.commit("messageDb", "user", 5)
        ckpt.flush()
        src = SinglePassCategoryPollingSource(
            spark, message_table(spark), ["user"], sink, ckpt, batch_size=100
        )
        src.run_until_caught_up(timeout=60)
        rows = [r for b in sink.batches for r in b]
        assert sorted(r.global_position for r in rows) == [5, 6]


class TestConcurrentTranches:
    def test_parallel_tranche_pumps_do_not_lose_positions(self, spark, tmp_path):
        """Regression: two tranche threads merging positions concurrently
        must not lose either stream's update (MVCC read-modify-write is
        serialized)."""
        import threading

        def handle(stream, events):
            return "ok", int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(spark, handle, str(tmp_path / "pos"))

        def pump(stream):
            sink.process_batch(mk_df(spark, envelope_rows(stream, 0, 5)))

        threads = [
            threading.Thread(target=pump, args=(f"user-{i}",)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        pos = {r.stream_name: r.pos for r in sink.positions.read().collect()}
        assert pos == {f"user-{i}": 5 for i in range(4)}


class TestMetricsExporter:
    def test_renders_prometheus_text(self, spark, tmp_path):
        def handle(stream, events):
            return "ok", int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(spark, handle, str(tmp_path / "pos"))
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 3)))
        mon = BusyMonitor()
        mon.record_outcomes([{"stream_name": "s-bad", "outcome": "exn"}])
        text = (
            MetricsExporter(group="g1")
            .register_sink(sink)
            .register_monitor(mon)
            .render()
        )
        assert 'propulsion_scheduler_events_total{group="g1"} 3' in text
        assert 'propulsion_scheduler_outcomes_total{group="g1",outcome="ok"} 1' in text
        assert 'propulsion_scheduler_busy_streams{group="g1"} 1' in text

    def test_curation_counters(self, spark, tmp_path):
        import pandas as pd

        from propulsion_spark.pipelines import CurationPipeline

        pipe = CurationPipeline(spark, str(tmp_path / "cur"))
        good = (
            "the quick brown fox jumps over the lazy dog and keeps running far " * 2
        )
        pipe.process_batch(
            spark.createDataFrame(
                pd.DataFrame(
                    [
                        {"doc_id": 1, "text": good, "lang": "en", "source": "s",
                         "n_chars": len(good)},
                        {"doc_id": 2, "text": good, "lang": "en", "source": "s",
                         "n_chars": len(good)},
                    ]
                ),
                "doc_id long, text string, lang string, source string, n_chars long",
            )
        )
        text = MetricsExporter(group="g2").register_curation(pipe).render()
        assert 'propulsion_curation_docs_total{group="g2",stage="seen"} 2' in text
        assert 'propulsion_curation_docs_total{group="g2",stage="deduped"} 1' in text
        assert 'propulsion_curation_docs_total{group="g2",stage="kept"} 1' in text


class TestRunStream:
    def test_streams_sink_attaches_to_streaming_query(self, spark, tmp_path):
        """StreamsSink.run_stream: changefeed tail → foreachBatch →
        positions advance, with Spark's commit log as batch completion."""
        indir = tmp_path / "feed"
        indir.mkdir()
        mk_df(spark, envelope_rows("user-1", 0, 4)).coalesce(1).write.mode(
            "append"
        ).parquet(str(indir))

        def handle(stream, events):
            return "ok", int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(spark, handle, str(tmp_path / "pos"))
        from propulsion_spark.sources import changefeed_stream

        stream = changefeed_stream(spark, str(indir))
        q = sink.run_stream(stream, str(tmp_path / "ck"), availableNow=True)
        q.awaitTermination(120)
        pos = {r.stream_name: r.pos for r in sink.positions.read().collect()}
        assert pos == {"user-1": 4}
        # append more and run a second availableNow pass: resumes from
        # Spark's offset log, only the new file is processed
        mk_df(spark, envelope_rows("user-1", 4, 2)).coalesce(1).write.mode(
            "append"
        ).parquet(str(indir))
        q2 = sink.run_stream(stream, str(tmp_path / "ck"), availableNow=True)
        q2.awaitTermination(120)
        pos = {r.stream_name: r.pos for r in sink.positions.read().collect()}
        assert pos == {"user-1": 6}
        assert sink.stats.outcomes.get("duplicate") is None  # no re-reads


class TestNewGaugeExports:
    def test_store_lease_and_spool_gauges(self, spark, tmp_path):
        """VERDICT r4 #8: lease liveness totals and spool retention
        depth are scrapeable, not just computed."""
        from propulsion_spark.streaming.event_store import EventStoreTable

        store = EventStoreTable(spark, str(tmp_path / "es"))
        store.sync(mk_df(spark, envelope_rows("user-1", 0, 3)))
        store.lease_counters["steals"] += 1  # simulate an observed steal
        text = (
            MetricsExporter(group="g1").register_store("es", store).render()
        )
        assert (
            'propulsion_lease_events_total{group="g1",kind="steals",store="es"} 1'
            in text
        )
        assert 'propulsion_spool_retained{group="g1",spool="report_spool",store="es"}' in text
        assert 'propulsion_spool_inflight{group="g1",spool="prune_spool",store="es"} 0' in text

    def test_sink_spool_depth_gauge(self, spark, tmp_path):
        def handle(stream, events):
            return "ok", int(events["idx"].iloc[-1]) + 1

        sink = StreamsSink.start_concurrent(spark, handle, str(tmp_path / "pos"))
        sink.process_batch(mk_df(spark, envelope_rows("user-1", 0, 3)))
        text = MetricsExporter(group="g1").register_sink(sink).render()
        assert 'propulsion_spool_retained{group="g1"} 1' in text
        assert 'propulsion_spool_inflight{group="g1"} 0' in text

    def test_lsh_boundedness_gauge(self, spark):
        from propulsion_spark.streaming.metrics import lsh_boundedness_gauge

        text = (
            MetricsExporter(group="g1")
            .register_gauge(
                "propulsion_lsh_bucket", lsh_boundedness_gauge(spark, "/root/testdata/sf0.001")
            )
            .render()
        )
        assert 'propulsion_lsh_bucket{group="g1",param="L"}' in text
        assert 'propulsion_lsh_bucket{group="g1",param="k"}' in text
        assert 'design="corpus"' in text and 'stat="max_bucket"' in text


class TestDeltaliteGauges:
    def test_log_health_gauges(self, spark, tmp_path):
        from propulsion_spark.streaming.deltalite import (
            CHECKPOINT_INTERVAL,
            DeltalitePositionsTable,
        )
        from propulsion_spark.streaming.metrics import MetricsExporter

        tbl = DeltalitePositionsTable(
            spark, str(tmp_path / "t"), compact_after=10**9
        )
        for i in range(CHECKPOINT_INTERVAL + 2):
            tbl.merge(
                spark.createDataFrame(
                    [(f"s-{i}", i + 1, 0, False)],
                    "stream_name string, pos long, revision long, malformed boolean",
                )
            )
        text = (
            MetricsExporter(group="dl")
            .register_deltalite("positions", tbl.log)
            .render()
        )
        assert 'propulsion_deltalite{group="dl",stat="version",table="positions"} 12' in text
        # checkpoint fired at v9 → 3 commits since
        assert (
            'propulsion_deltalite{group="dl",stat="commits_since_checkpoint",table="positions"} 3'
            in text
        )
        assert 'propulsion_deltalite{group="dl",stat="live_files",table="positions"} 12' in text
        assert (
            'propulsion_deltalite{group="dl",stat="live_files_with_stats",table="positions"} 12'
            in text
        )
