"""Prometheus-style metrics exposition (SURVEY.md §2.5 M7; ref:
src/Propulsion.Prometheus/PropulsionPrometheus.fs, FeedPrometheus.fs).

Renders the engine's runtime state — sink outcome counters, busy/stuck
stream gauges, feed positions and lag — in the Prometheus text format
(the push/scrape transport is environment-specific and out of scope;
any HTTP handler can serve ``render()``). Metric names mirror the
reference's ``propulsion_scheduler_*`` / ``propulsion_feed_*`` families.
"""

from __future__ import annotations

from typing import Iterable


def _fmt(name: str, labels: dict, value) -> str:
    if labels:
        lbl = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
        return f"{name}{{{lbl}}} {value}"
    return f"{name} {value}"


class MetricsExporter:
    def __init__(self, group: str = "default"):
        self.group = group
        self._sinks: list = []
        self._sources: list = []
        self._monitors: list = []
        self._stores: list = []
        self._gauges: list = []

    def register_sink(self, sink) -> "MetricsExporter":
        self._sinks.append(sink)
        return self

    def register_source(self, source) -> "MetricsExporter":
        self._sources.append(source)
        return self

    def register_monitor(self, monitor) -> "MetricsExporter":
        self._monitors.append(monitor)
        return self

    def register_store(self, name: str, store) -> "MetricsExporter":
        """An EventStoreTable / PositionsTable: exports lease liveness
        totals (``propulsion_lease_*``) and spool retention depths
        (``propulsion_spool_*``)."""
        self._stores.append((name, store))
        return self

    def register_gauge(self, name: str, fn) -> "MetricsExporter":
        """A custom gauge family: ``fn()`` returns either a number or an
        iterable of ``(labels_dict, value)`` rows, evaluated at scrape
        time. Used for e.g. the LSH bucket-boundedness gauges
        (:func:`lsh_boundedness_gauge`)."""
        self._gauges.append((name, fn))
        return self

    def register_ann_index(self, name: str, index) -> "MetricsExporter":
        """An :class:`~propulsion_spark.pipelines.ann_index.AnnIndex`:
        exports the frozen-codebook drift gauges — per-scrape cell
        balance (``propulsion_ann_cell_skew`` = max cell size / mean,
        plus cell count and max size). Appends under a frozen quantizer
        degrade recall silently as the corpus drifts; a rising skew
        trend is the ``reindex`` signal."""

        def scrape():
            s = index.cell_skew()
            lbl = {"index": name}
            t = index._tombstones()
            # O(deletes since last reindex); a growing count is the
            # compaction (reindex) signal alongside rising skew
            n_tomb = t.count() if t is not None else 0
            return [
                ({**lbl, "stat": "skew"}, s["skew"]),
                ({**lbl, "stat": "n_cells"}, s["n_cells"]),
                ({**lbl, "stat": "max_cell"}, s["max_cell"]),
                ({**lbl, "stat": "tombstones"}, n_tomb),
            ]

        self._register_index_lease(name, index)
        return self.register_gauge("propulsion_ann_index_cells", scrape)

    def _register_index_lease(self, name: str, index) -> None:
        """Lease-liveness totals for a serving index's mutation fence
        (``propulsion_index_lease_events{kind=heartbeats|steals|lost}``
        — the ``propulsion_lease_events_total`` analog): a rising
        ``lost`` means fenced mutators are aborting mid-commit (a peer
        judged them stale), ``steals`` count broken crashed-holder
        leases. O(1) per scrape."""
        self.register_gauge(
            "propulsion_index_lease_events",
            lambda: [
                ({"index": name, "kind": k}, v)
                for k, v in sorted(index.lease_counters.items())
            ],
        )

    def register_lexical_index(
        self, name: str, index, max_df_share: "float | None" = None
    ) -> "MetricsExporter":
        """A :class:`~propulsion_spark.pipelines.lexical_index.
        LexicalIndex`: exports the postings-skew gauges — corpus size,
        batch-fragmentation (``n_batches``, the ``compact`` signal),
        the heaviest token's df share (``max_df_share_observed``: a
        share near 1.0 means a stopword-class token whose postings are
        O(corpus) — the ``max_df_share`` search lever's target), and,
        when a serving threshold is given, how many of the top tokens
        it would drop (``n_saturated`` — the bound made visible, never
        silent)."""

        def scrape():
            lbl = {"index": name}
            n_docs, total_dl = index.stats()
            # an empty / never-built / all-deleted-then-compacted index
            # has NO df path (missing, not empty — the zero-row
            # partitionBy rule): skip the token read entirely or the
            # whole metrics render dies on one gauge
            top = index.token_stats(top=20).collect() if n_docs else []
            max_share = max((r["share"] for r in top), default=0.0)
            n_batches = index.n_batches()
            out = [
                ({**lbl, "stat": "n_docs"}, n_docs),
                ({**lbl, "stat": "total_tokens"}, total_dl),
                ({**lbl, "stat": "n_batches"}, n_batches),
                ({**lbl, "stat": "max_df_share_observed"}, max_share),
            ]
            if max_df_share is not None:
                out.append(
                    (
                        {**lbl, "stat": "n_saturated"},
                        sum(1 for r in top if r["share"] > max_df_share),
                    )
                )
            return out

        self._register_index_lease(name, index)
        return self.register_gauge("propulsion_lex_index", scrape)

    def register_media_dedup(self, pipeline) -> "MetricsExporter":
        """A :class:`~propulsion_spark.pipelines.media_dedup.
        MediaDedupStream`: exports its per-stage media counters
        (``propulsion_media_dedup_total{stage=...}`` — seen,
        unfingerprintable, deduped_in_batch, deduped_cross_batch,
        kept), O(1) per scrape like the curation counters."""
        return self.register_gauge(
            "propulsion_media_dedup_total",
            lambda: [({"stage": k}, v) for k, v in sorted(pipeline.stats.items())],
        )

    def register_semantic_dedup(self, pipeline) -> "MetricsExporter":
        """A :class:`~propulsion_spark.pipelines.semantic_dedup.
        SemDedupStream`: exports its per-stage vector counters
        (``propulsion_semantic_dedup_total{stage=...}`` — seen,
        unembeddable, deduped_in_batch, deduped_cross_batch, kept),
        O(1) per scrape like the media counters."""
        return self.register_gauge(
            "propulsion_semantic_dedup_total",
            lambda: [({"stage": k}, v) for k, v in sorted(pipeline.stats.items())],
        )

    def register_substr_dedup(self, pipeline) -> "MetricsExporter":
        """A :class:`~propulsion_spark.streaming.substring_dedup.
        SubstrDedupStream`: exports its per-stage counters
        (``propulsion_substr_dedup_total{stage=...}`` — seen,
        masked_docs, masked_tokens) plus the gram registry's
        batch-fragmentation gauge (the ``auto_compact`` signal) and
        its lease-liveness totals — O(1) counters, one
        partition-column read per scrape for the gauge."""
        self.register_gauge(
            "propulsion_substr_dedup_total",
            lambda: [({"stage": k}, v) for k, v in sorted(pipeline.stats.items())],
        )
        self._register_index_lease("gram_registry", pipeline.registry)
        return self.register_gauge(
            "propulsion_substr_registry_batches",
            lambda: [({}, pipeline.registry.n_batches())],
        )

    def register_source_cap(self, pipeline) -> "MetricsExporter":
        """A :class:`~propulsion_spark.streaming.source_cap.
        CapPerSourceStream`: per-stage counters
        (``propulsion_source_cap_total{stage=...}`` — seen, admitted;
        the over-admission debt is exact only at ``retro_thin`` time,
        which reports it) plus the count registry's fragmentation
        gauge and lease-liveness totals."""
        self.register_gauge(
            "propulsion_source_cap_total",
            lambda: [({"stage": k}, v) for k, v in sorted(pipeline.stats.items())],
        )
        self._register_index_lease("source_count_registry", pipeline.registry)
        return self.register_gauge(
            "propulsion_source_cap_registry_batches",
            lambda: [({}, pipeline.registry.n_batches())],
        )

    def register_deltalite(self, name: str, log) -> "MetricsExporter":
        """A :class:`~propulsion_spark.streaming.deltalite.DeltaliteLog`:
        exports the log-health gauges an operator watches —
        ``propulsion_deltalite{stat=...}``: latest version, commits
        since the last parquet checkpoint (replay cost; should stay
        under CHECKPOINT_INTERVAL), live file count, and how many live
        adds carry column stats (files the scan planner can prune;
        anything below live_files means stat-less legacy adds are
        serving unskippable). Driver-side log replay only — O(interval)
        commit files per scrape, no data IO."""

        def scrape():
            lbl = {"table": name}
            latest, live = log.snapshot_adds()
            ck = log.last_checkpoint()
            behind = latest - ck if ck is not None else latest + 1
            with_stats = sum(1 for a in live.values() if a.get("stats"))
            return [
                ({**lbl, "stat": "version"}, max(latest, 0)),
                ({**lbl, "stat": "commits_since_checkpoint"}, max(behind, 0)),
                ({**lbl, "stat": "live_files"}, len(live)),
                ({**lbl, "stat": "live_files_with_stats"}, with_stats),
            ]

        return self.register_gauge("propulsion_deltalite", scrape)

    def register_curation(self, pipeline) -> "MetricsExporter":
        """A :class:`~propulsion_spark.pipelines.CurationPipeline`:
        exports its per-stage document counters
        (``propulsion_curation_docs_total{stage=...}`` — seen,
        rejected_quality, rejected_repetition, rejected_benchmark,
        deduped, near_deduped, kept) so an operator can watch
        gate/dedup rates live."""
        self.register_gauge(
            "propulsion_curation_docs_total",
            lambda: [({"stage": k}, v) for k, v in sorted(pipeline.stats.items())],
        )
        if getattr(pipeline, "_bloom", None) is not None:
            # decontamination-filter capacity: past ~0.5 the FP rate
            # (over-removal) degrades — rebuild with a larger bitset.
            # The filter is frozen for the pipeline's life: compute the
            # ratio once, not an unpackbits over 1 MiB per scrape
            fill = pipeline._bloom.fill_ratio
            self.register_gauge(
                "propulsion_curation_bloom_fill_ratio",
                lambda: [({}, fill)],
            )

        def length_scrape():
            return [
                ({"lang": r["grp"], "pct": r["pct"]}, r["est"])
                for r in pipeline.token_length_quantiles().collect()
            ]

        # kept-doc token-length p50/p90/p99 per language, off the
        # accumulated mergeable histogram — drift in what curation
        # keeps shows here before it shows in model training
        return self.register_gauge(
            "propulsion_curation_token_length", length_scrape
        )

    def lines(self) -> Iterable[str]:
        g = {"group": self.group}
        for sink in self._sinks:
            stats = sink.stats.as_dict()
            yield "# TYPE propulsion_scheduler_batches_total counter"
            yield _fmt("propulsion_scheduler_batches_total", g, stats["batches"])
            yield "# TYPE propulsion_scheduler_events_total counter"
            yield _fmt("propulsion_scheduler_events_total", g, stats["events"])
            yield _fmt("propulsion_scheduler_deduped_total", g, stats["deduped"])
            yield "# TYPE propulsion_scheduler_outcomes_total counter"
            for outcome, n in sorted(stats["outcomes"].items()):
                yield _fmt(
                    "propulsion_scheduler_outcomes_total",
                    {**g, "outcome": outcome},
                    n,
                )
            yield "# TYPE propulsion_scheduler_failing_streams gauge"
            yield _fmt(
                "propulsion_scheduler_failing_streams", g, len(stats["failing"])
            )
            spool = getattr(sink, "_spool", None)
            if spool is not None:
                d = spool.depth()
                yield "# TYPE propulsion_spool_retained gauge"
                yield _fmt("propulsion_spool_retained", g, d["retained"])
                yield _fmt("propulsion_spool_inflight", g, d["inflight"])
        for mon in self._monitors:
            snap = mon.snapshot()
            yield "# TYPE propulsion_scheduler_busy_streams gauge"
            yield _fmt("propulsion_scheduler_busy_streams", g, len(snap))
            if snap:
                oldest = max(v["age_s"] for v in snap.values())
                yield _fmt("propulsion_scheduler_oldest_busy_seconds", g, oldest)
        for name, store in self._stores:
            lbl = {**g, "store": name}
            counters = getattr(store, "lease_counters", None)
            if counters:
                yield "# TYPE propulsion_lease_events_total counter"
                for kind, n in sorted(counters.items()):
                    yield _fmt(
                        "propulsion_lease_events_total", {**lbl, "kind": kind}, n
                    )
            seg_counts = getattr(store, "bucket_segment_counts", None)
            if seg_counts is not None:
                counts = seg_counts()
                yield "# TYPE propulsion_store_segments gauge"
                yield _fmt(
                    "propulsion_store_segments",
                    {**lbl, "stat": "max_per_bucket"},
                    max(counts.values()) if counts else 0,
                )
                yield _fmt(
                    "propulsion_store_segments",
                    {**lbl, "stat": "total"},
                    sum(counts.values()),
                )
            cdc_latest = getattr(store, "cdc_latest_seq", None)
            if cdc_latest is not None:
                # change-feed health: the window a lagging consumer can
                # still read ([earliest_readable, latest]); a consumer
                # group's lag = latest − its committed position
                yield "# TYPE propulsion_store_cdc_seq gauge"
                yield _fmt(
                    "propulsion_store_cdc_seq",
                    {**lbl, "stat": "latest"},
                    cdc_latest(),
                )
                yield _fmt(
                    "propulsion_store_cdc_seq",
                    {**lbl, "stat": "earliest_readable"},
                    store.cdc_earliest_readable(),
                )
            yield "# TYPE propulsion_spool_retained gauge"
            for spool_name in ("_report_spool", "_prune_spool", "_spool"):
                spool = getattr(store, spool_name, None)
                if spool is None:
                    continue
                d = spool.depth()
                slbl = {**lbl, "spool": spool_name.strip("_")}
                yield _fmt("propulsion_spool_retained", slbl, d["retained"])
                yield _fmt("propulsion_spool_inflight", slbl, d["inflight"])
        for name, fn in self._gauges:
            yield f"# TYPE {name} gauge"
            v = fn()
            if isinstance(v, (int, float)):
                yield _fmt(name, g, v)
            else:
                for labels, value in v:
                    yield _fmt(name, {**g, **labels}, value)
        for src in self._sources:
            yield "# TYPE propulsion_feed_position gauge"
            for tranche, st in src.tranches.items():
                lbl = {**g, "source": src.source_id, "tranche": tranche}
                yield _fmt("propulsion_feed_position", lbl, st.pos)
                yield _fmt("propulsion_feed_batches_total", lbl, st.batches)
                yield _fmt(
                    "propulsion_feed_at_tail", lbl, int(st.reached_tail)
                )

    def render(self) -> str:
        return "\n".join(self.lines()) + "\n"


def lsh_boundedness_gauge(spark, sf_dir: str):
    """Gauge callable for :meth:`MetricsExporter.register_gauge`: the
    LSH index's bucket-boundedness invariant as scrapeable rows —
    per (design, table): max bucket size, bucket count, corpus size,
    plus the active (L, k) design point. A max_bucket trending toward
    n_vectors means the O(n·bucket) candidate-join bound is eroding
    and (L, k) must be re-derived (``active_lsh_params`` does this
    from live corpus size; the gauge is how an operator notices).

    Runs one bounded Spark aggregate per scrape (L × 2 design rows) —
    scrape-rate cost, not hot-path cost.
    """

    def scrape():
        from propulsion_spark.operators.similarity import (
            active_lsh_params,
            q_lsh_bucket_stats,
        )

        L, k = active_lsh_params(sf_dir)
        rows = [({"param": "L"}, L), ({"param": "k"}, k)]
        for r in q_lsh_bucket_stats(spark, sf_dir).collect():
            lbl = {"design": r.design, "table": str(r.t)}
            rows.append(({**lbl, "stat": "max_bucket"}, r.max_bucket))
            rows.append(({**lbl, "stat": "n_buckets"}, r.n_buckets))
            rows.append(({**lbl, "stat": "n_vectors"}, r.n_vectors))
        return rows

    return scrape
