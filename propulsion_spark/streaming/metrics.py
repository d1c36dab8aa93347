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

    def register_sink(self, sink) -> "MetricsExporter":
        self._sinks.append(sink)
        return self

    def register_source(self, source) -> "MetricsExporter":
        self._sources.append(source)
        return self

    def register_monitor(self, monitor) -> "MetricsExporter":
        self._monitors.append(monitor)
        return self

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
        for mon in self._monitors:
            snap = mon.snapshot()
            yield "# TYPE propulsion_scheduler_busy_streams gauge"
            yield _fmt("propulsion_scheduler_busy_streams", g, len(snap))
            if snap:
                oldest = max(v["age_s"] for v in snap.values())
                yield _fmt("propulsion_scheduler_oldest_busy_seconds", g, oldest)
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
