"""Telemetry registry (reference: util/Metrics.java:14-69, README.md:71-92).

Self-contained counters/histograms with the reference's metric names, so tests
can assert emissions without an OTel SDK. If opentelemetry is importable, the
same instruments are mirrored to the global OTel meter.

Instruments (reference names):
  histograms: vectorsearch.query.duration_ms, vectorsearch.build.duration_ms,
              vectorsearch.vacuum.duration_ms, vectorsearch.compaction.duration_ms,
              vectorsearch.query.pq_scan_ms, vectorsearch.query.graph_traversal_ms,
              vectorsearch.query.rerank_ms, vectorsearch.query.segments_searched,
              vectorsearch.query.results_returned
  counters:   vectorsearch.query.count, vectorsearch.build.count,
              vectorsearch.vacuum.run, vectorsearch.vacuum.removed,
              vectorsearch.compaction.run,
              vectorsearch.maintenance.vacuum.scheduled,
              vectorsearch.maintenance.vacuum.skipped
  gauges:     vectorsearch.cache.size/hit/miss/load_success/load_failure
              tagged {cache=codebook|adjacency}
"""

from __future__ import annotations

import contextlib
import threading
from collections import defaultdict
from typing import Dict, Tuple


def _key(name: str, attrs: dict | None) -> Tuple[str, tuple]:
    return name, tuple(sorted((attrs or {}).items()))


class _OtelBridge:
    """Mirrors instruments to the global OpenTelemetry meter/tracer when the
    opentelemetry API is importable (reference: util/Metrics.java uses
    GlobalOpenTelemetry — a no-op unless the app installs an SDK,
    README.md:94-96). Instruments are created lazily per name."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict = {}
        self._histograms: dict = {}
        try:
            from opentelemetry import metrics as _om
            from opentelemetry import trace as _ot

            self._meter = _om.get_meter("vectorsearch_tpu")
            self.tracer = _ot.get_tracer("vectorsearch_tpu")
        except Exception:  # opentelemetry not installed: stay silent
            self._meter = None
            self.tracer = None

    def add(self, name: str, value: float, attrs: dict | None) -> None:
        if self._meter is None:
            return
        with self._lock:
            c = self._counters.get(name)
            if c is None:
                c = self._counters[name] = self._meter.create_counter(name)
        c.add(value, attributes=attrs or {})

    def record(self, name: str, value: float, attrs: dict | None) -> None:
        if self._meter is None:
            return
        with self._lock:
            h = self._histograms.get(name)
            if h is None:
                h = self._histograms[name] = self._meter.create_histogram(name)
        h.record(value, attributes=attrs or {})


_OTEL = _OtelBridge()


@contextlib.contextmanager
def span(name: str, attrs: dict | None = None):
    """Tracing span mirroring the reference's OTel spans (vectorsearch.query /
    build / vacuum / compaction; exceptions recorded + ERROR status). No-op
    without an installed OTel SDK."""
    if _OTEL.tracer is None:
        yield None
        return
    with _OTEL.tracer.start_as_current_span(name) as sp:
        for k, v in (attrs or {}).items():
            sp.set_attribute(k, v)
        try:
            yield sp
        except Exception as e:
            try:
                from opentelemetry.trace import StatusCode

                sp.record_exception(e)
                sp.set_status(StatusCode.ERROR)
            except Exception:
                pass
            raise


class MetricsRegistry:
    """Thread-safe in-process metrics sink (mirrored to OTel when available)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: Dict[Tuple[str, tuple], float] = defaultdict(float)
        self._histograms: Dict[Tuple[str, tuple], list] = defaultdict(list)

    def inc(self, name: str, value: float = 1.0, attrs: dict | None = None) -> None:
        with self._lock:
            self._counters[_key(name, attrs)] += value
        _OTEL.add(name, value, attrs)

    def record(self, name: str, value: float, attrs: dict | None = None) -> None:
        with self._lock:
            self._histograms[_key(name, attrs)].append(value)
        _OTEL.record(name, value, attrs)

    def counter_value(self, name: str, attrs: dict | None = None) -> float:
        with self._lock:
            if attrs is None:
                return sum(v for (n, _), v in self._counters.items() if n == name)
            return self._counters.get(_key(name, attrs), 0.0)

    def histogram_values(self, name: str, attrs: dict | None = None) -> list:
        with self._lock:
            if attrs is None:
                out = []
                for (n, _), vs in self._histograms.items():
                    if n == name:
                        out.extend(vs)
                return out
            return list(self._histograms.get(_key(name, attrs), []))

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": {f"{n}{dict(a)}": v for (n, a), v in self._counters.items()},
                "histogram_counts": {
                    f"{n}{dict(a)}": len(v) for (n, a), v in self._histograms.items()
                },
            }

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()
            self._histograms.clear()


class ScopedRegistry:
    """View of a registry that merges fixed base attributes into every
    emission — the analogue of the reference's `metricAttribute(k, v)`
    user attributes (config/VectorIndexConfig.java:594-606): components
    holding a config emit through get_registry(config.metric_attributes) so
    every counter/histogram (and the OTel mirror) carries the user tags.
    Per-call attrs override base attrs on key collision."""

    def __init__(self, base: "MetricsRegistry", attrs: dict):
        self._base = base
        self._attrs = dict(attrs)

    def _merge(self, attrs: dict | None) -> dict:
        return {**self._attrs, **(attrs or {})}

    def inc(self, name: str, value: float = 1.0, attrs: dict | None = None) -> None:
        self._base.inc(name, value, self._merge(attrs))

    def record(self, name: str, value: float, attrs: dict | None = None) -> None:
        self._base.record(name, value, self._merge(attrs))

    def counter_value(self, name: str, attrs: dict | None = None) -> float:
        return self._base.counter_value(name, attrs)

    def histogram_values(self, name: str, attrs: dict | None = None) -> list:
        return self._base.histogram_values(name, attrs)

    def snapshot(self) -> dict:
        return self._base.snapshot()

    def reset(self) -> None:
        self._base.reset()


#: Global registry (reference uses GlobalOpenTelemetry; tests may reset()).
GLOBAL = MetricsRegistry()


def get_registry(attrs: dict | None = None):
    """The global sink, or a scoped view merging ``attrs`` (e.g.
    config.metric_attributes) into every emission."""
    if attrs:
        return ScopedRegistry(GLOBAL, attrs)
    return GLOBAL


def reset_for_test() -> None:
    GLOBAL.reset()
