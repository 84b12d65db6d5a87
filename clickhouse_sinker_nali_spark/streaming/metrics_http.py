"""Prometheus ops-metrics endpoint: the reference's /metrics surface.

The reference registers 16 counters/gauges under the
``clickhouse_sinker_`` prefix (reference ``statistics/statistics.go:
35-147``) and serves them with promhttp next to /ready and /live health
endpoints (reference ``cmd/clickhouse_sinker_nali/main.go:162-203``,
``health/health.go``).  This module reproduces that scrape surface on
Spark:

- :class:`SinkerMetricsRegistry` holds the same-named series and renders
  Prometheus text exposition format 0.0.4.
- :class:`MetricsHttpServer` serves GET ``/`` (index), ``/metrics``,
  ``/ready`` and ``/live`` (both honoring ``?full=1``) from a daemon
  thread — scrape-compatible with the reference's Grafana dashboard.
- :func:`wire_listener` maps the Spark-side counters onto the reference
  names per micro-batch:

  ==========================================  =================================
  reference series                            Spark source
  ==========================================  =================================
  consume_msgs_total                          QueryProgress.numInputRows
  consumer_msgs_error_total                   source errors (fatal in Spark —
                                              stays 0 unless inc'ed by a
                                              custom source wrapper)
  parse_msgs_error_total                      observe() parse_errors_total
  ring_msgs_offset_too_small_error_total      rows dropped by watermark (the
                                              late/duplicate-drop analog of
                                              reference task/task.go:205-212)
  ring_msgs_offset_too_large_error_total      0 — no ring (overflow discard
                                              is superseded, COVERAGE §O4)
  ring_normal_batchs_total                    completed micro-batches
  ring_force_batchs_total                     0 — Trigger owns batch cuts
  ring_force_batch_all_total                  0 — same
  flush_msgs_total                            observe() flush_rows_total
                                              (falls back to numInputRows -
                                              parse errors)
  flush_msgs_error_total                      sink bad-row/failed-flush inc
  consume_offsets{topic,partition}            QueryProgress endOffset JSON
  clickhouse_reconnect_total                  with_retries replica rotations
  ring_msgs / shard_msgs                      0 — no ring/shard buffers
  parsing_pool_backlog / writing_pool_backlog 0 — Spark scheduler pools
  ==========================================  =================================
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse, parse_qs

PREFIX = "clickhouse_sinker_"

# (short name, type, help) — order and names mirror statistics.go:35-147
SERIES: list[tuple[str, str, str]] = [
    ("consume_msgs_total", "counter", "total num of consumed msgs"),
    ("consumer_msgs_error_total", "counter", "total num of consume errors"),
    ("parse_msgs_error_total", "counter", "total num of msgs with parse failure"),
    ("ring_msgs_offset_too_small_error_total", "counter",
     "total num of msgs with too small offset to put into ring"),
    ("ring_msgs_offset_too_large_error_total", "counter",
     "total num of msgs with too large offset to put into ring"),
    ("ring_normal_batchs_total", "counter", "total num of normal batches generated"),
    ("ring_force_batchs_total", "counter", "total num of force batches generated"),
    ("ring_force_batch_all_total", "counter", "total num of force batch_all generated"),
    ("flush_msgs_total", "counter", "total num of flushed msgs"),
    ("flush_msgs_error_total", "counter", "total num of msgs failed to flush to ck"),
    ("consume_offsets", "gauge", "last committed offset for each topic partition pair"),
    ("clickhouse_reconnect_total", "counter", "total num of ClickHouse reconnects"),
    ("ring_msgs", "gauge", "num of msgs in ring"),
    ("shard_msgs", "gauge", "num of msgs in shard"),
    ("parsing_pool_backlog", "gauge", "GlobalParsingPool backlog"),
    ("writing_pool_backlog", "gauge", "GlobalWritingPool backlog"),
]

_VALID = {name for name, _, _ in SERIES}


def _esc(v: str) -> str:
    """Label-value escaping per exposition format 0.0.4: an unescaped
    quote/backslash/newline in a topic or task name would make the scraper
    reject the whole payload."""
    return str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _fmt_labels(labels: dict[str, str]) -> str:
    if not labels:
        return ""
    inner = ",".join(f'{k}="{_esc(v)}"' for k, v in sorted(labels.items()))
    return "{" + inner + "}"


@dataclass
class SinkerMetricsRegistry:
    """Counter/gauge store keyed (series, frozenset(labels)) with text-format
    rendering.  Thread-safe: listener callbacks, sink writers, and the HTTP
    scrape thread all touch it."""

    _values: dict[tuple[str, tuple[tuple[str, str], ...]], float] = field(
        default_factory=dict
    )
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def _key(self, name: str, labels: dict[str, str]):
        if name not in _VALID:
            raise KeyError(f"unknown series {name!r}; parity set is fixed")
        return (name, tuple(sorted(labels.items())))

    def inc(self, name: str, labels: dict[str, str], value: float = 1.0) -> None:
        k = self._key(name, labels)
        with self._lock:
            self._values[k] = self._values.get(k, 0.0) + value

    def set(self, name: str, labels: dict[str, str], value: float) -> None:
        k = self._key(name, labels)
        with self._lock:
            self._values[k] = value

    def get(self, name: str, labels: dict[str, str]) -> float:
        with self._lock:
            return self._values.get(self._key(name, labels), 0.0)

    def ensure_task(self, task: str) -> None:
        """Pre-register every per-task series at 0 so a scrape shows the
        full 16-series surface immediately (promhttp does the same for
        registered-but-unincremented counters)."""
        for name, _, _ in SERIES:
            if name == "consume_offsets":
                continue  # needs topic/partition labels; appears on first batch
            k = self._key(name, {"task": task})
            with self._lock:
                self._values.setdefault(k, 0.0)

    def render(self) -> str:
        """Prometheus text exposition format 0.0.4."""
        with self._lock:
            snapshot = dict(self._values)
        lines: list[str] = []
        for name, mtype, help_text in SERIES:
            series = sorted(
                (labels, v) for (n, labels), v in snapshot.items() if n == name
            )
            if not series:
                continue
            full = PREFIX + name
            lines.append(f"# HELP {full} {help_text}")
            lines.append(f"# TYPE {full} {mtype}")
            for labels, v in series:
                val = int(v) if float(v).is_integer() else v
                lines.append(f"{full}{_fmt_labels(dict(labels))} {val}")
        return "\n".join(lines) + "\n"


def wire_listener(registry: SinkerMetricsRegistry):
    """A StreamingQueryListener feeding the registry per micro-batch."""
    try:
        from pyspark.sql.streaming import StreamingQueryListener
    except ImportError:  # pragma: no cover
        StreamingQueryListener = object  # type: ignore[assignment,misc]

    class _Listener(StreamingQueryListener):  # type: ignore[misc]
        def onQueryStarted(self, event) -> None:  # noqa: N802
            registry.ensure_task(event.name or str(event.id))

        def onQueryProgress(self, event) -> None:  # noqa: N802
            p = event.progress
            task = {"task": p.name or str(p.id)}
            registry.ensure_task(task["task"])
            n_in = int(p.numInputRows or 0)
            registry.inc("consume_msgs_total", task, n_in)
            registry.inc("ring_normal_batchs_total", task, 1)
            observed = {}
            if p.observedMetrics:
                for _, row in p.observedMetrics.items():
                    observed.update(row.asDict())
            parse_err = int(observed.get("parse_errors_total", 0) or 0)
            if parse_err:
                registry.inc("parse_msgs_error_total", task, parse_err)
            flushed = observed.get("flush_rows_total")
            registry.inc(
                "flush_msgs_total",
                task,
                int(flushed) if flushed is not None else n_in - parse_err,
            )
            for op in getattr(p, "stateOperators", None) or []:
                late = int(getattr(op, "numRowsDroppedByWatermark", 0) or 0)
                if late:
                    registry.inc(
                        "ring_msgs_offset_too_small_error_total", task, late
                    )
            for src in getattr(p, "sources", None) or []:
                self._offsets(task["task"], getattr(src, "endOffset", None))

        def _offsets(self, task: str, end_offset) -> None:
            """Kafka endOffset is {"topic": {"0": off}} JSON; other sources
            have non-dict shapes and are skipped."""
            if not end_offset:
                return
            try:
                obj = (
                    json.loads(end_offset)
                    if isinstance(end_offset, str)
                    else end_offset
                )
            except ValueError:
                return
            if not isinstance(obj, dict):
                return
            for topic, parts in obj.items():
                if not isinstance(parts, dict):
                    continue
                for partition, off in parts.items():
                    try:
                        registry.set(
                            "consume_offsets",
                            {"task": task, "topic": topic, "partition": str(partition)},
                            float(off),
                        )
                    except (TypeError, ValueError):
                        continue

        def onQueryTerminated(self, event) -> None:  # noqa: N802
            pass

        def onQueryIdle(self, event) -> None:  # noqa: N802
            pass

    return _Listener()


_INDEX_HTML = """<html><head><title>clickhouse_sinker_nali_spark</title></head>
<body><p><a href="/metrics">Metrics</a></p>
<p><a href="/ready">Ready</a></p>
<p><a href="/ready?full=1">Ready Full</a></p>
<p><a href="/live">Live</a></p>
<p><a href="/live?full=1">Live Full</a></p>
</body></html>"""


class MetricsHttpServer:
    """Scrape endpoint twin of reference main.go:162-203 (promhttp + health).

    ``checks`` maps check-name → callable returning True when healthy;
    /ready and /live report 200/503 and, with ``?full=1``, a per-check
    body — the go healthcheck library's contract.
    """

    def __init__(
        self,
        registry: SinkerMetricsRegistry,
        host: str = "127.0.0.1",
        port: int = 0,
        checks: dict[str, object] | None = None,
    ) -> None:
        self.registry = registry
        self.checks = checks or {}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802
                parsed = urlparse(self.path)
                full = parse_qs(parsed.query).get("full", ["0"])[0] == "1"
                if parsed.path == "/metrics":
                    body = outer.registry.render().encode()
                    self._reply(200, body, "text/plain; version=0.0.4")
                elif parsed.path in ("/ready", "/live"):
                    results = {
                        name: bool(fn()) for name, fn in outer.checks.items()
                    }
                    ok = all(results.values())
                    body = (
                        json.dumps(
                            {k: "OK" if v else "FAIL" for k, v in results.items()},
                            indent=2,
                        ).encode()
                        if full
                        else b"{}\n"
                    )
                    self._reply(200 if ok else 503, body, "application/json")
                elif parsed.path == "/":
                    self._reply(200, _INDEX_HTML.encode(), "text/html")
                else:
                    self._reply(404, b"not found", "text/plain")

            def _reply(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args) -> None:  # silence per-request noise
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True, name="metrics-http"
        )
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
