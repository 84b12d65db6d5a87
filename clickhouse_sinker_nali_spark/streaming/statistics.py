"""Ops metrics: the reference's Prometheus counter surface on Spark.

The reference exports ~16 counters/gauges (reference
``statistics/statistics.go:35-147``): consume/parse/flush counts, parse
errors, write failures, offsets, ring states.  Spark equivalents:

- per-micro-batch data metrics → ``df.observe`` (evaluated inside the
  query, no extra pass)
- pipeline lifecycle/progress  → ``StreamingQueryListener`` (rows/s,
  batch durations, offsets — Spark tracks these natively)
- ring/pool gauges             → N/A by construction (no rings/pools;
  Spark's scheduler metrics cover the equivalents)

``observed_metrics(df)`` wires the data-plane counters the reference
tracks; ``MetricsListener`` accumulates per-query progress the way the
reference's /metrics endpoint exposes task state.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # StreamingQueryListener import path (PySpark >= 3.4)
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore[assignment,misc]


def observed_metrics(df: DataFrame, name: str = "sinker_metrics") -> DataFrame:
    """Attach the reference's data-plane counters to a (streaming) DataFrame.

    Counters (reference statistics.go names in parens):

    - rows_total            (ConsumeMsgsTotal)
    - parse_errors_total    (ParseMsgsErrorTotal) — requires a
      ``__parse_error`` column (see parsers.with_parse_errors)
    - flush_rows_total      (FlushMsgsTotal)

    ``observe`` computes these inside the running plan — no second scan;
    results surface in each StreamingQueryProgress / QueryExecution event.
    """
    cols = [
        F.count(F.lit(1)).alias("rows_total"),
    ]
    if "__parse_error" in df.columns:
        cols.append(
            F.sum(F.when(F.col("__parse_error"), 1).otherwise(0)).alias(
                "parse_errors_total"
            )
        )
        cols.append(
            F.sum(F.when(~F.col("__parse_error"), 1).otherwise(0)).alias(
                "flush_rows_total"
            )
        )
    return df.observe(name, *cols)


@dataclass
class QueryStats:
    """Accumulated per-query counters (≈ one reference task's metrics)."""

    batches: int = 0
    input_rows: int = 0
    # event-time rows discarded because they arrived behind the watermark
    # (reference analog: the offset-window late/duplicate drops of
    # task/task.go:205-212, surfaced as a counter instead of a log line)
    rows_dropped_by_watermark: int = 0
    observed: dict = field(default_factory=dict)
    last_progress: dict = field(default_factory=dict)


class MetricsListener(StreamingQueryListener):  # type: ignore[misc]
    """Accumulates StreamingQueryProgress into per-query counters.

    Equivalent of the reference's pull-based /metrics endpoint: attach with
    ``spark.streams.addListener(listener)`` and scrape ``stats``.
    """

    def __init__(self) -> None:
        self.stats: dict[str, QueryStats] = {}

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        self.stats.setdefault(event.name or event.id, QueryStats())

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        s = self.stats.setdefault(p.name or p.id, QueryStats())
        s.batches += 1
        s.input_rows += int(p.numInputRows or 0)
        for op in getattr(p, "stateOperators", None) or []:
            s.rows_dropped_by_watermark += int(
                getattr(op, "numRowsDroppedByWatermark", 0) or 0
            )
        if p.observedMetrics:
            for metric_name, row in p.observedMetrics.items():
                s.observed[metric_name] = row.asDict()
        s.last_progress = {
            "batchId": p.batchId,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
        }

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
