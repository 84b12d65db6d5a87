"""Ops-dashboard parity: the Grafana twin charts only metrics the /metrics
endpoint actually serves, and covers every series the reference dashboard
queries.

Reference: ``clickhouse_sinker-dashboard.json`` (repo root of the reference)
— six graph panels, each ``sum by(task)(...)`` over one
``clickhouse_sinker_*`` series.  The parity list below is copied from those
panels' exprs; the twin must chart all of them (plus whatever extra series
it likes, as long as each exists in the registry's fixed parity set).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from clickhouse_sinker_nali_spark.streaming.metrics_http import PREFIX, SERIES

DASHBOARD = (
    Path(__file__).resolve().parents[1]
    / "clickhouse_sinker_nali_spark" / "data" / "grafana_dashboard.json"
)

# Every expr in the reference dashboard's panels (clickhouse_sinker-dashboard
# .json, panel ids 6/16/8/10/14/12) references exactly one of these series.
REFERENCE_DASHBOARD_SERIES = {
    "clickhouse_sinker_consume_msgs_total",
    "clickhouse_sinker_flush_msgs_total",
    "clickhouse_sinker_ring_msgs",
    "clickhouse_sinker_shard_msgs",
    "clickhouse_sinker_parsing_pool_backlog",
    "clickhouse_sinker_writing_pool_backlog",
}


def _dashboard():
    return json.loads(DASHBOARD.read_text())


def _charted_series(dash) -> set[str]:
    out: set[str] = set()
    for panel in dash["panels"]:
        for target in panel.get("targets", []):
            out.update(re.findall(r"clickhouse_sinker_[a-z_]+", target["expr"]))
    return out


def test_dashboard_covers_every_reference_panel_series():
    assert REFERENCE_DASHBOARD_SERIES <= _charted_series(_dashboard())


def test_dashboard_charts_only_registry_series():
    valid = {PREFIX + name for name, _, _ in SERIES}
    charted = _charted_series(_dashboard())
    assert charted, "dashboard charts nothing"
    assert charted <= valid, f"unknown series: {sorted(charted - valid)}"


def test_dashboard_panels_well_formed():
    dash = _dashboard()
    ids = [p["id"] for p in dash["panels"]]
    assert len(ids) == len(set(ids)), "duplicate panel ids"
    for panel in dash["panels"]:
        assert panel["title"]
        assert panel.get("targets"), f"panel {panel['id']} has no targets"


def test_live_scrape_satisfies_reference_panel_queries():
    """End-to-end: a registry with one task pre-registered renders text
    exposition containing every series the reference dashboard queries —
    i.e. the shipped dashboard would light up against our /metrics."""
    from clickhouse_sinker_nali_spark.streaming.metrics_http import (
        SinkerMetricsRegistry,
    )

    reg = SinkerMetricsRegistry()
    reg.ensure_task("t1")
    text = reg.render()
    for series in REFERENCE_DASHBOARD_SERIES:
        assert re.search(rf"^{series}{{", text, re.M), series
