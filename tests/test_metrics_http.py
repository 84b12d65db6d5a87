"""Prometheus ops-metrics endpoint parity (reference statistics/
statistics.go:35-147 + cmd/clickhouse_sinker_nali/main.go:162-203): the
16-series scrape surface, the /metrics text format, health endpoints, and
the listener mapping from Spark query progress onto the reference names."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from clickhouse_sinker_nali_spark.streaming.metrics_http import (
    PREFIX,
    SERIES,
    MetricsHttpServer,
    SinkerMetricsRegistry,
    wire_listener,
)


def _get(url: str) -> tuple[int, str]:
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_registry_has_reference_series_set():
    names = [n for n, _, _ in SERIES]
    assert len(names) == 16  # statistics.go registers exactly 16
    for ref_name in (
        "consume_msgs_total", "consumer_msgs_error_total",
        "parse_msgs_error_total", "ring_msgs_offset_too_small_error_total",
        "ring_msgs_offset_too_large_error_total", "ring_normal_batchs_total",
        "ring_force_batchs_total", "ring_force_batch_all_total",
        "flush_msgs_total", "flush_msgs_error_total", "consume_offsets",
        "clickhouse_reconnect_total", "ring_msgs", "shard_msgs",
        "parsing_pool_backlog", "writing_pool_backlog",
    ):
        assert ref_name in names


def test_registry_render_text_format():
    reg = SinkerMetricsRegistry()
    reg.ensure_task("t1")
    reg.inc("consume_msgs_total", {"task": "t1"}, 100)
    reg.inc("parse_msgs_error_total", {"task": "t1"}, 3)
    reg.set("consume_offsets", {"task": "t1", "topic": "tp", "partition": "0"}, 42)
    out = reg.render()
    assert f"# HELP {PREFIX}consume_msgs_total total num of consumed msgs" in out
    assert f"# TYPE {PREFIX}consume_msgs_total counter" in out
    assert f'{PREFIX}consume_msgs_total{{task="t1"}} 100' in out
    assert f'{PREFIX}parse_msgs_error_total{{task="t1"}} 3' in out
    assert f'{PREFIX}consume_offsets{{partition="0",task="t1",topic="tp"}} 42' in out
    # the full per-task surface is pre-registered at 0
    assert f'{PREFIX}writing_pool_backlog{{task="t1"}} 0' in out
    with pytest.raises(KeyError):
        reg.inc("not_a_reference_series", {"task": "t1"})


def test_http_scrape_and_health_endpoints():
    reg = SinkerMetricsRegistry()
    reg.ensure_task("svc")
    reg.inc("flush_msgs_total", {"task": "svc"}, 7)
    healthy = {"ok": True}
    server = MetricsHttpServer(
        reg, checks={"sink_alive": lambda: healthy["ok"]}
    )
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        code, body = _get(base + "/metrics")
        assert code == 200
        assert f'{PREFIX}flush_msgs_total{{task="svc"}} 7' in body

        code, _ = _get(base + "/ready")
        assert code == 200
        code, body = _get(base + "/live?full=1")
        assert code == 200 and json.loads(body) == {"sink_alive": "OK"}

        healthy["ok"] = False
        code, body = _get(base + "/ready?full=1")
        assert code == 503 and json.loads(body) == {"sink_alive": "FAIL"}

        code, body = _get(base + "/")
        assert code == 200 and "/metrics" in body
        code, _ = _get(base + "/nope")
        assert code == 404
    finally:
        server.stop()


def test_listener_maps_microbatch_onto_reference_counters(spark, tmp_path):
    """Drive a real micro-batch through observe() + the listener and scrape
    the counters over HTTP: consume/flush/parse-error/batch counts must
    land under the reference's series names."""
    from clickhouse_sinker_nali_spark.parsers import with_parse_errors
    from clickhouse_sinker_nali_spark.streaming.statistics import observed_metrics

    src = tmp_path / "src"
    src.mkdir()
    lines = [json.dumps({"v": i}) for i in range(9)] + ["{not json"]
    (src / "batch.txt").write_text("\n".join(lines) + "\n")

    reg = SinkerMetricsRegistry()
    listener = wire_listener(reg)
    spark.streams.addListener(listener)
    server = MetricsHttpServer(reg)
    server.start()
    try:
        stream = spark.readStream.text(str(src))
        staged = observed_metrics(with_parse_errors(stream, "value"))
        query = (
            staged.writeStream.foreachBatch(lambda df, eid: df.count())
            .queryName("metrics_e2e")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)

        # listener events are delivered asynchronously — poll the scrape
        deadline = time.time() + 30
        body = ""
        want = f'{PREFIX}consume_msgs_total{{task="metrics_e2e"}} 10'
        while time.time() < deadline:
            _, body = _get(f"http://127.0.0.1:{server.port}/metrics")
            if want in body:
                break
            time.sleep(0.2)
        assert want in body
        assert f'{PREFIX}parse_msgs_error_total{{task="metrics_e2e"}} 1' in body
        assert f'{PREFIX}flush_msgs_total{{task="metrics_e2e"}} 9' in body
        assert f'{PREFIX}ring_normal_batchs_total{{task="metrics_e2e"}} 1' in body
    finally:
        server.stop()
        spark.streams.removeListener(listener)


def test_sink_reconnect_counter(spark, tmp_path):
    """Replica rotation increments clickhouse_reconnect_total, scraped in
    text format — the reference's reconnect counter over the real JDBC
    failover path."""
    import os

    from clickhouse_sinker_nali_spark.streaming.sinks import JdbcClickHouseSink

    bad = f"jdbc:derby:{os.path.join(str(tmp_path), 'down-db')}"  # no create
    good = f"jdbc:derby:{os.path.join(str(tmp_path), 'up-db')};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(good)
    st = conn.createStatement()
    st.execute("CREATE TABLE RC (ID BIGINT)")
    st.close()
    conn.close()

    reg = SinkerMetricsRegistry()
    sink = JdbcClickHouseSink(
        urls=[[bad, good]],
        table="RC",
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver", "user": "APP"},
        metrics=reg,
        task_name="rc_task",
    )
    sink.write(spark.createDataFrame([(1,)], "ID BIGINT"), epoch_id=0)
    assert reg.get("clickhouse_reconnect_total", {"task": "rc_task"}) == 1
    assert f'{PREFIX}clickhouse_reconnect_total{{task="rc_task"}} 1' in reg.render()


def test_start_pipeline_observes_by_default(spark, tmp_path):
    """The production wiring: start_pipeline (observe on by default) feeds
    the reference-named counters without any caller opt-in."""
    import json as _json

    from clickhouse_sinker_nali_spark.streaming.pipeline import (
        TaskConfig,
        build_file_source,
        start_pipeline,
    )
    from clickhouse_sinker_nali_spark.streaming.sinks import ParquetSink

    src = tmp_path / "src"
    src.mkdir()
    lines = [_json.dumps({"id": i, "name": f"n{i}"}) for i in range(7)]
    lines.append("{broken json")
    (src / "b.jsonl").write_text("\n".join(lines) + "\n")

    reg = SinkerMetricsRegistry()
    listener = wire_listener(reg)
    spark.streams.addListener(listener)
    try:
        cfg = TaskConfig(
            name="observe_default", topic="t", table="t",
            dims=[{"name": "id", "type": "Int64"},
                  {"name": "name", "type": "String"}],
        )
        q = start_pipeline(
            spark, cfg, build_file_source(spark, str(src)),
            ParquetSink(path=str(tmp_path / "out")),
            str(tmp_path / "ckpt"), available_now=True,
        )
        q.awaitTermination(120)
        deadline = time.time() + 30
        while time.time() < deadline:
            if reg.get("consume_msgs_total", {"task": "observe_default"}) == 8:
                break
            time.sleep(0.2)
        assert reg.get("consume_msgs_total", {"task": "observe_default"}) == 8
        assert reg.get("parse_msgs_error_total", {"task": "observe_default"}) == 1
        assert reg.get("flush_msgs_total", {"task": "observe_default"}) == 7
    finally:
        spark.streams.removeListener(listener)


def test_label_values_are_escaped():
    reg = SinkerMetricsRegistry()
    reg.inc("consume_msgs_total", {"task": 'a"b\\c'}, 1)
    out = reg.render()
    assert 'task="a\\"b\\\\c"' in out


def test_csv_pipeline_not_flagged_as_parse_errors(spark, tmp_path):
    """Regression: the JSON error probe must not run on CSV tasks — every
    valid CSV row would read as a parse error."""
    from clickhouse_sinker_nali_spark.streaming.pipeline import (
        TaskConfig,
        build_file_source,
        start_pipeline,
    )
    from clickhouse_sinker_nali_spark.streaming.sinks import ParquetSink

    src = tmp_path / "src"
    src.mkdir()
    (src / "b.csv").write_text("\n".join(f"{i},n{i}" for i in range(5)) + "\n")

    reg = SinkerMetricsRegistry()
    listener = wire_listener(reg)
    spark.streams.addListener(listener)
    try:
        cfg = TaskConfig(
            name="csv_observe", topic="t", table="t", parser="csv",
            csv_format=["id", "name"],
            dims=[{"name": "id", "type": "Int64"},
                  {"name": "name", "type": "String"}],
        )
        q = start_pipeline(
            spark, cfg, build_file_source(spark, str(src)),
            ParquetSink(path=str(tmp_path / "out")),
            str(tmp_path / "ckpt"), available_now=True,
        )
        q.awaitTermination(120)
        deadline = time.time() + 30
        while time.time() < deadline:
            if reg.get("consume_msgs_total", {"task": "csv_observe"}) == 5:
                break
            time.sleep(0.2)
        assert reg.get("consume_msgs_total", {"task": "csv_observe"}) == 5
        assert reg.get("parse_msgs_error_total", {"task": "csv_observe"}) == 0
        assert reg.get("flush_msgs_total", {"task": "csv_observe"}) == 5
    finally:
        spark.streams.removeListener(listener)
