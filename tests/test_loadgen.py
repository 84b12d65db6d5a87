"""Load-generator twins: the reference's perf-harness message shapes
(cmd/kafka_gen_log, cmd/kafka_gen_metric) through the full parse+coerce
pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_sinker_nali_spark.loadgen import (
    APACHE_LOG_DIMS,
    METRIC_DIMS,
    gen_apache_logs,
    gen_metrics,
)
from clickhouse_sinker_nali_spark.streaming.pipeline import TaskConfig, transform


def test_apache_logs_shape_and_size(spark):
    msgs = gen_apache_logs(spark, 2000)
    stats = msgs.select(
        F.count(F.lit(1)).alias("n"), F.avg(F.length("value")).alias("avg_len")
    ).collect()[0]
    assert stats.n == 2000
    # the reference's published average message size is 754 B — same regime
    assert 600 <= stats.avg_len <= 950
    # deterministic: same generator call → identical bytes
    a = [r.value for r in msgs.limit(5).collect()]
    b = [r.value for r in gen_apache_logs(spark, 2000).limit(5).collect()]
    assert a == b


def test_apache_logs_coerce_through_26_dim_schema(spark):
    cfg = TaskConfig(name="gl", topic="t", table="apache_access_log",
                     dims=APACHE_LOG_DIMS)
    typed = transform(gen_apache_logs(spark, 1000), cfg)
    assert typed.count() == 1000
    dt = dict(typed.dtypes)
    assert dt["collectiontime"] == "timestamp"  # @-prefixed sourcename
    assert dt["timestamp"] == "timestamp"       # DateTime64(3) ms precision
    assert dt["lineno"] == "bigint" and dt["requesttime"] == "double"
    got = typed.select("hostname", "response", "verb").limit(200).collect()
    assert all(r.hostname.startswith("vm1011") for r in got)
    assert {r.verb for r in got} <= {"GET", "POST", "HEAD"}
    # ms fraction survives the DateTime64(3) path
    frac = typed.select(
        F.sum((F.unix_micros("timestamp") % 1_000_000 != 0).cast("int")).alias("f")
    ).collect()[0].f
    assert frac > 0


def test_metrics_coerce_through_22_dim_schema(spark):
    cfg = TaskConfig(name="gm", topic="t", table="sensor_dt_result_online",
                     dims=METRIC_DIMS)
    typed = transform(gen_metrics(spark, 1000), cfg)
    assert typed.count() == 1000
    dt = dict(typed.dtypes)
    assert dt["time"] == "timestamp"
    # all CH int widths fold onto internal Int64 (reference model/value.go
    # 139-142 via SURVEY §1.2), so Int32/Int16 dims land as bigint
    assert dt["yhat_flag"] == "bigint" and dt["abnormal_type"] == "bigint"
    rows = typed.select("item_guid", "value", "anomaly").limit(200).collect()
    assert all(r.item_guid.startswith("bus") and "_ins" in r.item_guid for r in rows)
    assert all(0.0 <= r.value <= 99.0 and 0.0 <= r.anomaly < 1.0 for r in rows)
