"""Load-generator twins of the reference's perf harnesses.

The reference ships two Kafka producers for throughput testing
(``cmd/kafka_gen_log/main.go`` — 26-column apache-access-log JSON, the
message shape behind every BASELINE.md number; ``cmd/kafka_gen_metric/
main.go`` — 22-column sensor-metric JSON for the Prometheus path).  These
builders produce the same shapes as DataFrames of JSON ``value`` strings,
generated DISTRIBUTED (``spark.range`` + column expressions — no driver
loop, no Python row funcs) and DETERMINISTIC (hash-derived picks instead
of ``rand.Intn``) so ingest benchmarks are reproducible run-to-run.

``APACHE_LOG_DIMS`` / ``METRIC_DIMS`` mirror the target-table DDL in the
generators' comments, so ``transform(gen_apache_logs(...), TaskConfig(
dims=APACHE_LOG_DIMS, ...))`` exercises the exact parse+coerce surface the
reference benchmarks measure — including the ``@``-prefixed source names
and DateTime64(3) timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# value pools from cmd/kafka_gen_log/main.go:68-93
_HOSTNAMES = [f"vm1011{i:02d}" for i in range(1, 11)]
_IPS = [f"192.168.101.1{i:02d}" for i in range(1, 11)]
_AGENT = (
    "Mozilla/5.0(Windows NT 6.1; Win64; x64)AppleWebKit/537.36"
    "(KHTML,like Gecko)Chrome/69.0.3497.100Safari/537.36"
)
_CLIENT_IPS = [f"192.168.1.{i}" for i in range(1, 6)]
_DEVICE_FAMILIES = ["Hawei", "Xiaomi", "OPPO", "Apple", "Other"]
_HTTP_VERSIONS = ["1.0", "1.1", "2.0", "3.0"]
_OS_FAMILIES = ["Android", "Mac OS X", "HMS"]
_OS_MAJORS = ["6", "7", "8", "9", "10"]
_OS_MINORS = ["0", "1", "2", "3"]
_RESPONSES = ["200", "301", "400", "404", "503"]
_UA_FAMILIES = ["Chrome", "Firefox", "AppleWebKit"]
_UA_MAJORS = ["75", "76", "77", "78", "79", "80", "81"]
_UA_MINORS = ["0", "1", "2", "3"]
_VERBS = ["GET", "POST", "HEAD"]

# value pools from cmd/kafka_gen_metric/main.go:60-66
_METRIC_NAMES = [f"metric{i:02d}" for i in range(10)]
_ALG_NAMES = ["ewma", "holt-winters", "prophet"]

APACHE_LOG_DIMS = [
    {"name": "collectiontime", "type": "DateTime", "sourcename": "@collectiontime"},
    {"name": "hostname", "type": "LowCardinality(String)", "sourcename": "@hostname"},
    {"name": "ip", "type": "LowCardinality(String)", "sourcename": "@ip"},
    {"name": "path", "type": "String", "sourcename": "@path"},
    {"name": "lineno", "type": "Int64", "sourcename": "@lineno"},
    {"name": "message", "type": "String", "sourcename": "@message"},
    {"name": "agent", "type": "String"},
    {"name": "auth", "type": "String"},
    {"name": "bytes", "type": "Int64"},
    {"name": "clientIp", "type": "String"},
    {"name": "device_family", "type": "LowCardinality(String)"},
    {"name": "httpversion", "type": "LowCardinality(String)"},
    {"name": "ident", "type": "String"},
    {"name": "os_family", "type": "LowCardinality(String)"},
    {"name": "os_major", "type": "LowCardinality(String)"},
    {"name": "os_minor", "type": "LowCardinality(String)"},
    {"name": "referrer", "type": "String"},
    {"name": "request", "type": "String"},
    {"name": "requesttime", "type": "Float64"},
    {"name": "response", "type": "LowCardinality(String)"},
    {"name": "timestamp", "type": "DateTime64(3)"},
    {"name": "userAgent_family", "type": "LowCardinality(String)"},
    {"name": "userAgent_major", "type": "LowCardinality(String)"},
    {"name": "userAgent_minor", "type": "LowCardinality(String)"},
    {"name": "verb", "type": "LowCardinality(String)"},
    {"name": "xforwardfor", "type": "LowCardinality(String)"},
]

METRIC_DIMS = [
    {"name": "time", "type": "DateTime", "sourcename": "@time"},
    {"name": "item_guid", "type": "String", "sourcename": "@item_guid"},
    {"name": "metric_name", "type": "LowCardinality(String)", "sourcename": "@metric_name"},
    {"name": "alg_name", "type": "LowCardinality(String)", "sourcename": "@alg_name"},
    {"name": "value", "type": "Float64"},
    {"name": "upper", "type": "Float64"},
    {"name": "lower", "type": "Float64"},
    {"name": "yhat_upper", "type": "Float64"},
    {"name": "yhat_lower", "type": "Float64"},
    {"name": "yhat_flag", "type": "Int32"},
    {"name": "total_anomaly", "type": "Int64"},
    {"name": "anomaly", "type": "Float64"},
    {"name": "abnormal_type", "type": "Int16"},
    {"name": "abnormality", "type": "Int16"},
    {"name": "container_id", "type": "Int64"},
    {"name": "hard_upper", "type": "Float64"},
    {"name": "hard_lower", "type": "Float64"},
    {"name": "hard_anomaly", "type": "Int64"},
    {"name": "shift_tag", "type": "Int32"},
    {"name": "season_tag", "type": "Int32"},
    {"name": "spike_tag", "type": "Int32"},
    {"name": "is_missing", "type": "Int32"},
]


def _pick(values: list[str], salt: str) -> Column:
    """Deterministic stand-in for the reference's randElement: index the
    literal pool by a hash of (salt, id) — pure codegen, stable across
    runs/partitionings."""
    arr = F.array(*[F.lit(v) for v in values])
    idx = F.pmod(F.xxhash64(F.lit(salt), F.col("id")), F.lit(len(values)))
    return F.element_at(arr, (idx + 1).cast("int"))


def gen_apache_logs(spark: SparkSession, n: int) -> DataFrame:
    """``n`` apache-access-log JSON messages (~750 B each, matching the
    reference's published avg of 754 B) as a ``value: string`` DataFrame."""
    ts = F.timestamp_seconds(F.lit(1709251200) + F.col("id") % 86400)
    ts_ms = F.timestamp_millis(
        F.lit(1709251200_000) + (F.col("id") % 86400) * 1000 + F.col("id") % 1000
    )
    path = F.concat(F.lit("/var/log/app/access_"), (F.col("id") % 50).cast("string"), F.lit(".log"))
    request = F.concat(
        F.lit("/api/v1/resource/"), (F.col("id") % 1000).cast("string"),
        F.lit("?page="), (F.col("id") % 17).cast("string"),
    )
    message = F.concat(
        _pick(_CLIENT_IPS, "mip"), F.lit(" - - [01/Mar/2024] \""),
        _pick(_VERBS, "mverb"), F.lit(" "), request, F.lit(" HTTP/"),
        _pick(_HTTP_VERSIONS, "mhv"), F.lit("\" "), _pick(_RESPONSES, "mresp"),
        F.lit(" "), (F.col("id") % 90000 + 200).cast("string"),
        F.lit(" \"-\" \""), F.lit(_AGENT), F.lit("\""),
    )
    return spark.range(n).select(
        F.to_json(
            F.struct(
                F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("@collectiontime"),
                _pick(_HOSTNAMES, "host").alias("@hostname"),
                _pick(_IPS, "ip").alias("@ip"),
                path.alias("@path"),
                (F.col("id") % 100000).alias("@lineno"),
                message.alias("@message"),
                F.lit(_AGENT).alias("agent"),
                F.lit("RFC1413身份").alias("auth"),
                (F.col("id") % 90000 + 200).alias("bytes"),
                _pick(_CLIENT_IPS, "cip").alias("clientIp"),
                _pick(_DEVICE_FAMILIES, "dev").alias("device_family"),
                _pick(_HTTP_VERSIONS, "hv").alias("httpversion"),
                F.lit("-").alias("ident"),
                _pick(_OS_FAMILIES, "osf").alias("os_family"),
                _pick(_OS_MAJORS, "osmj").alias("os_major"),
                _pick(_OS_MINORS, "osmn").alias("os_minor"),
                F.lit("-").alias("referrer"),
                request.alias("request"),
                (F.col("id") % 5000).alias("requesttime"),
                _pick(_RESPONSES, "resp").alias("response"),
                F.date_format(ts_ms, "yyyy-MM-dd HH:mm:ss.SSS").alias("timestamp"),
                _pick(_UA_FAMILIES, "uaf").alias("userAgent_family"),
                _pick(_UA_MAJORS, "uamj").alias("userAgent_major"),
                _pick(_UA_MINORS, "uamn").alias("userAgent_minor"),
                _pick(_VERBS, "verb").alias("verb"),
                _pick(_CLIENT_IPS, "xff").alias("xforwardfor"),
            )
        ).alias("value")
    )


def gen_metrics(
    spark: SparkSession, n: int, businesses: int = 10, instances: int = 10
) -> DataFrame:
    """``n`` sensor-metric JSON messages in the kafka_gen_metric shape
    (item_guid = busNNN_insNNN grid, bounded tag ints)."""
    bus = (F.col("id") % (businesses * instances)) / instances
    ins = F.col("id") % instances
    guid = F.concat(
        F.lit("bus"), F.lpad(bus.cast("int").cast("string"), 3, "0"),
        F.lit("_ins"), F.lpad(ins.cast("string"), 3, "0"),
    )
    ts = F.timestamp_seconds(F.lit(1709251200) + F.col("id"))

    def h(salt: str, mod: int) -> Column:
        return F.pmod(F.xxhash64(F.lit(salt), F.col("id")), F.lit(mod))

    return spark.range(n).select(
        F.to_json(
            F.struct(
                F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("@time"),
                guid.alias("@item_guid"),
                _pick(_METRIC_NAMES, "mn").alias("@metric_name"),
                _pick(_ALG_NAMES, "alg").alias("@alg_name"),
                h("v", 100).cast("double").alias("value"),
                F.lit(100.0).alias("upper"),
                F.lit(60.0).alias("lower"),
                F.lit(100.0).alias("yhat_upper"),
                F.lit(60.0).alias("yhat_lower"),
                h("yf", 65535).cast("int").alias("yhat_flag"),
                h("ta", 65535).alias("total_anomaly"),
                (h("an", 100).cast("double") / 100.0).alias("anomaly"),
                h("at", 1000).cast("int").alias("abnormal_type"),
                h("ab", 1000).cast("int").alias("abnormality"),
                h("ci", 65535).alias("container_id"),
                F.lit(100.0).alias("hard_upper"),
                F.lit(60.0).alias("hard_lower"),
                h("ha", 65535).alias("hard_anomaly"),
                h("st", 65535).cast("int").alias("shift_tag"),
                h("se", 65535).cast("int").alias("season_tag"),
                h("sp", 65535).cast("int").alias("spike_tag"),
                F.lit(0).alias("is_missing"),
            )
        ).alias("value")
    )
