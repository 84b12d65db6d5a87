"""Reference-format config files → engine objects.

Parses the reference's JSON config surface (reference
``config/config.go:50-200``; examples ``docker/test_*.json``) so a user of
the Go sinker can point this engine at their existing config:

- ``clickhouse``: cluster/hosts(replica groups)/port/db/credentials/retryTimes
- ``kafka``: brokers, version (version is a Go-client knob; ignored here),
  ``security`` / ``tls`` maps → Kafka source options
- ``task`` or ``tasks``: name, topic, consumerGroup, earliest, parser
  (json/fastjson/gjson/csv), tableName, dims / autoSchema / dynamicSchema,
  excludeColumns, csvFormat, delimiter, bufferSize, flushInterval,
  shardingKey/shardingStripe/shardingPolicy, timeUnit, prometheusSchema

Normalization mirrors ``Normallize()`` (reference config/config.go:192-263):
defaults, bufferSize→2^n roundup, flushInterval clamp — implemented in
``TaskConfig.__post_init__`` (streaming/pipeline.py).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .streaming.pipeline import TaskConfig


@dataclass
class ClickHouseConfig:
    hosts: list[list[str]] = field(default_factory=list)  # [shard][replica]
    port: int = 9000
    db: str = "default"
    username: str = "default"
    password: str = ""
    cluster: str = ""
    retry_times: int = 0
    secure: bool = False

    @property
    def jdbc_urls(self) -> list[list[str]]:
        """Per-shard replica JDBC URLs for streaming.sinks.JdbcClickHouseSink."""
        proto = "https" if self.secure else "http"
        # clickhouse-jdbc v2 URL scheme over the HTTP interface (public
        # ClickHouse JDBC docs); port 9000 is the native protocol's — the
        # JDBC driver speaks HTTP, conventionally 8123/8443
        http_port = 8443 if self.secure else 8123
        return [
            [
                f"jdbc:clickhouse:{proto}://{host}:{http_port}/{self.db}"
                for host in shard
            ]
            for shard in self.hosts
        ]


@dataclass
class KafkaConfig:
    brokers: str = ""
    security: dict[str, str] = field(default_factory=dict)
    tls: dict[str, object] = field(default_factory=dict)
    sasl: dict[str, object] = field(default_factory=dict)

    @property
    def source_options(self) -> dict[str, str]:
        """Translate the reference's security surfaces (java-style
        ``security`` map, sinker-native ``tls``/``sasl`` dicts — reference
        config/config.go:303-385) to Spark Kafka source options.  Spark's
        Kafka source is the java client, so JKS keystores pass through
        natively and no JKS→PEM conversion is needed here (security.py
        keeps the converter for PEM-only deployments)."""
        from .security import kafka_security_options

        return kafka_security_options(
            security=self.security, tls=self.tls, sasl=self.sasl
        )


@dataclass
class SinkerConfig:
    clickhouse: ClickHouseConfig
    kafka: KafkaConfig
    tasks: list[TaskConfig]
    log_level: str = "info"


def _parse_task(t: dict) -> TaskConfig:
    parser = t.get("parser", "fastjson")
    if parser == "json":  # reference aliases "json" to the fastjson parser
        parser = "fastjson"
    sharding_policy = ""
    if t.get("shardingKey"):
        stripe = int(t.get("shardingStripe", 0) or 0)
        sharding_policy = f"stripe,{stripe}" if stripe > 0 else "hash"
    return TaskConfig(
        name=t["name"],
        topic=t["topic"],
        table=t.get("tableName", t["name"]),
        parser=parser,
        dims=t.get("dims", []),
        csv_format=t.get("csvFormat", []),
        delimiter=t.get("delimiter", ","),
        earliest=bool(t.get("earliest", True)),
        flush_interval_s=int(t.get("flushInterval", 5) or 5),
        buffer_size=int(t.get("bufferSize", 1 << 18) or (1 << 18)),
        time_unit=float(t.get("timeUnit", 1.0) or 1.0),
        sharding_key=t.get("shardingKey", ""),
        sharding_policy=t.get("shardingPolicy", sharding_policy),
        exclude_columns=t.get("excludeColumns", []),
    )


def load_config(path_or_dict: str | dict) -> SinkerConfig:
    """Load a reference-format config file (or pre-parsed dict)."""
    if isinstance(path_or_dict, dict):
        raw = path_or_dict
    else:
        with open(path_or_dict) as f:
            raw = json.load(f)

    ch_raw = raw.get("clickhouse", {})
    ch = ClickHouseConfig(
        hosts=ch_raw.get("hosts", []),
        port=int(ch_raw.get("port", 9000) or 9000),
        db=ch_raw.get("db", "default"),
        username=ch_raw.get("username") or "default",
        password=ch_raw.get("password", ""),
        cluster=ch_raw.get("cluster", ""),
        retry_times=int(ch_raw.get("retryTimes", 0) or 0),
        secure=bool(ch_raw.get("secure", False)),
    )
    kf_raw = raw.get("kafka", {})
    kafka = KafkaConfig(
        brokers=kf_raw.get("brokers", ""),
        security=kf_raw.get("security", {}) or {},
        tls=kf_raw.get("tls", {}) or {},
        sasl=kf_raw.get("sasl", {}) or {},
    )
    task_dicts = raw.get("tasks") or ([raw["task"]] if raw.get("task") else [])
    tasks = [_parse_task(t) for t in task_dicts]
    for task in tasks:
        task.kafka_options = kafka.source_options
    return SinkerConfig(
        clickhouse=ch,
        kafka=kafka,
        tasks=tasks,
        log_level=raw.get("logLevel", "info"),
    )
