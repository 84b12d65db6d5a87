"""Config-file parity + catalog/source tests."""

from __future__ import annotations

import json

import pytest

from clickhouse_sinker_nali_spark.config import load_config
from clickhouse_sinker_nali_spark.schema import InternalType
from clickhouse_sinker_nali_spark.sources import schema_from_catalog


def test_reference_fixed_schema_config_roundtrip(tmp_path):
    # the reference's docker/test_fixed_schema.json shape, verbatim format
    cfg_json = {
        "clickhouse": {
            "hosts": [["127.0.0.1", "127.0.0.2"], ["10.0.0.1"]],
            "port": 9000,
            "db": "default",
            "username": "",
            "password": "",
            "retryTimes": 0,
        },
        "kafka": {"brokers": "127.0.0.1:9093", "version": "2.5.0"},
        "task": {
            "name": "test_fixed_schema",
            "topic": "topic1",
            "consumerGroup": "test_fixed_schema",
            "earliest": True,
            "parser": "json",
            "tableName": "test_fixed_schema",
            "dims": [
                {"name": "time", "type": "DateTime"},
                {"name": "name", "type": "String"},
                {"name": "value", "type": "Float32"},
            ],
            "bufferSize": 50000,
        },
        "logLevel": "debug",
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg_json))
    cfg = load_config(str(p))

    assert len(cfg.tasks) == 1
    t = cfg.tasks[0]
    assert t.name == "test_fixed_schema"
    assert t.parser == "fastjson"  # "json" aliases to fastjson
    assert t.earliest is True
    # bufferSize 50000 → rounded up to 2^16 (reference Normallize rule)
    assert t.buffer_size == 65536
    assert [c.name for c in t.schema] == ["time", "name", "value"]
    assert t.schema.columns[2].internal is InternalType.FLOAT

    # per-shard replica JDBC urls
    urls = cfg.clickhouse.jdbc_urls
    assert len(urls) == 2 and len(urls[0]) == 2
    assert urls[0][0] == "jdbc:clickhouse:http://127.0.0.1:8123/default"


def test_config_sharding_and_security():
    cfg = load_config(
        {
            "clickhouse": {"hosts": [["h1"]], "db": "d"},
            "kafka": {
                "brokers": "b:9092",
                "security": {
                    "security.protocol": "SASL_SSL",
                    "sasl.mechanism": "SCRAM-SHA-256",
                },
            },
            "tasks": [
                {
                    "name": "t1",
                    "topic": "x",
                    "tableName": "tbl",
                    "shardingKey": "user_id",
                    "shardingStripe": 100,
                    "flushInterval": 9999,
                },
                {"name": "t2", "topic": "y", "shardingKey": "k"},
            ],
        }
    )
    t1, t2 = cfg.tasks
    assert t1.sharding_policy == "stripe,100"
    assert t2.sharding_policy == "hash"
    assert t1.flush_interval_s == 600  # clamped to the reference max
    assert t1.kafka_options["kafka.security.protocol"] == "SASL_SSL"
    assert t1.kafka_options["kafka.sasl.mechanism"] == "SCRAM-SHA-256"


def test_schema_from_catalog_excludes_materialized():
    rows = [
        ("time", "DateTime", ""),
        ("name", "String", ""),
        ("day", "Date", "MATERIALIZED"),
        ("value", "Nullable(Float64)", ""),
        ("secret", "String", ""),
    ]
    schema = schema_from_catalog(rows, exclude={"secret"})
    assert schema.names() == ["time", "name", "value"]
    assert schema.columns[2].nullable is True


def test_empty_tasks_config():
    cfg = load_config({"clickhouse": {"hosts": [["h"]]}, "kafka": {"brokers": "b"}})
    assert cfg.tasks == []
