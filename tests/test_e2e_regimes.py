"""The reference's full E2E gate: 100k messages in 5 regimes through all
three schema modes (go.test.sh:26-69, docker/test_{fixed,auto,dynamic}_schema.json).

Regimes (exact go.test.sh shapes):
  1. rows 1..10000:      time/name/value/price
  2. rows 10001..30000:  + newkey01 (int)
  3. rows 30001..50000:  + newkey02 (float) newkey03 (string)
                           newkey04 (datetime) newkey05 (object)
  4. rows 50001..70000:  + newkey06..newkey10 (int/float/string/datetime/object arrays)
  5. rows 70001..100000: base fields again

Assertions mirror the script: count()==100000 per mode, and for dynamic
mode the exact widened schema
``newkey01 Nullable(Int64) .. newkey10 Array(String)``.

No Kafka broker exists in this container; the file source twin carries the
identical parse→coerce→shard→sink pipeline (see tests/test_streaming.py).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from clickhouse_sinker_nali_spark.schema import TableSchema
from clickhouse_sinker_nali_spark.sources import schema_from_catalog
from clickhouse_sinker_nali_spark.streaming.dynamic import (
    DynamicSchemaController,
    NewKeyDetector,
    run_with_schema_evolution,
)
from clickhouse_sinker_nali_spark.streaming.pipeline import (
    TaskConfig,
    build_file_source,
    start_pipeline,
)
from clickhouse_sinker_nali_spark.streaming.sinks import ParquetSink

N = 100_000
NOW = "2024-03-05 10:11:12.123456789+00:00"  # date --rfc-3339=ns shape

DIMS = [
    {"name": "time", "type": "DateTime"},
    {"name": "name", "type": "String"},
    {"name": "value", "type": "Float64"},
    {"name": "price", "type": "Float64"},  # Decimal32(3) folds to Float (§1.2)
]

EXPECTED_DYNAMIC_SCHEMA = [
    ("newkey01", "Nullable(Int64)"),
    ("newkey02", "Nullable(Float64)"),
    ("newkey03", "Nullable(String)"),
    ("newkey04", "Nullable(DateTime64(3))"),
    ("newkey05", "Nullable(String)"),
    ("newkey06", "Array(Int64)"),
    ("newkey07", "Array(Float64)"),
    ("newkey08", "Array(String)"),
    ("newkey09", "Array(DateTime64(3))"),
    ("newkey10", "Array(String)"),
]


def _gen_regimes(src: str) -> None:
    """One file per regime so maxFilesPerTrigger=1 gives one micro-batch
    per regime — the file-source twin of kafka-console-producer's ordered
    stream."""
    os.makedirs(src, exist_ok=True)
    regimes: list[tuple[str, range]] = [
        ("r1", range(1, 10_001)),
        ("r2", range(10_001, 30_001)),
        ("r3", range(30_001, 50_001)),
        ("r4", range(50_001, 70_001)),
        ("r5", range(70_001, 100_001)),
    ]
    for tag, rng in regimes:
        with open(os.path.join(src, f"{tag}.json"), "w") as f:
            for i in rng:
                msg: dict = {"time": NOW, "name": f"name{i}", "value": i}
                if tag == "r1":
                    msg["price"] = round(i / 1000, 3)
                elif tag == "r2":
                    msg["newkey01"] = i
                elif tag == "r3":
                    msg["newkey02"] = i + 0.123
                    msg["newkey03"] = f"name{i}"
                    msg["newkey04"] = NOW
                    msg["newkey05"] = {"k1": 1, "k2": 2}
                elif tag == "r4":
                    msg["newkey06"] = [i]
                    msg["newkey07"] = [i + 0.123]
                    msg["newkey08"] = [f"name{i}"]
                    msg["newkey09"] = [NOW]
                    msg["newkey10"] = [{"k1": 1, "k2": 2}, {"k3": 3, "k4": 4}]
                f.write(json.dumps(msg) + "\n")


@pytest.fixture(scope="module")
def regime_src(tmp_path_factory):
    src = str(tmp_path_factory.mktemp("regimes"))
    _gen_regimes(src)
    return src


@pytest.mark.slow
def test_fixed_schema_mode_counts_100k(spark, regime_src, tmp_path):
    cfg = TaskConfig(name="test_fixed_schema", topic="file", table="test_fixed_schema", dims=DIMS)
    sink = ParquetSink(path=str(tmp_path / "out"), shards=4, sharding_policy="hash", sharding_key="name")
    q = start_pipeline(
        spark, cfg, build_file_source(spark, regime_src), sink,
        str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == N
    # fixed mode ignores unknown keys (no newkey columns); source metadata
    # (topic/partition/offset) rides along for the __kafka* virtual dims
    assert {"time", "name", "value", "price", "__shard"} <= set(out.columns)
    assert not any(c.startswith("newkey") for c in out.columns)
    assert out.filter(F.col("price").isNull()).count() == 0
    # regimes 2-5 have no price: exactly 90k defaulted rows
    assert out.filter(F.col("price") == 0.0).count() == N - 10_000


@pytest.mark.slow
def test_auto_schema_mode_counts_100k(spark, regime_src, tmp_path):
    # auto mode discovers dims from the target table's column catalog
    # (reference SELECT ... FROM system.columns, output/clickhouse_util.go:95-121);
    # stand-in catalog rows carry the same (name, type, default_kind) shape,
    # including the excluded MATERIALIZED day column from the test config
    catalog_rows = [
        ("time", "DateTime", ""),
        ("name", "String", ""),
        ("value", "Float64", ""),
        ("price", "Decimal32(3)", ""),
        ("day", "Date", "MATERIALIZED"),
    ]
    schema = schema_from_catalog(catalog_rows, exclude={"day"})
    dims = [
        {"name": c.name, "type": c.ch_type, "sourcename": c.source_name}
        for c in schema.columns
    ]
    cfg = TaskConfig(name="test_auto_schema", topic="file", table="test_auto_schema", dims=dims)
    sink = ParquetSink(path=str(tmp_path / "out"), shards=1)
    q = start_pipeline(
        spark, cfg, build_file_source(spark, regime_src), sink,
        str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == N
    assert "day" not in out.columns


@pytest.mark.slow
def test_dynamic_schema_mode_counts_100k_and_widens_exactly(spark, regime_src, tmp_path):
    cfg = TaskConfig(name="test_dynamic_schema", topic="file", table="test_dynamic_schema", dims=list(DIMS))
    schema = TableSchema.from_dims(DIMS)
    executed_ddl: list[str] = []
    controller = DynamicSchemaController(
        schema=schema,
        detector=NewKeyDetector(known=set(schema.names())),
        db="default",
        table="test_dynamic_schema",
        on_ddl=executed_ddl.extend,
    )
    sink = ParquetSink(path=str(tmp_path / "out"), shards=1)
    restarts = run_with_schema_evolution(
        spark,
        cfg,
        lambda: build_file_source(spark, regime_src, max_files_per_trigger=1),
        sink,
        str(tmp_path / "ckpt"),
        controller,
    )
    # regimes 2, 3, 4 each surface new keys → three quiesce/ALTER/restart cycles
    assert restarts == 3

    out = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "out"))
    assert out.count() == N

    # the exact DESC the reference asserts (go.test.sh:66)
    widened = [
        (c.name, c.ch_type) for c in controller.schema.columns
        if c.name.startswith("newkey")
    ]
    assert sorted(widened) == EXPECTED_DYNAMIC_SCHEMA

    # every newkey got its ALTER ... ADD COLUMN IF NOT EXISTS, in the
    # byte-golden reference format (r5 chdialect delegation): db.table
    # BARE, only the column backtick-quoted — so the key is the first
    # backticked token, and the double space from the empty ON CLUSTER
    # slot is present (output/clickhouse.go:369-434)
    altered = {
        stmt.split("`")[1]: stmt.rsplit("` ", 1)[1]
        for stmt in executed_ddl
        if "ADD COLUMN" in stmt
    }
    assert altered == dict(EXPECTED_DYNAMIC_SCHEMA)
    assert all(
        "  ADD COLUMN IF NOT EXISTS" in stmt
        for stmt in executed_ddl
        if "ADD COLUMN" in stmt
    )

    # spot-check the widened data really flowed: regime-2 rows carry their
    # int key, regime-4 rows their arrays, base regimes NULL/empty
    assert out.filter(F.col("newkey01").isNotNull()).count() == 20_000
    assert out.filter(F.size("newkey06") > 0).count() == 20_000
    assert out.filter(F.col("newkey03").isNotNull()).count() == 20_000
