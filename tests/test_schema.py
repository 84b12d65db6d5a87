"""Type-system tests: ClickHouse type strings -> internal -> Spark types.

Mirrors the reference's WhichType folding table
(reference model/value.go:100-169, SURVEY.md §1.2).
"""

import pytest
from pyspark.sql import types as T

from clickhouse_sinker_nali_spark.schema import (
    DYNAMIC_NEWKEY_CH_TYPE,
    ColumnSpec,
    InternalType,
    TableSchema,
    which_type,
)


@pytest.mark.parametrize(
    "ch,expected_internal,expected_nullable",
    [
        ("Int8", InternalType.INT, False),
        ("UInt64", InternalType.INT, False),
        ("Nullable(Int64)", InternalType.INT, True),
        ("Float32", InternalType.FLOAT, False),
        ("Float64", InternalType.FLOAT, False),
        ("Decimal32(3)", InternalType.DECIMAL, False),
        ("Decimal(18, 4)", InternalType.DECIMAL, False),
        ("String", InternalType.STRING, False),
        ("UUID", InternalType.STRING, False),
        ("FixedString(16)", InternalType.STRING, False),
        ("Enum8('a'=1,'b'=2)", InternalType.STRING, False),
        ("LowCardinality(String)", InternalType.STRING, False),
        ("LowCardinality(Nullable(String))", InternalType.STRING, True),
        ("Date", InternalType.DATETIME, False),
        ("DateTime", InternalType.DATETIME, False),
        ("DateTime64(3)", InternalType.DATETIME, False),
        ("Nullable(DateTime64(3))", InternalType.DATETIME, True),
        ("ElasticDateTime", InternalType.ELASTIC_DATETIME, False),
        ("Array(Int64)", InternalType.INT_ARRAY, False),
        ("Array(UInt8)", InternalType.INT_ARRAY, False),
        ("Array(Float64)", InternalType.FLOAT_ARRAY, False),
        ("Array(String)", InternalType.STRING_ARRAY, False),
        ("Array(DateTime64(3))", InternalType.DATETIME_ARRAY, False),
        ("Array(LowCardinality(String))", InternalType.STRING_ARRAY, False),
    ],
)
def test_which_type(ch, expected_internal, expected_nullable):
    it, nullable, _, _ = which_type(ch)
    assert it is expected_internal
    assert nullable is expected_nullable


def test_which_type_rejects_unknown():
    with pytest.raises(ValueError):
        which_type("Tuple(Int64, String)")


def test_decimal_precision_scale():
    spec = ColumnSpec(name="price", ch_type="Decimal32(3)")
    assert (spec.decimal_precision, spec.decimal_scale) == (9, 3)
    spec = ColumnSpec(name="price", ch_type="Decimal(20, 5)")
    assert (spec.decimal_precision, spec.decimal_scale) == (20, 5)


def test_struct_type_generation():
    ts = TableSchema.from_dims(
        [
            {"name": "time", "type": "DateTime"},
            {"name": "name", "type": "String"},
            {"name": "value", "type": "Float32"},
            {"name": "price", "type": "Decimal32(3)"},
            {"name": "tags", "type": "Array(String)"},
            {"name": "maybe", "type": "Nullable(Int64)"},
        ]
    )
    st = ts.struct_type
    assert st["time"].dataType == T.TimestampType()
    assert st["name"].dataType == T.StringType()
    assert st["value"].dataType == T.DoubleType()
    assert st["price"].dataType == T.DoubleType()
    assert st["tags"].dataType == T.ArrayType(T.StringType(), True)
    assert st["maybe"].nullable is True
    assert st["time"].nullable is False


def test_sourcename_mapping():
    spec = ColumnSpec(name="item_guid", ch_type="String", source_name="@item_guid")
    assert spec.source_name == "@item_guid"
    spec2 = ColumnSpec(name="x", ch_type="String")
    assert spec2.source_name == "x"


def test_auto_schema_from_catalog_skips_materialized_and_excluded():
    rows = [
        ("time", "DateTime", ""),
        ("mat", "String", "MATERIALIZED"),
        ("skipme", "String", ""),
        ("value", "Float64", "DEFAULT"),
    ]
    ts = TableSchema.from_catalog_rows(rows, exclude={"skipme"})
    assert ts.names() == ["time", "value"]


def test_dynamic_newkey_ch_types():
    # reference output/clickhouse.go:396-416
    assert DYNAMIC_NEWKEY_CH_TYPE[InternalType.INT] == "Nullable(Int64)"
    assert DYNAMIC_NEWKEY_CH_TYPE[InternalType.DATETIME] == "Nullable(DateTime64(3))"
    assert DYNAMIC_NEWKEY_CH_TYPE[InternalType.STRING_ARRAY] == "Array(String)"


def test_orc_sink_roundtrip_preserves_types(spark, tmp_path):
    """ORC write/read round-trip of a typed ingest output: schema and
    values must survive (the columnar-sink alternative to parquet)."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") * 0.5).alias("value"),
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("name"),
        F.array(F.lit("a"), F.col("id").cast("string")).alias("tags"),
        F.to_timestamp(F.lit("2024-03-01 10:00:00")).alias("ts"),
    )
    out = str(tmp_path / "orc_out")
    df.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    # nullability (incl. array containsNull) widens through a file
    # round-trip; names and value types must hold exactly
    assert back.schema.simpleString() == df.schema.simpleString()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
