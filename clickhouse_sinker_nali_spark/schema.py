"""ClickHouse type-string -> Spark type mapping and schema modes.

Re-expresses the reference's 9-value internal type enum and its ClickHouse
type folding (reference model/value.go:24-35,100-169) on Spark's type
system, per SURVEY.md §1.2:

  UInt8..64 / Int8..64            -> LongType   (reference truncates to int64 too)
  Float32/64, Decimal*            -> DoubleType (native DecimalType optional)
  String/UUID/FixedString/Enum/
    LowCardinality(String)        -> StringType
  Date/DateTime/DateTime64        -> TimestampType (UTC)
  ElasticDateTime                 -> LongType (epoch seconds)
  Nullable(T)                     -> same type, nullable=True
  Array(T)                        -> ArrayType(T, containsNull=False)

Three schema modes (reference config/config.go:121-142):
  fixed   -- explicit [{name,type,sourcename}] dims
  auto    -- discover from the target table's column catalog
  dynamic -- fixed/auto + detect new JSON keys at runtime (see dynamic.py)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T


class InternalType(Enum):
    """The engine's internal logical types (reference model/value.go:24-35)."""

    UNKNOWN = "Unknown"
    INT = "Int"
    FLOAT = "Float"
    DECIMAL = "Decimal"
    STRING = "String"
    DATETIME = "DateTime"
    ELASTIC_DATETIME = "ElasticDateTime"
    INT_ARRAY = "IntArray"
    FLOAT_ARRAY = "FloatArray"
    STRING_ARRAY = "StringArray"
    DATETIME_ARRAY = "DateTimeArray"


_INT_TYPES = {
    "UInt8", "UInt16", "UInt32", "UInt64",
    "Int8", "Int16", "Int32", "Int64",
}
_FLOAT_TYPES = {"Float32", "Float64"}
_STRING_TYPES = {"String", "UUID", "FixedString", "IPv4", "IPv6"}
_DATETIME_TYPES = {"Date", "Date32", "DateTime", "DateTime64"}

# Integer clamp borders for overflow coercion (reference clamps at the
# nearest border of the declared CH type; docs/dev/introduction.md:44).
INT_BORDERS: dict[str, tuple[int, int]] = {
    "Int8": (-(2**7), 2**7 - 1),
    "Int16": (-(2**15), 2**15 - 1),
    "Int32": (-(2**31), 2**31 - 1),
    "Int64": (-(2**63), 2**63 - 1),
    "UInt8": (0, 2**8 - 1),
    "UInt16": (0, 2**16 - 1),
    "UInt32": (0, 2**32 - 1),
    # UInt64 values beyond int64 max wrap in the reference (Go int64 cast);
    # we clamp to int64 max which is the documented "nearest border".
    "UInt64": (0, 2**63 - 1),
}


@dataclass
class ColumnSpec:
    """Target column <-> source field binding.

    Mirrors the reference's ColumnWithType {Name, Type, Nullable, SourceName}
    (reference model/metric.go:41-46).
    """

    name: str
    ch_type: str  # raw ClickHouse type string, e.g. "Nullable(Int64)"
    source_name: str = ""
    # filled by parse:
    internal: InternalType = InternalType.UNKNOWN
    nullable: bool = False
    base_type: str = ""  # CH type with Nullable/LowCardinality stripped
    decimal_precision: int = 0
    decimal_scale: int = 0

    def __post_init__(self) -> None:
        if not self.source_name:
            self.source_name = self.name
        self.internal, self.nullable, self.base_type, ps = which_type(self.ch_type)
        if ps is not None:
            self.decimal_precision, self.decimal_scale = ps

    @property
    def spark_type(self) -> T.DataType:
        return internal_to_spark(self.internal)

    @property
    def struct_field(self) -> T.StructField:
        return T.StructField(self.name, self.spark_type, self.nullable)


_NULLABLE_RE = re.compile(r"^Nullable\((.*)\)$")
_LOWCARD_RE = re.compile(r"^LowCardinality\((.*)\)$")
_ARRAY_RE = re.compile(r"^Array\((.*)\)$")
_DECIMAL_RE = re.compile(r"^Decimal(32|64|128|256)?\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)$")
_ENUM_RE = re.compile(r"^Enum(8|16)?\s*\(")
_DATETIME64_RE = re.compile(r"^DateTime64\s*\(")
_DATETIME_TZ_RE = re.compile(r"^DateTime\s*\(")
_FIXEDSTRING_RE = re.compile(r"^FixedString\s*\(")

# Decimal sizes imply max precision (public ClickHouse docs).
_DECIMAL_SIZE_PRECISION = {"32": 9, "64": 18, "128": 38, "256": 76}


def which_type(
    ch_type: str,
) -> tuple[InternalType, bool, str, tuple[int, int] | None]:
    """Fold a ClickHouse type string onto the internal type enum.

    Returns (internal_type, nullable, stripped_base_type, (prec, scale)|None).
    Mirrors the semantics of the reference's WhichType
    (model/value.go:100-134) without translating its code: unwrap
    Nullable()/LowCardinality(), classify the base, recurse into Array().
    """
    s = ch_type.strip()
    nullable = False
    m = _NULLABLE_RE.match(s)
    if m:
        nullable = True
        s = m.group(1).strip()
    m = _LOWCARD_RE.match(s)
    if m:  # LowCardinality is a CH storage hint, stripped by the reference
        s = m.group(1).strip()
        m2 = _NULLABLE_RE.match(s)
        if m2:
            nullable = True
            s = m2.group(1).strip()

    m = _ARRAY_RE.match(s)
    if m:
        elem, _, elem_base, _ = which_type(m.group(1))
        arr = {
            InternalType.INT: InternalType.INT_ARRAY,
            InternalType.FLOAT: InternalType.FLOAT_ARRAY,
            InternalType.DECIMAL: InternalType.FLOAT_ARRAY,
            InternalType.STRING: InternalType.STRING_ARRAY,
            InternalType.DATETIME: InternalType.DATETIME_ARRAY,
        }.get(elem)
        if arr is None:
            raise ValueError(f"unsupported ClickHouse array element type: {ch_type}")
        return arr, nullable, s, None

    if s in _INT_TYPES or s.startswith("Bool"):
        return InternalType.INT, nullable, s, None
    if s in _FLOAT_TYPES:
        return InternalType.FLOAT, nullable, s, None
    m = _DECIMAL_RE.match(s)
    if m:
        size, a, b = m.group(1), int(m.group(2)), m.group(3)
        if size:  # DecimalNN(scale)
            prec, scale = _DECIMAL_SIZE_PRECISION[size], a
        else:  # Decimal(p, s)
            prec, scale = a, int(b or 0)
        return InternalType.DECIMAL, nullable, s, (prec, scale)
    if (
        s in _STRING_TYPES
        or _FIXEDSTRING_RE.match(s)
        or _ENUM_RE.match(s)
    ):
        return InternalType.STRING, nullable, s, None
    if s == "ElasticDateTime":
        return InternalType.ELASTIC_DATETIME, nullable, s, None
    if s in _DATETIME_TYPES or _DATETIME64_RE.match(s) or _DATETIME_TZ_RE.match(s):
        return InternalType.DATETIME, nullable, s, None
    raise ValueError(f"unsupported ClickHouse type: {ch_type!r}")


def internal_to_spark(it: InternalType) -> T.DataType:
    """Internal logical type -> Spark physical type (SURVEY.md §1.2 table)."""
    mapping: dict[InternalType, T.DataType] = {
        InternalType.INT: T.LongType(),
        InternalType.FLOAT: T.DoubleType(),
        InternalType.DECIMAL: T.DoubleType(),  # bug-compatible default; see ColumnSpec
        InternalType.STRING: T.StringType(),
        InternalType.DATETIME: T.TimestampType(),
        InternalType.ELASTIC_DATETIME: T.LongType(),
        # Array elements are never null in the engine's model (nulls coerce
        # to element defaults), but the physical Spark type keeps
        # containsNull=True: Catalyst forbids casting a nullable-element
        # array to a non-null-element one, and the coercion layer already
        # guarantees non-null elements by construction.
        InternalType.INT_ARRAY: T.ArrayType(T.LongType(), containsNull=True),
        InternalType.FLOAT_ARRAY: T.ArrayType(T.DoubleType(), containsNull=True),
        InternalType.STRING_ARRAY: T.ArrayType(T.StringType(), containsNull=True),
        InternalType.DATETIME_ARRAY: T.ArrayType(T.TimestampType(), containsNull=True),
        InternalType.UNKNOWN: T.StringType(),
    }
    return mapping[it]


@dataclass
class TableSchema:
    """An ordered set of ColumnSpecs = the engine's schema IR."""

    columns: list[ColumnSpec] = field(default_factory=list)

    @classmethod
    def from_dims(cls, dims: list[dict]) -> "TableSchema":
        """Fixed-schema mode: dims = [{"name","type","sourcename"?}, ...]."""
        return cls(
            columns=[
                ColumnSpec(
                    name=d["name"],
                    ch_type=d["type"],
                    source_name=d.get("sourcename", ""),
                )
                for d in dims
            ]
        )

    @classmethod
    def from_catalog_rows(
        cls, rows: list[tuple[str, str, str]], exclude: set[str] | None = None
    ) -> "TableSchema":
        """Auto-schema mode: rows of (name, type, default_kind) as returned by
        ClickHouse ``system.columns``; MATERIALIZED columns and excluded names
        are skipped (reference output/clickhouse_util.go:95-121).
        """
        exclude = exclude or set()
        cols = []
        for name, ch_type, default_kind in rows:
            if name in exclude or default_kind == "MATERIALIZED":
                continue
            cols.append(ColumnSpec(name=name, ch_type=ch_type))
        return cls(columns=cols)

    @property
    def struct_type(self) -> T.StructType:
        return T.StructType([c.struct_field for c in self.columns])

    def __iter__(self):
        return iter(self.columns)

    def names(self) -> list[str]:
        return [c.name for c in self.columns]


# Dynamic-schema new-key -> ClickHouse type strings
# (reference output/clickhouse.go:396-416).
DYNAMIC_NEWKEY_CH_TYPE: dict[InternalType, str] = {
    InternalType.INT: "Nullable(Int64)",
    InternalType.FLOAT: "Nullable(Float64)",
    InternalType.STRING: "Nullable(String)",
    InternalType.DATETIME: "Nullable(DateTime64(3))",
    InternalType.INT_ARRAY: "Array(Int64)",
    InternalType.FLOAT_ARRAY: "Array(Float64)",
    InternalType.STRING_ARRAY: "Array(String)",
    InternalType.DATETIME_ARRAY: "Array(DateTime64(3))",
}
