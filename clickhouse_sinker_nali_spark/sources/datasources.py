"""Python DataSource connectors (Spark 4 ``pyspark.sql.datasource`` API).

The §2.10 extension surface as a REAL pluggable connector, not just parser
hooks: ``spark.read.format("qqwry")`` scans the reference's qqwry.dat geo
database (ipHandle/pkg/qqwry/qqwry.go:63-149 lookups; here the file IS a
table) through Spark's data source protocol — schema declaration,
partition planning, per-partition record iteration — so the binary format
composes with every DataFrame operator, predicate and all, instead of
needing the offline converter first.

Partitioning: the qqwry index is a flat array of 7-byte entries, so the
planner splits the INDEX RANGE into ``_N_SPLITS`` even slices — each task
re-opens the file, seeks its slice, and walks only its records.  Record
payloads are shared across slices (mode-1/2 redirections can point
anywhere), so every task maps the whole file but READS only its index
stripe plus the payloads it references — the standard cheap-split shape
for index-prefixed binary formats.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from .qqwry import _u32, iter_qqwry

_N_SPLITS = 4

_SCHEMA = (
    "ip_start bigint, ip_end bigint, loc string, isp string"
)


class _IndexSlice(InputPartition):
    def __init__(self, path: str, lo: int, hi: int) -> None:
        self.path = path
        self.lo = lo      # first index offset (inclusive)
        self.hi = hi      # last index offset (exclusive)


class QQWryReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("qqwry reader requires a path")
        self.path = path

    def partitions(self):
        with open(self.path, "rb") as f:
            head = f.read(8)
        first, last = _u32(head, 0), _u32(head, 4)
        n = (last - first) // 7 + 1
        per = max(1, -(-n // _N_SPLITS))
        parts = []
        for i in range(0, n, per):
            lo = first + i * 7
            hi = min(first + (i + per) * 7, last + 7)
            parts.append(_IndexSlice(self.path, lo, hi))
        return parts

    def read(self, partition: _IndexSlice):
        with open(partition.path, "rb") as f:
            data = f.read()
        # iter_qqwry walks [first, last]; emulate a slice by fabricating a
        # header bounded to this partition's index stripe
        import struct

        bounded = struct.pack("<II", partition.lo, partition.hi - 7) + data[8:]
        # offsets in the index/payload are absolute, so splice the original
        # byte buffer back in after the fabricated header
        view = bytearray(data)
        view[0:8] = bounded[0:8]
        for ip_start, ip_end, loc, isp in iter_qqwry(bytes(view)):
            yield (ip_start, ip_end + 1, loc, isp)


class QQWryDataSource(DataSource):
    """``spark.read.format("qqwry").load("/path/qqwry.dat")``."""

    @classmethod
    def name(cls) -> str:
        return "qqwry"

    def schema(self) -> str | StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return QQWryReader(self.options)


def register(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(QQWryDataSource)
