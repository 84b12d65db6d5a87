"""Row enrichment: GeoIP range-lookup join + protocol:port service map.

Re-expresses the reference's two broadcast lookup joins (SURVEY.md §2.3):

- **J1 GeoIP**: the reference binary-searches sorted IP intervals in local
  geo DBs (qqwry/GeoLite2/ipdb — reference ``ipHandle/db/db.go:46-104``) per
  row, with a memoized result cache.  Spark-first design: load the geo DB
  *once* into an interval DataFrame ``(ip_start, ip_end, loc, isp)`` and
  broadcast-range-join it — the ~1M-interval table is ~50 MB, comfortably
  broadcastable to 1000 executors, and the probe stays JVM-side (no Python,
  no per-row cache needed because the join IS the lookup).
- **J2 serviceMap**: ``proto:port → service`` over a static map (reference
  inlines ~11.5k entries at ``input/kafka_sarama.go:57-11544``); here a
  broadcast map literal / tiny dim join.
- **F2 class normalization** (reference ``input/kafka_sarama.go:11643-11668``):
  ``"Unknown/Unknown"`` → serviceMap lookup by src then dst port;
  ``"A/B"`` with A≠B → keep **B** (the reference's actual, quirky behavior —
  SURVEY.md §4 'known defects'; it keeps ClassList[1], not [0]).
- **F1/F3 string rules**: the qqwry location strings are GBK with quirks
  ("同一内部网" → "局域网", default "未知"); applied as column expressions.

The real binary geo databases are not in this container, so
``build_geo_ranges`` generates a deterministic synthetic interval table of
the same shape; ``load_qqwry_ranges`` documents the production path.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints (PEP 563)
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# Deterministic synthetic geo DB: 64 contiguous /18-ish blocks of 16384
# addresses starting at 10.0.0.0 (167772160).  Same constants are inlined in
# the DuckDB oracle SQL (operators/ingest.py).
GEO_BASE = 167772160  # 10.0.0.0
GEO_BLOCK = 16384
GEO_BLOCKS = 64
GEO_LOCS = ["北京", "上海", "广东", "浙江", "江苏", "四川", "湖北", "局域网"]
GEO_ISPS = ["电信", "联通", "移动"]
GEO_UNKNOWN = "未知"  # reference default for unmatched IPs (F1)

# Full proto:port → service map, extracted once from the reference's inlined
# Go literal (input/kafka_sarama.go:57-11543, 11,485 entries) into a packaged
# TSV data file.  Loaded lazily; at this size the Spark-side lookup is a
# broadcast dim JOIN, not a create_map literal (23k literal expressions would
# bloat analysis/codegen for zero gain).
SERVICE_MAP_TSV = os.path.join(os.path.dirname(__file__), "data", "service_map.tsv")


@lru_cache(maxsize=1)
def load_service_map() -> dict[str, str]:
    """proto:port → service dict from the packaged TSV (11,485 entries)."""
    out: dict[str, str] = {}
    with open(SERVICE_MAP_TSV, encoding="utf-8") as f:
        for line in f:
            key, _, service = line.rstrip("\n").partition("\t")
            out[key] = service
    return out


def build_geo_ranges(spark: SparkSession) -> DataFrame:
    """Synthetic interval table of the geo-DB shape: (ip_start, ip_end, loc, isp).

    Production: replace with a one-time offline conversion of qqwry/GeoLite2
    to parquet ranges (``load_qqwry_ranges``) — the join below is unchanged.
    """
    structs = [
        F.struct(
            F.lit(GEO_BASE + b * GEO_BLOCK).cast("bigint").alias("ip_start"),
            F.lit(GEO_BASE + (b + 1) * GEO_BLOCK).cast("bigint").alias("ip_end"),
            F.lit(GEO_LOCS[b % len(GEO_LOCS)]).alias("loc"),
            F.lit(GEO_ISPS[b % len(GEO_ISPS)]).alias("isp"),
        )
        for b in range(GEO_BLOCKS)
    ]
    # literal inline table: stays a LocalTableScan inside codegen (an
    # ExistingRDD from createDataFrame would fence the broadcast join)
    return spark.range(1).select(F.inline(F.array(*structs)))


def load_qqwry_ranges(spark: SparkSession, parquet_path: str) -> DataFrame:
    """Load a pre-converted qqwry/GeoLite2 interval table from parquet.

    The offline converter (:mod:`..sources.qqwry`) walks the binary DB once
    (qqwry: 7-byte index records, GBK strings, redirect modes 0x01/0x02 —
    reference ``ipHandle/pkg/qqwry/qqwry.go:63-149``), decodes GBK → UTF-8,
    strips the " CZ88.NET" filler (reference F3), and writes sorted
    (ip_start, ip_end, loc, isp) rows.  The binary DBs themselves are
    proprietary downloads and not bundled; ``sources.qqwry.qqwry_to_parquet``
    produces this table from one.
    """
    return spark.read.parquet(parquet_path)


def ipv4_to_long(col: Column | str) -> Column:
    """Dotted-quad string → uint32 (JVM-side split/aggregate, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    return (
        parts.getItem(0).cast("bigint") * 16777216
        + parts.getItem(1).cast("bigint") * 65536
        + parts.getItem(2).cast("bigint") * 256
        + parts.getItem(3).cast("bigint")
    )


def normalize_loc(loc: Column) -> Column:
    """F1 string rules: intranet marker → 局域网, missing → 未知."""
    return (
        F.when(loc.isNull(), F.lit(GEO_UNKNOWN))
        .when(loc == "同一内部网", F.lit("局域网"))
        .otherwise(loc)
    )


def enrich_ips(
    df: DataFrame,
    geo: DataFrame,
    ip_int_col: str,
    out_prefix: str = "",
) -> DataFrame:
    """GeoIP enrichment as a broadcast interval join.

    Adds ``{prefix}loc`` / ``{prefix}isp``; unmatched IPs get 未知 (F1).
    Plan: BroadcastNestedLoopJoin with a range predicate — the fact side
    never shuffles, which is the only viable shape at 100 TB.
    """
    g = broadcast(geo)
    joined = df.join(
        g,
        (F.col(ip_int_col) >= g.ip_start) & (F.col(ip_int_col) < g.ip_end),
        "left",
    )
    return joined.select(
        *[F.col(c) for c in df.columns],
        normalize_loc(F.col("loc")).alias(f"{out_prefix}loc"),
        F.coalesce(F.col("isp"), F.lit(GEO_UNKNOWN)).alias(f"{out_prefix}isp"),
    )


def ipv6_hi64(col: Column | str) -> Column:
    """IPv6 string → top 64 bits as decimal(20,0), the zxipv6wry lookup key
    (reference ``zxipv6wry.go:68-81`` divides the 128-bit address by 2^64).

    IPv6 text needs ``::`` expansion, so this is an Arrow-batched pandas
    UDF (the one non-JVM step of the IPv6 path; the interval join itself
    stays JVM-side).  Invalid addresses yield NULL.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _hi64(s: pd.Series) -> pd.Series:
        import ipaddress

        def conv(v):
            try:
                return str(int(ipaddress.IPv6Address(v)) >> 64)
            except (ValueError, TypeError):
                return None

        return s.map(conv)

    c = F.col(col) if isinstance(col, str) else col
    return _hi64(c).cast("decimal(20,0)")


def enrich_ipv6(
    df: DataFrame,
    geo6: DataFrame,
    ip_hi_col: str,
    out_prefix: str = "",
) -> DataFrame:
    """IPv6 GeoIP enrichment: broadcast interval join on the hi-64 key
    against a zxipv6wry-converted range table
    (:func:`..sources.zxipv6wry.zxipv6wry_to_dataframe`).

    Same plan shape as :func:`enrich_ips` — the fact side never shuffles;
    unmatched addresses get 未知 (F1).
    """
    g = broadcast(geo6)
    joined = df.join(
        g,
        (F.col(ip_hi_col) >= g.ip_hi_start) & (F.col(ip_hi_col) < g.ip_hi_end),
        "left",
    )
    return joined.select(
        *[F.col(c) for c in df.columns],
        normalize_loc(F.col("loc")).alias(f"{out_prefix}loc"),
        F.coalesce(F.col("isp"), F.lit(GEO_UNKNOWN)).alias(f"{out_prefix}isp"),
    )


def service_map_df(spark: SparkSession) -> DataFrame:
    """The full 11,485-row serviceMap as a broadcastable dim table.

    Read through Spark's CSV reader (tab-delimited) rather than
    createDataFrame so the dim is a real FileScan — the driver never
    round-trips 11k rows through py4j.
    """
    return (
        spark.read.option("delimiter", "\t")
        .schema("key string, service string")
        .csv(SERVICE_MAP_TSV)
    )


def normalize_class(class_col: Column, src_hit: Column, dst_hit: Column) -> Column:
    """F2 class normalization with the reference's actual semantics
    (input/kafka_sarama.go:11643-11668).

    - 'Unknown/Unknown' → serviceMap[proto:port_src] else
      serviceMap[proto:port_dst] else unchanged
    - 'A/B' with A≠B → keep **B** (reference keeps ClassList[1] — quirk)
    - otherwise unchanged

    ``src_hit`` / ``dst_hit`` are the (nullable) service columns produced by
    :func:`join_service_map` — at 11.5k entries the lookup is a broadcast
    dim join, not a map literal.
    """
    parts = F.split(class_col, "/")
    a, b = parts.getItem(0), parts.getItem(1)
    return (
        F.when(class_col == "Unknown/Unknown", F.coalesce(src_hit, dst_hit, class_col))
        .when((F.size(parts) == 2) & (a != b), b)
        .otherwise(class_col)
    )


def join_service_map(
    flows: DataFrame,
    spark: SparkSession,
    proto: str = "proto",
    port_src: str = "port_src",
    port_dst: str = "port_dst",
) -> DataFrame:
    """Attach ``src_service`` / ``dst_service`` via two broadcast lookups.

    Mirrors the reference's src-then-dst probe order (the precedence lives
    in :func:`normalize_class`'s coalesce).  Both joins broadcast the same
    ~300 KB dim — at 100 TB the fact side never shuffles.
    """
    svc = service_map_df(spark)
    s1 = broadcast(svc.select(F.col("key").alias("_sk"), F.col("service").alias("src_service")))
    s2 = broadcast(svc.select(F.col("key").alias("_dk"), F.col("service").alias("dst_service")))
    key_src = F.concat(F.col(proto), F.lit(":"), F.col(port_src).cast("string"))
    key_dst = F.concat(F.col(proto), F.lit(":"), F.col(port_dst).cast("string"))
    out = (
        flows.join(s1, key_src == F.col("_sk"), "left")
        .join(s2, key_dst == F.col("_dk"), "left")
        .drop("_sk", "_dk")
    )
    return out
