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

# Small deterministic service map (proto:port → service); the reference's
# 11.5k-entry literal collapses to the same lookup shape.
SERVICE_MAP = {
    "tcp:22": "ssh",
    "tcp:25": "smtp",
    "tcp:80": "http",
    "tcp:443": "https",
    "udp:53": "dns",
    "udp:123": "ntp",
    "tcp:3306": "mysql",
    "tcp:6379": "redis",
}


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

    The offline converter walks the binary DB once (qqwry: 7-byte index
    records, GBK strings, redirect modes 0x01/0x02 — reference
    ``ipHandle/pkg/qqwry/qqwry.go:63-149``), decodes GBK → UTF-8, strips the
    " CZ88.NET" filler (reference F3), and writes sorted
    (ip_start, ip_end, loc, isp) rows.  Not bundled here: the geo DBs are
    proprietary downloads.
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


def service_map_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(SERVICE_MAP.items())], "key string, service string"
    )


def normalize_class(
    class_col: Column, proto: Column, port_src: Column, port_dst: Column
) -> Column:
    """F2 class normalization with the reference's actual semantics.

    - 'Unknown/Unknown' → serviceMap[proto:port_src] else
      serviceMap[proto:port_dst] else unchanged
    - 'A/B' with A≠B → keep **B** (reference keeps ClassList[1] — quirk)
    - otherwise unchanged

    The map enters the plan as a literal MapType (broadcast by value);
    element_at is a codegen'd lookup.
    """
    entries: list[Column] = []
    for k, v in sorted(SERVICE_MAP.items()):
        entries += [F.lit(k), F.lit(v)]
    m = F.create_map(*entries)
    src_hit = F.element_at(m, F.concat(proto, F.lit(":"), port_src.cast("string")))
    dst_hit = F.element_at(m, F.concat(proto, F.lit(":"), port_dst.cast("string")))
    parts = F.split(class_col, "/")
    a, b = parts.getItem(0), parts.getItem(1)
    return (
        F.when(class_col == "Unknown/Unknown", F.coalesce(src_hit, dst_hit, class_col))
        .when((F.size(parts) == 2) & (a != b), b)
        .otherwise(class_col)
    )
