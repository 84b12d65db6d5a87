"""Schema-catalog scans: auto-schema mode + series preload.

Auto-schema (reference ``output/clickhouse_util.go:95-121``): at task start,
read the target table's column catalog from ``system.columns``, skip
MATERIALIZED columns and ``excludeColumns``, and build the engine schema IR.

Series preload (reference ``output/clickhouse.go:196-221``): read existing
``__series_id`` values so Prometheus-mode series dedup only inserts new
series (the left-anti side of operators/advanced.series_antijoin_dedup).

Both are one-shot JDBC reads at query start — driver-side, tiny, and the
resulting schema/id-set broadcasts with the query plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import TableSchema

def fetch_catalog_jdbc(
    spark: SparkSession, url: str, db: str, table: str, properties: dict | None = None
) -> list[tuple[str, str, str]]:
    """Read (name, type, default_kind) rows for a table over JDBC.

    The probe string is the golden-tested reference dialect
    (``streaming.chdialect.select_columns_sql``), wrapped in a
    ``(query) AS sub`` pushdown so only the one table's catalog rows ever
    leave ClickHouse.
    """
    from ..streaming.chdialect import select_columns_sql

    q = select_columns_sql(db, table)
    df = spark.read.jdbc(url, f"({q}) AS cols", properties=properties or {})
    return [(r[0], r[1], r[2]) for r in df.collect()]


def schema_from_catalog(
    rows: list[tuple[str, str, str]], exclude: set[str] | None = None
) -> TableSchema:
    """Catalog rows → schema IR (excludes MATERIALIZED + excludeColumns)."""
    return TableSchema.from_catalog_rows(rows, exclude=exclude)


def fetch_series_ids_jdbc(
    spark: SparkSession,
    url: str,
    db: str,
    table: str,
    dist_table: str | None = None,
    properties: dict | None = None,
) -> DataFrame:
    """Existing ``__series_id`` values as a DataFrame for the anti-join.

    The probe string is the golden-tested reference dialect
    (``streaming.chdialect.series_preload_sql``): local ``<table>_series``
    single-node, the Distributed wrapper (``dist_table``) in cluster mode.

    Returned as a DataFrame (not a collected set): at scale the series
    table can be millions of rows — the anti-join broadcasts or shuffles it
    as stats dictate, never materializing on the driver (the reference's
    roaring-bitmap preload is a single-process luxury).
    """
    from ..streaming.chdialect import series_preload_sql

    q = f"({series_preload_sql(db, table, dist_table)}) AS s"
    return spark.read.jdbc(url, q, properties=properties or {})
