"""Offline geo-DB conversion CLI: binary databases → parquet interval tables.

The production entry point for the one-time (or cron-refreshed) conversion
the enrichment joins consume — the Spark-first replacement for the
reference's per-query binary search over these files (reference
``ipHandle/db/db.go``; refresh cron ``util/auto_update.go:19-43``).

Usage:
    python scripts/convert_geodb.py <home_dir> <out_dir> [--lang zh-CN]
        [--ip4 qqwry|geoip2|ipip] [--ip6 zxipv6wry|geoip2]

Reads whichever databases exist under ``home_dir`` (qqwry.dat,
zxipv6wry.db, GeoLite2-City.mmdb, ipipfree.ipdb) using the reference's
selection rules, writes ``<out_dir>/ipv4_ranges`` and
``<out_dir>/ipv6_ranges`` parquet tables.  Point
``enrich.load_qqwry_ranges`` / ``streaming.refresh.GeoDbRefresher`` at the
outputs; a re-run after a DB refresh atomically replaces them.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("home", help="directory holding the binary geo DBs")
    ap.add_argument("out", help="output directory for parquet range tables")
    ap.add_argument("--lang", default=None, help="NALI_LANG override")
    ap.add_argument("--ip4", default="", help="NALI_DB_IP4 override")
    ap.add_argument("--ip6", default="", help="NALI_DB_IP6 override")
    args = ap.parse_args()

    from clickhouse_sinker_nali_spark.session import get_spark
    from clickhouse_sinker_nali_spark.sources import geodb

    spark = get_spark("convert-geodb")
    spark.sparkContext.setLogLevel("ERROR")

    wrote = []
    try:
        v4 = geodb.build_ipv4_ranges(spark, args.home, args.ip4, args.lang)
        path4 = os.path.join(args.out, "ipv4_ranges")
        v4.coalesce(1).write.mode("overwrite").parquet(path4)
        wrote.append(f"{path4} ({v4.count()} ranges)")
    except FileNotFoundError as e:
        print(f"skip ipv4: {e}", file=sys.stderr)
    try:
        v6 = geodb.build_ipv6_ranges(spark, args.home, args.ip6, args.lang)
        path6 = os.path.join(args.out, "ipv6_ranges")
        v6.coalesce(1).write.mode("overwrite").parquet(path6)
        wrote.append(f"{path6} ({v6.count()} ranges)")
    except FileNotFoundError as e:
        print(f"skip ipv6: {e}", file=sys.stderr)

    if not wrote:
        print("no databases found under", args.home, file=sys.stderr)
        return 1
    for line in wrote:
        print("wrote", line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
