"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of all headline queries (each executed to
completion with a count/collect action).  Queries are the representative
mix: scan-agg, star join, window, as-of, dedup (exact + MinHash LSH),
similarity (brute force + LSH), text analysis.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_sinker_nali_spark.operators import dedup as D
from clickhouse_sinker_nali_spark.operators import relational as R
from clickhouse_sinker_nali_spark.operators import similarity as S
from clickhouse_sinker_nali_spark.operators import text as T
from clickhouse_sinker_nali_spark.session import get_spark

HEADLINE = {
    "q1_pricing_summary": R.q1_pricing_summary,
    "q3_shipping_priority": R.q3_shipping_priority,
    "q5_star_join": R.q5_star_join,
    "window_user_events": R.window_user_events,
    "sessionize_events": R.sessionize_events,
    "asof_join_events_orders": R.asof_join_events_orders,
    "range_join_buckets": R.range_join_buckets,
    "dedup_exact": D.dedup_exact,
    "dedup_minhash_lsh": D.dedup_minhash_lsh,
    "ann_bruteforce_topk": S.ann_bruteforce_topk,
    "ann_lsh_topk": S.ann_lsh_topk,
    "token_stats": T.token_stats,
    "quality_score": T.quality_score,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    R.q1_pricing_summary(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, fn in HEADLINE.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
