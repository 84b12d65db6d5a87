"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every entry maps to an operator in SURVEY.md §2 or to the
LLM-data-pipeline layer (dedup / similarity / text / multimodal).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from clickhouse_sinker_nali_spark.operators import relational as R


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing-summary aggregation) on sf0.001."""
    return R.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational / analytics layer
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_shipping_priority": R.q3_shipping_priority,
        "q5_star_join": R.q5_star_join,
        "window_user_events": R.window_user_events,
        "sessionize_events": R.sessionize_events,
        "rollup_orders": R.rollup_orders,
        "cube_lineitem": R.cube_lineitem,
        "set_ops_nations": R.set_ops_nations,
        "topk_parts": R.topk_parts,
        "distinct_event_users": R.distinct_event_users,
        "approx_distinct_users": R.approx_distinct_users,
        "asof_join_events_orders": R.asof_join_events_orders,
        "range_join_buckets": R.range_join_buckets,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": R.Q1_SQL,
        "q3_shipping_priority": R.Q3_SQL,
        "q5_star_join": R.Q5_SQL,
        "window_user_events": R.WINDOW_SQL,
        "sessionize_events": R.SESSIONIZE_SQL,
        "rollup_orders": R.ROLLUP_SQL,
        "cube_lineitem": R.CUBE_SQL,
        "set_ops_nations": R.SET_OPS_SQL,
        "topk_parts": R.TOPK_SQL,
        "distinct_event_users": R.DISTINCT_SQL,
        # approx_distinct_users: sketch-valued, rows-only check by design
        "asof_join_events_orders": R.ASOF_SQL,
        "range_join_buckets": R.RANGE_JOIN_SQL,
    }
