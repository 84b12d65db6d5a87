"""Mergeable aggregate state — the ClickHouse *AggregatingMergeTree /
SummingMergeTree* twin.

The reference sinker's whole reason to exist is feeding ClickHouse tables
whose downstream materialized views keep pre-aggregated state that merges
incrementally as parts arrive (the ClickHouse ``-State`` / ``-Merge``
combinator pair).  The reference itself never aggregates (task/task.go
sinks raw rows), but a user migrating off it loses that database-side
capability — this module provides it engine-side, Spark-first:

- :func:`build_agg_state` — per-key partial state from one batch
  (``*-State`` analog).  Pure ``groupBy``: map-side partial aggregation
  means each executor emits one state row per key before the shuffle.
- :func:`merge_agg_state` — combine any number of state tables
  (``*-Merge`` analog / part compaction).  The state algebra is
  associative and commutative (sums of decimals, min/max), so merge
  order — and therefore Spark partitioning, AQE re-plans, and retry
  replays — cannot change the result.
- :func:`finalize_agg_state` — project human-facing aggregates
  (count/sum/min/max/avg/variance) out of the state columns.

Incremental-view usage: a Structured Streaming ``foreachBatch`` that
builds the batch's state and merges it into a stored state table gives
exactly ClickHouse's materialized-view-into-AggregatingMergeTree
semantics with end-to-end exactly-once (checkpointed offsets + idempotent
state overwrite per epoch).

Numeric discipline: sums and sums-of-squares are DECIMAL so every merge
is exact integer arithmetic — no float summation-order drift between a
one-shot aggregate and any merge tree shape.  Division (avg/variance)
happens only in ``finalize``, once, on exact inputs.

100 TB notes: state rows are one per (key, batch) — the shuffle is on the
group key with partial aggregation upstream, identical to any groupBy at
scale; skewed keys fall under AQE skew handling.  Merging S state tables
is a union + one more groupBy — no join, no quadratic term anywhere.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

# sum of DECIMAL(12,4) values; (12,4)^2 products carry scale 8
_SUM_T = "decimal(28,4)"
_SUMSQ_T = "decimal(38,8)"

STATE_COLS = ["st_n", "st_sum", "st_min", "st_max", "st_sumsq"]


def build_agg_state(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Partial aggregate state of ``value`` per ``keys`` for one batch.

    The ``-State`` combinator analog: emits (n, sum, min, max, sumsq)
    with exact decimal sums.  Input doubles are cast to DECIMAL(12,4)
    first — the same contract ClickHouse users express with
    ``Decimal(12,4)`` column types on the MV target table.
    """
    v = F.col(value).cast("decimal(12,4)")
    return df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("st_n"),
        F.sum(v).cast(_SUM_T).alias("st_sum"),
        F.min(v).alias("st_min"),
        F.max(v).alias("st_max"),
        F.sum((v * v).cast(_SUMSQ_T)).cast(_SUMSQ_T).alias("st_sumsq"),
    )


def merge_agg_state(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge state tables — the ``-Merge`` combinator / part-compaction
    analog.  Associative + commutative by construction, so any merge
    tree (pairwise, all-at-once, streaming one-batch-at-a-time) yields
    identical state."""
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    return unioned.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("st_n").alias("st_n"),
        F.sum("st_sum").cast(_SUM_T).alias("st_sum"),
        F.min("st_min").alias("st_min"),
        F.max("st_max").alias("st_max"),
        F.sum("st_sumsq").cast(_SUMSQ_T).alias("st_sumsq"),
    )


def finalize_agg_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """Project final aggregates out of mergeable state.

    avg and population variance divide exact decimal totals as doubles
    at the very end — one IEEE operation per output cell, identical in
    any engine; round(6) absorbs the final-digit formatting difference.
    """
    n = F.col("st_n").cast("double")
    s = F.col("st_sum").cast("double")
    sq = F.col("st_sumsq").cast("double")
    return state.select(
        *[F.col(k) for k in keys],
        F.col("st_n").alias("n_rows"),
        F.col("st_sum").cast("double").alias("total"),
        F.col("st_min").cast("double").alias("v_min"),
        F.col("st_max").cast("double").alias("v_max"),
        F.round(s / n, 6).alias("v_avg"),
        F.round(sq / n - (s / n) * (s / n), 6).alias("v_var"),
    )


def agg_state_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: shard lineitem into 3 "parts" (by linenumber mod 3,
    mimicking independent ingest batches), build per-part state, merge,
    finalize per (returnflag, linestatus) — byte-equal to aggregating
    the whole table in one shot (the oracle does the latter).
    """
    li = load_table(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    parts = [
        build_agg_state(li.filter(F.col("l_linenumber") % 3 == i), keys, "l_quantity")
        for i in range(3)
    ]
    merged = merge_agg_state(parts, keys)
    return finalize_agg_state(merged, keys).orderBy(*keys)


AGG_STATE_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS total,
       CAST(MIN(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS v_min,
       CAST(MAX(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS v_max,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE)
             / COUNT(*), 6) AS v_avg,
       ROUND(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,4))
                         * CAST(l_quantity AS DECIMAL(12,4)) AS DECIMAL(38,8)))
                  AS DOUBLE) / COUNT(*)
             - (CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*))
               * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*)),
             6) AS v_var
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
