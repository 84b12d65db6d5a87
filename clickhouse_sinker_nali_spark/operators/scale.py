"""Scale techniques as first-class, testable operators: skew-salted joins
and bucketed (pre-shuffled) co-located joins.

The reference engine sidesteps both problems by being a partition-per-thread
streaming ETL (reference ``docs/dev/architecture.md``: one Kafka partition →
one goroutine, no joins at all); a 100 TB *analytics* engine meets them head
on.  Both techniques here change the PHYSICAL plan only — result parity
with the naive formulation is part of the test/oracle contract.

- **Salting** defeats hot-key skew in shuffle joins: the build side is
  replicated ``n_salts`` times, the probe side spreads each hot key over
  ``n_salts`` reducers.  AQE's skew-join split handles moderate skew
  automatically; salting is the deterministic fallback for pathological
  keys (null-heavy foreign keys, celebrity users) where one reducer would
  otherwise run for hours.
- **Bucketing** pre-pays the shuffle once at write time: two tables
  bucketed and sorted by the join key sort-merge-join with ZERO runtime
  exchange — the decisive layout for fact-to-fact joins repeated across a
  query workload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

N_SALTS = 8


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_salt_source: Column,
    n_salts: int = N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the right side replicated over ``n_salts`` salt values.

    ``left_salt_source`` is any left-side expression; its hash spreads each
    left row (including every row of a hot key) uniformly over the salt
    range.  Row-level results are IDENTICAL to ``left.join(right, on)`` —
    only the shuffle distribution changes: reducer fan-in per key drops
    from |key| to |key|/n_salts.  Cost: the right side is shuffled
    n_salts× (choose n_salts ≈ hot-key factor / target-partition-size, and
    keep the replicated side the small one).
    """
    salted_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(left_salt_source), F.lit(n_salts))
    )
    return salted_l.join(salted_r, [on, "__salt"], how).drop("__salt")


def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order-priority via a SALTED lineitem⋈orders join.

    ``o_orderkey`` stands in for a hot key; the salt source is the
    line-number (uniform within an order), so one giant order's lineitems
    spread over ``N_SALTS`` reducers instead of hammering one.  The oracle
    is the UNSALTED join — salting must not change a single row.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, "l_orderkey", F.col("l_linenumber"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


SKEW_JOIN_SQL = """
SELECT o_orderpriority,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` (the write-once shuffle).

    Spark's bucketing needs the metastore (``saveAsTable``); downstream
    joins/aggregations on ``key`` between tables with the SAME bucket count
    then plan with no Exchange.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two pre-bucketed tables on their bucket key — zero-shuffle SMJ."""
    return spark.table(left_table).join(spark.table(right_table), on)
