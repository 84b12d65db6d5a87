"""Relational analytics operators (joins / aggregations / windows / set ops).

The reference engine has **no** relational surface (SURVEY.md §2.3-2.7: no
joins, group-bys, windows, sorts, or set ops — it is a streaming ETL daemon).
This module is the "free capabilities" analytics layer the Spark build adds:
every operator is expressed declaratively on the DataFrame API so Catalyst
does predicate pushdown / column pruning / join selection, and each comes
with a per-query DuckDB-oracle SQL twin (wired in ``__spark_entry__.
oracle_sql()``).

Scale notes (100 TB, ~1000 executors):

- Dimension tables (region/nation/supplier, any side < ~1 GB) are explicitly
  ``broadcast()`` — no shuffle for the dim side of the star joins.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; both sides are
  keyed on the same column so AQE coalesces post-shuffle partitions. On a real
  deployment the tables would be bucketed by orderkey to skip this shuffle
  entirely (`spark.sql.sources.bucketing.enabled`).
- Aggregations are partial (map-side combine) automatically for all
  algebraic aggs used here (sum/count/min/max/avg).
- Monetary aggregates run over DECIMAL(12,4) — exact arithmetic, so results
  are bit-identical regardless of partition/add order (a float sum would be
  order-dependent and non-reproducible across cluster sizes), then surfaced
  as DOUBLE (both engines round-to-nearest identically).
- Top-k uses ``ORDER BY ... LIMIT`` which Spark executes as TakeOrdered
  (per-partition heap + driver merge of k rows), never a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..session import load_table

    return load_table(spark, sf_dir, name)


# Exact-arithmetic aggregation discipline: inputs are cast to DECIMAL(12,4)
# once, and products are summed WITHOUT intermediate re-casts.  Two 4-dp
# factors give an exact 8-dp product (Spark: (12,4)×(12,4)→(25,8); a third
# factor lands exactly at the 38-digit cap: (25,8)×(12,4)→(38,12)) — both
# Spark and DuckDB compute the identical exact decimal, so the final
# cast-to-double is bit-identical.  Re-casting an 8-dp product back to 4 dp
# would instead expose HALF_UP (Spark) vs HALF_EVEN (DuckDB) rounding and
# drift the totals.
DEC = "decimal(12,4)"


# --------------------------------------------------------------------------
# Q1: pricing summary — the flagship aggregation (TPC-H Q1 shape)
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy group-by over lineitem.

    Plan shape to verify with .explain(): parquet scan with
    PushedFilters=[LessThanOrEqual(l_shipdate,...)], ReadSchema limited to the
    7 referenced columns, partial_ + final HashAggregate, WholeStageCodegen
    throughout.  At 100 TB this is embarrassingly parallel: ~4 output rows,
    map-side combine collapses each input partition to ≤4 rows pre-shuffle.
    """
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    tax = F.col("l_tax").cast(DEC)
    one = F.lit(1).cast(DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            # ROUND(.., 4) before the double cast: a scale-8 decimal sum's
            # unscaled value exceeds 2^53, and decimal→double conversion of
            # such values is correctly rounded in Java (BigDecimal) but a
            # two-step int128→double division in DuckDB — a 1-ULP mismatch
            # at sf0.1.  At scale 4 the unscaled value fits in a double
            # exactly, so both engines produce bit-identical doubles.  The
            # DECIMAL(20,8) pin on the 2-term product keeps the 3-term
            # product inside precision 38 (raw, it needs 40 and each engine
            # degrades differently).
            F.round(F.sum(price * (one - disc)), 4)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum((price * (one - disc)).cast("decimal(20,8)") * (one + tax)),
                4,
            ).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
            * (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE)
           AS sum_disc_price,
       CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
                 * (1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(20,8))
            * (1 + CAST(l_tax AS DECIMAL(12,4)))), 4) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q3: shipping priority — fact-fact join + agg + top-k
# --------------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, revenue per order, top 10.

    customer is small relative to the facts → broadcast; orders ⋈ lineitem
    shuffles on orderkey (bucket both by orderkey in a real deployment).
    Top-k via TakeOrdered with a full deterministic tiebreak.
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    return (
        li.join(
            orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()), 4).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
            * (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, o_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# Q5: local supplier volume — 6-way star join
# --------------------------------------------------------------------------


def q5_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region.

    All dims broadcast (nation 25 rows, region 5, supplier tiny relative to
    facts); only the orders ⋈ lineitem edge shuffles.  Catalyst reorders the
    dim joins below the fact join automatically.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(_revenue()), 4).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


Q5_SQL = """
SELECT r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
            * (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


def window_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + analytic windows over the events stream table.

    row_number / lag / running sum per user ordered by (ts, event_id) — the
    tiebreak makes frames deterministic.  Single shuffle on user_id; at scale
    user_id skew is handled by AQE skew-split (enabled in session.py).
    """
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
            F.lag("value", 1).over(w).alias("prev_value"),
            F.sum(F.col("value").cast(DEC))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            .alias("running_value"),
        )
        .filter(F.col("rn") <= 5)
    )


WINDOW_SQL = """
SELECT user_id, event_id, event_type, rn, prev_value, running_value
FROM (
    SELECT user_id, event_id, event_type,
           ROW_NUMBER() OVER w AS rn,
           LAG(value, 1) OVER w AS prev_value,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE rn <= 5
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity) via window functions.

    The classic batch sessionizer: lag(ts) per user → gap > threshold marks a
    session start → running sum of markers is the session id.  Two window
    passes over one shuffle partition-by user_id.  (The streaming twin of
    this operator is ``session_window`` in streaming/pipeline.py.)
    """
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Sub-second precision matters: events.ts carries fractional seconds, and
    # unix_timestamp() truncates to whole seconds (a 1800.4s gap would wrongly
    # read as 1800 = same session).  TIMESTAMP_NTZ has no direct double cast;
    # route through timestamp_ltz (session tz is UTC, so the hop is identity)
    # to keep the fraction, matching DuckDB's epoch() semantics.
    sec = F.col("ts").cast("timestamp_ltz").cast("double")
    gap = sec - F.lag(sec, 1).over(w)
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("is_start"),
    )
    sess = marked.select(
        "user_id",
        "event_id",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id", "session_id")
    )


SESSIONIZE_SQL = """
WITH marked AS (
    SELECT user_id, event_id, ts,
           CASE WHEN epoch(ts) - epoch(LAG(ts, 1) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                    THEN 1
                WHEN LAG(ts, 1) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1
                ELSE 0 END AS is_start
    FROM events
), sess AS (
    SELECT user_id, event_id,
           -- CAST: DuckDB types a windowed SUM(INTEGER) as HUGEINT, which
           -- pandas renders as float64 (1.0 vs Spark's bigint 1) and breaks
           -- the driver's value hash even though values are identical.
           CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
    FROM marked
)
SELECT user_id, session_id, COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube
# --------------------------------------------------------------------------


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (orderpriority, orderstatus) with exact decimal totals."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_price"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


ROLLUP_SQL = """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT of customer vs supplier nation keys.

    Each set op is a shuffle-dedup on the key; at scale these are cheap
    (25 distinct keys) after map-side partial distinct.
    """
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = cust.intersect(supp).withColumn("which", F.lit("both"))
    cust_only = cust.subtract(supp).withColumn("which", F.lit("customer_only"))
    supp_only = supp.subtract(cust).withColumn("which", F.lit("supplier_only"))
    return both.unionByName(cust_only).unionByName(supp_only).orderBy("which", "nationkey")


SET_OPS_SQL = """
WITH cust AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     supp AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS which FROM (SELECT nationkey FROM cust INTERSECT SELECT nationkey FROM supp)
UNION ALL
SELECT nationkey, 'customer_only' AS which FROM (SELECT nationkey FROM cust EXCEPT SELECT nationkey FROM supp)
UNION ALL
SELECT nationkey, 'supplier_only' AS which FROM (SELECT nationkey FROM supp EXCEPT SELECT nationkey FROM cust)
ORDER BY which, nationkey
"""


# --------------------------------------------------------------------------
# Sorts / top-k / distinct
# --------------------------------------------------------------------------


def topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 15 parts by retail price — TakeOrdered, not a global sort."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(15)
    )


TOPK_SQL = """
SELECT p_partkey, p_name, p_brand, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey
LIMIT 15
"""


def distinct_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (map-side partial distinct at scale)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


DISTINCT_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event_type via the engine's
    bit-reproducible HyperLogLog (operators/advanced.py) — grouped HLL:
    one register set per event_type, registers merge by MAX, harmonic sum
    accumulated as an integer so the estimate is IDENTICAL across
    engines, which is what upgrades this query from the r1-r5 rows-only
    check (Spark's builtin approx_count_distinct sketches are
    engine-private) to a full DuckDB value-hash oracle.

    At 100 TB this replaces countDistinct wherever a ±2% answer is
    acceptable: fixed 256-register state per group (map-side combined),
    no distinct shuffle explosion.  Spark's builtin
    ``approx_count_distinct`` is the one-liner alternative when
    cross-engine reproducibility doesn't matter.
    """
    from ..functions import portable_hash64
    from .advanced import _HLL_ALPHA, _HLL_M, _HLL_REM_BITS

    ev = _t(spark, sf_dir, "events")
    h = portable_hash64(F.col("user_id").cast("string"))
    rem = h % F.lit(1 << _HLL_REM_BITS)
    rho = F.when(rem == 0, F.lit(_HLL_REM_BITS + 1)).otherwise(
        F.lit(_HLL_REM_BITS + 1) - F.length(F.bin(rem))
    )
    regs = (
        ev.select(
            "event_type",
            F.shiftright(h, _HLL_REM_BITS).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    summed = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_REM_BITS + 1} - mj)")).alias(
            "num_present"
        ),
    )
    zeros = F.lit(_HLL_M) - F.col("n_present")
    total_num = F.col("num_present") + zeros * F.lit(1 << (_HLL_REM_BITS + 1))
    raw = (
        F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_REM_BITS + 1)))
        / total_num.cast("double")
    )
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (zeros > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    # ROUND: the small-range branch uses ln(), whose 1-ulp cross-engine
    # wobble the raw-emission rule exempts (same note as hll_distinct_sketch)
    return summed.select(
        "event_type", F.round(est, 3).alias("approx_users")
    ).orderBy("event_type")


def _approx_distinct_sql() -> str:
    """DuckDB twin of approx_distinct_users — the grouped deterministic
    HLL with the identical integer-harmonic-sum formulation (same shape
    as advanced.HLL_SKETCH_SQL, one register set per event_type)."""
    from .advanced import _HLL_ALPHA, _HLL_M, _HLL_REM_BITS

    h = "(('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT)"
    alpha_num = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_REM_BITS + 1))
    raw = (
        f"{alpha_num!r} / CAST(s.num_present + ({_HLL_M} - s.n_present)"
        f" * (CAST(1 AS BIGINT) << {_HLL_REM_BITS + 1}) AS DOUBLE)"
    )
    small = (
        f"{float(_HLL_M)!r} * ln({float(_HLL_M)!r}"
        f" / CAST({_HLL_M} - s.n_present AS DOUBLE))"
    )
    cond = f"{raw} <= {2.5 * _HLL_M} AND ({_HLL_M} - s.n_present) > 0"
    return f"""
WITH rows_h AS (
    SELECT event_type,
           {h} // {1 << _HLL_REM_BITS} AS bucket,
           CASE WHEN {h} % {1 << _HLL_REM_BITS} = 0 THEN {_HLL_REM_BITS + 1}
                ELSE {_HLL_REM_BITS + 1}
                     - length(bin({h} % {1 << _HLL_REM_BITS})) END AS rho
    FROM events
),
regs AS (
    SELECT event_type, bucket, MAX(rho) AS mj
    FROM rows_h GROUP BY event_type, bucket
),
s AS (
    SELECT event_type,
           COUNT(*) AS n_present,
           SUM(CAST(1 AS BIGINT) << ({_HLL_REM_BITS + 1} - mj)) AS num_present
    FROM regs GROUP BY event_type
)
SELECT event_type,
       ROUND(CASE WHEN {cond} THEN {small} ELSE {raw} END, 3) AS approx_users
FROM s
ORDER BY event_type
"""


APPROX_DISTINCT_SQL = _approx_distinct_sql()


# --------------------------------------------------------------------------
# As-of join (custom operator: Spark has no native ASOF)
# --------------------------------------------------------------------------


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the most recent order of the same customer at ts.

    Composition strategy (SURVEY §2.3 'absent joins'): equality join on the
    entity key + time filter + row_number()=1 — fully declarative, so
    Catalyst picks broadcast vs shuffle join by stats.  At 100 TB the
    union-merge formulation (union both streams, one window pass with
    last_value(ignore nulls)) avoids the join fan-out entirely; that variant
    is ``asof_join_merge`` in tests.  Deterministic tiebreak on o_orderkey.
    """
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    orders = _t(spark, sf_dir, "orders")
    joined = ev.join(
        orders,
        (ev.user_id == orders.o_custkey) & (orders.o_orderdate <= ev.ts),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc_nulls_last(), F.col("o_orderkey").desc_nulls_last()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")
        .orderBy("event_id")
    )


ASOF_SQL = """
SELECT event_id, user_id, ts, o_orderkey, o_orderdate
FROM (
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
           ROW_NUMBER() OVER (PARTITION BY e.event_id
                ORDER BY o.o_orderdate DESC NULLS LAST,
                         o.o_orderkey DESC NULLS LAST) AS rn
    FROM events e
    LEFT JOIN orders o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    WHERE e.event_type = 'purchase'
)
WHERE rn = 1
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# Range join (the GeoIP-join shape: point-in-interval lookup)
# --------------------------------------------------------------------------

# Deterministic synthetic value-bucket dimension (the same shape as a GeoIP
# ip-range table: [lo, hi) -> attributes).  Shared by the Spark builder and
# the SQL oracle below.
_VALUE_BUCKETS = [
    (0.0, 10.0, "tiny"),
    (10.0, 50.0, "small"),
    (50.0, 120.0, "medium"),
    (120.0, 250.0, "large"),
    (250.0, 1e9, "huge"),
]


def range_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval broadcast range join (GeoIP lookup shape, SURVEY J1).

    The interval dim is tiny → ``broadcast`` makes this a BroadcastNestedLoop
    with a range predicate — exactly the plan a 100 TB GeoIP enrichment
    wants (the geo table is ~1 M ranges ≈ 50 MB, broadcastable).
    """
    ev = _t(spark, sf_dir, "events")
    # literal inline table (LocalTableScan) instead of createDataFrame:
    # keeps the broadcast side inside Catalyst/codegen (an ExistingRDD scan
    # would fence off whole-stage codegen around the join)
    dim = spark.range(1).select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(lo).alias("lo"),
                        F.lit(hi).alias("hi"),
                        F.lit(b).alias("bucket"),
                    )
                    for lo, hi, b in _VALUE_BUCKETS
                ]
            )
        )
    )
    return (
        ev.join(broadcast(dim), (ev.value >= dim.lo) & (ev.value < dim.hi), "left")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("bucket")
    )


_BUCKETS_VALUES = ", ".join(f"({lo}, {hi}, '{b}')" for lo, hi, b in _VALUE_BUCKETS)

RANGE_JOIN_SQL = f"""
WITH dim(lo, hi, bucket) AS (VALUES {_BUCKETS_VALUES})
SELECT bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
FROM events e
LEFT JOIN dim ON e.value >= dim.lo AND e.value < dim.hi
GROUP BY bucket
ORDER BY bucket
"""


# --------------------------------------------------------------------------
# Q7-style: volume by year and nation pair
# --------------------------------------------------------------------------


def q7_volume_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly shipped volume per (customer nation, supplier nation) pair.

    Two broadcast dim joins against the facts + a date-part group-by; shows
    EXTRACT pushing into the aggregate key without materializing a column.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(broadcast(n1), cust.c_nationkey == F.col("c_nk"))
        .join(broadcast(n2), supp.s_nationkey == F.col("s_nk"))
        .groupBy(
            F.year("l_shipdate").alias("ship_year"), "cust_nation", "supp_nation"
        )
        .agg(F.round(F.sum(_revenue()), 4).cast("double").alias("volume"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .orderBy("ship_year", "cust_nation", "supp_nation")
    )


Q7_SQL = """
SELECT EXTRACT(YEAR FROM l_shipdate)::INTEGER AS ship_year,
       n1.n_name AS cust_nation,
       n2.n_name AS supp_nation,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
            * (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY ship_year, cust_nation, supp_nation
ORDER BY ship_year, cust_nation, supp_nation
"""


# --------------------------------------------------------------------------
# Q10-style: top customers by returned revenue
# --------------------------------------------------------------------------


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue on returned items (l_returnflag='R').

    The returnflag filter pushes to the lineitem scan; customer/nation
    broadcast; TakeOrdered caps the output.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(_revenue()), 4).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
            * (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# correlated-subquery family (EXISTS / scalar / IN+HAVING) via the SQL surface
# --------------------------------------------------------------------------
#
# These run through ``spark.sql`` on purpose: the engine's SQL surface IS
# Spark SQL (README "counted absences"), and correlated subqueries exercise
# Catalyst's decorrelation — EXISTS becomes a left-semi hash join, the
# correlated scalar aggregate becomes a grouped subplan + equi-join.  The
# reference has no subquery support at all; this family is the analytics
# upgrade a warehouse user expects.


def _revenue():
    """The decimal-exact discounted revenue expression shared by every
    revenue query: DECIMAL(12,4) arithmetic end to end, so partition order
    cannot perturb the sum — one definition, applied to l_extendedprice
    and l_discount of the enclosing plan."""
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )


def _sql_on_views(spark: SparkSession, sf_dir: str, tables: list[str], sql: str) -> DataFrame:
    from ..session import sql_on_views

    return sql_on_views(spark, sf_dir, tables, sql)


Q4_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q4_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4-style: order counts where ANY lineitem was returned (correlated
    EXISTS → decorrelated left-semi join; no commit/receipt dates in this
    schema so returnflag stands in for the late-delivery predicate)."""
    return _sql_on_views(spark, sf_dir, ["orders", "lineitem"], Q4_EXISTS_SQL)


# l_quantity is integer-valued, so SUM/AVG are exact in IEEE doubles
# regardless of summation order — the correlated threshold is reproducible
# bit-for-bit in both engines (the reason this predicate is safe to hash).
# The revenue SUM, by contrast, is over arbitrary doubles, so it
# accumulates in DECIMAL(12,4) like every other revenue query — a raw
# double sum is partition-order dependent and only ROUND masked it.
Q17_SCALAR_SQL = """
SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / 7.0, 2)
           AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17-style: revenue lost to small orders — correlated SCALAR aggregate
    subquery (per-part average), decorrelated into a grouped join."""
    return _sql_on_views(spark, sf_dir, ["lineitem", "part"], Q17_SCALAR_SQL)


Q18_HAVING_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       SUM(l_quantity) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18-style: large-volume customers — IN + grouped HAVING subquery
    (semi-join against an aggregate), then the 3-way join re-aggregates."""
    return _sql_on_views(
        spark, sf_dir, ["customer", "orders", "lineitem"], Q18_HAVING_SQL
    )


# --------------------------------------------------------------------------
# FULL OUTER reconciliation (presence audit across two fact sources)
# --------------------------------------------------------------------------


def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile the event stream against the order book per user: FULL
    OUTER join of per-user aggregates, classifying each key as
    events-only / orders-only / both — the audit query every ingest
    migration runs ("which entities exist on one side only?").

    Both inputs pre-aggregate to one row per key BEFORE the join, so the
    full-outer shuffle carries |users| + |customers| rows, not raw volume —
    the only scalable shape for reconciliation at 100 TB.  Output is the
    per-class summary (counts + coalesced activity), small and stable.
    """
    ev = _t(spark, sf_dir, "events")
    orders = _t(spark, sf_dir, "orders")
    ev_agg = ev.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    ord_agg = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    joined = ev_agg.join(ord_agg, "key", "full_outer")
    presence = (
        F.when(F.col("n_events").isNotNull() & F.col("n_orders").isNotNull(), "both")
        .when(F.col("n_events").isNotNull(), "events_only")
        .otherwise("orders_only")
    )
    return (
        joined.select(
            presence.alias("presence"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
        .groupBy("presence")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_events").alias("total_events"),
            F.sum("n_orders").alias("total_orders"),
        )
        .orderBy("presence")
    )


FULL_OUTER_SQL = """
WITH ev AS (SELECT user_id AS key, COUNT(*) AS n_events FROM events GROUP BY 1),
     ords AS (SELECT o_custkey AS key, COUNT(*) AS n_orders FROM orders GROUP BY 1)
SELECT CASE WHEN ev.n_events IS NOT NULL AND ords.n_orders IS NOT NULL THEN 'both'
            WHEN ev.n_events IS NOT NULL THEN 'events_only'
            ELSE 'orders_only' END AS presence,
       COUNT(*) AS n_keys,
       CAST(SUM(COALESCE(ev.n_events, 0)) AS BIGINT) AS total_events,
       CAST(SUM(COALESCE(ords.n_orders, 0)) AS BIGINT) AS total_orders
FROM ev FULL OUTER JOIN ords ON ev.key = ords.key
GROUP BY 1
ORDER BY presence
"""


# --------------------------------------------------------------------------
# Extended window-function surface (ntile / percent_rank / cume_dist / nth)
# --------------------------------------------------------------------------


def window_funcs_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the SQL window-function family over per-user event
    streams: quartile assignment (ntile), relative standing (percent_rank,
    cume_dist), positional peeks (lead, nth_value) — one frame definition,
    five functions, completing the §2.5 surface beyond rank/lag/running.

    All five share ONE window spec partitioned by user_id, so Catalyst
    plans a single Window operator over a single shuffle — adding
    functions to an existing frame is free; adding FRAMES is what
    multiplies cost.  Event-level output keyed by a high-cardinality
    partition key partitions evenly at any scale.
    """
    from pyspark.sql.window import Window

    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        events.select(
            "event_id",
            "user_id",
            F.ntile(4).over(w).alias("quartile"),
            # RAW doubles: rank ratios are exact-int divisions (bit-identical
            # across engines) and lead/nth pass stored values through — while
            # engine ROUND diverges on boundary ratios (41/640 rounds to
            # .064063 in Spark, .064062 in DuckDB); checker canonicalizes
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume_dist"),
            F.lead("value", 1).over(w).alias("next_value"),
            F.nth_value("value", 2).over(wf).alias("second_value"),
        )
        .orderBy("event_id")
    )


WINDOW_FUNCS_EXT_SQL = """
SELECT event_id, user_id,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume_dist,
       lead(value, 1) OVER w AS next_value,
       nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS second_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# As-of join variants: backward / forward / nearest / tolerance in one pass
# --------------------------------------------------------------------------

ASOF_TOLERANCE_S = 7 * 86400  # tolerance variant: backward match within 7 days


def asof_join_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four as-of directions per event in ONE plan — backward (most
    recent order ≤ ts), forward (next order ≥ ts), nearest (smaller time
    gap, ties backward), tolerance (backward only within 7 days) — the
    full pandas ``merge_asof`` surface, which the single-direction
    ``asof_join_events_orders`` only samples.

    The TPC-H order dates (1992-98) all precede the event stream (2024),
    which would make three of the four directions vacuous — so the order
    timeline is first remapped deterministically into the events' 30-day
    window (``o_date = DATE '2024-01-01' + datediff(o_orderdate,
    '1992-01-01') % 30``), identically in the oracle; the as-of semantics
    under test are unchanged, only the clock overlaps.

    Scale formulation is the union-merge: both streams union into one
    relation keyed by user, and each direction is a running
    last/first_value(ignore nulls) window over that union — NO join
    fan-out (the join formulation multiplies each event by every earlier
    order of its user before rn=1 prunes).  Both windows share the
    user-hash exchange; only their sort orders differ (orders sort before
    equal-timestamp events in the backward pass and after them in the
    forward pass, which is exactly inclusive ≤ / ≥).  The oracle is the
    naive four-subquery formulation — value parity of the optimized
    strategy is the contract.
    """
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    o_date = F.date_add(
        F.lit("2024-01-01").cast("date"),
        F.pmod(F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")), F.lit(30)),
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", o_date.alias("o_date")
    )
    e_rows = ev.select(
        "user_id",
        F.col("ts").cast("timestamp_ltz").cast("double").alias("tsec"),
        F.lit(0).alias("is_order"),
        "event_id",
        "ts",
        F.lit(None).cast("bigint").alias("okey"),
        F.lit(None).cast("double").alias("osec"),
    )
    o_rows = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_date").cast("timestamp_ltz").cast("double").alias("tsec"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_date").cast("timestamp_ltz").cast("double").alias("osec"),
    )
    merged = e_rows.unionByName(o_rows)
    pick = F.when(
        F.col("is_order") == 1, F.struct(F.col("osec"), F.col("okey"))
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("tsec", F.col("is_order").desc(), "okey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("tsec", "is_order", "okey")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    picked = merged.select(
        "*",
        F.last(pick, ignorenulls=True).over(wb).alias("b"),
        F.first(pick, ignorenulls=True).over(wf).alias("f"),
    ).filter(F.col("is_order") == 0)
    b_diff = F.col("tsec") - F.col("b.osec")
    f_diff = F.col("f.osec") - F.col("tsec")
    nearest = (
        F.when(F.col("b").isNull(), F.col("f.okey"))
        .when(F.col("f").isNull(), F.col("b.okey"))
        .when(b_diff <= f_diff, F.col("b.okey"))
        .otherwise(F.col("f.okey"))
    )
    return picked.select(
        "event_id",
        "user_id",
        "ts",
        F.col("b.okey").alias("backward_key"),
        F.col("f.okey").alias("forward_key"),
        nearest.alias("nearest_key"),
        F.when(b_diff <= ASOF_TOLERANCE_S, F.col("b.okey")).alias("tolerance_key"),
    ).orderBy("event_id")


ASOF_VARIANTS_SQL = f"""
WITH base AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
ord AS (
    SELECT o_custkey, o_orderkey,
           DATE '2024-01-01'
           + TO_DAYS(CAST(datediff('day', DATE '1992-01-01', o_orderdate) % 30 AS INTEGER)) AS o_date
    FROM orders
),
b AS (
    SELECT event_id, o_orderkey AS b_key,
           epoch(ts) - epoch(CAST(o_date AS TIMESTAMP)) AS b_diff
    FROM (
        SELECT e.event_id, e.ts, o.o_orderkey, o.o_date,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                    ORDER BY o.o_date DESC NULLS LAST,
                             o.o_orderkey DESC NULLS LAST) AS rn
        FROM base e
        LEFT JOIN ord o
          ON e.user_id = o.o_custkey AND o.o_date <= e.ts
    ) WHERE rn = 1
),
f AS (
    SELECT event_id, o_orderkey AS f_key,
           epoch(CAST(o_date AS TIMESTAMP)) - epoch(ts) AS f_diff
    FROM (
        SELECT e.event_id, e.ts, o.o_orderkey, o.o_date,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                    ORDER BY o.o_date ASC NULLS LAST,
                             o.o_orderkey ASC NULLS LAST) AS rn
        FROM base e
        LEFT JOIN ord o
          ON e.user_id = o.o_custkey AND o.o_date >= e.ts
    ) WHERE rn = 1
)
SELECT base.event_id, base.user_id, base.ts,
       b.b_key AS backward_key,
       f.f_key AS forward_key,
       CASE WHEN b.b_key IS NULL THEN f.f_key
            WHEN f.f_key IS NULL THEN b.b_key
            WHEN b.b_diff <= f.f_diff THEN b.b_key
            ELSE f.f_key END AS nearest_key,
       CASE WHEN b.b_diff <= {ASOF_TOLERANCE_S} THEN b.b_key END AS tolerance_key
FROM base
LEFT JOIN b ON base.event_id = b.event_id
LEFT JOIN f ON base.event_id = f.event_id
ORDER BY base.event_id
"""
