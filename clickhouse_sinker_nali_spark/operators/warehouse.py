"""Fourth-wave warehouse query family (TPC-H-shaped, adapted to the
driver's testdata schema).

The reference has no relational surface at all (SURVEY.md §2.3-2.7), so
these are free-capability analytics operators; each has a DuckDB oracle.
Adaptations vs canonical TPC-H (the testdata lacks partsupp, shipmode,
commit/receipt dates, and phone numbers):

- q6  — as-is (pure filter + scan aggregate).
- q12 — shipmode classes replaced by order-priority classes (the operator
  under test is *conditional aggregation*, which survives the rename).
- q14 — p_type has no 'PROMO%' prefixes here; equality on 'PROMO' instead.
- q16 — partsupp replaced by the (l_partkey, l_suppkey) pairs observed in
  lineitem; the excluded-supplier NOT IN subquery keys on s_acctbal.
- q19 — brand/size/quantity disjunction of conjunctions, as-is.
- q22 — phone country code replaced by c_mktsegment as the group key;
  scalar AVG subquery + NOT EXISTS anti-join preserved.

Scale notes (100 TB): every query here is either a scan-aggregate (q6,
q19: filter pushes to parquet, map-side partial agg collapses to ≤1 row
per partition) or a fact⋈fact join on the natural key plus broadcast dims
(q12, q14, q16); q22's scalar subquery is a 1-row broadcast and its NOT
EXISTS decorrelates to a left-anti hash join on o_custkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..session import load_table

DEC = "decimal(12,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _views(spark: SparkSession, sf_dir: str, tables: list[str], sql: str) -> DataFrame:
    from ..session import sql_on_views

    return sql_on_views(spark, sf_dir, tables, sql)


# --------------------------------------------------------------------------
# Q6: forecasting revenue change — the canonical scan-aggregate
# --------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter + ungrouped aggregate over lineitem.

    Plan shape: parquet scan with all three predicates in PushedFilters,
    ReadSchema of 4 columns, partial+final HashAggregate producing one row.
    At 100 TB this is the cheapest possible full-corpus query — no shuffle
    beyond the 1-row-per-partition final combine.
    """
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-07-01"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        # ROUND(,4) before the double cast — identity on the ≤4dp product
        # values, but it keeps the decimal sum's unscaled value under 2^53
        # so the decimal→double conversion is bit-identical across engines
        # at ANY volume (the q1 sum_disc_price note; surfaced for the
        # single-group revenue queries by the r7 sf1 hash sweep)
        F.round(F.sum(price * disc), 4).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
         * CAST(l_discount AS DECIMAL(12,4))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-07-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q12: conditional aggregation (CASE inside SUM) over a fact-fact join
# --------------------------------------------------------------------------


def q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per line-status, how many lines belong to urgent/high vs other
    priority orders — conditional aggregation, one shuffle on orderkey.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       -- CAST: DuckDB SUM(INTEGER) is HUGEINT → float64 through pandas,
       -- which breaks the driver's value hash vs Spark's bigint
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
# Q14: promotion revenue share — ratio of conditional aggregates
# --------------------------------------------------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 × promo revenue / total revenue in a month window.

    part broadcasts; both sums are exact decimals so the final double
    division is bit-identical across engines and partitionings.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    rev = price * (F.lit(1).cast(DEC) - disc)
    zero = F.lit(0).cast("decimal(25,8)")
    agg = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01"))
            & (F.col("l_shipdate") < F.lit("1996-05-01"))
        )
        .join(broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
            .cast("double")
            .alias("promo"),
            F.sum(rev).cast("double").alias("total"),
        )
    )
    return agg.select(
        F.round(F.lit(100.0) * F.col("promo") / F.col("total"), 6).alias("promo_pct"),
        F.col("promo").alias("promo_revenue"),
        F.col("total").alias("total_revenue"),
    )


Q14_SQL = """
SELECT round(100.0 * promo / total, 6) AS promo_pct,
       promo AS promo_revenue,
       total AS total_revenue
FROM (
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(12,4))
                         * (1 - CAST(l_discount AS DECIMAL(12,4)))
                    ELSE CAST(0 AS DECIMAL(25,8)) END) AS DOUBLE) AS promo,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE) AS total
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-05-01'
)
"""


# --------------------------------------------------------------------------
# Q16: supplier counts per part attribute, with a NOT IN exclusion subquery
# --------------------------------------------------------------------------


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) over the observed
    lineitem (part, supplier) pairs, excluding low-balance suppliers via
    NOT IN (decorrelated to a broadcast left-anti join — s_suppkey is
    never null so the NOT IN null-trap does not bite).
    """
    sql = Q16_SQL
    return _views(spark, sf_dir, ["lineitem", "part", "supplier"], sql)


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q19: disjunction of conjunctive range predicates (OR-of-ANDs join filter)
# --------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three brand/size/quantity conjunctions OR-ed together on the
    lineitem ⋈ part join.

    Catalyst extracts the common ``l_quantity <= 30`` / ``p_size >= 1``
    bounds as a pushable superset predicate; the residual disjunction
    evaluates post-join inside codegen.  part broadcasts.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    qty = F.col("l_quantity")
    size = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & qty.between(1, 11) & size.between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & qty.between(10, 20) & size.between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & qty.between(20, 30) & size.between(1, 15))
    )
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            # ROUND(,4)-before-double: see the Q6 note (2^53 class fix)
            F.round(F.sum(price * (F.lit(1).cast(DEC) - disc)), 4)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q19_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
         * (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3'  AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


# --------------------------------------------------------------------------
# Q22: idle high-balance customers — scalar AVG subquery + NOT EXISTS
# --------------------------------------------------------------------------

Q22_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS total_acctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the average positive balance with no urgent orders
    (every customer has SOME order in this testdata, so the anti-join
    keys on the urgent subset to stay non-vacuous).

    The scalar subquery evaluates once (1-row broadcast); NOT EXISTS
    decorrelates to a left-anti join on o_custkey.  AVG over doubles is
    fine for the *threshold* only because both engines aggregate the same
    full set — the hashed outputs (count + decimal sum) stay exact.

    Caveat at 100 TB: AVG(double) is summation-order-dependent in the last
    bits; customers with c_acctbal within one ULP of the threshold could
    flip.  The testdata balances are 2-dp values well away from ULP
    boundaries, and the reference engine itself has no exactness contract
    here; a fully stable variant would cast to DECIMAL before AVG.
    """
    return _views(spark, sf_dir, ["customer", "orders"], Q22_SQL)


# --------------------------------------------------------------------------
# Explicit GROUPING SETS with GROUPING() markers
# --------------------------------------------------------------------------

GROUPING_SETS_SQL = """
SELECT o_orderpriority,
       o_orderstatus,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY g_priority, g_status,
         o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
"""


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((priority),(status),()) with GROUPING() disambiguators
    — the general form behind rollup/cube (§2.4 free capabilities).  One
    Expand + one shuffle regardless of the number of sets.
    """
    return _views(spark, sf_dir, ["orders"], GROUPING_SETS_SQL)


# --------------------------------------------------------------------------
# Rolling 7-day revenue (RANGE-frame moving aggregate over a daily rollup)
# --------------------------------------------------------------------------


def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day order revenue per day: moving sum, moving average over
    days PRESENT, and day coverage of each trailing window.

    The RANGE frame is anchored on an integer day number (datediff from
    epoch), not ROWS — missing days correctly shrink the window rather than
    silently widening it to 7 physical rows.  Runs over the daily
    pre-aggregate (map-side combined, one shuffle); the window itself is a
    single global ordering, fine at any scale because days-per-decade is
    ~3.7k rows no matter how many raw orders fed them.  Decimal sums keep
    the moving totals exact across engines.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    # day stays TIMESTAMP (no to_date): Spark DateType and DuckDB DATE
    # render differently through the driver's pandas comparator
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    wn = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(wn).rangeBetween(-6, 0)
    return (
        daily.select(
            "day",
            "n_orders",
            F.col("revenue").cast("double").alias("revenue"),
            F.sum("revenue").over(w).cast("double").alias("rev_7d"),
            F.count(F.lit(1)).over(w).alias("days_in_window"),
            (F.sum("revenue").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
                "avg_daily_rev_7d"
            ),
        )
        .withColumn("revenue", F.round("revenue", 4))
        .withColumn("rev_7d", F.round("rev_7d", 4))
        .withColumn("avg_daily_rev_7d", F.round("avg_daily_rev_7d", 4))
        .orderBy("day")
    )


ROLLING_7DAY_SQL = """
WITH daily AS (
    SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
           SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS revenue,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
)
SELECT day, n_orders,
       ROUND(revenue::DOUBLE, 4) AS revenue,
       ROUND(SUM(revenue) OVER w::DOUBLE, 4) AS rev_7d,
       COUNT(*) OVER w AS days_in_window,
       ROUND(SUM(revenue) OVER w::DOUBLE / COUNT(*) OVER w, 4) AS avg_daily_rev_7d
FROM daily
WINDOW w AS (ORDER BY datediff('day', DATE '1970-01-01', CAST(day AS DATE))
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


# --------------------------------------------------------------------------
# SCD2 interval build (slowly-changing-dimension history from a change log)
# --------------------------------------------------------------------------


def scd2_customer_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension build: collapse each customer's order-status change
    log into validity intervals (status, valid_from, valid_to, NULL = open)
    — the warehouse pattern for point-in-time joins (\"what was the status
    when event X happened\" = as-of join against this table).

    Three window passes over one shuffle keyed on custkey: order the log,
    drop consecutive duplicates (LAG), close each interval with the next
    change (LEAD).  Ties on the same date break by o_orderkey so the
    interval set is deterministic.  At 100 TB the change log shuffles once
    on the dimension key and every window reuses that partitioning — a
    single exchange in the plan.
    """
    # presentation sort here, NOT in the shared core: the streaming
    # maintainer writes the core's output to parquet per micro-batch,
    # where a global sort is a wasted range-partition exchange
    return _scd2_intervals_cached(spark, sf_dir).orderBy("custkey", "valid_from")


# materialized-dimension cache: (applicationId, sf_dir, session.source_signature)
# → persisted SCD2 intervals.  Session-lifetime state with no unpersist BY
# DESIGN — the dim is tiny (one row per status change) and shared by every
# consumer, exactly like a warehouse's materialized dimension table;
# rebuilding the window pipeline per consumer is the cost that dominates
# at 100× scale.
_SCD2_DIM_CACHE: dict[tuple, DataFrame] = {}




def invalidate_dim_caches() -> None:
    """Unpersist and drop every cached materialized dimension — the
    explicit hook for benchmark harnesses and data-regeneration paths."""
    while _SCD2_DIM_CACHE:
        _, df = _SCD2_DIM_CACHE.popitem()
        try:
            df.unpersist()
        except Exception:
            pass


def _scd2_intervals_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 customer-status dimension, built once per (session,
    sf_dir, source-signature) and ``persist()``-ed; ``scd2_customer_status``
    and ``interval_overlap_join`` both consume it."""
    import os as _os

    # abspath, not normpath: a RELATIVE sf_dir resolved from two different
    # cwds must not collide on one cache entry (silently serving the other
    # directory's dimension)
    from ..session import source_signature

    src = _os.path.join(_os.path.abspath(sf_dir), "orders.parquet")
    key = (
        spark.sparkContext.applicationId,
        _os.path.abspath(sf_dir),
        source_signature(src),
    )
    df = _SCD2_DIM_CACHE.get(key)
    # is_cached goes False if something (spark.catalog.clearCache(), a
    # harness between timed queries) unpersisted the frame behind our
    # back; serving it anyway would silently recompute the whole window
    # pipeline on EVERY downstream action
    if df is None or not df.is_cached:
        # evict (and unpersist) superseded-SIGNATURE entries for this
        # (app, dir) first: a generate→query loop would otherwise leak
        # one persisted dimension per regeneration for the session
        for stale in [k for k in _SCD2_DIM_CACHE if k[:2] == key[:2]]:
            try:
                _SCD2_DIM_CACHE.pop(stale).unpersist()
            except Exception:
                pass
        df = scd2_intervals(load_table(spark, sf_dir, "orders")).persist()
        _SCD2_DIM_CACHE[key] = df
    return df


def scd2_intervals(orders: DataFrame) -> DataFrame:
    """SCD2 core over an arbitrary order change-log DataFrame (columns
    o_custkey, o_orderstatus, o_orderdate, o_orderkey) — shared by the
    batch build above and the streaming incremental maintainer.
    Unordered output; callers needing presentation order sort."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    log = orders.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        "o_orderkey",
        F.lag("o_orderstatus").over(w).alias("prev_status"),
    ).filter(
        F.col("prev_status").isNull()
        | (F.col("o_orderstatus") != F.col("prev_status"))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return log.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w2).alias("valid_to"),
    )


SCD2_SQL = """
WITH log AS (
    SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
           LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_status
    FROM orders
)
SELECT o_custkey AS custkey, o_orderstatus AS status,
       o_orderdate AS valid_from,
       LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS valid_to
FROM log
WHERE prev_status IS NULL OR o_orderstatus <> prev_status
ORDER BY custkey, valid_from
"""


# --------------------------------------------------------------------------
# CDC log replay / ReplacingMergeTree collapse
# --------------------------------------------------------------------------


def replacing_collapse(df: DataFrame, keys: list[str], version: str) -> DataFrame:
    """Latest-version-wins collapse: keep exactly the highest-``version``
    row per ``keys`` group — the table-side half of the reference's
    exactly-once contract (ReplacingMergeTree keyed on
    ``__kafka_topic/_partition/_offset`` collapsing re-delivered batches,
    reference ``docs/dev/design.md:4-13``).

    One shuffle on the keys; ties on ``version`` are broken arbitrarily by
    the caller supplying a unique version (offsets and CDC sequence
    numbers are unique per key by construction).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.col(version).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay a CDC change log (insert / update / delete-tombstone rows
    with per-key sequence numbers) into the current snapshot.

    The log is synthesized deterministically from ``orders``: every order
    is an insert at seq 1; keys divisible by 3 get an update at seq 2
    (status 'U2', price doubled — *2 is IEEE-exact cross-engine); keys
    divisible by 10 get a delete tombstone at seq 3.  Apply = one
    window-collapse (latest seq per key) + tombstone filter — the
    MERGE-INTO/upsert pattern at its shuffle-minimal: a single exchange
    keyed on the primary key, no join against the base table because the
    log carries full rows (ClickHouse-Replacing style, not delta style).
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    inserts = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.lit(2).alias("seq"),
            F.lit("U").alias("op"),
            F.lit("U2").alias("status"),
            (F.col("o_totalprice") * F.lit(2.0)).alias("price"),
        )
    )
    deletes = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.lit(3).alias("seq"),
            F.lit("D").alias("op"),
            F.lit(None).cast("string").alias("status"),
            F.lit(None).cast("double").alias("price"),
        )
    )
    log = inserts.unionByName(updates).unionByName(deletes)
    wcnt = Window.partitionBy("okey")
    collapsed = replacing_collapse(
        log.withColumn("n_versions", F.count(F.lit(1)).over(wcnt)),
        ["okey"],
        "seq",
    )
    return (
        collapsed.filter(F.col("op") != "D")
        .select("okey", "status", F.round("price", 6).alias("price"), "n_versions")
        .orderBy("okey")
    )


CDC_APPLY_SQL = """
WITH log AS (
    SELECT o_orderkey AS okey, 1 AS seq, 'I' AS op,
           o_orderstatus AS status, o_totalprice AS price
    FROM orders
    UNION ALL
    SELECT o_orderkey, 2, 'U', 'U2', o_totalprice * 2.0
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, 3, 'D', CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey % 10 = 0
),
versioned AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY okey ORDER BY seq DESC) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY okey) AS BIGINT) AS n_versions
    FROM log
)
SELECT okey, status, ROUND(price, 6) AS price, n_versions
FROM versioned
WHERE rn = 1 AND op <> 'D'
ORDER BY okey
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by order count, INCLUDING
    zero-order customers (the left outer join is the point — an inner join
    silently drops the empty bucket).

    Two aggregations: count per customer (shuffle on custkey — at scale
    this is the big exchange and it is map-combinable), then the tiny
    histogram groupBy.  orders side is pre-filtered before the join so the
    probe input shrinks at the scan.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
           ON c_custkey = o.o_custkey
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_0 suppliers' share of ASIA customers' revenue
    per order year.

    The five-table star resolves with ONE shuffle (lineitem⋈orders on
    orderkey); customer, supplier, nation and region are broadcast dims.
    Share numerator/denominator are exact decimal sums, divided once as
    doubles — bit-identical cross-engine regardless of partitioning.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    zero = F.lit(0).cast("decimal(25,8)")
    cust_asia = (
        cust.join(broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nat = supp.join(
        broadcast(nat), supp.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(cust_asia), o.o_custkey == cust_asia.c_custkey)
        .join(broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .select(F.year("o_orderdate").alias("o_year"), "supp_nation", rev.alias("rev"))
    )
    return (
        joined.groupBy("o_year")
        .agg(
            # ROUND(,4)-before-double: the 2^53 class fix (see the Q6 note)
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_0", F.col("rev")
                    ).otherwise(zero)
                ),
                4,
            )
            .cast("double")
            .alias("nation_rev"),
            F.round(F.sum("rev"), 4).cast("double").alias("total_rev"),
        )
        .select(
            "o_year",
            F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("mkt_share"),
            F.round("nation_rev", 6).alias("nation_rev"),
            F.round("total_rev", 6).alias("total_rev"),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT o_year,
       ROUND(nation_rev / total_rev, 6) AS mkt_share,
       ROUND(nation_rev, 6) AS nation_rev,
       ROUND(total_rev, 6) AS total_rev
FROM (
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(ROUND(SUM(CASE WHEN n2.n_name = 'NATION_0'
                    THEN CAST(l_extendedprice AS DECIMAL(12,4))
                         * (1 - CAST(l_discount AS DECIMAL(12,4)))
                    ELSE CAST(0 AS DECIMAL(25,8)) END), 4) AS DOUBLE) AS nation_rev,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS total_rev
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY 1
)
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# Sliding-window distinct users (7-day trailing COUNT DISTINCT per day)
# --------------------------------------------------------------------------


def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct active users over the trailing 7 days, per day — the DAU/WAU
    rollup every event warehouse serves.

    COUNT(DISTINCT) cannot ride a window frame (neither Spark nor most
    engines support DISTINCT window aggregates), and the naive fix — collect
    per-day user sets and merge 7 of them per row — centralizes the heaviest
    payload through one task.  The scalable formulation is
    explode-to-contributing-windows: each (day, user) pair contributes to
    the 7 target days it is visible from, so the plan is (1) per-day
    distinct pairs (one shuffle, map-side combined), (2) a 7× explode of
    that already-reduced set, (3) a count-distinct keyed by target day (one
    more shuffle of day-level cardinality).  At 100 TB the raw events never
    fan out — only the distinct (day, user) pairs do, and 7× of a distinct
    set keyed across ~thousands of days partitions evenly.

    The target-day spine is restricted to days that actually occur, so the
    output matches the per-day rollup's calendar (no phantom trailing days).
    """
    events = load_table(spark, sf_dir, "events")
    pairs = events.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    contrib = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    present = pairs.select("day").distinct()
    return (
        contrib.join(present, "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("users_7d"))
        .orderBy("day")
    )


SLIDING_DISTINCT_SQL = """
WITH pairs AS (
    SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
    FROM events
),
contrib AS (
    SELECT p.user_id, d.day
    FROM pairs p
    JOIN (SELECT DISTINCT day FROM pairs) d
      ON d.day BETWEEN p.day AND p.day + INTERVAL 6 DAY
)
SELECT day, COUNT(DISTINCT user_id) AS users_7d
FROM contrib
GROUP BY day
ORDER BY day
"""


# --------------------------------------------------------------------------
# Snapshot diff (incremental-crawl reconciliation between corpus versions)
# --------------------------------------------------------------------------


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Added / removed / changed / unchanged accounting between two corpus
    snapshots — the reconciliation a recurring crawl runs before
    re-processing ("what actually changed since last month's dump?"), and
    the gate that makes incremental dedup/indexing (minhash_index_delta)
    cheap: only `added`+`changed` rows feed the delta path.

    The two snapshots derive deterministically from one scan via hash
    gates (hash-selected docs simulate `added` / `removed` / `changed` —
    gates, not doc_id modulo, so membership does not correlate with the
    source column the rollup groups by), then a FULL OUTER join on doc_id
    compares content HASHES, not text — at 100 TB the join shuffles
    8-byte hashes, never documents.  Status is pure projection on the
    join output; the per-source rollup is map-side combined.
    """
    from ..functions import portable_hash64

    docs = load_table(spark, sf_dir, "documents")

    def gate(salt: str, mod: int):
        return (
            F.pmod(
                portable_hash64(
                    F.concat(F.lit(salt), F.col("doc_id").cast("string"))
                ),
                F.lit(mod),
            )
            != 0
        )

    old = docs.filter(gate("snap-old:", 10)).select(
        "doc_id", "source", portable_hash64("text").alias("old_hash")
    )
    new_text = F.when(
        ~gate("snap-chg:", 13), F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    new = docs.filter(gate("snap-new:", 7)).select(
        "doc_id", "source", portable_hash64(new_text).alias("new_hash")
    )
    joined = old.join(new, ["doc_id", "source"], "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select("source", status.alias("status"))
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "status")
    )


_SNAP_HASH_OLD = "(('0x' || substr(md5(text), 1, 15))::BIGINT)"


def _snap_gate_sql(salt: str, mod: int) -> str:
    return (
        f"((('0x' || substr(md5('{salt}' || doc_id::VARCHAR), 1, 15))::BIGINT)"
        f" % {mod} <> 0)"
    )


_SNAP_HASH_NEW = (
    f"(('0x' || substr(md5(CASE WHEN NOT {_snap_gate_sql('snap-chg:', 13)} "
    "THEN text || ' v2' ELSE text END), 1, 15))::BIGINT)"
)

SNAPSHOT_DIFF_SQL = f"""
WITH old AS (
    SELECT doc_id, source, {_SNAP_HASH_OLD} AS old_hash
    FROM documents WHERE {_snap_gate_sql('snap-old:', 10)}
),
new AS (
    SELECT doc_id, source, {_SNAP_HASH_NEW} AS new_hash
    FROM documents WHERE {_snap_gate_sql('snap-new:', 7)}
)
SELECT COALESCE(o.source, n.source) AS source,
       CASE WHEN o.old_hash IS NULL THEN 'added'
            WHEN n.new_hash IS NULL THEN 'removed'
            WHEN o.old_hash <> n.new_hash THEN 'changed'
            ELSE 'unchanged' END AS status,
       COUNT(*) AS n_docs
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id AND o.source = n.source
GROUP BY 1, 2
ORDER BY source, status
"""


# --------------------------------------------------------------------------
# Interval-overlap join (two interval sets, grid-bucketed to an equi-join)
# --------------------------------------------------------------------------

# Irregular promo windows (id, [start, end)) — deterministic, shared with the
# oracle.  Irregular on purpose: a regular grid would let the join collapse
# into a pure explode+groupBy and hide the bucketing technique under test.
_PROMO_WINDOWS = [
    (1, "1995-02-15", "1995-05-01"),
    (2, "1995-11-20", "1996-01-10"),
    (3, "1996-06-01", "1996-06-08"),
    (4, "1997-01-01", "1997-12-31"),
    (5, "1997-07-04", "1997-07-05"),
    (6, "1998-03-10", "1998-09-15"),
    (7, "1999-01-20", "1999-02-28"),
    (8, "2000-12-01", "2001-04-30"),
]
_SCD2_HORIZON = "2002-01-01"  # closes open-ended current intervals


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which customer-status intervals overlap which promo windows — the
    interval×interval OVERLAP join (both sides are ranges; the geo-style
    range join nearby is point-in-interval, a different shape).

    A theta join on ``a.start < b.end AND a.end > b.start`` is a cartesian
    product at scale.  The grid-bucketing rewrite makes it an equi-join:
    explode BOTH interval sets onto a coarse month grid (an interval lands
    in every month it touches), join on the month key, dedupe the pair,
    then verify the exact overlap predicate.  Cost = Σ interval-months on
    each side + an equi-join shuffle — linear in total interval length,
    never quadratic in row counts; the month granularity trades fan-out
    against join selectivity exactly like LSH bands trade shingle count
    against bucket collisions.  The oracle runs the naive theta join —
    value parity of the rewrite is the contract.
    """
    intervals = _scd2_intervals_cached(spark, sf_dir).select(
        "custkey",
        "status",
        F.col("valid_from").alias("vf"),
        F.coalesce(
            "valid_to", F.lit(_SCD2_HORIZON).cast(dict(valid_to=None) and "date")
        ).alias("vt"),
    )
    promos = spark.createDataFrame(
        [(i, s, e) for i, s, e in _PROMO_WINDOWS], ["promo_id", "ps", "pe"]
    ).select(
        "promo_id", F.col("ps").cast("date").alias("ps"), F.col("pe").cast("date").alias("pe")
    )
    month = lambda c: F.date_trunc("month", c).cast("date")  # noqa: E731
    i_grid = intervals.select(
        "custkey",
        "status",
        "vf",
        "vt",
        # greatest(vt-1, vf) keeps zero-length change-day intervals on their
        # own month (the naive predicate still matches them when a promo
        # strictly contains the instant, so they must reach the join)
        F.explode(
            F.sequence(month(F.col("vf")),
                       month(F.greatest(F.date_sub(F.col("vt"), 1), F.col("vf"))),
                       F.expr("INTERVAL 1 MONTH"))
        ).alias("mon"),
    )
    p_grid = promos.select(
        "promo_id",
        "ps",
        "pe",
        F.explode(
            F.sequence(month(F.col("ps")), month(F.date_sub(F.col("pe"), 1)),
                       F.expr("INTERVAL 1 MONTH"))
        ).alias("mon"),
    )
    pairs = (
        i_grid.join(p_grid, "mon")
        .select("custkey", "status", "vf", "vt", "promo_id", "ps", "pe")
        .distinct()
        .filter((F.col("vf") < F.col("pe")) & (F.col("vt") > F.col("ps")))
    )
    return (
        pairs.groupBy("promo_id", "status")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.count_distinct("custkey").alias("n_customers"),
        )
        .orderBy("promo_id", "status")
    )


_PROMO_VALUES = ", ".join(
    f"({i}, DATE '{s}', DATE '{e}')" for i, s, e in _PROMO_WINDOWS
)

INTERVAL_OVERLAP_SQL = f"""
WITH iv AS (
    SELECT custkey, status, valid_from AS vf,
           COALESCE(valid_to, DATE '{_SCD2_HORIZON}') AS vt
    FROM ({SCD2_SQL.replace("ORDER BY custkey, valid_from", "")})
),
promos(promo_id, ps, pe) AS (VALUES {_PROMO_VALUES})
SELECT p.promo_id, i.status,
       COUNT(*) AS n_intervals,
       COUNT(DISTINCT i.custkey) AS n_customers
FROM iv i JOIN promos p
  ON i.vf < p.pe AND i.vt > p.ps
GROUP BY p.promo_id, i.status
ORDER BY p.promo_id, i.status
"""
