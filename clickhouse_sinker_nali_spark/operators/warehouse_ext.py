"""Completing wave of the TPC-H-shaped warehouse family: q2, q9, q11,
q15, q20, q21 — the six canonical queries not yet covered by
``relational.py`` / ``warehouse.py``.  With these, all 22 TPC-H query
*shapes* are exercised.

The reference engine has no relational surface (SURVEY.md §2.3-2.7), so
like ``warehouse.py`` these are free-capability analytics operators; each
has a DuckDB oracle.  Adaptations vs canonical TPC-H (the testdata lacks
partsupp, ps_supplycost/ps_availqty, l_commitdate/l_receiptdate, and
supplier phone/comment columns):

- q2  — partsupp replaced by per-(partkey, suppkey) *observed unit cost*
  MIN(l_extendedprice / l_quantity) from lineitem.  The operator under
  test — a correlated MIN subquery selecting the cheapest supplier per
  part within a region — survives intact.
- q9  — ps_supplycost proxied by 10% of p_retailprice; profit =
  revenue − cost·qty grouped by (supplier nation, order year).
- q11 — "stock value" per part proxied by lineitem revenue restricted to
  one nation's suppliers; the scalar-subquery HAVING threshold
  (value > fraction · total) is the point and is preserved.
- q15 — as-is (revenue view over a shipdate quarter + scalar MAX);
  needs only lineitem + supplier.
- q20 — the availqty>½·shipped filter becomes a HAVING over observed
  shipped quantity per (supplier, part); the nested IN-subquery chain
  (supplier IN … part IN …) is preserved.
- q21 — "kept orders waiting" lateness l_receiptdate > l_commitdate is
  replaced by l_shipdate > o_orderdate + 60 days; the EXISTS
  (another supplier on the order) / NOT EXISTS (another *late* supplier)
  pair is preserved verbatim.

Scale notes (100 TB): every derived-partsupp aggregate is a map-side
partial groupBy on (l_partkey, l_suppkey) — the natural key of the fact
table, so AQE coalesces it with the downstream join exchange.  All dim
joins (supplier, nation, region, part at 0.2% selectivity) broadcast.
q21's self-joins are equi-joins on l_orderkey (the fact's primary
clustering key): at scale each probe shuffles on orderkey, and a
bucketed-by-orderkey layout removes those exchanges entirely.  Nothing
here is quadratic.

Decimal discipline follows ``relational.py`` q1: money sums go through
DECIMAL(12,4)/DECIMAL(20,8) intermediates in BOTH engines so the value
hash compares exact digits, and windowed/integer sums are CAST to BIGINT
in the oracle to dodge DuckDB's HUGEINT→float64 pandas rendering
(tests/test_oracle_types.py enforces this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..session import load_table


# per-call persisted intermediates (q2/q11/q15 re-read a small aggregate
# twice).  Each call releases the PREVIOUS calls' frames: the queries()
# contract returns an unexecuted plan, so there is no post-action hook —
# without this, a bench loop or oracle sweep accumulates one cached
# relation per invocation for the whole session (same policy as the
# dedup shingle registry).
_PERSIST_REGISTRY: list = []


def _registered_persist(df):
    from ..session import registered_persist

    return registered_persist(df, _PERSIST_REGISTRY)

DEC = "decimal(12,4)"
DEC_WIDE = "decimal(20,8)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _views(spark: SparkSession, sf_dir: str, tables: list[str], sql: str) -> DataFrame:
    from ..session import sql_on_views

    return sql_on_views(spark, sf_dir, tables, sql)


def _revenue():
    """The decimal-exact discounted revenue expression — one definition
    (mirrors relational._revenue) so the precision discipline cannot
    drift between copies."""
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )


# --------------------------------------------------------------------------
# Q2: minimum-cost supplier — correlated MIN subquery per part
# --------------------------------------------------------------------------

Q2_SQL = """
WITH supply AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(l_extendedprice / l_quantity) AS ps_cost
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       ps_cost AS supply_cost
FROM part, supply, supplier, nation, region
WHERE p_partkey = ps_partkey
  AND s_suppkey = ps_suppkey
  AND p_size = 15
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_cost = (
      SELECT MIN(ps2.ps_cost)
      FROM supply ps2, supplier s2, nation n2, region r2
      WHERE ps2.ps_partkey = p_partkey
        AND s2.s_suppkey = ps2.ps_suppkey
        AND s2.s_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r2.r_regionkey
        AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest EUROPE supplier per size-15 part.

    Written against the DataFrame API rather than the SQL twin because
    the naive SQL (the oracle) evaluates the ``supply`` CTE TWICE — once
    for the probe rows, once inside the decorrelated per-part MIN — and
    Spark inlines CTEs, so the fact table would be scanned and
    aggregated twice.  Here the region-filtered supply relation is
    built once and ``persist()``-ed; the per-part MIN groupBy and the
    (partkey, cost) equi-join both read the cached relation, so
    lineitem is scanned ONCE (the plan test pins this).  At 100 TB the
    cached relation is |distinct (part, supplier)| rows — orders of
    magnitude under the fact — and the one-scan shape is the difference
    between one and two passes over the dominant table.

    MIN over IEEE doubles is order-independent, so the double division
    is hash-safe (unlike SUM, no summation-order sensitivity).
    LIMIT-with-ties is made deterministic by the 4-key ORDER BY.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_supp = (
        supp.join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    supply_eur = (
        li.filter(F.col("l_quantity") > 0)
        .join(
            broadcast(eur_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_cost"))
    )
    supply_eur = _registered_persist(supply_eur)
    min_cost = supply_eur.groupBy("ps_partkey").agg(
        F.min("ps_cost").alias("min_cost")
    )
    return (
        supply_eur.join(min_cost, ["ps_partkey"])
        .filter(F.col("ps_cost") == F.col("min_cost"))
        .join(broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(broadcast(eur_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("ps_cost").alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and year
# --------------------------------------------------------------------------

Q9_SQL = """
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CAST(
           CAST(l_extendedprice AS DECIMAL(12,4))
             * (1 - CAST(l_discount AS DECIMAL(12,4)))
           AS DECIMAL(20,8))
         - CAST(
           CAST(p_retailprice AS DECIMAL(12,4)) * 0.1
             * CAST(l_quantity AS DECIMAL(12,4))
           AS DECIMAL(20,8))), 4) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN part     ON p_partkey = l_partkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, o_year DESC
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per order-year, cost
    proxied as 10% of p_retailprice (testdata has no ps_supplycost).

    Plan: lineitem⋈orders is the only fact⋈fact shuffle (on orderkey);
    supplier, nation, and the name-filtered part side all broadcast.
    The part filter prunes lineitem rows *before* the orders join via the
    broadcast — join order matters and Catalyst's size estimates pick it.
    Both engines compute the per-row profit in DECIMAL(20,8) and sum
    exactly, so the hash compares digits, not float bits.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    revenue = _revenue().cast(DEC_WIDE)
    cost = (
        F.col("p_retailprice").cast(DEC)
        * F.lit(0.1).cast("decimal(2,1)")
        * F.col("l_quantity").cast(DEC)
    ).cast(DEC_WIDE)
    return (
        li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(revenue - cost), 4).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q11: important stock — scalar-subquery HAVING threshold
# --------------------------------------------------------------------------

Q11_SQL = """
WITH nat_value AS (
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(20,8)) AS value
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
)
SELECT l_partkey AS partkey, CAST(value AS DOUBLE) AS value
FROM nat_value
-- no CAST on the threshold: SUM(DECIMAL)·0.001 is exact in both engines,
-- and casting back to scale 8 would round (Spark HALF_UP vs DuckDB's
-- away-from-zero) — comparing the exact product sidesteps the seam
WHERE value > (SELECT SUM(value) * 0.001 FROM nat_value)
ORDER BY value DESC, partkey
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose NATION_7-supplied revenue exceeds
    0.1% of the nation's total (stock value proxied by lineitem revenue;
    testdata has no partsupp).

    The oracle's scalar subquery re-aggregates the same CTE — Spark
    inlines CTEs, which would scan-and-aggregate the nation-filtered
    fact twice.  The DataFrame form persists ``nat_value`` (one row per
    part — tiny) so the threshold aggregate and the filter both read
    the cache: ONE lineitem scan, with the NATION_7 supplier set
    broadcast-pruning ~96% of rows before the shuffle.  The threshold
    arrives as a 1-row broadcast.  DECIMAL throughout keeps the >
    comparison and the hash exact in both engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_supp = supp.join(
        broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    nat_value = (
        li.join(broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).cast(DEC_WIDE).alias("value"))
    )
    # persisted because BOTH the threshold aggregate and the final filter
    # re-read it; released on the next warehouse_ext call (see registry)
    nat_value = _registered_persist(nat_value)
    threshold = nat_value.agg(
        (F.sum("value") * F.lit(0.001).cast("decimal(4,3)")).alias("thr")
    )
    return (
        nat_value.crossJoin(broadcast(threshold))
        .filter(F.col("value") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value").cast("double").alias("value"),
        )
        .orderBy(F.col("value").desc(), "partkey")
    )


# --------------------------------------------------------------------------
# Q15: top supplier — aggregate view + scalar MAX
# --------------------------------------------------------------------------

Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(20,8))
             AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum Q1-1996 revenue.

    The revenue CTE is a shipdate-pruned scan (predicate reaches parquet)
    + per-suppkey partial agg, ``persist()``-ed so the scalar MAX and the
    supplier join read the cache instead of re-aggregating lineitem (the
    oracle's CTE is evaluated twice — Spark inlines CTEs).  The MAX is a
    1-row broadcast back onto the same aggregate.  DECIMAL revenue makes
    the = comparison exact — the canonical Q15 trap (two suppliers
    within float epsilon of max) cannot produce cross-engine row-set
    differences here.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).cast(DEC_WIDE).alias("total_revenue"))
    )
    revenue = _registered_persist(revenue)  # reread twice; see q11 note
    best = revenue.agg(F.max("total_revenue").alias("best"))
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(broadcast(best))
        .filter(F.col("total_revenue") == F.col("best"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q20: suppliers with excess stock — nested IN-subquery chain
# --------------------------------------------------------------------------

Q20_SQL = """
SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%a%')
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 50)
ORDER BY s_name, s_acctbal
"""


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_3 suppliers who shipped >50 units of some
    matching part in 1996 (availqty>½·qty becomes a shipped-quantity
    HAVING — testdata has no ps_availqty).

    Both IN subqueries decorrelate to semi-joins: part's name filter
    broadcasts into the lineitem scan, the grouped HAVING output
    semi-joins supplier on suppkey.  SUM(l_quantity) is only a *filter*
    threshold (not output), so double summation order cannot affect the
    hash; testdata quantities are integers-as-doubles, exactly
    representable, so the >50 cut is stable in both engines.
    """
    return _views(spark, sf_dir, ["lineitem", "part", "supplier", "nation"], Q20_SQL)


# --------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting — EXISTS / NOT EXISTS pair
# --------------------------------------------------------------------------

Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND o3.o_orderkey = l3.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_11'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier on multi-supplier 'F'
    orders ("late" = shipped >60 days after order date; testdata has no
    commit/receipt dates).

    EXISTS → left-semi and NOT EXISTS → left-anti, both equi-joins on
    l_orderkey.  At sf0.001 the semi probe broadcasts and the anti is an
    SMJ with both sides exchanged on orderkey; at scale both probes
    shuffle on orderkey — the fact's clustering key, so a bucketed-by-
    orderkey layout makes every probe exchange-free.  (The two probe
    subplans differ by the lateness join, so Spark cannot collapse them
    into one ReusedExchange — the anti side legitimately pays its own
    orders join.)  The nation filter broadcasts down to supplier before
    the fact join, so only ~4% of lineitem rows reach the probes.
    COUNT(*) is BIGINT in both engines — no HUGEINT seam.
    """
    return _views(
        spark, sf_dir, ["lineitem", "orders", "supplier", "nation"], Q21_SQL
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q15_top_supplier": q15_top_supplier,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_stock": Q11_SQL,
    "q15_top_supplier": Q15_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
}
