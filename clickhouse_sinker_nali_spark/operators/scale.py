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

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

N_SALTS = 8


def ranked_topk(
    df: DataFrame,
    sort_spec: list[tuple[str, bool]],
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Distributed top-k WITH a dense 1..k rank column — and no
    unpartitioned window anywhere in the plan.

    ``row_number().over(Window.orderBy(...))`` + ``filter(rank <= k)`` is
    the classic top-k anti-pattern: WindowExec moves the ENTIRE input to a
    single partition before ranking (at 100 TB, a single-executor sort of
    billions of rows).  Here the heavy lifting is ``orderBy(...).limit(k)``
    — Spark's TakeOrderedAndProject, a per-partition bounded heap plus a
    k-row merge, fully distributed — and the rank is then recovered from
    the ≤k survivors by packing them into ONE sorted array
    (``collect_list`` → ``array_sort`` with an explicit comparator →
    ``posexplode``), which touches k structs, never the corpus.

    ``sort_spec`` is ``[(column_name, ascending), ...]``; the key set must
    be a TOTAL order (include a unique tiebreaker) over NON-NULL columns —
    the comparator treats an incomparable (NULL) pair as equal, which
    would make the packed order nondeterministic.
    """
    order_cols = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in sort_spec
    ]
    survivors = df.orderBy(*order_cols).limit(k)
    fields = df.columns

    def _cmp(a: Column, b: Column) -> Column:
        expr = F.lit(0)
        for name, asc in reversed(sort_spec):
            lt, gt = (F.lit(-1), F.lit(1)) if asc else (F.lit(1), F.lit(-1))
            expr = (
                F.when(a[name] < b[name], lt)
                .when(a[name] > b[name], gt)
                .otherwise(expr)
            )
        return expr

    packed = survivors.agg(
        F.array_sort(
            F.collect_list(F.struct(*[F.col(c) for c in fields])), _cmp
        ).alias("_arr")
    )
    ex = packed.select(F.posexplode("_arr").alias("_pos", "_s"))
    return ex.select(
        (F.col("_pos") + 1).alias(rank_name),
        *[F.col("_s")[c].alias(c) for c in fields],
    )


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
    # exact-decimal revenue discipline (relational.DEC note): a raw double
    # SUM is partition-summation-order dependent — it hashed differently
    # at sf1 (r7 scale sweep); factor-cast decimal products sum exactly,
    # and ROUND(,4) keeps the decimal→double conversion under 2^53
    price = F.col("l_extendedprice").cast("decimal(12,4)")
    disc = F.col("l_discount").cast("decimal(12,4)")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(price * (F.lit(1).cast("decimal(12,4)") - disc)), 4)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


SKEW_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
            * (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS revenue,
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


# --------------------------------------------------------------------------
# Z-order clustering keys (multi-dimensional data skipping)
# --------------------------------------------------------------------------

ZORDER_BITS = 16


def zorder_key(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints (Morton code).

    Sorting by this key before writing clusters rows so BOTH dimensions
    have tight min/max ranges per parquet row group — point/range filters
    on either column then prune row groups, which a single-column sort only
    gives to its leading column.  Pure integer shift/mask arithmetic:
    codegen'd JVM-side, exact in any engine.
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


GRID_BITS = 8  # per-dimension grid resolution for normalized z-order


def zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys over (user_id, scaled value) for the events table.

    Raw interleaving only clusters dimensions of comparable bit width —
    with user_id in 4 bits and cents in 15, the wide dimension's high bits
    dominate and the key degenerates to a single-column sort (measured:
    user_id chunk spans stayed at the global range).  So each dimension is
    first NORMALIZED to a common 2^8 grid by its global min/max —
    integer-exact arithmetic, min/max from a broadcast 1-row aggregate —
    which is how production z-ordering (e.g. Delta OPTIMIZE ZORDER) maps
    heterogeneous columns onto one curve.  In production the next step is
    ``repartitionByRange(zkey).sortWithinPartitions(zkey).write`` — the
    key computation here is the verifiable part; the write is I/O.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    base = ev.select("event_id", "user_id", cents.alias("value_cents"))
    lims = base.agg(
        F.min("user_id").alias("umin"),
        F.max("user_id").alias("umax"),
        F.min("value_cents").alias("vmin"),
        F.max("value_cents").alias("vmax"),
    )
    gmax = F.lit((1 << GRID_BITS) - 1)

    def grid(col: str, lo: str, hi: str) -> Column:
        # floor((x-lo)*gmax / span): operands are exact integers < 2^53, so
        # the double division is correctly rounded and floor() equals true
        # integer division in BOTH engines (a bare bigint cast would not —
        # DuckDB's double→int cast rounds, Spark's truncates)
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1))
        return F.floor((F.col(col) - F.col(lo)) * gmax / span).cast("bigint")

    return (
        base.join(F.broadcast(lims))
        .select(
            "event_id",
            "user_id",
            "value_cents",
            zorder_key(
                grid("user_id", "umin", "umax"),
                grid("value_cents", "vmin", "vmax"),
                GRID_BITS,
            ).alias("zkey"),
        )
        .orderBy("zkey", "event_id")
    )


def _interleave_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} // {1 << i}) % 2) * {1 << (2 * i)})")
        terms.append(f"((({y} // {1 << i}) % 2) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


_GMAX = (1 << GRID_BITS) - 1

ZORDER_SQL = f"""
WITH base AS (
    SELECT event_id, user_id,
           floor(value * 100 + 0.5)::BIGINT AS value_cents
    FROM events
),
lims AS (
    SELECT MIN(user_id) AS umin, MAX(user_id) AS umax,
           MIN(value_cents) AS vmin, MAX(value_cents) AS vmax
    FROM base
),
gridded AS (
    SELECT event_id, user_id, value_cents,
           floor((user_id - umin) * {_GMAX} / greatest(umax - umin, 1))::BIGINT AS gx,
           floor((value_cents - vmin) * {_GMAX} / greatest(vmax - vmin, 1))::BIGINT AS gy
    FROM base, lims
)
SELECT event_id, user_id, value_cents,
       {_interleave_sql('gx', 'gy', 8)}::BIGINT AS zkey
FROM gridded
ORDER BY zkey, event_id
"""


# --------------------------------------------------------------------------
# Date-partitioned layout: static + dynamic partition pruning
# --------------------------------------------------------------------------


def write_date_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Persist a fact table hive-partitioned by event day.

    THE first-order layout decision for a 100 TB event store: a filter or
    join on ``day`` then prunes whole directories at planning time (static
    pruning) or at runtime via a broadcast-built filter (dynamic partition
    pruning), so a one-day query touches 1/365th of the bytes.  Daily
    partition counts stay in the thousands over years — well inside
    metastore/list limits (contrast with partitioning by a high-cardinality
    key, which would melt the file listing).
    """
    (
        df.withColumn("day", F.to_date(ts_col))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def pruned_daily_totals(spark: SparkSession, path: str, day_lo: str, day_hi: str) -> DataFrame:
    """Aggregate a day range from a date-partitioned store.

    The ``day`` predicate is a partition filter — .explain() shows it under
    PartitionFilters (directory-level skip), NOT PushedFilters (row-group
    skip): files outside the range are never opened, listed bytes only.
    """
    ev = spark.read.parquet(path)
    return (
        ev.filter((F.col("day") >= F.lit(day_lo)) & (F.col("day") <= F.lit(day_hi)))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("day")
    )


def dpp_join_daily(spark: SparkSession, path: str, dim: DataFrame) -> DataFrame:
    """Join the partitioned facts against a small day-dimension.

    With the dim filtered (e.g. 'holiday days only'), Catalyst inserts a
    dynamic-pruning subquery on the fact scan: the dim's day set is built
    first (broadcast reuse) and only matching fact partitions are read.
    This is how a 100 TB store answers dim-driven slices without static
    literals in the query text.
    """
    ev = spark.read.parquet(path)
    return (
        ev.join(dim, "day")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Runtime bloom-filter join pruning (shuffle-join row pre-filtering)
# --------------------------------------------------------------------------


def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle join where a runtime bloom filter built from the SELECTIVE
    side pre-filters the large side's rows BEFORE the shuffle — at 100 TB
    this is the difference between shuffling the full fact table and
    shuffling only the ~matching fraction when a dim filter is selective
    but the dim is too big (or too late-planned) to broadcast.

    Catalyst injects the filter itself (``runtime.bloomFilter.enabled``,
    on by default in Spark 4) once the application side exceeds
    ``applicationSideScanSizeThreshold`` (default 10 GB — i.e. exactly the
    100 TB regime; the test lowers it to 0 to demonstrate on local data).
    The plan then shows ``might_contain(...)`` under the fact scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(12,4)")).alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# Small-file compaction (the nightly maintenance pass of a 100 TB store)
# --------------------------------------------------------------------------


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    sort_key: str,
    target_files: int = 4,
    max_records_per_file: int = 0,
) -> int:
    """Rewrite a fragmented parquet dataset into ``target_files``
    range-clustered files sorted by ``sort_key``; returns the output file
    count.

    Streaming sinks emit one file per micro-batch per partition — after a
    day a 1000-executor ingest has produced millions of KB-sized files and
    every scan pays open/footer/seek costs per file.  The compaction pass
    is ``repartitionByRange(sort_key)`` (one skew-aware range shuffle —
    Spark samples the key to build balanced boundaries) +
    ``sortWithinPartitions`` so each output file covers a disjoint key
    interval: parquet min/max footer stats then let later scans skip whole
    files on ``sort_key`` predicates.  ``maxRecordsPerFile`` caps file
    size without an extra shuffle when row width varies.
    """
    df = spark.read.parquet(src_path)
    writer = (
        df.repartitionByRange(target_files, F.col(sort_key))
        .sortWithinPartitions(sort_key)
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(dst_path)
    import os

    return len(
        [f for f in os.listdir(dst_path) if f.endswith(".parquet")]
    )


# --------------------------------------------------------------------------
# Schema-evolution reads: the parquet-lake twin of the dynamic-schema sink
# --------------------------------------------------------------------------


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory written over time with a DRIFTING schema.

    The lake-side mirror of the reference's dynamic-schema path (reference
    ``task/task.go`` newKeys → ALTER TABLE, twinned for JDBC in
    ``streaming/dynamic.py``): a 100 TB corpus is written over months, and
    later batches carry columns earlier ones lack.  ``mergeSchema`` makes
    the footer union the read schema; files missing a column yield typed
    nulls — no rewrite of old data, exactly like ClickHouse ALTER's
    default-valued historical parts.

    Cost note: mergeSchema reads every file footer up front — O(files),
    driver-side.  At millions of files pin the schema instead (catalog or
    ``align_to_schema`` below) and keep per-query footer work to the
    pruned subset.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def align_to_schema(df: DataFrame, target) -> DataFrame:
    """Project ``df`` onto ``target`` (a StructType): missing columns
    become typed nulls, present ones cast to the target type, extras drop.

    The write-side half of evolution: every batch aligns to the catalog
    schema before landing, so readers never need mergeSchema.  This is the
    same column-set reconciliation the JDBC sink does with ALTER TABLE
    (``streaming/dynamic.py``), expressed as a projection — map-side only,
    no shuffle, safe to prepend to any writer.
    """
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            src = F.col(f.name)
            cols.append(
                src.alias(f.name) if have[f.name].dataType == f.dataType
                else src.cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


# --------------------------------------------------------------------------
# Partition-lifecycle retention (ClickHouse TTL twin)
# --------------------------------------------------------------------------


def apply_ttl(
    spark: SparkSession, path: str, keep_days: int, now_day: str
) -> dict[str, list[str]]:
    """Drop whole day-partitions older than ``now_day - keep_days`` from a
    :func:`write_date_partitioned` layout — the twin of ClickHouse's
    ``TTL event_time + INTERVAL n DAY`` partition expiry, which sinker
    deployments lean on for log retention (their target tables carry TTL
    clauses; the sinker itself never deletes).

    This is deliberately a PARTITION-level operation: expiring data by
    rewriting row-filtered files costs a full scan of the table, while
    dropping aged partition directories is pure metadata — the only
    retention strategy that holds at 100 TB.  Rows inside a kept
    partition are never touched, so the cut is exactly at the partition
    boundary (as in ClickHouse, where TTL granularity = partition key).

    Returns ``{"dropped": [...], "kept": [...]}`` partition day names —
    the audit record a retention job must emit.
    """
    import shutil
    from datetime import date, timedelta

    cutoff = date.fromisoformat(now_day) - timedelta(days=keep_days)
    dropped, kept = [], []
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("day="):
            continue
        day = entry.split("=", 1)[1]
        if date.fromisoformat(day) < cutoff:
            shutil.rmtree(os.path.join(path, entry))
            dropped.append(day)
        else:
            kept.append(day)
    return {"dropped": dropped, "kept": kept}


def row_ttl_filter(df: DataFrame, ts_col: str, keep_days: int, now_ts: str) -> DataFrame:
    """Row-level TTL as a read-side predicate (ClickHouse row TTL twin)
    for the cases where expiry must cut INSIDE a partition; the filter
    pushes to the parquet scan, so readers pay nothing for expired rows
    even before a compaction rewrites them out."""
    return df.filter(
        F.col(ts_col) >= F.to_timestamp(F.lit(now_ts)) - F.expr(f"INTERVAL {int(keep_days)} DAYS")
    )


# --------------------------------------------------------------------------
# Adaptive skew salting: derive per-key salt factors from observed skew
# --------------------------------------------------------------------------

SALT_TARGET_ROWS = 20  # target rows per (key, salt) reducer slice


def adaptive_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_salt_source: Column,
    target_rows: int = SALT_TARGET_ROWS,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join whose salt factor is PER KEY, derived from the
    left side's observed key histogram — the production form of
    :func:`salted_join`: a fixed global n_salts over-replicates the right
    side for every COLD key (n_salts× shuffle on rows that never needed
    it) while under-splitting the hottest ones; here each key gets
    ``ceil(count/target)`` salts, so replication is paid exactly where
    skew exists.

    The histogram is one map-combined count on the join key (tiny
    relation, broadcast back onto BOTH sides); row-level results remain
    identical to the plain join — pinned by the oracle running unsalted.
    At 100 TB the histogram pass is the same scan AQE's skew-join
    statistics come from; this operator is the declarative version that
    also works for aggregate-free shuffles AQE cannot rewrite.
    """
    if how != "inner":
        # Both sides are pre-joined (inner) against the left-derived factor
        # table, so any non-inner `how` would silently drop right-only keys
        # and outer-null rows — refuse rather than diverge from the plain
        # join this function promises row-identical results with.
        raise ValueError(
            f"adaptive_salted_join supports how='inner' only, got {how!r}"
        )
    hist = left.groupBy(on).agg(F.count(F.lit(1)).alias("__n"))
    factors = hist.select(
        on,
        F.greatest(
            F.lit(1), F.ceil(F.col("__n") / F.lit(target_rows))
        ).cast("int").alias("__nsalt"),
    )
    l_f = left.join(F.broadcast(factors), on)
    salted_l = l_f.withColumn(
        "__salt", F.pmod(F.xxhash64(left_salt_source), F.col("__nsalt"))
    ).drop("__nsalt")
    r_f = right.join(F.broadcast(factors), on)
    salted_r = r_f.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.col("__nsalt") - 1))
    ).drop("__nsalt")
    return salted_l.join(salted_r, [on, "__salt"], how).drop("__salt")


def skew_join_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join revenue rollup with PER-KEY salt factors derived
    from the lineitem key histogram; oracle = the plain unsalted join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = adaptive_salted_join(li, orders, "l_orderkey", F.col("l_linenumber"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ).cast("double"),
                4,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


SKEW_ADAPTIVE_SQL = """
SELECT o.o_orderpriority,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""
