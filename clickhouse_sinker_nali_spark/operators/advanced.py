"""Second-wave operators: nested-path extraction, anti-join series dedup,
pivot, semi/anti subqueries, percentiles.

Fills the remaining SURVEY.md §2 inventory lines (P2 gjson nested paths,
J3 series left-anti dedup) and rounds out the analytics layer's
free-capability surface (pivot, EXISTS/NOT EXISTS, exact percentiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import portable_hash64, portable_hash64_sql
from ..parsers import parse_json
from ..schema import TableSchema
from ..session import load_table

DEC = "decimal(12,4)"


# --------------------------------------------------------------------------
# P2: gjson-style nested path extraction through the real parser
# --------------------------------------------------------------------------


def nested_json_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dotted source names address nested JSON (gjson path semantics,
    reference parser/gjson.go:37-316): build a nested message from orders,
    re-extract scalars via the engine's dotted-path dims.

    The nested extraction compiles to ``get_json_object`` — still JVM-side.
    """
    orders = load_table(spark, sf_dir, "orders")
    value = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("key"),
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.struct(F.col("o_totalprice").alias("amount")).alias("money"),
            ).alias("meta"),
        )
    )
    msgs = orders.select(value.alias("value"))
    schema = TableSchema.from_dims(
        [
            {"name": "okey", "type": "Int64", "sourcename": "key"},
            {"name": "status", "type": "String", "sourcename": "meta.status"},
            {"name": "amount", "type": "Float64", "sourcename": "meta.money.amount"},
            {"name": "absent", "type": "Nullable(String)", "sourcename": "meta.nope.x"},
        ]
    )
    return parse_json(msgs, schema).orderBy("okey")


NESTED_JSON_SQL = """
SELECT o_orderkey AS okey,
       o_orderstatus AS status,
       o_totalprice AS amount,
       NULL::VARCHAR AS absent
FROM orders
ORDER BY okey
"""


# --------------------------------------------------------------------------
# J3: series dedup as a left-anti join against the preloaded series set
# --------------------------------------------------------------------------


def _series_label() -> "F.Column":
    """The Prometheus series label string (sorted name###value pairs over
    the string dims — reference model/message.go:174-209).  ONE definition
    shared by every operator that derives a series_id, with
    :func:`_series_label_sql` as its byte-identical SQL twin — the pair
    must never drift apart or series ids diverge between operators."""
    return F.concat(
        F.lit("###event_type###"),
        F.col("event_type"),
        F.lit("###user_id###"),
        F.col("user_id").cast("string"),
    )


def _series_label_sql() -> str:
    return "'###event_type###' || event_type || '###user_id###' || user_id::VARCHAR"


def series_antijoin_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-only-new-series semantics (reference output/clickhouse.go:110-130):
    the reference preloads existing ``__series_id``s into a roaring bitmap
    and CheckedAdd-filters; Spark shape = left-anti join of the batch's
    distinct series against the existing series table.

    'Existing' here: series first seen by user_id < 10 (a deterministic
    stand-in for the preload scan S6).  At scale the anti-join shuffles
    only distinct series ids — tiny relative to the metric stream.
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        portable_hash64(_series_label()).alias("series_id"),
        "event_type",
        "user_id",
    )
    batch_series = tagged.distinct()
    existing = tagged.filter(F.col("user_id") < 10).select("series_id").distinct()
    return (
        batch_series.join(existing, "series_id", "left_anti")
        .orderBy("series_id")
    )


_SERIES_HASH = portable_hash64_sql(_series_label_sql())

SERIES_ANTIJOIN_SQL = f"""
WITH tagged AS (
    SELECT DISTINCT {_SERIES_HASH} AS series_id, event_type, user_id
    FROM events
), existing AS (
    SELECT DISTINCT {_SERIES_HASH} AS series_id
    FROM events WHERE user_id < 10
)
SELECT t.series_id, t.event_type, t.user_id
FROM tagged t
ANTI JOIN existing e ON t.series_id = e.series_id
ORDER BY t.series_id
"""


# --------------------------------------------------------------------------
# Pivot
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into columns, exact decimal sums per user bucket.

    Explicit pivot values (no discovery pass) keep this a single
    aggregate — with values listed, Spark skips the extra distinct job.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.col("user_id") % 10).alias("user_bucket")
    return (
        ev.select(bucket, "event_type", F.col("value").cast(DEC).alias("v"))
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum("v").cast("double"))
        .orderBy("user_bucket")
    )


PIVOT_SQL = f"""
SELECT (user_id % 10) AS user_bucket,
       {', '.join(
           "CAST(SUM(CASE WHEN event_type = '" + t + "' THEN CAST(value AS DECIMAL(12,4)) END) AS DOUBLE) AS " + t
           for t in _EVENT_TYPES
       )}
FROM events
GROUP BY user_bucket
ORDER BY user_bucket
"""


# --------------------------------------------------------------------------
# Semi / anti subqueries
# --------------------------------------------------------------------------


def customers_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS shapes: customers with vs without orders.

    left_semi / left_anti joins — the planner's native form for correlated
    EXISTS; both are single hash joins on custkey (broadcastable dim).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select(F.col("o_custkey").alias("c_custkey"))
    with_orders = (
        cust.join(keys, "c_custkey", "left_semi")
        .select("c_custkey", "c_name", F.lit("active").alias("status"))
    )
    without = (
        cust.join(keys, "c_custkey", "left_anti")
        .select("c_custkey", "c_name", F.lit("dormant").alias("status"))
    )
    return with_orders.unionByName(without).orderBy("c_custkey")


SEMI_ANTI_SQL = """
SELECT c_custkey, c_name, 'active' AS status
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, c_name, 'dormant' AS status
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# Percentiles (exact, interpolated)
# --------------------------------------------------------------------------


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 of order price per priority, as RANK-BASED order
    statistics (percentile_disc semantics): the k-th smallest value with
    k = ceil(q·n) — an actual observed price, identical across engines by
    construction (the ``winsorize_values`` discipline; interpolated
    percentiles were the class that diverged at sf1 under tie runs, and
    Spark's exact ``percentile`` additionally buffers every group value
    in ONE aggregation buffer — a per-group OOM at 100 TB, where this
    rank-window form is just a distributed sort).  At petabyte scale
    you'd swap in ``approx_percentile`` (t-digest, no sort) and accept
    the rows-only check, like approx_count_distinct.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    n_per = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    k50 = F.ceil(F.lit(0.5) * F.col("n")).cast("bigint")
    k90 = F.ceil(F.lit(0.9) * F.col("n")).cast("bigint")
    return (
        orders.join(F.broadcast(n_per), "o_orderpriority")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == k50) | (F.col("rn") == k90))
        .groupBy("o_orderpriority")
        .agg(
            F.min(F.when(F.col("rn") == k50, F.col("o_totalprice")))
            .alias("p50"),
            F.min(F.when(F.col("rn") == k90, F.col("o_totalprice")))
            .alias("p90"),
            F.max("n").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


PERCENTILES_SQL = """
WITH nn AS (
    SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority
),
rk AS (
    SELECT o.o_orderpriority, o.o_totalprice, nn.n,
           ROW_NUMBER() OVER (PARTITION BY o.o_orderpriority
                              ORDER BY o.o_totalprice) AS rn
    FROM orders o JOIN nn USING (o_orderpriority)
)
SELECT o_orderpriority,
       MIN(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                THEN o_totalprice END) AS p50,
       MIN(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                THEN o_totalprice END) AS p90,
       MAX(n) AS n_orders
FROM rk
WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)
   OR rn = CAST(CEIL(0.9 * n) AS BIGINT)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Time-bucket rollup (hypertable-style continuous aggregate shape)
# --------------------------------------------------------------------------


def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup per event_type: count, exact sum, min/max.

    ``date_trunc`` keys the aggregate directly — no materialized bucket
    column, map-side combine collapses each partition to ≤ buckets×types
    rows.  This is the continuous-aggregate building block: at 100 TB the
    rollup runs incrementally per micro-batch and merges by (bucket, type),
    which is exactly this aggregate re-run over the delta.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("bucket", "event_type")
    )


TIME_BUCKET_SQL = """
SELECT date_trunc('hour', ts) AS bucket,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY bucket, event_type
ORDER BY bucket, event_type
"""


# --------------------------------------------------------------------------
# Prometheus metric-table side (the other half of the series split)
# --------------------------------------------------------------------------


def prometheus_metric_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-table rows (reference model/message.go:171-212): numeric dims
    + the series id + the timestamp as epoch seconds (ElasticDateTime
    internal type → int64 seconds, reference model/value.go:152).
    Compact summary per series so the oracle is stable at any SF.
    """
    ev = load_table(spark, sf_dir, "events")
    metric = ev.select(
        portable_hash64(_series_label()).alias("series_id"),
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.col("value").cast(DEC).alias("v"),
    )
    return (
        metric.groupBy("series_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("ts_epoch").alias("first_ts"),
            F.max("ts_epoch").alias("last_ts"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .orderBy("series_id")
    )


PROMETHEUS_METRIC_SQL = f"""
SELECT {portable_hash64_sql(_series_label_sql())}
           AS series_id,
       COUNT(*) AS n_points,
       MIN(floor(epoch(ts))::BIGINT) AS first_ts,
       MAX(floor(epoch(ts))::BIGINT) AS last_ts,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY series_id
ORDER BY series_id
"""


# --------------------------------------------------------------------------
# deterministic sampling / dataset splits (hash-gated, not RNG)
# --------------------------------------------------------------------------

# per-language keep rates (per-mille) for the stratified sample — downsample
# the majority language, keep more of the tails (the standard data-mixing
# move in pretraining pipelines)
_STRATA_RATES = {"en": 300, "es": 600, "de": 600, "fr": 600, "zh": 900}
_DEFAULT_RATE = 500
_SPLIT_SALT = "split:"
_SAMPLE_SALT = "sample:"


def sample_gate() -> "F.Column":
    """Boolean keep-gate for the stratified sample, as a reusable expression
    (also consumed by the fused curation pipeline)."""
    gate = F.pmod(
        portable_hash64(F.concat(F.lit(_SAMPLE_SALT), F.col("doc_id").cast("string"))),
        F.lit(1000),
    )
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in _STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return gate < rate


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sample via a hash gate, not an RNG.

    ``keep ⇔ hash(salt‖doc_id) mod 1000 < rate(lang)`` — a pure map-side
    filter: no shuffle, no seed-state, reproducible row-for-row on any
    cluster size and under task retries (Spark's ``sample()`` is
    per-partition-seeded, so its row set changes with partitioning — a
    silent non-determinism at 100 TB that hash gating removes; this is also
    the only formulation a SQL oracle can replay exactly).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(sample_gate()).select("doc_id", "lang").orderBy("doc_id")
    )


_RATE_CASE = (
    "CASE "
    + " ".join(f"WHEN lang = '{lang}' THEN {r}" for lang, r in _STRATA_RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)

STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang
FROM documents
WHERE ({portable_hash64_sql("'" + _SAMPLE_SALT + "' || doc_id::VARCHAR")}) % 1000
      < {_RATE_CASE}
ORDER BY doc_id
"""


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by content-stable hash bucket,
    reported as per-(split, lang) counts.

    The split key hashes ``doc_id`` with a dedicated salt so it is
    independent of every other hash gate in the pipeline (sampling with the
    same hash would correlate: the sample's survivors would all land in the
    same split region).  Assignment is map-side; only the tiny count
    aggregation shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        portable_hash64(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


_SPLIT_BUCKET = f"({portable_hash64_sql(chr(39) + _SPLIT_SALT + chr(39) + ' || doc_id::VARCHAR')}) % 100"

TRAIN_VAL_TEST_SQL = f"""
SELECT CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train'
            WHEN {_SPLIT_BUCKET} < 90 THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs
FROM documents
GROUP BY split, lang
ORDER BY split, lang
"""


# --------------------------------------------------------------------------
# multi-resolution rollup cascade (continuous-aggregate / hypertable pattern)
# --------------------------------------------------------------------------


def multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour → day → week rollups where each coarser level RE-AGGREGATES the
    finer one instead of rescanning the raw table.

    This is the hypertable/continuous-aggregate cascade: at 100 TB the raw
    scan happens once for the finest resolution; every coarser tier
    re-aggregates ≤ |buckets| rows (thousands, not billions) by merging
    partials — counts add, decimal sums add exactly, min/min and max/max
    compose.  The DuckDB oracle computes every tier directly from raw
    events, so the hash match PROVES partial-aggregate merging is lossless
    (the reason the sums run over DECIMAL, not IEEE doubles).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("sum_dec"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )

    def coarsen(df: DataFrame, unit: str) -> DataFrame:
        return (
            df.groupBy(
                F.date_trunc(unit, F.col("bucket")).alias("bucket"), "event_type"
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_dec").alias("sum_dec"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )

    daily = coarsen(hourly, "day")
    weekly = coarsen(daily, "week")
    tiers = [
        hourly.withColumn("resolution", F.lit("hour")),
        daily.withColumn("resolution", F.lit("day")),
        weekly.withColumn("resolution", F.lit("week")),
    ]
    out = tiers[0].unionByName(tiers[1]).unionByName(tiers[2])
    return out.select(
        "resolution",
        "bucket",
        "event_type",
        "n",
        F.col("sum_dec").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    ).orderBy("resolution", "bucket", "event_type")


def _tier_sql(unit: str) -> str:
    return f"""
    SELECT '{unit}' AS resolution, date_trunc('{unit}', ts) AS bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY bucket, event_type"""


MULTIRES_ROLLUP_SQL = (
    _tier_sql("hour")
    + "\nUNION ALL"
    + _tier_sql("day")
    + "\nUNION ALL"
    + _tier_sql("week")
    + "\nORDER BY resolution, bucket, event_type"
)


SAMPLE_PER_GROUP_N = 3


def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic N-per-group sampling: keep the 3 docs per language
    with the smallest salted hash (the keep-policy step after clustering:
    'retain k representatives per group').

    hash-order = uniform random order, but reproducible and partition-
    independent; the window ranks within each group in one shuffle.  At
    100 TB with millions of groups this stays a single hash-partitioned
    window; for top-k per VERY hot group sizes, pre-aggregate with a
    per-partition partial top-k first (same trick as TakeOrdered).
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash64(F.concat(F.lit("pergrp:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= SAMPLE_PER_GROUP_N)
        .orderBy("lang", "rank")
    )


_PERGRP_HASH = portable_hash64_sql("'pergrp:' || doc_id::VARCHAR")

SAMPLE_PER_GROUP_SQL = f"""
SELECT doc_id, lang, rank FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY {_PERGRP_HASH}, doc_id) AS rank
    FROM documents
)
WHERE rank <= {SAMPLE_PER_GROUP_N}
ORDER BY lang, rank
"""


# --------------------------------------------------------------------------
# Time-series gap-fill + LOCF (hypertable-style time_bucket_gapfill)
# --------------------------------------------------------------------------

GAPFILL_THRESHOLD = 250.0


def gapfill_daily_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily metric series with missing days materialized and the value
    carried forward (TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape).

    The sparse series is high-value purchases (value > 250 — absent on
    most days at every SF); the calendar spine spans the FULL events range
    so gaps are real.  Three stages, all post-aggregation tiny:

    1. daily aggregate of the sparse subset (map-side combine, one shuffle);
    2. spine = explode(sequence(min_day, max_day, 1 day)) computed from a
       1-row bounds aggregate — no driver round-trip, no collect;
    3. left join spine⋈daily + ``last(value, ignoreNulls)`` over the
       day-ordered window = LOCF.

    The LOCF window is a single global ordering, which is fine HERE and at
    100 TB too: it runs over the daily aggregate (≤ tens of thousands of
    rows for decades of days), not over raw events.  avg is computed as
    exact-decimal sum / count → bit-stable across engines.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > GAPFILL_THRESHOLD))
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
                "avg_value"
            ),
        )
    )
    spine = (
        ev.agg(
            F.date_trunc("day", F.min("ts")).alias("lo"),
            F.date_trunc("day", F.max("ts")).alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("locf_avg_value"),
        )
        .orderBy("day")
    )


GAPFILL_SQL = f"""
WITH daily AS (
    SELECT date_trunc('day', ts) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    WHERE event_type = 'purchase' AND value > {GAPFILL_THRESHOLD}
    GROUP BY 1
), spine AS (
    SELECT unnest(generate_series(
        (SELECT date_trunc('day', MIN(ts)) FROM events),
        (SELECT date_trunc('day', MAX(ts)) FROM events),
        INTERVAL 1 DAY)) AS day
)
SELECT spine.day,
       COALESCE(daily.n_events, 0) AS n_events,
       LAST_VALUE(daily.avg_value IGNORE NULLS) OVER (
           ORDER BY spine.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_avg_value
FROM spine LEFT JOIN daily ON spine.day = daily.day
ORDER BY spine.day
"""


# --------------------------------------------------------------------------
# Funnel analysis: ordered event-sequence progression per user
# --------------------------------------------------------------------------


def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel: users whose FIRST click follows
    their first view, and first purchase follows that click.

    One scan + one conditional aggregation per user (min-ts per stage via
    CASE, strictly-after chaining in the projection) — no self-joins, so
    at 100 TB it is a single shuffle on user_id.  Event-analytics staple
    the reference cannot express.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click_any"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy_any"),
    )
    # strictly-ordered progression on first-occurrence timestamps
    staged = per_user.select(
        F.col("t_view").isNotNull().alias("s1"),
        (
            F.col("t_view").isNotNull()
            & F.col("t_click_any").isNotNull()
            & (F.col("t_click_any") > F.col("t_view"))
        ).alias("s2"),
        (
            F.col("t_view").isNotNull()
            & F.col("t_click_any").isNotNull()
            & (F.col("t_click_any") > F.col("t_view"))
            & F.col("t_buy_any").isNotNull()
            & (F.col("t_buy_any") > F.col("t_click_any"))
        ).alias("s3"),
    )
    return staged.agg(
        F.sum(F.col("s1").cast("long")).alias("n_viewed"),
        F.sum(F.col("s2").cast("long")).alias("n_clicked_after_view"),
        F.sum(F.col("s3").cast("long")).alias("n_purchased_after_click"),
    )


FUNNEL_SQL = """
WITH per_user AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click_any,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy_any
    FROM events GROUP BY user_id
)
SELECT CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_viewed,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click_any > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click_any > t_view
                 AND t_buy_any > t_click_any
                THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after_click
FROM per_user
"""


# --------------------------------------------------------------------------
# Cohort retention: first-seen week × activity-week-offset matrix
# --------------------------------------------------------------------------


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week;
    for each (cohort_week, weeks_since) cell, how many distinct users were
    active.  Two shuffles (first-seen per user, then the matrix agg) —
    the product-analytics staple.

    Week boundaries via date_trunc('week') — ISO Monday start in both
    engines.  Week columns stay TIMESTAMP (no to_date): the driver's
    pandas-based comparator renders a Spark DateType as ``2024-01-01``
    but a DuckDB DATE as datetime64 midnight — keeping both sides
    timestamp-typed is the only representation that hashes identically.
    """
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7).cast("long").alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "weeks_since")
    )


COHORT_SQL = """
WITH first_seen AS (
    SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week
    FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, act_week) / 7 AS BIGINT) AS weeks_since,
       COUNT(DISTINCT user_id) AS n_users
FROM activity JOIN first_seen USING (user_id)
GROUP BY cohort_week, weeks_since
ORDER BY cohort_week, weeks_since
"""


# --------------------------------------------------------------------------
# Mergeable quantile sketch: deterministic bottom-k hash sample per group
# --------------------------------------------------------------------------

_QSK_K = 128
_QSK_QS = (0.5, 0.9, 0.99)


def quantile_sketch_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile estimates from a bottom-k-by-hash sample.

    The sketch = the k rows with the smallest salted content hash per
    group.  Like t-digest/KLL it is MERGEABLE — bottom-k(A ∪ B) =
    bottom-k(bottom-k(A) ∪ bottom-k(B)) — so partial sketches combine
    associatively across partitions/days with fixed size.  Unlike those,
    it is fully deterministic and hash-reproducible, so the DuckDB oracle
    verifies it exactly (approx_percentile-style sketches only get a
    rows-only check).  At 100 TB: the sample rank is one window over a
    hash-partitioned shuffle; everything after runs on ≤k rows per group.
    Estimate error is the classic bottom-k sampling bound (~1/sqrt(k)).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    h = portable_hash64(F.concat(F.lit("qsk:"), F.col("event_id").cast("string")))
    w = Window.partitionBy("event_type").orderBy(h.asc(), F.col("event_id"))
    sample = (
        ev.select("event_type", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _QSK_K)
    )
    wv = Window.partitionBy("event_type").orderBy(F.col("value"), F.col("event_id"))
    ranked = sample.select(
        "event_type",
        "value",
        F.row_number().over(wv).alias("vr"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n_s"),
    )
    aggs = [F.max("n_s").alias("n_sample")] + [
        F.max(
            F.when(F.col("vr") == F.ceil(F.lit(q) * F.col("n_s")), F.col("value"))
        ).alias(f"p{int(q * 100)}")
        for q in _QSK_QS
    ]
    return ranked.groupBy("event_type").agg(*aggs).orderBy("event_type")


_QSK_HASH = portable_hash64_sql("'qsk:' || event_id::VARCHAR")

QUANTILE_SKETCH_SQL = f"""
WITH sample AS (
    SELECT event_type, event_id, value
    FROM (
        SELECT event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY {_QSK_HASH}, event_id) AS rn
        FROM events
    )
    WHERE rn <= {_QSK_K}
), ranked AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS vr,
           COUNT(*) OVER (PARTITION BY event_type) AS n_s
    FROM sample
)
SELECT event_type,
       MAX(n_s) AS n_sample,
       MAX(CASE WHEN vr = CEIL(0.5 * n_s) THEN value END) AS p50,
       MAX(CASE WHEN vr = CEIL(0.9 * n_s) THEN value END) AS p90,
       MAX(CASE WHEN vr = CEIL(0.99 * n_s) THEN value END) AS p99
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# --------------------------------------------------------------------------

_KMV_K = 256
_KMV_SALTS = 32  # phase-1 fan-out of the two-phase distributed bottom-k
_KMV_SPACE = float(1 << 60)  # portable_hash64 is uniform on [0, 2^60)


def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-user estimate per event_type from the k smallest
    hashes (the KMV/bottom-k theta-sketch estimator).

    The sketch is the k minimum hash values of the key set — like HLL it is
    MERGEABLE (union = merge bottom-k sets, re-truncate) so per-partition /
    per-day partials combine associatively, but unlike HLL it is exactly
    reproducible in the DuckDB oracle (Spark's approx_count_distinct gets a
    rows-only check for the same reason).  Estimator: with the kth smallest
    of n uniform hashes at fraction u of the space, NDV ≈ (k-1)/u — the
    classic KMV unbiased estimate (Bar-Yossef et al. 2002, "Counting
    distinct elements in a data stream").  Error ~ 1/sqrt(k) ≈ 6% at k=256.

    Scale shape: one map-side-combined distinct on (event_type, hash) — at
    100 TB the partial agg collapses per-key duplicates before the shuffle
    — then a per-group bottom-k window over ≤ groups×k rows.  The exact NDV
    column (what the sketch approximates) rides the same shuffle.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    h = portable_hash64(F.concat(F.lit("kmv:"), F.col("user_id").cast("string")))
    hashes = ev.select("event_type", h.alias("hv")).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    ranked = hashes.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("exact_ndv"),
            F.max(F.when(F.col("rn") == _KMV_K, F.col("hv"))).alias("kth_hash"),
        )
        .select(
            "event_type",
            "exact_ndv",
            "kth_hash",
            # RAW double: the division chain is IEEE-identical across
            # engines, and engine ROUND() is not (DuckDB rounds the
            # shortest decimal repr) — the checker canonicalizes at 6dp
            F.when(
                F.col("kth_hash").isNotNull(),
                F.lit(float(_KMV_K - 1))
                / (F.col("kth_hash").cast("double") / F.lit(_KMV_SPACE)),
            )
            .otherwise(F.col("exact_ndv").cast("double"))
            .alias("est_ndv"),
        )
        .orderBy("event_type")
    )


_KMV_HASH = portable_hash64_sql("'kmv:' || user_id::VARCHAR")

KMV_SKETCH_SQL = f"""
WITH hashes AS (
    SELECT DISTINCT event_type, {_KMV_HASH} AS hv FROM events
), ranked AS (
    SELECT event_type, hv,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
    FROM hashes
)
SELECT event_type, exact_ndv, kth_hash,
       CASE WHEN kth_hash IS NOT NULL
            THEN {_KMV_K - 1}.0 / (kth_hash::DOUBLE / {_KMV_SPACE!r}::DOUBLE)
            ELSE exact_ndv::DOUBLE END AS est_ndv
FROM (
    SELECT event_type, COUNT(*) AS exact_ndv,
           MAX(CASE WHEN rn = {_KMV_K} THEN hv END) AS kth_hash
    FROM ranked GROUP BY event_type
)
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Z-score outlier days (per-type daily volume anomaly detection)
# --------------------------------------------------------------------------

_ZSCORE_CUT = 2.0


def zscore_day_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose event volume deviates > 2σ from that event_type's mean
    daily volume — the monitoring/data-quality staple (traffic spikes,
    ingestion gaps).

    Numeric determinism: counts are integers, so mean and variance are
    derived from exact integer sums with the SAME expression order in both
    engines (mean = sum/n; var = sum_sq/n - mean²) — no stddev builtin,
    whose summation order is engine-dependent.  Two shuffles: daily counts
    (map-side combined), then the tiny per-type stats broadcast back onto
    the daily rows.
    """
    ev = load_table(spark, sf_dir, "events")
    # day stays TIMESTAMP (no to_date): Spark DateType and DuckDB DATE
    # render differently through the driver's pandas comparator
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_days")
    # GREATEST(var, 0): the cancellation form ss/n - mean^2 can go a hair
    # negative on near-constant large counts; unguarded, DuckDB's sqrt
    # throws where Spark yields NaN.  sd > 0 excludes the degenerate
    # all-identical case (z undefined) identically in both engines.
    var = F.greatest(
        F.col("ss").cast("double") / F.col("n_days") - mean * mean, F.lit(0.0)
    )
    sd = F.sqrt(var)
    z = (F.col("n").cast("double") - mean) / sd
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            # RAW doubles (exact-int sums + IEEE division/sqrt are
            # bit-identical across engines; engine ROUND is not) — the
            # checker canonicalizes at 6dp, and the filter reads the raw z
            mean.alias("mean_daily"),
            z.alias("zscore"),
            sd.alias("__sd"),
        )
        .filter((F.col("__sd") > 0) & (F.abs(F.col("zscore")) > _ZSCORE_CUT))
        .drop("__sd")
        .orderBy("event_type", "day")
    )


ZSCORE_ANOMALY_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n
    FROM events GROUP BY 1, 2
), stats AS (
    SELECT event_type, COUNT(*) AS n_days, SUM(n) AS s, SUM(n * n) AS ss
    FROM daily GROUP BY event_type
)
SELECT event_type, day, n, mean_daily, zscore
FROM (
    SELECT d.event_type, d.day, d.n,
           t.s::DOUBLE / t.n_days AS mean_daily,
           (d.n::DOUBLE - t.s::DOUBLE / t.n_days)
               / sqrt(GREATEST(t.ss::DOUBLE / t.n_days
                      - (t.s::DOUBLE / t.n_days) * (t.s::DOUBLE / t.n_days),
                      0.0)) AS zscore,
           sqrt(GREATEST(t.ss::DOUBLE / t.n_days
                - (t.s::DOUBLE / t.n_days) * (t.s::DOUBLE / t.n_days),
                0.0)) AS sd
    FROM daily d JOIN stats t ON d.event_type = t.event_type
)
WHERE sd > 0 AND abs(zscore) > {_ZSCORE_CUT}
ORDER BY event_type, day
"""


# --------------------------------------------------------------------------
# Weighted (probability-proportional-to-size) Poisson sampling
# --------------------------------------------------------------------------

_PPS_TARGET = 200  # expected sample size
_PPS_SPACE = 1 << 60  # portable_hash64 range


def weighted_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sample: include doc_id with probability
    proportional to ``n_chars`` (expected size ≈ _PPS_TARGET) — the
    token-budget-aware sampling a training-mix pipeline uses (sampling
    uniformly by DOCUMENT over-represents short docs in token space).

    Inclusion test is ALL-INTEGER: ``hash * ΣW < target * w * 2^60`` in
    decimal(38,0) — no float rounding anywhere, so the same doc set falls
    out in any engine and under any partitioning (the float formulation
    ``u < p`` is boundary-fragile).  Shape: one 1-row weight-sum aggregate
    broadcast into a scan-side filter — map-only over the corpus, no
    shuffle but the presentation sort.  At 100 TB the ΣW aggregate is one
    pass you'd amortize from table stats.
    """
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.agg(F.sum("n_chars").cast("decimal(38,0)").alias("w_total"))
    h = portable_hash64(F.concat(F.lit("pps:"), F.col("doc_id").cast("string")))
    return (
        docs.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            h.cast("decimal(38,0)").alias("hv"),
            "w_total",
        )
        .filter(
            F.col("hv") * F.col("w_total")
            < F.lit(_PPS_TARGET)
            * F.col("n_chars").cast("decimal(38,0)")
            * F.lit(_PPS_SPACE).cast("decimal(38,0)")
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            # diagnostic: the (uncapped) inclusion probability; pure +,*,/
            # double arithmetic is IEEE-identical across engines
            (
                F.lit(float(_PPS_TARGET))
                * F.col("n_chars").cast("double")
                / F.col("w_total").cast("double")
            ).alias("incl_prob"),
        )
        .orderBy("doc_id")
    )


_PPS_HASH = portable_hash64_sql("'pps:' || doc_id::VARCHAR")

WEIGHTED_SAMPLE_SQL = f"""
WITH tot AS (SELECT SUM(n_chars)::DECIMAL(38,0) AS w_total FROM documents)
SELECT doc_id, lang, n_chars,
       {_PPS_TARGET}.0 * n_chars::DOUBLE / w_total::DOUBLE AS incl_prob
FROM documents, tot
WHERE {_PPS_HASH}::DECIMAL(38,0) * w_total
      < {_PPS_TARGET}::DECIMAL(38,0) * n_chars::DECIMAL(38,0)
        * {_PPS_SPACE}::DECIMAL(38,0)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Column profiling (ANALYZE-style data-quality summary of a table)
# --------------------------------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``orders``: row/null/distinct counts and
    min/max rendered as strings — the ANALYZE/data-quality sweep a pipeline
    runs on every new drop before trusting it.

    ONE pass over the table computes every statistic (a single wide
    aggregate; the multi-DISTINCT is planned via expand), then a ``stack``
    unpivots the 1-row result into one row per column — so profiling cost
    is a single scan regardless of column count, where the naive
    per-column loop would scan the table N_cols times.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"max_{c}"),
        ]
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', null_{c}, nd_{c}, min_{c}, max_{c}" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) "
        "as (col_name, n_null, n_distinct, min_value, max_value)",
    ).select(
        "col_name", "n_rows", "n_null", "n_distinct", "min_value", "max_value"
    ).orderBy("col_name")


PROFILE_COLUMNS_SQL = (
    "WITH s AS (SELECT COUNT(*) AS n_rows, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_{c}, "
        f"COUNT(DISTINCT {c}) AS nd_{c}, "
        f"MIN({c})::VARCHAR AS min_{c}, MAX({c})::VARCHAR AS max_{c}"
        for c in _PROFILE_COLS
    )
    + " FROM orders)\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, n_rows, null_{c} AS n_null, nd_{c} AS n_distinct,"
        f" min_{c} AS min_value, max_{c} AS max_value FROM s"
        for c in _PROFILE_COLS
    )
    + "\nORDER BY col_name"
)


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters (exactly reproducible cross-engine)
# --------------------------------------------------------------------------

_CMS_DEPTH = 4     # independent hash rows
_CMS_WIDTH = 64    # buckets per row
_CMS_MIN_FREQ = 50  # heavy-hitter report threshold on the CMS estimate


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter words via a count-min sketch, with the exact count
    alongside to expose the one-sided overestimate (Cormode & Muthukrishnan
    2005: est >= true, est <= true + eps*N w.h.p.).

    The sketch is DEPTH×WIDTH integer cells — a few KB regardless of
    corpus size — built with ONE map-side-combined groupBy on
    (row, bucket): at 100 TB the partial agg collapses each partition to
    <= 256 cells before the shuffle, making this the cheapest possible
    frequency summary.  Point queries join each candidate's d buckets
    against the sketch and take min(cell).  Buckets come from
    ``portable_hash64(r || ':' || word) % WIDTH`` so DuckDB reproduces
    every cell bit-for-bit (Spark's own count_min_sketch() hashes
    engine-internally, like approx_count_distinct — rows-only checkable).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split("text", r"\s+")).alias("word")
    ).filter(F.col("word") != "")

    rows = F.explode(
        F.array(*[F.lit(r) for r in range(_CMS_DEPTH)])
    ).alias("r")
    cells = (
        words.select("word", rows)
        .select(
            "r",
            F.pmod(
                portable_hash64(
                    F.concat(F.col("r").cast("string"), F.lit(":"), F.col("word"))
                ),
                F.lit(_CMS_WIDTH),
            ).alias("bucket"),
        )
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )

    exact = words.groupBy("word").agg(F.count(F.lit(1)).alias("exact_freq"))
    probes = exact.select("word", "exact_freq", rows).select(
        "word",
        "exact_freq",
        "r",
        F.pmod(
            portable_hash64(
                F.concat(F.col("r").cast("string"), F.lit(":"), F.col("word"))
            ),
            F.lit(_CMS_WIDTH),
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("word", "exact_freq")
        .agg(F.min("cell").alias("est_freq"))
        .filter(F.col("est_freq") >= _CMS_MIN_FREQ)
        .select("word", "est_freq", "exact_freq")
        .orderBy("word")
    )


_CMS_HASH = portable_hash64_sql("(r.r::VARCHAR || ':' || word)")

CMS_HEAVY_HITTERS_SQL = f"""
WITH words AS (
    SELECT unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS word FROM documents
), w AS (SELECT word FROM words WHERE word <> ''),
rows_ AS (SELECT unnest(range(0, {_CMS_DEPTH})) AS r),
cells AS (
    SELECT r.r, {_CMS_HASH} % {_CMS_WIDTH} AS bucket, COUNT(*) AS cell
    FROM w, rows_ r GROUP BY 1, 2
),
exact AS (SELECT word, COUNT(*) AS exact_freq FROM w GROUP BY word),
probes AS (
    SELECT e.word, e.exact_freq, r.r,
           {portable_hash64_sql("(r.r::VARCHAR || ':' || e.word)")} % {_CMS_WIDTH} AS bucket
    FROM exact e, rows_ r
)
SELECT p.word, MIN(c.cell) AS est_freq, p.exact_freq
FROM probes p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
GROUP BY p.word, p.exact_freq
HAVING MIN(c.cell) >= {_CMS_MIN_FREQ}
ORDER BY p.word
"""


# --------------------------------------------------------------------------
# Time-weighted average (the TimescaleDB time_weight('LOCF') twin)
# --------------------------------------------------------------------------


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, day) time-weighted average of ``value`` — the irregular-
    sampling statistic a plain AVG gets wrong (a sensor reporting 1.0 for
    23 h and 100.0 for 1 h plain-averages to 50.5; time-weighting says
    ~5.1).  Step-function (LOCF) weighting: each reading holds until the
    next one, so reading i weighs ``next_ts − ts_i``; the final reading of
    a day carries no width; single-reading days fall back to the value.

    One window (lead over the user+day partition, high-cardinality key,
    even partitioning) and one aggregate over the same key — the weights
    are pure timestamp arithmetic in doubles, identical in both engines.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    # TIMESTAMP_NTZ has no direct double cast; via ltz = epoch seconds in
    # the session's UTC, matching DuckDB's epoch(ts) (same fix as sessionize)
    t = F.col("ts").cast("timestamp_ltz").cast("double")
    nxt = F.lead(t, 1).over(w)
    weighted = ev.select(
        "user_id",
        day.alias("day"),
        "value",
        "event_id",
        ((nxt - t) * F.col("value")).alias("wv"),
        (nxt - t).alias("wt"),
    )
    return (
        weighted.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            # RAW doubles: float-sum order differs per engine only at ulp
            # scale, which the checker's 6dp canonicalization absorbs —
            # engine ROUND() would diverge on boundary representations
            F.when(
                F.sum("wt") > 0, F.sum("wv") / F.sum("wt")
            )
            .otherwise(F.min_by("value", "event_id"))
            .alias("twa_value"),
            F.avg("value").alias("plain_avg"),
        )
        .orderBy("user_id", "day")
    )


TIME_WEIGHTED_AVG_SQL = """
WITH weighted AS (
    SELECT user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           value,
           (lead(epoch(ts)) OVER (
                PARTITION BY user_id, date_trunc('day', ts)
                ORDER BY ts, event_id) - epoch(ts)) * value AS wv,
           (lead(epoch(ts)) OVER (
                PARTITION BY user_id, date_trunc('day', ts)
                ORDER BY ts, event_id) - epoch(ts)) AS wt,
           ts, event_id
    FROM events
)
SELECT user_id, day,
       COUNT(*) AS n_readings,
       CASE WHEN SUM(wt) > 0 THEN SUM(wv) / SUM(wt)
            ELSE MIN_BY(value, event_id) END AS twa_value,
       AVG(value) AS plain_avg
FROM weighted
GROUP BY user_id, day
ORDER BY user_id, day
"""


# --------------------------------------------------------------------------
# Per-user linear trend (closed-form OLS, exact-sum determinism)
# --------------------------------------------------------------------------

_TREND_EPOCH = 1704067200  # floor-seconds of 2024-01-01, the x origin


def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend of ``value`` over time per user (slope in
    value/day + R²) — the "is this metric drifting" primitive, computed
    closed-form from five aggregates: n, Σx, Σy, Σxy, Σx², Σy².

    Determinism discipline (the zscore pattern): ``regr_slope``-style
    builtins sum doubles in engine-dependent order, so the sums here are
    EXACT — x is integer whole-seconds from a fixed origin (bounded by the
    30-day window, so Σx² fits bigint), y is DECIMAL(18,6) — and only the
    final slope/R² arithmetic runs in doubles, with identical expression
    order in both engines.  One shuffle (the per-user aggregate, map-side
    combined); the math adds zero extra passes.
    """
    ev = load_table(spark, sf_dir, "events")
    x = (
        F.col("ts").cast("timestamp_ltz").cast("long") - F.lit(_TREND_EPOCH)
    ).alias("x")
    y = F.col("value").cast("decimal(18,6)")
    agg = ev.select("user_id", x, y.alias("y")).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = F.when(var_x > 0, cov_n / var_x)
    r2 = F.when(
        (var_x > 0) & (var_y > 0), (cov_n * cov_n) / (var_x * var_y)
    )
    return agg.select(
        "user_id",
        "n",
        # RAW doubles: exact-sum inputs make these bit-identical across
        # engines; the checker canonicalizes at 6dp
        (slope * 86400.0).alias("slope_per_day"),
        r2.alias("r2"),
    ).orderBy("user_id")


USER_VALUE_TREND_SQL = f"""
WITH agg AS (
    SELECT user_id,
           COUNT(*) AS n,
           SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
           SUM(x * x) AS sxx, SUM(y * y) AS syy
    FROM (
        SELECT user_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) - {_TREND_EPOCH} AS x,
               CAST(value AS DECIMAL(18,6)) AS y
        FROM events
    )
    GROUP BY user_id
)
SELECT user_id, n,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END
            * 86400.0 AS slope_per_day,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
              AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS r2
FROM agg
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# HyperLogLog sketch (deterministic, bit-reproducible across engines)
# --------------------------------------------------------------------------

_HLL_P = 8
_HLL_M = 1 << _HLL_P            # 256 registers
_HLL_REM_BITS = 60 - _HLL_P     # 52-bit register stream from the 60-bit hash
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog estimate of distinct (user_id, event_type) pairs — the
    industry-standard mergeable distinct sketch (registers merge by MAX,
    so partial sketches combine across partitions, days, or engines; the
    KMV sketch nearby trades simpler math for worse constant-factor
    accuracy).

    Bit-reproducible across engines, unlike every builtin
    ``approx_count_distinct``: bucket = top 8 bits of the portable 60-bit
    hash, rho = leading-zero count of the remaining 52 bits + 1 (via
    binary-string length — no floating log), and the harmonic sum
    Σ2^(−M_j) is accumulated as an INTEGER numerator Σ2^(53−M_j), so no
    double summation whose order could differ between engines; doubles
    appear only in the final α·m²/sum division.  One shuffle of ≤256
    register rows after a map-side-combined MAX.
    """
    from ..functions import portable_hash64

    ev = load_table(spark, sf_dir, "events")
    h = portable_hash64(
        F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("event_type"))
    )
    rem = h % F.lit(1 << _HLL_REM_BITS)
    rho = F.when(rem == 0, F.lit(_HLL_REM_BITS + 1)).otherwise(
        F.lit(_HLL_REM_BITS + 1) - F.length(F.bin(rem))
    )
    regs = (
        ev.select(
            F.shiftright(h, _HLL_REM_BITS).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("mj"))
    )
    summed = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_REM_BITS + 1} - mj)")).alias(
            "num_present"
        ),
    )
    # exact cardinality computed IN-PLAN (one-row aggregate cross-joined
    # in), not as an eager .count() action at DataFrame construction —
    # building the plan must not scan the corpus
    exact_df = (
        ev.select("user_id", "event_type")
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
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
    exact_d = F.col("exact_distinct").cast("double")
    return summed.crossJoin(F.broadcast(exact_df)).select(
        F.lit(_HLL_M).alias("m"),
        zeros.cast("bigint").alias("n_zero_buckets"),
        # ROUND stays here: the small-range branch uses ln(), whose 1-ulp
        # cross-engine wobble the raw-emission rule exempts
        F.round(est, 3).alias("estimate"),
        "exact_distinct",
        F.round(F.abs(est - exact_d) / exact_d, 4).alias("rel_error"),
    )


_HLL_H = "(('0x' || substr(md5(user_id::VARCHAR || ':' || event_type), 1, 15))::BIGINT)"

HLL_SKETCH_SQL = f"""
WITH rows_h AS (
    SELECT {_HLL_H} // {1 << _HLL_REM_BITS} AS bucket,
           CASE WHEN {_HLL_H} % {1 << _HLL_REM_BITS} = 0 THEN {_HLL_REM_BITS + 1}
                ELSE {_HLL_REM_BITS + 1}
                     - length(bin({_HLL_H} % {1 << _HLL_REM_BITS})) END AS rho
    FROM events
),
regs AS (SELECT bucket, MAX(rho) AS mj FROM rows_h GROUP BY bucket),
s AS (
    SELECT COUNT(*) AS n_present,
           SUM(CAST(1 AS BIGINT) << ({_HLL_REM_BITS + 1} - mj)) AS num_present
    FROM regs
),
ex AS (SELECT COUNT(*) AS exact_distinct
       FROM (SELECT DISTINCT user_id, event_type FROM events))
SELECT {_HLL_M} AS m,
       CAST({_HLL_M} - s.n_present AS BIGINT) AS n_zero_buckets,
       ROUND(CASE WHEN {_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_REM_BITS + 1))!r}
                       / CAST(s.num_present
                              + ({_HLL_M} - s.n_present)
                                * (CAST(1 AS BIGINT) << {_HLL_REM_BITS + 1}) AS DOUBLE)
                       <= {2.5 * _HLL_M}
                   AND ({_HLL_M} - s.n_present) > 0
             THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r}
                  / CAST({_HLL_M} - s.n_present AS DOUBLE))
             ELSE {_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_REM_BITS + 1))!r}
                  / CAST(s.num_present
                         + ({_HLL_M} - s.n_present)
                           * (CAST(1 AS BIGINT) << {_HLL_REM_BITS + 1}) AS DOUBLE)
             END, 3) AS estimate,
       ex.exact_distinct,
       ROUND(ABS(CASE WHEN {_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_REM_BITS + 1))!r}
                           / CAST(s.num_present
                                  + ({_HLL_M} - s.n_present)
                                    * (CAST(1 AS BIGINT) << {_HLL_REM_BITS + 1}) AS DOUBLE)
                           <= {2.5 * _HLL_M}
                       AND ({_HLL_M} - s.n_present) > 0
                 THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r}
                      / CAST({_HLL_M} - s.n_present AS DOUBLE))
                 ELSE {_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_REM_BITS + 1))!r}
                      / CAST(s.num_present
                             + ({_HLL_M} - s.n_present)
                               * (CAST(1 AS BIGINT) << {_HLL_REM_BITS + 1}) AS DOUBLE)
                 END - ex.exact_distinct) / ex.exact_distinct, 4) AS rel_error
FROM s, ex
"""


# --------------------------------------------------------------------------
# KMV set algebra (union / intersection cardinality from two sketches)
# --------------------------------------------------------------------------

_KMV_TYPE_A = "view"
_KMV_TYPE_B = "purchase"


def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from SKETCHES: |A∪B| and |A∩B| of two
    event types' active user-days, computed from their bottom-k hash
    sketches alone — the theta-sketch set algebra that answers "how many
    users did both X and Y" at 100 TB without ever joining the raw sets
    (the sketches are 2×k hashes; the raw sets are billions of rows).

    Union sketch = bottom-k of the merged hash sets → (k−1)/u estimator;
    intersection via the Jaccard of the union sketch (fraction of its
    members present in both input sketches) × the union estimate — the
    standard KMV/theta composition (Beyer et al. 2007).  Exact values
    ride along to expose the sketch error.  All windows run over ≤ 2k
    rows; the only corpus-scale work is the two map-side-combined
    distincts.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    key = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.date_trunc("day", "ts").cast("string"),
    )
    h = portable_hash64(F.concat(F.lit("kmvset:"), key))
    hashes = (
        ev.filter(F.col("event_type").isin(_KMV_TYPE_A, _KMV_TYPE_B))
        .select("event_type", h.alias("hv"))
        .distinct()
    )
    # Two-phase distributed bottom-k (r7 verdict scale seam: the direct
    # per-type window sorts EVERY distinct key of a type in one partition
    # — two partitions total at 100 TB).  Phase 1 takes bottom-k within
    # each of _KMV_SALTS deterministic hash sub-partitions (each window
    # partition holds 1/salts of a type); phase 2 re-ranks the ≤ salts×k
    # survivors per type — bounded input, identical result, because the
    # global bottom-k is a subset of the union of per-salt bottom-k's.
    w1 = Window.partitionBy("event_type", "_salt").orderBy("hv")
    pre = (
        hashes.withColumn("_salt", F.pmod(F.col("hv"), F.lit(_KMV_SALTS)))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _KMV_K)
        .drop("_salt", "rn")
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    sketches = pre.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    )
    # bottom-k of the merged hashes via orderBy+limit (TakeOrdered: a
    # per-partition k-heap + k-row merge), NOT a global row_number window
    # that would single-partition every distinct hash (r7 verdict scale
    # seam).  The merged input here is already ≤2k rows, but the min-k
    # must stay the distributed form because the same expression is the
    # 100 TB template for sketching raw key sets.
    merged = sketches.select("hv").distinct()
    union_sketch = merged.orderBy("hv").limit(_KMV_K)
    in_a = sketches.filter(F.col("event_type") == _KMV_TYPE_A).select("hv")
    in_b = sketches.filter(F.col("event_type") == _KMV_TYPE_B).select("hv")
    flags = (
        union_sketch.join(in_a.withColumn("ina", F.lit(1)), "hv", "left")
        .join(in_b.withColumn("inb", F.lit(1)), "hv", "left")
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("hv").alias("kth_hash"),
        F.sum(
            F.when((F.col("ina") == 1) & (F.col("inb") == 1), 1).otherwise(0)
        ).alias("n_both"),
    )
    exact = (
        ev.filter(F.col("event_type").isin(_KMV_TYPE_A, _KMV_TYPE_B))
        .select("event_type", key.alias("k"))
        .distinct()
        .groupBy()
        .agg(
            F.count_distinct("k").alias("exact_union"),
            (
                F.count(F.lit(1)) - F.count_distinct("k")
            ).alias("exact_intersection"),
        )
    )
    # Under-filled sketch (fewer than K distinct hashes exist): the sketch
    # IS the exact set, so return k_used rather than the (K-1)/u estimator,
    # which would systematically overestimate small inputs.
    # RAW doubles throughout (pure division chains are IEEE-identical;
    # engine ROUND is not — checker canonicalizes at 6dp)
    est_union = F.when(
        F.col("k_used") < _KMV_K, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1))
        / (F.col("kth_hash").cast("double") / F.lit(_KMV_SPACE))
    )
    jac = F.col("n_both").cast("double") / F.col("k_used").cast("double")
    return (
        agg.crossJoin(exact)
        .select(
            F.lit(_KMV_TYPE_A).alias("type_a"),
            F.lit(_KMV_TYPE_B).alias("type_b"),
            "exact_union",
            "exact_intersection",
            est_union.alias("est_union"),
            jac.alias("est_jaccard"),
            (jac * est_union).alias("est_intersection"),
        )
    )


_KMV_SET_H = (
    "(('0x' || substr(md5('kmvset:' || user_id::VARCHAR || ':' "
    "|| CAST(date_trunc('day', ts) AS TIMESTAMP)::VARCHAR), 1, 15))::BIGINT)"
)

KMV_SET_OPS_SQL = f"""
WITH hashes AS (
    SELECT DISTINCT event_type, {_KMV_SET_H} AS hv
    FROM events WHERE event_type IN ('{_KMV_TYPE_A}', '{_KMV_TYPE_B}')
),
sk AS (
    SELECT event_type, hv FROM (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM hashes
    ) WHERE rn <= {_KMV_K}
),
us AS (
    SELECT hv FROM (
        SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
        FROM (SELECT DISTINCT hv FROM sk)
    ) WHERE rn <= {_KMV_K}
),
agg AS (
    SELECT COUNT(*) AS k_used, MAX(us.hv) AS kth_hash,
           SUM(CASE WHEN a.hv IS NOT NULL AND b.hv IS NOT NULL
                    THEN 1 ELSE 0 END) AS n_both
    FROM us
    LEFT JOIN (SELECT hv FROM sk WHERE event_type = '{_KMV_TYPE_A}') a
           ON us.hv = a.hv
    LEFT JOIN (SELECT hv FROM sk WHERE event_type = '{_KMV_TYPE_B}') b
           ON us.hv = b.hv
),
ex AS (
    SELECT COUNT(DISTINCT k) AS exact_union,
           CAST(COUNT(*) - COUNT(DISTINCT k) AS BIGINT) AS exact_intersection
    FROM (
        SELECT DISTINCT event_type,
               user_id::VARCHAR || ':'
               || CAST(date_trunc('day', ts) AS TIMESTAMP)::VARCHAR AS k
        FROM events WHERE event_type IN ('{_KMV_TYPE_A}', '{_KMV_TYPE_B}')
    )
)
SELECT '{_KMV_TYPE_A}' AS type_a, '{_KMV_TYPE_B}' AS type_b,
       ex.exact_union, ex.exact_intersection,
       CASE WHEN agg.k_used < {_KMV_K} THEN CAST(agg.k_used AS DOUBLE)
            ELSE {float(_KMV_K - 1)!r}
                 / (CAST(agg.kth_hash AS DOUBLE) / {_KMV_SPACE})
       END AS est_union,
       CAST(agg.n_both AS DOUBLE) / CAST(agg.k_used AS DOUBLE)
           AS est_jaccard,
       CAST(agg.n_both AS DOUBLE) / CAST(agg.k_used AS DOUBLE)
           * CASE WHEN agg.k_used < {_KMV_K} THEN CAST(agg.k_used AS DOUBLE)
                  ELSE {float(_KMV_K - 1)!r}
                       / (CAST(agg.kth_hash AS DOUBLE) / {_KMV_SPACE})
             END
           AS est_intersection
FROM agg, ex
"""


# --------------------------------------------------------------------------
# Unpivot (wide → long, the inverse of pivot_event_types)
# --------------------------------------------------------------------------


def unpivot_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot the per-bucket event-type sums back to long form —
    round-tripping :func:`pivot_event_types` proves the reshaping pair is
    lossless.  Spark's ``unpivot`` (SQL ``stack``) is a zero-shuffle
    projection: each wide row explodes map-side into ≤ |types| long rows;
    NULL cells (type absent for a bucket) are dropped by both engines'
    unpivot semantics, which is the lossless direction of the pair.
    """
    wide = pivot_event_types(spark, sf_dir)
    return (
        wide.unpivot(
            "user_bucket", _EVENT_TYPES, "event_type", "sum_value"
        )
        .filter(F.col("sum_value").isNotNull())
        .orderBy("user_bucket", "event_type")
    )


UNPIVOT_SQL = f"""
SELECT user_bucket, event_type, sum_value
FROM ({PIVOT_SQL.replace("ORDER BY user_bucket", "")})
UNPIVOT (sum_value FOR event_type IN ({', '.join(_EVENT_TYPES)}))
ORDER BY user_bucket, event_type
"""


# --------------------------------------------------------------------------
# Chi-square independence test (categorical drift / dependence check)
# --------------------------------------------------------------------------

# upper critical value at alpha=0.05 for dof=(5-1)*(10-1)=36
_CHISQ_CRIT_36 = 50.998


def chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event_type and the
    user bucket — the categorical-drift primitive (is the event mix the
    same across user cohorts? run per-day against a baseline, it is the
    standard data-quality dependence monitor).

    Determinism discipline: observed counts and margins are exact
    integers; each cell's (O−E)²/E is one double expression with fixed
    operand order; and the cross-cell total is summed in DECIMAL(38,18)
    — a double Σ over 50 cells would depend on aggregation order, which
    neither engine pins.  One count aggregate over the corpus (map-side
    combined), then all statistics on the ≤|types|×|buckets| cell table.
    """
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.groupBy(
        "event_type", (F.col("user_id") % 10).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("o"))
    # densify to the FULL observed-margin grid: a (type, bucket) pair with
    # zero observations still contributes (0-E)^2/E = E to the statistic,
    # and dof counts grid dimensions, not non-empty cells
    types = sparse.select("event_type").distinct()
    buckets = sparse.select("bucket").distinct()
    cells = (
        types.crossJoin(buckets)
        .join(sparse, ["event_type", "bucket"], "left")
        .select("event_type", "bucket", F.coalesce("o", F.lit(0)).alias("o"))
    )
    rows = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols = cells.groupBy("bucket").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("event_type").alias("n_types"),
        F.count_distinct("bucket").alias("n_buckets"),
    )
    e = F.col("r").cast("double") * F.col("c").cast("double") / F.col("n").cast("double")
    contrib = (
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    )
    stats = (
        cells.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(cols), "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            contrib.cast("decimal(38,18)").alias("contrib"),
            "n", "n_types", "n_buckets",
        )
        .groupBy("n", "n_types", "n_buckets")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("contrib").alias("chi2_dec"),
        )
    )
    chi2 = F.col("chi2_dec").cast("double")
    return stats.select(
        F.col("n").alias("n_events"),
        "n_cells",
        # RAW double (decimal sum casts identically in both engines)
        chi2.alias("chi2"),
        # dof from the grid dimensions — exact integers in both engines
        ((F.col("n_types") - 1) * (F.col("n_buckets") - 1))
        .cast("bigint")
        .alias("dof"),
        # the hardcoded critical value is for dof=36 (the 5x10 test grid);
        # other grids need their own quantile
        (chi2 < F.lit(_CHISQ_CRIT_36)).alias("independent_at_05"),
    )


CHISQ_SQL = f"""
WITH sparse AS (
    SELECT event_type, user_id % 10 AS bucket, COUNT(*) AS o
    FROM events GROUP BY 1, 2
),
cells AS (
    SELECT g.event_type, g.bucket, COALESCE(s.o, 0) AS o
    FROM (SELECT t.event_type, b.bucket
          FROM (SELECT DISTINCT event_type FROM sparse) t
          CROSS JOIN (SELECT DISTINCT bucket FROM sparse) b) g
    LEFT JOIN sparse s
      ON s.event_type = g.event_type AND s.bucket = g.bucket
),
r AS (SELECT event_type, SUM(o) AS r FROM cells GROUP BY event_type),
c AS (SELECT bucket, SUM(o) AS c FROM cells GROUP BY bucket),
t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
             COUNT(DISTINCT event_type) AS n_types,
             COUNT(DISTINCT bucket) AS n_buckets
      FROM cells),
stats AS (
    SELECT t.n, t.n_types, t.n_buckets, COUNT(*) AS n_cells,
           SUM(CAST(
               (CAST(o AS DOUBLE)
                - CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
               * (CAST(o AS DOUBLE)
                  - CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
               / (CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
               AS DECIMAL(38,18))) AS chi2_dec
    FROM cells
    JOIN r USING (event_type) JOIN c USING (bucket) CROSS JOIN t
    GROUP BY t.n, t.n_types, t.n_buckets
)
SELECT n AS n_events, n_cells,
       CAST(chi2_dec AS DOUBLE) AS chi2,
       CAST((n_types - 1) * (n_buckets - 1) AS BIGINT) AS dof,
       CAST(chi2_dec AS DOUBLE) < {_CHISQ_CRIT_36} AS independent_at_05
FROM stats
"""


# --------------------------------------------------------------------------
# Robust outliers: median/MAD z-scores (the heavy-tail-safe anomaly scan)
# --------------------------------------------------------------------------

_MAD_CUT = 3.5       # modified z-score threshold (Iglewicz-Hoaglin)
_MAD_CONSIST = 0.6745  # normal-consistency constant


def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is a robust outlier within its event_type:
    modified z-score 0.6745·|x−median|/MAD > 3.5 — the heavy-tail-safe
    replacement for mean/σ z-scores (one genuine spike inflates σ and
    hides its neighbors; median/MAD are 50%-breakdown estimators, so the
    scan still flags them).

    Both medians are RANK-BASED order statistics (the value at rank
    k = ceil(n/2) — the lower median under the ``winsorize_values``
    discipline): an actual observed value, identical across engines by
    construction.  Interpolated medians (Spark ``percentile`` vs DuckDB
    ``median``) average the middle pair with formulas that can differ by
    an ulp, and Spark's exact ``percentile`` buffers every group value
    in ONE aggregation buffer — a per-group OOM at 100 TB, where this
    rank-window form is a distributed sort.  MAD needs a second pass
    over |x−median|, so the plan is two window shuffles keyed on
    event_type with the per-type constants broadcast back.  At 100 TB
    swap the rank window for the bottom-k sketch nearby if two exact
    sorts are too dear; the contract columns stay identical.
    """
    from pyspark.sql.window import Window

    def _rank_median(df: DataFrame, col: str, out: str) -> DataFrame:
        n_per = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        w = Window.partitionBy("event_type").orderBy(col)
        k = F.ceil(F.lit(0.5) * F.col("n")).cast("bigint")
        return (
            df.join(F.broadcast(n_per), "event_type")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == k)
            .groupBy("event_type")
            .agg(F.min(col).alias(out))
        )

    ev = load_table(spark, sf_dir, "events")
    med = _rank_median(ev.select("event_type", "value"), "value", "med")
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = _rank_median(dev.select("event_type", "adev"), "adev", "mad")
    # all outputs are RAW doubles, no in-SQL ROUND: the exact-percentile
    # pipeline is bit-identical across engines, and engine ROUND is NOT —
    # DuckDB rounds the shortest decimal repr (3.8522499999999997 prints
    # "3.85225" → 3.8523) where Spark/Python round the binary value
    # (→ 3.8522).  Emitting the identical raw doubles lets the
    # comparator's single canonicalization round both sides the same way;
    # rounding inside the query re-introduces the divergence it was meant
    # to prevent (bitten at sf0.1, event 1222).
    z = F.lit(_MAD_CONSIST) * F.abs(F.col("value") - F.col("med")) / F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "event_id",
            "value",
            F.col("med").alias("median"),
            "mad",
            z.alias("mod_zscore"),
        )
        .filter(F.col("mod_zscore") > _MAD_CUT)
        .orderBy("event_type", "event_id")
    )


MAD_OUTLIERS_SQL = f"""
WITH nn AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
vrk AS (
    SELECT e.event_type, e.value, nn.n,
           ROW_NUMBER() OVER (PARTITION BY e.event_type ORDER BY e.value)
               AS rn
    FROM events e JOIN nn USING (event_type)
),
med AS (
    SELECT event_type, MIN(value) AS med
    FROM vrk
    WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)
    GROUP BY event_type
),
dev AS MATERIALIZED (
    SELECT e.event_type, e.event_id, e.value, m.med,
           ABS(e.value - m.med) AS adev
    FROM events e JOIN med m USING (event_type)
),
ark AS (
    SELECT d.event_type, d.adev, nn.n,
           ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.adev)
               AS rn
    FROM dev d JOIN nn USING (event_type)
),
mad AS (
    SELECT event_type, MIN(adev) AS mad
    FROM ark
    WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)
    GROUP BY event_type
)
SELECT d.event_type, d.event_id, d.value,
       d.med AS median,
       m.mad,
       {_MAD_CONSIST} * ABS(d.value - d.med) / m.mad AS mod_zscore
FROM dev d JOIN mad m USING (event_type)
WHERE {_MAD_CONSIST} * ABS(d.value - d.med) / m.mad > {_MAD_CUT}
ORDER BY d.event_type, d.event_id
"""


# --------------------------------------------------------------------------
# Winsorization (per-group quantile clipping, the outlier TREATMENT)
# --------------------------------------------------------------------------

_WINSOR_LO = 0.01
_WINSOR_HI = 0.99


def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorization audit: clip ``value`` to its
    [p01, p99] and report how much mass moved — the TREATMENT step after
    an outlier SCAN (mad_outliers flags, winsorizing repairs: ML feature
    pipelines clip rather than drop so row counts survive joins).

    Caps are RANK-BASED order statistics (percentile_disc semantics): the
    k-th smallest value with k = ceil(q·n) — an actual observed value,
    identical across engines by construction.  Interpolated percentiles
    (Spark ``percentile`` vs DuckDB ``quantile_cont``) use different rank
    conventions; at sf1 volumes the two cuts straddled a tie run and the
    clipped-row COUNTS diverged by 10 rows (r7 sf1 sweep finding) — a
    rank cut cannot do that: the value at rank k is invariant to how a
    sort permutes ties.  One ranking window per group, caps broadcast
    back, then a map-side-combined aggregate over the clipped column.
    Means are decimal-summed (order-free); caps and means emit as RAW
    doubles (engine ROUND is not portable — the mad_outliers lesson).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    n_per = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("value")
    lo_rn = F.ceil(F.lit(_WINSOR_LO) * F.col("n")).cast("bigint")
    hi_rn = F.ceil(F.lit(_WINSOR_HI) * F.col("n")).cast("bigint")
    caps = (
        ev.join(F.broadcast(n_per), "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == lo_rn) | (F.col("rn") == hi_rn))
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("rn") == lo_rn, F.col("value"))).alias("lo"),
            F.min(F.when(F.col("rn") == hi_rn, F.col("value"))).alias("hi"),
        )
    )
    clipped = ev.join(F.broadcast(caps), "event_type").select(
        "event_type", "value", "lo", "hi",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("w"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("bigint").alias("n_clipped_lo"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("bigint").alias("n_clipped_hi"),
            F.min("lo").alias("p01"),
            F.min("hi").alias("p99"),
            # cast the exact decimal SUM to double BEFORE dividing: DuckDB
            # types SUM(decimal)/COUNT(*) as a double division, so the
            # divide-then-cast order would differ by an ulp between engines
            (
                F.sum(F.col("value").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_raw"),
            (
                F.sum(F.col("w").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_winsorized"),
        )
        .orderBy("event_type")
    )


WINSORIZE_SQL = f"""
WITH nn AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
rk AS (
    SELECT e.event_type, e.value, nn.n,
           ROW_NUMBER() OVER (PARTITION BY e.event_type ORDER BY e.value) AS rn
    FROM events e JOIN nn USING (event_type)
),
caps AS (
    SELECT event_type,
           MIN(CASE WHEN rn = CAST(CEIL({_WINSOR_LO} * n) AS BIGINT)
                    THEN value END) AS lo,
           MIN(CASE WHEN rn = CAST(CEIL({_WINSOR_HI} * n) AS BIGINT)
                    THEN value END) AS hi
    FROM rk
    WHERE rn = CAST(CEIL({_WINSOR_LO} * n) AS BIGINT)
       OR rn = CAST(CEIL({_WINSOR_HI} * n) AS BIGINT)
    GROUP BY event_type
)
SELECT e.event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_lo,
       CAST(SUM(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_hi,
       MIN(c.lo) AS p01,
       MIN(c.hi) AS p99,
       CAST(SUM(CAST(e.value AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)
           AS mean_raw,
       CAST(SUM(CAST(LEAST(GREATEST(e.value, c.lo), c.hi) AS DECIMAL(38,18)))
            AS DOUBLE) / COUNT(*) AS mean_winsorized
FROM events e JOIN caps c USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


# --------------------------------------------------------------------------
# Session survival curve (duration distribution as S(t) = P[duration >= t])
# --------------------------------------------------------------------------

_SURV_BUCKET_S = 300  # 5-minute survival grid


def session_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival curve of session durations: for each 5-minute mark t,
    the fraction of sessions still alive at t — the engagement
    distribution product analytics reads (where a mean hides the shape,
    S(t) shows the cliff), computed as a complementary cumulative count.

    Sessionization is the audited 30-min-gap operator re-derived in one
    pass (two user-keyed windows); durations aggregate per session, then
    the survival grid is the classic explode-to-marks trick from
    ``sliding_distinct_users``: each session contributes a row to every
    mark ≤ its duration, so S(t) is one map-combined count per mark —
    no window over the session table at all.  Fractions emit as RAW
    doubles (single division of exact integers).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp_ltz").cast("double")
    gap = sec - F.lag(sec, 1).over(w)
    marked = ev.select(
        "user_id",
        "event_id",
        sec.alias("sec"),
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("is_start"),
    )
    # Tiebreak the running sum on event_id as well: two same-timestamp
    # events of one user would otherwise make the session assignment
    # nondeterministic across retries/partitionings and across engines.
    sess = marked.select(
        "user_id",
        F.sum("is_start")
        .over(w.orderBy("sec", "event_id").rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("session_id"),
        "sec",
    )
    durs = sess.groupBy("user_id", "session_id").agg(
        (F.max("sec") - F.min("sec")).alias("duration")
    )
    totals = durs.agg(F.count(F.lit(1)).alias("n_sessions"))
    marks = durs.select(
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(F.col("duration") / _SURV_BUCKET_S).cast("int"),
            )
        ).alias("mark")
    )
    return (
        marks.groupBy("mark")
        .agg(F.count(F.lit(1)).alias("n_alive"))
        .crossJoin(F.broadcast(totals))
        .select(
            (F.col("mark") * _SURV_BUCKET_S).cast("bigint").alias("t_seconds"),
            "n_alive",
            (F.col("n_alive").cast("double") / F.col("n_sessions")).alias(
                "survival"
            ),
        )
        .orderBy("t_seconds")
    )


SESSION_SURVIVAL_SQL = f"""
WITH marked AS (
    SELECT user_id, event_id, epoch(ts) AS sec,
           CASE WHEN lag_sec IS NULL OR epoch(ts) - lag_sec > 1800
                THEN 1 ELSE 0 END AS is_start
    FROM (
        SELECT user_id, ts, event_id,
               LAG(epoch(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS lag_sec
        FROM events
    )
),
sess AS (
    SELECT user_id,
           CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY sec, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id,
           sec
    FROM marked
),
durs AS (
    SELECT user_id, session_id, MAX(sec) - MIN(sec) AS duration
    FROM sess GROUP BY user_id, session_id
),
totals AS (SELECT COUNT(*) AS n_sessions FROM durs),
marks AS (
    SELECT unnest(range(0, CAST(FLOOR(duration / {_SURV_BUCKET_S}) AS BIGINT) + 1))
        AS mark
    FROM durs
)
SELECT CAST(mark * {_SURV_BUCKET_S} AS BIGINT) AS t_seconds,
       COUNT(*) AS n_alive,
       CAST(COUNT(*) AS DOUBLE) / t.n_sessions AS survival
FROM marks, totals t
GROUP BY mark, t.n_sessions
ORDER BY t_seconds
"""


# --------------------------------------------------------------------------
# Event transition matrix (first-order Markov model of user behavior)
# --------------------------------------------------------------------------


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: for every
    (current → next) pair within a user's stream, the transition count
    and P(next | current) — the behavioral model behind next-action
    prediction, funnel diagnosis, and bot detection (uniform rows flag
    scripted traffic).

    One LEAD window per user (high-cardinality key) and one |types|²
    aggregate; probabilities are single divisions of exact integer
    counts (raw doubles out — the portable-ROUND discipline).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
    )
    counts = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    row_tot = counts.groupBy("cur").agg(F.sum("n").alias("t"))
    return (
        counts.join(F.broadcast(row_tot), "cur")
        .select(
            "cur",
            "nxt",
            "n",
            (F.col("n").cast("double") / F.col("t")).alias("p"),
        )
        .orderBy("cur", "nxt")
    )


EVENT_TRANSITIONS_SQL = """
WITH pairs AS (
    SELECT cur, nxt FROM (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ) WHERE nxt IS NOT NULL
),
counts AS (SELECT cur, nxt, COUNT(*) AS n FROM pairs GROUP BY cur, nxt),
row_tot AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS t FROM counts GROUP BY cur)
SELECT c.cur, c.nxt, c.n,
       CAST(c.n AS DOUBLE) / r.t AS p
FROM counts c JOIN row_tot r USING (cur)
ORDER BY c.cur, c.nxt
"""
