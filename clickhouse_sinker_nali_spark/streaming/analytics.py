"""Streaming twins of the batch funnel and gap-fill/LOCF analytics.

The batch forms (``operators/advanced.funnel_counts`` and
``operators/advanced.gapfill_daily_locf``) are DuckDB-oracle-checked; these
are the continuously-updating versions a live event pipeline runs.  Both are
custom stateful operators over ``applyInPandasWithState`` (SURVEY §2.10: the
extension surface the reference lacks entirely — its only state is the
Kafka offset ring, reference ``task/ring.go:18-35``).

Scale notes (100 TB / 1000 executors):

- The funnel keys state by ``user_id`` — state is three timestamps per user,
  sharded by the same hash partitioning as the groupBy shuffle; RocksDB
  state store keeps the working set off-heap.  Arrival order across
  micro-batches is irrelevant because the state is a running MINIMUM per
  stage (commutative + idempotent), so re-deliveries and out-of-order events
  cannot corrupt the stage decision.
- The gap-filler consumes a POST-AGGREGATION daily stream (the append-mode
  output of a watermarked tumbling-window rollup), so its input is tiny
  regardless of raw volume — one row per (series, day).  Append-mode window
  output is emitted in watermark order, which is what makes cross-batch
  LOCF well-defined: a day can never arrive before a smaller day in a later
  batch.  State per series is one (last_day, last_value) pair.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# Streaming funnel: per-user view -> click -> purchase progression
# --------------------------------------------------------------------------

_FUNNEL_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", IntegerType()),
    ]
)
# running minima as epoch micros; 0 = not seen (real events are all > 1970)
_FUNNEL_STATE = StructType(
    [
        StructField("t_view", LongType()),
        StructField("t_click", LongType()),
        StructField("t_buy", LongType()),
    ]
)


def _stage(t_view: int, t_click: int, t_buy: int) -> int:
    """Strict-ordering stage from first-occurrence minima.

    Identical decision tree to the batch ``funnel_counts`` projection:
    stage 1 = viewed; 2 = first click strictly after first view; 3 = first
    purchase strictly after that click.
    """
    if not t_view:
        return 0
    if not t_click or t_click <= t_view:
        return 1
    if not t_buy or t_buy <= t_click:
        return 2
    return 3


def streaming_funnel_stages(events_stream: DataFrame) -> DataFrame:
    """Per-user funnel stage, continuously updated across micro-batches.

    Input columns: ``ts timestamp, user_id bigint, event_type string``.
    Emits ``(user_id, stage)`` in update mode whenever a user's events
    arrive; the latest emission per user equals the batch funnel's stage
    for the same data, whatever the arrival order (minima are commutative).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        t_view, t_click, t_buy = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            micros = pdf["ts"].astype("int64") // 1000
            for kind, cur in (("view", t_view), ("click", t_click), ("purchase", t_buy)):
                sel = micros[pdf["event_type"] == kind]
                if len(sel):
                    m = int(sel.min())
                    new = m if not cur else min(cur, m)
                    if kind == "view":
                        t_view = new
                    elif kind == "click":
                        t_click = new
                    else:
                        t_buy = new
        state.update((t_view, t_click, t_buy))
        yield pd.DataFrame(
            {"user_id": [key[0]], "stage": [_stage(t_view, t_click, t_buy)]}
        )

    return (
        events_stream.select("ts", "user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, _FUNNEL_OUT, _FUNNEL_STATE, "update", GroupStateTimeout.NoTimeout
        )
    )


# --------------------------------------------------------------------------
# Streaming gap-fill + LOCF over a daily rollup stream
# --------------------------------------------------------------------------

_GAPFILL_OUT = StructType(
    [
        StructField("series", StringType()),
        StructField("day", TimestampType()),
        StructField("n_events", LongType()),
        StructField("locf_avg_value", DoubleType()),
        StructField("filled", BooleanType()),
    ]
)
# last emitted day as epoch days; NaN-able value carried as double
_GAPFILL_STATE = StructType(
    [
        StructField("last_day", LongType()),
        StructField("last_value", DoubleType()),
        StructField("has_day", BooleanType()),
    ]
)

_EPOCH = pd.Timestamp("1970-01-01")


def streaming_gapfill_locf(daily_stream: DataFrame) -> DataFrame:
    """Materialize missing days with the value carried forward, streaming.

    Input: an append-mode daily rollup stream with columns
    ``series string, day timestamp, n_events bigint, avg_value double``
    (one row per closed day, emitted in watermark order — the output shape
    of ``groupBy(window('ts','1 day'))`` with a watermark).  Output: the
    dense series — every day between the first and the latest seen, gaps
    emitted with ``n_events = 0`` and the last real value (``filled =
    true``).  The batch twin is ``gapfill_daily_locf``'s spine-join +
    last-ignoreNulls window; here the spine is generated incrementally from
    per-series state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fill(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        last_day, last_value, has_day = (
            state.get if state.exists else (0, math.nan, False)
        )
        rows: dict[str, list] = {c: [] for c in ("day", "n_events", "locf_avg_value", "filled")}
        batch = [pdf for pdf in pdfs if len(pdf)]
        if batch:
            allrows = pd.concat(batch).sort_values("day")
            for _, r in allrows.iterrows():
                day = int((r["day"] - _EPOCH).days)
                if has_day and day <= last_day:
                    continue  # late duplicate of an already-emitted day
                if has_day:
                    for missing in range(last_day + 1, day):
                        rows["day"].append(_EPOCH + pd.Timedelta(days=missing))
                        rows["n_events"].append(0)
                        rows["locf_avg_value"].append(last_value)
                        rows["filled"].append(True)
                rows["day"].append(r["day"])
                rows["n_events"].append(int(r["n_events"]))
                last_value = float(r["avg_value"])
                rows["locf_avg_value"].append(last_value)
                rows["filled"].append(False)
                last_day, has_day = day, True
        state.update((last_day, last_value, has_day))
        if rows["day"]:
            out = pd.DataFrame(rows)
            out.insert(0, "series", key[0])
            yield out

    return (
        daily_stream.select("series", "day", "n_events", "avg_value")
        .groupBy("series")
        .applyInPandasWithState(
            fill, _GAPFILL_OUT, _GAPFILL_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


# --------------------------------------------------------------------------
# Streaming top-k: continuously-maintained leaderboard
# --------------------------------------------------------------------------


def streaming_running_topk(
    events_stream: DataFrame, key_col: str, k: int, out_path: str
):
    """Continuous top-k: running counts per key (update-mode state) ranked
    and re-materialized as a tiny leaderboard table every micro-batch.

    Rank-over-aggregate is not expressible inside one streaming query
    (windowed rank over an unbounded agg has no incremental form), so the
    standard production shape is used: the stateful COUNT is incremental,
    and ``foreachBatch`` re-ranks the (small) updated counts and atomically
    overwrites the serving table.  State scales with |keys|, the per-epoch
    rank with k — both independent of stream volume.  The batch twin is a
    plain groupBy-count + row_number top-k.
    """
    from pyspark.sql.window import Window

    counts = events_stream.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        from .store import read_versioned, versioned_swap_write

        w = Window.orderBy(F.col("n").desc(), F.col(key_col))
        # batch_df in update mode carries only CHANGED keys; merge with the
        # previous leaderboard so unchanged leaders are not forgotten
        spark = batch_df.sparkSession
        prev = read_versioned(spark, out_path)
        if prev is not None:
            prev = prev.drop("rank")
        merged = (
            batch_df if prev is None
            else prev.join(
                batch_df.select(F.col(key_col).alias("_k")),
                F.col(key_col) == F.col("_k"),
                "left_anti",
            ).unionByName(batch_df)
        )
        top = (
            merged.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("rank", key_col, "n")
        )
        # crash-safe swap: the CURRENT pointer flips only after v_<epoch>
        # is fully written; a replayed epoch rewrites its own directory
        versioned_swap_write(top, out_path, int(epoch_id))

    return counts.writeStream.outputMode("update").foreachBatch(sink)


# --------------------------------------------------------------------------
# Streaming exact dedup: first-arrival-wins distinct over content hashes
# --------------------------------------------------------------------------

_DEDUP_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text_hash", StringType()),
        StructField("n_batch_copies", LongType()),
    ]
)
_DEDUP_STATE = StructType([StructField("keeper", LongType())])


def streaming_dedup_exact(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators/dedup.dedup_exact``: emit each
    distinct document text exactly once, the first time it is seen.

    Input columns: ``doc_id bigint, text string``.  Semantics are the
    online ones — FIRST ARRIVAL wins across micro-batches (within a batch,
    the smallest doc_id wins, deterministically); a later duplicate is
    silently suppressed.  This is the generalization of the reference's
    Prometheus series dedup (first-occurrence-wins distinct on
    ``__series_id`` seeded from a roaring bitmap, reference
    ``output/clickhouse.go:110-130``) with the seen-set held in the state
    store instead of an in-process bitmap.

    Scale notes: state is keyed by the 256-bit content hash — one long per
    distinct document, sharded by the groupBy partitioning, so a
    1000-executor cluster holds the seen-set horizontally in RocksDB.
    Unbounded corpora need an eviction policy (watermark/TTL dedup
    horizon); NoTimeout here mirrors the reference, whose bitmap also
    grows for the life of the table.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = docs_stream.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.sha2(F.col("text"), 256).alias("text_hash"),
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, best = 0, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        if best is not None and not state.exists:
            state.update((best,))
            yield pd.DataFrame(
                {
                    "doc_id": [best],
                    "text_hash": [key[0]],
                    "n_batch_copies": [n],
                }
            )

    return hashed.groupBy("text_hash").applyInPandasWithState(
        update, _DEDUP_OUT, _DEDUP_STATE, "append", GroupStateTimeout.NoTimeout
    )


# --------------------------------------------------------------------------
# Watermarked event-time window counts (late data dropped + counted)
# --------------------------------------------------------------------------


def streaming_windowed_counts(
    events_stream: DataFrame,
    delay: str = "10 minutes",
    window: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window counts with a late-data watermark.

    Input columns: ``ts timestamp, event_type string``.  Append mode: a
    window row is emitted once, when the watermark passes its end — the
    streaming twin of a batch ``GROUP BY time_bucket`` that can actually
    retire state at 100 TB/day (without the watermark, window state grows
    forever).  Rows arriving more than ``delay`` behind the max observed
    event time are dropped and surface in
    ``QueryStats.rows_dropped_by_watermark`` via ``MetricsListener`` —
    the event-time analog of the reference discarding offsets behind the
    ring window (``task/task.go:205-212``).
    """
    return (
        events_stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


# --------------------------------------------------------------------------
# Stream-stream time-interval join (click attribution)
# --------------------------------------------------------------------------


def streaming_click_attribution(
    views_stream: DataFrame,
    clicks_stream: DataFrame,
    max_lag: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Attribute each click to every view by the same user at most
    ``max_lag`` earlier — a watermarked stream-stream inner join.

    Input columns (both sides): ``ts timestamp, user_id bigint``.  Both
    sides carry a watermark and the join predicate bounds click_ts within
    [view_ts, view_ts + max_lag], so Spark can size the join state: a
    buffered view row is dropped once the click-side watermark passes
    view_ts + max_lag — state stays O(window), not O(stream), which is
    the only way a stream-stream join survives at 100 TB/day.  Emission is
    append-mode (a pair is output once, when matched).
    """
    v = views_stream.select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    ).withWatermark("view_ts", watermark)
    c = clicks_stream.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    ).withWatermark("click_ts", watermark)
    joined = v.join(
        c,
        F.expr(
            "v_user = c_user AND "
            f"click_ts >= view_ts AND click_ts <= view_ts + INTERVAL {max_lag}"
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"), "view_ts", "click_ts"
    )


# --------------------------------------------------------------------------
# Streaming HyperLogLog maintenance (continuous distinct-cardinality watch)
# --------------------------------------------------------------------------


def streaming_hll_registers(events_stream: DataFrame, store_path: str):
    """Maintain the 256 HLL registers continuously: each micro-batch
    computes its own (bucket, rho-max) rows and max-merges them into the
    persisted register table — the mergeability that makes HLL the
    streaming cardinality sketch (state is 256 rows forever, independent
    of stream volume; the estimate is derivable from the store at any
    instant).

    Twin of ``operators.advanced.hll_distinct_sketch``: identical hash,
    bucketing and rho, so after any prefix of the stream the store equals
    the batch sketch of the same rows (pinned by test).  foreachBatch +
    atomic overwrite is the standard serving-table shape (cf.
    ``streaming_running_topk``).
    """
    from ..functions import portable_hash64
    from ..operators.advanced import _HLL_REM_BITS

    h = portable_hash64(
        F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("event_type"))
    )
    rem = h % F.lit(1 << _HLL_REM_BITS)
    rho = F.when(rem == 0, F.lit(_HLL_REM_BITS + 1)).otherwise(
        F.lit(_HLL_REM_BITS + 1) - F.length(F.bin(rem))
    )
    per_row = events_stream.select(
        F.shiftright(h, _HLL_REM_BITS).alias("bucket"),
        rho.alias("rho"),
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        from .store import read_versioned, versioned_swap_write

        spark = batch_df.sparkSession
        delta = batch_df.groupBy("bucket").agg(F.max("rho").alias("mj"))
        prev = read_versioned(spark, store_path)
        merged = (
            delta if prev is None else prev.unionByName(delta)
            .groupBy("bucket").agg(F.max("mj").alias("mj"))
        )
        versioned_swap_write(merged, store_path, int(epoch_id))

    return per_row.writeStream.outputMode("append").foreachBatch(sink)


# --------------------------------------------------------------------------
# Streaming SCD2 maintenance (delta-scoped dimension rebuild)
# --------------------------------------------------------------------------


SCD2_N_KB = 32  # key-bucket partition fanout for the log and dim stores


def streaming_scd2_maintenance(orders_stream: DataFrame, store_dir: str):
    """Maintain the SCD2 customer-status dimension as the order change-log
    streams in.  Both stores are parquet partitioned by a key bucket
    ``kb = pmod(custkey, 32)`` and every write uses DYNAMIC partition
    overwrite, which is what makes the maintainer production-shaped:

    - **Idempotent log**: the batch lands in its own ``(kb, __epoch)``
      partitions; a replayed epoch OVERWRITES them rather than appending
      duplicates, so the system-of-record log never inflates under
      foreachBatch's at-least-once replay.
    - **Delta-scoped cost**: the rebuild reads only the touched key
      buckets (static partition pruning on the log), recomputes intervals
      for every customer in those buckets, and dynamic overwrite replaces
      exactly those ``kb`` partitions of the dim — per-epoch IO scales
      with touched buckets' history, never the dimension size, with no
      read-merge of the previous dim at all (the old read-prev + anti-join
      + full rewrite both cost O(dimension) per epoch and silently wiped
      untouched keys if the read transiently failed).
    - **Crash safety**: a crash mid-overwrite leaves some touched
      partitions new and some old; the replayed epoch redoes the same
      partitions from the same log state and converges.

    Correctness contract: after any prefix of the stream the serving
    table equals the one-shot batch ``scd2_intervals`` over the same
    rows — including re-OPENING a previously closed interval when a
    late-arriving earlier change lands (why the raw log, not the interval
    table, is the system of record).
    """
    import os

    from ..operators.warehouse import scd2_intervals

    log_store = os.path.join(store_dir, "log")
    dim_store = os.path.join(store_dir, "dim")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.withColumn(
            "kb", F.pmod(F.col("o_custkey"), F.lit(SCD2_N_KB)).cast("int")
        ).persist()
        try:
            (
                batch_df.withColumn("__epoch", F.lit(int(epoch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("kb", "__epoch")
                .parquet(log_store)
            )
            # ≤ SCD2_N_KB scalars — bounded collect, prunes the log scan
            kbs = [r.kb for r in batch_df.select("kb").distinct().collect()]
            affected_log = (
                spark.read.parquet(log_store)
                .filter(F.col("kb").isin(kbs))
                .drop("__epoch")
            )
            rebuilt = scd2_intervals(affected_log.drop("kb"))
            (
                rebuilt.withColumn(
                    "kb", F.pmod(F.col("custkey"), F.lit(SCD2_N_KB)).cast("int")
                )
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("kb")
                .parquet(dim_store)
            )
        finally:
            batch_df.unpersist()

    return orders_stream.writeStream.outputMode("append").foreachBatch(sink)


# --------------------------------------------------------------------------
# Streaming IVF index maintenance (the ann_ivf_persisted incremental twin)
# --------------------------------------------------------------------------


def streaming_ivf_index_maintenance(
    emb_stream: DataFrame, index_path: str, cents: list
):
    """Maintain the persisted IVF index continuously: each micro-batch
    assigns ONLY its new vectors to cells (the Arrow matmul assigner
    against a FIXED centroid snapshot, ``similarity.assign_cells_arrow``)
    and appends them to the cell-partitioned corpus store — the
    incremental twin of ``operators.similarity.build_ivf_index``, for the
    continuously-ingested embedding corpus every production vector index
    serves.

    Scale shape: per-batch cost is |batch| matmul rows + one append of
    |batch| rows into the touched cell partitions — independent of index
    size; queries keep using ``ann_ivf_query``'s partition-pruned probe
    against the same directory layout (nprobe/K of the data read,
    regardless of how many batches built it).  ``cents`` is the training
    snapshot (centroids must be FROZEN while the store grows, or cell
    membership would drift between batches — re-clustering is a rebuild,
    exactly as in FAISS).  The centroid table is written once so
    ``ann_ivf_query`` can reload the identical snapshot.

    Exactly-once (idempotent replay): each epoch's rows land under
    partitions ``(cid, __epoch)`` with dynamic partition overwrite, so a
    replayed epoch REWRITES its own partitions instead of appending a
    second copy — the same discipline as the SCD2 maintainer.  Readers
    (``ann_ivf_query``) drop the bookkeeping ``__epoch`` column; partition
    pruning on the leading ``cid`` key is unaffected.
    """
    return emb_stream.writeStream.outputMode("append").foreachBatch(
        _ivf_maintenance_sink(index_path, cents)
    )


def _ivf_maintenance_sink(index_path: str, cents: list):
    """The foreachBatch body of :func:`streaming_ivf_index_maintenance`,
    exposed so tests can drive a replayed epoch directly."""
    import os as _os

    from ..operators.similarity import _broadcast_centroids, assign_cells_arrow

    cent_path = _os.path.join(index_path, "centroids")
    corpus_path = _os.path.join(index_path, "corpus")
    # the snapshot is FROZEN for the stream's lifetime, so broadcast it
    # once (first batch) and reuse across epochs — re-broadcasting per
    # epoch would leak one executor-resident copy per micro-batch until
    # the driver GCs the old handles
    bc_holder: list = []

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if not _os.path.exists(cent_path):
            spark.createDataFrame(
                [(cid, vec) for cid, vec in cents],
                "cid int, embedding array<double>",
            ).coalesce(1).write.mode("overwrite").parquet(cent_path)
        if not bc_holder:
            bc_holder.append(_broadcast_centroids(batch_df, cents))
        assigned = assign_cells_arrow(
            batch_df.select(
                F.col("vec_id").alias("neighbor_id"), "embedding"
            ),
            cents,
            bc=bc_holder[0],
        )
        (
            assigned.withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cid", "__epoch")
            .parquet(corpus_path)
        )

    return sink
