"""Streaming twins of the oracle-checked batch funnel and gap-fill/LOCF.

Each test feeds the SAME rows in two micro-batches (cross-batch state is
the point) and uses the batch formulation as the oracle.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from clickhouse_sinker_nali_spark.streaming.analytics import (
    streaming_funnel_stages,
    streaming_gapfill_locf,
)


def _pin_batch_order(src):
    """File-source batch order follows modification time; make it match
    file-name order deterministically."""
    for i, fname in enumerate(sorted(os.listdir(src))):
        t = 1_700_000_000 + i * 1000
        os.utime(os.path.join(src, fname), (t, t))


def _stream_json(spark, src, schema):
    _pin_batch_order(src)
    raw = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(src)
    return raw.select(F.from_json("value", schema).alias("m")).select("m.*")


def _run(df, tmp_path, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    q.awaitTermination(180)


def test_streaming_funnel_matches_batch_stages(spark, tmp_path):
    """Events split across two batches with out-of-order types per user:
    the latest emitted stage per user must equal the batch decision."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # 12 users exercising every stage pattern; click/purchase arrive in the
    # FIRST batch for some users, before their view (second batch) — the
    # running-minimum state must still converge to the batch answer.
    first, second = [], []
    for u in range(12):
        base = f"2024-05-0{u % 9 + 1}"
        if u % 4 == 0:  # full funnel, split across batches
            first += [
                {"ts": f"{base} 10:00:00", "user_id": u, "event_type": "view"},
                {"ts": f"{base} 11:00:00", "user_id": u, "event_type": "click"},
            ]
            second += [{"ts": f"{base} 12:00:00", "user_id": u, "event_type": "purchase"}]
        elif u % 4 == 1:  # click before view -> stuck at stage 1
            first += [{"ts": f"{base} 09:00:00", "user_id": u, "event_type": "click"}]
            second += [{"ts": f"{base} 10:00:00", "user_id": u, "event_type": "view"}]
        elif u % 4 == 2:  # view+click, purchase before click -> stage 2
            first += [
                {"ts": f"{base} 10:00:00", "user_id": u, "event_type": "view"},
                {"ts": f"{base} 10:30:00", "user_id": u, "event_type": "purchase"},
            ]
            second += [{"ts": f"{base} 11:00:00", "user_id": u, "event_type": "click"}]
        else:  # view only
            second += [{"ts": f"{base} 10:00:00", "user_id": u, "event_type": "view"}]
    for fname, rows in (("a.txt", first), ("b.txt", second)):
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    schema = "ts timestamp, user_id bigint, event_type string"
    _run(
        streaming_funnel_stages(_stream_json(spark, src, schema)),
        tmp_path,
        "funnel_stream",
        "update",
    )
    latest = {}
    for r in spark.table("funnel_stream").collect():
        latest[r.user_id] = r.stage  # memory sink appends updates in order

    batch = (
        spark.read.text(src)
        .select(F.from_json("value", schema).alias("m"))
        .select("m.*")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("tv"),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("tc"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tb"),
        )
        .select(
            "user_id",
            F.when(
                F.col("tv").isNotNull()
                & (F.col("tc") > F.col("tv"))
                & (F.col("tb") > F.col("tc")),
                3,
            )
            .when(F.col("tv").isNotNull() & (F.col("tc") > F.col("tv")), 2)
            .when(F.col("tv").isNotNull(), 1)
            .otherwise(0)
            .alias("stage"),
        )
    )
    expected = {r.user_id: r.stage for r in batch.collect()}
    assert latest == expected
    assert sorted(set(expected.values())) == [1, 2, 3]  # every pattern exercised


def test_streaming_gapfill_locf_fills_cross_batch_gaps(spark, tmp_path):
    """Daily rollup rows arrive in two batches with gaps inside AND between
    them; the filler must emit every missing day with the carried value,
    including the gap that spans the batch boundary."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = [("2024-05-01", 4, 10.0), ("2024-05-02", 2, 20.0), ("2024-05-05", 1, 50.0)]
    b2 = [("2024-05-07", 3, 70.0), ("2024-05-10", 2, 100.0)]
    for fname, rows in (("a.txt", b1), ("b.txt", b2)):
        with open(os.path.join(src, fname), "w") as f:
            for day, n, v in rows:
                f.write(
                    json.dumps(
                        {"series": "s1", "day": f"{day} 00:00:00", "n_events": n, "avg_value": v}
                    )
                    + "\n"
                )

    schema = "series string, day timestamp, n_events bigint, avg_value double"
    _run(
        streaming_gapfill_locf(_stream_json(spark, src, schema)),
        tmp_path,
        "gapfill_stream",
        "append",
    )
    got = {
        r.day.strftime("%Y-%m-%d"): (r.n_events, r.locf_avg_value, r.filled)
        for r in spark.table("gapfill_stream").collect()
    }
    # dense spine 05-01..05-10, LOCF across the 05-05 -> 05-07 batch boundary
    expected = {
        "2024-05-01": (4, 10.0, False),
        "2024-05-02": (2, 20.0, False),
        "2024-05-03": (0, 20.0, True),
        "2024-05-04": (0, 20.0, True),
        "2024-05-05": (1, 50.0, False),
        "2024-05-06": (0, 50.0, True),
        "2024-05-07": (3, 70.0, False),
        "2024-05-08": (0, 70.0, True),
        "2024-05-09": (0, 70.0, True),
        "2024-05-10": (2, 100.0, False),
    }
    assert got == expected


def test_streaming_gapfill_ignores_late_duplicate_days(spark, tmp_path):
    """A day re-delivered in a later batch (at-least-once upstream) must be
    dropped, not re-emitted or allowed to corrupt the LOCF value."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.txt"), "w") as f:
        f.write(json.dumps({"series": "s1", "day": "2024-05-01 00:00:00", "n_events": 1, "avg_value": 1.0}) + "\n")
        f.write(json.dumps({"series": "s1", "day": "2024-05-03 00:00:00", "n_events": 1, "avg_value": 3.0}) + "\n")
    with open(os.path.join(src, "b.txt"), "w") as f:
        f.write(json.dumps({"series": "s1", "day": "2024-05-01 00:00:00", "n_events": 9, "avg_value": 99.0}) + "\n")
        f.write(json.dumps({"series": "s1", "day": "2024-05-04 00:00:00", "n_events": 1, "avg_value": 4.0}) + "\n")

    schema = "series string, day timestamp, n_events bigint, avg_value double"
    _run(
        streaming_gapfill_locf(_stream_json(spark, src, schema)),
        tmp_path,
        "gapfill_late",
        "append",
    )
    rows = spark.table("gapfill_late").collect()
    days = [r.day.strftime("%Y-%m-%d") for r in rows]
    assert sorted(days) == ["2024-05-01", "2024-05-02", "2024-05-03", "2024-05-04"]
    by_day = {r.day.strftime("%Y-%m-%d"): r for r in rows}
    assert by_day["2024-05-01"].n_events == 1  # first delivery wins
    assert by_day["2024-05-04"].locf_avg_value == 4.0


def test_streaming_running_topk_matches_batch(spark, tmp_path):
    """Leaderboard after two micro-batches must equal the batch top-k over
    all rows, including keys whose count did NOT change in the last batch."""
    from clickhouse_sinker_nali_spark.streaming.analytics import (
        streaming_running_topk,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1 gives w0 a commanding lead; batch 2 touches other keys only,
    # so the merge path (not just last-batch ranking) is what keeps w0 first
    with open(os.path.join(src, "a.txt"), "w") as f:
        for i in range(60):
            f.write(json.dumps({"ts": "2024-05-01 10:00:00", "user_id": i, "event_type": f"w{i % 6 if i < 30 else 0}"}) + "\n")
    with open(os.path.join(src, "b.txt"), "w") as f:
        for i in range(30):
            f.write(json.dumps({"ts": "2024-05-01 11:00:00", "user_id": i, "event_type": f"w{1 + i % 5}"}) + "\n")

    schema = "ts timestamp, user_id bigint, event_type string"
    out = str(tmp_path / "leaderboard")
    q = (
        streaming_running_topk(_stream_json(spark, src, schema), "event_type", 3, out)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_topk"))
        .start()
    )
    q.awaitTermination(180)

    from clickhouse_sinker_nali_spark.streaming.store import read_versioned

    got = [
        (r.rank, r.event_type, r.n)
        for r in read_versioned(spark, out).orderBy("rank").collect()
    ]
    batch = (
        spark.read.text(src)
        .select(F.from_json("value", schema).alias("m"))
        .select("m.*")
        .groupBy("event_type")
        .count()
        .orderBy(F.col("count").desc(), "event_type")
        .limit(3)
        .collect()
    )
    expected = [(i + 1, r.event_type, r["count"]) for i, r in enumerate(batch)]
    assert got == expected


def test_streaming_gapfill_keeps_series_independent(spark, tmp_path):
    """Two interleaved series must each get their own spine and LOCF state
    (state is keyed per series, not global)."""
    from clickhouse_sinker_nali_spark.streaming.analytics import (
        streaming_gapfill_locf,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.txt"), "w") as f:
        f.write(json.dumps({"series": "s1", "day": "2024-05-01 00:00:00", "n_events": 1, "avg_value": 10.0}) + "\n")
        f.write(json.dumps({"series": "s2", "day": "2024-05-02 00:00:00", "n_events": 1, "avg_value": 200.0}) + "\n")
    with open(os.path.join(src, "b.txt"), "w") as f:
        f.write(json.dumps({"series": "s1", "day": "2024-05-04 00:00:00", "n_events": 1, "avg_value": 40.0}) + "\n")
        f.write(json.dumps({"series": "s2", "day": "2024-05-04 00:00:00", "n_events": 1, "avg_value": 400.0}) + "\n")

    schema = "series string, day timestamp, n_events bigint, avg_value double"
    _run(
        streaming_gapfill_locf(_stream_json(spark, src, schema)),
        tmp_path,
        "gapfill_multi",
        "append",
    )
    got = {
        (r.series, r.day.strftime("%Y-%m-%d")): (r.locf_avg_value, r.filled)
        for r in spark.table("gapfill_multi").collect()
    }
    assert got == {
        ("s1", "2024-05-01"): (10.0, False),
        ("s1", "2024-05-02"): (10.0, True),
        ("s1", "2024-05-03"): (10.0, True),
        ("s1", "2024-05-04"): (40.0, False),
        ("s2", "2024-05-02"): (200.0, False),
        ("s2", "2024-05-03"): (200.0, True),
        ("s2", "2024-05-04"): (400.0, False),
    }


def test_native_session_window_streaming_agg(spark, tmp_path):
    """Built-in session_window: gap-bounded sessions per user in streaming
    append mode must match the same aggregation run in batch."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = []
    for u in (1, 2):
        # two bursts separated by > 10 min gap -> 2 sessions per user
        for m in (0, 2, 4):
            rows.append({"ts": f"2024-05-01 10:0{m}:00", "user_id": u, "event_type": "view"})
        for m in (30, 31):
            rows.append({"ts": f"2024-05-01 10:{m}:00", "user_id": u, "event_type": "view"})
    with open(os.path.join(src, "a.txt"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    # sentinel in a SECOND batch pushes the watermark past every session so
    # append mode emits them all before the availableNow query terminates
    with open(os.path.join(src, "b.txt"), "w") as f:
        f.write(json.dumps({"ts": "2024-05-02 00:00:00", "user_id": 99, "event_type": "view"}) + "\n")

    schema = "ts timestamp, user_id bigint, event_type string"
    sessions = (
        _stream_json(spark, src, schema)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _run(sessions, tmp_path, "sess_native", "append")
    got = {
        (r.user_id, r.session_window.start.isoformat(), r.n)
        for r in spark.table("sess_native").collect()
        if r.user_id != 99
    }
    batch = (
        spark.read.text(src)
        .select(F.from_json("value", schema).alias("m"))
        .select("m.*")
        .filter(F.col("user_id") != 99)
        .groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expected = {
        (r.user_id, r.session_window.start.isoformat(), r.n) for r in batch
    }
    assert got == expected
    assert len({k[:2] for k in got}) == 4  # 2 users x 2 sessions


def test_streaming_dedup_exact_first_arrival_wins(spark, tmp_path):
    """Intra-batch duplicate -> smallest doc_id kept; cross-batch duplicate
    -> suppressed; distinct-text set matches the batch distinct set."""
    from clickhouse_sinker_nali_spark.streaming.analytics import (
        streaming_dedup_exact,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    first = [
        {"doc_id": 0, "text": "alpha beta"},
        {"doc_id": 1, "text": "gamma delta"},
        {"doc_id": 2, "text": "epsilon"},
        {"doc_id": 5, "text": "alpha beta"},  # intra-batch dup of doc 0
    ]
    second = [
        {"doc_id": 6, "text": "gamma delta"},  # cross-batch dup of doc 1
        {"doc_id": 7, "text": "zeta eta"},  # genuinely new
        {"doc_id": 3, "text": "epsilon"},  # cross-batch dup, SMALLER id:
        # first-arrival semantics keep doc 2, not doc 3
    ]
    for fname, rows in (("a.txt", first), ("b.txt", second)):
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    schema = "doc_id bigint, text string"
    _run(
        streaming_dedup_exact(_stream_json(spark, src, schema)),
        tmp_path,
        "dedup_stream",
        "append",
    )
    got = {r.doc_id: r for r in spark.table("dedup_stream").collect()}
    assert set(got) == {0, 1, 2, 7}
    assert got[0].n_batch_copies == 2  # both copies of 'alpha beta' counted
    assert got[1].n_batch_copies == 1

    # the emitted hash set equals the batch-mode distinct set over ALL rows
    batch = (
        spark.read.text(src)
        .select(F.from_json("value", schema).alias("m"))
        .select("m.*")
        .select(F.sha2(F.col("text"), 256).alias("h"))
        .distinct()
    )
    assert {r.text_hash for r in got.values()} == {r.h for r in batch.collect()}


def test_streaming_watermark_drops_late_rows_and_counts_them(spark, tmp_path):
    """A second-batch event older than (max event time - delay) must be
    excluded from its window AND show up in rows_dropped_by_watermark."""
    from clickhouse_sinker_nali_spark.streaming.analytics import (
        streaming_windowed_counts,
    )
    from clickhouse_sinker_nali_spark.streaming.statistics import MetricsListener

    src = str(tmp_path / "src")
    os.makedirs(src)
    first = [
        {"ts": "2024-05-01 10:00:00", "event_type": "view"},
        {"ts": "2024-05-01 10:05:00", "event_type": "view"},
        {"ts": "2024-05-01 12:00:00", "event_type": "view"},  # advances WM
    ]
    # buffer batch: the state operator merges a batch's input BEFORE
    # evicting windows behind the watermark, so the 10:00 window finalizes
    # during THIS batch and the late row must arrive strictly after it
    second = [{"ts": "2024-05-01 12:05:00", "event_type": "view"}]
    third = [
        {"ts": "2024-05-01 10:07:00", "event_type": "view"},  # LATE: dropped
        {"ts": "2024-05-01 12:10:00", "event_type": "view"},
    ]
    for fname, rows in (("a.txt", first), ("b.txt", second), ("c.txt", third)):
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        schema = "ts timestamp, event_type string"
        _run(
            streaming_windowed_counts(_stream_json(spark, src, schema)),
            tmp_path,
            "wm_counts",
            "append",
        )
        emitted = {
            (str(r.window_start), r.event_type): r.n
            for r in spark.table("wm_counts").collect()
        }
        # the 10:00-10:10 window was finalized by batch 1's 12:00 event;
        # the late 10:07 row must NOT be in it
        assert emitted[("2024-05-01 10:00:00", "view")] == 2
        dropped = sum(
            s.rows_dropped_by_watermark for s in listener.stats.values()
        )
        assert dropped == 1
    finally:
        spark.streams.removeListener(listener)


def test_streaming_click_attribution_matches_batch_interval_join(spark, tmp_path):
    """Stream-stream join twin: views and clicks split across batches;
    emitted pairs must equal the batch interval join over all rows."""
    from clickhouse_sinker_nali_spark.streaming.analytics import (
        streaming_click_attribution,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    first = [
        {"ts": "2024-05-01 10:00:00", "user_id": 1, "event_type": "view"},
        {"ts": "2024-05-01 10:10:00", "user_id": 1, "event_type": "click"},
        {"ts": "2024-05-01 10:00:00", "user_id": 2, "event_type": "view"},
    ]
    second = [
        # cross-batch match: click for user 2 arrives a batch after its view
        {"ts": "2024-05-01 10:20:00", "user_id": 2, "event_type": "click"},
        # outside max_lag: no attribution
        {"ts": "2024-05-01 09:00:00", "user_id": 3, "event_type": "view"},
        {"ts": "2024-05-01 09:45:00", "user_id": 3, "event_type": "click"},
        # click BEFORE the view: no attribution
        {"ts": "2024-05-01 11:00:00", "user_id": 4, "event_type": "click"},
        {"ts": "2024-05-01 11:30:00", "user_id": 4, "event_type": "view"},
    ]
    for fname, rows in (("a.txt", first), ("b.txt", second)):
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    schema = "ts timestamp, user_id bigint, event_type string"
    stream = _stream_json(spark, src, schema)
    views = stream.filter(F.col("event_type") == "view")
    clicks = stream.filter(F.col("event_type") == "click")
    _run(
        streaming_click_attribution(views, clicks),
        tmp_path,
        "attrib_stream",
        "append",
    )
    got = {
        (r.user_id, str(r.view_ts), str(r.click_ts))
        for r in spark.table("attrib_stream").collect()
    }

    batch = (
        spark.read.text(src)
        .select(F.from_json("value", schema).alias("m"))
        .select("m.*")
    )
    bv = batch.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    bc = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    want = {
        (r.v_user, str(r.view_ts), str(r.click_ts))
        for r in bv.join(
            bc,
            F.expr(
                "v_user = c_user AND click_ts >= view_ts "
                "AND click_ts <= view_ts + INTERVAL 30 minutes"
            ),
        ).collect()
    }
    assert got == want
    assert (1, "2024-05-01 10:00:00", "2024-05-01 10:10:00") in got
    assert (2, "2024-05-01 10:00:00", "2024-05-01 10:20:00") in got  # cross-batch
    assert not any(u == 3 or u == 4 for (u, _, _) in got)


def test_streaming_lsh_index_matches_batch_lsh(spark, tmp_path):
    """After two micro-batches, the appended pair set must equal the
    one-shot batch MinHash-LSH over the same documents, with every pair
    emitted exactly once (new×old pairs by the later batch, new×new by
    their own batch)."""
    import clickhouse_sinker_nali_spark.operators.dedup as D
    from clickhouse_sinker_nali_spark.streaming.dedup import (
        streaming_lsh_index_maintenance,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    cut = rows[len(rows) // 2].doc_id
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.txt"), "w") as f:
        for r in rows:
            if r.doc_id < cut:
                f.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")
    with open(os.path.join(src, "b.txt"), "w") as f:
        for r in rows:
            if r.doc_id >= cut:
                f.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")

    stream = _stream_json(spark, src, "doc_id bigint, text string")
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")
    q = (
        streaming_lsh_index_maintenance(stream, store, pairs_dir)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_lsh"))
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in spark.read.parquet(pairs_dir).collect()
    }
    # exactly-once: no pair twice across epochs
    n_rows = spark.read.parquet(pairs_dir).count()
    assert n_rows == len(got)
    expected = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in D.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert got == expected
    # cross-batch coverage: at least one pair spans the cut
    assert any(a < cut <= b for a, b, _ in got), "no new-old pair exercised"


def test_streaming_lsh_progressive_hot_bucket_cap(spark, tmp_path, monkeypatch):
    """The streaming probe applies the hot-bucket cap PROGRESSIVELY: pairs
    emitted while a bucket was small remain, but once its total membership
    crosses the cap no batch emits new pairs from it — while normal
    buckets keep pairing across batches."""
    import clickhouse_sinker_nali_spark.operators.dedup as D
    from clickhouse_sinker_nali_spark.streaming.dedup import (
        streaming_lsh_index_maintenance,
    )

    monkeypatch.setattr(D, "LSH_MAX_BUCKET", 4)
    boiler = "accept all cookies to continue reading this very fine website "
    story = "a long unique story about spark shuffles and broadcast joins "
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.txt"), "w") as f:
        for i in range(1, 5):  # 4 boilerplate docs: bucket at the cap
            f.write(json.dumps({"doc_id": i, "text": boiler * 5}) + "\n")
        # 100/101 identical, and 102's variant provably shares their band
        # keys (the tail's shingles are not the band minima)
        f.write(json.dumps({"doc_id": 100, "text": story * 5 + "extra tail"}) + "\n")
        f.write(json.dumps({"doc_id": 101, "text": story * 5 + "extra tail"}) + "\n")
    with open(os.path.join(src, "b.txt"), "w") as f:
        for i in range(5, 8):  # bucket grows to 7 > cap: no new pairs
            f.write(json.dumps({"doc_id": i, "text": boiler * 5}) + "\n")
        f.write(json.dumps({"doc_id": 102, "text": story * 5 + "other end"}) + "\n")

    stream = _stream_json(spark, src, "doc_id bigint, text string")
    pairs_dir = str(tmp_path / "pairs_cap")
    q = (
        streaming_lsh_index_maintenance(
            stream, str(tmp_path / "store_cap"), pairs_dir
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_cap"))
        .start()
    )
    q.awaitTermination(300)

    got = {(r.doc_a, r.doc_b) for r in spark.read.parquet(pairs_dir).collect()}
    early_boiler = {(a, b) for a in range(1, 5) for b in range(1, 5) if a < b}
    assert early_boiler <= got  # the small-bucket era's pairs remain
    # nothing involving the late arrivals 5-7 (bucket over cap)
    assert not any(b >= 5 and b < 100 or a >= 5 and a < 100 for a, b in got)
    # normal near-dups keep pairing across batches
    assert (100, 102) in got and (101, 102) in got and (100, 101) in got


def test_streaming_lsh_frozen_cap_equals_batch_cap(spark, tmp_path):
    """r8 (r7 verdict task #5): the cap frozen into the band-store
    metadata must equal the batch path's derived cap over the same corpus
    version, and a later stream must actually probe with the frozen cap
    (teeth: an artificially low frozen cap suppresses new pairs the floor
    would admit)."""
    import clickhouse_sinker_nali_spark.operators.dedup as D
    from clickhouse_sinker_nali_spark.functions import word_shingles
    from clickhouse_sinker_nali_spark.session import load_table
    from clickhouse_sinker_nali_spark.streaming.dedup import (
        freeze_band_store_cap,
        read_frozen_cap,
        streaming_lsh_index_maintenance,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.txt"), "w") as f:
        for r in docs.collect():
            f.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")
    stream = _stream_json(spark, src, "doc_id bigint, text string")
    store = str(tmp_path / "store")
    q = (
        streaming_lsh_index_maintenance(stream, store, str(tmp_path / "pairs"))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)

    # freeze == batch derivation over the same banded rows (same corpus
    # version): the store holds exactly the corpus' band rows, so the
    # frozen value must equal derive_bucket_cap over a fresh batch banding
    frozen = freeze_band_store_cap(spark, store)
    assert read_frozen_cap(store) == frozen
    batch_banded = D._banded_sigs(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.explode(word_shingles("text", 3)).alias("shingle"),
        )
    )
    assert frozen == D.derive_bucket_cap(batch_banded)

    # teeth: an artificially low frozen cap must suppress pairs a second
    # batch would otherwise emit (proves the sink reads the metadata)
    boiler = "accept all cookies to continue reading this very fine website "
    store2 = str(tmp_path / "store2")
    src2 = str(tmp_path / "src2")
    os.makedirs(src2)
    with open(os.path.join(src2, "a.txt"), "w") as f:
        for i in range(1, 6):  # 5-member duplicate bucket
            f.write(json.dumps({"doc_id": i, "text": boiler * 5}) + "\n")
    os.makedirs(store2)
    with open(os.path.join(store2, "cap.json"), "w") as f:
        json.dump({"cap": 2}, f)
    stream2 = _stream_json(spark, src2, "doc_id bigint, text string")
    pairs2 = str(tmp_path / "pairs2")
    q2 = (
        streaming_lsh_index_maintenance(stream2, store2, pairs2)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q2.awaitTermination(300)
    import pyspark.errors

    try:
        n_pairs = spark.read.parquet(pairs2).count()
    except pyspark.errors.AnalysisException:  # no pair files written at all
        n_pairs = 0
    assert n_pairs == 0  # bucket of 5 > frozen cap 2 -> no pairs
    # control: same corpus, never-frozen store -> floor (64) admits all 10
    stream3 = _stream_json(spark, src2, "doc_id bigint, text string")
    pairs3 = str(tmp_path / "pairs3")
    q3 = (
        streaming_lsh_index_maintenance(
            stream3, str(tmp_path / "store3"), pairs3
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q3.awaitTermination(300)
    assert spark.read.parquet(pairs3).count() == 10


def test_streaming_ivf_index_matches_batch_build_and_query(spark, tmp_path):
    """Two micro-batches of embeddings must grow the cell-partitioned
    store to exactly the batch build's content (same assignments under the
    frozen centroid snapshot), and ann_ivf_query over the streamed index
    must equal the in-memory ann_ivf_topk results."""
    import clickhouse_sinker_nali_spark.operators.similarity as S
    from clickhouse_sinker_nali_spark.streaming.analytics import (
        streaming_ivf_index_maintenance,
    )

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = S._centroids(emb)
    corpus_rows = sorted(
        emb.filter(F.col("vec_id") >= S.N_QUERIES).collect(),
        key=lambda r: r.vec_id,
    )
    cut = corpus_rows[len(corpus_rows) // 2].vec_id
    src = str(tmp_path / "emb_src")
    os.makedirs(src)
    for fname, pred in [("a.jsonl", lambda v: v < cut), ("b.jsonl", lambda v: v >= cut)]:
        with open(os.path.join(src, fname), "w") as f:
            for r in corpus_rows:
                if pred(r.vec_id):
                    f.write(json.dumps(
                        {"vec_id": r.vec_id,
                         "embedding": [float(x) for x in r.embedding]}) + "\n")

    stream = _stream_json(spark, src, "vec_id bigint, embedding array<float>")
    index = str(tmp_path / "ivf_index")
    q = (
        streaming_ivf_index_maintenance(stream, index, cents)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ivf"))
        .start()
    )
    q.awaitTermination(300)

    # store content == batch assignment over the full corpus
    got = {
        (r.neighbor_id, r.cid)
        for r in spark.read.parquet(f"{index}/corpus").collect()
    }
    expect = {
        (r.neighbor_id, r.cid)
        for r in S.assign_cells_arrow(
            emb.filter(F.col("vec_id") >= S.N_QUERIES).select(
                F.col("vec_id").alias("neighbor_id"), "embedding"
            ),
            cents,
        ).collect()
    }
    assert got == expect
    assert len(got) == len(corpus_rows)  # appended exactly once
    # query over the streamed index == the in-memory IVF query
    streamed = [
        (r.query_id, r.rank, r.neighbor_id)
        for r in S.ann_ivf_query(spark, sf_dir, index).collect()
    ]
    in_mem = [
        (r.query_id, r.rank, r.neighbor_id)
        for r in S.ann_ivf_topk(spark, sf_dir).collect()
    ]
    assert streamed == in_mem


def test_streaming_ivf_index_replayed_epoch_is_idempotent(spark, tmp_path):
    """foreachBatch replays an epoch after a crash-before-commit; the IVF
    maintainer keys its partitions on (cid, __epoch) with dynamic
    overwrite, so driving the SAME batch at the SAME epoch twice must not
    duplicate vectors in the serving index."""
    import clickhouse_sinker_nali_spark.operators.similarity as S
    from clickhouse_sinker_nali_spark.streaming.analytics import (
        _ivf_maintenance_sink,
    )

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = S._centroids(emb)
    corpus = emb.filter(F.col("vec_id") >= S.N_QUERIES)
    ids = sorted(r.vec_id for r in corpus.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    b0 = corpus.filter(F.col("vec_id") < cut)
    b1 = corpus.filter(F.col("vec_id") >= cut)

    index = str(tmp_path / "ivf_replay")
    sink = _ivf_maintenance_sink(index, cents)
    sink(b0, 0)
    sink(b1, 1)
    once = sorted(
        (r.neighbor_id, r.cid)
        for r in spark.read.parquet(f"{index}/corpus").collect()
    )
    assert len(once) == len(ids)
    sink(b1, 1)  # replay of epoch 1 (crash between write and commit)
    replayed = sorted(
        (r.neighbor_id, r.cid)
        for r in spark.read.parquet(f"{index}/corpus").collect()
    )
    assert replayed == once, "replayed epoch duplicated vectors in the index"
    # and the query path is oblivious to the __epoch bookkeeping column
    got = [
        (r.query_id, r.rank, r.neighbor_id)
        for r in S.ann_ivf_query(spark, sf_dir, index).collect()
    ]
    want = [
        (r.query_id, r.rank, r.neighbor_id)
        for r in S.ann_ivf_topk(spark, sf_dir).collect()
    ]
    assert got == want


def test_versioned_swap_write_gcs_superseded_versions(spark, tmp_path):
    """Each swap must leave only the current version and its immediate
    predecessor on disk — a long-running stream must not accumulate one
    full store copy per epoch."""
    from clickhouse_sinker_nali_spark.streaming.store import (
        read_versioned,
        versioned_swap_write,
    )

    store = str(tmp_path / "vstore")
    for epoch in range(5):
        df = spark.range(epoch + 1).withColumnRenamed("id", "v")
        versioned_swap_write(df, store, epoch)
    dirs = sorted(d for d in os.listdir(store) if d.startswith("v_"))
    assert dirs == ["v_3", "v_4"], dirs
    assert read_versioned(spark, store).count() == 5
    # a replayed epoch writes a fresh __r suffix (never touching the dir
    # CURRENT points at) and GC keeps exactly {new, previous} — the older
    # v_3 goes, the pre-replay v_4 stays for in-flight readers
    versioned_swap_write(spark.range(5).withColumnRenamed("id", "v"), store, 4)
    dirs = sorted(d for d in os.listdir(store) if d.startswith("v_"))
    assert dirs == ["v_4", "v_4__r1"], dirs
    assert read_versioned(spark, store).count() == 5


def test_versioned_swap_write_replay_reads_own_version(spark, tmp_path):
    """The crash-between-flip-and-commit replay: CURRENT already points
    at v_N and the replayed epoch's merge plan lazily READS v_N while
    versioned_swap_write(v_N) rewrites it.  The side-dir swap must let
    this succeed (a direct overwrite of a path being read from fails on
    every replay, wedging the stream permanently)."""
    from pyspark.sql import functions as F

    from clickhouse_sinker_nali_spark.streaming.store import (
        read_versioned,
        versioned_swap_write,
    )

    store = str(tmp_path / "vstore_replay")
    versioned_swap_write(
        spark.range(10).withColumnRenamed("id", "v"), store, 7
    )
    # replayed epoch 7: merge = f(previous state) where previous IS v_7
    merged = read_versioned(spark, store).withColumn("v", F.col("v") + 1)
    versioned_swap_write(merged, store, 7)
    got = sorted(r.v for r in read_versioned(spark, store).collect())
    assert got == list(range(1, 11))
    # no stale side dirs left behind
    assert not [d for d in os.listdir(store) if d.endswith("__tmp")]
    # the pre-replay v_7 survives for in-flight readers; CURRENT names
    # the new rewrite — at no point did the write touch v_7 itself
    assert sorted(d for d in os.listdir(store) if d.startswith("v_")) == [
        "v_7", "v_7__r1",
    ]
    with open(os.path.join(store, "CURRENT")) as f:
        assert f.read().strip() == "v_7__r1"


def test_versioned_swap_write_cleans_crash_leftovers(spark, tmp_path):
    """Crash-injection (r5 VERDICT #8 / ADVICE low): a crash between data
    write and pointer flip leaves a partial version dir (or a legacy
    __tmp side dir) that CURRENT never named.  The next successful write
    must clean BOTH, and at every step CURRENT must resolve to a
    complete, existing directory."""
    from clickhouse_sinker_nali_spark.streaming.store import (
        read_versioned,
        versioned_swap_write,
    )

    store = str(tmp_path / "vstore_crash")
    versioned_swap_write(spark.range(3).withColumnRenamed("id", "v"), store, 1)

    # simulate a crashed epoch-2 write: partial version dir, no flip
    os.makedirs(os.path.join(store, "v_2"))
    with open(os.path.join(store, "v_2", "part-00000.parquet"), "w") as f:
        f.write("partial")
    # ...and a legacy __tmp side dir from the pre-r6 scheme
    os.makedirs(os.path.join(store, "v_9__tmp"))

    # CURRENT still resolves (the crash never touched v_1)
    assert read_versioned(spark, store).count() == 3

    # the replayed epoch 2 writes fresh (v_2 exists -> __r1), flips, GCs
    versioned_swap_write(spark.range(4).withColumnRenamed("id", "v"), store, 2)
    names = sorted(os.listdir(store))
    assert "v_9__tmp" not in names and "v_2" not in names
    assert "v_2__r1" in names and "v_1" in names  # new + previous kept
    assert read_versioned(spark, store).count() == 4


def test_lsh_band_store_probe_is_partition_pruned(spark, tmp_path):
    """The property that keeps the per-batch probe cost proportional to
    the BATCH at 100 TB index size: the band store is partitioned on the
    bucket-key hash, and probing with the delta's key-buckets must prune
    at planning time — untouched partitions contribute zero input files,
    and the scan node carries the kb partition filter."""
    from pyspark.sql import functions as F

    from clickhouse_sinker_nali_spark.streaming.dedup import (
        N_KEY_BUCKETS,
        _key_bucket,
        probe_band_store,
    )

    store = str(tmp_path / "bands")
    synthetic = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 6).cast("int").alias("band"),
        F.md5(F.col("id").cast("string")).alias("key"),
    ).withColumn("kb", _key_bucket(F.col("key")))
    synthetic.write.partitionBy("kb").parquet(store)
    all_kbs = {r.kb for r in spark.read.parquet(store).select("kb").distinct().collect()}
    assert len(all_kbs) > 10  # store genuinely spans many buckets
    probe_kbs = sorted(all_kbs)[:3]

    probed = probe_band_store(spark, store, probe_kbs)
    # files ACTUALLY read at execution (inputFiles() reports the relation
    # before pushdown, so it cannot observe pruning)
    files = [
        r.f for r in probed.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files, "probe read no files"
    assert all(any(f"kb={kb}/" in f for kb in probe_kbs) for f in files), (
        "probe touched partitions outside its key-buckets"
    )
    all_files = {
        r.f
        for r in spark.read.parquet(store)
        .select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert len(files) < len(all_files)
    # and the filter is a planning-time partition filter, not a row filter
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "kb" in plan.split("PartitionFilters", 1)[1][:200]
    # correctness of the pruned read: exactly the rows of those buckets
    expect = synthetic.filter(F.col("kb").isin([int(k) for k in probe_kbs])).count()
    assert probed.count() == expect
    assert N_KEY_BUCKETS == 64


def test_streaming_hll_registers_match_batch_sketch(spark, tmp_path):
    """After two micro-batches the register store must equal the batch
    registers over all rows (max-merge correctness), hence the same
    estimate as the batch sketch."""
    import clickhouse_sinker_nali_spark.operators.advanced as A
    from clickhouse_sinker_nali_spark.streaming.analytics import (
        streaming_hll_registers,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    rows = ev.collect()
    src = str(tmp_path / "src")
    os.makedirs(src)
    half = len(rows) // 2
    for fname, chunk in (("a.txt", rows[:half]), ("b.txt", rows[half:])):
        with open(os.path.join(src, fname), "w") as f:
            for r in chunk:
                f.write(json.dumps({"user_id": r.user_id, "event_type": r.event_type}) + "\n")

    stream = _stream_json(spark, src, "user_id bigint, event_type string")
    store = str(tmp_path / "hll_store")
    q = (
        streaming_hll_registers(stream, store)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .start()
    )
    q.awaitTermination(180)

    from clickhouse_sinker_nali_spark.streaming.store import read_versioned

    got = {r.bucket: r.mj for r in read_versioned(spark, store).collect()}
    from clickhouse_sinker_nali_spark.functions import portable_hash64

    batch = {
        r.bucket: r.mj
        for r in ev.select(
            (
                portable_hash64(
                    F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("event_type"))
                )
                / F.lit(1 << A._HLL_REM_BITS)
            )
            .cast("bigint")
            .alias("bucket"),
            F.when(
                portable_hash64(
                    F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("event_type"))
                )
                % F.lit(1 << A._HLL_REM_BITS)
                == 0,
                F.lit(A._HLL_REM_BITS + 1),
            )
            .otherwise(
                F.lit(A._HLL_REM_BITS + 1)
                - F.length(
                    F.bin(
                        portable_hash64(
                            F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("event_type"))
                        )
                        % F.lit(1 << A._HLL_REM_BITS)
                    )
                )
            )
            .alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("mj"))
        .collect()
    }
    assert got == batch


def test_streaming_scd2_matches_batch_including_late_reopen(spark, tmp_path):
    """Two micro-batches (the second containing a LATE change that lands
    between two existing intervals) must leave the serving dimension
    equal to the one-shot batch SCD2 over all rows."""
    from clickhouse_sinker_nali_spark.operators.warehouse import scd2_intervals
    from clickhouse_sinker_nali_spark.streaming.analytics import (
        streaming_scd2_maintenance,
    )

    rows_b1 = [
        (1, "O", "1995-01-01", 10),
        (1, "F", "1995-06-01", 11),
        (2, "O", "1995-02-01", 20),
    ]
    rows_b2 = [
        (1, "P", "1995-03-15", 12),   # late: splits customer 1's first interval
        (3, "F", "1995-04-01", 30),   # brand-new key
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for fname, chunk in (("a.txt", rows_b1), ("b.txt", rows_b2)):
        with open(os.path.join(src, fname), "w") as f:
            for ck, st, d, ok in chunk:
                f.write(json.dumps({
                    "o_custkey": ck, "o_orderstatus": st,
                    "o_orderdate": d, "o_orderkey": ok,
                }) + "\n")

    schema = "o_custkey bigint, o_orderstatus string, o_orderdate date, o_orderkey bigint"
    store = str(tmp_path / "scd2")
    q = (
        streaming_scd2_maintenance(_stream_json(spark, src, schema), store)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_scd2"))
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.custkey, r.status, str(r.valid_from), str(r.valid_to))
        for r in spark.read.parquet(os.path.join(store, "dim")).collect()
    }
    all_rows = spark.createDataFrame(
        [(ck, st, d, ok) for ck, st, d, ok in rows_b1 + rows_b2],
        "o_custkey bigint, o_orderstatus string, o_orderdate string, o_orderkey bigint",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    expect = {
        (r.custkey, r.status, str(r.valid_from), str(r.valid_to))
        for r in scd2_intervals(all_rows).collect()
    }
    assert got == expect
    # the late change must actually have split an interval
    assert any(c == 1 and s == "P" for c, s, _, _ in got)
