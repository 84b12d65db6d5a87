"""Geo-DB refresh orchestration: a replaced geo table must be visible in
the next micro-batch without restarting the stream.

Reference surface: ``util/auto_update.go:19-43`` (daily re-download +
process restart).  Our restart-free shape re-broadcasts per epoch via
``GeoDbRefresher`` + ``geo_enriched_batch_writer``.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from clickhouse_sinker_nali_spark.streaming.refresh import (
    GeoDbRefresher,
    geo_enriched_batch_writer,
)


def _write_geo(spark, path: str, loc: str, isp: str) -> None:
    spark.createDataFrame(
        [(167772160, 167772160 + 16384, loc, isp)],
        "ip_start: bigint, ip_end: bigint, loc: string, isp: string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_refresher_reloads_on_mtime_change(spark, tmp_path):
    geo_path = str(tmp_path / "geo.parquet")
    _write_geo(spark, geo_path, "北京", "电信")
    refresher = GeoDbRefresher(
        load=lambda: spark.read.parquet(geo_path),
        watch_path=geo_path,
        interval_s=1e9,  # mtime is the only trigger
    )
    first = refresher.current()
    assert first.collect()[0].loc == "北京"
    assert refresher.reloads == 1
    # unchanged file: same DataFrame object, no reload
    assert refresher.current() is first
    assert refresher.reloads == 1

    time.sleep(0.05)  # ensure a distinct mtime
    _write_geo(spark, geo_path, "上海", "联通")
    assert refresher.current().collect()[0].loc == "上海"
    assert refresher.reloads == 2


def test_refresher_interval_forces_reload_without_mtime_change(spark, tmp_path):
    geo_path = str(tmp_path / "geo.parquet")
    _write_geo(spark, geo_path, "北京", "电信")
    refresher = GeoDbRefresher(
        load=lambda: spark.read.parquet(geo_path),
        watch_path=geo_path,
        interval_s=3600.0,
    )
    refresher.current(now=1000.0)
    assert refresher.reloads == 1
    refresher.current(now=2000.0)  # within interval, no mtime change
    assert refresher.reloads == 1
    refresher.current(now=1000.0 + 3601.0)
    assert refresher.reloads == 2


def test_stream_sees_swapped_geo_table_next_microbatch(spark, tmp_path):
    """The verdict's scenario: swap the range table between micro-batches
    and observe the new enrichment values — no query restart."""
    geo_path = str(tmp_path / "geo.parquet")
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _write_geo(spark, geo_path, "北京", "电信")

    # two single-row JSON files → two micro-batches (maxFilesPerTrigger=1)
    ip_int = 167772160 + 5  # inside the one configured block
    for i in range(2):
        with open(src_dir / f"f{i}.json", "w") as f:
            f.write(json.dumps({"row_id": i, "ip_int": ip_int}) + "\n")

    refresher = GeoDbRefresher(
        load=lambda: spark.read.parquet(geo_path),
        watch_path=geo_path,
        interval_s=1e9,
    )
    seen: list[tuple[int, int, str, str]] = []

    def sink(df, epoch_id: int) -> None:
        for r in df.collect():
            seen.append((epoch_id, r.row_id, r.loc, r.isp))
        # the "daily cron" fires after the first epoch: replace the DB
        if not os.path.exists(str(tmp_path / "swapped")):
            time.sleep(0.05)
            _write_geo(spark, geo_path, "广东", "移动")
            open(tmp_path / "swapped", "w").close()

    stream = (
        spark.readStream.schema("row_id int, ip_int bigint")
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    query = (
        stream.writeStream.foreachBatch(
            geo_enriched_batch_writer(refresher, "ip_int", sink)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    assert len(seen) == 2
    by_epoch = {row_id: (loc, isp) for _, row_id, loc, isp in seen}
    locs = sorted(v[0] for v in by_epoch.values())
    # one row enriched against the old DB, one against the new
    assert locs == ["北京", "广东"]
    assert refresher.reloads == 2
