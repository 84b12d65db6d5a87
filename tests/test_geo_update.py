"""Geo-DB auto-update twin (reference util/auto_update.go:19-43 +
util/qqwry_update.go): download → descramble → integrity check → atomic
replace, feeding the mtime-watching GeoDbRefresher so new enrichment
values appear mid-stream with no restart."""

from __future__ import annotations

import json
import os
import struct
import time
import zlib
from pathlib import Path

from clickhouse_sinker_nali_spark.sources.qqwry import build_qqwry_blob
from clickhouse_sinker_nali_spark.sources.update import (
    GeoDbFetcher,
    GeoUpdateCron,
    copywrite_key,
    qqwry_descramble,
    qqwry_fetcher,
    validate_json,
    validate_qqwry,
)


def _scramble(plain: bytes, key: int) -> bytes:
    """Inverse of the mirror decode: zlib-compress then XOR the head with
    the same evolving keystream (XOR is self-inverse)."""
    data = bytearray(zlib.compress(plain))
    for i in range(min(0x200, len(data))):
        key = (key * 0x805 + 1) & 0xFF
        data[i] ^= key
    return bytes(data)


def _copywrite_blob(key: int) -> bytes:
    return b"\x00" * 20 + struct.pack("<I", key) + b"\x00" * 8


BLOB_V1 = build_qqwry_blob([(167772160, 167772160 + 255, "北京", "电信")], ["direct"])
BLOB_V2 = build_qqwry_blob([(167772160, 167772160 + 255, "广东", "移动")], ["direct"])


def test_descramble_roundtrip():
    key = 0xA7
    assert qqwry_descramble(_scramble(BLOB_V1, key), key) == BLOB_V1
    assert validate_qqwry(BLOB_V1)


def test_copywrite_key_offset():
    assert copywrite_key(_copywrite_blob(0xDEADBEEF)) == 0xDEADBEEF


def test_validators_reject_garbage():
    assert not validate_qqwry(b"")
    assert not validate_qqwry(b"\xff" * 64)
    assert validate_json(b'{"a": 1}')
    assert not validate_json(b"[1, 2]")
    assert not validate_json(b"\xff\xfe not json")


def test_fetch_scrambled_mirror_end_to_end(tmp_path: Path):
    """The full qqwry mirror protocol over file:// URLs: scrambled payload
    + copywrite key blob → descramble → validate → atomic install."""
    key = 0x42
    (tmp_path / "qqwry.rar").write_bytes(_scramble(BLOB_V2, key))
    (tmp_path / "copywrite.rar").write_bytes(_copywrite_blob(key))
    dest = tmp_path / "db" / "qqwry.dat"
    fetcher = qqwry_fetcher(
        url=(tmp_path / "qqwry.rar").as_uri(),
        dest_path=str(dest),
        key_url=(tmp_path / "copywrite.rar").as_uri(),
    )
    assert fetcher.fetch()
    assert dest.read_bytes() == BLOB_V2
    assert fetcher.fetched == 1 and fetcher.last_error == ""


def test_failed_download_keeps_previous_db(tmp_path: Path):
    dest = tmp_path / "qqwry.dat"
    dest.write_bytes(BLOB_V1)
    fetcher = qqwry_fetcher(
        url=(tmp_path / "does-not-exist.rar").as_uri(), dest_path=str(dest)
    )
    assert not fetcher.fetch()
    assert dest.read_bytes() == BLOB_V1  # old DB untouched
    assert fetcher.last_error


def test_corrupt_payload_keeps_previous_db(tmp_path: Path):
    dest = tmp_path / "qqwry.dat"
    dest.write_bytes(BLOB_V1)
    (tmp_path / "bad.rar").write_bytes(b"\xff" * 1024)  # fails validate_qqwry
    fetcher = qqwry_fetcher(url=(tmp_path / "bad.rar").as_uri(), dest_path=str(dest))
    assert not fetcher.fetch()
    assert dest.read_bytes() == BLOB_V1
    assert "integrity" in fetcher.last_error


def test_cron_runs_all_fetchers(tmp_path: Path):
    (tmp_path / "a.dat").write_bytes(BLOB_V1)
    (tmp_path / "b.json").write_bytes(json.dumps({"cdn": "x"}).encode())
    updated: list[str] = []
    cron = GeoUpdateCron(
        fetchers=[
            GeoDbFetcher(
                url=(tmp_path / "a.dat").as_uri(),
                dest_path=str(tmp_path / "out_a.dat"),
                validate=validate_qqwry,
            ),
            GeoDbFetcher(
                url=(tmp_path / "b.json").as_uri(),
                dest_path=str(tmp_path / "out_b.json"),
                validate=validate_json,
            ),
            GeoDbFetcher(  # down mirror must not block the others
                url=(tmp_path / "missing").as_uri(),
                dest_path=str(tmp_path / "out_c"),
            ),
        ],
        on_update=lambda f: updated.append(os.path.basename(f.dest_path)),
    )
    assert cron.run_once() == 2
    assert sorted(updated) == ["out_a.dat", "out_b.json"]


def test_cron_thread_fires_on_interval(tmp_path: Path):
    (tmp_path / "a.dat").write_bytes(BLOB_V1)
    fetcher = GeoDbFetcher(
        url=(tmp_path / "a.dat").as_uri(),
        dest_path=str(tmp_path / "out.dat"),
        validate=validate_qqwry,
    )
    cron = GeoUpdateCron(fetchers=[fetcher], interval_s=0.05)
    cron.start()
    try:
        deadline = time.time() + 5
        while fetcher.fetched < 2 and time.time() < deadline:
            time.sleep(0.02)
    finally:
        cron.stop()
    assert fetcher.fetched >= 2


def test_download_swap_enriches_next_microbatch(spark, tmp_path: Path):
    """The verdict's done-gate: download → swap → NEW enrichment values
    mid-stream.  Epoch 1 enriches against the v1 database; the 'cron'
    fires between epochs, fetches v2 over file://, atomically replaces
    qqwry.dat; epoch 2 must see the v2 loc/isp — no query restart."""
    from clickhouse_sinker_nali_spark.sources.qqwry import qqwry_to_dataframe
    from clickhouse_sinker_nali_spark.streaming.refresh import (
        GeoDbRefresher,
        geo_enriched_batch_writer,
    )

    dat = tmp_path / "qqwry.dat"
    dat.write_bytes(BLOB_V1)
    (tmp_path / "mirror.rar").write_bytes(BLOB_V2)  # plain mirror
    fetcher = qqwry_fetcher(
        url=(tmp_path / "mirror.rar").as_uri(), dest_path=str(dat)
    )
    cron = GeoUpdateCron(fetchers=[fetcher], interval_s=1e9)

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for i in range(2):
        (src_dir / f"f{i}.json").write_text(
            json.dumps({"row_id": i, "ip_int": 167772160 + 5}) + "\n"
        )

    refresher = GeoDbRefresher(
        load=lambda: qqwry_to_dataframe(spark, str(dat)),
        watch_path=str(dat),
        interval_s=1e9,
    )
    seen: list[tuple[int, str, str]] = []

    def sink(df, epoch_id: int) -> None:
        for r in df.collect():
            seen.append((r.row_id, r.loc, r.isp))
        if fetcher.fetched == 0:
            time.sleep(0.05)  # distinct mtime
            assert cron.run_once() == 1

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
    locs = sorted(loc for _, loc, _ in seen)
    assert locs == ["北京", "广东"]
    assert refresher.reloads == 2
