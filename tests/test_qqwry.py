"""qqwry binary reader / converter tests (SURVEY §2 F3 + J1 production path).

Builds a structurally-valid in-memory qqwry.dat covering every record
layout the reference decodes (direct, mode1, mode2, nested mode1→mode2 —
``ipHandle/pkg/qqwry/qqwry.go:63-149``), converts it, and drives the
broadcast-interval enrichment end-to-end on the converted output.
"""

import pytest
from pyspark.sql import functions as F

from clickhouse_sinker_nali_spark.enrich import enrich_ips, load_qqwry_ranges
from clickhouse_sinker_nali_spark.sources.qqwry import (
    build_qqwry_blob,
    iter_qqwry,
    qqwry_to_parquet,
)

# (ip_start, ip_end_inclusive, country(loc), area(isp)) — GBK-encodable,
# four entries so each fixture style (direct/mode1/mode2/mode1_2) is used.
ENTRIES = [
    (int(0x01000000), int(0x01FFFFFF), "北京市", "电信"),
    (int(0x02000000), int(0x02FFFFFF), "广东省深圳市", "联通"),
    (int(0x03000000), int(0x03FFFFFF), "同一内部网", ""),
    (int(0x04000000), int(0x04FFFFFF), "上海市", "移动"),
]


def test_iter_qqwry_decodes_all_layouts():
    blob = build_qqwry_blob(ENTRIES)
    got = sorted(iter_qqwry(blob))
    assert got == sorted(ENTRIES)


def test_gbk_filler_stripped():
    # style[0] = direct plants "北京市 CZ88.NET" in the binary; the decoded
    # value must come back clean (reference qqwry.go:105-112)
    blob = build_qqwry_blob(ENTRIES)
    locs = {loc for _, _, loc, _ in iter_qqwry(blob)}
    assert "北京市" in locs
    assert not any("CZ88" in x for x in locs)


def test_qqwry_convert_and_enrich_end_to_end(spark, tmp_path):
    dat = tmp_path / "qqwry.dat"
    dat.write_bytes(build_qqwry_blob(ENTRIES))
    out = str(tmp_path / "geo_ranges")
    qqwry_to_parquet(spark, str(dat), out)

    geo = load_qqwry_ranges(spark, out)
    rows = geo.orderBy("ip_start").collect()
    assert [r.ip_start for r in rows] == [e[0] for e in ENTRIES]
    # exclusive end = inclusive qqwry end + 1
    assert rows[0].ip_end == ENTRIES[0][1] + 1

    probes = spark.createDataFrame(
        [
            (0x01000005, "北京市", "电信"),
            (0x02ABCDEF, "广东省深圳市", "联通"),
            (0x03000001, "局域网", ""),  # 同一内部网 → 局域网 (F1 rule)
            (0x7F000001, "未知", "未知"),  # outside every range
        ],
        "ip bigint, want_loc string, want_isp string",
    )
    got = enrich_ips(probes, geo, "ip").collect()
    for r in got:
        assert r.loc == r.want_loc, (hex(r.ip), r.loc)
        assert r.isp == r.want_isp, (hex(r.ip), r.isp)


def test_iter_rejects_truncated_header():
    with pytest.raises(Exception):
        list(iter_qqwry(b"\x00\x01"))


def test_enrich_plan_is_broadcast(spark, tmp_path):
    """The converted table must enter the probe as a broadcast (no fact
    shuffle) — the only viable shape at 100 TB."""
    dat = tmp_path / "q.dat"
    dat.write_bytes(build_qqwry_blob(ENTRIES))
    out = str(tmp_path / "ranges")
    qqwry_to_parquet(spark, str(dat), out)
    geo = load_qqwry_ranges(spark, out)
    probes = spark.range(10).select((F.col("id") + 0x01000000).alias("ip"))
    plan = enrich_ips(probes, geo, "ip")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
