"""zxipv6wry (IPv6) and cdn.json geo-source readers.

Reference surface: ``ipHandle/pkg/zxipv6wry/zxipv6wry.go:59-135`` (11-byte
hi-64 index, redirect modes, CZ88 filler) and ``ipHandle/pkg/cdn/cdn.go:
62-87`` (base-cname dict lookup + kunlun rule).
"""

from __future__ import annotations

import json
from decimal import Decimal

from clickhouse_sinker_nali_spark.enrich import enrich_ipv6, ipv6_hi64
from clickhouse_sinker_nali_spark.sources.cdn import (
    KUNLUN_PROVIDER,
    cdn_map_df,
    enrich_cdn,
)
from clickhouse_sinker_nali_spark.sources.zxipv6wry import (
    build_zxipv6wry_blob,
    iter_zxipv6wry,
    zxipv6wry_to_dataframe,
)

# 2001:db8::/32 → hi64 = 0x20010db8_00000000; 2400:... etc.
HI_1 = 0x20010DB800000000
HI_2 = 0x24008C0000000000
HI_3 = 0xFE80000000000000

ENTRIES = [
    (HI_1, "中国 北京", "电信"),
    (HI_2, "中国 上海", "联通"),
    (HI_3, "局域网", ""),
]


def test_iter_zxipv6wry_decodes_all_layouts():
    blob = build_zxipv6wry_blob(ENTRIES)
    got = list(iter_zxipv6wry(blob))
    assert [(s, loc, isp) for s, _, loc, isp in got] == [
        (HI_1, "中国 北京", "电信"),   # direct (+ CZ88 filler stripped)
        (HI_2, "中国 上海", "联通"),   # mode2 country + redirected area
        (HI_3, "局域网", ""),          # mode1 whole-record redirect
    ]
    # ranges chain: each ends where the next begins; last extends to 2^64-1
    assert got[0][1] == HI_2 and got[1][1] == HI_3
    assert got[2][1] == (1 << 64) - 1


def test_ipv6_convert_and_enrich_end_to_end(spark, tmp_path):
    dat = tmp_path / "zxipv6wry.db"
    dat.write_bytes(build_zxipv6wry_blob(ENTRIES))
    geo6 = zxipv6wry_to_dataframe(spark, str(dat))
    assert dict(geo6.dtypes)["ip_hi_start"] == "decimal(20,0)"

    flows = spark.createDataFrame(
        [
            ("2001:db8::1",),                 # inside range 1
            ("2400:8c00::abcd",),             # inside range 2
            ("fe80::1",),                     # inside range 3 (link-local)
            ("not-an-ip",),                   # NULL key → unmatched → 未知
        ],
        "ip6: string",
    )
    keyed = flows.withColumn("ip_hi", ipv6_hi64("ip6"))
    out = {r.ip6: (r.loc, r.isp) for r in enrich_ipv6(keyed, geo6, "ip_hi").collect()}
    assert out["2001:db8::1"] == ("中国 北京", "电信")
    assert out["2400:8c00::abcd"] == ("中国 上海", "联通")
    assert out["fe80::1"] == ("局域网", "")
    assert out["not-an-ip"] == ("未知", "未知")


def test_ipv6_hi64_values(spark):
    df = spark.createDataFrame([("2001:db8::1",), ("::1",)], "ip6: string")
    got = {r.ip6: r.hi for r in df.select("ip6", ipv6_hi64("ip6").alias("hi")).collect()}
    assert got["2001:db8::1"] == Decimal(HI_1)
    assert got["::1"] == Decimal(0)


def test_cdn_lookup_and_kunlun_rule(spark, tmp_path):
    cdn_json = tmp_path / "cdn.json"
    cdn_json.write_text(
        json.dumps(
            {
                "cloudfront.net": {"name": "CloudFront", "link": "aws.amazon.com"},
                "akamaiedge.net": {"name": "Akamai", "link": ""},
            }
        ),
        encoding="utf-8",
    )
    cdn = cdn_map_df(spark, str(cdn_json))
    domains = spark.createDataFrame(
        [
            ("d1234.cloudfront.net",),   # exact map hit via base cname
            ("e73.x.akamaiedge.net",),
            ("img.kunlunca.com",),       # kunlun substring rule
            ("example.org",),            # miss → NULL
            ("localhost",),              # single label passes through → NULL
        ],
        "cname: string",
    )
    got = {r.cname: r.cdn_name for r in enrich_cdn(domains, cdn, "cname").collect()}
    assert got["d1234.cloudfront.net"] == "CloudFront"
    assert got["e73.x.akamaiedge.net"] == "Akamai"
    assert got["img.kunlunca.com"] == KUNLUN_PROVIDER
    assert got["example.org"] is None
    assert got["localhost"] is None


def test_enrich_ipv6_plan_is_broadcast(spark, tmp_path):
    from clickhouse_sinker_nali_spark.plans import formatted_plan

    dat = tmp_path / "zx.db"
    dat.write_bytes(build_zxipv6wry_blob(ENTRIES))
    geo6 = zxipv6wry_to_dataframe(spark, str(dat))
    flows = spark.range(10).selectExpr("CAST(id AS decimal(20,0)) AS ip_hi")
    plan = formatted_plan(enrich_ipv6(flows, geo6, "ip_hi"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# -- ipip .ipdb --------------------------------------------------------------

IPDB_FIELDS = ["country_name", "region_name", "city_name", "isp_domain"]
IPDB_ENTRIES = [
    ("1.0.0.0/24",    ["澳大利亚", "", "", ""]),
    ("8.8.8.0/24",    ["美国", "加利福尼亚", "山景城", "google.com"]),
    ("114.114.0.0/16", ["中国", "江苏", "南京", "chinanet"]),
]


def test_iter_ipdb_v4_emits_inserted_cidrs():
    from clickhouse_sinker_nali_spark.sources.ipdb import (
        build_ipdb_blob,
        iter_ipdb_v4,
    )

    blob = build_ipdb_blob(IPDB_ENTRIES, IPDB_FIELDS)
    got = sorted(iter_ipdb_v4(blob))
    assert len(got) == 3
    def ip(s):
        import ipaddress
        return int(ipaddress.IPv4Address(s))
    assert got[0] == (ip("1.0.0.0"), ip("1.0.1.0"), ["澳大利亚", "", "", ""])
    assert got[1] == (ip("8.8.8.0"), ip("8.8.9.0"),
                      ["美国", "加利福尼亚", "山景城", "google.com"])
    assert got[2] == (ip("114.114.0.0"), ip("114.115.0.0"),
                      ["中国", "江苏", "南京", "chinanet"])


def test_ipdb_convert_and_enrich_end_to_end(spark, tmp_path):
    from clickhouse_sinker_nali_spark.enrich import enrich_ips, ipv4_to_long
    from clickhouse_sinker_nali_spark.sources.ipdb import (
        build_ipdb_blob,
        ipdb_to_dataframe,
    )

    dat = tmp_path / "ipipfree.ipdb"
    dat.write_bytes(build_ipdb_blob(IPDB_ENTRIES, IPDB_FIELDS))
    geo = ipdb_to_dataframe(spark, str(dat))
    # loc is the reference Result.String shape: non-empty parts joined
    locs = {r.loc for r in geo.collect()}
    assert "美国 加利福尼亚 山景城" in locs and "澳大利亚" in locs

    flows = spark.createDataFrame(
        [("8.8.8.8",), ("114.114.114.114",), ("9.9.9.9",)], "ip: string"
    )
    keyed = flows.withColumn("ip_int", ipv4_to_long("ip"))
    out = {r.ip: (r.loc, r.isp) for r in enrich_ips(keyed, geo, "ip_int").collect()}
    assert out["8.8.8.8"] == ("美国 加利福尼亚 山景城", "google.com")
    assert out["114.114.114.114"] == ("中国 江苏 南京", "chinanet")
    assert out["9.9.9.9"] == ("未知", "未知")


# -- GeoLite2 mmdb -----------------------------------------------------------

MMDB_ENTRIES = [
    ("1.0.0.0/24", {"country": {"names": {"zh-CN": "澳大利亚", "en": "Australia"}}}),
    ("8.8.8.0/24", {"country": {"names": {"en": "United States"}},
                     "city": {"names": {"en": "Mountain View"}}}),
    ("114.114.0.0/16", {"country": {"names": {"zh-CN": "中国", "en": "China"}},
                         "city": {"names": {"zh-CN": "南京", "en": "Nanjing"}}}),
]


def test_iter_mmdb_v4_roundtrips_fixture():
    import ipaddress

    from clickhouse_sinker_nali_spark.sources.geolite2 import (
        build_mmdb_blob,
        iter_mmdb_v4,
    )

    for ipv in (6, 4):  # GeoLite2 ships IPv6-form trees; cover both
        blob = build_mmdb_blob(MMDB_ENTRIES, ip_version=ipv)
        got = sorted(iter_mmdb_v4(blob))
        assert len(got) == 3
        ip = lambda s: int(ipaddress.IPv4Address(s))
        assert got[1][0] == ip("8.8.8.0") and got[1][1] == ip("8.8.9.0")
        assert got[2][2]["country"]["names"]["zh-CN"] == "中国"


def test_geolite2_convert_and_enrich_end_to_end(spark, tmp_path):
    from clickhouse_sinker_nali_spark.enrich import enrich_ips, ipv4_to_long
    from clickhouse_sinker_nali_spark.sources.geolite2 import (
        build_mmdb_blob,
        geolite2_to_dataframe,
    )

    dat = tmp_path / "GeoLite2-City.mmdb"
    dat.write_bytes(build_mmdb_blob(MMDB_ENTRIES))
    geo = geolite2_to_dataframe(spark, str(dat))
    flows = spark.createDataFrame(
        [("114.114.114.114",), ("8.8.8.8",), ("9.9.9.9",)], "ip: string"
    )
    keyed = flows.withColumn("ip_int", ipv4_to_long("ip"))
    out = {r.ip: r.loc for r in enrich_ips(keyed, geo, "ip_int").collect()}
    # zh-CN preferred, en fallback (reference geoip.go:49-54); country-only
    # records omit the city (Result.String)
    assert out["114.114.114.114"] == "中国 南京"
    assert out["8.8.8.8"] == "United States Mountain View"
    assert out["9.9.9.9"] == "未知"


# -- db registry -------------------------------------------------------------


def test_geodb_selection_rules(monkeypatch):
    from clickhouse_sinker_nali_spark.sources import geodb

    monkeypatch.delenv("NALI_DB_IP4", raising=False)
    monkeypatch.delenv("NALI_DB_IP6", raising=False)
    # language defaults (reference db.go:55-73)
    assert geodb.select_ipv4_db(lang="zh-CN") == "qqwry"
    assert geodb.select_ipv4_db(lang="en") == "geoip2"
    assert geodb.select_ipv6_db(lang="zh-CN") == "zxipv6wry"
    assert geodb.select_ipv6_db(lang="en") == "geoip2"
    # explicit names + aliases (GetIPDBbyName), unknown → qqwry
    for alias in ("geo", "geoip", "geoip2"):
        assert geodb.select_ipv4_db(alias) == "geoip2"
    for alias in ("chunzhen", "qqip", "qqwry"):
        assert geodb.select_ipv4_db(alias) == "qqwry"
    for alias in ("ipip", "ipipfree", "ipip.net"):
        assert geodb.select_ipv4_db(alias) == "ipip"
    assert geodb.select_ipv4_db("nonsense") == "qqwry"
    # env override
    monkeypatch.setenv("NALI_DB_IP4", "ipipfree")
    assert geodb.select_ipv4_db() == "ipip"


def test_geodb_builds_from_home_dir(spark, tmp_path, monkeypatch):
    from clickhouse_sinker_nali_spark.sources import geodb
    from clickhouse_sinker_nali_spark.sources.geolite2 import build_mmdb_blob
    from clickhouse_sinker_nali_spark.sources.ipdb import build_ipdb_blob
    from clickhouse_sinker_nali_spark.sources.zxipv6wry import build_zxipv6wry_blob

    monkeypatch.delenv("NALI_DB_IP4", raising=False)
    monkeypatch.delenv("NALI_DB_IP6", raising=False)
    home = str(tmp_path)
    (tmp_path / geodb.GEOLITE2_FILE).write_bytes(build_mmdb_blob(MMDB_ENTRIES))
    (tmp_path / geodb.IPIPFREE_FILE).write_bytes(
        build_ipdb_blob(IPDB_ENTRIES, IPDB_FIELDS)
    )
    (tmp_path / geodb.ZXIPV6WRY_FILE).write_bytes(build_zxipv6wry_blob(ENTRIES))

    v4 = geodb.build_ipv4_ranges(spark, home, lang="en")       # → GeoLite2
    assert "中国 南京" in {r.loc for r in v4.collect()}
    v4b = geodb.build_ipv4_ranges(spark, home, db_name="ipip")  # → ipdb
    assert "中国 江苏 南京" in {r.loc for r in v4b.collect()}
    v6 = geodb.build_ipv6_ranges(spark, home, lang="zh-CN")     # → zxipv6wry
    assert dict(v6.dtypes)["ip_hi_start"] == "decimal(20,0)"


def test_mmdb_v6_hi64_enumeration_and_enrich(spark, tmp_path):
    from clickhouse_sinker_nali_spark.sources.geolite2 import (
        build_mmdb_blob,
        geolite2_v6_to_dataframe,
        iter_mmdb_v6_hi64,
    )

    entries = [
        ("2001:db8::/32", {"country": {"names": {"en": "TestNet"}}}),
        ("2400:8c00::/22", {"country": {"names": {"zh-CN": "中国"}},
                             "city": {"names": {"zh-CN": "上海"}}}),
        # deeper than /64: whole hi-64 unit takes the leftmost leaf
        ("2a00:1450:4001:800::/68", {"country": {"names": {"en": "DeepNet"}}}),
    ]
    blob = build_mmdb_blob(entries, ip_version=6)
    got = {loc: (s, e) for s, e, r in iter_mmdb_v6_hi64(blob)
           for loc in [(r.get("country") or {}).get("names", {}).get("en")
                       or (r.get("country") or {}).get("names", {}).get("zh-CN")]}
    assert got["TestNet"] == (0x20010DB8 << 32, 0x20010DB9 << 32)
    hi_deep = 0x2A0014504001_0800
    assert got["DeepNet"] == (hi_deep, hi_deep + 1)

    dat = tmp_path / "GeoLite2-City.mmdb"
    dat.write_bytes(blob)
    geo6 = geolite2_v6_to_dataframe(spark, str(dat))
    from clickhouse_sinker_nali_spark.enrich import enrich_ipv6, ipv6_hi64

    flows = spark.createDataFrame(
        [("2001:db8::1234",), ("2400:8c11::1",), ("2a00:1450:4001:800::5",)],
        "ip6: string",
    )
    keyed = flows.withColumn("ip_hi", ipv6_hi64("ip6"))
    out = {r.ip6: r.loc for r in enrich_ipv6(keyed, geo6, "ip_hi").collect()}
    assert out["2001:db8::1234"] == "TestNet"
    assert out["2400:8c11::1"] == "中国 上海"
    assert out["2a00:1450:4001:800::5"] == "DeepNet"


def test_mmdb_28bit_record_form_roundtrips():
    from clickhouse_sinker_nali_spark.sources.geolite2 import (
        build_mmdb_blob,
        iter_mmdb_v4,
    )

    blob24 = build_mmdb_blob(MMDB_ENTRIES, ip_version=6, record_size=24)
    blob28 = build_mmdb_blob(MMDB_ENTRIES, ip_version=6, record_size=28)
    assert sorted(iter_mmdb_v4(blob24)) == sorted(iter_mmdb_v4(blob28))


def test_qqwry_python_datasource_matches_converter(spark, tmp_path):
    """spark.read.format('qqwry') must return exactly the offline
    converter's rows, across >1 planned partition."""
    from clickhouse_sinker_nali_spark.sources import datasources
    from clickhouse_sinker_nali_spark.sources.qqwry import (
        build_qqwry_blob,
        qqwry_to_dataframe,
    )

    ranges = [
        (0, 255, "澳大利亚", "维州"),
        (256, 1023, "局域网", "对方和您在同一内部网"),
        (1024, 4095, "美国", "加州"),
        (4096, 8191, "中国", "电信"),
        (8192, 65535, "日本", "东京 CZ88.NET"),
    ]
    blob = build_qqwry_blob(ranges)
    dat = tmp_path / "qqwry.dat"
    dat.write_bytes(blob)

    datasources.register(spark)
    via_ds = spark.read.format("qqwry").load(str(dat))
    got = sorted(tuple(r) for r in via_ds.collect())
    expect = sorted(tuple(r) for r in qqwry_to_dataframe(spark, str(dat)).collect())
    assert got == expect
    assert len(got) == len(ranges)
    assert via_ds.rdd.getNumPartitions() > 1


def test_shardsink_writer_emits_manifest_and_all_rows(spark, tmp_path):
    """df.write.format('shardsink') must produce JSONL shards whose union
    is the input and an atomically-committed manifest whose totals match."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from clickhouse_sinker_nali_spark.sources import datasources

    datasources.register_all(spark)
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
    ).repartition(4)
    out = str(tmp_path / "export")
    df.write.format("shardsink").mode("append").save(out)

    manifest = _json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["total_rows"] == 100
    assert sum(s["n_rows"] for s in manifest["shards"]) == 100
    got = set()
    for s in manifest["shards"]:
        with open(os.path.join(out, s["file"])) as f:
            lines = f.readlines()
        assert len(lines) == s["n_rows"]
        for ln in lines:
            got.add(_json.loads(ln)["doc_id"])
    assert got == set(range(100))


def test_replay_stream_source_delivers_files_as_batches(spark, tmp_path):
    """spark.readStream.format('replay') must deliver every jsonl file's
    rows exactly once across micro-batches."""
    import json as _json
    import os

    from clickhouse_sinker_nali_spark.sources import datasources

    datasources.register_all(spark)
    src = str(tmp_path / "replay_src")
    os.makedirs(src)
    for i in range(3):
        with open(os.path.join(src, f"{i:03d}.jsonl"), "w") as f:
            for j in range(5):
                f.write(_json.dumps({"doc_id": i * 10 + j, "text": f"d{i}-{j}"}) + "\n")

    out = str(tmp_path / "replay_out")
    q = (
        spark.readStream.format("replay")
        .option("path", src)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_replay"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {i * 10 + j for i in range(3) for j in range(5)}
    assert spark.read.parquet(out).count() == 15
