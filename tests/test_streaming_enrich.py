"""The reference's §3.2 in-stream enrichment path as one streaming flow:
GeoIP interval join + serviceMap lookup + class normalization inside
foreachBatch (reference input/kafka_sarama.go:11570-11674 runs this per
message in the consumer; here it is per micro-batch, broadcast-joined)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from clickhouse_sinker_nali_spark.enrich import (
    build_geo_ranges,
    enrich_ips,
    ipv4_to_long,
    join_service_map,
    load_service_map,
    normalize_class,
)


def test_stream_enriches_geo_service_and_class(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    flows = [
        # Unknown/Unknown + src port 443 → serviceMap[tcp:443] = https
        {"row_id": 0, "ip_src": "10.0.0.5", "proto": "tcp",
         "port_src": 443, "port_dst": 55012, "class": "Unknown/Unknown"},
        # Unknown/Unknown, src port unmapped, dst 22 → ssh (src-then-dst order)
        {"row_id": 1, "ip_src": "10.0.64.9", "proto": "tcp",
         "port_src": 55013, "port_dst": 22, "class": "Unknown/Unknown"},
        # A/B with A != B keeps B (the reference's ClassList[1] quirk)
        {"row_id": 2, "ip_src": "203.0.113.7", "proto": "udp",
         "port_src": 9999, "port_dst": 9999, "class": "dns/quic"},
    ]
    with open(src / "flows.json", "w") as f:
        for row in flows:
            f.write(json.dumps(row) + "\n")

    svc = load_service_map()
    assert svc["tcp:443"] == "https" and svc["tcp:22"] == "ssh"

    geo = build_geo_ranges(spark)
    seen: dict[int, tuple] = {}

    def write(df, epoch_id):
        enriched = enrich_ips(
            df.withColumn("ip_int", ipv4_to_long("ip_src")), geo, "ip_int"
        )
        with_svc = join_service_map(enriched, spark)
        out = with_svc.withColumn(
            "class",
            normalize_class(
                F.col("class"), F.col("src_service"), F.col("dst_service")
            ),
        )
        for r in out.collect():
            seen[r.row_id] = (r.loc, r.isp, r["class"])

    stream = (
        spark.readStream.schema(
            "row_id int, ip_src string, proto string, "
            "port_src int, port_dst int, class string"
        ).json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(write)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert len(seen) == 3
    # 10.0.0.5 falls in the first synthetic geo block
    loc0, isp0, class0 = seen[0]
    assert loc0 != "未知" and isp0 != "未知"
    assert class0 == "https"        # src-port hit wins
    assert seen[1][2] == "ssh"      # falls through to dst port
    assert seen[2][2] == "quic"     # A/B quirk keeps ClassList[1]
    # outside the synthetic ranges → F1 default
    assert seen[2][0] == "未知"
