"""XXH64 faithful-mode tests (SURVEY §2.2 F5 parity decision).

Golden vectors are the public xxHash test values (seed 0); the Go
``cespare/xxhash`` the reference uses (model/message.go:174-209,
task/sharding.go:91-98) produces these exact values.
"""

from pyspark.sql import functions as F

from clickhouse_sinker_nali_spark.functions.xxh64 import (
    series_id_faithful,
    shard_hash_faithful,
    xxh64,
    xxh64_col,
    xxh64_signed,
)

GOLDEN = {
    b"": 0xEF46DB3751D8E999,
    b"a": 0xD24EC4F1A98C6E5B,
    b"abc": 0x44BC2CF5AD770999,
    b"Nobody inspects the spammish repetition": 0xFBCEA83C8A378BF1,
}


def test_xxh64_golden_vectors():
    for data, want in GOLDEN.items():
        assert xxh64(data) == want, data


def test_xxh64_covers_every_block_size():
    # 0..70 bytes crosses the <32 path, the 32-byte lane loop, and every
    # 8/4/1-byte tail combination; values must be stable and distinct
    seen = {xxh64(b"x" * n) for n in range(71)}
    assert len(seen) == 71


def test_xxh64_utf8_string_equals_bytes():
    s = "###instance###node01###job###prometheus"
    assert xxh64(s) == xxh64(s.encode("utf-8"))
    assert xxh64("北京") == xxh64("北京".encode("utf-8"))


def test_xxh64_spark_udf_matches_python(spark):
    vals = ["", "a", "abc", "Nobody inspects the spammish repetition", "北京市"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.s: r.h for r in df.select("s", xxh64_col("s").alias("h")).collect()}
    for v in vals:
        assert got[v] == xxh64_signed(v), v


def test_shard_hash_faithful_unsigned_modulo(spark):
    """Spark column result == Go's ``xxhash.Sum64String(v) % shards``."""
    vals = [f"key-{i}" for i in range(64)] + ["", "北京"]
    for shards in (3, 4, 7, 16):
        df = spark.createDataFrame([(v,) for v in vals], "s string")
        got = {
            r.s: r.shard
            for r in df.select(
                "s", shard_hash_faithful("s", shards).alias("shard")
            ).collect()
        }
        for v in vals:
            assert got[v] == xxh64(v) % shards, (v, shards)


def test_prometheus_split_faithful_mode(spark, sf_dir):
    """faithful=True swaps series ids to xxhash64 without changing the
    grouping structure (same series count, parity ids)."""
    from clickhouse_sinker_nali_spark.operators.ingest import prometheus_series_split

    default = prometheus_series_split(spark, sf_dir).collect()
    faithful = prometheus_series_split(spark, sf_dir, faithful=True).collect()
    assert len(default) == len(faithful)
    by_labels = {(r.event_type, r.user_id): r.series_id for r in faithful}
    for (etype, uid), sid in list(by_labels.items())[:20]:
        want = xxh64_signed(f"###event_type###{etype}###user_id###{uid}")
        assert sid == want


def test_shard_expr_faithful_policy(spark):
    from clickhouse_sinker_nali_spark.streaming.sinks import shard_expr

    df = spark.createDataFrame([(f"k{i}",) for i in range(32)], "key string")
    got = {r.key: r.s for r in df.select("key", shard_expr("hash", "key", 4, faithful=True).alias("s")).collect()}
    for k, s in got.items():
        assert s == xxh64(k) % 4


def test_series_id_faithful_digest_bytes(spark):
    """The series id hashes the exact ###name###value concatenation the
    reference streams into its digest (model/message.go:195-205)."""
    df = spark.createDataFrame(
        [("node01", "prometheus")], "instance string, job string"
    )
    pairs = F.concat(
        F.lit("###instance###"), F.col("instance"),
        F.lit("###job###"), F.col("job"),
    )
    (row,) = df.select(series_id_faithful(pairs).alias("sid")).collect()
    assert row.sid == xxh64_signed("###instance###node01###job###prometheus")
