"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
     "ingest_rows_per_sec": N, "ingest_parse_rows_per_sec": N}

``value`` is the total wall time of all headline queries (each executed to
completion with a count/collect action).  Queries are the representative
mix: scan-agg, star join, window, as-of, dedup (exact + MinHash LSH),
similarity (brute force + LSH), text analysis.

The two ingest figures map onto the reference's published baseline
(BASELINE.md: 142K rows/s, 1 Kafka partition → 1 sinker on 11 cpus):

- ``ingest_parse_rows_per_sec``: parse+coerce engine throughput (JSON
  message → typed row, noop sink) — the sinker's CPU-bound stage
- ``ingest_rows_per_sec``: full streaming pipeline throughput including a
  parquet sink (stands in for the JDBC insert; no ClickHouse here)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_sinker_nali_spark.operators import bpe as B
from clickhouse_sinker_nali_spark.operators import curation as C
from clickhouse_sinker_nali_spark.operators import dedup as D
from clickhouse_sinker_nali_spark.operators import graph as G
from clickhouse_sinker_nali_spark.operators import ingest as I
from clickhouse_sinker_nali_spark.operators import relational as R
from clickhouse_sinker_nali_spark.operators import scale as SC
from clickhouse_sinker_nali_spark.operators import similarity as S
from clickhouse_sinker_nali_spark.operators import text as T
from clickhouse_sinker_nali_spark.operators import warehouse as W
from clickhouse_sinker_nali_spark.session import get_spark

HEADLINE = {
    "q1_pricing_summary": R.q1_pricing_summary,
    "q3_shipping_priority": R.q3_shipping_priority,
    "q5_star_join": R.q5_star_join,
    "window_user_events": R.window_user_events,
    "sessionize_events": R.sessionize_events,
    "asof_join_events_orders": R.asof_join_events_orders,
    "range_join_buckets": R.range_join_buckets,
    "dedup_exact": D.dedup_exact,
    "dedup_minhash_lsh": D.dedup_minhash_lsh,
    "ann_bruteforce_topk": S.ann_bruteforce_topk,
    "ann_lsh_topk": S.ann_lsh_topk,
    "ann_ivf_topk": S.ann_ivf_topk,
    "token_stats": T.token_stats,
    "quality_score": T.quality_score,
    "decontaminate": T.decontaminate,
    "skew_join_salted": SC.skew_join_salted,
    "q6_forecast_revenue": W.q6_forecast_revenue,
    "q19_disjunctive_revenue": W.q19_disjunctive_revenue,
    "tfidf_top_terms": T.tfidf_top_terms,
    "sequence_pack": C.sequence_pack,
    "curation_pipeline": C.curation_pipeline,
    "entity_extract": I.entity_extract,
    "inverted_index_postings": T.inverted_index_postings,
    "unigram_logprob": T.unigram_logprob,
    "doc_pagerank": G.doc_pagerank,
    "scd2_customer_status": W.scd2_customer_status,
    "chunk_documents": C.chunk_documents,
    "full_outer_reconcile": R.full_outer_reconcile,
    "bpe_encode": B.bpe_encode,
}


INGEST_N = 500_000

INGEST_DIMS = [
    {"name": "time", "type": "DateTime"},
    {"name": "name", "type": "String"},
    {"name": "value", "type": "Float64"},
    {"name": "price", "type": "Float64"},
    {"name": "status", "type": "Int64"},
    {"name": "tags", "type": "Array(String)"},
]


def _gen_messages(spark, n: int):
    """Deterministic JSON messages of the go.test.sh shape, generated
    distributed (no driver-side loop)."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.to_json(
            F.struct(
                F.concat(
                    F.lit("2024-03-0"), (F.col("id") % 9 + 1).cast("string"),
                    F.lit(" 10:11:"), F.lpad((F.col("id") % 60).cast("string"), 2, "0"),
                ).alias("time"),
                F.concat(F.lit("name"), (F.col("id") % 997).cast("string")).alias("name"),
                (F.col("id") * 0.5).alias("value"),
                (F.col("id") * 1.25).alias("price"),
                (F.col("id") % 7).alias("status"),
                F.array(F.lit("a"), (F.col("id") % 3).cast("string")).alias("tags"),
            )
        ).alias("value")
    )


def bench_ingest(spark) -> tuple[float, float]:
    from clickhouse_sinker_nali_spark.streaming.pipeline import TaskConfig, transform

    cfg = TaskConfig(name="bench_ingest", topic="bench", table="t", dims=INGEST_DIMS)
    msgs = _gen_messages(spark, INGEST_N).cache()
    msgs.count()  # materialize inputs so we time the engine, not the generator

    # 5 reps, not 3: the host is time-shared and identical runs vary 2.7s..46s
    # under external load spikes (measured) — more reps = better odds that at
    # least one run lands in a quiet window, and min-of-N is the engine cost.
    typed = transform(msgs, cfg)
    parse_best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        typed.write.format("noop").mode("overwrite").save()
        parse_best = min(parse_best, time.perf_counter() - t0)
    parse_rps = INGEST_N / parse_best

    out = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        full_best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            transform(msgs, cfg).write.mode("overwrite").parquet(out)
            full_best = min(full_best, time.perf_counter() - t0)
        full_rps = INGEST_N / full_best
    finally:
        shutil.rmtree(out, ignore_errors=True)
    msgs.unpersist()
    return parse_rps, full_rps


APACHE_N = 200_000


def bench_ingest_apache(spark) -> float:
    """Parse+coerce throughput on the reference's OWN benchmark regime:
    26-column apache-access-log JSON, ~750 B/message (the shape behind
    every BASELINE.md rows/s figure) — the apples-to-apples ingest number.
    """
    from clickhouse_sinker_nali_spark.loadgen import APACHE_LOG_DIMS, gen_apache_logs
    from clickhouse_sinker_nali_spark.streaming.pipeline import TaskConfig, transform

    cfg = TaskConfig(
        name="bench_apache", topic="bench", table="apache_access_log",
        dims=APACHE_LOG_DIMS,
    )
    msgs = gen_apache_logs(spark, APACHE_N).cache()
    msgs.count()
    typed = transform(msgs, cfg)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        typed.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    msgs.unpersist()
    return APACHE_N / best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    R.q1_pricing_summary(spark, sf_dir).count()

    # min of 2 runs per query: the benchmark host is time-shared, so a
    # single run can absorb an external CPU spike; the min is the engine's
    # actual cost (plans are deterministic, data is cached by the OS)
    timings: dict[str, float] = {}
    for name, fn in HEADLINE.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    parse_rps, full_rps = bench_ingest(spark)
    apache_rps = bench_ingest_apache(spark)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "ingest_parse_rows_per_sec": round(parse_rps),
                "ingest_rows_per_sec": round(full_rps),
                "ingest_apache_log_rows_per_sec": round(apache_rps),
            }
        )
    )


if __name__ == "__main__":
    main()
