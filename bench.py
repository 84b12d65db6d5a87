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

Methodology notes:
- Per-query numbers are min-of-2 with cache hygiene between queries; the
  LSH family's FIRST rep per corpus additionally pays the one-time
  corpus-derived hot-bucket-cap derivation + shingle cache fill (~4x the
  steady state at sf0.1), which the min-of-2 absorbs — a single-rep cold
  capture of dedup_minhash_lsh is NOT comparable to these numbers.
- ``canary_pre``/``canary_post`` carry fixed host-health probes and
  ``host_factor_vs_ref`` against CANARY_REF; read them before comparing
  captures across rounds (factors <1.3 are host noise, >1.5 marks a
  degraded window — the BENCH_r07 pollution class).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
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
from clickhouse_sinker_nali_spark.operators import aggstate as AST
from clickhouse_sinker_nali_spark.operators import classifier as CL
from clickhouse_sinker_nali_spark.operators import warehouse as W
from clickhouse_sinker_nali_spark.operators import warehouse_ext as WX
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
    "c4_filters": T.c4_filters,
    "boilerplate_lines": T.boilerplate_lines,
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
    # round-3 additions (new keys; earlier keys keep their r1/r2 meaning)
    "q9_product_profit": WX.q9_product_profit,
    "q21_waiting_suppliers": WX.q21_waiting_suppliers,
    "agg_state_roundtrip": AST.agg_state_roundtrip,
    "segment_dedup": C.segment_dedup,
    "quality_classifier_scores": CL.quality_classifier_scores,
    "chunk_documents": C.chunk_documents,
    "full_outer_reconcile": R.full_outer_reconcile,
    "bpe_encode": B.bpe_encode,
    # seventh wave: training-order / budget ops + PQ ANN + sliding distinct
    "curriculum_order": C.curriculum_order,
    "token_budget_select": C.token_budget_select,
    "epoch_shuffle": C.epoch_shuffle,
    "sliding_distinct_users": W.sliding_distinct_users,
    "ann_pq_topk": S.ann_pq_topk,
    "ann_ivfpq_topk": S.ann_ivfpq_topk,
    # eighth wave: LM scoring, sparse similarity join, example builders
    "bigram_kn_logprob": T.bigram_kn_logprob,
    "dedup_tfidf_cosine": D.dedup_tfidf_cosine,
    "mlm_masking": C.mlm_masking,
    "interval_overlap_join": W.interval_overlap_join,
    # round 4: scale paths (hier assignment, Arrow-vectorized scoring,
    # IVF-PQ hard negatives, cell-blocked embedding dedup)
    "ann_ivf_hier_topk": S.ann_ivf_hier_topk,
    "ann_bruteforce_arrow": S.ann_bruteforce_arrow,
    "ann_pq_arrow": S.ann_pq_arrow,
    "ann_ivf_arrow": S.ann_ivf_arrow,
    "ann_ivfpq_arrow": S.ann_ivfpq_arrow,
    "hard_negatives_ivfpq": S.hard_negatives_ivfpq,
    "dedup_embedding_cosine_cells": D.dedup_embedding_cosine_cells,
    # round 5: composed hier×Arrow IVF with broadcast centroids (the
    # literal-free web-scale index-build shape)
    "ann_ivf_hier_arrow": S.ann_ivf_hier_arrow,
    # round 8: within-page line dedup + hybrid lexical/dense retrieval
    "intradoc_line_dedup": T.intradoc_line_dedup,
    "hybrid_retrieval_rrf": T.hybrid_retrieval_rrf,
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


def _timed_reps(fn, n_reps: int) -> list[float]:
    reps = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        fn()
        reps.append(round(time.perf_counter() - t0, 3))
    return reps


def bench_ingest(spark) -> tuple[float, float, list[float], list[float]]:
    from clickhouse_sinker_nali_spark.streaming.pipeline import TaskConfig, transform

    cfg = TaskConfig(name="bench_ingest", topic="bench", table="t", dims=INGEST_DIMS)
    msgs = _gen_messages(spark, INGEST_N).cache()
    msgs.count()  # materialize inputs so we time the engine, not the generator

    # Warm up HotSpot on the generated projection before timing: the parse
    # plan's codegen'd methods take ~10 invocations × thousands of rows to
    # tier up to C2, and interpreted-bytecode execution of the same code is
    # 20-100× slower (measured 0.15s steady vs 7s cold on identical input).
    # Steady-state throughput is the honest metric — the reference daemon
    # parses for days, not for one cold batch.
    typed = transform(msgs, cfg)
    for _ in range(6):
        typed.write.format("noop").mode("overwrite").save()

    # 5 timed reps, all reported: the host is time-shared and identical runs
    # vary up to 10× under external load spikes — per-rep arrays make host
    # noise distinguishable from plan regressions; min-of-N is the engine
    # cost.
    parse_reps = _timed_reps(
        lambda: typed.write.format("noop").mode("overwrite").save(), 5
    )
    parse_rps = INGEST_N / min(parse_reps)

    out = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        full_reps = _timed_reps(
            lambda: transform(msgs, cfg).write.mode("overwrite").parquet(out), 5
        )
        full_rps = INGEST_N / min(full_reps)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    msgs.unpersist()
    return parse_rps, full_rps, parse_reps, full_reps


# Host-health canary: fixed deterministic work whose wall time depends only
# on host conditions (CPU contention/steal, page cache, JVM health), never
# on repo code — every capture self-documents its host factor (r7 VERDICT
# task #4: BENCH_r07 was polluted by a degraded-host window and the record
# couldn't prove it).  Three probes: a single-threaded pure-Python loop
# (1-core speed), a 32-task JVM codegen loop (multicore contention), and a
# fixed parquet scan+agg (I/O + page cache).  Reference values from the
# quietest observed host window live in CANARY_REF; a capture whose canary
# min reads >1.1x those is a degraded-host capture and says so itself.
CANARY_PY_N = 15_000_000
CANARY_JVM_N = 1_600_000_000
# Best mins observed across the r8 session's quietest windows (load_avg
# ~1-7; the py probe still swung 1.17-1.95s within minutes on an "idle"
# host, so treat factors under ~1.3 as noise and >1.5 as a genuinely
# degraded capture window).
CANARY_REF = {"py_1core_sec": 1.17, "jvm_32core_sec": 0.34, "scan_sec": 0.19}


def host_canary(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    def py_loop() -> int:
        acc = 0
        for i in range(CANARY_PY_N):
            acc = (acc + i * i) % 1000003
        return acc

    py = _timed_reps(py_loop, 3)
    jvm = _timed_reps(
        lambda: spark.range(0, CANARY_JVM_N, 1, 32)
        .select(F.sum(F.xxhash64("id")))
        .collect(),
        3,
    )
    li = os.path.join(sf_dir, "lineitem.parquet")
    scan = _timed_reps(
        lambda: spark.read.parquet(li)
        .select(F.sum(F.xxhash64("l_orderkey")), F.sum("l_extendedprice"))
        .collect(),
        3,
    )
    out = {
        "py_1core_sec": py,
        "jvm_32core_sec": jvm,
        "scan_sec": scan,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }
    factors = {
        k: round(min(out[k]) / ref, 2)
        for k, ref in CANARY_REF.items()
        if ref
    }
    if factors:
        out["host_factor_vs_ref"] = factors
    return out


APACHE_N = 200_000


def bench_ingest_apache(spark) -> tuple[float, list[float]]:
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
    for _ in range(6):  # JIT warmup, see bench_ingest
        typed.write.format("noop").mode("overwrite").save()
    reps = _timed_reps(
        lambda: typed.write.format("noop").mode("overwrite").save(), 5
    )
    msgs.unpersist()
    return APACHE_N / min(reps), reps


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # Progress bars share stdout with the result line and have clobbered the
    # driver's tail-capture three rounds running — keep stdout JSON-only.
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    R.q1_pricing_summary(spark, sf_dir).count()

    canary_pre = host_canary(spark, sf_dir)

    # min of 2 runs per query: the benchmark host is time-shared, so a
    # single run can absorb an external CPU spike; the min is the engine's
    # actual cost (plans are deterministic, data is cached by the OS)
    timings: dict[str, float] = {}
    query_reps: dict[str, list[float]] = {}
    for name, fn in HEADLINE.items():
        reps = _timed_reps(lambda f=fn: f(spark, sf_dir).count(), 2)
        timings[name] = round(min(reps), 3)
        query_reps[name] = reps
        # cache hygiene BETWEEN queries (within a query's reps, caches are
        # the query's own policy and stay): r5 published 12-18s GC-outlier
        # numbers for 1-2s queries because earlier queries' persisted
        # frames (DISK_ONLY shingles, materialized dims) accumulated heap
        # pressure across the session
        spark.catalog.clearCache()
        W.invalidate_dim_caches()

    # Ingest benches run in their OWN fresh session: r6's
    # ingest_apache_reps_sec spanned 0.5-7.3s within one capture because
    # the query session above accumulates 43 queries' worth of heap state
    # (JIT caches, old-gen garbage from persisted-then-released frames),
    # and a G1 mixed collection landing inside a 0.5s rep multiplies it.
    # A fresh JVM gives the ingest figures the same clean-room treatment
    # the matched-core loop already had.
    spark.stop()
    s_ing = get_spark(
        "bench_ingest", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    s_ing.sparkContext.setLogLevel("ERROR")
    try:
        parse_rps, full_rps, parse_reps, full_reps = bench_ingest(s_ing)
        apache_rps, apache_reps = bench_ingest_apache(s_ing)
    finally:
        s_ing.stop()

    # Matched-core apples-to-apples vs BASELINE.md: the reference's two
    # published configurations are 142K rows/s @ 11 cpu and 301K @ 25 cpu
    # (docs/dev/introduction.md:72).  Dividing the local[32] figure by 32
    # UNDERcounts per-core efficiency (shared-JVM scaling + host sharing),
    # so measure at the reference's own core counts in fresh sessions.
    # r6 measurements: 182K @ 11 (1.29x the reference) and 338K @ 25
    # (1.12x its best case).
    matched: dict[str, int] = {}
    for cores in (11, 25):
        # best-effort: a failure here must degrade to a missing key, never
        # kill the whole bench artifact the driver grades.  stop() runs in
        # a finally: a leaked active session would make the next
        # getOrCreate silently reuse THIS core count and publish its
        # measurement under the wrong key.
        s = None
        try:
            s = get_spark(
                f"bench_{cores}c",
                master=f"local[{cores}]",
                shuffle_partitions=cores,
                extra_conf={"spark.ui.showConsoleProgress": "false"},
            )
            s.sparkContext.setLogLevel("ERROR")
            rps, _ = bench_ingest_apache(s)
            matched[f"ingest_apache_log_rows_per_sec_{cores}core"] = round(rps)
        except Exception as e:  # noqa: BLE001 — degrade, don't die
            matched[f"ingest_apache_log_err_{cores}core"] = str(e)[:200]
        finally:
            if s is not None:
                try:
                    s.stop()
                except Exception:
                    pass

    # post-capture canary in its own fresh session: bounds host drift
    # WITHIN the capture (a quiet pre + degraded post means the query
    # numbers straddle the degradation)
    s_can = get_spark(
        "bench_canary", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    s_can.sparkContext.setLogLevel("ERROR")
    try:
        canary_post = host_canary(s_can, sf_dir)
    finally:
        s_can.stop()

    total = round(sum(timings.values()), 3)
    result = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "query_reps": query_reps,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "ingest_parse_rows_per_sec": round(parse_rps),
            "ingest_rows_per_sec": round(full_rps),
            "ingest_apache_log_rows_per_sec": round(apache_rps),
            "ingest_parse_reps_sec": parse_reps,
            "ingest_full_reps_sec": full_reps,
            "ingest_apache_reps_sec": apache_reps,
            # median-of-5 companions: robust to a single host-load spike in
            # either direction, so a one-rep outlier can't swing the
            # published figure (min stays the headline — it is the engine's
            # cost; the median bounds how noisy the capture was)
            "ingest_parse_rows_per_sec_median": round(
                INGEST_N / statistics.median(parse_reps)
            ),
            "ingest_rows_per_sec_median": round(
                INGEST_N / statistics.median(full_reps)
            ),
            "ingest_apache_log_rows_per_sec_median": round(
                APACHE_N / statistics.median(apache_reps)
            ),
            "canary_pre": canary_pre,
            "canary_post": canary_post,
            **matched,
        }
    )
    # Also persist to a file: the driver tail-captures stdout, and JVM noise
    # has corrupted that capture in past rounds — the file is the durable copy.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.out.json")
    with open(out_path, "w") as f:
        f.write(result + "\n")
    print(result)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
