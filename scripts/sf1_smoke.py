"""sf1-equivalent smoke: generate a 10x-scaled corpus from sf0.1 and run
the most expensive queries once, to surface driver-memory or skew cliffs
an order of magnitude above the regular bench scale.

The scale-up replicates each scaled table 10x with consistent key offsets
(orderkey/custkey/user/doc/vec ids shift by replica x keyspan, so
referential integrity and per-key row counts are preserved — volume grows,
skew per key does not).  Document text gets a per-replica prefix so dedup
does not see an artificial 10-copy cluster for every doc (which would be a
quadratic pair blowup no real corpus has).  Dimension tables
(part/supplier/nation/region) stay as-is, like TPC-H's fixed dims.

Usage: python scripts/sf1_smoke.py [--regen] [--sf10]
Writes parquet to data/sf1/ (gitignored) and prints one timing line per
query plus a JSON summary.

``--sf10``: the next order of magnitude for the HEAVY families only —
100 replicas of documents+embeddings (500 K docs, 200 K vectors, K≈1.5 K
IVF cells, the regime where hierarchical assignment and broadcast
centroid distribution start to matter).  Relational tables are not
scaled (their sf1 behavior is already audited; the open question at r5
was ANN/dedup).  dedup_minhash_lsh output is genuinely quadratic in the
replica count (every replica of a near-dup doc is near-dup of every
other replica), so the sf10 run first ACCOUNTS candidate-pair volume
from the band buckets — cheap — and only runs the full pair join when
the volume is tractable; otherwise it reports the measured volume as the
named cause (no silent caps).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clickhouse_sinker_nali_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
DST = os.path.join(_DATA, "sf1")
DST10 = os.path.join(_DATA, "sf10")
REPLICAS = 10
REPLICAS10 = 100
SF10_TABLES = ("documents", "embeddings")

# (table, {key column: key DOMAIN}) — spans are computed once per DOMAIN
# from its owning table, NOT per (table, column): o_custkey's maximum can be
# lower than c_custkey's (TPC-H has order-less customers), and per-column
# spans would then shift the two sides differently, silently breaking
# cross-replica referential integrity.
SCALED = {
    "lineitem": {"l_orderkey": "orderkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
# domain -> (owning table, column) for span derivation
DOMAIN_OWNER = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
COPIED = ["part", "supplier", "nation", "region"]


def generate(spark, dst: str = DST, replicas: int = REPLICAS,
             only: tuple | None = None) -> None:
    os.makedirs(dst, exist_ok=True)
    reps = spark.range(replicas).withColumnRenamed("id", "__rep")
    domain_span = {
        dom: int(
            spark.read.parquet(f"{SRC}/{tbl}.parquet").agg(F.max(col)).collect()[0][0]
        )
        + 1
        for dom, (tbl, col) in DOMAIN_OWNER.items()
    }
    for table, keys in SCALED.items():
        if only is not None and table not in only:
            continue
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        out = df.crossJoin(F.broadcast(reps))
        for k, dom in keys.items():
            out = out.withColumn(k, F.col(k) + F.col("__rep") * F.lit(domain_span[dom]))
        if table == "documents":
            out = out.withColumn(
                "text", F.concat(F.lit("r"), F.col("__rep"), F.lit(" "), F.col("text"))
            )
        out.drop("__rep").write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
    for table in COPIED:
        if only is not None and table not in only:
            continue
        spark.read.parquet(f"{SRC}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{table}.parquet")


def lsh_candidate_volume(spark, sf_dir: str) -> tuple[int, int, int]:
    """(raw, capped, cap) sums of C(bucket, 2) over all LSH band buckets —
    the exact number of candidate pairs the band join will emit before
    dedup/verify, uncapped and under the data-derived hot-bucket cap
    (r7: min(p99.9 bucket size, pair-budget cap) clamped to
    [LSH_MAX_BUCKET, LSH_CAP_CEIL] — ``dedup._derived_cap_df``, the same
    cap dedup_minhash_lsh applies).  One narrow aggregation; lets the
    sf10 run account output
    volume BEFORE committing to a possibly output-bound pair join, and
    shows how much of it the cap removes."""
    from clickhouse_sinker_nali_spark.operators.dedup import (
        _banded_sigs,
        _bucket_sizes,
        _derived_cap_df,
        _shingle_df,
    )

    banded = _banded_sigs(_shingle_df(spark, sf_dir)).persist()
    buckets = _bucket_sizes(banded).persist()
    try:
        cap = int(_derived_cap_df(buckets).collect()[0].cap)
        pairs = F.col("n") * (F.col("n") - 1) / 2
        row = buckets.agg(
            F.sum(pairs).alias("raw"),
            F.sum(F.when(F.col("n") <= cap, pairs).otherwise(F.lit(0))).alias(
                "capped"
            ),
        ).collect()[0]
    finally:
        buckets.unpersist()
        banded.unpersist()
    return int(row.raw or 0), int(row.capped or 0), cap


# full-pair-join budget for the sf10 minhash run: past this the join is
# output-bound by construction (quadratic in replica count) and the
# candidate volume IS the finding
SF10_LSH_PAIR_BUDGET = 30_000_000


def run_sf10(spark) -> None:
    import clickhouse_sinker_nali_spark.operators.dedup as D
    import clickhouse_sinker_nali_spark.operators.similarity as S

    if "--regen" in sys.argv or not os.path.exists(
        f"{DST10}/embeddings.parquet"
    ):
        t0 = time.perf_counter()
        generate(spark, dst=DST10, replicas=REPLICAS10, only=SF10_TABLES)
        print(f"generated {DST10} in {time.perf_counter() - t0:.1f}s", flush=True)

    heavy = {
        "minhash_signatures": D.minhash_signatures,
        "ann_bruteforce_arrow": S.ann_bruteforce_arrow,
        "ann_ivf_arrow": S.ann_ivf_arrow,
        "ann_ivf_hier_topk": S.ann_ivf_hier_topk,
        "ann_ivf_hier_arrow": S.ann_ivf_hier_arrow,
        "ann_ivfpq_arrow": S.ann_ivfpq_arrow,
        "hard_negatives_ivfpq": S.hard_negatives_ivfpq,
        "dedup_embedding_cosine_cells": D.dedup_embedding_cosine_cells,
    }
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in heavy.items():
        best = None
        for _ in range(2):  # min-of-2: the host is time-shared
            t0 = time.perf_counter()
            rows[name] = fn(spark, DST10).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 2)
        print(f"{name:32s} {timings[name]:8.2f}s  rows={rows[name]}", flush=True)

    t0 = time.perf_counter()
    raw_volume, capped_volume, derived_cap = lsh_candidate_volume(spark, DST10)
    probe_s = round(time.perf_counter() - t0, 2)
    print(
        f"lsh candidate volume: {raw_volume:,} raw / {capped_volume:,} after "
        f"the derived hot-bucket cap ({derived_cap}) (probe {probe_s}s)",
        flush=True,
    )
    if capped_volume <= SF10_LSH_PAIR_BUDGET:
        # the production default (hot buckets dropped) completes; the raw
        # volume above records what the cap removed — boilerplate replicas
        # by construction of the generator
        t0 = time.perf_counter()
        rows["dedup_minhash_lsh"] = D.dedup_minhash_lsh(spark, DST10).count()
        timings["dedup_minhash_lsh"] = round(time.perf_counter() - t0, 2)
        print(
            f"{'dedup_minhash_lsh':32s} {timings['dedup_minhash_lsh']:8.2f}s  "
            f"rows={rows['dedup_minhash_lsh']}",
            flush=True,
        )
    else:
        print(
            f"dedup_minhash_lsh SKIPPED: {capped_volume:,} capped candidate "
            f"pairs still exceed the {SF10_LSH_PAIR_BUDGET:,} budget — output "
            "is quadratic in the generator's replica count; the plan itself "
            "stays an equi-join + verify, linear in candidate volume.",
            flush=True,
        )
    print(json.dumps({
        "sf": 10, "timings": timings, "rows": rows,
        "lsh_candidate_pairs": raw_volume,
        "lsh_candidate_pairs_capped": capped_volume,
        "lsh_derived_cap": derived_cap,
    }))


def run_audit(spark) -> None:
    """r5 audit at sf1, min-of-2 per query (the sf1 table is single-run):
    (a) doc_pagerank ratio attribution — iterations are FIXED at 3, so any
    superlinearity must come from the edge list, i.e. dedup_minhash_lsh's
    pair growth; measuring both plus the pair/edge counts names the cause;
    (b) the IVF assignment ladder with the composed hier×Arrow form."""
    import clickhouse_sinker_nali_spark.operators.dedup as D
    import clickhouse_sinker_nali_spark.operators.graph as G
    import clickhouse_sinker_nali_spark.operators.similarity as S

    if "--regen" in sys.argv or not os.path.exists(f"{DST}/lineitem.parquet"):
        t0 = time.perf_counter()
        generate(spark)
        print(f"generated {DST} in {time.perf_counter() - t0:.1f}s", flush=True)

    audit = {
        "dedup_minhash_lsh": D.dedup_minhash_lsh,
        "doc_pagerank": G.doc_pagerank,
        "ann_ivf_topk": S.ann_ivf_topk,
        "ann_ivf_hier_topk": S.ann_ivf_hier_topk,
        "ann_ivf_arrow": S.ann_ivf_arrow,
        "ann_ivf_hier_arrow": S.ann_ivf_hier_arrow,
    }
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in audit.items():
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            rows[name] = fn(spark, DST).count()
            reps.append(round(time.perf_counter() - t0, 2))
        timings[name] = min(reps)
        print(f"{name:24s} min {min(reps):8.2f}s reps={reps} rows={rows[name]}",
              flush=True)
    print(json.dumps({"sf": 1, "audit": timings, "rows": rows}))


def main() -> None:
    spark = get_spark(
        "sf1-smoke", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "--sf10" in sys.argv:
        run_sf10(spark)
        return
    if "--audit" in sys.argv:
        run_audit(spark)
        return
    if "--regen" in sys.argv or not os.path.exists(f"{DST}/lineitem.parquet"):
        t0 = time.perf_counter()
        generate(spark)
        print(f"generated {DST} in {time.perf_counter() - t0:.1f}s", flush=True)

    import clickhouse_sinker_nali_spark.operators.curation as C
    import clickhouse_sinker_nali_spark.operators.dedup as D
    import clickhouse_sinker_nali_spark.operators.graph as G
    import clickhouse_sinker_nali_spark.operators.ingest as I
    import clickhouse_sinker_nali_spark.operators.relational as R
    import clickhouse_sinker_nali_spark.operators.scale as SC
    import clickhouse_sinker_nali_spark.operators.similarity as S
    import clickhouse_sinker_nali_spark.operators.warehouse as W
    import clickhouse_sinker_nali_spark.operators.warehouse_ext as WX

    heavy = {
        "doc_pagerank": G.doc_pagerank,
        "ann_pq_topk": S.ann_pq_topk,
        "ann_ivf_topk": S.ann_ivf_topk,
        "ann_ivf_hier_topk": S.ann_ivf_hier_topk,
        "ann_ivfpq_topk": S.ann_ivfpq_topk,
        "hard_negatives_ivfpq": S.hard_negatives_ivfpq,
        "dedup_embedding_cosine_cells": D.dedup_embedding_cosine_cells,
        "curation_pipeline": C.curation_pipeline,
        "interval_overlap_join": W.interval_overlap_join,
        "dedup_minhash_lsh": D.dedup_minhash_lsh,
        "entity_extract": I.entity_extract,
        "skew_join_salted": SC.skew_join_salted,
        "skew_join_adaptive": SC.skew_join_adaptive,
        "q21_waiting_suppliers": WX.q21_waiting_suppliers,
        "q3_shipping_priority": R.q3_shipping_priority,
        "sessionize_events": R.sessionize_events,
    }
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in heavy.items():
        t0 = time.perf_counter()
        rows[name] = fn(spark, DST).count()
        timings[name] = round(time.perf_counter() - t0, 2)
        print(f"{name:32s} {timings[name]:8.2f}s  rows={rows[name]}", flush=True)
    print(json.dumps({"sf": 1, "timings": timings, "rows": rows}))


if __name__ == "__main__":
    main()
