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

Usage: python scripts/sf1_smoke.py [--regen]
Writes parquet to data/sf1/ (gitignored) and prints one timing line per
query plus a JSON summary.
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
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "sf1")
REPLICAS = 10

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


def generate(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    reps = spark.range(REPLICAS).withColumnRenamed("id", "__rep")
    domain_span = {
        dom: int(
            spark.read.parquet(f"{SRC}/{tbl}.parquet").agg(F.max(col)).collect()[0][0]
        )
        + 1
        for dom, (tbl, col) in DOMAIN_OWNER.items()
    }
    for table, keys in SCALED.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        out = df.crossJoin(F.broadcast(reps))
        for k, dom in keys.items():
            out = out.withColumn(k, F.col(k) + F.col("__rep") * F.lit(domain_span[dom]))
        if table == "documents":
            out = out.withColumn(
                "text", F.concat(F.lit("r"), F.col("__rep"), F.lit(" "), F.col("text"))
            )
        out.drop("__rep").write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
    for table in COPIED:
        spark.read.parquet(f"{SRC}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{table}.parquet")


def main() -> None:
    spark = get_spark(
        "sf1-smoke", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
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
