"""sf10 value-hash check for doc_pagerank, staged (r7 VERDICT task #6).

The monolithic DOC_PAGERANK_SQL replays the whole LSH pair derivation
INSIDE DuckDB; at the sf10 smoke scale (500 K docs, 11.29 M pairs) that
single query spills past the container disk even with a memory cap.  The
pair stage, however, is ALREADY value-hash-proven at sf10 on its own
(``check_oracle.py data/sf10 dedup_minhash_lsh`` — 11,288,048 pairs,
identical hash both engines), so this script verifies the remaining
stage compositionally:

1. Spark: run ``dedup_minhash_lsh`` once, write the pair set to parquet.
2. Spark: run the full ``doc_pagerank`` (its own LSH derivation, the
   exact registry query) and hash the result.
3. DuckDB: run ONLY the PageRank sweeps of ``DOC_PAGERANK_SQL`` with
   ``pairs`` bound to the parquet from step 1, and hash that.

A hash match proves the PageRank stage reproduces on an input the other
check proved — together the two checks cover the whole chained query at
sf10 without asking DuckDB to hold both stages in one plan.

Usage: python scripts/sf10_pagerank_hashcheck.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from check_oracle import pandas_rows, value_hash  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data/sf10"
    pairs_path = os.path.join("data", "_pr_pairs_tmp.parquet")

    from clickhouse_sinker_nali_spark.operators.dedup import dedup_minhash_lsh
    from clickhouse_sinker_nali_spark.operators.graph import (
        PR_DAMPING,
        PR_ITERATIONS,
        _iter_ctes,
        doc_pagerank,
    )
    from clickhouse_sinker_nali_spark.session import get_spark

    spark = get_spark(
        "sf10-pagerank-check",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.maxResultSize": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    dedup_minhash_lsh(spark, sf_dir).write.mode("overwrite").parquet(pairs_path)
    print("pairs written", flush=True)

    scols, srows = pandas_rows(doc_pagerank(spark, sf_dir).toPandas())
    sh = value_hash(scols, srows)
    print(f"spark : rows={len(srows)} hash={sh}", flush=True)
    spark.stop()

    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    con.execute(
        "CREATE VIEW pairs AS SELECT * FROM "
        f"read_parquet('{pairs_path}/*.parquet')"
    )
    sql = (
        "WITH edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst"
        " FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs),\n"
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS degree"
        " FROM edges GROUP BY src),\n"
        "nn AS (SELECT COUNT(*)::DOUBLE AS n FROM deg),\n"
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS pr FROM deg),\n"
        + _iter_ctes(PR_ITERATIONS, PR_DAMPING)
        + f"""
SELECT d.id AS doc_id, d.degree, ROUND(r{PR_ITERATIONS}.pr, 6) AS pagerank
FROM deg d JOIN r{PR_ITERATIONS} ON d.id = r{PR_ITERATIONS}.id
ORDER BY doc_id
"""
    )
    ocols, orows = pandas_rows(con.execute(sql).fetchdf())
    oh = value_hash(ocols, orows)
    print(f"duckdb: rows={len(orows)} hash={oh}", flush=True)

    shutil.rmtree(pairs_path, ignore_errors=True)
    ok = (
        len(srows) == len(orows)
        and sorted(scols) == sorted(ocols)
        and sh == oh
    )
    print("MATCH" if ok else "MISMATCH", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
