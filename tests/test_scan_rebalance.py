"""Scan-stage rebalance contract (session.load_table).

The driver's generated parquet files are single-row-group, so every
operator whose heavy per-row work fuses into the scan stage (shingle
explode, HOF folds, Arrow mapInPandas scoring, binary decode) would run
on ONE core regardless of cluster size.  load_table repairs that for the
CPU-heavy tables (documents/embeddings) with a round-robin repartition —
but ONLY when the physical split count is below the cluster parallelism,
so on a real many-row-group input it adds nothing.  These tests pin:

- the split probe reads true row-group counts (and fails open),
- the rebalance fires for single-row-group local files and is
  recognised/excluded by plans.count_exchanges,
- pushdown/pruning still reach the scan through the Repartition,
- input_file_name() consumers opt out (it evaluates scan-side only).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_sinker_nali_spark.plans import (
    count_exchanges,
    formatted_plan,
    has_pushed_filter,
    read_schema_columns,
)
from clickhouse_sinker_nali_spark.session import _scan_splits, load_table

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_scan_splits_counts_row_groups(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"x": list(range(1000))}), p, row_group_size=100
    )
    assert _scan_splits(p) == 10
    # fail-open: unknown path reports "already parallel"
    assert _scan_splits(str(tmp_path / "missing.parquet")) >= 1 << 20


def test_documents_rebalance_fires_and_is_excluded(spark):
    df = load_table(spark, SF_DIR, "documents")
    plan = formatted_plan(df)
    assert "RoundRobinPartitioning" in plan and "REPARTITION_BY_NUM" in plan
    # parallelism actually reaches the cluster width
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # the rebalance is scan repair, not an algorithmic shuffle
    assert count_exchanges(df) == 0


def test_rebalance_opt_out_and_non_heavy_tables(spark):
    assert "Exchange" not in formatted_plan(
        load_table(spark, SF_DIR, "documents", rebalance=False)
    )
    # relational tables are never rebalanced (their operators shuffle on
    # join/agg keys immediately; an extra exchange would be pure cost)
    assert "Exchange" not in formatted_plan(load_table(spark, SF_DIR, "lineitem"))


def test_pushdown_survives_rebalance(spark):
    df = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "lang")
    )
    assert has_pushed_filter(df, "lang")
    scans = read_schema_columns(df)
    assert scans and scans[0] <= {"doc_id", "lang"}


def test_input_file_name_consumer_sees_filenames(spark):
    from clickhouse_sinker_nali_spark.operators.ingest import ingest_provenance

    rows = ingest_provenance(spark, SF_DIR).limit(5).collect()
    assert rows
    # the provenance column must carry real file names, not ""
    fname_col = next(
        c for c in rows[0].asDict() if "file" in c.lower() or "source" in c.lower()
    )
    assert all(r[fname_col] for r in rows)
