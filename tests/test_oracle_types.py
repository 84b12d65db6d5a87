"""Static typing sweep over every oracle SQL.

The driver's correctness gate fetches DuckDB results through pandas
(``fetchdf()``).  Two DuckDB output types are landmines on that path:

- HUGEINT (what DuckDB types a windowed/plain SUM of integers as) becomes
  float64 in pandas → ``1.0`` vs Spark's ``1`` → value-hash mismatch with
  rows and schema still matching (the round-2 ``sessionize_events`` red).
- List/array columns become numpy arrays → unhashable in naive
  canonicalizers (the round-1 harness errors).

This test DESCRIBEs all registered oracles (DESCRIBE only types the
query — no execution, so it is cheap) and fails on any HUGEINT output.
Array outputs are allowed only for oracles that already serialize them
to strings on both sides; a raw list-typed output column fails too.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.001"

BANNED_TYPES = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_hugeint_or_array_oracle_columns(con):
    bad = []
    for name, sql in entry.oracle_sql().items():
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 - report, don't mask
            bad.append((name, "<describe failed>", str(e)[:120]))
            continue
        for col_name, col_type, *_ in cols:
            up = str(col_type).upper()
            if any(b in up for b in BANNED_TYPES):
                bad.append((name, col_name, up))
            if up.endswith("[]") or up.startswith("STRUCT") or "LIST" in up:
                bad.append((name, col_name, up))
            # DuckDB DATE → pandas datetime64 midnight, but Spark DateType
            # → datetime.date "2024-01-01": no pairing hashes equal through
            # the driver.  Keep derived day/week columns TIMESTAMP-typed on
            # both sides instead (r3: cohort_retention & two others).
            if up == "DATE":
                bad.append((name, col_name, up))
    assert not bad, (
        "oracle columns that break the driver's pandas canonicalization "
        f"(CAST them to BIGINT / serialize arrays): {bad}"
    )
