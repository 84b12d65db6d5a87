"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` and compares it to
``oracle_sql()`` via DuckDB on the same parquet tables: row count, column
names, and an order-insensitive value hash (columns sorted by name, rows
sorted, values canonicalized).

BOTH sides are fetched through pandas (``df.toPandas()`` /
``res.fetchdf()``) before canonicalization, because that is what the
driver's gate does.  This is load-bearing: DuckDB types a windowed
SUM(INTEGER) as HUGEINT, and pandas renders HUGEINT as float64 — so an
oracle emitting HUGEINT produces ``1.0`` where Spark produces ``1`` and the
hash mismatches even though the native-Python ``fetchall()`` values would
compare equal.  Two rounds of "local green, driver red" (r1: unhashable
array cells; r2: HUGEINT floats) came from this seam; do not switch back
to ``fetchall()``.

A second engine seam (r3): engine ROUND() is NOT portable on doubles.
DuckDB rounds the shortest decimal repr (3.8522499999999997 prints as
"3.85225" and rounds half-up to 3.8523) while Spark/Python round the
binary value (3.8522).  When both engines compute bit-identical raw
doubles, emit them UNROUNDED and let this script's canonicalization
round both sides the same way; only round in-SQL when the raw values
genuinely differ beyond 6 dp (ln/exp 1-ulp wobble), where the boundary
coincidence is overwhelmingly unlikely.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "1" if v else "0"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, float):  # covers np.floating (float64 subclasses float)
        if math.isnan(v):
            return "nan"
        return repr(round(v, 6))
    if isinstance(v, Decimal):
        return repr(round(float(v), 6))
    if isinstance(v, (list, tuple, np.ndarray)):  # before v != v: elementwise
        return "[" + ",".join(canon(x) for x in v) + "]"
    if v != v:  # pandas NaT (a datetime subclass!) and other NA sentinels —
        return "NULL"  # must precede the datetime branch: NaT.strftime raises
    if isinstance(v, datetime):  # covers pd.Timestamp
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    return str(v)


def pandas_rows(pdf):
    """(cols, rows) from a pandas frame — the driver-equivalent fetch path."""
    cols = [str(c) for c in pdf.columns]
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    return cols, rows


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # Spark's JVM shares the stdout fd and can clobber buffered Python
    # output when both are redirected to one file — mirror every result
    # line to a dedicated report file.
    report_path = os.environ.get("CHECK_ORACLE_REPORT", "/tmp/check_oracle_report.txt")
    report = open(report_path, "w")

    def emit(line: str) -> None:
        print(line, flush=True)
        report.write(line + "\n")
        report.flush()

    import __spark_entry__ as mod
    from clickhouse_sinker_nali_spark.session import get_spark

    # the gate COLLECTS full results; pair-list queries over replica-heavy
    # corpora (sf1 dedup_simhash: ~12M genuine near-dup rows) exceed the
    # 1g default — at production scale these outputs are written, not
    # collected, so the ceiling is a checker artifact
    spark = get_spark(
        "oracle-check", extra_conf={"spark.driver.maxResultSize": "16g"}
    )
    con = duckdb.connect()
    # At smoke scales (data/sf10) DuckDB's default ~80%-of-RAM limit plus
    # the 48g Spark JVM oversubscribes the host (one sf10 doc_pagerank
    # oracle was OOM-killed at 78 GB RSS); cap it and give it a real spill
    # directory so heavy oracles degrade to disk instead of dying.
    mem = os.environ.get("CHECK_ORACLE_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("CHECK_ORACLE_DUCKDB_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        # driver testdata is one file per table; the sf1/sf10 smoke corpora
        # are Spark-written directories — glob those for DuckDB
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            # partial corpora are legitimate (data/sf10 scales only the
            # heavy-family tables); queries over absent tables just fail
            # loudly if selected
            continue
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            scols, srows = pandas_rows(df.toPandas())
        except Exception as e:
            emit(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            emit(f"weak  {name}: rows={len(srows)} (no oracle, rows-only check)")
            continue
        try:
            ocols, orows = pandas_rows(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            emit(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        else:
            sh = value_hash(scols, srows)
            oh = value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"value hash {sh} != {oh}")
        if problems:
            emit(f"FAIL  {name}: {'; '.join(problems)}")
            failed.append(name)
            # dump a few rows to debug
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i]) if sorted(scols) == sorted(ocols) else None
            s_lines = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
            if order_o is not None:
                o_lines = sorted("|".join(canon(r[i]) for i in order_o) for r in orows)
                diffs = [(a, b) for a, b in zip(s_lines, o_lines) if a != b]
                for a, b in diffs[:40]:
                    emit(f"      spark : {a}\n      duckdb: {b}")
        else:
            emit(f"ok    {name}: rows={len(srows)}")
    emit(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
