"""Degenerate-corpus sweep: run every registered query against an EMPTY
corpus and a ONE-ROW corpus and report crashes.

At 100 TB an empty input is not hypothetical: an incremental run whose
date filter matches nothing, a new tenant with no history, a partition
left empty by an upstream filter.  Every operator must return a
well-typed (possibly empty) result, not raise — driver-side
``collect()[0]``, ``first()``-is-None, zero-group caps and empty
vocabulary probes are exactly the class of bug the sf gates never
exercise.

Usage: python scripts/degenerate_sweep.py [empty|onerow|both] [only...]
Writes corpora under data/degenerate/ (gitignored) and prints one line
per query: ok/FAIL + row count.  Exit code = number of failures.
"""

from __future__ import annotations

import os
import sys
import traceback

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.001"
DST_ROOT = "/root/repo/data/degenerate"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build(kind: str) -> str:
    dst = f"{DST_ROOT}/{kind}"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        out = tbl.slice(0, 0) if kind == "empty" else tbl.slice(0, 1)
        pq.write_table(out, f"{dst}/{t}.parquet")
    return dst


def main() -> None:
    kinds = ["empty", "onerow"]
    args = sys.argv[1:]
    if args and args[0] in ("empty", "onerow", "both"):
        if args[0] != "both":
            kinds = [args[0]]
        args = args[1:]
    only = set(args)

    import __spark_entry__ as mod
    from clickhouse_sinker_nali_spark.session import get_spark

    spark = get_spark("degenerate-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()
    failures: list[str] = []
    for kind in kinds:
        sf_dir = build(kind)
        for name, fn in qs.items():
            if only and name not in only:
                continue
            try:
                df = fn(spark, sf_dir)
                n = df.count()
                print(f"ok    {kind:6s} {name}: rows={n}", flush=True)
            except Exception:
                print(f"FAIL  {kind:6s} {name}", flush=True)
                traceback.print_exc(limit=6)
                failures.append(f"{kind}:{name}")
    print(f"{len(failures)} failures: {failures}")
    sys.exit(min(len(failures), 120))


if __name__ == "__main__":
    main()
