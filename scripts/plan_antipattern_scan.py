"""Registry-wide physical-plan anti-pattern scan.

Builds (does not execute) every registered query's plan at sf0.001 and
reports queries whose plan contains a scale anti-pattern:

- ``CartesianProduct``  — an unconditional cross join (O(N·M) at 100 TB)
- ``RoundRobinPartitioning`` — a blind ``repartition(n)`` (full reshuffle
  that AQE can neither prune nor skew-split)
- ``unpartitioned-window`` — a logical Window with an EMPTY partitionSpec
  (WindowExec moves the ENTIRE input to one partition; the r7 verdict's
  last scale seam).  Detected on the OPTIMIZED LOGICAL plan so a
  constant-folded ``partitionBy(lit(0))`` cannot slip through.  Windows
  over provably-bounded inputs are allowlisted BY QUERY NAME below, each
  with the bound asserted in its justification.

BroadcastNestedLoopJoin is NOT flagged: the repo's only instances carry a
1-row broadcast side (PageRank's dangling-mass scalar, asof fallbacks),
which is a constant-size replicate, not a quadratic.

Usage: python scripts/plan_antipattern_scan.py [sf_dir] [only ...]
Prints one line per offender; exit code = offender count.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

MARKERS = ("CartesianProduct", "RoundRobinPartitioning")

# Queries allowed to keep an unpartitioned window because its input is
# BOUNDED by construction (a value-range histogram / calendar / charset /
# alphabet-squared relation — never corpus-sized).  Every entry asserts
# the bound; an entry without a real bound is a bug, not an exemption.
UNPARTITIONED_WINDOW_ALLOWLIST: dict[str, str] = {
    # cumulative distribution over the LSH bucket-size HISTOGRAM: one row
    # per distinct bucket size (≤ max bucket size, a few hundred values),
    # not per bucket and not per doc
    "lsh_bucket_stats": "rows = distinct bucket sizes (value-range bound)",
    # rolling rank over ISO weeks: one row per calendar week in the data's
    # date range (52/year)
    "rolling_7day_revenue": "rows = calendar weeks (time-range bound)",
    # character ranking over the corpus CHARSET: one row per distinct
    # codepoint (≤ Unicode space, in practice a few thousand)
    "char_coverage": "rows = distinct codepoints (charset bound)",
    # LOCF runs over the DAILY calendar spine (docstring asserts the
    # bound: ≤ tens of thousands of rows for decades of days)
    "gapfill_daily_locf": "rows = calendar days (time-range bound)",
    # two-phase distributed prefix sum: the only unpartitioned window is
    # the running offset over the PER-BUCKET totals table (corpus /
    # PACK_BUCKET_WIDTH rows of two longs; recurse the same construction
    # for another /W factor if that ever grows past one task)
    "sequence_pack": "rows = corpus/PACK_BUCKET_WIDTH bucket totals",
}


def unpartitioned_windows(df) -> int:
    """Count Window nodes with an empty partitionSpec in the OPTIMIZED
    logical plan (the exact condition WindowExec warns about at run time,
    checked after constant folding so literal partition keys don't hide
    it)."""
    n = 0
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Window":
            if node.partitionSpec().isEmpty():
                n += 1
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as mod
    from clickhouse_sinker_nali_spark.plans import formatted_plan
    from clickhouse_sinker_nali_spark.session import get_spark

    spark = get_spark("plan-scan")
    spark.sparkContext.setLogLevel("ERROR")
    offenders: list[str] = []
    for name, fn in mod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
            n_upw = unpartitioned_windows(df)
        except Exception as e:  # plan construction itself failing is news too
            print(f"ERR   {name}: {e}", flush=True)
            offenders.append(f"{name}:build-error")
            continue
        hits = [m for m in MARKERS if m in plan]
        if n_upw:
            if name in UNPARTITIONED_WINDOW_ALLOWLIST:
                print(
                    f"allow {name}: {n_upw} unpartitioned window(s) — "
                    f"{UNPARTITIONED_WINDOW_ALLOWLIST[name]}",
                    flush=True,
                )
            else:
                hits.append(f"unpartitioned-window×{n_upw}")
        if hits:
            print(f"BAD   {name}: {', '.join(hits)}", flush=True)
            offenders.append(f"{name}:{'+'.join(hits)}")
        else:
            print(f"ok    {name}", flush=True)
    print(f"{len(offenders)} offenders: {offenders}")
    sys.exit(min(len(offenders), 120))


if __name__ == "__main__":
    main()
