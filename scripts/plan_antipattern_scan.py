"""Registry-wide physical-plan anti-pattern scan.

Builds (does not execute) every registered query's plan at sf0.001 and
reports queries whose executed plan contains a scale anti-pattern:

- ``CartesianProduct``  — an unconditional cross join (O(N·M) at 100 TB)
- ``RoundRobinPartitioning`` — a blind ``repartition(n)`` (full reshuffle
  that AQE can neither prune nor skew-split)

BroadcastNestedLoopJoin is NOT flagged: the repo's only instances carry a
1-row broadcast side (PageRank's dangling-mass scalar, asof fallbacks),
which is a constant-size replicate, not a quadratic.

Usage: python scripts/plan_antipattern_scan.py [sf_dir]
Prints one line per offender; exit code = offender count.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

MARKERS = ("CartesianProduct", "RoundRobinPartitioning")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as mod
    from clickhouse_sinker_nali_spark.plans import formatted_plan
    from clickhouse_sinker_nali_spark.session import get_spark

    spark = get_spark("plan-scan")
    spark.sparkContext.setLogLevel("ERROR")
    offenders: list[str] = []
    for name, fn in mod.queries().items():
        try:
            plan = formatted_plan(fn(spark, sf_dir))
        except Exception as e:  # plan construction itself failing is news too
            print(f"ERR   {name}: {e}", flush=True)
            offenders.append(f"{name}:build-error")
            continue
        hits = [m for m in MARKERS if m in plan]
        if hits:
            print(f"BAD   {name}: {', '.join(hits)}", flush=True)
            offenders.append(f"{name}:{'+'.join(hits)}")
        else:
            print(f"ok    {name}", flush=True)
    print(f"{len(offenders)} offenders: {offenders}")
    sys.exit(min(len(offenders), 120))


if __name__ == "__main__":
    main()
