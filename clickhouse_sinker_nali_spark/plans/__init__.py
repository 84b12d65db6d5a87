"""Physical-plan inspection: assert the plan you meant, not just the result.

A correct answer from a bad plan (full scan instead of pushdown, shuffle
join instead of broadcast, codegen fenced off by an opaque expression) is a
latent 100×-at-scale regression.  These helpers make plan shape testable so
the suite fails when a refactor silently degrades the physical strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str = "") -> bool:
    """True when the parquet scan carries PushedFilters (optionally matching
    ``fragment``)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "[]" not in line.replace(" ", ""):
            if not fragment or fragment in line:
                return True
    return False


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (column pruning)."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema"):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols = {c.split(":")[0].strip() for c in inner.split(",") if ":" in c}
            out.append(cols)
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of ALGORITHMIC shuffle exchanges in the physical plan.

    Excluded: broadcast exchanges, and the historical r5 scan-rebalance
    marker (``RoundRobinPartitioning`` + ``REPARTITION_BY_NUM``) — since
    r6 load_table repairs under-split inputs with a materialized on-disk
    layout instead, so no plan emits that node anymore; the exclusion
    stays because no operator emits a bare round-robin repartition
    (they partition by key or range), making the marker unambiguous if
    it ever reappears.
    """
    plan = formatted_plan(df)
    n = sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(")
        and " Exchange" in line
        and "BroadcastExchange" not in line
    )
    rebalances = sum(
        1
        for line in plan.splitlines()
        if "RoundRobinPartitioning" in line and "REPARTITION_BY_NUM" in line
    )
    return n - rebalances


def uses_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True when the plan contains whole-stage-codegen'd operators.

    Under AQE the codegen annotations ("[codegen id : N]") only appear once
    the adaptive plan is finalized, so this executes the query first.
    """
    df.collect()
    plan = formatted_plan(df)
    return "codegen id" in plan or "WholeStageCodegen" in plan


def partial_aggregation_present(df: DataFrame) -> bool:
    """Map-side combine: a partial_ aggregate before the exchange."""
    return "partial_" in formatted_plan(df)
