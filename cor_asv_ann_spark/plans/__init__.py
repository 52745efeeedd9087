"""Plan-inspection helpers: capture .explain output programmatically,
assert plan properties in tests (exchange counts, broadcast joins,
pushed filters)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def count_exchanges(plan: str) -> int:
    """Wide shuffles in the physical plan (excludes broadcast exchanges
    and AQE reuse nodes)."""
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(")
        and " Exchange" in line
        and "Broadcast" not in line
        and "Reused" not in line
    ) + sum(
        1
        for line in plan.splitlines()
        if line.lstrip(" :+-").startswith("Exchange (")
    )


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(plan: str) -> list[str]:
    return [l.strip() for l in plan.splitlines() if "PushedFilters" in l]
