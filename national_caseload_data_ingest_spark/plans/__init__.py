"""Physical-plan inspection helpers.

The engine's performance contract is expressed as assertions over Catalyst
physical plans — filters reach the parquet scan, dims broadcast, top-k
never globally sorts, nothing silently degrades to a cartesian product.
``tests/test_plans.py`` enforces these on the operator catalog; the same
helpers are available to users tuning their own queries.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Full formatted physical plan (untruncated scan details)."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` group found in the plan's scans."""
    plan = physical_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """Every scan's ``ReadSchema`` — checks column pruning."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: ([^\n]*)", plan)


def join_kinds(df: DataFrame) -> list[str]:
    """Physical join operator names appearing in the plan."""
    plan = physical_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    return len(shuffle_exchanges(df))


def shuffle_exchanges(df: DataFrame) -> list[str]:
    """One entry per shuffle exchange operator.

    Formatted explain prints every operator twice (tree + numbered detail
    section), so count only the numbered detail headers.
    """
    plan = physical_plan(df)
    return [
        ln.strip()
        for ln in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange\b", ln.strip())
    ]


def assert_no_cartesian(df: DataFrame) -> None:
    kinds = join_kinds(df)
    assert "CartesianProduct" not in kinds, f"cartesian product in plan: {kinds}"
