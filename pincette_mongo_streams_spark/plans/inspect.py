"""Helpers to assert physical-plan properties in tests and benchmarks."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the formatted plan (empty string if the
    scan has none) — used to assert $match predicates reach parquet."""
    text = explain_str(df)
    return "\n".join(line for line in text.splitlines() if "PushedFilters" in line)


def has_broadcast(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_python_eval(df: DataFrame) -> bool:
    """True when any Python-eval node is in the physical plan — the
    SCALE.md invariant-1 check (only $http/$decodeMedia may trip it)."""
    plan = executed_plan(df)
    return any(
        m in plan
        for m in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                  "FlatMapGroupsInPandas")
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan (broadcast
    exchanges excluded) — the thing to minimize at 100 TB."""
    plan = executed_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
