"""Physical-plan inspection helpers: assert that the plans we ship are the
plans we want — filters pushed to the parquet scan, small dims broadcast,
expressions inside whole-stage codegen. Used by tests/test_plans.py and by
hand during operator development (`.explain("formatted")` then iterate)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a data-source pushed filter mentions ``fragment``."""
    plan = formatted_plan(df)
    return any(
        fragment.lower() in line.lower()
        for line in plan.splitlines()
        if "pushedfilters" in line.lower()
    )


def reads_only_columns(df: DataFrame, table_cols: set[str], expected: set[str]) -> bool:
    """True if the scan's ReadSchema prunes to (a subset of) ``expected``."""
    plan = formatted_plan(df)
    read = set()
    for line in plan.splitlines():
        if "ReadSchema" in line:
            for col in table_cols:
                if col in line:
                    read.add(col)
    return bool(read) and read <= expected


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
