"""Physical-plan inspection helpers (SURVEY.md §4 discipline).

The optimizer work in this engine is *verifying Catalyst did its job*,
not replacing it: filters reach the parquet scan (PushedFilters), column
pruning reaches ReadSchema, small dimensions broadcast, codegen spans the
hot operators. These helpers turn ``.explain`` output into assertions so
plan quality is pinned by tests instead of eyeballs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, "no pushed filters in plan:\n" + plan
    assert fragment in plan, f"filter {fragment!r} not pushed:\n" + plan


def assert_reads_only_columns(df: DataFrame, columns: set[str]) -> None:
    """ReadSchema of every parquet scan must be a subset of ``columns``."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema_part = line.split("ReadSchema:", 1)[1]
            read_cols = {
                c.split(":")[0].strip()
                for c in schema_part.strip(" struct<>").split(",")
                if c.strip()
            }
            extra = read_cols - columns
            assert not extra, f"scan reads extra columns {extra}:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join:\n" + plan
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, "cartesian product in plan:\n" + plan


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees. Uses explain mode
    'codegen' because AQE hides codegen boundaries from the formatted
    plan until execution."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    import re

    m = re.search(r"Found (\d+) WholeStageCodegen", plan)
    return int(m.group(1)) if m else 0
