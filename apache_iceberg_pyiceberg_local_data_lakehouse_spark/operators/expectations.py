"""Declarative data-quality expectations (the Deequ / Great
Expectations pattern): a suite of named checks evaluated in ONE pass
over the data - every check compiles to an aggregate expression, so N
checks cost one scan + one reduce regardless of N, and the result is a
small frame suitable for gating a pipeline or appending to an ops
table.

Checks (each returns (metric, passed)):

- ``completeness(col, min_ratio)``: non-null fraction >= threshold;
- ``uniqueness(col)``: no duplicate values (distinct == count);
- ``between(col, lo, hi)``: every non-null value inside [lo, hi];
- ``matches(col, regex, min_ratio)``: fraction of non-null values
  matching >= threshold;
- ``in_set(col, values)``: every non-null value in the allow-list;
- ``size(min_rows, max_rows)``: row count inside bounds.

Composes with the table format's CHECK constraints: constraints gate
WRITES row-by-row; expectations AUDIT a dataset wholesale with
ratio-based tolerances (a 0.1% null rate can be acceptable where a
constraint would reject the batch).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    metric: Column  # double-valued measurement
    passed: Column  # boolean over the metric


def completeness(col: str, min_ratio: float = 1.0) -> Check:
    m = F.avg(F.col(col).isNotNull().cast("double"))
    return Check(f"completeness({col})", m, m >= F.lit(min_ratio))


def uniqueness(col: str) -> Check:
    # try_divide: ANSI mode raises on 0/0 for an empty/all-NULL column;
    # NULL here is the vacuous-pass signal run_checks expects
    m = F.try_divide(
        F.countDistinct(col).cast("double"), F.count(col).cast("double")
    )
    return Check(f"uniqueness({col})", m, m >= F.lit(1.0))


def between(col: str, lo, hi) -> Check:
    bad = F.sum(
        (
            F.col(col).isNotNull()
            & ~F.col(col).between(F.lit(lo), F.lit(hi))
        ).cast("long")
    )
    return Check(f"between({col})", bad.cast("double"), bad == F.lit(0))


def matches(col: str, regex: str, min_ratio: float = 1.0) -> Check:
    m = F.avg(
        F.when(
            F.col(col).isNotNull(),
            F.col(col).rlike(regex).cast("double"),
        )
    )
    return Check(f"matches({col})", m, m >= F.lit(min_ratio))


def in_set(col: str, values: list[Any]) -> Check:
    bad = F.sum(
        (F.col(col).isNotNull() & ~F.col(col).isin(values)).cast("long")
    )
    return Check(f"in_set({col})", bad.cast("double"), bad == F.lit(0))


def size(min_rows: int = 0, max_rows: int | None = None) -> Check:
    n = F.count(F.lit(1))
    ok = n >= F.lit(min_rows)
    if max_rows is not None:
        ok = ok & (n <= F.lit(max_rows))
    return Check("size", n.cast("double"), ok)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in one aggregate pass; returns one row per
    check: (check, metric, passed). The whole suite is a single job.

    NULL metrics (nothing to measure: an empty frame, an all-NULL
    column) are VACUOUSLY TRUE with a NULL metric - Deequ's semantics:
    'no value violated the check' is a pass, not 0% compliance. A
    suite that must also reject emptiness adds an explicit
    ``size(min_rows=...)`` check (count is never NULL)."""
    if not checks:
        raise ValueError("run_checks: empty suite")
    row = df.agg(
        *[c.metric.alias(f"__m{i}") for i, c in enumerate(checks)],
        *[c.passed.alias(f"__p{i}") for i, c in enumerate(checks)],
    ).first()
    spark = df.sparkSession
    rows = []
    for i, c in enumerate(checks):
        m, p = row[f"__m{i}"], row[f"__p{i}"]
        rows.append(
            (
                c.name,
                float(m) if m is not None else None,
                bool(p) if p is not None else True,
            )
        )
    return spark.createDataFrame(
        rows, "check string, metric double, passed boolean"
    )
