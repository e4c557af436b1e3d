"""Temporal join operators (SURVEY.md §2.3 gap-fill: the reference's
domain is tick time-series, where as-of and interval joins are the
bread-and-butter operations its PyArrow pipeline never got to).

Spark has no ASOF JOIN operator; these are compositions of built-ins
chosen for their shuffle behavior:

- ``asof_join``: union both sides, one window pass per key
  (last non-null carry-forward). ONE shuffle on the key - strictly
  better than the naive inequality join (BNLJ) and than per-key
  ``mapInPandas`` (no Python). This is the classic
  union-sort-carry-forward formulation.
- ``interval_join``: equality join on coarse time buckets + exact
  range filter. The bucket trick turns an inequality join (which Spark
  plans as broadcast-nested-loop) into a hash join with bounded
  per-bucket fan-out; correct because every interval of width <= bucket
  overlaps at most 2 adjacent buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``by`` group (ties: the right
    row at the exact same timestamp matches).

    Plan: tag sides, union, window per key ordered by (ts, side) with
    ``last(value, ignorenulls=True)`` carry-forward, keep left rows.
    One shuffle on ``by``; both sides stream through one sort."""
    l_tag = left.select(
        F.col(by),
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    r_tag = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__cf_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__side") == 1)
    out_cols = [F.col(f"__row.{c}").alias(c) for c in left.columns] + [
        F.col(f"__cf_{c}").alias(f"{c}{suffix}") for c in value_cols
    ]
    return carried.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    lower_expr,
    upper_expr,
    bucket_secs: int,
    by: str | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Join left rows to right rows whose ``ts`` falls in
    ``[left.ts + lower, left.ts + upper]`` (bounds as second offsets).

    The left side explodes to every bucket its interval touches; the
    right side keys by its own bucket - so the join is EQUALITY on
    (bucket [, by]) followed by the exact range filter. Requires
    ``upper - lower <= bucket_secs`` for the 2-bucket bound; wider
    intervals explode to more buckets automatically."""
    lo, hi = float(lower_expr), float(upper_expr)
    n_buckets = int((hi - lo) // bucket_secs) + 2

    l_ts = F.unix_micros(F.col(ts_col))
    start_bucket = F.floor((l_ts + F.lit(int(lo * 1e6))) / F.lit(int(bucket_secs * 1e6)))
    l_exp = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        l_ts.alias("__lts"),
        F.explode(
            F.sequence(start_bucket, start_bucket + F.lit(n_buckets - 1))
        ).alias("__bucket"),
        *([F.col(by).alias("__by")] if by else []),
    )
    r_ts = F.unix_micros(F.col(ts_col))
    r_keyed = right.select(
        F.struct(*[F.col(c) for c in right.columns]).alias("__r"),
        r_ts.alias("__rts"),
        F.floor(r_ts / F.lit(int(bucket_secs * 1e6))).alias("__bucket"),
        *([F.col(by).alias("__by")] if by else []),
    )
    on = ["__bucket"] + (["__by"] if by else [])
    joined = l_exp.join(r_keyed, on=on).filter(
        (F.col("__rts") >= F.col("__lts") + F.lit(int(lo * 1e6)))
        & (F.col("__rts") <= F.col("__lts") + F.lit(int(hi * 1e6)))
    )
    left_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    right_cols = [F.col(f"__r.{c}").alias(f"{right_prefix}{c}") for c in right.columns]
    # no dedup needed: the right side carries exactly one bucket per row,
    # so each qualifying (left, right) pair joins exactly once
    return joined.select(*left_cols, *right_cols)


def point_in_range_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_secs: int,
    by: str | None = None,
    point_prefix: str = "p_",
) -> DataFrame:
    """Join each interval row to every point row whose ``ts`` falls in
    ``[start, end]`` - the symmetric sibling of ``interval_join`` for
    VARIABLE-width intervals (sessions, activity spans) instead of a
    fixed offset window around a point.

    Each interval explodes to every ``bucket_secs``-wide bucket it
    spans (``sequence(floor(start/B), floor(end/B))``); each point
    carries exactly one bucket. The join is therefore EQUALITY on
    (bucket [, by]) followed by the exact BETWEEN filter - a hash join
    with per-bucket fan-out, never a broadcast-nested-loop - and each
    qualifying (interval, point) pair joins exactly once, so no dedup
    pass is needed. Pick ``bucket_secs`` near the typical interval
    width: wider intervals just explode to more buckets."""
    bucket_us = int(bucket_secs * 1e6)
    s_us = F.unix_micros(F.col(start_col))
    e_us = F.unix_micros(F.col(end_col))
    i_exp = intervals.select(
        F.struct(*[F.col(c) for c in intervals.columns]).alias("__i"),
        s_us.alias("__s"),
        e_us.alias("__e"),
        F.explode(
            F.sequence(
                F.floor(s_us / F.lit(bucket_us)), F.floor(e_us / F.lit(bucket_us))
            )
        ).alias("__bucket"),
        *([F.col(by).alias("__by")] if by else []),
    )
    p_ts = F.unix_micros(F.col(ts_col))
    p_keyed = points.select(
        F.struct(*[F.col(c) for c in points.columns]).alias("__p"),
        p_ts.alias("__pts"),
        F.floor(p_ts / F.lit(bucket_us)).alias("__bucket"),
        *([F.col(by).alias("__by")] if by else []),
    )
    on = ["__bucket"] + (["__by"] if by else [])
    joined = i_exp.join(p_keyed, on=on).filter(
        (F.col("__pts") >= F.col("__s")) & (F.col("__pts") <= F.col("__e"))
    )
    return joined.select(
        *[F.col(f"__i.{c}").alias(c) for c in intervals.columns],
        *[F.col(f"__p.{c}").alias(f"{point_prefix}{c}") for c in points.columns],
    )
