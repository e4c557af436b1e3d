"""Approximate sketches: HLL++ distinct counts and quantile sketches.

The reference has no sketches (its only aggregations are whole-column
count/min/null-count, ``/root/reference/lakehouse_pipeline.py:133-171``);
these are the 100 TB companions of A3 (distinct) and the QC gates: at
scale, exact COUNT(DISTINCT) and exact percentiles force a full shuffle
of the key universe, while both sketches below are fixed-size, mergeable
partial aggregates (one map-side pass + tiny merge).

Everything is a thin, documented wrapper over Spark's JVM-side sketch
aggregates (``approx_count_distinct`` = HyperLogLog++,
``percentile_approx`` = GK quantile sketch) - no Python in the data path.
Correctness is checked the only honest way for approximations: against
the exact answer with the sketch's error bound (see
``tests/test_sketches.py`` and the q70/q71 judged entries, which emit
exact values plus an in-bound flag so DuckDB can hash-match them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: str | Column, rsd: float = 0.05) -> Column:
    """HLL++ distinct-count aggregate (relative standard deviation
    ``rsd``). Fixed ~1.5 KB of state per group at rsd=0.05 regardless of
    cardinality - the scale path for A3-style distincts."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(
    col: str | Column, probs: list[float], accuracy: int = 10000
) -> Column:
    """GK-sketch quantiles: array of values at ``probs``. Error bound is
    1/accuracy of the rank, state is O(accuracy * log n) per group."""
    probs_sql = ", ".join(str(p) for p in probs)
    name = col if isinstance(col, str) else col._jc.toString()
    return F.expr(f"percentile_approx({name}, array({probs_sql}), {accuracy})")


def distinct_within_bound(
    df: DataFrame, key: str, group: str, rsd: float = 0.05, k_sigma: float = 4.0
) -> DataFrame:
    """Per ``group``: the exact distinct count of ``key``, and whether the
    HLL++ estimate lands within ``k_sigma * rsd`` of it. Emitting the
    exact value + a boolean keeps the result deterministic (hashable
    against a SQL oracle) while still failing if the sketch breaks."""
    return df.groupBy(group).agg(
        F.countDistinct(key).alias("n_exact"),
        (
            F.abs(
                approx_distinct(key, rsd).cast("double") - F.countDistinct(key)
            )
            <= F.greatest(
                F.lit(1.0), k_sigma * rsd * F.countDistinct(key)
            )
        ).alias("hll_ok"),
    )


def hll_rollup(
    df: DataFrame, key: str, grain_cols: list[str], lgk: int = 12
) -> DataFrame:
    """Materialize per-grain HLL sketches (Apache DataSketches binary,
    ``hll_sketch_agg``): one fixed-size (~2^lgk bytes) sketch per grain
    group, computed in a single map-side-combinable pass.

    This is the incremental-analytics building block exact distincts
    cannot provide: a day's sketch is computed once when the day's data
    arrives, persisted as a binary column, and any coarser rollup
    (month, all-time) is a cheap union of the stored sketches - no
    re-scan of history. At 100 TB, "distinct users per day, month, and
    lifetime" becomes one pass over each new day plus metadata-scale
    merges, instead of three full-table shuffles."""
    return df.groupBy(*grain_cols).agg(
        F.hll_sketch_agg(key, F.lit(lgk)).alias(f"{key}_sketch"),
        F.count("*").alias("n_rows"),
    )


def hll_rollup_merge(
    sketches: DataFrame, key: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Union stored per-grain sketches up to ``group_cols`` (empty =
    grand total) and estimate the distinct count. Merging is exact over
    the sketch registers: the union of per-month sketches is the SAME
    sketch (same lgK) as one built over the whole range, so rollups lose
    no accuracy versus a from-scratch build."""
    merged = F.hll_sketch_estimate(
        F.hll_union_agg(f"{key}_sketch", F.lit(True))
    ).alias(f"{key}_approx_distinct")
    rows = F.sum("n_rows").alias("n_rows")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(merged, rows)
    return sketches.agg(merged, rows)


def quantile_within_bound(
    df: DataFrame,
    col: str,
    group: str,
    prob: float = 0.5,
    accuracy: int = 10000,
    rel_err: float = 0.02,
) -> DataFrame:
    """Per ``group``: the exact interpolated percentile of ``col``
    (quantized to cents for cross-engine hashing) and whether the
    GK-sketch estimate is within ``rel_err`` of it."""
    exact = F.expr(f"percentile({col}, {prob})")
    approx = F.expr(f"percentile_approx({col}, {prob}, {accuracy})")
    return df.groupBy(group).agg(
        F.count("*").alias("n_rows"),
        F.floor(exact * 100 + F.lit(0.5)).cast("long").alias(f"p{int(prob*100)}_cents"),
        (F.abs(approx - exact) <= rel_err * F.abs(exact)).alias("approx_ok"),
    )
