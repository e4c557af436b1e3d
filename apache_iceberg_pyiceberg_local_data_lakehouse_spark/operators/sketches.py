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


# -- Theta sketches: distinct-count SET ALGEBRA (union/intersect/diff) --
#
# HLL unions but cannot intersect; Theta sketches (Apache DataSketches,
# JVM-side in Spark 4: theta_sketch_agg / theta_union /
# theta_intersection / theta_difference) keep a hash SAMPLE of the key
# universe, so any set expression over corpora gets a fixed-size,
# mergeable estimate. This is the 100 TB path for audience overlap and
# train/test corpus contamination ("how many of corpus B's documents
# are in corpus A?") where the exact answer is a multi-TB distinct-join:
# each corpus is sketched in ONE map-side-combinable pass (a few KB per
# sketch), and every overlap statistic after that is metadata-scale.
# Below 2^lgk distinct keys the sketch is in exact mode - estimates are
# EXACT at test scale and error-bounded (RSE ~ 1/sqrt(2^lgk)) beyond.


def theta_rollup(
    df: DataFrame, key: str, grain_cols: list[str], lgk: int = 12
) -> DataFrame:
    """Materialize one Theta sketch of ``key`` per grain group (the
    ``hll_rollup`` twin). Persist the binary column once per grain;
    coarser rollups and cross-corpus set ops never re-scan the data."""
    return df.groupBy(*grain_cols).agg(
        F.expr(f"theta_sketch_agg({key}, {int(lgk)})").alias(
            f"{key}_theta"
        ),
        F.count("*").alias("n_rows"),
    )


def theta_rollup_merge(
    sketches: DataFrame, key: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Union stored per-grain Theta sketches up to ``group_cols`` (empty
    = grand total) and estimate the distinct count."""
    merged = F.expr(
        f"theta_sketch_estimate(theta_union_agg({key}_theta))"
    ).alias(f"{key}_approx_distinct")
    rows = F.sum("n_rows").alias("n_rows")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(merged, rows)
    return sketches.agg(merged, rows)


def corpus_overlap(
    df_a: DataFrame, df_b: DataFrame, key: str, lgk: int = 12
) -> DataFrame:
    """One-row estimate of |A|, |B|, |A∪B|, |A∩B|, |A\\B| over the
    distinct ``key`` sets of two corpora. Each side aggregates to a
    single sketch (map-side combinable); the crossJoin is one row by
    one row, so the set algebra itself is driver-trivial."""
    lg = int(lgk)
    a = df_a.agg(
        F.expr(f"theta_sketch_agg({key}, {lg})").alias("__sk_a")
    )
    b = df_b.agg(
        F.expr(f"theta_sketch_agg({key}, {lg})").alias("__sk_b")
    )
    return a.crossJoin(b).selectExpr(
        "theta_sketch_estimate(__sk_a) AS n_a",
        "theta_sketch_estimate(__sk_b) AS n_b",
        "theta_sketch_estimate(theta_union(__sk_a, __sk_b)) AS n_union",
        "theta_sketch_estimate(theta_intersection(__sk_a, __sk_b))"
        " AS n_intersect",
        "theta_sketch_estimate(theta_difference(__sk_a, __sk_b))"
        " AS n_only_a",
    )


def overlap_within_bound(
    df_a: DataFrame,
    df_b: DataFrame,
    key: str,
    lgk: int = 12,
    k_sigma: float = 4.0,
) -> DataFrame:
    """Judgeable form of :func:`corpus_overlap`: the EXACT distinct
    counts and set sizes (computable by plain SQL - the exact side is
    the correctness oracle device, not the scale path) plus one boolean
    asserting every Theta estimate landed within ``k_sigma`` of its
    error bound (union-size-relative for intersection/difference, the
    standard Theta a-priori bound ~ n/sqrt(2^lgk) otherwise; below
    2^lgk distinct keys the sketch is exact and the bound is 1)."""
    k_col = F.col(key).alias("k")
    a_keys = df_a.select(k_col).where(F.col("k").isNotNull()).distinct()
    b_keys = df_b.select(k_col).where(F.col("k").isNotNull()).distinct()
    exact = (
        a_keys.withColumn("__a", F.lit(1))
        .join(b_keys.withColumn("__b", F.lit(1)), "k", "full_outer")
        .agg(
            F.count(F.col("__a")).alias("n_a"),
            F.count(F.col("__b")).alias("n_b"),
            F.count(F.lit(1)).alias("n_union"),
            # SUM over zero join rows (an empty side) is NULL, but the
            # exact intersection of anything with the empty set is 0 -
            # and a NULL here would poison theta_ok into NULL too
            F.coalesce(
                F.sum(
                    (
                        F.col("__a").isNotNull()
                        & F.col("__b").isNotNull()
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("n_intersect"),
        )
    )
    est = corpus_overlap(df_a, df_b, key, lgk=lgk)
    rse = k_sigma / float(2 ** (int(lgk) / 2.0))

    def ok(est_col: str, exact_col: str, scale_col: str):
        return F.abs(
            F.col(f"__e_{est_col}").cast("double") - F.col(exact_col)
        ) <= F.greatest(F.lit(1.0), F.lit(rse) * F.col(scale_col))

    est = est.select(
        *[
            F.col(c).alias(f"__e_{c}")
            for c in ("n_a", "n_b", "n_union", "n_intersect", "n_only_a")
        ]
    )
    return (
        exact.crossJoin(est)
        .withColumn(
            "theta_ok",
            ok("n_a", "n_a", "n_a")
            & ok("n_b", "n_b", "n_b")
            & ok("n_union", "n_union", "n_union")
            & ok("n_intersect", "n_intersect", "n_union")
            # n_only_a's exact value is n_a - n_intersect
            & (
                F.abs(
                    F.col("__e_n_only_a").cast("double")
                    - (F.col("n_a") - F.col("n_intersect"))
                )
                <= F.greatest(
                    F.lit(1.0), F.lit(rse) * F.col("n_union")
                )
            ),
        )
        .select("n_a", "n_b", "n_union", "n_intersect", "theta_ok")
    )


# -- KLL quantile sketches: MERGEABLE percentiles -----------------------
#
# percentile_approx (GK) answers one query over one pass; KLL sketches
# (kll_sketch_agg_double & friends) are BINARY, STORED, and MERGEABLE
# with provable rank error (~1.65% at k=200): build per-day sketches
# once, persist them, and answer "median over any date range" by
# merging a handful of KB-sized blobs - the quantile twin of
# hll_rollup/theta_rollup. At 100 TB, re-scanning history for every
# percentile window is the bottleneck these remove.


def kll_rollup(
    df: DataFrame, col: str, grain_cols: list[str], k: int = 200
) -> DataFrame:
    """One KLL(double) sketch of ``col`` per grain group plus the grain
    row count; fixed O(k log n) bytes per group, map-side combinable."""
    return df.groupBy(*grain_cols).agg(
        F.expr(f"kll_sketch_agg_double({col}, {int(k)})").alias(
            f"{col}_kll"
        ),
        F.count(col).alias("n_rows"),
    )


def kll_rollup_merge(
    sketches: DataFrame,
    col: str,
    probs: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge stored per-grain KLL sketches up to ``group_cols`` and
    read quantiles at ``probs`` (one ``q<pct>`` column each). Merging
    keeps the rank-error guarantee - the merged sketch obeys the same
    bound as one built over the concatenated input."""
    merged = F.expr(f"kll_merge_agg_double({col}_kll)")
    aggs = [F.sum("n_rows").alias("n_rows"), merged.alias("__m")]
    g = (
        sketches.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else sketches.agg(*aggs)
    )
    names = [f"q{('%g' % (p * 100)).replace('.', '_')}" for p in probs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"kll_rollup_merge: probs {probs} collide in column "
            f"names {names}"
        )
    qs = [
        F.expr(
            f"kll_sketch_get_quantile_double(__m, {float(p)})"
        ).alias(name)
        for p, name in zip(probs, names)
    ]
    keep = [F.col(c) for c in (group_cols or [])]
    return g.select(*keep, F.col("n_rows"), *qs)


def kll_rank_within_bound(
    df: DataFrame,
    col: str,
    fine_cols: list[str],
    group_cols: list[str],
    prob: float = 0.5,
    k: int = 200,
    eps: float = 0.03,
) -> DataFrame:
    """Judgeable KLL rollup: build sketches at the FINE grain, merge to
    ``group_cols``, then verify each merged quantile the only honest
    way for a rank sketch - the EXACT rank of the estimate (fraction of
    rows <= it, computed by plain SQL) must be within ``eps`` of
    ``prob``. Emits per-group exact row counts plus the boolean (the
    estimate itself is sketch-dependent, so it never reaches the
    output). The merged estimates are a tiny frame - broadcast back
    onto the base for the one-pass rank check."""
    from pyspark.sql.functions import broadcast

    fine = kll_rollup(df, col, fine_cols, k=k)
    merged = kll_rollup_merge(fine, col, [prob], group_cols)
    qcol = f"q{('%g' % (prob * 100)).replace('.', '_')}"
    est = merged.select(
        *group_cols, F.col(qcol).alias("__est")
    )
    return (
        df.join(broadcast(est), group_cols, "inner")
        .groupBy(*group_cols)
        .agg(
            F.count(col).alias("n_rows"),
            (
                F.abs(
                    F.avg((F.col(col) <= F.col("__est")).cast("double"))
                    - F.lit(float(prob))
                )
                <= F.lit(float(eps))
            ).alias("rank_ok"),
        )
    )


# -- approx top-k: MERGEABLE frequent-items sketches ---------------------
#
# The frequency member of the sketch family (distinct = HLL/Theta,
# quantiles = KLL, frequency = this): per-grain DataSketches frequent-
# items state accumulates once, persists as a binary struct column,
# and any coarser "top talkers over range X" is a combine of stored
# states - no re-scan. Counts are exact while the tracked-item budget
# exceeds the live cardinality, and deterministic-error otherwise.


def topk_rollup(
    df: DataFrame,
    col: str,
    grain_cols: list[str],
    max_tracked: int = 10_000,
) -> DataFrame:
    """One frequent-items state of ``col`` per grain group
    (``approx_top_k_accumulate``) plus the grain row count."""
    return df.groupBy(*grain_cols).agg(
        F.expr(
            f"approx_top_k_accumulate({col}, {int(max_tracked)})"
        ).alias(f"{col}_topk"),
        F.count(col).alias("n_rows"),
    )


def topk_rollup_merge(
    sketches: DataFrame,
    col: str,
    k: int,
    group_cols: list[str] | None = None,
    max_tracked: int = 10_000,
) -> DataFrame:
    """Combine stored states up to ``group_cols`` and read the top
    ``k`` (item, count) pairs - one array column, never exploded here
    so callers choose their own output discipline."""
    merged = F.expr(
        f"approx_top_k_estimate("
        f"approx_top_k_combine({col}_topk, {int(max_tracked)}), {int(k)})"
    ).alias("topk")
    rows = F.sum("n_rows").alias("n_rows")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(merged, rows)
    return sketches.agg(merged, rows)


def topk_within_bound(
    df: DataFrame,
    col: str,
    group: str,
    k: int = 3,
    max_tracked: int = 10_000,
) -> DataFrame:
    """Judgeable form: per ``group``, the exact row count plus one
    boolean asserting the sketch's reported set IS a valid exact
    top-k - every reported count is the true count, and no unreported
    item outranks a reported one (the tie-robust statement: under
    count ties ANY maximal set is correct, so the flag cannot flap on
    tie order). Exact counts come from one groupBy - the oracle
    device, not the scale path."""
    fine = topk_rollup(df, col, [group], max_tracked=max_tracked)
    got = topk_rollup_merge(
        fine, col, k, [group], max_tracked=max_tracked
    ).select(
        group,
        # explode_OUTER: a group whose values are all NULL has an
        # empty sketch, and a plain explode would silently drop the
        # whole group from the judged output (review finding) - it
        # must surface with n_rows = 0 and a vacuously-true flag
        F.explode_outer("topk").alias("e"),
        "n_rows",
    )
    got = got.select(
        group,
        F.col("e.item").cast("string").alias("item"),
        F.col("e.count").alias("est_count"),
        "n_rows",
    )
    exact = df.where(F.col(col).isNotNull()).groupBy(
        group, F.col(col).cast("string").alias("item")
    ).agg(F.count("*").alias("true_count"))
    joined = got.join(exact, [group, "item"], "left")
    # per group: all reported counts exact, and the smallest reported
    # true count >= the largest true count among UNREPORTED items
    reported = joined.groupBy(group).agg(
        F.min(
            F.when(F.col("item").isNull(), F.lit(1)).otherwise(
                (F.col("est_count") == F.col("true_count")).cast("int")
            )
        ).alias("all_exact"),
        F.min("true_count").alias("min_reported"),
        F.first("n_rows").alias("n_rows"),
        F.count("item").alias("n_reported"),
    )
    unreported_max = (
        exact.join(
            got.select(group, "item").withColumn("__r", F.lit(1)),
            [group, "item"],
            "left",
        )
        .where(F.col("__r").isNull())
        .groupBy(group)
        .agg(F.max("true_count").alias("max_unreported"))
    )
    n_items = exact.groupBy(group).agg(
        F.count("*").alias("n_distinct")
    )
    return (
        reported.join(unreported_max, group, "left")
        # LEFT + coalesce: the all-NULL group has no exact rows either
        .join(n_items, group, "left")
        .select(
            group,
            F.col("n_rows"),
            (
                (F.col("all_exact") == 1)
                & (
                    F.col("n_reported")
                    == F.least(
                        F.lit(k),
                        F.coalesce(F.col("n_distinct"), F.lit(0)),
                    )
                )
                & (
                    F.col("max_unreported").isNull()
                    | (
                        F.col("min_reported")
                        >= F.col("max_unreported")
                    )
                )
            ).alias("topk_ok"),
        )
    )
