"""Approximate sketches vs exact answers: HLL++ distinct counts and GK
quantile sketches must land inside their configured error bounds, stay
deterministic run-to-run, and keep their aggregation mergeable (partial
aggregation in the plan - the property that makes them 100 TB-viable).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    distinct_within_bound,
    hll_rollup,
    hll_rollup_merge,
    quantile_within_bound,
)


def test_hll_within_rsd_on_known_cardinality(spark):
    n = 50_000
    df = spark.range(n).select((F.col("id") % 10_000).alias("k"))
    est = df.agg(approx_distinct("k", rsd=0.02).alias("e")).collect()[0]["e"]
    assert abs(est - 10_000) <= 4 * 0.02 * 10_000  # 4 sigma


def test_hll_deterministic(spark, sf_small):
    ev = spark.read.parquet(f"{sf_small}/orders.parquet")
    a = ev.agg(approx_distinct("o_custkey").alias("e")).collect()[0]["e"]
    b = ev.agg(approx_distinct("o_custkey").alias("e")).collect()[0]["e"]
    assert a == b


def test_quantile_sketch_bounds(spark):
    df = spark.range(100_000).select(F.col("id").cast("double").alias("x"))
    qs = df.agg(
        approx_quantiles("x", [0.1, 0.5, 0.9], accuracy=1000).alias("q")
    ).collect()[0]["q"]
    for got, want in zip(qs, [10_000, 50_000, 90_000]):
        assert abs(got - want) <= 100_000 / 1000 + 1  # rank error 1/accuracy


def test_distinct_within_bound_frame(spark, sf_small):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import load

    ev = load(spark, sf_small, "events")
    out = distinct_within_bound(ev, key="user_id", group="event_type").collect()
    assert out and all(r["hll_ok"] for r in out)
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in out:
        assert r["n_exact"] == exact[r["event_type"]]


def test_quantile_within_bound_frame(spark, sf_small):
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    out = quantile_within_bound(
        o, col="o_totalprice", group="o_orderstatus"
    ).collect()
    assert out and all(r["approx_ok"] for r in out)


def test_hll_rollup_merge_equals_direct_build(spark, sf_small):
    """Union of per-month DataSketches HLL sketches must estimate
    IDENTICALLY to one sketch built over the whole range (register-level
    merge is exact) - the property that makes persisted per-grain
    sketches a lossless substitute for re-scanning history."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import load

    ev = load(spark, sf_small, "events").withColumn(
        "month", F.date_format("ts", "yyyy-MM")
    )
    per_month = hll_rollup(ev, key="user_id", grain_cols=["event_type", "month"])
    merged = {
        r["event_type"]: r["user_id_approx_distinct"]
        for r in hll_rollup_merge(
            per_month, key="user_id", group_cols=["event_type"]
        ).collect()
    }
    direct = {
        r["event_type"]: r["e"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("e"))
        .collect()
    }
    assert merged == direct
    # and the estimate is honest: within 4 sigma of exact at lgK=12
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rsd = 1.04 / (2**12) ** 0.5
    for et, est in merged.items():
        assert abs(est - exact[et]) <= max(1.0, 4 * rsd * exact[et])


def test_hll_rollup_grand_total_and_row_counts(spark, sf_small):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import load

    ev = load(spark, sf_small, "events").withColumn(
        "month", F.date_format("ts", "yyyy-MM")
    )
    per_month = hll_rollup(ev, key="user_id", grain_cols=["month"])
    total = hll_rollup_merge(per_month, key="user_id").collect()[0]
    assert total["n_rows"] == ev.count()
    exact_total = ev.select("user_id").distinct().count()
    rsd = 1.04 / (2**12) ** 0.5
    assert abs(total["user_id_approx_distinct"] - exact_total) <= max(
        1.0, 4 * rsd * exact_total
    )


def test_sketch_aggregates_use_partial_aggregation(spark):
    """The plan must show a two-phase hash aggregate (partial -> final):
    the sketch state merges map-side, which is what bounds shuffle volume
    at scale."""
    df = spark.range(10_000).select((F.col("id") % 7).alias("g"), F.col("id"))
    plan = (
        df.groupBy("g")
        .agg(approx_distinct("id"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2, plan


# -- Theta sketches: set algebra -----------------------------------------


def test_theta_rollup_merge_within_bound(spark, sf_small):
    """Per-month Theta sketches union up to per-event-type distincts;
    at sf0.001 cardinalities are far below 2^12 so the sketch is in
    EXACT mode - the merged estimate must equal the exact distinct."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        theta_rollup,
        theta_rollup_merge,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import load

    ev = load(spark, sf_small, "events").withColumn(
        "month", F.date_format("ts", "yyyy-MM")
    )
    per_month = theta_rollup(
        ev, key="user_id", grain_cols=["event_type", "month"]
    )
    merged = {
        r["event_type"]: r["user_id_approx_distinct"]
        for r in theta_rollup_merge(
            per_month, key="user_id", group_cols=["event_type"]
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert merged == exact


def test_theta_set_algebra_exact_mode(spark):
    """Union/intersection/difference estimates on constructed sets with
    known overlap, below the exact-mode threshold: all five numbers are
    exact."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        corpus_overlap,
    )

    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(600, 1500).select(F.col("id").alias("k"))
    row = corpus_overlap(a, b, "k").collect()[0]
    assert (
        row["n_a"],
        row["n_b"],
        row["n_union"],
        row["n_intersect"],
        row["n_only_a"],
    ) == (1000, 900, 1500, 400, 600)


def test_overlap_within_bound_flags_and_exact_values(spark, sf_small):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        overlap_within_bound,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import load

    ev = load(spark, sf_small, "events")
    out = overlap_within_bound(
        ev.filter(ev.event_type == "click"),
        ev.filter(ev.event_type == "purchase"),
        key="user_id",
    ).collect()[0]
    clicks = {
        r["user_id"]
        for r in ev.filter(ev.event_type == "click")
        .select("user_id").distinct().collect()
    }
    buys = {
        r["user_id"]
        for r in ev.filter(ev.event_type == "purchase")
        .select("user_id").distinct().collect()
    }
    assert out["n_a"] == len(clicks)
    assert out["n_b"] == len(buys)
    assert out["n_union"] == len(clicks | buys)
    assert out["n_intersect"] == len(clicks & buys)
    assert out["theta_ok"] is True


def test_theta_estimation_mode_bound(spark):
    """Above 2^lgk distinct keys the sketch samples; the estimate must
    stay inside the k_sigma/sqrt(2^lgk) relative bound the judged flag
    uses (lgk=12 -> ~6.25% at 4 sigma; 200k vs 150k keys, 100k shared)."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        overlap_within_bound,
    )

    a = spark.range(0, 200_000).select(F.col("id").alias("k"))
    b = spark.range(100_000, 250_000).select(F.col("id").alias("k"))
    out = overlap_within_bound(a, b, "k").collect()[0]
    assert out["n_a"] == 200_000 and out["n_intersect"] == 100_000
    assert out["theta_ok"] is True


def test_theta_aggregate_is_partial(spark):
    """theta_sketch_agg must plan as a two-phase aggregate (map-side
    combine) - the property that bounds shuffle volume at 100 TB."""
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("g"), F.col("id")
    )
    plan = (
        df.groupBy("g")
        .agg(F.expr("theta_sketch_agg(id, 12)"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2 or plan.count(
        "ObjectHashAggregate"
    ) >= 2, plan


# -- KLL quantile sketches ------------------------------------------------


def test_kll_rollup_merge_rank_bound(spark):
    """Per-grain KLL sketches merged to group medians: the exact rank
    of each merged estimate must sit within the k=200 rank-error bound
    of 0.5 (we assert the tighter 2% since the data is unique-valued)."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        kll_rank_within_bound,
    )

    df = spark.range(100_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 10).alias("fine"),
        F.col("id").cast("double").alias("v"),
    )
    out = kll_rank_within_bound(
        df, col="v", fine_cols=["g", "fine"], group_cols=["g"],
        prob=0.5, eps=0.02,
    ).collect()
    assert len(out) == 3
    assert all(r["rank_ok"] for r in out)
    assert all(r["n_rows"] in (33_333, 33_334) for r in out)


def test_kll_merge_equals_sorted_rank_small(spark):
    """At tiny n (< k) a KLL sketch is lossless: the merged median of
    per-grain sketches equals a true order statistic."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        kll_rollup,
        kll_rollup_merge,
    )

    df = spark.range(101).select(
        (F.col("id") % 2).alias("fine"),
        F.col("id").cast("double").alias("v"),
    )
    fine = kll_rollup(df, "v", ["fine"], k=200)
    got = kll_rollup_merge(fine, "v", [0.5]).collect()[0]
    assert got["n_rows"] == 101
    assert got["q50"] == 50.0


def test_kll_rollup_null_handling(spark):
    """NULL measurements contribute to neither the sketch nor n_rows
    (COUNT(col) semantics, matching the SQL oracle's COUNT)."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        kll_rollup,
        kll_rollup_merge,
    )

    df = spark.createDataFrame(
        [(0, 1.0), (0, None), (1, 3.0), (1, None)], "fine int, v double"
    )
    fine = kll_rollup(df, "v", ["fine"], k=200)
    got = kll_rollup_merge(fine, "v", [0.5]).collect()[0]
    assert got["n_rows"] == 2


def test_overlap_with_empty_side_is_zero_not_null(spark):
    """Intersecting with an empty corpus must report 0 exact overlap
    and a TRUE flag - never NULLs from a SUM over zero rows."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        overlap_within_bound,
    )

    a = spark.range(100).select(F.col("id").alias("k"))
    b = spark.range(0).select(F.col("id").alias("k"))
    out = overlap_within_bound(a, b, "k").collect()[0]
    assert (out["n_a"], out["n_b"], out["n_union"], out["n_intersect"]) == (
        100, 0, 100, 0,
    )
    assert out["theta_ok"] is True


def test_kll_quantile_naming_and_collision(spark):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        kll_rollup,
        kll_rollup_merge,
    )

    df = spark.range(1000).select(
        (F.col("id") % 2).alias("fine"),
        F.col("id").cast("double").alias("v"),
    )
    fine = kll_rollup(df, "v", ["fine"])
    got = kll_rollup_merge(fine, "v", [0.5, 0.504, 0.995, 1.0])
    assert {"q50", "q50_4", "q99_5", "q100"} <= set(got.columns)
    import pytest

    with pytest.raises(ValueError, match="collide"):
        kll_rollup_merge(fine, "v", [0.5, 0.5])


# -- approx top-k frequent items ------------------------------------------


def test_topk_rollup_merge_exact_under_capacity(spark):
    """With the tracked-item budget above the live cardinality the
    sketch is exact: merged per-grain states report true counts and a
    valid top-k set, including across a skewed distribution."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        topk_rollup,
        topk_rollup_merge,
    )

    # item i appears (10 - i) * 10 times in each of 2 grains
    rows = [
        (g, str(i))
        for g in range(2)
        for i in range(10)
        for _ in range((10 - i) * 10)
    ]
    df = spark.createDataFrame(rows, "fine int, item string")
    fine = topk_rollup(df, "item", ["fine"])
    got = topk_rollup_merge(fine, "item", k=3).collect()[0]
    assert got["n_rows"] == len(rows)
    top = [(e["item"], e["count"]) for e in got["topk"]]
    assert top == [("0", 200), ("1", 180), ("2", 160)]


def test_topk_within_bound_flags_and_ties(spark):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        topk_within_bound,
    )

    # group 'a': clear top-2 then a 3-way tie at rank 3 - any maximal
    # choice is a valid top-3, so the flag must hold
    rows = (
        [("a", "x")] * 10
        + [("a", "y")] * 8
        + [("a", "t1")] * 5
        + [("a", "t2")] * 5
        + [("a", "t3")] * 5
        + [("b", "z")] * 2  # fewer distinct items than k
    )
    df = spark.createDataFrame(rows, "g string, item string")
    out = {
        r["g"]: (r["n_rows"], r["topk_ok"])
        for r in topk_within_bound(df, "item", "g", k=3).collect()
    }
    assert out["a"] == (33, True)
    assert out["b"] == (2, True)


def test_topk_all_null_group_surfaces(spark):
    """A group whose tracked column is entirely NULL must appear in
    the judged output with n_rows = 0 and a vacuously-true flag - a
    plain explode of its empty sketch dropped the group silently
    (review finding)."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sketches import (
        topk_within_bound,
    )

    rows = [("a", "x"), ("a", "y"), ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "g string, item string")
    out = {
        r["g"]: (r["n_rows"], r["topk_ok"])
        for r in topk_within_bound(df, "item", "g", k=2).collect()
    }
    assert out["a"] == (2, True)
    assert out["b"] == (0, True)
