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
