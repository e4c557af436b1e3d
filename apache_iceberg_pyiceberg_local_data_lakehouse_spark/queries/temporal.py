"""Temporal-join queries over ``events`` - as-of and interval joins
(SURVEY.md §2.3 gap-fill; DuckDB's native ASOF JOIN is the oracle).

These are the joins the reference's tick-data domain actually needs
(join each tick to the prevailing quote; count activity in a trailing
window) and that Spark lacks as built-ins - implemented in
``operators/temporal.py`` as shuffle-lean compositions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, register


@register(
    "q35_asof_join",
    oracle="""
    SELECT l.event_id AS event_id, l.user_id AS user_id,
           r.value AS asof_value
    FROM (SELECT * FROM events WHERE event_id % 3 = 0) l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_id % 3 <> 0) r
      ON l.user_id = r.user_id
     AND CAST(l.ts AS TIMESTAMP) >= CAST(r.ts AS TIMESTAMP)
    """,
)
def q35_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each left event picks up the value of the latest
    right-side event at or before its timestamp, per user. Spark plan:
    union + one window pass per user (single shuffle) - the
    union-sort-carry-forward formulation; DuckDB's native ASOF JOIN is
    the ground truth."""
    from ..operators.temporal import asof_join

    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_id") % 3 == 0)
    right = ev.filter(F.col("event_id") % 3 != 0)
    out = asof_join(left, right, ts_col="ts", by="user_id", value_cols=["value"])
    return out.select(
        "event_id", "user_id", F.col("value_right").alias("asof_value")
    )


@register(
    "q36_trailing_window_count",
    oracle="""
    SELECT l.event_id AS event_id, COUNT(*) AS n_prior
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP) - INTERVAL '10 minutes'
     AND CAST(r.ts AS TIMESTAMP) <  CAST(l.ts AS TIMESTAMP)
    GROUP BY l.event_id
    """,
)
def q36_trailing_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: per event, how many same-user events occurred in
    the strictly-preceding 10 minutes. Spark plan: bucketized equality
    join + exact range filter (hash join, not BNLJ - the inequality is
    checked only within 2 adjacent 10-minute buckets per row)."""
    from ..operators.temporal import interval_join

    ev = load(spark, sf_dir, "events")
    pairs = interval_join(
        ev.select("event_id", "user_id", "ts"),
        ev.select("user_id", "ts"),
        ts_col="ts",
        lower_expr=-600,
        upper_expr=-1e-6,  # exclusive upper bound: strictly before l.ts
        bucket_secs=600,
        by="user_id",
    )
    return pairs.groupBy("event_id").agg(F.count("*").alias("n_prior"))
