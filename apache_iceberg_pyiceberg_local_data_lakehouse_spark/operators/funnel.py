"""Funnel analysis: ordered event-sequence matching per entity (the
product-analytics staple - "of the users who did A, how many went on to
do B, then C, within an hour?").

Spark-first shape: one aggregation per step. Step 1 is a plain
min-timestamp per entity; step k+1 is the min timestamp of the step's
event type occurring STRICTLY AFTER the entity's step-k time - an
equi-join on the entity key plus a range condition, which Catalyst
executes as a hash join with the range as a post-join filter. With K
steps that is K-1 entity-keyed joins, each reusing the same shuffle
key; nothing quadratic, no window over the full event stream, no
per-entity state on the driver.

``within`` bounds the whole funnel (last step within the interval of
the FIRST step's time - the common product definition); None means
unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .timeseries import _every_us


def funnel(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """Per-entity funnel times: one row per entity that completed step
    1, with ``step_1_ts .. step_K_ts`` (NULL from the first missed step
    on) and ``steps_completed``. Deterministic: each step takes the
    EARLIEST qualifying event (min timestamp), the standard greedy
    funnel semantics - earliest-first maximizes the chance of fitting
    ``within``."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    base = events.select(
        F.col(entity_col).alias("__e"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    cur = (
        base.filter(F.col("__t") == steps[0])
        .groupBy("__e")
        .agg(F.min("__ts").alias("step_1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            base.filter(F.col("__t") == step)
            .select("__e", F.col("__ts").alias("__cand"))
            .join(cur.select("__e", F.col(f"step_{i-1}_ts")), on="__e")
            .filter(F.col("__cand") > F.col(f"step_{i-1}_ts"))
            .groupBy("__e")
            .agg(F.min("__cand").alias(f"step_{i}_ts"))
        )
        cur = cur.join(nxt, on="__e", how="left")
    if within is not None and len(steps) > 1:
        us = _every_us(within)
        last = F.col(f"step_{len(steps)}_ts")
        ok = (
            F.unix_micros(last) - F.unix_micros(F.col("step_1_ts"))
        ) <= F.lit(us)
        # outside the window = the funnel was not completed: NULL the
        # final step (intermediate steps keep their times - partial
        # progress is real and reported)
        cur = cur.withColumn(
            f"step_{len(steps)}_ts", F.when(ok, last)
        )
    # steps_completed = count of LEADING non-null step times (a later
    # step time without its predecessor cannot occur by construction,
    # but the window NULL-out above can truncate the tail)
    expr = F.lit(0)
    done = F.lit(True)
    for i in range(1, len(steps) + 1):
        done = done & F.col(f"step_{i}_ts").isNotNull()
        expr = expr + done.cast("int")
    return cur.select(
        F.col("__e").alias(entity_col),
        *[f"step_{i}_ts" for i in range(1, len(steps) + 1)],
        expr.alias("steps_completed"),
    )


def cohort_retention(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "1 day",
) -> DataFrame:
    """Cohort retention: entities bucketed by first-seen period; for
    each (cohort, age-in-periods) the number of distinct entities
    active - the matrix a retention curve reads off.

    Shape: one min-aggregate for first-seen, one distinct over
    (entity, period) for activity, one entity-keyed join, one final
    (cohort, age) aggregate. All time arithmetic is integer
    microseconds (flooring time_bucket), so counts are exact and
    engine-portable."""
    from .timeseries import time_bucket

    us = _every_us(period)
    first = (
        events.select(
            F.col(entity_col).alias("__e"), F.col(ts_col).alias("__ts")
        )
        .groupBy("__e")
        .agg(F.min("__ts").alias("__first"))
        .withColumn("cohort", time_bucket(F.col("__first"), period))
    )
    active = (
        events.select(
            F.col(entity_col).alias("__e"),
            time_bucket(F.col(ts_col), period).alias("__p"),
        )
        .distinct()
    )
    joined = active.join(first.select("__e", "cohort"), on="__e")
    age = (
        (F.unix_micros("__p") - F.unix_micros("cohort")) / F.lit(us)
    ).cast("long")
    return (
        joined.withColumn("age", age)
        .groupBy("cohort", "age")
        .agg(F.countDistinct("__e").alias("n_active"))
    )
