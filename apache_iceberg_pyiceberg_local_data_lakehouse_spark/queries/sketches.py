"""Judged queries for the approximate sketches (operators/sketches.py).

Approximate results can't hash-match an oracle directly, so each query
emits the EXACT value (computable by plain SQL) plus a boolean asserting
the sketch landed inside its error bound - deterministic on both engines,
and red if the sketch implementation breaks. Registered ``defer=True``:
the driver's 50-entry judged window is reserved for the lakehouse
lifecycle; these still run in tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import load, register


@register(
    "q70_hll_distinct_bound",
    # rotated out of the judged window r7 (judged green r4-r6);
    # keeps local DuckDB parity via tests/test_oracle_parity.py
    defer=True,
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS hll_ok
    FROM events
    GROUP BY event_type
    """,
)
def q70_hll_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-user estimate per event type, checked against the
    exact count within 4 sigma of the configured rsd."""
    from ..operators.sketches import distinct_within_bound

    ev = load(spark, sf_dir, "events")
    return distinct_within_bound(ev, key="user_id", group="event_type", rsd=0.05)


@register(
    "q71_quantile_sketch_bound",
    # rotated out of the judged window r7 (judged green r4-r6);
    # keeps local DuckDB parity via tests/test_oracle_parity.py
    defer=True,
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) AS n_rows,
           CAST(FLOOR(quantile_cont(o_totalprice, 0.5) * 100 + 0.5) AS BIGINT)
             AS p50_cents,
           TRUE AS approx_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q71_quantile_sketch_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch median of order totals per status vs the exact
    interpolated percentile (Spark ``percentile`` == DuckDB
    ``quantile_cont``, both linear interpolation)."""
    from ..operators.sketches import quantile_within_bound

    o = load(spark, sf_dir, "orders")
    out = quantile_within_bound(
        o, col="o_totalprice", group="o_orderstatus", prob=0.5
    )
    return out.withColumnRenamed("o_orderstatus", "status")
