#!/usr/bin/env python
"""Capture .explain("formatted") for every headline bench query.

Usage: python scripts/capture_plans.py <outdir> [query ...]

Writes <outdir>/<query>.txt. Used by the r14 optimization round to
record before/after physical plans (plans/r14/*_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q13_top_orders_per_customer",
    "q16_status_priority_rollup",
    "q30_events_tumbling_1h",
    "q32_events_sessionization",
    "q41_dedup_token_jaccard",
    "q43_token_frequency",
    "q50_knn_bruteforce",
    "q51_embedding_norms_by_label",
]


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    os.makedirs(outdir, exist_ok=True)

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import QUERIES
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
