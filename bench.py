#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "queries_median": {...}, "queries_min": {...}, "sf": ...}

``value`` and ``queries`` are COLD first-run times (comparable to
BASELINE.md and every prior BENCH_r*.json, which recorded one cold
sample). Each query then re-runs so ``queries_median``/``queries_min``
(over all runs incl. the cold one) separate real plan regressions from
first-touch JVM/codegen noise - VERDICT r4 flagged 26-54% single-sample
swings on untouched code that a 1-sample bench cannot classify.

Each run fully executes and materializes via count, so lazy plans can't
cheat. Session build time is excluded; per-query times include plan +
execute.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per plan shape that matters at 100 TB.
HEADLINE = [
    "q01_pricing_summary",        # scan + hash agg
    "q03_shipping_priority",      # broadcast join + agg + topk
    "q05_region_revenue",         # multi-way star join
    "q06_forecast_revenue",       # pushed-down filter scan
    "q13_top_orders_per_customer",  # window topk
    "q16_status_priority_rollup",   # rollup
    "q30_events_tumbling_1h",     # event-time tumbling window
    "q32_events_sessionization",  # sessionization windows
    "q41_dedup_token_jaccard",    # explode + self-join near-dup
    "q43_token_frequency",        # explode + two-level agg
    "q50_knn_bruteforce",         # vector similarity topk
    "q51_embedding_norms_by_label",  # higher-order array agg
]


def bench_ingest(spark, sf_dir: str) -> float:
    """Write-path benchmark: lineitem through the snapshot table format
    (create + partitioned append + full scan-back), timed end to end."""
    import shutil
    import tempfile

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )

    wh = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        t0 = time.perf_counter()
        cat = LakehouseCatalog(spark, wh)
        cat.create_namespace("bench")
        df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        t = cat.create_table("bench.lineitem", df.schema)
        t.append(df)
        n = t.to_df().count()
        dt = time.perf_counter() - t0
        print(f"# ingest_lineitem: {n} rows in {dt:.2f}s", file=sys.stderr)
        return round(dt, 3)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def main() -> None:
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import QUERIES
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="lakehouse-bench")
    # Untimed warm-up pass (protocol parity with BASELINE.md, which was
    # recorded on a warm box): byte-read EVERY input parquet into the OS
    # page cache, then one Spark count to warm the JVM/codegen path.
    # Without this, whatever ran before the bench (long pytest sweeps,
    # the driver's correctness pass) evicts the sf inputs and every
    # query pays real disk I/O - r6/r7 saw +25-90% median drift on
    # untouched plans from this alone.
    t0 = time.perf_counter()
    warmed_bytes = 0
    for fname in sorted(os.listdir(SF_DIR)):
        if not fname.endswith(".parquet"):
            continue
        with open(os.path.join(SF_DIR, fname), "rb") as f:
            while True:
                chunk = f.read(1 << 24)
                if not chunk:
                    break
                warmed_bytes += len(chunk)
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    print(
        f"# warm-up: paged in {warmed_bytes / (1 << 20):.0f} MiB from "
        f"{SF_DIR} in {time.perf_counter() - t0:.2f}s (untimed)",
        file=sys.stderr,
    )

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    medians: dict[str, float] = {}
    mins: dict[str, float] = {}
    for name in HEADLINE:
        samples = []
        n = -1
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            n = df.count()
            samples.append(time.perf_counter() - t0)
        times[name] = round(samples[0], 3)  # cold: baseline-comparable
        medians[name] = round(statistics.median(samples), 3)
        mins[name] = round(min(samples), 3)
        print(
            f"# {name}: {n} rows; cold {times[name]:.2f}s "
            f"median {medians[name]:.2f}s min {mins[name]:.2f}s",
            file=sys.stderr,
        )
    times["ingest_lineitem"] = bench_ingest(spark, SF_DIR)
    medians["ingest_lineitem"] = mins["ingest_lineitem"] = times[
        "ingest_lineitem"
    ]  # write path: one sample (re-running would re-create the table)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "queries_median": medians,
        "queries_min": mins,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # protocol era marker (VERDICT r8 #6): r8+ numbers are recorded
        # after an untimed page-in of every input parquet; pre-r8 BENCH
        # files (no protocol field) mixed cold-cache runs and are not
        # comparable sample-for-sample.
        "protocol": "warm-page-cache",
        "warmup_mib": round(warmed_bytes / (1 << 20), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
