#!/usr/bin/env python
"""Profile the MV CDC refresh job floor: replicate bench.py's
mv_join_cdc_refresh setup, run one single-dim and one two-dim CDC
refresh, and dump the Spark job list (statusStore) + wall times.

Usage: python scripts/profile_mv_refresh.py [outfile]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def job_list(spark, since_id: int) -> list[str]:
    store = spark.sparkContext._jsc.sc().statusStore()
    out = []
    it = store.jobsList(None).iterator()
    while it.hasNext():
        j = it.next()
        if j.jobId() <= since_id:
            continue
        desc = j.description()
        desc = desc.get() if desc.isDefined() else "(none)"
        out.append(
            f"job {j.jobId():4d} stages={j.stageIds().size()} "
            f"tasks={j.numTasks():3d} {desc[:150]}"
        )
    return sorted(out)


def last_job_id(spark) -> int:
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.jobsList(None).iterator()
    mx = -1
    while it.hasNext():
        mx = max(mx, it.next().jobId())
    return mx


def main() -> None:
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.session import (
        get_spark,
    )

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
    spark = get_spark(app_name="mv-refresh-profile")
    lines: list[str] = []
    wh = tempfile.mkdtemp(prefix="profile_mv_")
    try:
        cat = LakehouseCatalog(spark, wh)
        cat.create_namespace("bench")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
            "c_custkey", "c_nationkey"
        )
        nation = spark.read.parquet(f"{SF_DIR}/nation.parquet").select(
            "n_nationkey", "n_name"
        )
        f = cat.create_table("bench.sorders", orders.schema)
        f.append(orders)
        d1 = cat.create_table("bench.scustomer", cust.schema)
        d1.append(cust)
        d2 = cat.create_table("bench.snation", nation.schema)
        d2.append(nation)
        q = (
            "SELECT n_name, COUNT(*) AS n_orders, "
            "SUM(o_custkey) AS sum_cust "
            "FROM bench_sorders "
            "JOIN bench_scustomer "
            "ON bench_sorders.o_custkey = bench_scustomer.c_custkey "
            "JOIN bench_snation "
            "ON bench_scustomer.c_nationkey = bench_snation.n_nationkey "
            "GROUP BY n_name"
        )
        cat.create_materialized_view("bench.star_mv", q)
        cat.sql(
            "UPDATE bench.snation SET n_name = concat('Z_', n_name) "
            "WHERE n_nationkey % 5 = 0"
        )
        j0 = last_job_id(spark)
        t0 = time.perf_counter()
        cat.refresh_materialized_view("bench.star_mv")
        dt = time.perf_counter() - t0
        jobs = job_list(spark, j0)
        lines.append(
            f"== single-dim CDC refresh: {dt:.3f}s, {len(jobs)} jobs =="
        )
        lines.extend(jobs)

        cat.sql(
            "UPDATE bench.scustomer "
            "SET c_nationkey = (c_nationkey + 1) % 25 "
            "WHERE c_custkey % 11 = 0"
        )
        cat.sql(
            "UPDATE bench.snation SET n_name = concat('Y_', n_name) "
            "WHERE n_nationkey % 5 = 1"
        )
        j0 = last_job_id(spark)
        t0 = time.perf_counter()
        cat.refresh_materialized_view("bench.star_mv")
        dt = time.perf_counter() - t0
        jobs = job_list(spark, j0)
        lines.append(
            f"== two-dim CDC refresh: {dt:.3f}s, {len(jobs)} jobs =="
        )
        lines.extend(jobs)

        # SCD2 apply job floor (dml path)
        from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
            apply_changes_scd2,
            scd2_target_schema,
        )
        from pyspark.sql import functions as F

        dim_rows = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
            "c_custkey", "c_nationkey", "c_acctbal"
        )
        seed = dim_rows.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.lit("insert").alias("_change_type"),
            F.lit(1).cast("long").alias("_change_version"),
        )
        scd = cat.create_table("bench.scd_customer", scd2_target_schema(seed))
        apply_changes_scd2(scd, seed, key="c_custkey")
        batch = dim_rows.filter(F.col("c_custkey") % 10 == 0).select(
            "c_custkey",
            ((F.col("c_nationkey") + 1) % 25).alias("c_nationkey"),
            (F.col("c_acctbal") + 1).alias("c_acctbal"),
            F.lit("update_postimage").alias("_change_type"),
            F.lit(2).cast("long").alias("_change_version"),
        )
        j0 = last_job_id(spark)
        t0 = time.perf_counter()
        apply_changes_scd2(scd, batch, key="c_custkey")
        dt = time.perf_counter() - t0
        jobs = job_list(spark, j0)
        lines.append(f"== scd2_apply: {dt:.3f}s, {len(jobs)} jobs ==")
        lines.extend(jobs)

        # plain MERGE (multi-clause matrix) job floor
        src = orders.select(
            "o_orderkey",
            (F.col("o_custkey") + 1).alias("o_custkey"),
            F.col("o_totalprice"),
        ).filter(F.col("o_orderkey") % 3 == 0)
        src.createOrReplaceTempView("bench_merge_src")
        j0 = last_job_id(spark)
        t0 = time.perf_counter()
        cat.sql(
            "MERGE INTO bench.sorders USING bench_merge_src s "
            "ON bench.sorders.o_orderkey = s.o_orderkey "
            "WHEN MATCHED THEN UPDATE SET *"
        )
        dt = time.perf_counter() - t0
        jobs = job_list(spark, j0)
        lines.append(f"== merge row-replace: {dt:.3f}s, {len(jobs)} jobs ==")
        lines.extend(jobs)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
