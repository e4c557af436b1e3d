"""``LakehouseTable.scan_where``: predicate-driven manifest pruning.

The contract is the hidden-partitioning one: the answer must equal a
full-scan filter (correctness), while the manifest-level file filter
actually drops non-overlapping files (efficiency, asserted by counting
files the keep-filter retains).
"""

from __future__ import annotations

import datetime as dtm

import pytest
from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
    LakehouseCatalog,
)
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
    PartitionField,
    _range_keep,
    compute_bucket,
)
from tests.test_table_format import TICK_SCHEMA, tick_df


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "warehouse"))


def _kept(table, column, lower=None, upper=None):
    snap = table.snapshot()
    part = next((p for p in snap.partition_spec if p.source == column), None)
    bucket_id = None
    if part and part.transform == "bucket" and lower is not None and lower == upper:
        bucket_id = compute_bucket(table, part, lower)
    keep = _range_keep(column, lower, upper, part, bucket_id)
    return [e for e in snap.manifest if keep(e)]


def test_scan_where_years_prunes_and_matches(catalog, spark):
    catalog.create_namespace("gold")
    spec = [PartitionField("DateTime", "years", "DateTime_year")]
    t = catalog.create_table("gold.ticks", TICK_SCHEMA, spec)
    for year in (2020, 2021, 2022, 2023):
        t.append(tick_df(spark, year=year, n=10))

    lo = dtm.datetime(2021, 1, 1)
    hi = dtm.datetime(2022, 12, 31)
    total = len(t.snapshot().manifest)
    kept = _kept(t, "DateTime", lo, hi)
    assert 0 < len(kept) < total  # 2020/2023 files dropped

    got = t.scan_where("DateTime", lo, hi).count()
    want = (
        t.to_df()
        .filter((F.col("DateTime") >= lo) & (F.col("DateTime") <= hi))
        .count()
    )
    assert got == want == 20


def test_scan_where_months_transform(catalog, spark):
    catalog.create_namespace("gold")
    spec = [PartitionField("DateTime", "months", "DateTime_month")]
    t = catalog.create_table("gold.ticks", TICK_SCHEMA, spec)
    for month in (1, 4, 9):
        t.append(tick_df(spark, start=f"2024-{month:02d}-15 00:00:00", n=8))

    lo, hi = dtm.datetime(2024, 3, 1), dtm.datetime(2024, 6, 30)
    kept = _kept(t, "DateTime", lo, hi)
    assert len(kept) < len(t.snapshot().manifest)
    assert t.scan_where("DateTime", lo, hi).count() == 8  # April only


def test_scan_where_bucket_point_lookup(catalog, spark):
    catalog.create_namespace("gold")
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("user_id", LongType()), StructField("v", LongType())]
    )
    spec = [PartitionField("user_id", "bucket", "user_bucket", n_buckets=8)]
    t = catalog.create_table("gold.users", schema, spec)
    t.append(
        spark.range(1000).select(
            (F.col("id") % 50).alias("user_id"), F.col("id").alias("v")
        )
    )
    kept = _kept(t, "user_id", 42, 42)
    assert 0 < len(kept) < len(t.snapshot().manifest)
    assert t.scan_where("user_id", 42, 42).count() == 20


def test_scan_where_stats_only_unpartitioned(catalog, spark):
    """No partition spec: pruning falls back to per-file min/max stats."""
    catalog.create_namespace("gold")
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("k", LongType())])
    t = catalog.create_table("gold.seq", schema)
    # three appends with disjoint key ranges -> disjoint file stats
    for base in (0, 1000, 2000):
        t.append(spark.range(base, base + 100).select(F.col("id").alias("k")))
    kept = _kept(t, "k", 1010, 1020)
    assert len(kept) < len(t.snapshot().manifest)
    assert t.scan_where("k", 1010, 1020).count() == 11


def test_scan_where_null_partition_unprunable(catalog, spark):
    catalog.create_namespace("gold")
    spec = [PartitionField("DateTime", "years", "DateTime_year")]
    t = catalog.create_table("gold.ticks", TICK_SCHEMA, spec)
    with_null = tick_df(spark, year=2024, n=10).unionByName(
        spark.createDataFrame([(None, 1.5, 1.6)], TICK_SCHEMA)
    )
    t.append(with_null)
    # a range that excludes 2024 must still keep the null-partition file
    kept = _kept(t, "DateTime", dtm.datetime(2000, 1, 1), dtm.datetime(2001, 1, 1))
    assert any(
        e["partition"].get("DateTime_year") == "__HIVE_DEFAULT_PARTITION__"
        for e in kept
    )
    # and the residual predicate still filters exactly (null row excluded)
    assert (
        t.scan_where(
            "DateTime", dtm.datetime(2000, 1, 1), dtm.datetime(2001, 1, 1)
        ).count()
        == 0
    )


def test_scan_where_all_composes_pruning(catalog, spark):
    """Conjunctive bounds: each column cuts the file set independently;
    the scan reads only the intersection and the result equals a
    full-scan double filter."""
    catalog.create_namespace("gold")
    spec = [PartitionField("DateTime", "years", "DateTime_year")]
    t = catalog.create_table("gold.ticks", TICK_SCHEMA, spec)
    # per year, two files with disjoint Bid ranges (stats-cut on Bid)
    for year in (2020, 2021, 2022):
        lo_bid = tick_df(spark, year=year, n=10).withColumn(
            "Bid", F.col("Bid") - 1.0
        )
        hi_bid = tick_df(spark, year=year, n=10).withColumn(
            "Bid", F.col("Bid") + 10.0
        )
        t.append(lo_bid.repartition(1))
        t.append(hi_bid.repartition(1))

    total = len(t.snapshot().manifest)
    lo = dtm.datetime(2021, 1, 1)
    hi = dtm.datetime(2021, 12, 31)
    sliced = t.scan_where_all({"DateTime": (lo, hi), "Bid": (5.0, None)})
    want = (
        t.to_df()
        .filter(
            (F.col("DateTime") >= lo)
            & (F.col("DateTime") <= hi)
            & (F.col("Bid") >= 5.0)
        )
        .count()
    )
    assert sliced.count() == want == 10
    # intersection: 1 of 6 files (2021 AND high-Bid)
    assert len(sliced.inputFiles()) == 1 < total


def test_scan_where_all_matches_single_column_form(catalog, spark):
    catalog.create_namespace("gold")
    t = catalog.create_table("gold.ticks2", TICK_SCHEMA, [])
    for year in (2020, 2022):
        t.append(tick_df(spark, year=year, n=5))
    lo, hi = dtm.datetime(2021, 1, 1), dtm.datetime(2023, 1, 1)
    a = t.scan_where("DateTime", lo, hi)
    b = t.scan_where_all({"DateTime": (lo, hi)})
    assert a.count() == b.count() == 5
    assert sorted(a.inputFiles()) == sorted(b.inputFiles())


def test_scan_where_half_open_bounds(catalog, spark):
    catalog.create_namespace("gold")
    spec = [PartitionField("DateTime", "years", "DateTime_year")]
    t = catalog.create_table("gold.ticks", TICK_SCHEMA, spec)
    for year in (2020, 2022):
        t.append(tick_df(spark, year=year, n=5))
    assert t.scan_where("DateTime", lower=dtm.datetime(2021, 1, 1)).count() == 5
    assert t.scan_where("DateTime", upper=dtm.datetime(2021, 1, 1)).count() == 5


# -- bloom-filter point-lookup pruning ---------------------------------------


def test_bloom_prunes_scattered_keys(spark, tmp_path):
    """High-cardinality string keys scattered across files: min/max spans
    everything (prunes nothing), the per-file bloom prunes to ~1 file."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        _range_keep,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(2000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("uid")
    )
    t = cat.create_table("gold.uids", df.schema)
    # 8 files, uids scattered across all of them
    for i in range(8):
        t.append(df.filter(F.col("k") % 8 == i).coalesce(1), bloom_cols=["uid"])
    snap = t.snapshot()
    assert all("bloom" in e and "uid" in e["bloom"] for e in snap.manifest)

    # pick one existing uid; its file must survive, most others must not
    target = df.filter(F.col("k") == 1234).collect()[0]["uid"]
    keep = _range_keep("uid", target, target, None, None)
    kept = [e for e in snap.manifest if keep(e)]
    assert 1 <= len(kept) <= 2, f"bloom pruned to {len(kept)} files"
    # the scan over pruned files still finds the row
    got = t.scan_where("uid", target, target).collect()
    assert len(got) == 1 and got[0]["k"] == 1234

    # an absent key prunes everything (modulo rare fp) and returns nothing
    keep_absent = _range_keep("uid", "not-a-real-uid", "not-a-real-uid", None, None)
    assert len([e for e in snap.manifest if keep_absent(e)]) <= 1
    assert t.scan_where("uid", "nope", "nope").count() == 0


def test_bloom_int_keys_and_absent_column(spark, tmp_path):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        _range_keep,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(1000).select(
        (F.pmod(F.hash("id"), F.lit(100000))).alias("user_id"),
        F.col("id").alias("k"),
    )
    t = cat.create_table("gold.users", df.schema)
    for i in range(4):
        t.append(df.filter(F.col("k") % 4 == i).coalesce(1), bloom_cols=["user_id"])
    snap = t.snapshot()
    uid = df.filter(F.col("k") == 77).collect()[0]["user_id"]
    # int key round-trips through the canonicalizer
    assert t.scan_where("user_id", int(uid), int(uid)).count() >= 1
    # range (non-point) lookups ignore the bloom - no false pruning
    assert (
        t.scan_where("user_id", int(uid) - 1, int(uid) + 1).count()
        >= t.scan_where("user_id", int(uid), int(uid)).count()
    )
    # files without a bloom for the column stay unprunable
    keep = _range_keep("nope_col", 1, 1, None, None)
    assert all(keep(e) for e in snap.manifest)


def test_scan_where_in_multi_point(catalog, spark):
    """IN-list scan: per-value bucket pruning unions, result equals the
    full-scan isin filter, empty list scans nothing."""
    catalog.create_namespace("gold")
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("user_id", LongType()), StructField("v", LongType())]
    )
    spec = [PartitionField("user_id", "bucket", "user_bucket", n_buckets=8)]
    t = catalog.create_table("gold.users_in", schema, spec)
    t.append(
        spark.range(1000).select(
            (F.col("id") % 50).alias("user_id"), F.col("id").alias("v")
        )
    )
    got = t.scan_where_in("user_id", [42, 7, 42])
    assert got.count() == 40  # 20 rows per key, duplicate value deduped
    assert {r["user_id"] for r in got.select("user_id").distinct().collect()} == {7, 42}

    # pruning: the union keep retains fewer files than the manifest
    snap = t.snapshot()
    part = next(p for p in snap.partition_spec if p.source == "user_id")
    keeps = [
        _range_keep("user_id", v, v, part, compute_bucket(t, part, v))
        for v in (42, 7)
    ]
    kept = [e for e in snap.manifest if any(k(e) for k in keeps)]
    assert 0 < len(kept) < len(snap.manifest)

    assert t.scan_where_in("user_id", []).count() == 0
    # projection pushes down
    one_col = t.scan_where_in("user_id", [42], selected_fields=["v"])
    assert one_col.columns == ["v"]


def test_scan_where_in_stats_pruning_unpartitioned(catalog, spark):
    """Without a partition spec the per-value min/max stats still prune
    files whose range contains none of the probed keys."""
    catalog.create_namespace("gold")
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("k", LongType()), StructField("v", LongType())]
    )
    t = catalog.create_table("gold.plain_in", schema)
    for base in (0, 1000, 2000):
        t.append(
            spark.range(base, base + 100)
            .select(F.col("id").alias("k"), F.col("id").alias("v"))
            .coalesce(1)
        )
    got = t.scan_where_in("k", [5, 2050])
    assert got.count() == 2
    snap = t.snapshot()
    keeps = [_range_keep("k", v, v, None, None) for v in (5, 2050)]
    kept = [e for e in snap.manifest if any(k(e) for k in keeps)]
    assert len(kept) == 2  # the middle file (1000..1099) pruned


def test_scan_where_hours_transform(catalog, spark):
    """hours(ts) partitioning: an hour-range scan prunes files from
    other hours and still matches the full-scan filter."""
    catalog.create_namespace("gold")
    t = catalog.create_table(
        "gold.hourly",
        TICK_SCHEMA,
        [PartitionField("DateTime", "hours")],
    )
    # tick_df spaces rows 1 s apart -> 10800 rows = hours 00..02
    t.append(tick_df(spark, n=10800, start="2024-03-01 00:00:00"))
    lo = dtm.datetime(2024, 3, 1, 2, 0)
    hi = dtm.datetime(2024, 3, 1, 2, 59, 59)
    kept = _kept(t, "DateTime", lo, hi)
    assert 0 < len(kept) < len(t.snapshot().manifest)
    got = t.scan_where("DateTime", lo, hi)
    want = t.to_df().filter(
        (F.col("DateTime") >= F.lit(lo)) & (F.col("DateTime") <= F.lit(hi))
    )
    assert got.count() == want.count() == 3600


def test_scan_where_truncate_numeric(catalog, spark):
    """truncate[100](k): files keyed by floored hundreds prune numeric
    range scans."""
    catalog.create_namespace("gold")
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("k", LongType()), StructField("v", LongType())]
    )
    t = catalog.create_table(
        "gold.trunc",
        schema,
        [PartitionField("k", "truncate", "k_trunc", width=100)],
    )
    t.append(
        spark.range(1000).select(F.col("id").alias("k"), F.col("id").alias("v"))
    )
    kept = _kept(t, "k", 250, 260)
    assert 0 < len(kept) < len(t.snapshot().manifest)
    assert t.scan_where("k", 250, 260).count() == 11


def test_scan_where_truncate_string_prefix(catalog, spark):
    """truncate[1](name): string prefix partitioning prunes point scans."""
    catalog.create_namespace("gold")
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField("name", StringType()), StructField("v", StringType())]
    )
    t = catalog.create_table(
        "gold.names",
        schema,
        [PartitionField("name", "truncate", "name_pfx", width=1)],
    )
    t.append(
        spark.createDataFrame(
            [("alpha", "1"), ("beta", "2"), ("bravo", "3"), ("gamma", "4")],
            schema,
        )
    )
    kept = _kept(t, "name", "beta", "bravo")
    assert 0 < len(kept) < len(t.snapshot().manifest)
    got = t.scan_where("name", "beta", "bravo")
    assert {r["name"] for r in got.collect()} == {"beta", "bravo"}


def test_scan_where_hours_date_only_bounds(catalog, spark):
    """Date-only bounds on an hours-partitioned table widen to the
    day's first/last hour instead of pruning the whole day."""
    catalog.create_namespace("gold")
    t = catalog.create_table(
        "gold.hourly2", TICK_SCHEMA, [PartitionField("DateTime", "hours")]
    )
    t.append(tick_df(spark, n=10800, start="2024-03-01 00:00:00"))
    lo = dtm.date(2024, 3, 1)
    hi = dtm.date(2024, 3, 1)
    got = t.scan_where("DateTime", lo, hi)
    want = t.to_df().filter(
        (F.col("DateTime") >= F.lit(lo)) & (F.col("DateTime") <= F.lit(hi))
    )
    assert got.count() == want.count()


def test_scan_join_pruned_small_build_side(catalog, spark):
    """DPP-style runtime pruning: a small build side takes the
    per-value path - only files that can hold one of the keys are
    listed; the joined result equals the unpruned join."""
    df = spark.range(400).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = catalog.create_table("gold.fact", df.schema)
    for i in range(4):  # key-clustered files: 0-99, 100-199, ...
        t.append(df.filter((F.col("k") >= i * 100) & (F.col("k") < (i + 1) * 100)).coalesce(1))
    dim = spark.createDataFrame([(5,), (17,), (42,)], "fk long")
    pruned = t.scan_join_pruned("k", dim, key_column="fk")
    assert len(pruned.inputFiles()) == 1  # all three keys live in file 0
    joined = pruned.join(dim, pruned["k"] == dim["fk"])
    assert sorted(r["v"] for r in joined.collect()) == [10, 34, 84]


def test_scan_join_pruned_range_fallback(catalog, spark):
    """Above max_keys the build side contributes only [min, max]: files
    outside the range are still pruned, values inside are exact."""
    df = spark.range(400).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = catalog.create_table("gold.fact2", df.schema)
    for i in range(4):
        t.append(df.filter((F.col("k") >= i * 100) & (F.col("k") < (i + 1) * 100)).coalesce(1))
    dim = spark.range(120, 180).select(F.col("id").alias("fk"))
    pruned = t.scan_join_pruned("k", dim, key_column="fk", max_keys=10)
    assert len(pruned.inputFiles()) == 1  # range [120, 179] is file 1 only
    joined = pruned.join(dim, pruned["k"] == dim["fk"])
    assert joined.count() == 60


def test_scan_join_pruned_empty_build_side(catalog, spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    t = catalog.create_table("gold.fact3", df.schema)
    t.append(df)
    empty = spark.createDataFrame([], "fk long")
    pruned = t.scan_join_pruned("k", empty, key_column="fk")
    assert pruned.count() == 0
