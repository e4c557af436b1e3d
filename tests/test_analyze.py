"""ANALYZE TABLE: one-pass column statistics persisted in table
properties, computed over the LOGICAL table (MoR deletes applied)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
    LakehouseCatalog,
)
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import delete_where
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
    analyze_table,
    column_stats,
)


@pytest.fixture
def table(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("bucket"),
        F.when(F.col("id") % 100 == 0, None)
        .otherwise(F.col("id").cast("string"))
        .alias("tag"),
    )
    t = cat.create_table("gold.stats", df.schema)
    t.append(df)
    return t


def test_analyze_basic(table):
    stats = analyze_table(table)
    assert stats["rows"] == 1000
    k = stats["columns"]["k"]
    assert k["nulls"] == 0
    assert (k["min"], k["max"]) == ("0", "999")
    assert abs(k["ndv"] - 1000) / 1000 < 0.1  # HLL approximation
    assert stats["columns"]["bucket"]["ndv"] in range(8, 13)
    assert stats["columns"]["tag"]["nulls"] == 10


def test_analyze_reflects_mor_deletes(table):
    """Stats run over the logical table: pending merge-on-read
    tombstones must be applied before counting."""
    delete_where(
        table, F.col("k") >= 500, mode="merge-on-read", equality_cols=["k"]
    )
    stats = analyze_table(table)
    assert stats["rows"] == 500
    assert stats["columns"]["k"]["max"] == "499"


def test_column_stats_roundtrip_and_staleness(table):
    assert column_stats(table).count() == 0  # not analyzed yet
    analyze_table(table, columns=["k", "tag"])
    df = column_stats(table)
    rows = {r["column"]: r for r in df.collect()}
    assert set(rows) == {"k", "tag"}
    assert rows["k"]["table_rows"] == 1000
    ver = rows["k"]["stats_version"]
    assert ver == table.current_version()
    # a later commit makes the stats stale (version lags)
    table.append(
        table.spark.range(5).select(
            F.col("id").alias("k"),
            F.lit(0).cast("long").alias("bucket"),
            F.lit("x").alias("tag"),
        )
    )
    assert ver < table.current_version()


def test_analyze_unknown_column_raises(table):
    with pytest.raises(ValueError, match="unknown columns"):
        analyze_table(table, columns=["nope"])


def test_analyze_map_column_skips_ndv(spark, tmp_path):
    """HLL rejects map values; ANALYZE must skip their NDV instead of
    failing the whole stats pass."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.createDataFrame(
        [(1, {"a": "b"})], "k long, attrs map<string,string>"
    )
    t = cat.create_table("gold.mapped", df.schema)
    t.append(df)
    stats = analyze_table(t)
    assert stats["columns"]["attrs"]["ndv"] is None
    assert stats["columns"]["attrs"]["nulls"] == 0
    assert stats["columns"]["k"]["ndv"] == 1
    assert column_stats(t).filter("column = 'attrs'").first()["ndv"] is None
