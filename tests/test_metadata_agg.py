"""Aggregate pushdown to the manifest: COUNT/MIN/MAX served from
per-file footer stats with zero data files read, falling back (None)
whenever metadata cannot answer exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
    LakehouseCatalog,
)


@pytest.fixture
def table(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("m")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5 - 20.0).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    t = cat.create_table("m.t", df.schema)
    for i in range(4):  # several files: the rollup must merge stats
        t.append(df.filter(F.col("k") % 4 == i).coalesce(1))
    return t


def test_matches_real_aggregate(table):
    got = table.metadata_agg(
        {
            "n": ("count", "*"),
            "min_k": ("min", "k"),
            "max_k": ("max", "k"),
            "min_v": ("min", "v"),
            "max_v": ("max", "v"),
        }
    ).first()
    real = table.to_df().agg(
        F.count("*").alias("n"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    ).first()
    assert tuple(got) == tuple(real)
    # typed like the column, not stringly
    assert dict(table.metadata_agg({"n": ("count", "*")}).dtypes)["n"] == "bigint"
    assert dict(
        table.metadata_agg({"m": ("min", "v")}).dtypes
    )["m"] == "double"


def test_falls_back_on_pending_mor_deletes(spark, table):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        materialize_deletes,
    )

    delete_where(table, F.col("k") >= 90, mode="merge-on-read", positional=True)
    # tombstoned rows are still inside the footer counts: must refuse
    assert table.metadata_agg({"n": ("count", "*")}) is None
    # materializing the deletes rewrites footers: metadata is exact again
    materialize_deletes(table)
    got = table.metadata_agg(
        {"n": ("count", "*"), "max_k": ("max", "k")}
    ).first()
    assert (got["n"], got["max_k"]) == (90, 89)


def test_refuses_string_bounds_and_bad_args(table):
    # parquet writers may truncate binary min/max: not exact, refuse
    assert table.metadata_agg({"m": ("min", "s")}) is None
    with pytest.raises(ValueError, match="only '\\*'"):
        table.metadata_agg({"n": ("count", "k")})
    with pytest.raises(ValueError, match="unsupported"):
        table.metadata_agg({"x": ("avg", "k")})
    with pytest.raises(ValueError, match="no such column"):
        table.metadata_agg({"x": ("min", "ghost")})


def test_time_travel_snapshot(spark, table):
    v = table.current_version()
    table.append(
        spark.range(100, 110).select(
            F.col("id").alias("k"),
            F.lit(999.0).alias("v"),
            F.lit("zzz").alias("s"),
        )
    )
    cur = table.metadata_agg({"n": ("count", "*"), "mx": ("max", "v")}).first()
    old = table.metadata_agg(
        {"n": ("count", "*"), "mx": ("max", "v")},
        snapshot=table.snapshot(v),
    ).first()
    assert (cur["n"], cur["mx"]) == (110, 999.0)
    assert (old["n"], old["mx"]) == (100, pytest.approx(99 * 1.5 - 20.0))


def test_empty_table(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh2"))
    cat.create_namespace("m")
    df = spark.createDataFrame([], "k long, v double")
    t = cat.create_table("m.empty", df.schema)
    got = t.metadata_agg({"n": ("count", "*"), "lo": ("min", "k")}).first()
    assert got["n"] == 0
    assert got["lo"] is None


def test_column_added_later_is_conservative(spark, table):
    """Files predating an added column have no stats for it: the
    initial default could beat any stored bound, so refuse."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        add_column,
    )

    add_column(table, "w", "long", default=5)
    assert table.metadata_agg({"m": ("min", "w")}) is None
    # count is still served: row counts don't depend on the new column
    assert table.metadata_agg({"n": ("count", "*")}).first()["n"] == 100


# -- SQL surface wiring (VERDICT r6 #4): SELECT COUNT(*)/MIN/MAX FROM t
# routes through metadata_agg with zero data files read ----------------


@pytest.fixture
def cat_table(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "whsql"))
    cat.create_namespace("m")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5 - 20.0).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    t = cat.create_table("m.t", df.schema)
    t.append(df)
    return cat, t


def test_sql_count_served_from_metadata(monkeypatch, cat_table):
    """The happy path must never touch a data file: poison the reader
    and assert the SQL answer still comes back, named and typed exactly
    as the scan path would name it."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark import table as T

    cat, t = cat_table

    def boom(*a, **k):
        raise AssertionError("data file read on the metadata fast path")

    monkeypatch.setattr(T.LakehouseTable, "_read_data", boom)
    got = cat.sql("SELECT COUNT(*), MIN(k), MAX(v) FROM m.t")
    assert got.columns == ["count(1)", "min(k)", "max(v)"]
    row = got.first()
    assert (row["count(1)"], row["min(k)"]) == (100, 0)
    assert row["max(v)"] == pytest.approx(99 * 1.5 - 20.0)
    # aliases flow through; view-name reference (m_t) resolves too
    row2 = cat.sql("SELECT COUNT(*) AS n FROM m_t").first()
    assert row2["n"] == 100


def test_sql_falls_back_when_metadata_inexact(cat_table):
    """MoR tombstones / string bounds force the scan path - the answer
    must be the LOGICAL table's, not the stale footer counts."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )

    cat, t = cat_table
    # string bounds are refused by metadata_agg -> scan fallback works
    assert cat.sql("SELECT MIN(s) FROM m.t").first()[0] == "s0"
    delete_where(t, F.col("k") >= 90, mode="merge-on-read", positional=True)
    assert cat.sql("SELECT COUNT(*) FROM m.t").first()[0] == 90
    assert cat.sql("SELECT MAX(k) FROM m.t").first()[0] == 89


def test_sql_fast_path_shape_gate(cat_table, spark):
    """WHERE / GROUP BY / expressions / non-lakehouse views keep the
    normal Spark path (and its semantics) untouched."""
    cat, t = cat_table
    # non-matching shapes use the registered view name, like any SELECT
    assert cat.sql("SELECT COUNT(*) FROM m_t WHERE k < 10").first()[0] == 10
    assert cat.sql("SELECT MAX(k + 1) FROM m_t").first()[0] == 100
    assert (
        cat.sql("SELECT COUNT(*) AS n, COUNT(*) AS n2 FROM m_t").first()["n2"]
        == 100
    )
    spark.range(7).createOrReplaceTempView("plain_view")
    assert cat.sql("SELECT COUNT(*) FROM plain_view").first()[0] == 7


def test_sql_fast_path_respects_having_mv(cat_table, spark):
    """A HAVING-tier MV stores UNFILTERED rows as hidden state: the
    metadata fast path must decline and answer through the filtered
    view projection instead (r8 review finding)."""
    cat, t = cat_table
    cat.create_materialized_view(
        "m.big",
        "SELECT s, COUNT(*) AS n FROM m_t GROUP BY s HAVING COUNT(*) >= 2",
    )
    # every s is unique -> the view is EMPTY, the stored table is not
    stored = cat.load_table("m.big").to_df().count()
    assert stored == 100
    assert cat.sql("SELECT COUNT(*) FROM m.big").first()[0] == 0
    assert cat.sql("SELECT COUNT(*) FROM m_big").first()[0] == 0
