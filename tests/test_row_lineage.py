"""Row lineage (Iceberg v3): stable table-lifetime _row_id +
_last_updated_version, surviving appends, MoR DML, and rewrites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
    LakehouseCatalog,
)
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
    delete_where,
    update_where,
)
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
    compact,
    materialize_deletes,
)


@pytest.fixture
def table(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("lin")
    df = spark.range(0).select(
        F.col("id").alias("k"), F.lit("x").alias("s")
    )
    return cat.create_table("lin.t", df.schema)


def _batch(spark, lo, hi, tag="v"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit(tag), F.col("id")).alias("s")
    )


def _lineage(t):
    return {
        r["k"]: (r["_row_id"], r["_last_updated_version"])
        for r in t.scan_lineage().collect()
    }


def test_append_assigns_sequential_ids(spark, table):
    v1 = table.append(_batch(spark, 0, 10).coalesce(1)).version
    v2 = table.append(_batch(spark, 10, 15).coalesce(1)).version
    rows = table.scan_lineage().collect()
    ids = sorted(r["_row_id"] for r in rows)
    assert ids == list(range(15))  # dense, unique, from 0
    by_k = {r["k"]: r for r in rows}
    assert by_k[0]["_last_updated_version"] == v1
    assert by_k[12]["_last_updated_version"] == v2


def test_ids_stable_across_compaction(spark, table):
    for i in range(4):
        table.append(_batch(spark, i * 10, (i + 1) * 10).coalesce(1))
    before = _lineage(table)
    snap = compact(table, target_file_bytes=64 * 1024 * 1024)
    assert snap is not None  # the rewrite actually happened
    assert _lineage(table) == before
    # and across a SECOND compaction (materialized -> materialized)
    table.append(_batch(spark, 40, 50).coalesce(1))
    table.append(_batch(spark, 50, 60).coalesce(1))
    compact(table, target_file_bytes=64 * 1024 * 1024)
    after = _lineage(table)
    assert {k: v for k, v in after.items() if k < 40} == before


def test_mor_delete_preserves_survivors_and_never_reuses(spark, table):
    table.append(_batch(spark, 0, 20).coalesce(1))
    before = _lineage(table)
    delete_where(
        table, F.col("k") < 5, mode="merge-on-read", positional=True
    )
    after = _lineage(table)
    assert set(after) == set(range(5, 20))
    assert all(after[k] == before[k] for k in after)
    # deleted ids are never reused: the counter only grows
    table.append(_batch(spark, 100, 105).coalesce(1))
    new_ids = {r["_row_id"] for r in
               table.scan_lineage().filter(F.col("k") >= 100).collect()}
    assert min(new_ids) >= 20


def test_mor_update_keeps_row_id_bumps_version(spark, table):
    table.append(_batch(spark, 0, 10).coalesce(1))
    before = _lineage(table)
    snap = update_where(
        table, F.col("k") < 3, {"s": F.lit("upd")}, mode="merge-on-read"
    )
    after = _lineage(table)
    assert set(after) == set(before)
    for k in range(10):
        assert after[k][0] == before[k][0], f"row id of k={k} changed"
    for k in range(3):
        assert after[k][1] == snap.version  # updated rows bump
    for k in range(3, 10):
        assert after[k][1] == before[k][1]  # untouched rows keep
    # values actually updated through the lineage-materialized files
    got = {r["k"]: r["s"] for r in table.to_df().collect()}
    assert got[0] == "upd" and got[5] == "v5"


def test_mor_update_on_materialized_files(spark, table):
    """Materialized (post-compaction) files keep ids through a FURTHER
    MoR update - the physical __row_id wins over derivation."""
    for i in range(3):
        table.append(_batch(spark, i * 10, (i + 1) * 10).coalesce(1))
    compact(table, target_file_bytes=64 * 1024 * 1024)
    before = _lineage(table)
    snap = update_where(
        table, F.col("k") % 2 == 0, {"s": F.lit("even")},
        mode="merge-on-read",
    )
    after = _lineage(table)
    assert {k: v[0] for k, v in after.items()} == {
        k: v[0] for k, v in before.items()
    }
    assert all(
        after[k][1] == (snap.version if k % 2 == 0 else before[k][1])
        for k in after
    )


def test_materialize_deletes_preserves_ids(spark, table):
    table.append(_batch(spark, 0, 20).coalesce(1))
    delete_where(
        table, F.col("k") >= 15, mode="merge-on-read", positional=True
    )
    before = _lineage(table)
    materialize_deletes(table)
    assert not table.snapshot().delete_entries
    assert _lineage(table) == before


def test_cow_update_unique_ids(spark, table):
    """Copy-on-write rewrites assign fresh ids (documented) - but ids
    stay globally unique and the counter still only grows."""
    table.append(_batch(spark, 0, 10).coalesce(1))
    table.append(_batch(spark, 10, 20).coalesce(1))
    update_where(table, F.col("k") == 1, {"s": F.lit("cow")})
    rows = table.scan_lineage().collect()
    ids = [r["_row_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 20
    # the untouched second file kept its ids
    by_k = {r["k"]: r["_row_id"] for r in rows}
    assert by_k[15] == 15


def test_concurrent_appends_get_disjoint_ids(spark, tmp_path):
    """The rebase path re-stamps row ids against the winning parent:
    racing appends must end with globally unique, gap-free ids."""
    import threading

    cat = LakehouseCatalog(spark, str(tmp_path / "whr"))
    cat.create_namespace("lin")
    df0 = spark.range(0).select(
        F.col("id").alias("k"), F.lit("x").alias("s")
    )
    t = cat.create_table("lin.race", df0.schema)
    errors = []

    def worker(i):
        try:
            t.append(_batch(spark, i * 100, i * 100 + 100, tag=f"w{i}_"))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    rows = t.scan_lineage().collect()
    ids = sorted(r["_row_id"] for r in rows)
    assert ids == list(range(500))  # unique AND dense across all racers
    assert t.snapshot().summary["next_row_id"] == 500


def test_lineage_scale_many_files(spark, tmp_path):
    """200k rows over 32 files + compaction: ids stay dense/unique and
    the lineage scan is one distributed plan (no driver row loops)."""
    cat = LakehouseCatalog(spark, str(tmp_path / "whs"))
    cat.create_namespace("lin")
    df = spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    t = cat.create_table("lin.big", df.schema)
    t.append(df.repartition(32))
    agg = t.scan_lineage().agg(
        F.count("*").alias("n"),
        F.countDistinct("_row_id").alias("nd"),
        F.min("_row_id").alias("lo"),
        F.max("_row_id").alias("hi"),
    ).first()
    assert (agg["n"], agg["nd"], agg["lo"], agg["hi"]) == (
        200_000, 200_000, 0, 199_999,
    )
    compact(t, target_file_bytes=256 * 1024 * 1024)
    agg2 = t.scan_lineage().agg(
        F.count("*").alias("n"), F.countDistinct("_row_id").alias("nd")
    ).first()
    assert (agg2["n"], agg2["nd"]) == (200_000, 200_000)
