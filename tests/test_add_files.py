"""add_files: adopt existing parquet by reference (Iceberg migrate path).

The onboarding story for an existing 100 TB parquet lake: one metadata
commit per import batch, footer-derived stats, zero data movement — and
maintenance can never delete a file it merely references.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import LakehouseCatalog
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
    expire_snapshots,
)

from test_table_format import TICK_SCHEMA, tick_df


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "warehouse"))


def _external_parquet(spark, path, n=20, start="2024-01-01 00:00:00"):
    tick_df(spark, n=n, start=start).coalesce(1).write.parquet(str(path))
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]


def test_add_files_by_reference(catalog, spark, tmp_path):
    files = _external_parquet(spark, tmp_path / "ext1", n=20)
    t = catalog.create_table("gold.adopt", TICK_SCHEMA, [])
    snap = t.add_files(files)
    assert snap.summary["adopted_files"] == len(files)
    assert t.to_df().count() == 20
    # no copy: the data files still live outside the table location
    assert all(os.path.exists(f) for f in files)
    assert os.listdir(t.data_dir) == []
    # footer stats power pruning like native writes
    entry = t.snapshot().data_entries[0]
    assert entry["rows"] == 20 and "Bid" in entry["stats"]
    # appends compose with adopted files
    t.append(tick_df(spark, n=5, start="2024-06-01 00:00:00"))
    assert t.to_df().count() == 25


def test_add_files_validation(catalog, spark, tmp_path):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        PartitionField,
    )

    files = _external_parquet(spark, tmp_path / "ext2", n=5)
    part = catalog.create_table(
        "gold.part",
        TICK_SCHEMA,
        [PartitionField("DateTime", "years", "DateTime_year")],
    )
    with pytest.raises(ValueError):
        part.add_files(files)

    t = catalog.create_table("gold.flat", TICK_SCHEMA, [])
    t.add_files(files)
    with pytest.raises(ValueError):
        t.add_files(files)  # double-adopt

    # extra columns would silently vanish on scan -> refuse
    extra_dir = tmp_path / "ext3"
    tick_df(spark, n=3).withColumn("venue", F.lit("x")).coalesce(1).write.parquet(
        str(extra_dir)
    )
    extra_files = [
        os.path.join(extra_dir, f)
        for f in os.listdir(extra_dir)
        if f.endswith(".parquet")
    ]
    with pytest.raises(ValueError):
        t.add_files(extra_files)


def test_adopted_files_survive_expiry_gc(catalog, spark, tmp_path):
    files = _external_parquet(spark, tmp_path / "ext4", n=10)
    t = catalog.create_table("gold.safe", TICK_SCHEMA, [])
    t.add_files(files)  # v1
    t.append(tick_df(spark, n=5, start="2024-06-01 00:00:00"))  # v2
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import delete_where

    delete_where(t, F.col("Bid") >= 0.0)  # v3: drops every reference
    expire_snapshots(t, retain_last=1, orphan_grace_secs=0)
    # the adopted files are un-referenced now, but GC must not touch them
    assert all(os.path.exists(f) for f in files)


def test_inspect_manifests(catalog, spark):
    t = catalog.create_table("gold.mf", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=5))
    t.append(tick_df(spark, n=5, start="2024-02-01 00:00:00"))
    m = t.inspect_manifests()
    rows = m.collect()
    assert len(rows) == 2  # one delta manifest per append
    assert all(r["n_entries"] == r["n_data"] >= 1 for r in rows)
    assert all(r["bytes"] > 0 for r in rows)


def test_add_files_type_validation(catalog, spark, tmp_path):
    """Adopting a type-incompatible file must fail at adopt time, not
    poison every later scan; legal widenings are accepted."""
    t = catalog.create_table("gold.types", TICK_SCHEMA, [])
    bad_dir = tmp_path / "ext_badtype"
    spark.range(3).selectExpr(
        "CAST(current_timestamp() AS timestamp) AS DateTime",
        "CAST(id AS string) AS Bid",  # string under a double column
        "CAST(id AS double) AS Ask",
    ).coalesce(1).write.parquet(str(bad_dir))
    bad = [
        os.path.join(bad_dir, f)
        for f in os.listdir(bad_dir)
        if f.endswith(".parquet")
    ]
    with pytest.raises(ValueError, match="Bid"):
        t.add_files(bad)

    # float32 files widen into a double column — legal adoption
    nar_dir = tmp_path / "ext_narrow"
    spark.range(3).selectExpr(
        "CAST(current_timestamp() AS timestamp) AS DateTime",
        "CAST(id AS float) AS Bid",
        "CAST(id AS float) AS Ask",
    ).coalesce(1).write.parquet(str(nar_dir))
    nar = [
        os.path.join(nar_dir, f)
        for f in os.listdir(nar_dir)
        if f.endswith(".parquet")
    ]
    t.add_files(nar)
    assert t.to_df().agg(F.sum("Bid")).first()[0] == 3.0


def test_dml_on_adopted_files(catalog, spark, tmp_path):
    """Copy-on-write DML prunes/rewrites adopted external files fine;
    positional merge-on-read DML refuses up front (their (file, pos)
    identities cannot be derived from scan URIs outside the location)."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
        update_where,
    )

    files = _external_parquet(spark, tmp_path / "ext_dml", n=10)
    t = catalog.create_table("gold.dml", TICK_SCHEMA, [])
    t.add_files(files)
    t.append(tick_df(spark, n=5, start="2024-06-01 00:00:00"))

    # positional MoR refuses while external entries are referenced
    with pytest.raises(ValueError, match="external"):
        delete_where(
            t, F.col("Bid") > 0, mode="merge-on-read", positional=True
        )
    with pytest.raises(ValueError, match="external"):
        update_where(
            t, F.col("Bid") > 0, {"Ask": F.lit(0.0)}, mode="merge-on-read"
        )

    # CoW UPDATE: pruning scan maps external URIs back to entries
    # (Bid < 1.102 matches ids 0,1 in BOTH batches -> 4 rows)
    update_where(t, F.col("Bid") < 1.102, {"Ask": F.lit(9.9)})
    assert t.to_df().filter(F.col("Ask") == 9.9).count() == 4
    assert t.to_df().count() == 15
    # the original external files are untouched on disk (CoW wrote new)
    assert all(os.path.exists(f) for f in files)
    # the matched external file was rewritten INTO the table, so the
    # snapshot no longer references external entries -> MoR unblocks
    assert not any(
        e["path"].startswith("..") for e in t.snapshot().data_entries
    )
    delete_where(t, F.col("Ask") == 9.9)
    assert t.to_df().count() == 11


def test_materialize_external_files_unblocks_positional_dml(
    catalog, spark, tmp_path
):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        materialize_external_files,
    )

    files = _external_parquet(spark, tmp_path / "ext_mat", n=8)
    t = catalog.create_table("gold.mat", TICK_SCHEMA, [])
    t.add_files(files)
    snap = materialize_external_files(t)
    assert snap.summary["materialized_external_files"] == len(files)
    assert not any(
        e["path"].startswith("..") for e in t.snapshot().data_entries
    )
    assert t.to_df().count() == 8
    assert all(os.path.exists(f) for f in files)  # originals untouched
    # positional MoR DML now works
    delete_where(
        t, F.col("Bid") < 1.102, mode="merge-on-read", positional=True
    )
    assert t.to_df().count() == 6
    # idempotent: nothing external left
    assert materialize_external_files(t) is None


def test_materialize_respects_pending_equality_deletes(
    catalog, spark, tmp_path
):
    """Regression: materializing adopted files must apply pending MoR
    tombstones — raw copying would re-commit deleted rows at a newer
    sequence number and resurrect them."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        materialize_external_files,
    )

    files = _external_parquet(spark, tmp_path / "ext_res", n=6)
    t = catalog.create_table("gold.res", TICK_SCHEMA, [])
    t.add_files(files)
    delete_where(
        t, F.col("Bid") < 1.102, mode="merge-on-read",
        equality_cols=["DateTime"],
    )  # tombstones 2 rows still living in the external file
    assert t.to_df().count() == 4
    materialize_external_files(t)
    assert t.to_df().count() == 4  # deleted rows must NOT come back
    assert not any(
        e["path"].startswith("..") for e in t.snapshot().data_entries
    )
