"""Copy-on-write DML: delete / merge (upsert + insert-only) / schema
evolution, including file-pruning behavior and time-travel visibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
    LakehouseCatalog,
)
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
    add_column,
    delete_where,
    merge_into,
)


@pytest.fixture
def table(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    t = cat.create_table("gold.kv", df.schema)
    t.append(df)
    return t


def test_delete_where(table):
    v_before = table.current_version()
    delete_where(table, F.col("k") < 10)
    assert table.to_df().count() == 90
    assert table.to_df().filter(F.col("k") < 10).count() == 0
    # time travel still sees pre-delete rows
    assert table.scan(snapshot=table.snapshot(v_before)).count() == 100


def test_merge_upsert(table):
    spark = table.spark
    updates = spark.range(95, 105).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v")
    )
    snap = merge_into(table, updates, key="k", when_matched="update")
    df = table.to_df()
    assert df.count() == 105  # 100 existing + 5 new (100..104)
    assert df.filter(F.col("v") == -1.0).count() == 10  # 95..104 updated
    assert df.filter((F.col("k") == 50) & (F.col("v") == 100.0)).count() == 1
    assert snap.operation == "merge"


def test_merge_insert_only_is_j1(table):
    """when_matched='ignore' == the reference's dedup-append (J1)."""
    spark = table.spark
    updates = spark.range(90, 110).select(
        F.col("id").alias("k"), F.lit(-5.0).alias("v")
    )
    merge_into(table, updates, key="k", when_matched="ignore")
    df = table.to_df()
    assert df.count() == 110
    # matched keys kept the ORIGINAL values
    assert df.filter((F.col("k") == 95) & (F.col("v") == 190.0)).count() == 1
    assert df.filter((F.col("k") == 105) & (F.col("v") == -5.0)).count() == 1


def test_merge_prunes_files(spark, tmp_path):
    """Files whose key-range can't overlap the updates carry forward
    untouched (no rewrite)."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df_lo = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    df_hi = spark.range(1000, 1100).select(
        F.col("id").alias("k"), F.lit(2.0).alias("v")
    )
    t = cat.create_table("gold.pruned", df_lo.schema)
    t.append(df_lo.coalesce(1))
    t.append(df_hi.coalesce(1))
    before_paths = {e["path"] for e in t.snapshot().manifest}

    updates = spark.range(1050, 1060).select(
        F.col("id").alias("k"), F.lit(9.0).alias("v")
    )
    snap = merge_into(t, updates, key="k")
    assert snap.summary["carried_files"] >= 1  # the low file untouched
    after_paths = {e["path"] for e in t.snapshot().manifest}
    carried = before_paths & after_paths
    assert carried  # at least one original file survived byte-identical
    assert t.to_df().count() == 200
    assert t.to_df().filter(F.col("v") == 9.0).count() == 10


def test_add_column_schema_evolution(table):
    spark = table.spark
    add_column(table, "tag", "string")
    df = table.to_df()
    assert "tag" in df.columns
    assert df.filter(F.col("tag").isNull()).count() == 100  # old files read null
    # new appends can carry the column
    newer = spark.createDataFrame([(999, 0.0, "fresh")], "k long, v double, tag string")
    table.append(newer)
    assert table.to_df().filter(F.col("tag") == "fresh").count() == 1
    with pytest.raises(ValueError):
        add_column(table, "tag", "string")


def test_partition_spec_evolution(spark, tmp_path):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        set_partition_spec,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        PartitionField,
        year_prune,
    )
    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [StructField("DateTime", TimestampType()), StructField("v", DoubleType())]
    )
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    t = cat.create_table("gold.evolve", schema, [])  # unpartitioned

    df23 = spark.range(10).select(
        (F.to_timestamp(F.lit("2023-06-01")) + F.make_interval(secs=F.col("id"))).alias("DateTime"),
        F.lit(1.0).alias("v"),
    )
    t.append(df23)
    assert all(not e["partition"] for e in t.snapshot().manifest)

    set_partition_spec(t, [PartitionField("DateTime", "years", "DateTime_year")])
    df24 = spark.range(10).select(
        (F.to_timestamp(F.lit("2024-06-01")) + F.make_interval(secs=F.col("id"))).alias("DateTime"),
        F.lit(2.0).alias("v"),
    )
    t.append(df24)
    parts = [e["partition"] for e in t.snapshot().manifest]
    assert any(p.get("DateTime_year") == "2024" for p in parts)  # new layout
    assert any(not p for p in parts)  # old files untouched
    # pruning still correct across mixed layouts: 2024 filter drops the
    # 2023 files via their min/max stats even without partition values
    assert t.scan(file_filter=year_prune("DateTime", year_min=2024)).count() == 10
    assert t.to_df().count() == 20


def test_drop_column_metadata_only(table):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import drop_column

    files_before = len(table.snapshot().manifest)
    drop_column(table, "v")
    assert table.to_df().columns == ["k"]
    assert len(table.snapshot().manifest) == files_before  # no rewrite
    assert table.to_df().count() == 100
    with pytest.raises(ValueError):
        drop_column(table, "nope")


def test_drop_partition_source_rejected(spark, tmp_path):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import drop_column
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        PartitionField,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh2"))
    cat.create_namespace("gold")
    df = spark.range(10).select(F.col("id").alias("k"), (F.col("id") % 3).alias("b"))
    t = cat.create_table("gold.pk", df.schema, [PartitionField("b")])
    t.append(df)
    with pytest.raises(ValueError):
        drop_column(t, "b")


def test_rename_column_reads_old_and_new_files(table):
    """Files written before AND after the rename must both surface under
    the new name (coalesce over the recorded lineage)."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import rename_column

    spark = table.spark
    rename_column(table, "v", "value")
    assert table.to_df().columns == ["k", "value"]
    # pre-rename rows keep their data under the new name
    assert table.to_df().filter(F.col("value").isNull()).count() == 0
    got = {r["k"]: r["value"] for r in table.to_df().collect()}
    assert got[7] == 14.0

    # append under the NEW schema, read both generations in one scan
    new_rows = spark.range(100, 110).select(
        F.col("id").alias("k"), F.lit(99.0).alias("value")
    )
    table.append(new_rows)
    df = table.to_df()
    assert df.count() == 110
    assert df.filter(F.col("value").isNull()).count() == 0
    assert df.filter(F.col("value") == 99.0).count() == 10

    # chained rename: lineage accumulates
    rename_column(table, "value", "price")
    df = table.to_df()
    assert df.columns == ["k", "price"]
    assert df.filter(F.col("price").isNull()).count() == 0

    # re-adding a historical name is rejected (would be ambiguous)
    with pytest.raises(ValueError):
        add_column(table, "v", "double")


def test_rename_then_dml_rewrite_consolidates(table):
    """A copy-on-write rewrite after a rename writes files under the new
    name; the scan stays correct across all three file generations."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import rename_column

    rename_column(table, "v", "value")
    delete_where(table, F.col("k") >= 90)
    df = table.to_df()
    assert df.count() == 90
    assert df.filter(F.col("value").isNull()).count() == 0


# -- merge-on-read equality deletes -----------------------------------------


def test_mor_delete_no_rewrite(table):
    """MoR delete commits a tombstone, not a table rewrite: every data
    file carries over by reference; scans subtract the matched rows."""
    data_before = {e["path"] for e in table.snapshot().data_entries}
    snap = delete_where(
        table, F.col("k") < 10, mode="merge-on-read", equality_cols=["k"]
    )
    s = table.snapshot()
    assert snap.operation == "delete"
    assert {e["path"] for e in s.data_entries} == data_before  # zero rewrite
    assert len(s.delete_entries) == 1
    assert s.delete_entries[0]["equality_cols"] == ["k"]
    df = table.to_df()
    assert df.count() == 90
    assert df.filter(F.col("k") < 10).count() == 0
    # time travel still sees pre-delete rows
    assert table.scan(snapshot=table.snapshot(snap.version - 1)).count() == 100


def test_mor_delete_reappended_keys_survive(table):
    """Sequence semantics: a delete claims only rows from files OLDER
    than it - re-appending a deleted key after the delete must stick."""
    delete_where(table, F.col("k") < 10, mode="merge-on-read", equality_cols=["k"])
    spark = table.spark
    re_add = spark.range(5).select(F.col("id").alias("k"), F.lit(7.0).alias("v"))
    table.append(re_add)
    df = table.to_df()
    assert df.count() == 95
    assert df.filter(F.col("k") < 10).count() == 5
    assert df.filter((F.col("k") == 3) & (F.col("v") == 7.0)).count() == 1


def test_mor_deletes_stack(table):
    delete_where(table, F.col("k") < 10, mode="merge-on-read", equality_cols=["k"])
    delete_where(table, F.col("k") >= 90, mode="merge-on-read", equality_cols=["k"])
    assert len(table.snapshot().delete_entries) == 2
    assert table.to_df().count() == 80
    assert table.snapshot().total_rows == 100  # tombstones don't mutate stats


def test_materialize_deletes(table):
    """materialize_deletes rewrites only delete-claimable files, drops the
    tombstones, and preserves scan results exactly."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        materialize_deletes,
    )

    delete_where(table, F.col("k") < 10, mode="merge-on-read", equality_cols=["k"])
    spark = table.spark
    re_add = spark.range(3).select(F.col("id").alias("k"), F.lit(7.0).alias("v"))
    table.append(re_add)  # newer than the delete: must NOT be rewritten
    newer_paths = {
        e["path"]
        for e in table.snapshot().data_entries
        if int(e.get("seq", 0)) >= table.current_version()
    }
    before = sorted((r["k"], r["v"]) for r in table.to_df().collect())

    snap = materialize_deletes(table)
    assert snap is not None and snap.operation == "replace"
    s = table.snapshot()
    assert not s.delete_entries
    assert newer_paths <= {e["path"] for e in s.data_entries}  # carried over
    after = sorted((r["k"], r["v"]) for r in table.to_df().collect())
    assert after == before
    assert s.total_rows == 93
    assert materialize_deletes(table) is None  # idempotent no-op


def test_mor_delete_then_compact_stays_correct(spark, tmp_path):
    """Compaction over a table with pending tombstones: rewritten files
    come out with the deletes applied (their new seq outranks the
    tombstones); untouched files keep subtracting at scan."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        compact,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    t = cat.create_table("gold.kv2", df.schema)
    for i in range(3):
        t.append(df.filter(F.col("k") % 3 == i).coalesce(1))
    delete_where(t, F.col("k") < 30, mode="merge-on-read", equality_cols=["k"])
    snap = compact(t, target_file_bytes=64 * 1024 * 1024)
    assert snap is not None
    assert t.to_df().count() == 70
    assert t.to_df().filter(F.col("k") < 30).count() == 0


def test_mor_delete_requires_key(table):
    with pytest.raises(ValueError, match="equality_cols"):
        delete_where(table, F.col("k") < 10, mode="merge-on-read")
    with pytest.raises(ValueError, match="not in schema"):
        delete_where(
            table, F.col("k") < 10, mode="merge-on-read", equality_cols=["nope"]
        )


def test_cow_delete_materializes_pending_mor(table):
    """A copy-on-write delete over a table with pending tombstones
    rewrites the survivors with every tombstone applied and removes the
    delete files from the new snapshot."""
    delete_where(table, F.col("k") < 10, mode="merge-on-read", equality_cols=["k"])
    delete_where(table, F.col("k") >= 90)  # copy-on-write
    s = table.snapshot()
    assert not s.delete_entries
    df = table.to_df()
    assert df.count() == 80
    assert df.filter((F.col("k") < 10) | (F.col("k") >= 90)).count() == 0


# -- merge-on-read POSITION deletes ------------------------------------------


def test_pos_delete_non_key_predicate(table):
    """Position deletes handle what equality deletes can't: a predicate
    over a NON-key column. Here multiple rows share v-values; the
    tombstone must remove exactly the matched physical rows, rewrite
    nothing, and leave time travel intact."""
    data_before = {e["path"] for e in table.snapshot().data_entries}
    snap = delete_where(
        table, F.col("v") >= 100.0, mode="merge-on-read", positional=True
    )
    s = table.snapshot()
    assert snap.operation == "delete"
    assert {e["path"] for e in s.data_entries} == data_before  # zero rewrite
    assert [e["content"] for e in s.delete_entries] == ["pos-del"]
    df = table.to_df()
    assert df.count() == 50  # v = 2k >= 100 <=> k >= 50
    assert df.filter(F.col("v") >= 100.0).count() == 0
    assert table.scan(snapshot=table.snapshot(snap.version - 1)).count() == 100


def test_pos_delete_later_appends_survive(table):
    """A position tombstone names (file, ordinal) pairs; rows appended
    later - even with identical values - cannot be claimed."""
    delete_where(table, F.col("v") >= 100.0, mode="merge-on-read", positional=True)
    spark = table.spark
    re_add = spark.range(60, 63).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    table.append(re_add)  # identical values to deleted rows
    df = table.to_df()
    assert df.count() == 53
    assert sorted(r["k"] for r in df.filter(F.col("v") >= 100.0).collect()) == [
        60, 61, 62,
    ]


def test_pos_and_eq_deletes_stack(table):
    """Both tombstone kinds pending at once: each subtracts its own rows."""
    delete_where(table, F.col("k") < 10, mode="merge-on-read", equality_cols=["k"])
    delete_where(
        table,
        (F.col("v") >= 100.0) & (F.col("v") < 120.0),
        mode="merge-on-read",
        positional=True,
    )
    s = table.snapshot()
    assert len(s.eq_delete_entries) == 1 and len(s.pos_delete_entries) == 1
    df = table.to_df()
    assert df.count() == 80  # 100 - 10 (k<10) - 10 (50<=k<60)
    assert df.filter(F.col("k") < 10).count() == 0
    assert df.filter((F.col("k") >= 50) & (F.col("k") < 60)).count() == 0


def test_materialize_position_deletes(table):
    """materialize_deletes rewrites ONLY the files a position tombstone
    names, drops the tombstone, and preserves scan results exactly."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        materialize_deletes,
    )

    delete_where(table, F.col("v") >= 100.0, mode="merge-on-read", positional=True)
    spark = table.spark
    re_add = spark.range(200, 203).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    table.append(re_add)
    later_paths = {
        e["path"]
        for e in table.snapshot().data_entries
        if int(e.get("seq", 0)) == table.current_version()
    }
    before = sorted((r["k"], r["v"]) for r in table.to_df().collect())

    snap = materialize_deletes(table)
    assert snap is not None and snap.operation == "replace"
    s = table.snapshot()
    assert not s.delete_entries
    # files the tombstone never named carried over by reference
    assert later_paths <= {e["path"] for e in s.data_entries}
    after = sorted((r["k"], r["v"]) for r in table.to_df().collect())
    assert after == before
    assert s.total_rows == 53
    assert materialize_deletes(table) is None


def test_pos_delete_conflicts_with_concurrent_rewrite(table):
    """A compaction between read and commit invalidates row ordinals;
    the base_version guard must raise instead of resurrecting rows."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        CommitConflict,
    )

    snap = table.snapshot()
    matches = (
        table._read_data(snap.data_entries, snap, with_pos=True)
        .filter(F.col("v") >= 100.0)
        .select(
            F.col("__file_rel").alias("file_path"), F.col("__pos").alias("pos")
        )
        .coalesce(1)
    )
    del_entries = table._write_files(matches, [])
    for e in del_entries:
        e["content"] = "pos-del"
    table.append(  # concurrent commit advances the table
        table.spark.range(1).select(F.col("id").alias("k"), F.lit(0.0).alias("v"))
    )
    with pytest.raises(CommitConflict):
        table.commit_delta(
            added=del_entries,
            removed_paths=set(),
            operation="delete",
            base_version=snap.version,
        )


def test_pos_delete_then_compact_stays_correct(spark, tmp_path):
    """Compaction with a pending position tombstone: rewritten files have
    the deletes applied; the dangling tombstone (its targets rewritten)
    claims nothing afterwards."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        compact,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    t = cat.create_table("gold.posc", df.schema)
    t.append(df.repartition(8))  # 8 small files -> all compactable
    delete_where(t, F.col("k") % 10 == 0, mode="merge-on-read", positional=True)
    assert t.to_df().count() == 900

    snap = compact(t, target_file_bytes=1 << 30)
    assert snap is not None
    assert t.to_df().count() == 900
    assert t.to_df().filter(F.col("k") % 10 == 0).count() == 0


# -- UPDATE (copy-on-write + merge-on-read via position deletes) -------------


def test_update_where_cow(table):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        update_where,
    )

    snap = update_where(
        table, F.col("k") < 10, {"v": F.col("v") + 1000.0}
    )
    assert snap.operation == "update"
    df = table.to_df()
    assert df.count() == 100
    assert df.filter((F.col("k") == 3) & (F.col("v") == 1006.0)).count() == 1
    assert df.filter((F.col("k") == 50) & (F.col("v") == 100.0)).count() == 1
    # time travel sees pre-update values
    assert (
        table.scan(snapshot=table.snapshot(snap.version - 1))
        .filter((F.col("k") == 3) & (F.col("v") == 6.0))
        .count()
        == 1
    )


def test_update_where_mor_no_rewrite(table):
    """MoR UPDATE: one atomic commit of (updated rows as new files) +
    (position tombstones for the originals); no data file rewritten, no
    key columns required."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        update_where,
    )

    data_before = {e["path"] for e in table.snapshot().data_entries}
    snap = update_where(
        table,
        F.col("v") >= 100.0,  # non-key predicate
        {"v": F.lit(-1.0)},
        mode="merge-on-read",
    )
    s = table.snapshot()
    assert snap.operation == "update"
    assert data_before <= {e["path"] for e in s.data_entries}  # no rewrite
    assert s.pos_delete_entries
    df = table.to_df()
    assert df.count() == 100  # row count preserved
    assert df.filter(F.col("v") == -1.0).count() == 50
    assert df.filter(F.col("v") >= 100.0).count() == 0


def test_update_where_mor_sees_pending_deletes(table):
    """Rows already tombstoned must NOT be resurrected by a MoR update
    whose predicate matches them."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        update_where,
    )

    delete_where(table, F.col("k") < 20, mode="merge-on-read", equality_cols=["k"])
    update_where(
        table, F.col("k") < 40, {"v": F.lit(0.0)}, mode="merge-on-read"
    )
    df = table.to_df()
    assert df.count() == 80  # deleted rows stay deleted
    assert df.filter(F.col("k") < 20).count() == 0
    assert df.filter(F.col("v") == 0.0).count() == 20  # 20..39 updated


def test_update_where_mor_then_materialize(table):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        update_where,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        materialize_deletes,
    )

    update_where(
        table, F.col("k") % 7 == 0, {"v": F.lit(7.0)}, mode="merge-on-read"
    )
    before = sorted((r["k"], r["v"]) for r in table.to_df().collect())
    materialize_deletes(table)
    assert not table.snapshot().delete_entries
    assert sorted((r["k"], r["v"]) for r in table.to_df().collect()) == before


def test_positional_requires_merge_on_read(table):
    """ADVICE r4: positional=True under copy-on-write used to silently
    degrade to a full-table rewrite; now it raises."""
    with pytest.raises(ValueError, match="positional"):
        delete_where(table, F.col("k") < 10, positional=True)


def test_update_where_cow_prunes_files(spark, tmp_path):
    """ADVICE r4: CoW UPDATE rewrites only the files containing matched
    rows; untouched files carry over by reference (same path, same
    entry) - a point update must not pay O(table) write amplification."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        update_where,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    t = cat.create_table("gold.kvp", df.schema)
    t.append(df.filter(F.col("k") < 50).coalesce(1))
    t.append(df.filter(F.col("k") >= 50).coalesce(1))
    paths_before = {e["path"] for e in t.snapshot().data_entries}
    assert len(paths_before) >= 2

    snap = update_where(t, F.col("k") == 7, {"v": F.lit(-7.0)})
    paths_after = {e["path"] for e in t.snapshot().data_entries}
    # the k>=50 file(s) survived untouched; the matched file was replaced
    untouched = paths_before & paths_after
    assert untouched, "every file was rewritten despite a point predicate"
    assert snap.summary["carried_files"] >= 1
    df2 = t.to_df()
    assert df2.count() == 100
    assert df2.filter((F.col("k") == 7) & (F.col("v") == -7.0)).count() == 1
    assert df2.filter((F.col("k") == 99) & (F.col("v") == 198.0)).count() == 1


def test_update_where_cow_no_match_is_noop_rewrite(table):
    """Predicate matching nothing: zero files rewritten, table intact."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        update_where,
    )

    snap = update_where(table, F.col("k") > 10_000, {"v": F.lit(-123.0)})
    assert snap.summary["rewritten_files"] == 0
    assert table.to_df().count() == 100
    assert table.to_df().filter(F.col("v") == -123.0).count() == 0


def test_update_where_mor_nondeterministic_predicate_consistent(table):
    """ADVICE r4: the matched set is materialized ONCE (localCheckpoint)
    before the tombstone and re-append writes, so even a predicate that
    evaluates differently per run cannot desync the two sides - row
    count is always preserved."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        update_where,
    )

    update_where(
        table, F.rand() < 0.5, {"v": F.lit(-1.0)}, mode="merge-on-read"
    )
    df = table.to_df()
    assert df.count() == 100  # tombstoned exactly the re-appended rows
    n_updated = df.filter(F.col("v") == -1.0).count()
    assert df.filter(F.col("v") != -1.0).count() == 100 - n_updated


def test_inspect_refs(table):
    table.create_tag("rel-1")
    table.create_branch("prod", version=1)
    rows = {
        (r["name"], r["type"], r["version"])
        for r in table.inspect_refs().collect()
    }
    assert rows == {("rel-1", "tag", 1), ("prod", "branch", 1)}


def test_tombstone_files_gcd_after_materialize_and_expiry(table):
    """Once deletes are materialized and the tombstone-referencing
    snapshots expire, the tombstone FILES themselves are orphan-GC'd
    like any other unreferenced file."""
    import os

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        expire_snapshots,
        materialize_deletes,
    )

    delete_where(table, F.col("k") < 5, mode="merge-on-read", equality_cols=["k"])
    delete_where(table, F.col("v") >= 180.0, mode="merge-on-read", positional=True)
    tomb_paths = [
        os.path.join(table.location, d["path"])
        for d in table.snapshot().delete_entries
    ]
    assert len(tomb_paths) == 2 and all(os.path.exists(p) for p in tomb_paths)

    materialize_deletes(table)
    before = sorted((r["k"], r["v"]) for r in table.to_df().collect())
    import time

    expire_snapshots(
        table,
        older_than_ms=int(time.time() * 1000) + 10_000,
        retain_last=1,
        orphan_grace_secs=0,
    )
    assert not any(os.path.exists(p) for p in tomb_paths), "tombstones leaked"
    assert sorted((r["k"], r["v"]) for r in table.to_df().collect()) == before


def test_catalog_rename_table(spark, tmp_path):
    """rename_table moves the whole table atomically; relative internal
    paths (manifests, refs, position tombstones) survive the move."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        NoSuchTableError,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    t = cat.create_table("gold.old_name", df.schema)
    t.append(df)
    delete_where(t, F.col("v") >= 80.0, mode="merge-on-read", positional=True)
    t.create_branch("prod")

    cat.rename_table("gold.old_name", "gold.new_name")
    with pytest.raises(NoSuchTableError):
        cat.load_table("gold.old_name")
    t2 = cat.load_table("gold.new_name")
    assert t2.to_df().count() == 40  # pos tombstones still apply
    assert t2.refs() == {"prod": t2.current_version()}
    with pytest.raises(ValueError, match="namespace does not exist"):
        cat.rename_table("gold.new_name", "nowhere.x")
    other = cat.create_table(
        "gold.occupied", spark.range(1).selectExpr("id as k").schema
    )
    with pytest.raises(ValueError, match="already exists"):
        cat.rename_table("gold.new_name", "gold.occupied")


def test_promote_column_int_to_long(spark, tmp_path):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        promote_column,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh_promote"))
    cat.create_namespace("gold")
    df = spark.range(10).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 1.5).cast("float").alias("v"),
    )
    t = cat.create_table("gold.narrow", df.schema)
    t.append(df)

    promote_column(t, "k", "long")
    promote_column(t, "v", "double")
    got = t.to_df()
    assert dict(got.dtypes) == {"k": "bigint", "v": "double"}
    # old int32/float32 files read losslessly under the widened schema
    assert got.agg(F.sum("k")).first()[0] == 45
    # appends beyond int32 range now round-trip
    big = spark.createDataFrame([(2**40, 0.5)], "k long, v double")
    t.append(big)
    assert t.to_df().filter(F.col("k") == 2**40).count() == 1
    assert t.to_df().count() == 11


def test_promote_column_rejects_illegal(table):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        promote_column,
    )

    with pytest.raises(ValueError):
        promote_column(table, "k", "integer")  # narrowing (k is long)
    with pytest.raises(ValueError):
        promote_column(table, "v", "string")  # cross-family
    with pytest.raises(ValueError):
        promote_column(table, "missing", "long")
    with pytest.raises(ValueError):
        promote_column(table, "v", "double")  # already double


def test_promote_decimal_precision(spark, tmp_path):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        promote_column,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh_dec"))
    cat.create_namespace("gold")
    df = spark.range(5).select(F.col("id").cast("decimal(5,2)").alias("amt"))
    t = cat.create_table("gold.dec", df.schema)
    t.append(df)
    with pytest.raises(ValueError):
        promote_column(t, "amt", "decimal(10,3)")  # scale change
    promote_column(t, "amt", "decimal(12,2)")
    assert dict(t.to_df().dtypes)["amt"] == "decimal(12,2)"
    assert t.to_df().agg(F.sum("amt")).first()[0] == 10


def test_promote_then_time_travel_keeps_old_schema(spark, tmp_path):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        promote_column,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh_tt"))
    cat.create_namespace("gold")
    df = spark.range(5).select(F.col("id").cast("int").alias("k"))
    t = cat.create_table("gold.tt", df.schema)
    t.append(df)  # v1
    promote_column(t, "k", "long")  # v2
    assert dict(t.scan(snapshot=t.snapshot(1)).dtypes)["k"] == "int"
    assert dict(t.to_df().dtypes)["k"] == "bigint"


def test_merge_matched_delete(table):
    spark = table.spark
    # keys 90..109: 90..99 exist (matched -> delete), 100..109 are new
    updates = spark.range(90, 110).select(
        F.col("id").alias("k"), (F.col("id") * 10.0).alias("v")
    )
    merge_into(table, updates, key="k", when_matched="delete")
    df = table.to_df()
    assert df.count() == 100  # 100 - 10 deleted + 10 inserted
    assert df.filter((F.col("k") >= 90) & (F.col("k") < 100)).count() == 0
    # inserted rows carry the updates' values
    assert df.filter(F.col("k") == 105).first()["v"] == 1050.0
    with pytest.raises(ValueError):
        merge_into(table, updates, key="k", when_matched="upsert")


def test_cow_update_rejects_nondeterministic_predicate(table):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        update_where,
    )

    with pytest.raises(ValueError, match="deterministic"):
        update_where(table, F.rand() < 0.5, {"v": F.lit(0.0)})


def test_merge_sync_deletes_unmatched_by_source(table):
    """when_not_matched_by_source='delete' turns MERGE into full sync:
    the table's key set equals the source's afterwards."""
    spark = table.spark
    # source = keys 40..119: 40..99 matched (update), 100..119 new,
    # 0..39 not matched by source (deleted)
    updates = spark.range(40, 120).select(
        F.col("id").alias("k"), F.lit(-7.0).alias("v")
    )
    snap = merge_into(
        table, updates, key="k", when_not_matched_by_source="delete"
    )
    df = table.to_df()
    assert df.count() == 80
    assert df.agg(F.min("k")).first()[0] == 40
    assert df.agg(F.max("k")).first()[0] == 119
    assert df.filter(F.col("v") != -7.0).count() == 0
    assert snap.summary["sync"] is True


def test_merge_sync_drops_out_of_range_files_metadata_only(spark, tmp_path):
    """Files entirely outside the source key range are removed without a
    rewrite: removed from the manifest, no replacement files written."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    lo = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    hi = spark.range(1000, 1100).select(
        F.col("id").alias("k"), F.lit(2.0).alias("v")
    )
    t = cat.create_table("gold.sync", lo.schema)
    t.append(lo.coalesce(1))
    t.append(hi.coalesce(1))

    updates = spark.range(1000, 1100).select(
        F.col("id").alias("k"), F.lit(9.0).alias("v")
    )
    snap = merge_into(
        t, updates, key="k", when_not_matched_by_source="delete"
    )
    assert snap.summary["dropped_files"] >= 1  # the low file: pure metadata
    assert snap.summary["carried_files"] == 0
    df = t.to_df()
    assert df.count() == 100
    assert df.filter(F.col("k") < 1000).count() == 0
    assert df.filter(F.col("v") == 9.0).count() == 100


def test_merge_matched_condition_gates_update(table):
    """WHEN MATCHED AND cond THEN UPDATE: matched rows failing the
    condition keep the table version, and the source twin is dropped."""
    spark = table.spark
    updates = spark.range(90, 110).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v")
    )
    merge_into(
        table, updates, key="k", matched_condition="k % 2 = 0"
    )
    df = table.to_df()
    assert df.count() == 110  # no row duplicated or lost
    # even matched keys updated, odd matched keys untouched
    assert df.filter((F.col("k") == 92) & (F.col("v") == -1.0)).count() == 1
    assert df.filter((F.col("k") == 93) & (F.col("v") == 186.0)).count() == 1
    # unmatched source keys insert regardless of the condition
    assert df.filter((F.col("k") == 101) & (F.col("v") == -1.0)).count() == 1


def test_merge_matched_condition_gates_delete(table):
    spark = table.spark
    updates = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(0.0).alias("v")
    )
    merge_into(
        table,
        updates,
        key="k",
        when_matched="delete",
        matched_condition="v >= 100.0",  # table rows with v>=100 (k>=50)
        when_not_matched="ignore",
    )
    df = table.to_df()
    assert df.count() == 50
    assert df.agg(F.max("k")).first()[0] == 49


def test_merge_not_matched_ignore(table):
    """when_not_matched='ignore': update-only MERGE, no inserts."""
    spark = table.spark
    updates = spark.range(95, 105).select(
        F.col("id").alias("k"), F.lit(-2.0).alias("v")
    )
    merge_into(table, updates, key="k", when_not_matched="ignore")
    df = table.to_df()
    assert df.count() == 100  # no new keys inserted
    assert df.filter(F.col("v") == -2.0).count() == 5  # 95..99 updated
    with pytest.raises(ValueError, match="when_not_matched"):
        merge_into(table, updates, key="k", when_not_matched="skip")
    with pytest.raises(ValueError, match="when_not_matched_by_source"):
        merge_into(table, updates, key="k", when_not_matched_by_source="drop")


def test_merge_composite_key(spark, tmp_path):
    """Composite business keys: join on every key column, prune on the
    leading one."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0)],
        "k1 int, k2 string, v double",
    )
    t = cat.create_table("gold.comp", df.schema)
    t.append(df)
    updates = spark.createDataFrame(
        [(1, "b", -1.0), (2, "b", -2.0)], "k1 int, k2 string, v double"
    )
    merge_into(t, updates, key=["k1", "k2"])
    rows = {(r["k1"], r["k2"]): r["v"] for r in t.to_df().collect()}
    assert rows == {
        (1, "a"): 10.0,
        (1, "b"): -1.0,
        (2, "a"): 30.0,
        (2, "b"): -2.0,
    }


def test_merge_matched_condition_must_be_deterministic(table):
    spark = table.spark
    updates = spark.range(90, 110).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v")
    )
    with pytest.raises(ValueError, match="deterministic"):
        merge_into(
            table, updates, key="k", matched_condition=F.rand() < 0.5
        )
    with pytest.raises(ValueError, match="no effect"):
        merge_into(
            table, updates, key="k", when_matched="ignore",
            matched_condition="v > 0",
        )


def test_retry_on_conflict_recomputes_against_winner(table, monkeypatch):
    """A DML op losing the optimistic race retries and applies against
    the concurrent append's result."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        retry_on_conflict,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        CommitConflict,
        LakehouseTable,
    )

    spark = table.spark
    real = LakehouseTable.commit_delta
    state = {"raced": False}

    def racing_commit(self, *args, **kwargs):
        if not state["raced"]:
            # simulate a concurrent append winning between the DML's
            # snapshot read and its commit
            state["raced"] = True
            self.append(
                spark.range(100, 110).select(
                    F.col("id").alias("k"), F.lit(999.0).alias("v")
                )
            )
            raise CommitConflict("concurrent append won the race")
        return real(self, *args, **kwargs)

    monkeypatch.setattr(LakehouseTable, "commit_delta", racing_commit)

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )

    snap = retry_on_conflict(lambda: delete_where(table, F.col("k") < 10))
    assert snap.operation == "delete"
    df = table.to_df()
    assert df.filter(F.col("k") < 10).count() == 0
    # the concurrent append's rows survived the retried delete
    assert df.filter(F.col("v") == 999.0).count() == 10
    assert df.count() == 100  # 100 original - 10 deleted + 10 raced


def test_retry_on_conflict_exhausts(table, monkeypatch):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        retry_on_conflict,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        CommitConflict,
    )

    calls = {"n": 0}

    def always_lose():
        calls["n"] += 1
        raise CommitConflict("always")

    with pytest.raises(CommitConflict):
        retry_on_conflict(always_lose, attempts=3)
    assert calls["n"] == 3


def test_overwrite_partitions_backfill(spark, tmp_path):
    """Dynamic overwrite replaces exactly the touched partitions; the
    rest carry forward byte-identical, and time travel still sees the
    pre-backfill data."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        overwrite_partitions,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        PartitionField,
    )
    from test_table_format import TICK_SCHEMA, tick_df

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    t = cat.create_table(
        "gold.days", TICK_SCHEMA, [PartitionField("DateTime", "days")]
    )
    # three days of data
    for d in ("2024-01-01", "2024-01-02", "2024-01-03"):
        t.append(tick_df(spark, n=10, start=f"{d} 00:00:00"))
    v_before = t.current_version()
    before_paths = {e["path"] for e in t.snapshot().manifest}

    # backfill day 2 with corrected values (5 rows instead of 10)
    fixed = tick_df(spark, n=5, start="2024-01-02 12:00:00").withColumn(
        "Bid", F.lit(7.0)
    )
    snap = overwrite_partitions(t, fixed)
    assert snap.operation == "overwrite"
    assert snap.summary["overwritten_partitions"] == 1

    df = t.to_df()
    assert df.count() == 25  # 10 + 5 + 10
    day2 = df.filter(F.col("DateTime").cast("date") == "2024-01-02")
    assert day2.count() == 5
    assert day2.filter(F.col("Bid") == 7.0).count() == 5
    # untouched days carried over byte-identical
    after_paths = {e["path"] for e in t.snapshot().manifest}
    assert len(before_paths & after_paths) >= 2
    # time travel sees the original day 2
    old = t.scan(snapshot=t.snapshot(v_before))
    assert old.filter(F.col("DateTime").cast("date") == "2024-01-02").count() == 10


def test_overwrite_partitions_empty_is_noop(spark, tmp_path):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        overwrite_partitions,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        PartitionField,
    )
    from test_table_format import TICK_SCHEMA, tick_df

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    t = cat.create_table(
        "gold.noop", TICK_SCHEMA, [PartitionField("DateTime", "days")]
    )
    t.append(tick_df(spark, n=10))
    v = t.current_version()
    assert overwrite_partitions(t, tick_df(spark, n=0)) is None
    assert t.current_version() == v
    assert t.to_df().count() == 10


def test_overwrite_unpartitioned_replaces_table(spark, tmp_path):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        overwrite_partitions,
    )
    from test_table_format import TICK_SCHEMA, tick_df

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    t = cat.create_table("gold.flat", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=10))
    overwrite_partitions(t, tick_df(spark, n=3, start="2025-06-01 00:00:00"))
    assert t.to_df().count() == 3


def test_overwrite_partitions_refuses_pre_spec_files(spark, tmp_path):
    """Files written before partition evolution have unknown membership;
    a dynamic overwrite must refuse instead of leaving stale rows."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        overwrite_partitions,
        set_partition_spec,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        PartitionField,
    )
    from test_table_format import TICK_SCHEMA, tick_df

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    t = cat.create_table("gold.evolve", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=10))  # unpartitioned file
    set_partition_spec(t, [PartitionField("DateTime", "days")])
    with pytest.raises(ValueError, match="predate the current partition"):
        overwrite_partitions(t, tick_df(spark, n=5))


def test_add_column_with_initial_default(spark, tmp_path):
    """Iceberg v3 initial defaults: pre-addition rows read the default,
    post-addition rows keep their written values including explicit
    nulls; compaction materializes the default."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        compact,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(10).select(F.col("id").alias("k"))
    t = cat.create_table("gold.defs", df.schema)
    t.append(df)  # predates the column
    add_column(t, "tier", "string", default="bronze")
    newer = spark.createDataFrame(
        [(100, "gold"), (101, None)], "k long, tier string"
    )
    t.append(newer)

    rows = {r["k"]: r["tier"] for r in t.to_df().collect()}
    assert all(rows[k] == "bronze" for k in range(10))  # defaulted
    assert rows[100] == "gold"
    assert rows[101] is None  # explicit null after addition survives

    # rewrites bake the default in; the logical table is unchanged
    compact(t, target_file_bytes=1 << 30, small_file_threshold=1.0)
    rows2 = {r["k"]: r["tier"] for r in t.to_df().collect()}
    assert rows2 == rows


def test_add_column_default_numeric_and_scan_paths(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(5).select(F.col("id").alias("k"))
    t = cat.create_table("gold.defs2", df.schema)
    t.append(df)
    add_column(t, "score", "double", default=1.5)
    # pruned scans and DML read the defaulted view too
    assert t.scan_where("k", 1, 3).agg(F.sum("score")).first()[0] == 4.5
    delete_where(t, F.col("score") > 1.0)  # matches every defaulted row
    assert t.to_df().count() == 0
    with pytest.raises(ValueError, match="JSON scalar"):
        add_column(t, "bad", "array<int>", default=[1])


def test_changelog_with_images(spark, tmp_path):
    """Delta-CDF semantics over the changelog: a key deleted AND
    inserted by the same snapshot becomes update_preimage /
    update_postimage; pure inserts and deletes keep their types."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
        update_where,
    )
    from pyspark.sql import functions as F

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("cdc")
    df = spark.range(10).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    t = cat.create_table("cdc.t", df.schema)
    t.append(df)
    v1 = t.current_version()
    update_where(
        t, F.col("k") < 3, {"s": F.lit("upd")}, mode="merge-on-read"
    )
    v2 = t.current_version()
    delete_where(t, F.col("k") == 5)
    v3 = t.current_version()
    t.append(
        spark.range(10, 13).select(
            F.col("id").alias("k"), F.lit("new").alias("s")
        )
    )
    v4 = t.current_version()

    rows = t.scan_changelog_with_images(v1, key="k").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append(r)
    pre = {(r["k"], r["s"], r["_change_version"])
           for r in by_type["update_preimage"]}
    post = {(r["k"], r["s"], r["_change_version"])
            for r in by_type["update_postimage"]}
    assert pre == {(0, "v0", v2), (1, "v1", v2), (2, "v2", v2)}
    assert post == {(0, "upd", v2), (1, "upd", v2), (2, "upd", v2)}
    assert {(r["k"], r["_change_version"]) for r in by_type["delete"]} == {
        (5, v3)
    }
    assert {(r["k"], r["_change_version"]) for r in by_type["insert"]} == {
        (10, v4), (11, v4), (12, v4)
    }
    # plain changelog still flattens updates into delete+insert
    flat = {r["_change_type"] for r in t.scan_changelog(v1).collect()}
    assert flat == {"insert", "delete"}


def test_apply_changes_replicates_table(spark, tmp_path):
    """CDC round-trip: tail table A's image-paired changelog and
    apply_changes into replica B - after update, delete, and append on
    A, B converges to exactly A's rows."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        apply_changes,
        delete_where,
        update_where,
    )
    from pyspark.sql import functions as F

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("cdc")
    df = spark.range(10).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    src = cat.create_table("cdc.src", df.schema)
    src.append(df)
    # bootstrap the replica from the current snapshot, remember cursor
    replica = cat.create_table("cdc.replica", df.schema)
    replica.append(src.to_df())
    cursor = src.current_version()

    update_where(
        src, F.col("k") < 3, {"s": F.lit("upd")}, mode="merge-on-read"
    )
    delete_where(src, F.col("k") == 7)
    src.append(
        spark.range(10, 13).select(
            F.col("id").alias("k"), F.lit("new").alias("s")
        )
    )
    # a second update of an already-updated key: latest change must win
    update_where(src, F.col("k") == 0, {"s": F.lit("upd2")})

    cdc = src.scan_changelog_with_images(cursor, key="k")
    res = apply_changes(replica, cdc, key="k")
    assert res["deleted"] == 1
    assert res["upserted"] >= 4  # k 0,1,2 + 3 inserts (0 counted once)
    a = sorted(tuple(r) for r in src.to_df().collect())
    b = sorted(tuple(r) for r in replica.to_df().collect())
    assert a == b
    # idempotent: re-applying the same batch converges to the same state
    apply_changes(replica, cdc, key="k")
    b2 = sorted(tuple(r) for r in replica.to_df().collect())
    assert a == b2


def test_rewrite_position_deletes_consolidates(spark, tmp_path):
    """N point DELETEs = N tombstone files; consolidation folds them to
    ONE without touching data files, scans unchanged, lineage intact."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        rewrite_position_deletes,
    )
    from pyspark.sql import functions as F

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = cat.create_table("gold.pd", df.schema)
    t.append(df.coalesce(1))
    for k in (3, 11, 19, 27):  # four point deletes, four tombstones
        delete_where(
            t, F.col("k") == k, mode="merge-on-read", positional=True
        )
    snap = t.snapshot()
    assert len(snap.pos_delete_entries) == 4
    data_before = {e["path"] for e in snap.data_entries}
    lineage_before = {
        r["k"]: r["_row_id"] for r in t.scan_lineage().collect()
    }

    out = rewrite_position_deletes(t)
    assert out is not None and out.summary["rewritten_delete_files"] == 4
    snap2 = t.snapshot()
    assert len(snap2.pos_delete_entries) == 1
    assert {e["path"] for e in snap2.data_entries} == data_before
    assert sorted(r["k"] for r in t.to_df().collect()) == [
        k for k in range(30) if k not in (3, 11, 19, 27)
    ]
    assert {
        r["k"]: r["_row_id"] for r in t.scan_lineage().collect()
    } == lineage_before
    # idempotent-ish: one file left -> no-op
    assert rewrite_position_deletes(t) is None


def test_scan_changelog_between_timestamps(spark, tmp_path):
    """Timestamp-range CDC resolves instants by time-travel rules and
    matches the version-range scan exactly."""
    import time as _time

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("g")
    df = spark.range(0, 5).select(F.col("id").alias("k"))
    t = cat.create_table("g.cdc", df.schema)
    t.append(df)
    v1 = t.current_version()
    ts1 = t.snapshot(v1).timestamp_ms
    _time.sleep(0.05)
    t.append(spark.range(5, 8).select(F.col("id").alias("k")))
    delete_where(t, F.col("k") == 0)
    ts_end = t.snapshot().timestamp_ms

    by_ts = t.scan_changelog_between(ts1, ts_end).collect()
    by_v = t.scan_changelog(v1).collect()
    assert sorted(map(tuple, by_ts)) == sorted(map(tuple, by_v))
    kinds = {(r["k"], r["_change_type"]) for r in by_ts}
    assert (5, "insert") in kinds and (0, "delete") in kinds


def test_rewrite_equality_deletes_consolidates(spark, tmp_path):
    """Equality tombstones consolidate per (sequence, column-set)
    group: same-horizon key files union into one; tombstones at
    different sequence horizons never combine (a seq-raised tombstone
    would claim rows appended AFTER the delete). Scan results are
    identical before and after across mixed-seq tombstones."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        rewrite_equality_deletes,
    )
    from pyspark.sql import functions as F

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = cat.create_table("gold.eqd", df.schema)
    t.append(df.coalesce(1))
    # horizon 1: several keyed deletes in ONE commit each -> all land at
    # consecutive seqs; force a shared horizon by deleting multiple keys
    # in one call (one tombstone) plus singles at the same seq is not
    # possible - instead build mixed horizons explicitly:
    delete_where(
        t, F.col("k").isin(1, 2), mode="merge-on-read",
        equality_cols=["k"],
    )
    seq1 = max(int(d["seq"]) for d in t.snapshot().eq_delete_entries)
    # rows appended AFTER horizon 1: k=1,2 values REAPPEAR (higher seq,
    # so the old tombstones must not claim them)
    t.append(
        spark.range(1, 3).select(
            F.col("id").alias("k"), F.lit(-1).alias("v")
        )
    )
    delete_where(
        t, F.col("k").isin(5, 6), mode="merge-on-read",
        equality_cols=["k"],
    )
    delete_where(
        t, F.col("k").isin(7, 8), mode="merge-on-read",
        equality_cols=["k"],
    )
    snap = t.snapshot()
    assert len(snap.eq_delete_entries) == 3
    before = sorted(tuple(r) for r in t.to_df().collect())
    # resurrection check baseline: the re-appended k=1,2 are alive
    assert (1, -1) in before and (2, -1) in before

    # the two later deletes are at DIFFERENT seqs -> nothing to merge
    assert rewrite_equality_deletes(t) is None

    # add two more tombstones, then hand-align them to one horizon to
    # exercise the group merge (steady keyed-delete streams via
    # apply_changes land many files at one seq in production)
    delete_where(
        t, F.col("k").isin(9, 10), mode="merge-on-read",
        equality_cols=["k"],
    )
    delete_where(
        t, F.col("k").isin(11, 12), mode="merge-on-read",
        equality_cols=["k"],
    )
    snap = t.snapshot()
    eqs = snap.eq_delete_entries
    target_seq = max(int(d["seq"]) for d in eqs)
    manifest = []
    for e in snap.manifest:
        e = dict(e)
        if e.get("content") == "eq-del" and int(e["seq"]) >= seq1 + 2:
            e["seq"] = target_seq  # align the four later tombstones
        manifest.append(e)
    t.overwrite_manifest(
        manifest, operation="replace", summary={"test": "align"}
    )
    before2 = sorted(tuple(r) for r in t.to_df().collect())
    assert (1, -1) in before2  # still alive (its tombstone kept seq1)

    out = rewrite_equality_deletes(t)
    assert out is not None
    assert out.summary["rewritten_delete_files"] == 4
    assert out.summary["new_delete_files"] == 1
    snap2 = t.snapshot()
    # 4 aligned files merged to 1; the seq1 tombstone stayed untouched
    assert len(snap2.eq_delete_entries) == 2
    merged = [
        d
        for d in snap2.eq_delete_entries
        if int(d["seq"]) == target_seq
    ]
    assert len(merged) == 1 and merged[0]["equality_cols"] == ["k"]
    # scan identical pre/post consolidation - including the live
    # re-appended k=1,2 (no reverse resurrection)
    assert sorted(tuple(r) for r in t.to_df().collect()) == before2
    # no-op when every group is singleton
    assert rewrite_equality_deletes(t) is None


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """SQL three-valued logic: DELETE removes only rows where the
    predicate is TRUE - rows evaluating to NULL (UNKNOWN) survive.
    filter(~pred) would silently drop them (r8 regression)."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )
    from pyspark.sql import functions as F

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("g")
    df = spark.createDataFrame(
        [("a", 1), ("b", 5), ("c", None)], "k string, v long"
    )
    t = cat.create_table("g.nulls", df.schema)
    t.append(df)
    delete_where(t, F.col("v") == 5)
    got = {(r["k"], r["v"]) for r in t.to_df().collect()}
    assert got == {("a", 1), ("c", None)}  # the NULL row survived


def test_update_where_null_predicate_rows_unchanged(spark, tmp_path):
    """Three-valued-logic twin of the DELETE regression: UPDATE applies
    assignments only where the predicate is TRUE; NULL-predicate rows
    keep their values (CASE WHEN NULL falls to ELSE)."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        update_where,
    )
    from pyspark.sql import functions as F

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("g")
    df = spark.createDataFrame(
        [("a", 1), ("b", 5), ("c", None)], "k string, v long"
    )
    t = cat.create_table("g.un", df.schema)
    t.append(df)
    update_where(t, F.col("v") >= 5, {"v": F.lit(99)})
    got = {(r["k"], r["v"]) for r in t.to_df().collect()}
    assert got == {("a", 1), ("b", 99), ("c", None)}


def test_apply_changes_scd2_full_history(spark, tmp_path):
    """SCD Type 2: upserts open versions, the prior version closes at
    the new sequence, deletes close without opening, and an IN-BATCH
    update->delete chain lands as a bounded version - full history
    retained, one MERGE commit per batch."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        apply_changes_scd2,
        scd2_target_schema,
    )
    from pyspark.sql import functions as F

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("scd")
    ch_schema = "k long, s string, _change_type string, _change_version long"
    b1 = spark.createDataFrame(
        [(1, "a1", "insert", 1), (2, "b1", "insert", 1), (3, "c1", "insert", 1)],
        ch_schema,
    )
    dim = cat.create_table("scd.dim", scd2_target_schema(b1))
    res = apply_changes_scd2(dim, b1, key="k")
    assert res == {"closed": 0, "versions": 3}

    def rows():
        return {
            (r["k"], r["s"], r["__start_at"], r["__end_at"], r["__is_current"])
            for r in dim.to_df().collect()
        }

    assert rows() == {
        (1, "a1", 1, None, True),
        (2, "b1", 1, None, True),
        (3, "c1", 1, None, True),
    }
    # batch 2: update k=1 at seq 2; k=2 updated at 2 AND deleted at 3
    # (in-batch chain); k=3 deleted at 2; k=4 inserted at 2
    b2 = spark.createDataFrame(
        [
            (1, "a2", "update_postimage", 2),
            (1, "a0", "update_preimage", 2),  # ignored
            (2, "b2", "update_postimage", 2),
            (2, None, "delete", 3),
            (3, None, "delete", 2),
            (4, "d1", "insert", 2),
        ],
        ch_schema,
    )
    res = apply_changes_scd2(dim, b2, key="k")
    assert res == {"closed": 3, "versions": 3}
    assert rows() == {
        (1, "a1", 1, 2, False),
        (1, "a2", 2, None, True),
        (2, "b1", 1, 2, False),
        (2, "b2", 2, 3, False),
        (3, "c1", 1, 2, False),
        (4, "d1", 2, None, True),
    }
    # the whole batch landed atomically in ONE merge commit
    assert dim.snapshot().summary.get("scd2_apply") is True
    # re-insert after delete opens a fresh current version
    b3 = spark.createDataFrame([(3, "c2", "insert", 5)], ch_schema)
    apply_changes_scd2(dim, b3, key="k")
    assert (3, "c2", 5, None, True) in rows()
    assert (3, "c1", 1, 2, False) in rows()


def test_apply_changes_scd2_guards(spark, tmp_path):
    """Out-of-order batches (sequence not ahead of stored history) and
    duplicate per-key sequences raise instead of rewriting history."""
    import pytest as _pytest

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        apply_changes_scd2,
        scd2_target_schema,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("scd")
    ch_schema = "k long, s string, _change_type string, _change_version long"
    b1 = spark.createDataFrame([(1, "a1", "insert", 5)], ch_schema)
    dim = cat.create_table("scd.dimg", scd2_target_schema(b1))
    apply_changes_scd2(dim, b1, key="k")
    late = spark.createDataFrame(
        [(1, "old", "update_postimage", 5)], ch_schema
    )
    with _pytest.raises(ValueError, match="out-of-order"):
        apply_changes_scd2(dim, late, key="k")
    dup = spark.createDataFrame(
        [(2, "x", "insert", 7), (2, "y", "update_postimage", 7)],
        ch_schema,
    )
    with _pytest.raises(ValueError, match="duplicate sequence"):
        apply_changes_scd2(dim, dup, key="k")
    # r9 review: a late sequence INSIDE a CLOSED interval must raise
    # too - the current row is gone (delete@9), so a start-only gate
    # would let insert@7 slip in as a bogus 'current' version that
    # chronologically predates the recorded delete
    apply_changes_scd2(
        dim,
        spark.createDataFrame([(1, None, "delete", 9)], ch_schema),
        key="k",
    )
    inside_closed = spark.createDataFrame(
        [(1, "ghost", "insert", 7)], ch_schema
    )
    with _pytest.raises(ValueError, match="out-of-order"):
        apply_changes_scd2(dim, inside_closed, key="k")
    # ahead of every interval: a re-insert at seq 10 is legitimate
    apply_changes_scd2(
        dim,
        spark.createDataFrame([(1, "a2", "insert", 10)], ch_schema),
        key="k",
    )
    got = {
        (r["k"], r["s"], r["__start_at"], r["__end_at"])
        for r in dim.to_df().collect()
    }
    assert (1, "a2", 10, None) in got


def test_update_assignments_read_original_row(spark, tmp_path):
    """SQL UPDATE semantics: the WHERE predicate and every SET
    right-hand side evaluate against the ORIGINAL row. The sequential
    withColumn form silently skipped later assignments whenever an
    earlier one rewrote a predicate column (r9 finding: SET id = 99,
    id2 = 198 WHERE id = 1 left id2 untouched), and let a swap
    a = b, b = a collapse to a = b, b = b."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        update_where,
    )
    from pyspark.sql import functions as F

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("g")
    df = spark.createDataFrame([(1, 10, 100), (2, 20, 200)], "k long, a long, b long")
    t = cat.create_table("g.updsem", df.schema)
    t.append(df)
    # predicate column is itself assigned: both assignments must land
    update_where(
        t, F.col("k") == 1, {"k": F.lit(9), "a": F.lit(11)}
    )
    got = {(r["k"], r["a"], r["b"]) for r in t.to_df().collect()}
    assert got == {(9, 11, 100), (2, 20, 200)}
    # the classic swap: a and b exchange, not collapse
    update_where(
        t, F.col("k") == 9, {"a": F.col("b"), "b": F.col("a")}
    )
    got = {(r["k"], r["a"], r["b"]) for r in t.to_df().collect()}
    assert got == {(9, 100, 11), (2, 20, 200)}
    # merge-on-read path shares apply_assignments: same semantics
    update_where(
        t,
        F.col("k") == 2,
        {"k": F.lit(3), "b": F.col("k") * 1000},
        mode="merge-on-read",
    )
    got = {(r["k"], r["a"], r["b"]) for r in t.to_df().collect()}
    assert got == {(9, 100, 11), (3, 20, 2000)}
