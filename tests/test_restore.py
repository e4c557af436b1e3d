"""RESTORE / rollback: roll a table back to an earlier snapshot's state.

Expressed as a new metadata-only commit replicating the target snapshot
(Delta RESTORE semantics; user-visible result of Iceberg's
rollback_to_snapshot) so the linear O_EXCL version chain and the audit
trail stay append-only. ``inspect_history`` marks the rolled-back-past
versions as non-ancestors (Iceberg ``history.is_current_ancestor``).
"""

from __future__ import annotations

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


def test_restore_to_version(catalog, spark):
    t = catalog.create_table("gold.r1", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=5))  # v1
    v1 = t.current_version()
    t.append(tick_df(spark, n=7, start="2024-02-01 00:00:00"))  # v2
    assert t.to_df().count() == 12

    snap = t.restore_to(v1)
    assert snap.operation == "restore"
    assert snap.summary["restore-source-version"] == v1
    # current state == v1 state, metadata-only (same files referenced)
    assert t.to_df().count() == 5
    assert {e["path"] for e in t.snapshot().manifest} == {
        e["path"] for e in t.snapshot(v1).manifest
    }
    # the bad version is still time-travelable
    assert t.scan(snapshot=t.snapshot(2)).count() == 12


def test_restore_is_new_commit_and_writable(catalog, spark):
    t = catalog.create_table("gold.r2", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=3))  # v1
    t.append(tick_df(spark, n=4, start="2024-03-01 00:00:00"))  # v2
    t.restore_to(1)  # v3
    assert t.current_version() == 3
    # appends continue on top of the restored state
    t.append(tick_df(spark, n=2, start="2024-04-01 00:00:00"))  # v4
    assert t.to_df().count() == 5


def test_restore_by_timestamp(catalog, spark):
    t = catalog.create_table("gold.r3", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=3))  # v1
    ts_after_v1 = t.snapshot().timestamp_ms
    t.append(tick_df(spark, n=4, start="2024-03-01 00:00:00"))  # v2
    # force distinct timestamps in case both commits landed in the same ms
    if t.snapshot().timestamp_ms == ts_after_v1:
        ts_after_v1 = t.snapshot().timestamp_ms - 1
        pytest.skip("commits landed in the same millisecond")
    t.restore_to(timestamp_ms=ts_after_v1)
    assert t.to_df().count() == 3
    with pytest.raises(ValueError):
        t.restore_to()  # neither selector
    with pytest.raises(ValueError):
        t.restore_to(1, timestamp_ms=ts_after_v1)  # both selectors


def test_restore_noop_when_already_current(catalog, spark):
    t = catalog.create_table("gold.r4", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=3))  # v1
    v = t.current_version()
    snap = t.restore_to(v)
    assert snap.version == v  # no empty restore commit
    assert t.current_version() == v


def test_restore_across_schema_evolution(catalog, spark):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import add_column

    t = catalog.create_table("gold.r5", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=3))  # v1
    add_column(t, "venue", "string")  # v2
    t.append(
        tick_df(spark, n=2, start="2024-05-01 00:00:00").withColumn(
            "venue", F.lit("x")
        )
    )  # v3
    t.restore_to(1)  # v4: back to the 3-col schema
    assert t.schema.fieldNames() == ["DateTime", "Bid", "Ask"]
    assert t.to_df().count() == 3


def test_inspect_history_marks_non_ancestors(catalog, spark):
    t = catalog.create_table("gold.r6", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=2))  # v1
    t.append(tick_df(spark, n=2, start="2024-02-01 00:00:00"))  # v2
    t.append(tick_df(spark, n=2, start="2024-03-01 00:00:00"))  # v3
    t.restore_to(1)  # v4
    h = {
        r["version"]: r["is_current_ancestor"]
        for r in t.inspect_history().collect()
    }
    assert h == {0: True, 1: True, 2: False, 3: False, 4: True}


def test_restored_files_survive_expiry_gc(catalog, spark, tmp_path):
    """After restore, expiring the rolled-back version must not GC files
    the restore re-references."""
    t = catalog.create_table("gold.r7", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=4))  # v1
    t.append(tick_df(spark, n=5, start="2024-02-01 00:00:00"))  # v2
    t.restore_to(1)  # v3
    expire_snapshots(t, retain_last=1, orphan_grace_secs=0)
    assert t.to_df().count() == 4


def test_inspect_history_restore_of_restore(catalog, spark):
    """A later restore can put previously-rolled-back versions back on
    the ancestry: restore_to(3) after restore_to(1) makes v2,v3
    ancestors again and v4 (the first restore) the non-ancestor."""
    t = catalog.create_table("gold.r8", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=1))  # v1
    t.append(tick_df(spark, n=1, start="2024-02-01 00:00:00"))  # v2
    t.append(tick_df(spark, n=1, start="2024-03-01 00:00:00"))  # v3
    t.restore_to(1)  # v4
    t.restore_to(3)  # v5
    assert t.to_df().count() == 3
    h = {
        r["version"]: r["is_current_ancestor"]
        for r in t.inspect_history().collect()
    }
    assert h == {0: True, 1: True, 2: True, 3: True, 4: False, 5: True}


def test_incremental_scan_skips_rewrite_manifests(catalog, spark):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        rewrite_manifests,
    )

    t = catalog.create_table("gold.r9", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=2))  # v1
    t.append(tick_df(spark, n=3, start="2024-02-01 00:00:00"))  # v2
    rewrite_manifests(t)  # v3: metadata-only
    t.append(tick_df(spark, n=4, start="2024-03-01 00:00:00"))  # v4
    # incremental consumers cross the rewrite without a refusal
    assert t.scan_incremental(1).count() == 7  # v2 + v4 rows
    assert t.scan_changelog(1).count() == 7


def test_changelog_emits_retractions_across_restore(catalog, spark):
    """A restore is a content change: the changelog emits 'delete'
    events for the rolled-back rows, so a CDC consumer's downstream
    materialization stays consistent."""
    t = catalog.create_table("gold.r10", TICK_SCHEMA, [])
    t.append(tick_df(spark, n=3))  # v1
    t.append(tick_df(spark, n=4, start="2024-02-01 00:00:00"))  # v2
    t.restore_to(1)  # v3
    ch = t.scan_changelog(2)  # from the bad version to post-restore
    rows = ch.collect()
    assert all(r["_change_type"] == "delete" for r in rows)
    assert len(rows) == 4
    assert {r["_change_version"] for r in rows} == {3}
    # end-to-end from v0: net effect = 3 inserts
    net = t.scan_changelog(0)
    ins = net.filter(F.col("_change_type") == "insert").count()
    dels = net.filter(F.col("_change_type") == "delete").count()
    assert ins - dels == 3


def test_cherrypick_after_rollback(spark, tmp_path):
    """Restore past a good append, then cherry-pick it back: the files
    re-attach by reference with fresh lineage, and the guards refuse
    non-append snapshots and double-picks."""
    import pytest as _pytest

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from pyspark.sql import functions as F

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("g")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    t = cat.create_table("g.t", df.schema)
    t.append(df)  # good base
    v_base = t.current_version()
    t.append(spark.range(10, 20).select(F.col("id").alias("k")))  # good
    v_good = t.current_version()
    t.append(spark.range(99, 199).select(F.col("id").alias("k")))  # bad
    t.restore_to(v_base)  # rolls back past the GOOD append too
    assert t.to_df().count() == 10

    snap = t.cherrypick(v_good)
    assert snap.operation == "append"
    assert snap.summary["cherrypick-source-version"] == v_good
    assert sorted(r["k"] for r in t.to_df().collect()) == list(range(20))

    # double-pick refuses (head already references the files)
    with _pytest.raises(ValueError, match="already references"):
        t.cherrypick(v_good)
    # non-append snapshots refuse
    with _pytest.raises(ValueError, match="only append"):
        t.cherrypick(t.current_version() - 1)  # the restore commit


def test_cherrypick_refuses_expired_parent(spark, tmp_path):
    """An expired parent makes the picked file set undeterminable (the
    cumulative manifest would re-apply every ancestor append): refuse
    instead of silently over-applying."""
    import pytest as _pytest

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        expire_snapshots,
    )
    from pyspark.sql import functions as F

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("g")
    df = spark.range(0, 5).select(F.col("id").alias("k"))
    t = cat.create_table("g.cp2", df.schema)
    t.append(df)  # v1 (parent of the pick)
    t.append(spark.range(5, 9).select(F.col("id").alias("k")))  # v2
    v2 = t.current_version()
    t.append(spark.range(9, 12).select(F.col("id").alias("k")))  # v3
    # expire v1 (v2's parent); keep v2/v3
    expire_snapshots(
        t, older_than_ms=10**18, retain_last=2, orphan_grace_secs=0
    )
    t.restore_to(v2)
    with _pytest.raises(ValueError, match="parent snapshot has been"):
        t.cherrypick(v2)
