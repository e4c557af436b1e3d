"""Regression tests for the correctness hazards around metadata lifecycle:

- expiring snapshot v0 must NOT make the table "disappear" (a v0-anchored
  existence check would let ``ensure_table`` re-create an empty table over
  live data on the next ingest run);
- a manifest rewrite (compaction / DML) derived from version N must
  conflict, not silently drop a concurrent append committed at N+1;
- partition pruning must treat null-partition files
  (``__HIVE_DEFAULT_PARTITION__``) as unprunable instead of crashing.

Each of these failed before the fix (v0-anchored ``table_exists``,
unvalidated ``overwrite_manifest``, ``int()`` on partition values).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
    LakehouseCatalog,
)
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
    compact,
    expire_snapshots,
)
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
    CommitConflict,
    PartitionField,
    year_prune,
)
from tests.test_table_format import TICK_SCHEMA, tick_df


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "warehouse"))


def test_expiring_v0_does_not_reset_table(catalog, spark, tmp_path):
    """Expire everything but the newest 2 snapshots (v0 included), then
    touch the table again through a FRESH catalog handle - existence,
    loading, and ensure_table must all still see the live table."""
    catalog.create_namespace("gold")
    t = catalog.create_table("gold.ticks", TICK_SCHEMA)
    for year in (2020, 2021, 2022):
        t.append(tick_df(spark, year=year, n=5))
    # versions 0..3; protect newest 2 only, cutoff in the far future
    res = expire_snapshots(
        t, older_than_ms=(1 << 62), retain_last=2, orphan_grace_secs=0
    )
    assert res["expired_snapshots"] == 2  # v0 (create) and v1
    remaining = {s.version for s in t.snapshots()}
    assert 0 not in remaining and remaining == {2, 3}

    fresh = LakehouseCatalog(spark, str(tmp_path / "warehouse"))
    assert fresh.table_exists("gold.ticks")
    assert fresh.list_tables("gold") == ["gold.ticks"]
    assert fresh.load_table("gold.ticks").to_df().count() == 15
    # the ingest path's create-if-absent must load, not re-create
    t2 = fresh.ensure_table("gold.ticks", TICK_SCHEMA)
    assert t2.to_df().count() == 15
    assert t2.current_version() == 3


def test_current_version_survives_stale_hint_and_expired_v0(catalog, spark):
    """Walk-up anchored at an expired version must fall back to the
    directory listing instead of raising or resetting."""
    import os

    catalog.create_namespace("gold")
    t = catalog.create_table("gold.ticks", TICK_SCHEMA)
    for year in (2020, 2021, 2022):
        t.append(tick_df(spark, year=year, n=3))
    expire_snapshots(t, older_than_ms=(1 << 62), retain_last=2, orphan_grace_secs=0)
    os.remove(os.path.join(t.metadata_dir, "version-hint.text"))
    assert t.current_version() == 3


def test_rewrite_conflicts_with_concurrent_append(catalog, spark):
    """Compaction derived from version N must raise CommitConflict when an
    append lands at N+1 mid-rewrite - not silently drop the new files."""
    catalog.create_namespace("gold")
    t = catalog.create_table("gold.ticks", TICK_SCHEMA)
    for year in (2020, 2021, 2022):
        t.append(tick_df(spark, year=year, n=4).coalesce(1))
    snap = t.snapshot()
    small = snap.manifest  # all files are tiny: compact everything
    rewritten = t._write_files(
        t.scan(snapshot=snap).repartition(1), snap.partition_spec
    )
    # a concurrent append commits while the rewrite job runs
    t.append(tick_df(spark, year=2023, n=4))
    with pytest.raises(CommitConflict):
        t.overwrite_manifest(
            rewritten, operation="replace", base_version=snap.version
        )
    # nothing lost: the concurrent append's rows are all present
    assert t.to_df().count() == 16
    # and the retried compaction (re-read base) succeeds
    assert compact(t, target_file_bytes=64 * 1024 * 1024) is not None
    assert t.to_df().count() == 16


def test_compactor_racing_appenders_loses_nothing(catalog, spark):
    """Multi-writer stress: appender threads race a compactor that
    retries on CommitConflict. Every appended row must survive, and the
    final manifest must be consistent (manifest row counts == scan)."""
    import threading

    catalog.create_namespace("gold")
    t = catalog.create_table("gold.ticks", TICK_SCHEMA)
    t.append(tick_df(spark, year=2019, n=4).coalesce(1))
    errors: list[Exception] = []

    def appender(year: int):
        try:
            t.append(tick_df(spark, year=year, n=4).coalesce(1))
        except Exception as e:  # pragma: no cover - failure recorded
            errors.append(e)

    def compactor():
        # retry budget sized for a LOADED box: with 4 appenders racing
        # on a machine also running other Spark JVMs, 6 retries can
        # legitimately starve (observed once in a 3-suite parallel run)
        # - the invariant under test is lost-rows, not retry latency
        for _ in range(16):
            try:
                compact(t, target_file_bytes=64 * 1024 * 1024)
                return
            except CommitConflict:
                continue  # re-read and retry, Iceberg-style
        errors.append(AssertionError("compaction never succeeded"))

    threads = [
        threading.Thread(target=appender, args=(2020 + i,)) for i in range(4)
    ]
    threads.append(threading.Thread(target=compactor))
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert not errors, errors
    snap = t.snapshot()
    assert t.to_df().count() == 20  # 5 batches x 4 rows, none lost
    assert sum(e["rows"] for e in snap.manifest) == 20


def test_year_prune_handles_null_partition_values(catalog, spark):
    """Rows with null DateTime (admitted by the <=5% null QC gate) land in
    __HIVE_DEFAULT_PARTITION__; a pruned scan must keep that file as
    unprunable rather than raise ValueError."""
    catalog.create_namespace("gold")
    spec = [PartitionField("DateTime", "years", "DateTime_year")]
    t = catalog.create_table("gold.ticks", TICK_SCHEMA, spec)
    with_null = tick_df(spark, year=2024, n=20).unionByName(
        spark.createDataFrame([(None, 1.5, 1.6)], TICK_SCHEMA)
    )
    t.append(with_null)
    parts = {
        e["partition"].get("DateTime_year") for e in t.snapshot().manifest
    }
    assert "__HIVE_DEFAULT_PARTITION__" in parts, parts

    pruned = t.scan(file_filter=year_prune("DateTime", year_min=2024))
    assert pruned.count() == 21  # null-partition file kept, no crash
    # pruning away 2024 still keeps the (unprunable) null file only
    off_range = t.scan(file_filter=year_prune("DateTime", year_max=2000))
    assert off_range.filter(F.col("DateTime").isNull()).count() == 1


def test_bucket_prune_handles_non_numeric_partition(catalog, spark):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        bucket_prune,
    )

    f = PartitionField("user_id", "bucket", "user_bucket", n_buckets=8)
    keep = bucket_prune(f, 42)(3)
    assert keep({"partition": {"user_bucket": "3"}})
    assert not keep({"partition": {"user_bucket": "5"}})
    assert keep({"partition": {"user_bucket": "__HIVE_DEFAULT_PARTITION__"}})
    assert keep({"partition": {}})


def test_expiry_protects_newest_version_on_timestamp_tie(catalog, spark):
    """Two commits can land in the same millisecond (metadata-only commits
    especially). Snapshot protection must rank the newer VERSION first on
    a timestamp tie - a stable timestamp-only sort protected the older
    snapshot, retaining a stale view and blocking manifest GC."""
    import json
    import os

    t = catalog.create_table("gold.tiebreak", TICK_SCHEMA, [])
    for _ in range(3):
        t.append(tick_df(spark, n=3))
    snap = t.snapshot()
    t.overwrite_manifest(
        snap.manifest, operation="replace", base_version=snap.version
    )
    # force every snapshot to the same timestamp: worst-case tie
    ts = None
    for v in range(t.current_version() + 1):
        p = os.path.join(t.metadata_dir, f"v{v}.json")
        with open(p) as f:
            d = json.load(f)
        ts = ts or d["timestamp_ms"]
        d["timestamp_ms"] = ts
        with open(p, "w") as f:
            json.dump(d, f)
    res = expire_snapshots(
        t, older_than_ms=2**62, retain_last=1, orphan_grace_secs=0.0
    )
    retained = [s.version for s in t.snapshots()]
    assert retained == [t.current_version()]
    assert res["deleted_manifests"] > 0


def test_auto_maintain_policy(spark, tmp_path):
    """The policy driver fires only what is due, honors table-property
    overrides, and reports dry runs without mutating anything."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        auto_maintain,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("m")
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    t = cat.create_table("m.t", df.schema)
    for i in range(10):  # ten tiny files
        t.append(df.filter(F.col("k") % 10 == i).coalesce(1))
    for i in range(6):  # six positional tombstone files
        delete_where(
            t, F.col("k") == i, mode="merge-on-read", positional=True
        )

    v_before = t.current_version()
    dry = auto_maintain(t, dry_run=True)
    assert t.current_version() == v_before  # dry run mutates nothing
    assert dry["compact"].startswith("would compact")
    assert dry["rewrite_position_deletes"].startswith("would consolidate")
    assert dry["expire_snapshots"] == "not due"

    # six equality tombstones on a distinct horizon-aligned column set
    for i in range(100, 106):
        delete_where(
            t, F.col("k") == i, mode="merge-on-read",
            equality_cols=["k"],
        )
    dry_eq = auto_maintain(t, dry_run=True)
    assert dry_eq["rewrite_equality_deletes"].startswith(
        "would consolidate"
    )

    report = auto_maintain(t)
    assert report["compact"] == "compacted"
    assert report["rewrite_position_deletes"] == "consolidated"
    # each keyed delete committed at its own sequence horizon, so the
    # trigger fires but per-(seq, cols) groups are singletons -> no-op
    # (mixed-seq tombstones must never combine)
    assert report["rewrite_equality_deletes"] == "no-op"
    # content is intact through the whole pass
    assert t.to_df().count() == 188
    # everything quiesced: a second pass finds nothing due
    report2 = auto_maintain(t)
    assert report2["compact"] == "not due"
    assert report2["rewrite_position_deletes"] == "not due"

    # property override: make the snapshot trigger fire
    t.set_properties(**{
        "maintenance.max-snapshots": "3",
        "history.expire.min-snapshots-to-keep": "2",
        "history.expire.max-snapshot-age-ms": "0",
    })
    report3 = auto_maintain(t)
    assert isinstance(report3["expire_snapshots"], dict)
    assert len(t.snapshots()) <= 3
    assert t.to_df().count() == 188


def test_compact_bounded_run_and_metrics(spark, tmp_path):
    """max_rewrite_bytes bounds one compaction run to whole partition
    groups; successive runs converge; table_metrics reads the manifest
    only and tracks the layout as it heals."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        compact,
        table_metrics,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
        PartitionField,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("m")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p")
    )
    t = cat.create_table("m.b", df.schema, [PartitionField("p")])
    for i in range(16):  # 4 small files per partition (p = k % 4)
        t.append(df.filter(F.col("k") % 16 == i).coalesce(1))
    m0 = table_metrics(t)
    assert m0["data_files"] == 16 and m0["partitions"] == 4
    assert m0["small_file_ratio"] == 1.0

    grp_bytes = sum(
        e["bytes"]
        for e in t.snapshot().data_entries
        if e["partition"].get("p") == "0"
    )
    snap = compact(t, max_rewrite_bytes=grp_bytes)
    assert snap is not None
    m1 = table_metrics(t)
    # exactly one partition group rewrote (4 small -> 1), others intact
    assert m1["data_files"] == 13
    assert t.to_df().count() == 400
    # the next runs converge without a budget
    compact(t)
    m2 = table_metrics(t)
    assert m2["data_files"] == 4 and m2["partitions"] == 4
    assert t.to_df().count() == 400


def test_table_level_sort_order_property(catalog, spark):
    """write.sort-order declared ONCE on the table drives every
    compaction: rewritten files carry narrow, disjoint Bid ranges."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        compact,
    )

    catalog.create_namespace("m2")
    t = catalog.create_table("m2.sorted", TICK_SCHEMA)
    t.set_properties(**{"write.sort-order": "Bid"})
    for i in range(4):  # interleaved ranges in every small file
        t.append(tick_df(spark, year=2020 + i, n=8).coalesce(1))
    assert compact(t, target_file_bytes=64 * 1024 * 1024) is not None
    entries = t.snapshot().data_entries
    spans = sorted(
        tuple(e["stats"]["Bid"])  # manifest stats are [min, max]
        for e in entries
        if "Bid" in (e.get("stats") or {})
    )
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # pairwise-disjoint: the sort applied
    assert t.to_df().count() == 32


def test_apply_retention_policy(spark, tmp_path):
    """r12: declarative row-level retention - the policy lives in table
    properties, apply_retention reads it, the CoW arm rewrites
    survivors, the MoR arm commits positional tombstones; no policy /
    nothing expired are clean no-ops; auto_maintain drives it first so
    the same call's compaction consolidates the tombstones."""
    import datetime as dtm

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        apply_retention,
        auto_maintain,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "rwh"))
    cat.create_namespace("m")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.expr(
            "timestampadd(DAY, CAST(id AS INT), "
            "TIMESTAMP '2024-01-01 00:00:00')"
        ).alias("ts"),
    )
    t = cat.create_table("m.ret", df.schema)
    t.append(df)

    # no policy -> no-op, no commit
    v0 = t.current_version()
    assert apply_retention(t) is None
    assert t.current_version() == v0

    # explicit cutoff (reproducible policy); dry run reports only
    t.set_properties(**{
        "retention.column": "ts",
        "retention.cutoff": "TIMESTAMP '2024-02-01 00:00:00'",
    })
    assert apply_retention(t, dry_run=True) == {"would_delete": 31}
    assert t.current_version() == v0
    snap = apply_retention(t)
    assert snap is not None and t.to_df().count() == 69
    assert t.to_df().agg(F.min("ts")).first()[0] == dtm.datetime(
        2024, 2, 1
    )
    # quiesced: nothing expired anymore
    assert apply_retention(t) is None

    # keep-days arm (now_ms pinned for determinism): keep 10 days
    # from a fake 'now' of 2024-03-01 -> cutoff 2024-02-20. Clearing
    # the explicit cutoff via the empty string is the supported path
    # (set_properties cannot delete keys; review r12 made '' falsy)
    fake_now = int(
        dtm.datetime(2024, 3, 1, tzinfo=dtm.timezone.utc).timestamp()
        * 1000
    )  # tz-pinned: naive .timestamp() would shift with the system TZ
    t.set_properties(**{"retention.cutoff": "", "retention.keep-days": "10"})
    snap = apply_retention(t, now_ms=fake_now)
    assert snap is not None
    assert t.to_df().agg(F.min("ts")).first()[0] == dtm.datetime(
        2024, 2, 20
    )

    # MoR arm + auto_maintain wiring: tombstones, then the SAME call's
    # consolidation pass (max-tombstone-files 0 pins the retention-
    # runs-FIRST ordering - the fresh tombstone must be counted by the
    # trigger below it; review r12)
    t.set_properties(**{
        "retention.cutoff": "TIMESTAMP '2024-03-01 00:00:00'",
        "retention.sql-mode": "merge-on-read",
        "maintenance.max-tombstone-files": "0",
    })
    report = auto_maintain(t, dry_run=True)
    assert report["retention"].startswith("would delete")
    report = auto_maintain(t)
    assert report["retention"] == "deleted (delete)"
    # the trigger COUNTED the fresh tombstone (pre-retention count was
    # 0 -> "not due"); one singleton file may consolidate or no-op,
    # but "not due" would mean retention ran after the count
    assert report["rewrite_position_deletes"] != "not due"
    assert t.to_df().agg(F.min("ts")).first()[0] == dtm.datetime(
        2024, 3, 1
    )
    report2 = auto_maintain(t)
    assert report2["retention"] == "nothing expired"

    # malformed policies REPORT, never brick the pass or silently
    # fall back (review r12): a typo'd mode, a missing horizon, and a
    # non-literal cutoff each name the bad property
    t.set_properties(**{"retention.sql-mode": "merge_on_read"})
    assert "policy error" in auto_maintain(t)["retention"]
    with pytest.raises(ValueError, match="sql-mode"):
        apply_retention(t)
    t.set_properties(**{
        "retention.sql-mode": "copy-on-write",
        "retention.cutoff": "",
        "retention.keep-days": "",
    })
    with pytest.raises(ValueError, match="no horizon"):
        apply_retention(t)
    t.set_properties(**{
        "retention.cutoff": "(SELECT max(ts) FROM somewhere)",
    })
    with pytest.raises(ValueError, match="literal"):
        apply_retention(t)
    # advice r13: a '-30' typo puts the cutoff in the FUTURE - a CoW
    # pass would rewrite/drop essentially the whole table. Non-positive
    # horizons are policy errors, never a silent full delete.
    t.set_properties(**{"retention.cutoff": "", "retention.keep-days": "-30"})
    with pytest.raises(ValueError, match="positive"):
        apply_retention(t)
    t.set_properties(**{"retention.keep-days": "0"})
    with pytest.raises(ValueError, match="positive"):
        apply_retention(t)
    rep = auto_maintain(t)
    assert "policy error" in rep["retention"]
    # ...and the rest of the pass still ran
    assert "compact" in rep and "expire_snapshots" in rep


def test_retention_lifecycle_composition(spark, tmp_path):
    """r13 (VERDICT r12 #5): retention composes with time travel,
    snapshot expiry, and compaction. A tag pinned BEFORE the retention
    delete still reads the pre-delete rows; an aggressive expiry honors
    the tag's pin (neither the snapshot nor its data files go); a later
    compaction materializes the merge-on-read tombstones away; and once
    the tag is dropped, expiry GCs the pre-retention files while the
    survivors keep reading correctly."""
    import datetime as dtm

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        apply_retention,
        expire_snapshots,
        materialize_deletes,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "rlc"))
    cat.create_namespace("m")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.expr(
            "timestampadd(DAY, CAST(id AS INT), "
            "TIMESTAMP '2024-01-01 00:00:00')"
        ).alias("ts"),
    )
    t = cat.create_table("m.ret2", df.schema)
    t.append(df)
    t.create_tag("pre_retention")
    t.set_properties(**{
        "retention.column": "ts",
        "retention.cutoff": "TIMESTAMP '2024-02-01 00:00:00'",
        "retention.sql-mode": "merge-on-read",
    })
    snap = apply_retention(t)
    assert snap is not None and t.to_df().count() == 69
    assert t.snapshot().delete_entries  # MoR: tombstones, not rewrite
    # time travel THROUGH the tag: pre-delete rows remain readable
    pinned = t.scan(snapshot=t.snapshot_by_tag("pre_retention"))
    assert pinned.count() == 100
    assert pinned.agg(F.min("ts")).first()[0] == dtm.datetime(2024, 1, 1)
    # aggressive expiry: the tagged snapshot (and its files) are pinned
    expire_snapshots(
        t, older_than_ms=10**18, retain_last=1, orphan_grace_secs=0.0
    )
    assert t.scan(snapshot=t.snapshot_by_tag("pre_retention")).count() == 100
    assert t.to_df().count() == 69
    # materialization rewrites the tombstoned files: the new snapshot
    # carries no delete entries and the survivors are unchanged
    # (compact() alone would no-op here - one data file per partition
    # is below its >=2-small-files grouping threshold)
    materialize_deletes(t)
    assert not t.snapshot().delete_entries
    assert t.to_df().count() == 69
    assert t.to_df().agg(F.min("ts")).first()[0] == dtm.datetime(2024, 2, 1)
    # drop the pin: expiry may now GC the pre-retention generation,
    # and the current read stays correct on the compacted files
    t.drop_tag("pre_retention")
    res = expire_snapshots(
        t, older_than_ms=10**18, retain_last=1, orphan_grace_secs=0.0
    )
    assert res["deleted_files"] > 0
    assert t.to_df().count() == 69
    import pytest as _pytest

    with _pytest.raises(Exception):
        t.snapshot_by_tag("pre_retention")


def test_retention_delete_refreshes_mv_incrementally(spark, tmp_path):
    """r13: retention composes with the MV CDC tier - the TTL pass is
    ordinary DML (a merge-on-read delete with a signed changelog), so
    a COUNT/SUM MV over the table refreshes O(delta) from the
    changelog (cdc_refresh stamped), never a full recompute, and
    equals the plain GROUP BY over the survivors."""
    import datetime as dtm

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        apply_retention,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "rmv"))
    cat.create_namespace("m")
    df = spark.range(0, 90).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("g"),
        F.expr(
            "timestampadd(DAY, CAST(id AS INT), "
            "TIMESTAMP '2024-01-01 00:00:00')"
        ).alias("ts"),
    )
    t = cat.create_table("m.retmv", df.schema)
    t.append(df)
    q = "SELECT g, COUNT(*) AS n, SUM(k) AS sk FROM m_retmv GROUP BY g"
    cat.create_materialized_view("m.retmv_agg", q)
    t.set_properties(**{
        "retention.column": "ts",
        "retention.cutoff": "TIMESTAMP '2024-02-01 00:00:00'",
        "retention.sql-mode": "merge-on-read",
    })
    assert apply_retention(t) is not None
    assert t.to_df().count() == 59
    snap = cat.refresh_materialized_view("m.retmv_agg")
    assert snap is not None and snap.summary.get("cdc_refresh") is True
    cat.register_views()
    got = {tuple(r) for r in spark.sql("SELECT * FROM m_retmv_agg").collect()}
    want = {tuple(r) for r in spark.sql(q).collect()}
    assert got == want
    assert t.to_df().agg(F.min("ts")).first()[0] == dtm.datetime(2024, 2, 1)


@pytest.mark.slow
def test_multi_stream_txn_maintain_soak(spark, tmp_path):
    """VERDICT r13 #6: two streaming sinks (distinct query_ids), a
    multi-table transaction runner, and sink-driven auto_maintain all
    hammering ONE warehouse concurrently. Invariants: no lost rows, no
    double-appends (replay after stamp expiry included), per-query
    watermarks monotonic and independent (the r14 sidecar split), GC
    never collects staged files, transactions stay all-or-nothing."""
    import os
    import threading

    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.streaming.sink import (  # noqa: E501
        EpochCommitSink,
        _read_watermark,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.transactions import (  # noqa: E501
        _txn_dir,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("gold")
    tgt = cat.create_table(
        "gold.soak",
        spark.createDataFrame([], "qid string, epoch long, i long").schema,
    )
    # aggressive expiry so the soak actually prunes epoch stamps and
    # the replay guard has to lean on the per-query watermark sidecars
    tgt.set_properties(**{
        "maintenance.max-snapshots": "8",
        "history.expire.min-snapshots-to-keep": "4",
        "history.expire.max-snapshot-age-ms": "0",
    })
    a_tbl = cat.create_table(
        "gold.soak_a", spark.createDataFrame([], "k long, v long").schema
    )
    b_tbl = cat.create_table(
        "gold.soak_b", spark.createDataFrame([], "run string, n long").schema
    )
    # a staged batch held open across the whole soak: maintenance's
    # orphan GC must never collect marker-protected files
    held_sid = tgt.stage_append(
        spark.createDataFrame(
            [("held", 0, 0)], "qid string, epoch long, i long"
        ).coalesce(1)
    )

    EPOCHS = 6
    errors: list[Exception] = []

    def batch(qid: str, e: int):
        return spark.createDataFrame(
            [(qid, e, i) for i in range(3)],
            "qid string, epoch long, i long",
        ).coalesce(1)

    def stream(qid: str):
        try:
            sink = EpochCommitSink(tgt, query_id=qid, maintain_every=2)
            for e in range(EPOCHS):
                sink(batch(qid, e), e)
        except Exception as exc:  # pragma: no cover - recorded
            errors.append(exc)

    def txns():
        try:
            for i in range(3):
                with cat.transaction() as txn:
                    txn.append(
                        "gold.soak_a",
                        spark.createDataFrame(
                            [(i, i)], "k long, v long"
                        ).coalesce(1),
                    )
                    txn.append(
                        "gold.soak_b",
                        spark.createDataFrame(
                            [(f"r{i}", 1)], "run string, n long"
                        ).coalesce(1),
                    )
        except Exception as exc:  # pragma: no cover - recorded
            errors.append(exc)

    threads = [
        threading.Thread(target=stream, args=("qa",)),
        threading.Thread(target=stream, args=("qb",)),
        threading.Thread(target=txns),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    # no lost rows, no double-appends: every (qid, epoch) cell exactly 3
    cells = {
        (r["qid"], r["epoch"]): r["n"]
        for r in tgt.to_df().groupBy("qid", "epoch").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert cells == {
        (q, e): 3 for q in ("qa", "qb") for e in range(EPOCHS)
    }
    # watermarks advanced independently per query (r14 sidecar files)
    assert _read_watermark(tgt, "qa") == EPOCHS - 1
    assert _read_watermark(tgt, "qb") == EPOCHS - 1
    # fresh-checkpoint full replay of BOTH queries is a no-op, even
    # though the aggressive expiry pruned early epoch stamps
    total = tgt.to_df().count()
    for qid in ("qa", "qb"):
        fresh = EpochCommitSink(tgt, query_id=qid)
        for e in range(EPOCHS):
            fresh(batch(qid, e), e)
    assert tgt.to_df().count() == total
    # transactions landed all-or-nothing, no residue
    assert a_tbl.to_df().count() == 3 and b_tbl.to_df().count() == 3
    assert a_tbl.list_staged() == [] and b_tbl.list_staged() == []
    assert [
        n for n in os.listdir(_txn_dir(cat))
        if not n.startswith(".")
    ] == []
    # the held staged batch survived every maintenance pass
    assert held_sid in tgt.list_staged()
    assert tgt.staged_scan(held_sid).count() == 1
    tgt.abort_staged(held_sid)
