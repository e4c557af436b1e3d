"""Divergent branch writes (Iceberg branch commits + the full
write-audit-publish-with-retries pattern): a branch accumulates its own
commits in an isolated chain under metadata/branches/<name>/, diverges
from main in both directions, and publishes back via fast-forward (main
unmoved) or append-only rebase (main moved). Generalizes the r6 ref
branches (q6f) and staged appends (q6b)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
    LakehouseCatalog,
)
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.table import (
    CommitConflict,
)


@pytest.fixture
def cat(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "wh"))


def _seed(spark, cat, ident="b.t", n=100):
    cat.create_namespace(ident.rsplit(".", 1)[0])
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    t = cat.create_table(ident, df.schema)
    t.append(df)
    return t


def _rng(spark, lo, hi, g=9):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(g).alias("g")
    )


def test_branch_diverges_both_ways(spark, cat):
    t = _seed(spark, cat)
    t.create_branch("dev")
    bt = t.branch("dev")
    # branch accumulates its own commits...
    bt.append(_rng(spark, 100, 120))
    bt.append(_rng(spark, 120, 130))
    assert bt.to_df().count() == 130
    assert t.to_df().count() == 100  # main untouched
    # ...and main diverges independently
    t.append(_rng(spark, 500, 505, g=1))
    assert t.to_df().count() == 105
    assert bt.to_df().count() == 130  # branch untouched
    # branch chain has its own linear history: time travel inside it
    chain = bt.snapshots()
    assert chain[0].operation == "branch-fork"
    assert [s.operation for s in chain[1:]] == ["append", "append"]
    assert bt.scan(snapshot=chain[1]).count() == 120


def test_branch_dml_and_incremental_scan(spark, cat):
    """Every table operation works on the branch handle - it IS a
    table: CoW delete, incremental read, compaction."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        compact,
    )

    t = _seed(spark, cat)
    t.create_branch("dev")
    bt = t.branch("dev")
    v0 = bt.current_version()
    bt.append(_rng(spark, 100, 150))
    inc = bt.scan_incremental(from_version=v0)
    assert inc.count() == 50  # the branch-appended rows
    delete_where(bt, F.col("k") < 10)
    assert bt.to_df().count() == 140
    assert t.to_df().count() == 100  # main never sees branch DML
    compact(bt)
    assert bt.to_df().count() == 140
    assert t.to_df().count() == 100


def test_branch_publish_fast_forward(spark, cat):
    t = _seed(spark, cat)
    t.create_branch("dev")
    bt = t.branch("dev")
    bt.append(_rng(spark, 100, 140))
    main_v = t.current_version()
    pub = t.publish_branch("dev")
    assert pub.operation == "publish"
    assert pub.version == main_v + 1
    assert t.to_df().count() == 140
    # row ids carried over unchanged (fast-forward preserves lineage)
    ids = [r["_row_id"] for r in t.scan_lineage().collect()]
    assert sorted(ids) == list(range(140))
    # ref advanced to the published version; chain is gone
    assert t.refs()["dev"] == pub.version
    assert "dev" not in t.branch_names()
    # re-branching forks from the NEW pin
    bt2 = t.branch("dev")
    assert bt2.to_df().count() == 140


def test_branch_publish_rebase_when_main_moved(spark, cat):
    t = _seed(spark, cat)
    t.create_branch("dev")
    bt = t.branch("dev")
    bt.append(_rng(spark, 100, 130))
    t.append(_rng(spark, 500, 520, g=1))  # main moves: no fast-forward
    pub = t.publish_branch("dev")
    assert pub.summary.get("rebased") is True
    assert t.to_df().count() == 150  # 100 + 20 (main) + 30 (branch)
    # main's concurrent rows survived - nothing was undone
    ks = {r["k"] for r in t.to_df().collect()}
    assert set(range(500, 520)) <= ks and set(range(100, 130)) <= ks
    # rebase re-stamps row ids from the main counter: no duplicates
    ids = [r["_row_id"] for r in t.scan_lineage().collect()]
    assert len(ids) == len(set(ids)) == 150


def test_branch_publish_conflicts(spark, cat):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )

    t = _seed(spark, cat)
    t.create_branch("dev")
    bt = t.branch("dev")
    bt.append(_rng(spark, 100, 110))
    t.append(_rng(spark, 500, 510, g=1))
    # fast_forward_only refuses once main moved
    with pytest.raises(CommitConflict, match="fast_forward_only"):
        t.publish_branch("dev", mode="fast_forward_only")
    # a branch holding non-append commits cannot auto-rebase
    delete_where(bt, F.col("k") < 5)
    with pytest.raises(CommitConflict, match="non-append"):
        t.publish_branch("dev")
    # abandoning the chain leaves main intact and the ref pinned
    t.drop_branch_chain("dev")
    assert "dev" not in t.branch_names()
    assert t.to_df().count() == 110


def test_branch_cross_writer_commit_conflict(spark, cat):
    """Two writers on the SAME branch chain serialize through the
    O_EXCL version file: a rewrite computed against a stale base
    raises instead of silently dropping the other writer's commit."""
    t = _seed(spark, cat)
    t.create_branch("dev")
    b1 = t.branch("dev")
    b2 = t.branch("dev")
    base = b1.current_version()
    b2.append(_rng(spark, 100, 110))  # writer 2 lands first
    with pytest.raises(CommitConflict, match="re-read and retry"):
        b1.overwrite_manifest(
            list(b1.snapshot(base).manifest),
            operation="rewrite",
            base_version=base,
        )
    # plain appends rebase-and-retry instead of failing
    b1.append(_rng(spark, 200, 205))
    assert b1.to_df().count() == 115


def test_branch_gc_safety(spark, cat):
    """Main orphan GC must not delete branch-written files (shared data
    dir), and branch-driven expiry is forced metadata-only."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        expire_snapshots,
    )

    t = _seed(spark, cat)
    t.create_branch("dev")
    bt = t.branch("dev")
    bt.append(_rng(spark, 100, 160))
    # aggressive main expiry with zero grace: branch files must survive
    expire_snapshots(
        t, older_than_ms=10**18, retain_last=1, orphan_grace_secs=0
    )
    assert bt.to_df().count() == 160
    assert t.to_df().count() == 100
    # branch-driven expiry cannot GC the shared data dir
    res = expire_snapshots(
        bt, older_than_ms=10**18, retain_last=1, orphan_grace_secs=0
    )
    assert res["deleted_files"] == 0
    assert t.to_df().count() == 100
    assert bt.to_df().count() == 160
    # after dropping the chain, its files become GC-able orphans
    t.drop_branch_chain("dev")
    res2 = expire_snapshots(
        t, older_than_ms=10**18, retain_last=1, orphan_grace_secs=0
    )
    assert res2["deleted_files"] > 0
    assert t.to_df().count() == 100  # main still whole


def test_branch_constraints_shared_with_main(spark, cat):
    """Properties (CHECK constraints) are table-level: a branch must
    not launder constraint-violating rows into main via publish."""
    t = _seed(spark, cat)
    t.add_constraint("k_nonneg", "k >= 0")
    t.create_branch("dev")
    bt = t.branch("dev")
    with pytest.raises(ValueError, match="k_nonneg"):
        bt.append(_rng(spark, -10, -5))
    bt.append(_rng(spark, 100, 105))
    assert bt.to_df().count() == 105


def test_branch_requires_ref(spark, cat):
    t = _seed(spark, cat)
    with pytest.raises(ValueError, match="create_branch"):
        t.branch("nope")
    t.create_branch("dev")
    # publishing before any chain exists is refused loudly
    with pytest.raises(ValueError, match="no divergent commits"):
        t.publish_branch("dev")
    with pytest.raises(ValueError, match="branches of branches"):
        t.branch("dev").branch("dev2")
    # a forked-but-never-written branch publishes as a no-op
    pub = t.publish_branch("dev")
    assert pub.version == t.current_version()


def test_branch_publish_after_branch_expiry(spark, cat):
    """Branch expiry may remove the fork seed from the chain; the
    rebase delta must derive from MAIN's pinned fork snapshot, not
    chain[0] - otherwise branch-appended rows silently vanish at
    publish (r8 review finding)."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        expire_snapshots,
    )

    t = _seed(spark, cat)
    t.create_branch("dev")
    bt = t.branch("dev")
    bt.append(_rng(spark, 100, 120))
    bt.append(_rng(spark, 120, 140))
    bt.append(_rng(spark, 140, 160))
    # expire the branch's own history down to the head (drops the seed)
    expire_snapshots(
        bt, older_than_ms=10**18, retain_last=1, orphan_grace_secs=0
    )
    assert len(bt.snapshots()) == 1
    assert bt.snapshots()[0].operation == "append"
    t.append(_rng(spark, 500, 510, g=1))  # main moves: rebase path
    pub = t.publish_branch("dev")
    assert pub.summary.get("rebased") is True
    ks = {r["k"] for r in t.to_df().collect()}
    assert set(range(100, 160)) <= ks  # ALL branch rows survived
    assert t.to_df().count() == 170


def test_branch_publish_refuses_hidden_nonappend_effect(spark, cat):
    """If branch expiry hid a DML commit from the op walk, its EFFECT
    (fork-era files missing from the head) still blocks the rebase."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        expire_snapshots,
    )

    t = _seed(spark, cat)
    t.create_branch("dev")
    bt = t.branch("dev")
    bt.append(_rng(spark, 100, 110))
    delete_where(bt, F.col("k") < 5)  # CoW: fork files rewritten
    expire_snapshots(
        bt, older_than_ms=10**18, retain_last=1, orphan_grace_secs=0
    )
    t.append(_rng(spark, 500, 505, g=1))  # main moves
    with pytest.raises(CommitConflict, match="fork-era"):
        t.publish_branch("dev")


def test_sql_version_as_of_branch_reads_branch_head(spark, cat):
    """VERSION AS OF '<branch>' must serve the BRANCH HEAD for a
    divergent branch (the main-chain ref pin stays at the fork until
    publish and would silently hide staged commits - r8 review
    finding); tags keep resolving through the pin."""
    t = _seed(spark, cat)
    t.create_branch("etl")
    bt = t.branch("etl")
    bt.append(_rng(spark, 100, 130))
    n = cat.sql(
        "SELECT COUNT(*) AS n FROM b.t VERSION AS OF 'etl'"
    ).first()["n"]
    assert n == 130  # head, not the fork pin (100)
    t.create_tag("audit")
    t.append(_rng(spark, 500, 510, g=1))
    assert (
        cat.sql(
            "SELECT COUNT(*) AS n FROM b.t VERSION AS OF 'audit'"
        ).first()["n"]
        == 100
    )


def test_sql_restore_rejects_branch_and_bad_targets(spark, cat):
    t = _seed(spark, cat)
    t.create_tag("good")
    t.append(_rng(spark, 100, 110))
    out = cat.sql("RESTORE TABLE b.t TO VERSION AS OF 'good'").first()
    assert out["operation"] == "restore"
    assert t.to_df().count() == 100
    t.create_branch("dev")
    t.branch("dev").append(_rng(spark, 200, 205))
    with pytest.raises(ValueError, match="publish_branch"):
        cat.sql("RESTORE TABLE b.t TO VERSION AS OF 'dev'")
    with pytest.raises(ValueError, match="ISO timestamp"):
        cat.sql("RESTORE TABLE b.t TO TIMESTAMP AS OF '170000'")
    with pytest.raises(ValueError, match="neither"):
        cat.sql("RESTORE TABLE b.t TO VERSION AS OF 'missing'")


def test_sql_call_arity_errors(spark, cat):
    t = _seed(spark, cat)
    with pytest.raises(ValueError, match="integer"):
        cat.sql("CALL system.cherrypick_snapshot('b.t')")
    with pytest.raises(ValueError, match="branch name"):
        cat.sql("CALL system.publish_branch('b.t')")
    with pytest.raises(ValueError, match="trailing"):
        cat.sql("CALL system.create_tag('b.t', 'x', 'y')")
    del t
