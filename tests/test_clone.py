"""Shallow (zero-copy) clone: a new table referencing the source's
data files by relative path - one metadata commit, full divergence
afterwards, GC-safe in both directions (clone GC never touches the
source; the default source tag pins cloned files against source
expiry)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
    LakehouseCatalog,
)


@pytest.fixture
def cat(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "wh"))


def _seed(spark, cat, ident="src.t", n=100):
    cat.create_namespace(ident.rsplit(".", 1)[0])
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    t = cat.create_table(ident, df.schema)
    t.append(df.filter(F.col("k") < n // 2))
    t.append(df.filter(F.col("k") >= n // 2))
    return t


def test_clone_zero_copy_and_content(spark, cat):
    src = _seed(spark, cat)
    clone = cat.clone_table("src.t", "dev.t")
    assert clone.to_df().count() == 100
    assert sorted(r["k"] for r in clone.to_df().collect()) == list(range(100))
    # zero copy: nothing landed under the clone's data dir
    assert not any(
        files for _, _, files in os.walk(clone.data_dir)
    ), "shallow clone must not copy data files"
    s = clone.snapshot()
    assert s.operation == "clone"
    assert s.summary["cloned_from"] == "src.t"
    # every entry is an external (../) reference
    assert all(e["path"].startswith("..") for e in s.data_entries)


def test_clone_divergence_both_ways(spark, cat):
    src = _seed(spark, cat)
    clone = cat.clone_table("src.t", "dev.t2")
    clone.append(
        spark.range(1000, 1010).select(
            F.col("id").alias("k"), F.lit(0).alias("g")
        )
    )
    assert clone.to_df().count() == 110
    assert src.to_df().count() == 100  # source untouched
    src.append(
        spark.range(2000, 2005).select(
            F.col("id").alias("k"), F.lit(1).alias("g")
        )
    )
    assert clone.to_df().count() == 110  # clone pinned to its lineage
    # CoW DML on the clone rewrites into the CLONE's location only
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )

    before_src_files = {
        e["path"] for e in src.snapshot().data_entries
    }
    delete_where(clone, F.col("k") < 10)
    assert clone.to_df().count() == 100
    assert src.to_df().count() == 105
    assert {e["path"] for e in src.snapshot().data_entries} == before_src_files


def test_clone_pinned_version_and_row_lineage(spark, cat):
    src = _seed(spark, cat)
    v_mid = src.current_version()
    src.append(
        spark.range(500, 510).select(
            F.col("id").alias("k"), F.lit(2).alias("g")
        )
    )
    clone = cat.clone_table("src.t", "dev.t3", version=v_mid)
    assert clone.to_df().count() == 100  # pre-append state
    # row lineage carries over: cloned rows keep their source ids
    src_ids = {
        r["_row_id"]
        for r in src.scan_lineage(snapshot=src.snapshot(v_mid)).collect()
    }
    clone_ids = {r["_row_id"] for r in clone.scan_lineage().collect()}
    assert clone_ids == src_ids
    # and fresh clone appends continue past the source counter
    clone.append(
        spark.range(600, 603).select(
            F.col("id").alias("k"), F.lit(3).alias("g")
        )
    )
    new_ids = {r["_row_id"] for r in clone.scan_lineage().collect()} - src_ids
    assert len(new_ids) == 3
    assert min(new_ids) >= max(src_ids) + 1


def test_clone_refuses_pending_tombstones(spark, cat):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.dml import (
        delete_where,
    )

    src = _seed(spark, cat)
    delete_where(
        src, F.col("k") < 5, mode="merge-on-read", positional=True
    )
    with pytest.raises(ValueError, match="materialize_deletes"):
        cat.clone_table("src.t", "dev.t4")


def test_clone_pin_survives_source_expiry(spark, cat):
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        compact,
        expire_snapshots,
    )

    src = _seed(spark, cat)
    clone = cat.clone_table("src.t", "dev.t5")
    # source moves on and aggressively expires history
    compact(src)
    res = expire_snapshots(
        src, older_than_ms=10**18, retain_last=1, orphan_grace_secs=0
    )
    assert res["expired_snapshots"] > 0
    # the clone-<name> tag pinned the cloned snapshot: files survive
    assert clone.to_df().count() == 100
    assert any(
        r["name"] == "clone-dev_t5" for r in src.inspect_refs().collect()
    )
    # dropping the pin releases the files to future GC (contract check
    # only - we don't re-expire here)
    src.drop_tag("clone-dev_t5")


def test_sql_clone_verb_and_scan_estimate(spark, cat):
    """CREATE TABLE ... SHALLOW CLONE ... [VERSION AS OF n] routes to
    clone_table; scan_estimate answers pruning questions from the
    manifest alone."""
    src = _seed(spark, cat)
    v1 = src.current_version()
    src.append(
        spark.range(100, 150).select(
            F.col("id").alias("k"), F.lit(9).alias("g")
        )
    )
    # bare CLONE means a DEEP copy in Delta - the SQL surface demands
    # the explicit SHALLOW keyword rather than silently zero-copying
    import pytest as _pytest

    with _pytest.raises(ValueError, match="SHALLOW"):
        cat.sql(f"CREATE TABLE dev.sqlclone CLONE src.t VERSION AS OF {v1}")
    out = cat.sql(
        f"CREATE TABLE dev.sqlclone SHALLOW CLONE src.t VERSION AS OF {v1}"
    ).first()
    assert out["operation"] == "clone"
    clone = cat.load_table("dev.sqlclone")
    assert clone.to_df().count() == 100  # pinned pre-append state

    est = src.scan_estimate({"k": (0, 49)})
    assert est["total_rows"] == 150
    assert est["scanned_rows"] == 50  # stats-pruned to the low range
    assert est["scanned_files"] < est["total_files"]
    assert est["scanned_bytes"] < est["total_bytes"]
    assert est["pending_delete_files"] == 0
    # no bounds = whole table
    assert src.scan_estimate()["scanned_rows"] == 150


def test_clone_localize_via_materialize_external(spark, cat):
    """materialize_external_files turns a shallow clone into a fully
    independent deep copy: data lands under the clone's own location,
    no external references remain, contents identical - after which
    the source pin can be dropped safely."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        expire_snapshots,
        materialize_external_files,
    )

    src = _seed(spark, cat)
    clone = cat.clone_table("src.t", "dev.t6")
    snap = materialize_external_files(clone)
    assert snap is not None
    assert not any(
        e["path"].startswith("..") for e in clone.snapshot().data_entries
    )
    assert clone.to_df().count() == 100
    # now the clone survives even a FULL source teardown
    src.drop_tag("clone-dev_t6")
    src.restore_to(src.current_version())  # no-op guard keeps src valid
    cat.sql("TRUNCATE TABLE src.t")
    expire_snapshots(
        src, older_than_ms=10**18, retain_last=1, orphan_grace_secs=0
    )
    assert clone.to_df().count() == 100
    assert sorted(r["k"] for r in clone.to_df().collect()) == list(range(100))


def test_clone_failure_drops_pin(spark, cat):
    """A clone that fails mid-way must not leave its pin tag on the
    source (a dangling pin would block GC forever)."""
    src = _seed(spark, cat)
    # force a failure AFTER the pin: destination namespace dir is a file
    wh_dev = os.path.join(cat.warehouse, "dev2")
    os.makedirs(os.path.dirname(wh_dev), exist_ok=True)
    open(wh_dev, "w").write("not a dir")
    with pytest.raises(Exception):
        cat.clone_table("src.t", "dev2.t")
    assert not any(
        r["name"].startswith("clone-dev2")
        for r in src.inspect_refs().collect()
    )


def test_drop_clone_releases_source_pin(spark, cat):
    """Dropping a clone drops its pin tag on the source, so source GC
    unblocks and a re-clone to the same name works."""
    src = _seed(spark, cat)
    cat.clone_table("src.t", "dev.t7")
    assert any(
        r["name"] == "clone-dev_t7" for r in src.inspect_refs().collect()
    )
    cat.drop_table("dev.t7")
    assert not any(
        r["name"] == "clone-dev_t7" for r in src.inspect_refs().collect()
    )
    clone2 = cat.clone_table("src.t", "dev.t7")  # re-clone succeeds
    assert clone2.to_df().count() == 100


def test_chained_clone_pins_original_root(spark, cat):
    """clone2 of clone1 references the ORIGINAL table's files ('../'
    entries re-resolve through clone1). Dropping clone1 must not let
    the original expire files clone2 still reads: chain-cloning pins
    every external root clone2 reaches (ADVICE r7)."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.maintenance import (
        compact,
        expire_snapshots,
    )

    src = _seed(spark, cat)
    cat.clone_table("src.t", "dev.c1")
    clone2 = cat.clone_table("dev.c1", "dev.c2")
    # clone2 carries its OWN pin tag on the original root
    assert any(
        r["name"] == "clone-dev_c2" for r in src.inspect_refs().collect()
    )
    assert "src.t" in clone2.properties()["clone.source"]
    # drop the intermediate clone (releases ITS pin only), then churn
    # the original hard: compaction + zero-grace expiry
    cat.drop_table("dev.c1")
    assert not any(
        r["name"] == "clone-dev_c1" for r in src.inspect_refs().collect()
    )
    compact(src)
    expire_snapshots(
        src, older_than_ms=10**18, retain_last=1, orphan_grace_secs=0
    )
    assert clone2.to_df().count() == 100  # files survived
    # dropping clone2 releases the chained pin too
    cat.drop_table("dev.c2")
    assert not any(
        r["name"] == "clone-dev_c2" for r in src.inspect_refs().collect()
    )


def test_chained_clone_refuses_unpinnable_provenance(spark, cat):
    """A chain-clone whose source pin on the original was already
    released cannot be made safe - refuse loudly instead of silently
    exposing clone2 to source GC."""
    src = _seed(spark, cat)
    cat.clone_table("src.t", "dev.c3")
    src.drop_tag("clone-dev_c3")  # user manually released the pin
    with pytest.raises(ValueError, match="refusing to chain-clone"):
        cat.clone_table("dev.c3", "dev.c4")
    # pin_source=False still allowed: the caller owns the hazard
    c4 = cat.clone_table("dev.c3", "dev.c4", pin_source=False)
    assert c4.to_df().count() == 100
