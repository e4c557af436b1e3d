"""Ingest-pipeline parity tests against the reference's semantics, using
the Family B fixture variants specified in FIXTURES.md (10 cases from
``/root/reference/lakehouse_pipeline.py`` quality gates + dedup).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.ingest import (
    IngestPipeline,
)

BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def tick_table(n=120, start=BASE, bid=None, ask=None, dtype="float64", step_s=1):
    ts = [start + dt.timedelta(seconds=i * step_s) for i in range(n)]
    bid = bid if bid is not None else [1.1 + 0.0001 * i for i in range(n)]
    ask = ask if ask is not None else [1.2 + 0.0001 * i for i in range(n)]
    return pa.table(
        {
            "DateTime": pa.array(ts, type=pa.timestamp("us")),
            "Bid": pa.array(np.array(bid, dtype=dtype)),
            "Ask": pa.array(np.array(ask, dtype=dtype)),
        }
    )


def write(dirpath, name, table):
    dirpath.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, dirpath / name)


@pytest.fixture
def pipeline(spark, tmp_path):
    return IngestPipeline(spark, str(tmp_path / "warehouse"))


@pytest.fixture
def source(tmp_path):
    return tmp_path / "Training Batch"


def test_clean_file_ingests_fully(pipeline, source):
    """Variant 1: clean_100plus -> all rows land."""
    write(source / "EURUSD", "clean.parquet", tick_table(n=120))
    s = pipeline.run(str(source))
    assert s.rows_appended == 120
    assert s.files_rejected == 0
    t = pipeline.catalog.load_table("gold.eurusd")
    assert t.to_df().count() == 120


def test_too_few_rows_rejected(pipeline, source):
    """Variant 2: 99 rows < MIN_ROWS_THRESHOLD=100 -> rejected."""
    write(source / "EURUSD", "small.parquet", tick_table(n=99))
    s = pipeline.run(str(source))
    assert s.rows_appended == 0
    assert s.files_rejected == 1
    assert any("too few rows" in i for i in s.quality_issues)


def test_missing_column_rejected(pipeline, source):
    """Variant 3: no Ask column -> rejected at schema level."""
    t = tick_table(n=120).drop_columns(["Ask"])
    write(source / "EURUSD", "noask.parquet", t)
    s = pipeline.run(str(source))
    assert s.files_rejected == 1
    assert any("missing required columns" in i for i in s.quality_issues)


def test_nulls_over_5pct_rejected(pipeline, source):
    """Variant 4: 6% nulls in Bid -> rejected (MAX_NULL_PCT=0.05)."""
    n = 200
    bid = [None if i < 12 else 1.1 for i in range(n)]  # 6%
    t = tick_table(n=n)
    t = t.set_column(1, "Bid", pa.array(bid, type=pa.float64()))
    write(source / "EURUSD", "nulls.parquet", t)
    s = pipeline.run(str(source))
    assert s.files_rejected == 1
    assert any("null ratio" in i for i in s.quality_issues)


def test_nulls_at_boundary_accepted(pipeline, source):
    """Threshold is exclusive: exactly 5% nulls passes (<= MAX_NULL_PCT)."""
    n = 200
    bid = [None if i < 10 else 1.1 for i in range(n)]  # exactly 5%
    t = tick_table(n=n)
    t = t.set_column(1, "Bid", pa.array(bid, type=pa.float64()))
    write(source / "EURUSD", "boundary.parquet", t)
    s = pipeline.run(str(source))
    assert s.files_rejected == 0
    assert s.rows_appended == n


def test_nonpositive_price_rejected(pipeline, source):
    """Variant 5: one Bid == 0 -> rejected."""
    bid = [1.1] * 120
    bid[7] = 0.0
    write(source / "EURUSD", "zero.parquet", tick_table(n=120, bid=bid))
    s = pipeline.run(str(source))
    assert s.files_rejected == 1
    assert any("non-positive" in i for i in s.quality_issues)


def test_all_null_datetime_rejected(pipeline, source):
    """Variant 6: DateTime entirely null -> rejected."""
    n = 120
    t = tick_table(n=n)
    t = t.set_column(0, "DateTime", pa.array([None] * n, type=pa.timestamp("us")))
    write(source / "EURUSD", "nodt.parquet", t)
    s = pipeline.run(str(source))
    assert s.files_rejected == 1


def test_overlap_dedup_on_second_ingest(pipeline, source):
    """Variant 7: 50% DateTime overlap -> only the new half appends (J1)."""
    write(source / "EURUSD", "first.parquet", tick_table(n=100))
    s1 = pipeline.run(str(source))
    assert s1.rows_appended == 100
    overlap = tick_table(n=100, start=BASE + dt.timedelta(seconds=50))
    write(source / "EURUSD", "second.parquet", overlap)
    s2 = pipeline.run(str(source))
    assert s2.rows_appended == 50  # 50 overlapping keys deduped
    assert pipeline.catalog.load_table("gold.eurusd").to_df().count() == 150


def test_intra_batch_duplicates_both_append(pipeline, source):
    """Variant 8: duplicate DateTime *within* one file -> both rows append
    (reference does NOT dedup intra-batch, SURVEY.md §2.3)."""
    t = tick_table(n=100)
    dup = pa.concat_tables([t, t.slice(0, 20)])  # 20 intra-batch dupes
    write(source / "EURUSD", "dups.parquet", dup)
    s = pipeline.run(str(source))
    assert s.rows_appended == 120
    assert pipeline.catalog.load_table("gold.eurusd").to_df().count() == 120


def test_float32_widened_to_double(pipeline, source):
    """Variant 9: float32 Bid/Ask stored as double (normalize F2)."""
    write(source / "EURUSD", "f32.parquet", tick_table(n=120, dtype="float32"))
    s = pipeline.run(str(source))
    assert s.rows_appended == 120
    schema = pipeline.catalog.load_table("gold.eurusd").schema
    assert schema["Bid"].dataType.simpleString() == "double"
    assert schema["Ask"].dataType.simpleString() == "double"


def test_multi_year_partitions(pipeline, source):
    """Variant 10: rows spanning 2 years -> 2 year-partition values (M3)."""
    t23 = tick_table(n=120, start=dt.datetime(2023, 12, 31, 23, 59, 0))
    write(source / "EURUSD", "multiyear.parquet", t23)
    s = pipeline.run(str(source))
    assert s.rows_appended == 120
    snap = pipeline.catalog.load_table("gold.eurusd").snapshot()
    years = {e["partition"].get("DateTime_year") for e in snap.manifest}
    assert years == {"2023", "2024"}


def test_idempotent_rerun_via_ledger(pipeline, source):
    """ST2: unchanged file re-run appends nothing (md5 ledger skip)."""
    write(source / "EURUSD", "clean.parquet", tick_table(n=120))
    s1 = pipeline.run(str(source))
    assert s1.rows_appended == 120
    s2 = pipeline.run(str(source))
    assert s2.rows_appended == 0
    assert s2.files_skipped == 1
    assert pipeline.catalog.load_table("gold.eurusd").to_df().count() == 120


def test_modified_file_reingested_dedup_protects(pipeline, source):
    """ST2 content-change: modified file re-ingests; value-level dedup
    keeps the table duplicate-free for overlapping keys."""
    write(source / "EURUSD", "clean.parquet", tick_table(n=120))
    pipeline.run(str(source))
    # rewrite same path with 20 extra rows appended after the originals
    bigger = tick_table(n=140)
    write(source / "EURUSD", "clean.parquet", bigger)
    s2 = pipeline.run(str(source))
    assert s2.rows_appended == 20
    assert pipeline.catalog.load_table("gold.eurusd").to_df().count() == 140


def test_audit_log_records_runs(pipeline, source):
    write(source / "EURUSD", "clean.parquet", tick_table(n=120))
    pipeline.run(str(source))
    pipeline.run(str(source))
    audit = pipeline._audit.to_df().collect()
    assert len(audit) == 2
    total = sum(r["rows_appended"] for r in audit)
    assert total == 120


def test_per_symbol_tables(pipeline, source):
    """S3: one table per symbol folder, lowercased."""
    write(source / "EURUSD", "a.parquet", tick_table(n=120))
    write(source / "GBPJPY", "b.parquet", tick_table(n=110))
    pipeline.run(str(source))
    assert pipeline.catalog.list_tables("gold") == ["gold.eurusd", "gold.gbpjpy"]


def test_reference_schema_collapse(spark):
    """Strict parity mode: every non-timestamp numeric becomes double
    (reference iceberg_schema_from_arrow :197)."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.functions.normalize import (
        normalize_reference_schema,
    )

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), 1, 2.5, "x")],
        "DateTime timestamp, volume int, Bid double, note string",
    )
    out = normalize_reference_schema(df)
    types = dict(out.dtypes)
    assert types["DateTime"] == "timestamp"
    assert types["volume"] == "double"  # int collapsed, like the reference
    assert types["Bid"] == "double"
    assert types["note"] == "string"  # strings are control-plane only


def test_read_jsonl_clean_and_quarantine(spark, tmp_path):
    """JSONL ingestion: explicit schema (no inference pass), malformed
    lines quarantined - never dropped, never fatal."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.sources.files import (
        read_jsonl,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 3, "text": "fine", "extra": "ignored"}\n'
    )
    (p / "b.jsonl").write_text('{"doc_id": 4, "text": "deeper"}\n')
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    clean, bad = read_jsonl(spark, str(p), schema=schema)
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert rows == {1: "hello world", 2: "ok", 3: "fine", 4: "deeper"}
    quarantined = [r["_corrupt_record"] for r in bad.collect()]
    assert quarantined == ["this is not json"]
    # the clean frame flows straight into the lakehouse ingest path
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("bronze")
    t = cat.create_table("bronze.docs", clean.schema)
    t.append(clean)
    assert t.to_df().count() == 4
