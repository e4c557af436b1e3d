"""Streaming ingest (ST1-ST5): Structured Streaming file source with
foreachBatch into the lakehouse table, plus reference-parity watcher."""

from __future__ import annotations

import datetime as dt
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.ingest import IngestPipeline
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.streaming.watcher import (
    FolderWatcher,
    Scheduler,
    stream_symbol,
)

from pyspark.sql.types import (
    DoubleType,
    StructField,
    StructType,
    TimestampType,
)

TICK_SCHEMA = StructType(
    [
        StructField("DateTime", TimestampType()),
        StructField("Bid", DoubleType()),
        StructField("Ask", DoubleType()),
    ]
)


def tick_file(path, n=150, start=dt.datetime(2024, 3, 1)):
    ts = [start + dt.timedelta(seconds=i) for i in range(n)]
    tab = pa.table(
        {
            "DateTime": pa.array(ts, type=pa.timestamp("us")),
            "Bid": pa.array(np.linspace(1.1, 1.2, n)),
            "Ask": pa.array(np.linspace(1.2, 1.3, n)),
        }
    )
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(tab, path)


def test_streaming_ingest_available_now(spark, tmp_path):
    """File-source stream drains existing files exactly once into the
    table; a second availableNow run adds nothing (checkpoint = ledger)."""
    src = tmp_path / "Training Batch" / "EURUSD"
    tick_file(src / "a.parquet", n=150)
    pipeline = IngestPipeline(spark, str(tmp_path / "wh"))

    q = stream_symbol(
        pipeline,
        str(src),
        TICK_SCHEMA,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    t = pipeline.catalog.load_table("gold.eurusd")
    assert t.to_df().count() == 150

    # restart the stream with the same checkpoint: nothing re-ingested
    q2 = stream_symbol(
        pipeline,
        str(src),
        TICK_SCHEMA,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(120)
    assert pipeline.catalog.load_table("gold.eurusd").to_df().count() == 150


def test_streaming_picks_up_new_files_and_dedups(spark, tmp_path):
    """New file with 50% key overlap: only new keys append (J1 inside
    foreachBatch)."""
    src = tmp_path / "Training Batch" / "EURUSD"
    tick_file(src / "a.parquet", n=100)
    pipeline = IngestPipeline(spark, str(tmp_path / "wh"))
    q = stream_symbol(
        pipeline, str(src), TICK_SCHEMA, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    tick_file(
        src / "b.parquet", n=100, start=dt.datetime(2024, 3, 1) + dt.timedelta(seconds=50)
    )
    q2 = stream_symbol(
        pipeline, str(src), TICK_SCHEMA, str(tmp_path / "ckpt"), available_now=True
    )
    q2.awaitTermination(120)
    assert pipeline.catalog.load_table("gold.eurusd").to_df().count() == 150


def test_streaming_qc_rejects_bad_batch(spark, tmp_path):
    """A below-threshold file fails QC inside foreachBatch: no commit."""
    src = tmp_path / "Training Batch" / "EURUSD"
    tick_file(src / "small.parquet", n=50)  # < MIN_ROWS_THRESHOLD
    pipeline = IngestPipeline(spark, str(tmp_path / "wh"))
    q = stream_symbol(
        pipeline, str(src), TICK_SCHEMA, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    assert not pipeline.catalog.table_exists("gold.eurusd")


def test_folder_watcher_mtime_diff(tmp_path):
    src = tmp_path / "src"
    tick_file(src / "a.parquet", n=10)
    w = FolderWatcher(str(src))
    assert not w.has_changes()  # baseline snapshot
    tick_file(src / "b.parquet", n=10)
    assert w.has_changes()
    assert not w.has_changes()  # snapshot updated


def test_scheduler_quirk_never_fires_until_seeded():
    s = Scheduler(hour_utc=dt.datetime.now(dt.timezone.utc).hour)
    assert not s.should_run()  # last_run None -> False (reference :71-72)
    s.last_run = time.time() - 90000  # >24h ago
    assert s.should_run()
    s.mark_ran()
    assert not s.should_run()
