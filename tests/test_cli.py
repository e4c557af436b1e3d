"""ST6: the CLI entry point driven end-to-end as a subprocess."""

from __future__ import annotations

import datetime as dt

import pytest
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_cli_now_mode(tmp_path):
    src = tmp_path / "src" / "EURUSD"
    src.mkdir(parents=True)
    ts = [dt.datetime(2024, 5, 1) + dt.timedelta(seconds=i) for i in range(150)]
    pq.write_table(
        pa.table(
            {
                "DateTime": pa.array(ts, type=pa.timestamp("us")),
                "Bid": pa.array(np.linspace(1.0, 1.1, 150)),
                "Ask": pa.array(np.linspace(1.1, 1.2, 150)),
            }
        ),
        src / "x.parquet",
    )
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4",
               SPARK_GRAFT_DRIVER_MEM="2g")
    cmd = [
        sys.executable,
        "-m",
        "apache_iceberg_pyiceberg_local_data_lakehouse_spark",
        "--source",
        str(tmp_path / "src"),
        "--warehouse",
        str(tmp_path / "wh"),
        "--now",
    ]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=300, cwd=str(tmp_path)
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "+150 rows" in out.stdout
    # second run is idempotent
    out2 = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=300, cwd=str(tmp_path)
    )
    assert out2.returncode == 0
    assert "+0 rows" in out2.stdout
    assert "1 skipped" in out2.stdout


@pytest.mark.slow
def test_cli_maintain_mode(tmp_path):
    """--maintain walks every table, prints the metrics + actions line,
    and --dry-run never commits."""
    src = tmp_path / "src" / "EURUSD"
    src.mkdir(parents=True)
    ts = [dt.datetime(2024, 5, 1) + dt.timedelta(seconds=i) for i in range(150)]
    pq.write_table(
        pa.table(
            {
                "DateTime": pa.array(ts, type=pa.timestamp("us")),
                "Bid": pa.array(np.linspace(1.0, 1.1, 150)),
                "Ask": pa.array(np.linspace(1.1, 1.2, 150)),
            }
        ),
        src / "x.parquet",
    )
    env = {**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_CPUS": "4"}
    base = [
        sys.executable,
        "-m",
        "apache_iceberg_pyiceberg_local_data_lakehouse_spark",
        "--source",
        str(tmp_path / "src"),
        "--warehouse",
        str(tmp_path / "wh"),
    ]
    out = subprocess.run(
        base + ["--now"], env=env, capture_output=True, text=True,
        timeout=300, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    out = subprocess.run(
        base + ["--maintain", "--dry-run"], env=env, capture_output=True,
        text=True, timeout=300, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "gold.eurusd" in out.stdout
    assert "rows=150" in out.stdout
