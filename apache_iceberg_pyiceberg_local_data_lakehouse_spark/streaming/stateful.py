"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.7 north-star extension: the reference's only "state" is the
storage-derived dedup; real pipelines need in-flight keyed state).

Two operators, both with explicit state schemas and GroupStateTimeout:

- ``streaming_dedup_first_seen``: emit each key at most once per state
  TTL - the *in-memory* complement of the storage-level J1 dedup, for
  high-rate streams where an anti-join per micro-batch would be too slow.
  State per key: first-seen timestamp. Timeout reaps idle keys so state
  is bounded by the active-key working set, not history.
- ``running_user_stats``: per-key running count/sum emitted every batch -
  the minimal template for custom aggregation state machines.

Arrow moves each group's rows as pandas frames; state round-trips as a
tuple. At scale the shuffle is on the state key only, and the state store
is RocksDB-backed per executor (config, not code).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

DEDUP_OUTPUT = StructType(
    [StructField("key", LongType()), StructField("first_batch_rows", LongType())]
)
DEDUP_STATE = StructType([StructField("seen", LongType())])

STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total", LongType()),
    ]
)
STATS_STATE = StructType(
    [StructField("n", LongType()), StructField("total", LongType())]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    if state.exists:
        return  # key already emitted within the TTL window
    state.update((1,))
    state.setTimeoutDuration(60 * 60 * 1000)  # reap after 1h idle
    yield pd.DataFrame({"key": [key[0]], "first_batch_rows": [n]})


def streaming_dedup_first_seen(stream: DataFrame, key_col: str) -> DataFrame:
    """Emit one row per key the first time it appears; suppress repeats
    while its state lives (processing-time TTL)."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # quantized to integer cents: state must be exact under retries
        total += int((pdf["value"] * 100).round().sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total": [total]})


def running_user_stats(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Running per-user count/sum across micro-batches (update mode)."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _stats_fn,
        outputStructType=STATS_OUTPUT,
        stateStructType=STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
