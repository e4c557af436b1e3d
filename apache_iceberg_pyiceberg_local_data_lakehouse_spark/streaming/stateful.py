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

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
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


# --- streaming anomaly detection (twin of timeseries.rolling_zscore) -------

ANOMALY_STATE = StructType(
    [StructField("vals", ArrayType(LongType()))]
)

_ANOM_WINDOW = 20
_ANOM_MIN_PERIODS = 5
_ANOM_THRESHOLD = 3.0
# isqrt(LongMax / window): same BIGINT-safe quantized bound the batch
# rolling_zscore enforces in-plan (operators/timeseries.py)
_ANOM_SAFE_BOUND = math.isqrt((2**63 - 1) // _ANOM_WINDOW)


def _anomaly_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key trailing window carried ACROSS micro-batches as state (at
    most ``_ANOM_WINDOW`` quantized longs per key - bounded regardless
    of stream length). The arithmetic MIRRORS the batch operator ulp
    for ulp: each sum is converted to a double before the n*ss - s*s
    products (Python floats are IEEE doubles, so the rounding matches
    Spark's window expression), and the quantization is
    floor(z*1e6 + 0.5), not int() truncation. Emits ONLY the anomalous
    rows (append mode); a zero-variance baseline broken by a different
    value emits with qzscore NULL."""
    import math

    (vals,) = state.get if state.exists else ([],)
    vals = list(vals)
    out_rows = []
    # a large group arrives as MULTIPLE Arrow chunks: sorting each
    # chunk alone would process rows out of global time order across
    # chunk boundaries - concatenate first, one sort, with qvalue as
    # the deterministic tie-break for colliding timestamps
    chunks = [pdf for pdf in pdfs]
    if not chunks:
        state.update((vals,))
        return
    pdf = (
        pd.concat(chunks, ignore_index=True)
        if len(chunks) > 1
        else chunks[0]
    ).sort_values(["ts_us", "qvalue"])
    for ts_us, q in zip(pdf["ts_us"], pdf["qvalue"]):
        if abs(int(q)) > _ANOM_SAFE_BOUND:
            # mirror the batch operator's overflow guard: Python ints
            # never wrap, but the batch twin raises here - silently
            # succeeding would break the batch-replay contract
            raise ValueError(
                f"streaming_anomalies: quantized |value| {q} exceeds "
                f"the BIGINT-safe bound {_ANOM_SAFE_BOUND} for the "
                f"{_ANOM_WINDOW}-row sum of squares"
            )
        n = len(vals)
        if n >= _ANOM_MIN_PERIODS:
            s = sum(vals)
            ss = sum(v * v for v in vals)
            nf = float(n)
            var = (nf * float(ss) - float(s) * float(s)) / (
                nf * (nf - 1.0)
            )
            if var > 0:
                z = (float(q) - float(s) / nf) / math.sqrt(var)
                if abs(z) > _ANOM_THRESHOLD:
                    out_rows.append(
                        (
                            key[0],
                            int(ts_us),
                            int(q),
                            math.floor(z * 1e6 + 0.5),
                        )
                    )
            elif var == 0.0 and q * n != s:  # flat baseline broken
                # var == 0.0 EXACTLY, matching the batch twin's
                # (var == 0) guard: a tiny negative var from rounding
                # of n*ss - s*s must emit nothing, as batch does
                out_rows.append((key[0], int(ts_us), int(q), None))
        vals.append(int(q))
        if len(vals) > _ANOM_WINDOW:
            vals = vals[-_ANOM_WINDOW:]
    state.update((vals,))
    if out_rows:
        yield pd.DataFrame(
            out_rows, columns=["key", "ts_us", "qvalue", "qzscore"]
        )


def streaming_anomalies(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of ``timeseries.rolling_zscore``: per-key
    trailing-window z-score with the window carried across
    micro-batches, emitting only anomalies. Input values quantize to
    the same 1e6 scale and the per-row arithmetic mirrors the batch
    operator's double rounding, so a batch replay of the same stream
    flags the same rows. The key keeps its own type (a string device
    id must not silently cast to NULL and merge every series)."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.floor(F.col(value_col) * 1_000_000.0 + 0.5)
        .cast("long")
        .alias("qvalue"),
    )
    out_schema = StructType(
        [
            StructField("key", stream.schema[key_col].dataType),
            StructField("ts_us", LongType()),
            StructField("qvalue", LongType()),
            StructField("qzscore", LongType()),  # floor(z*1e6+0.5)
        ]
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _anomaly_fn,
        outputStructType=out_schema,
        stateStructType=ANOMALY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming gap detection (twin of timeseries.detect_gaps) --------------

GAP_STATE = StructType([StructField("last_ts", LongType())])


def streaming_gaps(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_gap: str = "6 hours",
) -> DataFrame:
    """Streaming twin of ``timeseries.detect_gaps``: per-key silence
    detection with ONE long of state per key (the last event time).
    A gap row (key, gap_start_us, gap_end_us, gap_us) emits when the
    event that ENDS the silence arrives - including silences spanning
    micro-batch boundaries, which is the case a per-batch lag window
    cannot see. Same in-order-arrival contract as the other twins
    (out-of-order rows WITHIN a batch are sorted; a later batch is
    assumed not to start before the previous one's end), under which a
    batch replay through ``detect_gaps`` yields the same gap set.
    NULL-timestamp rows are dropped on both sides."""
    from pyspark.sql import functions as F

    from ..operators.timeseries import _every_us

    us = _every_us(min_gap)
    from pyspark.sql.types import TimestampNTZType

    if isinstance(stream.schema[ts_col].dataType, TimestampNTZType):
        # wall-clock micros since the NTZ epoch - zone-free, so the
        # state diffs match detect_gaps' timestampdiff arithmetic in
        # ANY session zone (a cast through TIMESTAMP would warp
        # spacings across DST transitions)
        ts_us = F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    else:
        ts_us = F.unix_micros(F.col(ts_col))
    prepared = stream.where(F.col(ts_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        ts_us.alias("ts_us"),
    )
    out_schema = StructType(
        [
            StructField("key", stream.schema[key_col].dataType),
            StructField("gap_start_us", LongType()),
            StructField("gap_end_us", LongType()),
            StructField("gap_us", LongType()),
        ]
    )

    def _gap_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        chunks = [pdf for pdf in pdfs]
        if not chunks:
            if state.exists:
                state.update((last,))
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values("ts_us")
        rows = []
        for t in pdf["ts_us"]:
            t = int(t)
            if last is not None and t - last > us:
                rows.append((key[0], last, t, t - last))
            if last is None or t > last:
                last = t
        state.update((last,))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["key", "gap_start_us", "gap_end_us", "gap_us"],
            )

    return prepared.groupBy("key").applyInPandasWithState(
        _gap_fn,
        outputStructType=out_schema,
        stateStructType=GAP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming heavy hitters (Misra-Gries, bounded state) ------------------

HH_STATE = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def streaming_heavy_hitters(
    stream: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 8,
) -> DataFrame:
    """Streaming frequent items per group with HARD-BOUNDED state: a
    Misra-Gries summary of at most ``k`` counters per group, carried
    across micro-batches. The classic guarantee holds over the whole
    stream regardless of arrival order: every item with true frequency
    > n/(k+1) is IN the summary, and each kept counter undercounts its
    true frequency by at most n/(k+1) - so the batch exact heavy
    hitters (count > n/(k+1)) are always a subset of the last
    emission (pytest-pinned contract). This is the streaming twin of
    the persisted ``topk_rollup`` sketches: same question, O(k) longs
    per key instead of a stored sketch, for the in-flight path.

    Emits the full summary each micro-batch in update style: (group,
    item, mg_count, n_processed); consumers take the rows with the
    highest ``n_processed`` per group as current."""
    from pyspark.sql import functions as F

    prepared = stream.where(
        F.col(item_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(item_col).cast("string").alias("item"),
    )
    out_schema = StructType(
        [
            StructField("g", stream.schema[group_col].dataType),
            StructField("item", StringType()),
            StructField("mg_count", LongType()),
            StructField("n_processed", LongType()),
        ]
    )

    def _hh_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n = state.get
            d = dict(zip(list(items), [int(c) for c in counts]))
            n = int(n)
        else:
            d, n = {}, 0
        chunks = [pdf for pdf in pdfs]
        if not chunks:
            if state.exists:
                state.update((list(d), [d[i] for i in d], n))
            return
        for it in pd.concat(chunks, ignore_index=True)["item"]:
            n += 1
            if it in d:
                d[it] += 1
            elif len(d) < k:
                d[it] = 1
            else:
                # decrement-all step: every counter pays one, zeros
                # evict - the move that caps undercount at n/(k+1)
                for kk in [x for x in d]:
                    d[kk] -= 1
                    if d[kk] == 0:
                        del d[kk]
        keys = list(d)
        state.update((keys, [d[i] for i in keys], n))
        if keys:
            yield pd.DataFrame(
                {
                    "g": [key[0]] * len(keys),
                    "item": keys,
                    "mg_count": [d[i] for i in keys],
                    "n_processed": [n] * len(keys),
                }
            )

    return prepared.groupBy("g").applyInPandasWithState(
        _hh_fn,
        outputStructType=out_schema,
        stateStructType=HH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
