"""Time-series resample + gap fill (the hypertable `time_bucket_gapfill`
/ Pandas `resample().ffill()` operator family), Spark-first.

Resampling is a bucketed aggregate: floor the event time onto a fixed
grid (pure integer arithmetic on microseconds - no UDF, prunable,
codegen-friendly) and aggregate per (group, bucket). Gap filling then
materializes the buckets with NO data: each group's [min, max] bucket
range expands through ``sequence()`` + ``explode`` - the grid is
generated distributed, proportional to each group's own span, never
collected - and a left join overlays the real aggregates.

Fill strategies for the synthesized rows:

- ``'none'``: leave missing aggregates NULL (callers distinguish "no
  data" from 0);
- ``'zero'``: coalesce to 0 (counts/sums);
- ``'locf'``: last observation carried forward - one
  ``last(ignoreNulls)`` window per group ordered by bucket;
- ``'linear'``: straight line between the previous and next real
  observation (the locf window forward + its mirror backward + the
  bucket distance to each anchor).

Scale shape: one shuffle for the bucket aggregate, one for the
group-grid join, and (locf/linear) one window partitioned by group -
state per group is O(1). At 100 TB the window partitions by the series
key, which is exactly how the data is naturally keyed; a single global
series (no group columns) degrades to one partition and should be
bucketed by a coarser time range first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_UNITS_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3600 * 1_000_000,
    "day": 86400 * 1_000_000,
}


def _every_us(every: str) -> int:
    """'15 minutes' / '1 hour' / '30 seconds' -> microseconds."""
    parts = every.strip().split()
    if len(parts) != 2:
        raise ValueError(f"every must be '<n> <unit>', got {every!r}")
    # lowercase BEFORE stripping the plural: '15 MINUTES' must parse
    n, unit = int(parts[0]), parts[1].lower().rstrip("s")
    if unit not in _UNITS_US or n <= 0:
        raise ValueError(f"unsupported interval {every!r}")
    return n * _UNITS_US[unit]


def time_bucket(ts: Column, every: str) -> Column:
    """Floor a timestamp onto the grid - integer µs arithmetic, exact
    and engine-portable (DuckDB's time_bucket computes the same).
    ``pmod``, not ``%``: Spark's % follows the sign, which would round
    pre-1970 timestamps UP instead of flooring (and disagree with
    DuckDB's flooring ``//``)."""
    us = _every_us(every)
    return F.timestamp_micros(
        F.unix_micros(ts) - F.pmod(F.unix_micros(ts), F.lit(us))
    )


def resample(
    df: DataFrame,
    ts_col: str,
    every: str,
    aggs: dict[str, Column],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Bucketed aggregate: (group..., bucket, <agg outputs>). ``aggs``
    maps output name -> aggregate Column (F.count/F.avg/...)."""
    groups = list(group_cols or [])
    if "bucket" in groups:
        raise ValueError("'bucket' is the output column; rename the group")
    # internal alias: an input column already named 'bucket' (e.g. a
    # prior resample pass being re-bucketed) must not become ambiguous
    b = time_bucket(F.col(ts_col), every).alias("__rs_bucket")
    return (
        df.select("*", b)
        .groupBy(*groups, "__rs_bucket")
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumnRenamed("__rs_bucket", "bucket")
    )


def gap_fill(
    resampled: DataFrame,
    every: str,
    value_cols: list[str],
    group_cols: list[str] | None = None,
    fill: str = "none",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Expand each group's bucket range to the full grid and fill.

    Adds ``is_gap`` (true for synthesized buckets). The grid generates
    per group via ``sequence(min, max, interval)`` - distributed,
    proportional to the group's own span."""
    if fill not in ("none", "zero", "locf", "linear"):
        raise ValueError(f"unknown fill {fill!r}")
    groups = list(group_cols or [])
    us = _every_us(every)
    span = resampled.groupBy(*groups).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = span.select(
        *groups,
        F.explode(
            F.sequence(
                "__lo", "__hi", F.expr(f"INTERVAL {us} MICROSECONDS")
            )
        ).alias(bucket_col),
    )
    # a row is a gap iff it had no source row: every value col NULL is
    # ambiguous (a real bucket can aggregate to NULL), so probe with a
    # sentinel from the right side
    probe = resampled.select(
        *groups, bucket_col, F.lit(1).alias("__hit")
    )
    joined = grid.join(probe, on=groups + [bucket_col], how="left").join(
        resampled, on=groups + [bucket_col], how="left"
    )
    out = joined.withColumn("is_gap", F.col("__hit").isNull()).drop("__hit")
    if fill == "none":
        return out
    if fill == "zero":
        for c in value_cols:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
        return out
    w_back = (
        Window.partitionBy(*groups)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*groups)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    if fill == "locf":
        for c in value_cols:
            out = out.withColumn(
                c, F.last(F.col(c), ignorenulls=True).over(w_back)
            )
        return out
    # linear: interpolate between the previous and next REAL value;
    # edges (no anchor on one side) keep the single available anchor
    pos = F.unix_micros(F.col(bucket_col))
    real_pos = F.when(~F.col("is_gap"), pos)
    prev_pos = F.last(real_pos, ignorenulls=True).over(w_back)
    next_pos = F.first(real_pos, ignorenulls=True).over(w_fwd)
    for c in value_cols:
        real_val = F.when(~F.col("is_gap"), F.col(c))
        prev_val = F.last(real_val, ignorenulls=True).over(w_back)
        next_val = F.first(real_val, ignorenulls=True).over(w_fwd)
        frac = (pos - prev_pos).cast("double") / (
            (next_pos - prev_pos).cast("double")
        )
        interp = (
            F.when(~F.col("is_gap"), F.col(c))
            .when(prev_val.isNull(), next_val)
            .when(next_val.isNull(), prev_val)
            .otherwise(prev_val + (next_val - prev_val) * frac)
        )
        out = out.withColumn(c, interp)
    return out


def detect_gaps(
    df: DataFrame,
    ts_col: str,
    min_gap: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-series silence detection: one row per pair of CONSECUTIVE
    events further apart than ``min_gap`` (a duration like ``'6 hours'``)
    - (group..., gap_start, gap_end, gap_us). The sensor-went-dark /
    feed-outage primitive gap_fill's bucket grid cannot express when
    the interesting unit is the raw event spacing, not a resample grid.

    One lag window per group = a single shuffle on the series key; no
    grid materializes, so cost is O(events), independent of the gap
    sizes. Rows tying on ``ts_col`` sort adjacently with a zero diff,
    so the emitted gap SET is invariant to tie order - safe to judge
    against a SQL LAG oracle even when timestamps collide."""
    groups = list(group_cols or [])
    us = _every_us(min_gap)
    w = Window.partitionBy(*groups).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # timestampdiff works on BOTH timestamp flavors and is the
    # zone-safe arithmetic: instant diff for TIMESTAMP, wall-clock
    # diff for NTZ (a cast-through-TIMESTAMP would warp NTZ spacings
    # across DST transitions in non-UTC sessions - the load_events
    # precedent)
    gap = F.expr(f"timestampdiff(MICROSECOND, __prev, `{ts_col}`)")
    return (
        df.select(*groups, ts_col)
        .withColumn("__prev", prev)
        .where(F.col("__prev").isNotNull())
        .where(gap > F.lit(us))
        .select(
            *groups,
            F.col("__prev").alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            gap.alias("gap_us"),
        )
    )


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    ts_col: str | list[str],
    group_cols: list[str] | None = None,
    window: int = 20,
    min_periods: int = 5,
    threshold: float = 3.0,
    scale: int = 1_000_000,
) -> DataFrame:
    """Trailing-window anomaly score: each row's value against the mean
    and sample-stddev of the PREVIOUS ``window`` rows in its series
    (the point being scored is excluded from its own baseline).

    Cross-engine determinism: values quantize to scaled BIGINTs and the
    window accumulates integer (n, sum, sum-of-squares); the z-score
    then uses only +,-,*,/,sqrt - all correctly-rounded IEEE ops - so
    identical inputs give bit-identical scores in any engine (the
    ``q2b`` portable-stddev discipline, applied over a window).
    Scale shape: one window per series key, state O(1) per row.

    Adds ``zscore`` (NULL until ``min_periods`` history exists, or when
    the baseline has zero variance) and ``is_anomaly``
    (|z| > threshold; false where z is NULL)."""
    from pyspark.sql.window import Window as W

    reserved = {"__d", "__n", "__s", "__ss", "zscore", "is_anomaly"}
    clash = reserved & set(df.columns)
    if clash:
        # the resample-'bucket' lesson: silently overwriting and then
        # dropping a caller's column is data loss, not convenience
        raise ValueError(
            f"rolling_zscore: input columns collide with its working/"
            f"output names: {sorted(clash)}; rename them first"
        )
    groups = list(group_cols or [])
    # ts_col may be a list: pass a tie-breaking column (an event id)
    # whenever timestamps can collide, or the window order - and with
    # it every score - is nondeterministic
    order = [ts_col] if isinstance(ts_col, str) else list(ts_col)
    w = (
        W.partitionBy(*groups)
        .orderBy(*order)
        .rowsBetween(-window, -1)
    )
    # Overflow guard: the window accumulates sum(d*d) as BIGINT, so any
    # quantized |d| above isqrt(LongMax / window) can silently wrap the
    # sum-of-squares (with ANSI off Spark wraps; DuckDB raises; the
    # streaming twin's Python ints never wrap - three engines, three
    # answers). Checked IN-PLAN (a when/raise_error on each row - no
    # extra scan job), so out-of-domain data fails loudly with the fix.
    import math

    bound = math.isqrt((2**63 - 1) // max(int(window), 1))
    d_raw = F.floor(
        F.col(value_col) * F.lit(float(scale)) + F.lit(0.5)
    ).cast("long")
    # NULL values flow through (window count/sum ignore them; the row
    # scores NULL) - only a non-NULL out-of-range value may raise
    d = F.when(
        d_raw.isNull() | (F.abs(d_raw) <= F.lit(bound)), d_raw
    ).otherwise(
        F.raise_error(
            F.format_string(
                "rolling_zscore: value %s quantizes beyond |d|="
                + str(bound)
                + " at scale="
                + str(int(scale))
                + " and would overflow the BIGINT "
                + str(int(window))
                + "-row sum of squares; lower the scale",
                F.col(value_col).cast("string"),
            )
        )
    )
    out = (
        df.withColumn("__d", d)
        .withColumn("__n", F.count("__d").over(w))
        .withColumn("__s", F.sum("__d").over(w))
        .withColumn("__ss", F.sum(F.col("__d") * F.col("__d")).over(w))
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    var = (n * ss - s * s) / (n * (n - F.lit(1.0)))
    std = F.sqrt(var)
    z = (F.col("__d").cast("double") - s / n) / std
    zscore = F.when(
        (F.col("__n") >= F.lit(min_periods)) & (var > 0), z
    )
    # a zero-variance baseline with a DIFFERENT value is an infinite z:
    # the clearest anomaly there is (a constant series broke). zscore
    # stays NULL (undefined), the flag fires. Exact integer compare:
    # d*n == sum iff the value equals the baseline mean.
    flat_break = (
        (F.col("__n") >= F.lit(min_periods))
        & (var == 0)
        & (F.col("__d") * F.col("__n") != F.col("__s"))
    )
    return (
        out.withColumn("zscore", zscore)
        .withColumn(
            "is_anomaly",
            F.coalesce(
                F.abs(F.col("zscore")) > F.lit(float(threshold)),
                flat_break,
                F.lit(False),
            ),
        )
        .drop("__d", "__n", "__s", "__ss")
    )


def ohlc_price_aggs(
    ts_col: str, price_col: str, tiebreak_col: str | None
) -> tuple[Column, list[Column]]:
    """The five candle aggregates (open/high/low/close/n_ticks) shared
    by the batch and streaming OHLC twins - ONE definition so the NULL
    exclusion and tie-break semantics can never diverge. min_by/max_by
    skip rows whose ordering expression is NULL, so a NULL-price tick
    never becomes a bar's open/close."""
    price = F.col(price_col)
    raw_order = (
        F.struct(F.col(ts_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.struct(F.col(ts_col))
    )
    order = F.when(price.isNotNull(), raw_order)
    return price, [
        F.min_by(price, order).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price, order).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    ]


def ohlc_bars(
    df: DataFrame,
    ts_col: str,
    price_col: str,
    every: str,
    group_cols: list[str] | None = None,
    volume_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Candlestick downsampling - the reference's tick-data domain
    (Dukascopy bid/ask streams, ``lakehouse_pipeline.py:72-74``)
    aggregated to bars: per (group, bucket) emit ``open`` (price at the
    earliest tick), ``high``, ``low``, ``close`` (price at the latest
    tick), ``n_ticks``, and with a volume column also ``volume`` and
    ``vwap`` (volume-weighted average price; NULL for a zero-volume
    bar via ANSI-safe division).

    One hash-aggregate, no window: open/close use ``min_by``/``max_by``
    over a (ts, tiebreak) struct, which partial-aggregates map-side
    like any min/max, so at 100 TB the plan is scan -> partial agg ->
    one shuffle on (group, bucket) -> final agg. Pass ``tiebreak_col``
    (an event id) whenever timestamps can collide, or open/close are
    nondeterministic under ties - same discipline as rolling_zscore's
    order columns.

    NULL prices (a tick with no quote): excluded CONSISTENTLY from
    every price-derived number - open/close (the ordering struct nulls
    out, which min_by/max_by skip), high/low, and BOTH sides of the
    vwap ratio (a NULL-price tick's volume must not dilute the
    denominator). ``n_ticks`` counts ALL ticks (COUNT(*));
    ``volume`` sums all ticks' volume."""
    groups = list(group_cols or [])
    if "bucket" in groups:
        raise ValueError("'bucket' is the output column; rename the group")
    price, aggs = ohlc_price_aggs(ts_col, price_col, tiebreak_col)
    if volume_col is not None:
        vol = F.col(volume_col)
        quoted_vol = F.when(price.isNotNull(), vol)
        aggs.append(F.sum(volume_col).alias("volume"))
        aggs.append(
            F.try_divide(
                F.sum(price * quoted_vol), F.sum(quoted_vol)
            ).alias("vwap")
        )
    return (
        df.groupBy(
            *groups, time_bucket(F.col(ts_col), every).alias("bucket")
        )
        .agg(*aggs)
    )
