"""Z-order (Morton) clustering key as a pure JVM expression.

Multi-dimensional file skipping: a linear sort tightens min/max stats on
the FIRST sort column only; interleaving the bits of several columns'
quantized ranks gives every participating column locality, so per-file
min/max stats prune scans on ANY of the dimensions (the same strategy as
Iceberg/Delta ``rewrite_data_files`` with a z-order sort strategy).

The key is built entirely from ``shiftright``/``shiftleft``/bitwise-and
over longs - whole-stage-codegen'd, no UDF, no extra shuffle beyond the
range partition that consumes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, NumericType, TimestampType

# 16 bits/dimension: 65k distinct ranks per column is plenty to separate
# file-sized chunks, and 3 dimensions still fit a long (48 bits).
ZORDER_BITS = 16


def _numeric_expr(df: DataFrame, col: str) -> Column:
    """Map a column to a monotonic numeric expression for quantization."""
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(col)).cast("double")
    if isinstance(dt, DateType):
        return F.unix_date(F.col(col)).cast("double")
    if isinstance(dt, NumericType):
        return F.col(col).cast("double")
    raise ValueError(
        f"zorder_key: column {col!r} has unsupported type {dt.simpleString()}"
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = ZORDER_BITS,
) -> Column:
    """Morton key over ``cols``: quantize each column to ``bits``-bit
    rank within [lo, hi] from ``bounds``, then interleave the bits.
    Nulls and degenerate ranges rank 0 (cluster together at the front)."""
    if len(cols) * bits > 62:
        raise ValueError("zorder_key: bits * len(cols) must fit a long")
    max_rank = (1 << bits) - 1
    ranks = []
    for c in cols:
        lo, hi = bounds[c]
        x = _numeric_expr(df, c)
        if hi > lo:
            scaled = F.floor((x - F.lit(float(lo))) / F.lit(hi - lo) * max_rank)
            rank = F.least(F.greatest(scaled, F.lit(0)), F.lit(max_rank))
        else:
            rank = F.lit(0)
        ranks.append(F.coalesce(rank, F.lit(0)).cast("long"))
    n = len(cols)
    parts = [
        F.shiftleft(
            F.shiftright(rank, b).bitwiseAND(F.lit(1)), b * n + i
        )
        for b in range(bits)
        for i, rank in enumerate(ranks)
    ]
    z = parts[0]
    for p in parts[1:]:
        z = z + p
    return z
