"""Schema normalization (reference ``normalize_arrow_table``,
``/root/reference/lakehouse_pipeline.py:176-186``).

Reference behavior, re-expressed as DataFrame casts (all JVM-side):
- any timestamp column -> microsecond precision, UTC
  (Spark's TimestampType IS µs, so this is a no-op cast that also
  swallows ns inputs, ``:181-182``)
- float32 -> float64 (``:183-184``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import FloatType, NumericType, TimestampType


def normalize(df: DataFrame) -> DataFrame:
    """Widen floats, coerce timestamps - the reference's normalize pass."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, FloatType):
            c = c.cast("double").alias(f.name)
        elif isinstance(f.dataType, TimestampType):
            c = c.cast("timestamp").alias(f.name)
        else:
            c = c.alias(f.name)
        cols.append(c)
    return df.select(*cols)


def normalize_reference_schema(df: DataFrame) -> DataFrame:
    """STRICT reference-parity schema collapse: the reference's
    ``iceberg_schema_from_arrow`` maps every non-timestamp field to
    DoubleType (``lakehouse_pipeline.py:191-199``, branch at ``:197``) -
    ints included. Use only on the tick-ingest path (SURVEY.md §7.4 warns
    against applying it to the star-schema fixtures, which carry real
    int/string columns)."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, TimestampType):
            c = c.cast("timestamp").alias(f.name)
        elif isinstance(f.dataType, NumericType):
            c = c.cast("double").alias(f.name)
        else:
            c = c.alias(f.name)
        cols.append(c)
    return df.select(*cols)
