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
from pyspark.sql.types import FloatType, TimestampType


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
