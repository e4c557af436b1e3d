"""The judged query surface.

Every operator from SURVEY.md §2 that is SQL-expressible gets a named entry
here: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus a matching
ANSI-SQL oracle string for DuckDB. Column names are aliased identically on
both sides (the driver sorts columns by name before value-hashing).

Registration is side-effect based: importing the submodules fills
``QUERIES`` / ``ORACLES``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a judged query and (optionally) its DuckDB oracle.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator (the
    driver then records a weaker rows-only check).
    """

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one fixture table; filters/projections layered on top push down
    into the Parquet scan via Catalyst."""
    if table == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    default. Read nanos as long (legacy conf) and truncate to µs -
    matching DuckDB's ``CAST(ts AS TIMESTAMP)`` semantics exactly
    (SURVEY.md §7.4 timestamp discipline)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# Populate the registry.
from . import relational  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import sqlqueries  # noqa: E402,F401
from . import lakehouse  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
