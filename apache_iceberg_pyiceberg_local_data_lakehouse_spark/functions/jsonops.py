"""Semi-structured JSON column handling: schema inference + flattening.

``from_json`` needs a schema; real pipelines rarely have one written
down. ``flatten_json`` infers it from a BOUNDED sample (driver-side,
constant cost regardless of corpus size - the standard
read-a-sample-then-commit-to-a-schema pattern), then expands the JSON
column's top-level fields into real columns with one ``from_json``
projection - codegen'd, no Python in the row path, and downstream
filters on the flattened columns push into the scan like any other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def infer_json_schema(df: DataFrame, json_col: str, sample_rows: int = 256):
    """Schema of a JSON string column from a bounded sample. The sample
    collects to the driver (<= sample_rows short strings) and runs
    through Spark's JSON inference; fields present in only some rows
    come back nullable, conflicting primitive types widen to string -
    the same rules ``spark.read.json`` applies to files."""
    sample = [
        r[0]
        for r in df.select(json_col)
        .filter(F.col(json_col).isNotNull())
        .limit(sample_rows)
        .collect()
    ]
    if not sample:
        raise ValueError(f"no non-null {json_col!r} values to infer from")
    spark = df.sparkSession
    inferred = spark.read.json(spark.sparkContext.parallelize(sample)).schema
    # unparseable sample rows surface as Spark's corrupt-record field:
    # not a data field - flattened rows that fail to parse read as
    # all-null instead
    from pyspark.sql.types import StructType

    return StructType(
        [f for f in inferred.fields if f.name != "_corrupt_record"]
    )


def flatten_json(
    df: DataFrame,
    json_col: str,
    sample_rows: int = 256,
    prefix: str = "",
    drop: bool = True,
    schema=None,
) -> DataFrame:
    """Expand a JSON string column's top-level fields into columns
    (``prefix`` + field name; collisions raise). Pass ``schema`` to
    skip inference (the production path once the schema is pinned);
    otherwise it is inferred from a bounded sample. Rows whose JSON
    does not parse get nulls in every flattened column (PERMISSIVE,
    matching Spark's JSON source)."""
    schema = schema or infer_json_schema(df, json_col, sample_rows)
    parsed = F.from_json(F.col(json_col), schema)
    out_names = [prefix + f.name for f in schema.fields]
    clash = set(out_names) & {
        c for c in df.columns if not (drop and c == json_col)
    }
    if clash:
        raise ValueError(
            f"flatten_json: output columns collide with existing ones: "
            f"{sorted(clash)}; set prefix="
        )
    keep = [c for c in df.columns if not (drop and c == json_col)]
    return df.select(
        *keep,
        *[
            parsed[f.name].alias(prefix + f.name)
            for f in schema.fields
        ],
    )
