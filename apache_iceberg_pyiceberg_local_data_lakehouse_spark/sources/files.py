"""File sources (SURVEY.md §2.1 S1-S3, S12 + X5 binary ingestion).

- S1/S2: parquet scan with recursive discovery - Spark's reader natively
  handles multi-file/recursive layouts; at scale, file listing happens on
  the driver against the FS/object store, reads on executors.
- S3: directory-per-table layout - one DataFrame per first-level folder.
- S12: content checksums via the binaryFile source + ``md5`` (used when
  ledger parity with the reference's md5-of-bytes is needed at scale;
  local runs use the streaming-hash in ingest.py).
- X5: binaryFile ingestion for multimodal blobs (images/audio) into
  binary columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet_recursive(spark: SparkSession, path: str) -> DataFrame:
    """S1+S2: all parquet under ``path``, any depth."""
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(path)
    )


def list_symbol_dirs(source_root: str) -> list[str]:
    """S3: first-level subfolders = one table each (reference
    ``lakehouse_pipeline.py:322-331``)."""
    if not os.path.isdir(source_root):
        return []
    return sorted(
        os.path.join(source_root, d)
        for d in os.listdir(source_root)
        if os.path.isdir(os.path.join(source_root, d))
    )


def file_checksums(
    spark: SparkSession,
    path: str,
    glob: str = "*.parquet",
    recursive: bool = True,
) -> DataFrame:
    """S12 at scale: distributed md5 of file contents via the binaryFile
    source - returns (path, length, modificationTime, checksum). The md5
    matches the reference's md5-of-bytes exactly
    (``lakehouse_pipeline.py:122-128``), but runs on executors: the
    ingest change-detection anti-join consumes this instead of a
    sequential driver hash loop. ``path`` is normalized from Spark's
    ``file:`` URI back to a plain filesystem path so it joins against
    ledger entries recorded by any mode."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
        .select(
            F.regexp_replace(F.col("path"), "^file:/+", "/").alias("path"),
            "length",
            "modificationTime",
            F.md5(F.col("content")).alias("checksum"),
        )
    )


def read_binary_files(spark: SparkSession, glob: str, mime: str | None = None) -> DataFrame:
    """X5: binary blobs as (path, content, mime, length) - the multimodal
    ingestion source feeding operators/multimodal.py."""
    df = (
        spark.read.format("binaryFile")
        .load(glob)
        .select(
            "path",
            "content",
            "length",
            "modificationTime",
        )
    )
    if mime:
        df = df.withColumn("mime", F.lit(mime))
    return df
