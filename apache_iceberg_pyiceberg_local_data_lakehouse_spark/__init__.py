"""PySpark-native analytics engine with the capabilities of the reference
lakehouse pipeline (``AlgoDeveloper400/Apache-Iceberg-Pyiceberg-Local-Data-Lakehouse``,
read-only at ``/root/reference``), re-expressed Spark-first.

Layout
------
- ``session``      SparkSession builder (UTC, AQE, tuned shuffle partitions)
- ``catalog``      lightweight snapshot-based table format on Parquet
                   (the reference's PyIceberg surface: create/append/scan/
                   expire/time-travel — reimplemented Spark-native because
                   no Iceberg runtime jar is available in this environment)
- ``ingest``       the reference pipeline: normalize -> QC -> dedup -> append
- ``operators``    dedup (anti-join, exact, MinHash/LSH, SimHash, Jaccard),
                   similarity search, event-time windows
- ``functions``    normalize casts, quality gates, portable hashing
- ``sources``      parquet discovery, binary-file (multimodal) source
- ``streaming``    Structured Streaming file watcher (reference scheduler)
- ``queries``      the judged query surface + DuckDB oracle SQL
- ``maintenance``  snapshot expiry, compaction
"""

__version__ = "0.1.0"
