#!/usr/bin/env python
"""Isolated cold/warm loops for the Arrow-scored paths (classifier +
dsir): one fresh-session cold sample each, then N warm loops, printed
as one line per sample. VERDICT r14 #9's clean cold/warm pair.

Usage: python scripts/profile_scored_paths.py [n_warm]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.dsir import (
        dsir_fit,
        dsir_logweights,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.quality_classifier import (
        quality_classifier_fit,
        quality_classifier_score,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.session import (
        get_spark,
    )
    from pyspark.sql import functions as F

    n_warm = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="scored-path-profile")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()  # page/codegen warm-up, untimed

    model = quality_classifier_fit(
        docs.withColumn("__label", (F.col("lang") == "en").cast("int")),
        "__label",
        sample=500,
    )
    for i in range(1 + n_warm):
        t0 = time.perf_counter()
        quality_classifier_score(docs, model).agg(
            F.count("quality_score"), F.sum("quality_score")
        ).collect()
        tag = "cold" if i == 0 else f"warm{i}"
        print(f"classifier_{tag}: {time.perf_counter() - t0:.3f}s")
    # catalyst reference (regex-class sep) for the same corpus
    for i in range(2):
        t0 = time.perf_counter()
        quality_classifier_score(docs, {**model, "sep": "[ ]"}).agg(
            F.count("quality_score"), F.sum("quality_score")
        ).collect()
        print(f"classifier_catalyst{i}: {time.perf_counter() - t0:.3f}s")

    lr = dsir_fit(
        docs.filter(F.col("lang") == "en"), docs, ngrams=(1, 2),
        n_buckets=4096,
    )
    for i in range(1 + n_warm):
        t0 = time.perf_counter()
        dsir_logweights(docs, lr, ngrams=(1, 2)).agg(
            F.count("dsir_logw"), F.sum("dsir_logw")
        ).collect()
        tag = "cold" if i == 0 else f"warm{i}"
        print(f"dsir_arrow_{tag}: {time.perf_counter() - t0:.3f}s")
    for i in range(2):
        t0 = time.perf_counter()
        dsir_logweights(docs, lr, sep="[ ]", ngrams=(1, 2)).agg(
            F.count("dsir_logw"), F.sum("dsir_logw")
        ).collect()
        print(f"dsir_catalyst{i}: {time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()
