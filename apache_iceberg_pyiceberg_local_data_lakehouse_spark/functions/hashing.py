"""Portable hashing utilities (X4 document fingerprinting).

``rolling_hash``: Rabin-Karp polynomial hash over the character stream,
folded with per-step modulo so values never overflow 63 bits (Spark long
arithmetic wraps silently; DuckDB BIGINT *errors* on overflow - per-step
``pmod`` keeps any future SQL twin portable). Pure JVM higher-order
functions; deterministic across runs and partitionings.

Fingerprint family recap (each catches a different mutation class):
- sha256(text)                  exact copies           (q40)
- sha256(sorted token set)      reordered copies       (q46)
- SimHash                       small edits            (operators/dedup)
- rolling hash                  streaming / substring  (here)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD = (1 << 31) - 1
_BASE = 131


def rolling_hash(text: Column) -> Column:
    """Polynomial hash of the full string: fold(acc*131 + code) mod 2^31-1."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(
            acc * _BASE + F.coalesce(F.ascii(ch).cast("long"), F.lit(0)),
            F.lit(_MOD),
        ),
    )


def fingerprint_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach the rolling-hash fingerprint per document."""
    return df.select(
        F.col(id_col), rolling_hash(F.col(text_col)).alias("rolling_fp")
    )
