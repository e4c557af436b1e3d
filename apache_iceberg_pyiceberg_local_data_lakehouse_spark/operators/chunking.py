"""Document chunking: split long texts into fixed-size overlapping
windows - the preprocessing step in front of embedding models and
context-window-bounded consumers (RAG indexing, dedup-at-chunk-level).

Pure ``sequence`` -> ``explode`` -> ``substring`` expressions: the chunk
index list is generated per row JVM-side, exploded, and sliced - no
UDFs, whole-stage-codegen, scales as one narrow projection + explode
(output rows ~ total_chars / stride, the unavoidable output size).

Character windows (not tokens) by design: byte/char offsets are
engine-portable and reproducible; token-window chunking composes from
this by pre-tokenizing into a delimited string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    size: int = 200,
    overlap: int = 50,
    chunk_col: str = "chunk",
    index_col: str = "chunk_idx",
) -> DataFrame:
    """Explode each row into overlapping character windows.

    Chunk i covers ``[i * (size - overlap), ... + size)`` (1-based
    substring arithmetic internally). The final chunk may be shorter;
    empty/null texts produce zero chunks. Deterministic: (row, i) always
    yields the same slice, so chunk-level dedup keys are stable."""
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError("need size > 0 and 0 <= overlap < size")
    stride = size - overlap
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(stride)),
    ).cast("int")
    out = df.filter(
        F.col(text_col).isNotNull() & (F.length(F.col(text_col)) > 0)
    ).withColumn(
        index_col, F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1)))
    )
    start = F.col(index_col) * F.lit(stride) + F.lit(1)  # substring is 1-based
    return out.withColumn(
        chunk_col, F.col(text_col).substr(start, F.lit(size))
    )
