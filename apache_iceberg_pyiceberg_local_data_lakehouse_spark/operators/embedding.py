"""Feature-hashed document embeddings (the hashing trick).

Deterministic bag-of-words embeddings without a model: each token hashes
to a bucket in [0, dim) with a ±1 sign, the document vector is the
signed bucket counts (Weinberger et al. 2009 — the standard cheap
featurizer for dedup/clustering experiments and ANN smoke tests).

Engine-portable by construction: bucket and sign derive from the first
8 md5 hex chars (a 32-bit integer every SQL engine can reproduce), so
the exact vectors are verifiable cross-engine. Scale shape: explode →
one (id, bucket) aggregation with map-side combine → one per-doc array
build; everything JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _token_u32(tok: Column) -> Column:
    """First 8 md5 hex chars as an exact 32-bit integer (portable)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def hashed_embedding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    sep: str = " ",
    normalize: bool = False,
) -> DataFrame:
    """(id_col, embedding array<double>): signed hashed bag-of-words.

    bucket = u32 % dim; sign = +1/-1 from the next bit of the same hash
    ((u32 / dim) % 2). Duplicate tokens accumulate (bag semantics).
    ``normalize=True`` L2-normalizes (docs with no tokens yield the
    zero vector either way)."""
    u = _token_u32(F.col("__tok"))
    per_bucket = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), sep)).alias("__tok"),
        )
        .select(
            id_col,
            (u % dim).alias("__b"),
            ((F.floor(u / dim) % 2) * 2 - 1).cast("double").alias("__s"),
        )
        .groupBy(id_col, "__b")
        .agg(F.sum("__s").alias("__v"))
    )
    dense = per_bucket.groupBy(id_col).agg(
        F.array(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("__b") == i, F.col("__v"))),
                    F.lit(0.0),
                )
                for i in range(dim)
            ]
        ).alias("embedding")
    )
    out = df.select(id_col).join(dense, id_col, "left").select(
        id_col,
        F.coalesce(
            "embedding",
            F.array(*[F.lit(0.0)] * dim),
        ).alias("embedding"),
    )
    if normalize:
        norm = F.sqrt(
            F.aggregate(
                "embedding", F.lit(0.0), lambda a, x: a + x * x
            )
        )
        out = out.select(
            id_col,
            F.when(norm > 0, F.transform("embedding", lambda x: x / norm))
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
    return out


def embedding_norms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    sep: str = " ",
) -> DataFrame:
    """(id_col, norm): the L2 norm of the hashed embedding WITHOUT
    building the dense array — two aggregations, no per-row dim-wide
    projection. The cheap summary for calibration/QA queries."""
    u = _token_u32(F.col("__tok"))
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), sep)).alias("__tok"),
        )
        .select(
            id_col,
            (u % dim).alias("__b"),
            ((F.floor(u / dim) % 2) * 2 - 1).cast("double").alias("__s"),
        )
        .groupBy(id_col, "__b")
        .agg(F.sum("__s").alias("__v"))
        .groupBy(id_col)
        .agg(F.sqrt(F.sum(F.col("__v") * F.col("__v"))).alias("norm"))
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_embedding",
) -> DataFrame:
    """Symmetric int8 quantization: per-vector scale s = max|v| / 127,
    q_i = round(v_i / s) as TINYINT. Cuts embedding storage and shuffle
    width 4x (float32 -> int8, 8x vs float64) - at 100 TB of vectors
    the difference between an ANN index that fits executor memory and
    one that spills. Adds ``out_col`` (array<tinyint>) and
    ``{out_col}_scale`` (float); zero vectors get scale 0 and all-zero
    codes. Pure expression plan - no UDF, no shuffle."""
    c = F.col(vec_col)
    amax = F.array_max(F.transform(c, lambda x: F.abs(x)))
    # quantize against the SAME float32-rounded scale that is stored -
    # dividing by the unrounded double would let the half-step roundtrip
    # bound drift by the float32 rounding error (up to 127 * 2^-24)
    scale = (amax / F.lit(127.0)).cast("float")
    s_d = scale.cast("double")
    # clamp: a down-rounded float32 scale can push |v/s| past 127, and
    # a 128 would overflow TINYINT (wrap to -128 outside ANSI mode)
    q = F.when(
        amax > 0,
        F.transform(
            c,
            lambda x: F.greatest(
                F.lit(-127.0), F.least(F.lit(127.0), F.round(x / s_d))
            ).cast("tinyint"),
        ),
    ).otherwise(F.transform(c, lambda x: F.lit(0).cast("tinyint")))
    return df.withColumn(out_col, q).withColumn(f"{out_col}_scale", scale)


def dequantize_embedding(q_col: str, scale_col: str) -> Column:
    """Reconstruct the approximate float vector: q_i * scale."""
    return F.transform(
        F.col(q_col), lambda x: x.cast("double") * F.col(scale_col)
    )
