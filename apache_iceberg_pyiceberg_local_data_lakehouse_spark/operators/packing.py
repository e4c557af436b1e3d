"""Sequence packing: assign every document a position in the
concatenate-then-split layout GPT-style pretraining uses — all documents
laid end to end in a deterministic order, the token stream cut into
fixed-length training sequences, each document labeled with the
sequence(s) it lands in.

The core primitive is a GLOBAL prefix sum over token counts, which a
naive Spark window (``Window.orderBy(...)`` with no partition) computes
on a single task — the classic scale trap. This implements the textbook
two-phase distributed scan instead:

1. bucket every row by a hash prefix of its key (256 buckets);
2. per-bucket cumulative sums via an ordinary partitioned window
   (shuffle width = bucket count, each bucket scans independently);
3. per-bucket totals (256 rows) come to the driver, a prefix sum over
   them broadcasts back as a plan literal map;
4. global offset = bucket prefix + within-bucket cumulative sum.

Driver state is O(buckets), every heavy step is a standard shuffle, and
the result is bit-identical to the single-window form — which is exactly
what the DuckDB oracle runs, so the equivalence is hash-verified.

The layout is deterministic (md5 hash order, key tiebreak): re-running
produces the same packing, and any engine can reproduce it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_BUCKETS = 256  # two hex digits of md5; driver prefix state = 256 longs


def global_prefix_sum(
    df: DataFrame,
    size_col: str,
    key_col: str,
    out_col: str = "offset",
) -> DataFrame:
    """Exclusive prefix sum of ``size_col`` over the md5(key) global
    order, without a global single-task window. Adds ``out_col`` = sum
    of sizes of all rows strictly before this one."""
    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    # one eager materialization feeds BOTH passes (bucket totals + the
    # windowed output): without it the upstream plan - possibly a whole
    # curation pipeline - executes twice
    rows = (
        df.withColumn("__h", h)
        .withColumn("__b", bucket)
        .localCheckpoint(eager=True)
    )

    # phase 1+2: within-bucket exclusive cumsum (ordinary partitioned
    # window; ties impossible - md5 plus the unique key totally order)
    w = (
        Window.partitionBy("__b")
        .orderBy("__h", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = rows.withColumn(
        "__local", F.coalesce(F.sum(size_col).over(w), F.lit(0).cast("long"))
    )

    # phase 3: bucket totals -> driver prefix (bounded: N_BUCKETS rows).
    # Computed from the checkpointed projection, NOT the windowed rows -
    # the agg needs no ordering, so this pass map-side combines.
    totals = {
        r["__b"]: r["t"]
        for r in rows.groupBy("__b").agg(F.sum(size_col).alias("t")).collect()
    }
    prefix, acc = {}, 0
    for b in range(N_BUCKETS):
        prefix[b] = acc
        acc += totals.get(b, 0)

    # phase 4: broadcast the prefix as a literal CASE map
    pairs = []
    for b, p in prefix.items():
        pairs += [F.lit(b), F.lit(p)]
    bucket_prefix = F.create_map(*pairs)[F.col("__b")]
    return (
        out.withColumn(out_col, (bucket_prefix + F.col("__local")).cast("long"))
        .drop("__h", "__b", "__local")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    size_col: str,
    key_col: str,
) -> DataFrame:
    """Concatenate-and-split packing: documents in deterministic hash
    order form one virtual token stream cut into sequences of exactly
    ``max_tokens``. Each document gains:

    - ``offset``: its first token's position in the stream,
    - ``seq_id``: the training sequence its first token lands in,
    - ``seq_end_id``: the sequence its last token lands in (a document
      longer than the remaining room spans sequences - GPT packing
      splits documents at sequence boundaries rather than padding),
    - ``n_seqs_spanned``: how many sequences it touches.

    Zero padding waste by construction; downstream loaders group by
    ``seq_id`` (plus the spill rows) to materialize sequences. The only
    non-shuffle state is the O(256) bucket prefix on the driver."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    out = global_prefix_sum(df, size_col, key_col, out_col="offset")
    last = F.col("offset") + F.col(size_col) - 1
    return (
        out.withColumn(
            "seq_id", F.floor(F.col("offset") / max_tokens).cast("long")
        )
        .withColumn("seq_end_id", F.floor(last / max_tokens).cast("long"))
        .withColumn(
            "n_seqs_spanned",
            (F.col("seq_end_id") - F.col("seq_id") + 1).cast("long"),
        )
    )


def pack_bins_greedy(
    df: DataFrame,
    max_tokens: int,
    size_col: str,
    key_col: str,
) -> DataFrame:
    """No-split bin packing: each document lands whole in exactly one
    bin of capacity ``max_tokens`` (the padding-aware batching layout -
    sequence packing splits documents, this variant never does, e.g.
    for contrastive pairs or multimodal samples that cannot straddle a
    batch).

    Greedy packing is inherently sequential, so it cannot be a pure
    Catalyst expression; the partition-imperative middle runs as
    ``applyInPandas`` over the same 256 hash buckets the prefix-sum
    uses: within a bucket, first-fit-decreasing (sort by size desc, put
    each doc in the first bin with room). Bin ids are globally unique
    ((bucket << 32) | local index) and the whole layout is
    deterministic - hash bucketing + a total FFD order. Documents
    larger than the capacity get a singleton bin with ``oversize`` set
    instead of raising mid-job.

    Packing quality: FFD waste is bounded (11/9 OPT + 1 per bucket);
    buckets add at most one underfull tail bin each, so capacity waste
    stays small while the packing parallelizes across buckets."""
    import pandas as pd

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")

    # the key keeps its native type (string doc ids pack fine); only
    # the size is normalized to long
    out_schema = StructType(
        [
            StructField("key", df.schema[key_col].dataType),
            StructField("size", LongType()),
            StructField("bucket", LongType()),
            StructField("bin_id", LongType()),
            StructField("oversize", BooleanType()),
        ]
    )
    cap = int(max_tokens)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["size", "key"], ascending=[False, True]
        ).reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        fills: list[int] = []
        bins, over = [], []
        for sz in pdf["size"]:
            s = int(sz)
            if s > cap:
                bins.append(len(fills))
                fills.append(s)
                over.append(True)
                continue
            for i, f in enumerate(fills):
                if f + s <= cap:
                    bins.append(i)
                    fills[i] = f + s
                    break
            else:
                bins.append(len(fills))
                fills.append(s)
            over.append(False)
        pdf["bin_id"] = [(bucket << 32) | b for b in bins]
        pdf["oversize"] = over
        return pdf

    h = F.md5(F.col(key_col).cast("string"))
    bucketed = df.select(
        F.col(key_col).alias("key"),
        F.col(size_col).cast("long").alias("size"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("long").alias("bucket"),
    )
    packed = bucketed.groupBy("bucket").applyInPandas(pack, out_schema)
    return packed.withColumnRenamed("key", key_col).withColumnRenamed(
        "size", size_col
    )
