"""Lexical + hybrid retrieval over the corpus: BM25 scoring and
reciprocal-rank fusion (the retrieval half of a RAG / training-data
curation stack).

Scale design: everything is explode + groupBy + broadcast-joins of tiny
per-term frames - no UDFs, no driver loops. The per-(doc, term) score is
quantized to a scaled BIGINT *before* the per-document sum, so the
rollup is exact integer math and bit-identical cross-engine (the same
discipline as the unigram-LM scorer, ``operators/lm.py``).

Determinism note: ``ln`` differs between libm implementations only in
the last ulp; quantizing each term's contribution at 1e-6 absorbs it
(measured over the DuckDB oracle corpus - same precedent as q5l).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_Q = 1_000_000  # per-term score quantization (1e-6)


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )


def top_terms(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus's ``n`` most frequent tokens (deterministic tiebreak:
    token ascending) - a reproducible stand-in for a user query."""
    return (
        _tokens(docs, text_col, id_col)
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(n)
        .select("tok")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 (Robertson/Sparck Jones) of every document against the
    query-term set: ``(id_col, score_q)`` with

        score_q = SUM over matched terms of
                  floor(idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
                        * 1e6 + 0.5)

    idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the +1 keeps it positive).
    ``query_terms`` is a one-column frame (``tok``); it is broadcast -
    the corpus-side frames never shuffle on anything but id/token.
    Documents matching no term are absent (score 0)."""
    toks = _tokens(docs, text_col, id_col)
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = sizes.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    matched = toks.join(F.broadcast(query_terms), on="tok")
    tf = matched.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    df_ = matched.groupBy("tok").agg(
        F.countDistinct(id_col).alias("df")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tfnorm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    per_term = (
        tf.join(F.broadcast(df_), on="tok")
        .join(sizes, on=id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.floor(idf * tfnorm * _Q + 0.5).cast("long").alias("sq"),
        )
    )
    return per_term.groupBy(id_col).agg(F.sum("sq").alias("score_q"))


def rrf_fuse(
    ranked_lists: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion: each input frame must carry
    ``(id_col, rank)`` (1-based). Contribution 1/(k + rank) is
    quantized at 1e-9 per list, then summed as exact integers -
    ``(id_col, rrf_q)``. IEEE division is correctly rounded, so the
    quantized contributions are bit-identical cross-engine."""
    parts = [
        df.select(
            id_col,
            F.floor(
                F.lit(1_000_000_000.0) / (F.lit(float(k)) + F.col("rank"))
                + 0.5
            )
            .cast("long")
            .alias("c"),
        )
        for df in ranked_lists
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(id_col).agg(F.sum("c").alias("rrf_q"))


def rank_by(
    scores: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    k: int | None = None,
) -> DataFrame:
    """Deterministic ranking: score desc, id asc (rank 1-based). Rank
    AFTER quantization so sub-ulp float noise can never flip an order
    across engines.

    Pass ``k`` whenever only the top-k matters: the orderBy+limit
    executes as TakeOrderedAndProject (each partition keeps its local
    top-k, the driver merges k rows) and the single-partition window
    then ranks only ``k`` rows - a global row_number over the full
    scored set would funnel everything through one task."""
    if k is not None:
        scores = scores.orderBy(F.desc(score_col), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return scores.select(
        id_col, score_col, F.row_number().over(w).alias("rank")
    )
