"""Benchmark contamination detection: n-gram overlap against a held-out set.

The standard decontamination pass for pre-training corpora (GPT-3 appendix
C; PaLM §7; most open LLM data pipelines): a training document is
contaminated if enough of its word n-grams also appear in an evaluation
benchmark. Exact n-gram overlap, not fuzzy — the goal is to catch
verbatim leakage of test data.

Scale shape: both sides reduce to DISTINCT (doc, gram) pairs via one
explode each; the overlap is an equality join on the gram. The benchmark
side (eval suites: thousands of docs) is tiny next to the corpus (the
100 TB side), so it is broadcast by default — the corpus-side gram
stream never shuffles, and per-doc match counts aggregate map-side. No
UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quality_filters import _gram_array


def _distinct_doc_grams(
    df: DataFrame, text_col: str, id_col: str | None, n: int, sep: str
) -> DataFrame:
    toks = F.split(F.col(text_col), sep)
    cols = [F.col(id_col)] if id_col else []
    return df.select(
        *cols, F.explode(F.array_distinct(_gram_array(toks, n))).alias("gram")
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_text_col: str | None = None,
    n: int = 8,
    min_matched: int = 1,
    sep: str = " ",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-document contamination report.

    Returns (id_col, n_grams, n_matched, contamination_frac,
    is_contaminated): distinct n-gram count, how many of those grams
    occur anywhere in ``benchmark``, their ratio, and the verdict
    (``n_matched >= min_matched``). Documents with fewer than ``n``
    words have no grams: n_grams=0, frac=0.0, never contaminated.

    ``broadcast_benchmark=False`` falls back to a shuffle join for the
    rare case of a benchmark too big to broadcast."""
    bench_text = benchmark_text_col or text_col
    cg = _distinct_doc_grams(corpus, text_col, id_col, n, sep)
    bg = _distinct_doc_grams(benchmark, bench_text, None, n, sep).distinct()
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    totals = cg.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = (
        cg.join(bg, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched"))
    )
    out = (
        corpus.select(id_col)
        .join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0, F.col("n_matched") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return out.select(
        "*",
        frac.alias("contamination_frac"),
        (F.col("n_matched") >= F.lit(min_matched)).alias("is_contaminated"),
    )
