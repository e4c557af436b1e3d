"""Gopher-style document quality filters (repetition + shape heuristics).

The filter battery from Rae et al. 2021 ("Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", §A1.1), the standard
pre-training corpus gate: reject documents that are too short/long, have
degenerate word shapes, or repeat themselves (duplicate lines, dominant
n-grams, duplicated n-grams).

Scale shape: the word-shape and line metrics are pure per-row Catalyst
expressions (no shuffle, whole-stage codegen). The n-gram repetition
metrics build every requested gram size in ONE pass — each row explodes
a single concatenated (n, gram) array — then aggregate with map-side
partial combine on (id, n, gram); no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# keep-thresholds (Gopher defaults adapted to whitespace tokenization)
DEFAULT_THRESHOLDS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_top2gram_frac": 0.20,
    "max_top3gram_frac": 0.18,
    "max_dup5gram_frac": 0.30,
}


def _gram_array(toks: Column, n: int) -> Column:
    """Array of space-joined n-grams over a token array (q47's shingle
    construction generalized)."""
    idx = F.sequence(F.lit(0), F.size(toks) - F.lit(n))
    return F.when(
        F.size(toks) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k + 1) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_grams: tuple[int, ...] = (2, 3),
    dup_grams: tuple[int, ...] = (5,),
    sep: str = " ",
) -> DataFrame:
    """Per-document repetition metrics.

    For each n in ``top_grams``: ``top{n}gram_frac`` — the fraction of
    all n-gram occurrences taken by the single most frequent n-gram.
    For each n in ``dup_grams``: ``dup{n}gram_frac`` — the fraction of
    n-gram occurrences that are repeats (1 - distinct/total).
    Documents shorter than n words score 0.0 (nothing repeats).

    One explode covers every gram size: rows carry a concatenated
    array<struct<n,gram>> so the gram build is a single projection and
    the heavy shuffle keys on (id, n, gram) with partial aggregation.
    """
    toks = F.split(F.col(text_col), sep)
    sizes = sorted(set(top_grams) | set(dup_grams))

    def _tag(n: int):
        # NB: a two-arg transform lambda would receive (element, INDEX) —
        # the closure must stay single-arg or n gets shadowed by the index
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.concat(
        *[F.transform(_gram_array(toks, n), _tag(n)) for n in sizes]
    )
    counts = (
        df.select(F.col(id_col), F.explode(tagged).alias("g"))
        .groupBy(id_col, "g.n", "g.gram")
        .agg(F.count("*").alias("cnt"))
    )
    per = counts.groupBy(id_col, "n").agg(
        (F.max("cnt") / F.sum("cnt")).alias("top_frac"),
        (F.lit(1.0) - F.count("*") / F.sum("cnt")).alias("dup_frac"),
    )
    # with multiple aggregations, pivot always names columns
    # "<value>_<alias>" — even for a single pivot value
    wide = per.groupBy(id_col).pivot("n", list(sizes)).agg(
        F.first("top_frac").alias("top"), F.first("dup_frac").alias("dup")
    )
    out = df.select(id_col).join(wide, id_col, "left")
    for n in top_grams:
        out = out.withColumn(
            f"top{n}gram_frac", F.coalesce(F.col(f"{n}_top"), F.lit(0.0))
        )
    for n in dup_grams:
        out = out.withColumn(
            f"dup{n}gram_frac", F.coalesce(F.col(f"{n}_dup"), F.lit(0.0))
        )
    drop = [c for c in out.columns if c.endswith("_top") or c.endswith("_dup")]
    return out.drop(*drop)


def word_shape_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
) -> DataFrame:
    """Per-document word-shape metrics, shuffle-free.

    ``word_count``: whitespace tokens. ``mean_word_len``: derived
    arithmetically from char length for single-separator text
    ((chars - (words-1)) / words), avoiding a per-token pass."""
    toks = F.split(F.col(text_col), sep)
    wc = F.size(toks)
    return df.select(
        F.col(id_col),
        wc.alias("word_count"),
        (
            (F.length(text_col) - wc + F.lit(1)) / wc
        ).alias("mean_word_len"),
    )


def line_shape_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Line-level Gopher metrics (meaningful for corpora with newlines):
    duplicate-line fraction, bullet-line fraction, ellipsis-line
    fraction. Pure array expressions — no shuffle, no UDF."""
    lines = F.split(F.col(text_col), "\n")
    n = F.size(lines)
    return df.select(
        F.col(id_col),
        (
            F.lit(1.0) - F.size(F.array_distinct(lines)) / n
        ).alias("dup_line_frac"),
        (
            F.size(
                F.filter(
                    lines,
                    lambda ln: F.trim(ln).rlike(r"^[-*•]"),
                )
            )
            / n
        ).alias("bullet_line_frac"),
        (
            F.size(F.filter(lines, lambda ln: ln.endswith(F.lit("..."))))
            / n
        ).alias("ellipsis_line_frac"),
    )


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict[str, float] | None = None,
    sep: str = " ",
) -> DataFrame:
    """Full filter battery: word-shape + repetition metrics and a
    ``keep`` verdict per document. Join key is ``id_col`` (the one
    shuffle beyond the n-gram aggregation)."""
    th = {**DEFAULT_THRESHOLDS, **(thresholds or {})}
    shape = word_shape_metrics(df, text_col, id_col, sep)
    rep = token_repetition_metrics(df, text_col, id_col, sep=sep)
    m = shape.join(rep, id_col)
    keep = (
        (F.col("word_count") >= F.lit(th["min_words"]))
        & (F.col("word_count") <= F.lit(th["max_words"]))
        & (F.col("mean_word_len") >= F.lit(th["min_mean_word_len"]))
        & (F.col("mean_word_len") <= F.lit(th["max_mean_word_len"]))
        & (F.col("top2gram_frac") <= F.lit(th["max_top2gram_frac"]))
        & (F.col("top3gram_frac") <= F.lit(th["max_top3gram_frac"]))
        & (F.col("dup5gram_frac") <= F.lit(th["max_dup5gram_frac"]))
    )
    return m.withColumn("keep", keep)
