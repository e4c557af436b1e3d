"""Paragraph-level deduplication (CCNet-style line dedup).

The standard web-corpus cleanup from Wenzek et al. 2020 ("CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
§3.1): boilerplate (cookie banners, navigation, license footers)
repeats verbatim across millions of pages, so documents are split into
paragraphs, each paragraph is hashed, and any paragraph seen elsewhere
in the corpus is dropped — keeping one canonical first occurrence —
before the document is reassembled from its surviving paragraphs.

Scale shape (the 100 TB concern is boilerplate skew — ONE cookie
banner can appear in 10^8 documents):

- occurrence counting and first-occurrence election are a single
  ``groupBy(paragraph-hash)`` with ``count`` + ``min_by`` — both
  map-side combining aggregates, so a pathologically repeated
  paragraph reduces to one row per map task before the shuffle;
- the verdict join back to the exploded paragraphs is a plain
  equi-join on the hash (AQE skew-join splits any residual hot key);
- reassembly groups by document id — bounded by document size.

No windows over the paragraph key (a ``row_number`` per hash would put
every copy of a hot paragraph in one partition), no UDFs, no driver
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_count: int = 2,
    keep_first: bool = True,
) -> DataFrame:
    """Remove corpus-duplicated paragraphs from every document.

    A paragraph is *duplicated* when its exact text occurs at least
    ``min_count`` times across the whole corpus (counting every
    occurrence, including repeats inside one document). Duplicated
    paragraphs are dropped; with ``keep_first=True`` (CCNet behavior)
    the single globally-first occurrence — ordered by ``(id_col,
    paragraph position)`` — survives so the corpus retains one copy of
    the text.

    Returns one row per input row: all original columns, with
    ``text_col`` rebuilt from the surviving paragraphs (original order,
    joined with ``sep``; empty string when nothing survives) plus
    ``n_paras`` (paragraph count before dedup) and ``n_removed``.
    """
    paras = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias(
            "__pos", "__para"
        ),
    )
    # one combining agg per distinct paragraph: global count + the
    # first (doc, pos) occurrence. min_by on a packed struct keeps the
    # election a single pass.
    stats = paras.groupBy("__para").agg(
        F.count("*").alias("__cnt"),
        F.min(F.struct("__id", "__pos")).alias("__first"),
    )
    keep = F.col("__cnt") < F.lit(min_count)
    if keep_first:
        keep = keep | (
            (F.col("__first.__id") == F.col("__id"))
            & (F.col("__first.__pos") == F.col("__pos"))
        )
    survivors = paras.join(stats, "__para").withColumn(
        "__keep", keep
    )
    rebuilt = survivors.groupBy("__id").agg(
        F.count("*").alias("n_paras"),
        F.sum((~F.col("__keep")).cast("long")).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct("__pos", "__para"),
                        )
                    )
                ),
                lambda s: s["__para"],
            ),
            sep,
        ).alias("__new_text"),
    )
    out = (
        df.join(rebuilt, df[id_col] == rebuilt["__id"], "left")
        .drop("__id")
        .withColumn(text_col, F.coalesce("__new_text", F.lit("")))
        .drop("__new_text")
        .withColumn("n_paras", F.coalesce("n_paras", F.lit(0)))
        .withColumn("n_removed", F.coalesce("n_removed", F.lit(0)))
    )
    return out


def paragraph_duplication_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Per-document duplication profile without rewriting text: paragraph
    count, how many of the document's paragraphs are corpus-duplicated,
    and the duplicated fraction. Same two-aggregate shape as
    :func:`dedup_paragraphs` minus the reassembly."""
    paras = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias(
            "__pos", "__para"
        ),
    )
    counts = paras.groupBy("__para").agg(F.count("*").alias("__cnt"))
    return (
        paras.join(counts, "__para")
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum((F.col("__cnt") >= 2).cast("long")).alias("n_dup_paras"),
        )
        .withColumn(
            "dup_frac",
            F.col("n_dup_paras").cast("double") / F.col("n_paras"),
        )
        .withColumnRenamed("__id", id_col)
    )
