"""Language identification via character-n-gram profiles (SURVEY.md X4:
"language-ID (n-gram heuristic)").

Classic Cavnar-Trenkle shape, Spark-first: each language has a small
profile of characteristic character trigrams + function words; a
document's score per language is the weighted overlap of its trigram and
word sets with the profile, computed entirely with JVM array expressions.
No Python UDF, no shuffle - per-row classification that scales linearly.

Profiles here are compact built-ins for 5 languages - a production system
would learn them from labeled text with the same groupBy machinery as
q43's token frequencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# characteristic character trigrams (with space markers) + function words
PROFILES: dict[str, dict[str, tuple[str, ...]]] = {
    "en": {
        "tri": (" th", "the", "he ", " an", "and", "nd ", "ing", "ng ", " of", "of "),
        "words": ("the", "and", "of", "to", "in", "is", "that", "with"),
    },
    "fr": {
        "tri": (" le", "le ", " de", "de ", "es ", " la", "la ", "ent", "nt ", " et"),
        "words": ("le", "la", "de", "et", "les", "des", "un", "une", "est"),
    },
    "de": {
        "tri": (" de", "der", "er ", "ie ", " di", "die", "ch ", "ein", " un", "und"),
        "words": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    },
    "es": {
        "tri": (" de", "de ", " la", "la ", "os ", " el", "el ", "ion", "on ", "que"),
        "words": ("el", "la", "de", "que", "los", "las", "una", "es", "por"),
    },
    "it": {
        "tri": (" di", "di ", " il", "il ", "re ", " la", "to ", "che", " ch", "one"),
        "words": ("il", "di", "che", "la", "per", "una", "sono", "con"),
    },
}


def detect_language(
    df: DataFrame, text_col: str = "text", out_col: str = "detected_lang"
) -> DataFrame:
    """Append (detected_lang, lang_confidence) per row.

    score(lang) = 2 * |tri(doc) & tri(lang)| + 3 * |words(doc) & words(lang)|;
    argmax is taken as a struct max over (score, lang), which is
    deterministic (score first, lexicographically larger lang on ties).
    Confidence = winning score / total score across languages.
    """
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    n = F.length(padded)
    idx = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1)))
    doc_tris = F.array_distinct(
        F.transform(idx, lambda i: F.substr(padded, i, F.lit(3)))
    )
    doc_words = F.array_distinct(F.split(F.lower(F.col(text_col)), " "))

    def lang_score(lang: str):
        prof = PROFILES[lang]
        tri_arr = F.array(*[F.lit(t) for t in prof["tri"]])
        word_arr = F.array(*[F.lit(w) for w in prof["words"]])
        return (
            F.size(F.array_intersect(doc_tris, tri_arr)) * 2
            + F.size(F.array_intersect(doc_words, word_arr)) * 3
        )

    langs = sorted(PROFILES)
    scores = F.array(
        *[
            F.struct(lang_score(lang).alias("score"), F.lit(lang).alias("lang"))
            for lang in langs
        ]
    )
    best = F.array_max(scores)
    total = F.aggregate(
        scores, F.lit(0), lambda acc, s: acc + s.score
    )
    return (
        df.withColumn("__best", best)
        .withColumn("__total", total)
        .withColumn(out_col, F.col("__best.lang"))
        .withColumn(
            "lang_confidence",
            F.when(
                F.col("__total") > 0,
                F.col("__best.score").cast("double") / F.col("__total"),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__best", "__total")
    )


def langid_oracle_sql() -> str:
    """DuckDB SQL computing EXACTLY ``detect_language`` + the q45b rollup.

    The n-gram scoring is deterministic integer arithmetic over literal
    profiles, so the oracle replicates it term-for-term (list_intersect
    on distinct lists == array_intersect; CASE in reverse-lexicographic
    language order == the struct-max tie-break; confidence quantized to
    1e-6 before averaging on both engines). Generated from PROFILES so
    the two sides can never drift."""

    def lst(items: tuple[str, ...]) -> str:
        return "[" + ", ".join("'" + i.replace("'", "''") + "'" for i in items) + "]"

    score_cols = ", ".join(
        f"2*len(list_intersect(tris, {lst(p['tri'])}))"
        f" + 3*len(list_intersect(words, {lst(p['words'])})) AS s_{lang}"
        for lang, p in sorted(PROFILES.items())
    )
    langs_desc = sorted(PROFILES, reverse=True)
    case = (
        "CASE "
        + " ".join(f"WHEN s_{l} = b THEN '{l}'" for l in langs_desc[:-1])
        + f" ELSE '{langs_desc[-1]}' END"
    )
    sums = ", ".join(f"s_{l}" for l in sorted(PROFILES))
    total = " + ".join(f"s_{l}" for l in sorted(PROFILES))
    return f"""
    WITH base AS (
      SELECT ' ' || lower(text) || ' ' AS p,
             list_distinct(string_split(lower(text), ' ')) AS words
      FROM documents
    ), tri AS (
      SELECT list_distinct(list_transform(
               range(1, greatest(length(p) - 2, 1) + 1),
               i -> substr(p, CAST(i AS INT), 3))) AS tris,
             words
      FROM base
    ), sc AS (
      SELECT {score_cols} FROM tri
    ), det AS (
      SELECT greatest({sums}) AS b, {total} AS tot, *
      FROM sc
    )
    SELECT {case} AS detected_lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(FLOOR(
                 CASE WHEN tot > 0 THEN CAST(b AS DOUBLE) / tot ELSE 0.0 END
                 * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / COUNT(*) AS avg_confidence
    FROM det
    GROUP BY 1
    """
