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
