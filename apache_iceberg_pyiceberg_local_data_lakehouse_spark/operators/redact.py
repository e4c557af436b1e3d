"""PII detection and redaction over text columns - the scrubbing pass
every LLM training-data pipeline runs before anything else touches the
corpus (emails, phone numbers, SSN-shaped ids, IPs).

Pure ``regexp_count`` / ``regexp_replace`` expressions: JVM-side,
whole-stage-codegen, one projection over the corpus - no UDFs, no
shuffle. Patterns stay in the RE2-compatible subset (no lookarounds, no
backreferences) so the same rule strings run on Spark (Java regex),
DuckDB/RE2 engines, and grep alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deliberately conservative, dialect-portable patterns. Order matters:
# rules apply sequentially, each over the previous rule's output.
DEFAULT_RULES: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_text(
    df: DataFrame,
    text_col: str = "text",
    rules: dict[str, str] | None = None,
    placeholder: str = "[{kind}]",
    out_col: str | None = None,
) -> DataFrame:
    """Count and redact PII matches.

    Adds one ``n_<kind>`` count column per rule (counted on the ORIGINAL
    text, so overlapping rules each report their own hits) and
    ``<text_col>_redacted`` (or ``out_col``) with every match replaced
    by the rule's placeholder. SSN-shaped strings that an earlier phone
    rule already consumed are not double-redacted - sequential
    application, document rule order accordingly."""
    rules = DEFAULT_RULES if rules is None else rules
    src = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    red = src
    for kind, pat in rules.items():
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(src, F.lit(pat))
        )
        red = F.regexp_replace(red, pat, placeholder.format(kind=kind))
    return out.withColumn(out_col or f"{text_col}_redacted", red)
