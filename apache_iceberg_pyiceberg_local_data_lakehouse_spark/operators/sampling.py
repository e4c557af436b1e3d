"""Deterministic sampling for training-data pipelines: content-hash
ordering instead of RNG, so a sample is (a) reproducible run-to-run,
(b) engine-portable (any SQL engine with md5 draws the identical rows),
(c) stable under repartitioning - properties seeded RNG sampling loses
the moment the plan or partitioning changes.

- ``sample_fraction``: keep rows whose md5(key) hex string sorts below
  the fraction's hex threshold - a pure filter, pushes down, zero
  shuffle. (Fixed-width lowercase hex compares lexicographically ==
  numerically, so the threshold is computed once in the driver.)
- ``stratified_sample``: exactly n rows per stratum (class balancing),
  chosen as the n lowest md5(key) per group - one window shuffle keyed
  on the strata columns; at 100 TB that is the same single shuffle any
  per-class top-k costs.

Hash-ordering caveat (documented, deliberate): md5 over the key column
is uniform, so the sample is unbiased as long as the KEY does not
correlate with the measured property. Use the row's stable id, not a
feature column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_key(key: Column) -> Column:
    """md5 hex of the stringified key: a deterministic, engine-portable
    uniform draw. Lowercase fixed-width hex, so string order == numeric
    order in every engine."""
    return F.md5(key.cast("string"))


def fraction_threshold_hex(fraction: float, digits: int = 8) -> str:
    """The hex string h such that P[md5 prefix < h] == fraction."""
    return format(int(fraction * (16**digits)), f"0{digits}x")


def sample_fraction(df: DataFrame, fraction: float, key_col: str) -> DataFrame:
    """Deterministic ~``fraction`` sample: rows whose hash prefix sorts
    below the threshold. A pure filter - no shuffle, no state,
    repeatable, and re-running on a grown table keeps every previously
    sampled row (append-stable samples)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thr = fraction_threshold_hex(fraction)
    return df.filter(
        F.substring(_hash_key(F.col(key_col)), 1, 8) < F.lit(thr)
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum: the n lowest
    md5(key) per group (ties broken by key - total order, so the result
    set is unique). One window shuffle on the strata columns."""
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_key(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def uniform_from_key(key: Column) -> Column:
    """Deterministic uniform draw in [0, 1) from a key: the first 8 md5
    hex chars as a 32-bit integer (exact in a double), scaled. The same
    value is computable in any engine with md5 + hex parsing (DuckDB:
    ``CAST('0x' || substring(md5(k), 1, 8) AS BIGINT) / 4294967296.0``)."""
    return (
        F.conv(F.substring(_hash_key(key), 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    key_col: str,
    scale: float = 1.0,
) -> DataFrame:
    """Deterministic weighted sampling: keep a row iff its hash-derived
    uniform draw is below ``scale * weight`` — each row kept with
    probability min(1, scale*weight), independently, reproducibly.

    The quality-weighted resampling step of corpus curation (CCNet /
    GPT-3 style: upweight high-quality documents by keeping them with
    higher probability). Pure per-row filter: no shuffle, no RNG state,
    append-stable, and pushes down like any predicate. ``weight`` is an
    arbitrary Column (a quality score, a per-language rate, ...)."""
    u = uniform_from_key(F.col(key_col))
    return df.filter(u < F.lit(float(scale)) * weight)


def mix_corpus(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    budget: int,
    size_col: str,
    key_col: str,
) -> DataFrame:
    """Corpus composition: select documents per domain until each
    domain's selected volume reaches its share of ``budget``
    (``weights[domain] * budget`` units of ``size_col`` — tokens, chars,
    bytes). The training-data mixing step (The Pile / Llama-style
    per-source sampling weights) as one deterministic operator.

    Selection order within a domain is the hash order (md5 of the key),
    so the mix is reproducible, engine-portable, and append-stable:
    re-running over a grown corpus keeps previously chosen docs unless
    hash-earlier arrivals displace the tail. A row is kept while the
    running total BEFORE it is under the domain budget, so every domain
    with any data gets at least one document and the overshoot is at
    most one document per domain.

    Physical plan: one window shuffle partitioned by domain (the same
    single shuffle any per-group ranking costs); domains absent from
    ``weights`` drop out via the map lookup BEFORE the shuffle, so
    unsampled sources never pay it."""
    pairs: list[Column] = []
    for d, w in weights.items():
        pairs += [F.lit(d), F.lit(float(w) * budget)]
    dom_budget = F.create_map(*pairs)[F.col(domain_col)]
    w = (
        Window.partitionBy(domain_col)
        .orderBy(_hash_key(F.col(key_col)), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.filter(dom_budget.isNotNull())
        .withColumn("__cum_before", F.coalesce(F.sum(size_col).over(w), F.lit(0)))
        .filter(F.col("__cum_before") < dom_budget)
        .drop("__cum_before")
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic, leakage-safe dataset split: every row whose
    ``key_col`` hashes into the same band gets the same ``split``
    label, so ALL rows sharing a key (a document's chunks, a user's
    events, a source's pages) land in the same partition of the split
    - the grouped-split discipline that keeps eval sets honest.

    A pure projection: no shuffle, no state, append-stable (new rows
    of a known key join its existing split; re-running on a grown
    table never reassigns). ``weights`` maps label -> fraction (must
    sum to 1); band boundaries are cumulative md5-prefix thresholds,
    the :func:`sample_fraction` convention, so a SQL oracle can
    reproduce the assignment exactly. ``salt`` re-rolls the assignment
    (md5 of salt || key) without touching the schema."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    if not weights:
        raise ValueError("weights must be a non-empty mapping")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    # zero-weight labels receive no band at all - keeping one in the
    # threshold walk would push the cumulative fraction to 1.0, whose
    # 9-hex-char threshold compares wrong against 8-char prefixes and
    # silently hands the previous band's rows to the wrong label
    labels = [lab for lab in weights if weights[lab] > 0]
    key = F.col(key_col).cast("string")
    if salt:
        key = F.concat(F.lit(salt), key)
    prefix = F.substring(F.md5(key), 1, 8)
    cum = 0.0
    expr = None
    for label in labels[:-1]:
        cum += weights[label]
        thr = F.lit(fraction_threshold_hex(min(cum, 1.0 - 1e-12)))
        branch = (
            F.when(prefix < thr, F.lit(label))
            if expr is None
            else expr.when(prefix < thr, F.lit(label))
        )
        expr = branch
    expr = (
        expr.otherwise(F.lit(labels[-1]))
        if expr is not None
        else F.lit(labels[-1])
    )
    return df.withColumn("split", expr)
