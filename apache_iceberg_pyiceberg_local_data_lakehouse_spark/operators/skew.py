"""Skew handling for joins (SURVEY.md scale mandate: "skewed keys ->
salting or AQE skew-join").

AQE's skew-join splitting (enabled in session.py) is the default answer.
``salted_join`` is the explicit fallback for cases AQE can't fix - e.g. a
single hot key so large that even split shuffle partitions overwhelm one
executor, or a build side too big to broadcast but with few distinct
keys.

Mechanism: replicate each build-side row R times with salt 0..R-1; give
each probe-side row a random-but-deterministic salt in [0, R); join on
(key, salt). The hot key's rows spread across R tasks instead of one.
Correctness: every probe row matches exactly the one build replica that
carries its salt, so multiplicities are preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with salt-spread hot keys.

    ``probe`` (large, possibly skewed) gets a deterministic per-row salt
    (hash of all probe columns, so re-runs salt identically); ``build``
    (smaller) is replicated ``salt_buckets`` times. The shuffle key
    becomes (on, salt) - a hot key now lands on ``salt_buckets`` tasks.
    """
    salted_probe = probe.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(salt_buckets)),
    )
    salted_build = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_probe.join(salted_build, on=[on, "__salt"], how=how)
    return out.drop("__salt")
