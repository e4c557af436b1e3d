"""Embedding clustering: distributed Lloyd's k-means over an
``array<float>`` column (the corpus-organization step of a training-data
pipeline: topic balancing, dedup-within-cluster, stratified sampling).

Spark-first design, no Python in the hot path and **no shuffle in the
assignment step**:

- **Assignment** folds the K centroids into the plan as an
  array-of-structs literal and computes, per row, an ``array_min`` over
  ``transform(centroids, c -> (dist, id))`` - squared-L2 via
  ``zip_with`` + ``aggregate`` higher-order functions, all JVM-codegen'd.
  A pure projection: zero joins, zero shuffles, scales to any corpus.
- **Update** recomputes centroids as element-wise means via
  ``posexplode`` -> ``groupBy(cluster, pos)`` - one shuffle keyed on
  (cluster, dimension), i.e. K*dim groups regardless of corpus size; the
  K x dim result is collected to the driver (tiny) and folded into the
  next iteration's plan.

At 100 TB the per-iteration cost is one corpus scan + one K*dim-group
shuffle; centroid state never grows with data. Iterations are bounded
and the caller sees per-iteration inertia for convergence monitoring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Centroids = list[tuple[int, list[float]]]


def l2_sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance between two array<double> columns as a
    sequential left fold (deterministic order, reproducible across
    engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _centroid_literal(centroids: Centroids) -> Column:
    """K centroids as an array<struct<cid,cv>> literal - plan-embedded
    constants, broadcast implicitly with the task binaries."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cv"),
            )
            for cid, vec in centroids
        ]
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: Centroids,
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
    distance: str = "l2",
) -> DataFrame:
    """Assign each row to its nearest centroid (squared L2, rounded to
    9 dp; ties break to the lowest cluster id - deterministic).

    ``distance='l2'`` folds (x-y)^2 elementwise; ``'l2_expanded'``
    computes a.a - 2a.b + b.b from three dot products - numerically the
    form SQL engines build from ``list_dot_product``, so cross-engine
    comparisons agree bit-for-bit (same fold order, same combination).

    Returns ``df`` plus ``cluster_col`` and ``dist_sq``. The centroid
    list is metadata-scale (K entries); the assignment is a single
    whole-stage-codegen projection over the corpus."""
    if not centroids:
        raise ValueError("no centroids")
    vec = F.col(vec_col).cast("array<double>")
    if distance == "l2":
        dist = lambda c: l2_sq(vec, c)  # noqa: E731
    elif distance == "l2_expanded":
        dist = lambda c: _dot(vec, vec) - 2 * _dot(vec, c) + _dot(c, c)  # noqa: E731
    else:
        raise ValueError(f"unknown distance {distance!r}")
    best = F.array_min(
        F.transform(
            _centroid_literal(centroids),
            lambda c: F.struct(
                F.round(dist(c["cv"]), 9).alias("d2"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return df.withColumn("__best", best).select(
        *df.columns,
        F.col("__best.cid").alias(cluster_col),
        F.col("__best.d2").alias("dist_sq"),
    )


def update_centroids(
    assigned: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
) -> Centroids:
    """Element-wise mean per cluster: explode to (cluster, pos, value),
    average, re-assemble ordered arrays. The shuffle is K*dim groups -
    independent of corpus size - and the K x dim result is tiny, so
    collecting it to the driver is the correct move (it feeds the next
    plan as literals)."""
    exploded = assigned.select(
        F.col(cluster_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"),
    )
    dims = exploded.groupBy(cluster_col, "pos").agg(F.avg("v").alias("m"))
    rows = (
        dims.groupBy(cluster_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.m,
            ).alias("centroid")
        )
        .collect()
    )
    return sorted((int(r[cluster_col]), list(r["centroid"])) for r in rows)


def kmeans_fit(
    df: DataFrame,
    k: int,
    n_iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    track_inertia: bool = True,
) -> tuple[DataFrame, Centroids, list[float]]:
    """Lloyd's k-means: deterministic init (the K lowest-``id_col`` rows
    seed the centroids), fixed iteration budget.

    Returns (assignments with ``cluster_id``/``dist_sq``, final
    centroids, per-iteration inertia). Inertia is monotonically
    non-increasing under Lloyd's updates - asserted in tests, monitored
    in production. ``track_inertia=False`` skips the per-iteration
    inertia collect (one Spark job per iteration) for callers that only
    want centroids - e.g. PQ codebook fits running m of these."""
    seed_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids: Centroids = [
        (i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seed_rows)
    ]
    base = df.select(id_col, vec_col)
    inertia: list[float] = []
    assigned = None
    for _ in range(n_iters):
        assigned = assign_clusters(base, centroids, vec_col=vec_col)
        if track_inertia:
            inertia.append(
                assigned.agg(F.sum("dist_sq").alias("s")).collect()[0]["s"]
                or 0.0
            )
        new = update_centroids(assigned, vec_col=vec_col)
        if not new:
            break
        # empty clusters keep their previous centroid (standard Lloyd's
        # degenerate-cluster handling; deterministic)
        got = dict(new)
        centroids = [(cid, got.get(cid, vec)) for cid, vec in centroids]
    return assigned, centroids, inertia
