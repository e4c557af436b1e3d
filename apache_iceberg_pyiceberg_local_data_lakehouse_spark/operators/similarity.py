"""Similarity search over embedding columns (SURVEY.md X3).

Three tiers, per the north star:
- ``knn_bruteforce``: exact cosine top-k - broadcast the query set,
  score every (query, corpus) pair with JVM array expressions, window
  top-k. O(|Q|·|C|) but embarrassingly parallel; the correctness oracle.
- ``knn_lsh``: random-hyperplane LSH - bucket corpus + queries by
  sign-bit sketches, score only within matching buckets (multi-probe via
  several independent sketch tables). Approximate; recall is tunable with
  (n_tables, n_bits) and pytest-asserted against brute force.
- ``knn_ivf``: inverted-file ANN - k-means cells (pyspark.ml), queries
  probe the nearest n_probes cells only. The scan-fraction path for data
  that clusters.

At 100 TB the corpus side stays partitioned (never collected); the only
wide exchange in every tier is one bucket/cell join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(v: Column) -> Column:
    """sqrt(dot(v, v)) — factored out so pair-scoring joins compute each
    side's norm ONCE per row instead of once per pair (the r14 q50/q52
    hoist). ``dot(a, b) / (norm_a * norm_b)`` performs the exact same
    IEEE-double operations in the same order as :func:`cosine`, so
    similarities (and the 9-dp-rounded driver hashes) are bit-identical;
    only the redundant per-pair recomputation of the two self-dots is
    removed (3 interpreted HOF folds per pair -> 1)."""
    return F.sqrt(dot(v, v))


def _py_norm(v) -> float:
    """Driver-side twin of :func:`norm` for plan-literal vectors: the
    left-fold ``acc = 0.0; acc += x*x`` in element order is the same
    IEEE-double sequence Catalyst's ``aggregate(zip_with(v, v, *))``
    executes, so ``F.lit(_py_norm(c))`` is bit-identical to
    ``norm(_lit_vec(c))`` while costing nothing per row."""
    import math

    acc = 0.0
    for x in v:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def unit_norm(v: Column) -> Column:
    """L2-normalize an array<double> column; zero vectors stay zero.
    THE normalization of the PQ family - knn_pq's serve path,
    opq_rotation's variance fit and opq_fit's trainer must all measure
    the same distribution, so they all call this one expression."""
    v = v.cast("array<double>")
    n = F.sqrt(dot(v, v))
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


def _driver_lloyd(S, k: int, n_iters: int, init=None):
    """Driver-side Lloyd's over a bounded sample (numpy), the SINGLE
    implementation behind pq_fit's sampled path and opq_fit's codebook
    refits - the seeding (k lowest-id rows, repeat-last padding),
    np.round(d2, 9) tie-breaking to the lowest centroid id, and
    empty-clusters-keep-their-centroid rules mirror
    operators.clustering.kmeans_fit exactly and MUST stay bit-identical
    across callers (codes are only decodable under the discipline they
    were fitted with)."""
    import numpy as np

    if init is not None:
        C = np.asarray(init, dtype=np.float64).copy()
    else:
        C = S[: min(k, len(S))].copy()
        if len(C) < k:  # degenerate tiny corpus: repeat last seed
            C = np.vstack([C, np.repeat(C[-1:], k - len(C), axis=0)])
    for _ in range(n_iters):
        d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.round(d2, 9).argmin(axis=1)
        for cid in range(k):
            mask = assign == cid
            if mask.any():
                C[cid] = S[mask].mean(axis=0)
    return C


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k: returns (query_id, neighbor_id, sim, rank)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("__cn", norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("__qn", norm(F.col("qv")))
    # norms hoisted below the join (r15, the q50 pattern): one HOF dot
    # per pair instead of three; identical doubles, identical sims
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn"))
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _bucket_udf(planes: list[list[float]], n_tables: int, n_bits: int):
    """Arrow-vectorized sketch: all ``n_tables`` bucket ids per vector in
    one batched numpy matmul.

    This is the measured exception to the "stay JVM-side" rule: per-row
    dense linear algebra is pathological for Catalyst expressions in
    EVERY form tried -
    - ``aggregate(zip_with(...))`` higher-order dots: lambda bodies are
      evaluated interpreted per element -> ~24 ms/row at 24x6 planes,
      dim 64 (16-20 s for 500 vectors);
    - explicit ``vec[i]*w + ...`` multiply-add chains: CollapseProject
      inlines the shared-bits projection into all 144 uses -> a 10^5-node
      tree, >30 s and OOM-prone codegen.
    One BLAS matmul per Arrow batch ((batch x dim) @ (dim x planes),
    sign, Horner-pack) computes the same buckets ~100x faster and scales
    per-row at 100 TB. Bucket values bit-pack bits[t*n_bits + b] MSB
    first - identical candidate sets to the expression form."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64).T  # (dim, n_tables*n_bits)

    def _buckets(v):
        X = np.vstack(v.to_numpy())  # (batch, dim)
        B = (X @ P) >= 0.0  # (batch, n_planes) sign bits
        out = np.zeros((X.shape[0], n_tables), dtype=np.int64)
        for t in range(n_tables):
            for b in range(n_bits):
                out[:, t] = out[:, t] * 2 + B[:, t * n_bits + b]
        return pd.Series(list(out))

    # real (non-stringized) hints: the module's `from __future__ import
    # annotations` would otherwise break pandas_udf type inference
    _buckets.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf("array<long>")(_buckets)


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 24,
    n_bits: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Each of ``n_tables`` sketch tables buckets vectors by an ``n_bits``
    sign sketch; candidates = corpus rows sharing a bucket with the query
    in ANY table. Exact cosine re-ranks candidates. P(candidate | angle
    theta) = 1-(1-(1-theta/pi)^n_bits)^n_tables.

    Parameter note: defaults are tuned for WEAK similarity structure
    (fixture top-5 neighbors sit at cosine ~0.3, i.e. theta~70deg, where
    a sign bit agrees only 61% of the time - measured). Real embedding
    corpora cluster much tighter (neighbors at cosine 0.8+), where fewer
    tables with more bits give higher recall at lower cost; scale n_bits
    up with corpus size to keep bucket occupancy ~O(100)."""
    import random

    rng = random.Random(seed)
    # per-row norms computed BEFORE bucketize/explode (r15 hoist): one
    # extra 8-byte double rides the bucket join instead of two HOF
    # self-dots re-running per candidate pair. norm() is a pure function
    # of the vector, so the candidate distinct() is unchanged.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("__cn", norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("__qn", norm(F.col("qv")))

    # one flat plane list shared by both sides (table t owns planes
    # [t*n_bits, (t+1)*n_bits); same draw order as the historical
    # per-table generation, so buckets stay deterministic per seed)
    planes = [
        [rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_tables * n_bits)
    ]
    buckets = _bucket_udf(planes, n_tables, n_bits)

    def bucketize(df: DataFrame, id_name: str, vec_name: str, norm_name: str) -> DataFrame:
        return df.select(
            id_name,
            vec_name,
            norm_name,
            F.posexplode(buckets(F.col(vec_name))).alias("t", "bucket"),
        )

    c_buckets = bucketize(c, "neighbor_id", "cv", "__cn")
    q_buckets = bucketize(q, "query_id", "qv", "__qn")

    cands = (
        c_buckets.join(q_buckets, on=["t", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "__qn", "neighbor_id", "cv", "__cn")
        .distinct()
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn"))
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def save_ivf_centroids(table, centroids: list[list[float]]) -> None:
    """Persist IVF cell centroids in table properties (same registry
    pattern as :func:`save_pq_codebooks`): n_lists * D doubles."""
    import json as _json

    table.set_properties(**{"ann.ivf.centroids": _json.dumps(centroids)})


def load_ivf_centroids(table) -> list[list[float]] | None:
    import json as _json

    raw = table.properties().get("ann.ivf.centroids")
    return _json.loads(raw) if raw is not None else None


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probes: int = 4,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means partitions the corpus into
    ``n_lists`` cells; each query scores only the ``n_probes`` cells
    whose centroids are nearest.

    The centroid fit is pyspark.ml KMeans (distributed Lloyd's); the
    assignment + probe join are plain DataFrame ops - centroids broadcast
    (tiny), the only wide exchange is the bucket join on cell id. At
    100 TB: cells persist alongside the table (a ``bucket(cell_id)``
    partition spec), so probe queries read n_probes/n_lists of the data -
    the classic IVF scan-fraction tradeoff. Recall is pytest-pinned
    against brute force."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    if centroids is None:
        # fit path: distributed k-means over the corpus
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = c.withColumn("features", array_to_vector("cv"))
        km = KMeans(k=n_lists, seed=seed, maxIter=10)
        model = km.fit(feat)
        assigned = model.transform(feat).select(
            "neighbor_id", "cv", F.col("prediction").alias("cell")
        )
        centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    else:
        # serve path (save_ivf_centroids registry): plan-literal argmin
        # assignment - no ML fit, no model object, pure expressions
        from .clustering import assign_clusters

        assigned = assign_clusters(
            c,
            list(enumerate(centroids)),
            vec_col="cv",
            cluster_col="cell",
        ).select("neighbor_id", "cv", "cell")
    # corpus norm once per row, below the probe join (r15 hoist)
    assigned = assigned.withColumn("__cn", norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("__qn", norm(F.col("qv")))
    # query norm hoisted out of the per-centroid cosine (was one
    # dot(qv,qv) per cell per query); centroid norms are plan literals
    # via _py_norm (same fold order as norm(_lit_vec(ctr)) -> same
    # doubles -> same csim ordering in the probe sort)
    cell_sims = F.array(
        *[
            F.struct(
                F.lit(i).alias("cell"),
                (
                    dot(F.col("qv"), F.array(*[F.lit(x) for x in ctr]))
                    / (F.col("__qn") * F.lit(_py_norm(ctr)))
                ).alias("csim"),
            )
            for i, ctr in enumerate(centroids)
        ]
    )
    probes = (
        q.withColumn(
            "probe",
            F.explode(
                F.slice(
                    F.reverse(F.array_sort(cell_sims, lambda a, b: F.when(a.csim < b.csim, -1).when(a.csim > b.csim, 1).otherwise(0))),
                    1,
                    n_probes,
                )
            ),
        )
        .select("query_id", "qv", "__qn", F.col("probe.cell").alias("cell"))
    )
    cands = probes.join(assigned, on="cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn"))
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _subvec(col: Column, j: int, ds: int) -> Column:
    """1-based slice of subspace ``j`` (length ``ds``)."""
    return F.slice(col, j * ds + 1, ds)


def _l2_sq(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def _lit_vec(v: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def pq_fit(
    corpus: DataFrame,
    m: int = 4,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 3,
    fit_sample: int | None = 4096,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jegou et al. 2011): split the
    D-dim space into ``m`` subspaces of D/m dims and k-means each to
    2^nbits sub-centroids. Driver state is the codebook only -
    m * 2^nbits * (D/m) doubles, i.e. D * 2^nbits scalars regardless of
    corpus size. Deterministic: the subspace fits seed from the lowest
    ids (operators.clustering.kmeans_fit) over a deterministic sample
    (the ``fit_sample`` lowest ids, checkpointed once) - a codebook
    needs thousands of vectors, never the corpus, so at 100 TB the fit
    cost is constant."""
    from .clustering import kmeans_fit

    first = corpus.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pq_fit: empty corpus")
    dim = int(first["d"])
    if dim % m:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    ds = dim // m
    base = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    if fit_sample is not None:
        # The sample is driver-bounded by construction (<= fit_sample
        # vectors ~ a few MB), so ONE collect + numpy Lloyd's on the
        # driver replaces m * n_iters Spark jobs of scheduling overhead
        # (measured: 7.7 s -> ~0.1 s for the 4x16-centroid fit at
        # dim 64). Constant-cost regardless of corpus size; semantics
        # mirror operators.clustering.kmeans_fit exactly - seed from
        # the k lowest-id rows, squared-L2 rounded to 9 dp with ties to
        # the lowest centroid id, element-wise-mean updates, empty
        # clusters keep their previous centroid.
        import numpy as np

        rows = base.orderBy(id_col).limit(fit_sample).collect()
        X = np.asarray([r["v"] for r in rows], dtype=np.float64)
        k = 2**nbits
        books = []
        for j in range(m):
            C = _driver_lloyd(X[:, j * ds : (j + 1) * ds], k, n_iters)
            books.append([[float(x) for x in c] for c in C])
        return books
    books = []
    for j in range(m):
        sub = base.select(id_col, _subvec(F.col("v"), j, ds).alias("sv"))
        _, cents, _ = kmeans_fit(
            sub,
            k=2**nbits,
            n_iters=n_iters,
            vec_col="sv",
            id_col=id_col,
            track_inertia=False,
        )
        books.append([c for _cid, c in cents])
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` sub-centroid indices (array<int>) -
    the D*8-byte vector compresses to m small ints. Pure expressions
    (the codebook is inlined as literals, 64 tiny l2 folds per row at
    m=4/nbits=4): whole-stage codegen, no UDF, no shuffle. Ties break
    to the lowest centroid id (array_position finds the first min)."""
    ds = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    codes = []
    for j, book in enumerate(codebooks):
        dists = F.array(
            *[_l2_sq(_subvec(v, j, ds), _lit_vec(c)) for c in book]
        )
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return corpus.select(
        F.col(id_col), F.array(*codes).alias("pq_codes")
    )


def save_pq_codebooks(table, books: list[list[list[float]]]) -> None:
    """Persist fitted PQ codebooks in the table's properties (the index
    registry at 100 TB: the fit is constant-cost but rerunning it per
    query session is waste; a serving layer loads the codebooks with
    the table metadata). Stored as JSON - m * 2^nbits * (D/m) doubles,
    kilobytes."""
    import json as _json

    table.set_properties(**{"ann.pq.codebooks": _json.dumps(books)})


def load_pq_codebooks(table) -> list[list[list[float]]] | None:
    """The codebooks ``save_pq_codebooks`` stored, or None."""
    import json as _json

    raw = table.properties().get("ann.pq.codebooks")
    return _json.loads(raw) if raw is not None else None


def opq_rotation(
    corpus: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Parametric OPQ rotation (Ge et al. 2013, the eigenvalue-
    allocation variant): a dim x dim orthonormal matrix that
    decorrelates the space (PCA) and then PERMUTES the principal
    directions so each of the ``m`` PQ subspaces receives a balanced
    share of the variance - plain PCA ordering would dump all the
    energy into the first subspace and starve the rest, which is
    worse than no rotation for a contiguous split.

    Allocation is the published greedy: eigen-directions in
    descending-eigenvalue order each go to the unfilled subspace with
    the smallest current log-variance product. Driver cost is the
    PCA fit (one distributed moment pass, O(dim^2) state) plus an
    O(dim log dim) sort; rotation is L2-isometric, so ADC ordering
    math and the exact refine are unchanged."""
    import math as _math

    import numpy as np

    from .projection import pca_fit

    first = corpus.select(F.size(vec_col).alias("d")).where(
        F.col(vec_col).isNotNull()
    ).first()
    if first is None:
        raise ValueError("opq_rotation: empty corpus")
    dim = int(first["d"])
    if dim % m:
        raise ValueError(f"opq_rotation: dim {dim} not divisible by m={m}")
    ds = dim // m
    # fit on the SAME distribution knn_pq quantizes: it L2-normalizes
    # before rotating/encoding, so the variance being balanced must be
    # measured on unit vectors too - a few huge-norm outliers would
    # otherwise dominate the raw covariance and misallocate the
    # eigen-directions (review finding)
    corpus = corpus.select(unit_norm(F.col(vec_col)).alias(vec_col))
    model = pca_fit(corpus, vec_col=vec_col, k=dim)
    W = np.asarray(model.components)  # (dim, dim), rows orthonormal
    eigs = list(model.eigenvalues)
    # greedy product balance in LPT form: balancing per-bucket
    # log-products is multiprocessor scheduling over the POSITIVE
    # magnitudes |log lambda| - biggest magnitude first, each to the
    # open bucket with the smallest accumulated magnitude. (Comparing
    # raw log-products breaks when eigenvalues are < 1: every log is
    # negative, the fullest bucket always looks "smallest", and the
    # allocation silently degenerates to PCA-contiguous - caught by
    # the balance test once the fit moved to unit-normalized vectors,
    # whose eigenvalues are all < 1.)
    buckets: list[list[int]] = [[] for _ in range(m)]
    load = [0.0] * m
    floor = max(1e-12, min((e for e in eigs if e > 0), default=1e-12))
    ref = _math.log(max(max(eigs), floor))
    costs = [
        abs(_math.log(max(e, floor)) - ref) for e in eigs
    ]  # >= 0, scale-invariant
    for i in sorted(range(dim), key=lambda j: -costs[j]):
        open_b = [b for b in range(m) if len(buckets[b]) < ds]
        b = min(open_b, key=lambda x: (load[x], len(buckets[x])))
        buckets[b].append(i)
        load[b] += costs[i]
    order = [i for b in buckets for i in b]
    R = W[order]  # row r of R = the principal direction for output dim r
    return [[float(x) for x in row] for row in R]


def opq_fit(
    corpus: DataFrame,
    m: int = 4,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 5,
    n_lloyd: int = 10,
    fit_sample: int = 4096,
) -> tuple[list[list[float]], list[list[list[float]]], list[float]]:
    """Non-parametric OPQ (Ge et al. 2013, the full alternating
    optimization): jointly train the rotation AND the codebooks by
    iterating (a) codebook refit under the current rotation (Lloyd's
    per subspace) and (b) the orthogonal-Procrustes rotation update -
    with Y = X R^T and reconstruction Y_hat from the current codes,
    ``min_Q ||X Q - Y_hat||_F`` over orthonormal Q has the closed form
    Q = U V^T from the SVD X^T Y_hat = U S V^T, so R = Q^T. Each half-
    step is an exact argmin given the other, so the sample quantization
    error is non-increasing across iterations (pytest-pinned, along
    with beating the parametric eigenvalue-allocation baseline it
    initializes from).

    Scale discipline: training runs on the SAME deterministic sample
    ``pq_fit`` uses (the ``fit_sample`` lowest ids, one collect - a
    codebook needs thousands of vectors, never the corpus), on
    unit-normalized vectors (matching knn_pq's serve normalization);
    the initial rotation is the distributed-PCA parametric one
    (``opq_rotation``). The returned (rotation, codebooks) pair drives
    the existing distributed encode/serve path (``knn_pq(rotation=...,
    codebooks=...)``, ``save_pq_rotation``/``save_pq_codebooks``)
    unchanged. Returns (rotation, codebooks, per-iteration mean squared
    reconstruction errors; errors[0] is the parametric baseline)."""
    import numpy as np

    R0 = opq_rotation(corpus, m=m, id_col=id_col, vec_col=vec_col)
    dim = len(R0)
    ds = dim // m
    k = 2**nbits
    rows = (
        corpus.select(
            F.col(id_col), unit_norm(F.col(vec_col)).alias("v")
        )
        .where(F.col("v").isNotNull() & (F.size("v") == dim))
        .orderBy(id_col)
        .limit(fit_sample)
        .collect()
    )
    if not rows:
        raise ValueError("opq_fit: empty corpus")
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    R = np.asarray(R0, dtype=np.float64)

    def _fit_books(Y: np.ndarray, init=None):
        return [
            _driver_lloyd(
                Y[:, j * ds : (j + 1) * ds],
                k,
                n_lloyd,
                init=init[j] if init is not None else None,
            )
            for j in range(m)
        ]

    def _encode_recon(Y: np.ndarray, books) -> np.ndarray:
        Yh = np.empty_like(Y)
        for j in range(m):
            S = Y[:, j * ds : (j + 1) * ds]
            C = books[j]
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.round(d2, 9).argmin(axis=1)
            Yh[:, j * ds : (j + 1) * ds] = C[assign]
        return Yh

    errors: list[float] = []
    books = None
    for _ in range(max(1, n_iters)):
        Y = X @ R.T
        books = _fit_books(Y, init=books)
        Yh = _encode_recon(Y, books)
        errors.append(float(((Y - Yh) ** 2).sum(axis=1).mean()))
        # Procrustes: min_Q ||X Q - Yh||_F, Q orthonormal
        U, _s, Vt = np.linalg.svd(X.T @ Yh)
        R = (U @ Vt).T
    # final refit under the last rotation so (R, books) are consistent
    Y = X @ R.T
    books = _fit_books(Y, init=books)
    Yh = _encode_recon(Y, books)
    errors.append(float(((Y - Yh) ** 2).sum(axis=1).mean()))
    return (
        [[float(x) for x in row] for row in R],
        [[[float(x) for x in c] for c in B] for B in books],
        errors,
    )


def save_pq_rotation(table, rotation: list[list[float]]) -> None:
    """Persist the OPQ rotation beside the codebooks - codes are only
    decodable under the SAME rotation they were encoded with."""
    import json as _json

    table.set_properties(**{"ann.pq.rotation": _json.dumps(rotation)})


def load_pq_rotation(table) -> list[list[float]] | None:
    import json as _json

    raw = table.properties().get("ann.pq.rotation")
    return _json.loads(raw) if raw is not None else None


def knn_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 4,
    nbits: int = 4,
    refine_factor: int = 8,
    codebooks: list[list[list[float]]] | None = None,
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """PQ ANN via asymmetric distance computation + exact refine: the
    corpus is scanned through its codes only (sum over subspaces of the
    query-to-sub-centroid distance, looked up by code - m lookups per
    pair instead of a D-dim fold, on a ~D*8-to-m-ints compressed
    representation), the top refine_factor*k shortlist then re-scores
    against true vectors. Queries broadcast (small side); the
    full-width read is O(queries * refine_factor * k) rows. Returns
    exact cosine ``sim`` for the reported neighbors (ADC orders the
    shortlist, the refine orders the answer). Recall is pytest-pinned
    against brute force."""
    # L2-normalize both sides so PQ's L2 ordering equals the cosine
    # ordering the exact baseline uses (||a-b||^2 = 2 - 2 cos on the
    # unit sphere); zero vectors stay zero
    vn = unit_norm(F.col(vec_col))
    corpus_n = corpus.select(F.col(id_col), vn.alias(vec_col))
    if rotation is not None:
        # OPQ: rotate AFTER unit-normalization (orthonormal, so norms
        # and all L2/cosine orderings are preserved exactly; only the
        # subspace quantization error changes). Codes are decodable
        # only under the rotation they were encoded with -
        # save_pq_rotation persists it beside the codebooks.
        from .projection import _matmul_udf

        rot = _matmul_udf(rotation)
        corpus_n = corpus_n.select(
            F.col(id_col), rot(F.col(vec_col)).alias(vec_col)
        )
    # prefit codebooks (save_pq_codebooks) skip the fit entirely - the
    # serve path at scale; they must have been fitted on the SAME
    # normalization (knn_pq L2-normalizes before fitting) and rotation
    books = codebooks or pq_fit(
        corpus_n, m=m, nbits=nbits, id_col=id_col, vec_col=vec_col
    )
    m = len(books)
    coded = pq_encode(
        corpus_n, books, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("neighbor_id"), "pq_codes")
    ds = len(books[0][0])
    q = queries.select(
        F.col(id_col).alias("query_id"), vn.alias("qv")
    )
    # ADC's defining property is that the query-to-sub-centroid LUT is
    # computed ONCE per query, then the compressed scan does m table
    # lookups per pair. Queries are the broadcast (small) side, so
    # collect them once and precompute each query's flat LUT on the
    # driver - m * 2^nbits doubles per query, the same plan-literal
    # discipline as k-means centroids. The Python accumulation mirrors
    # _l2_sq's fold order ((x-y)^2 added left to right in IEEE double),
    # so adist is bit-identical to the old per-pair expression form,
    # which recomputed all 2^nbits sub-distances per (corpus, query)
    # pair and threw away all but one per subspace (~2^nbits x the
    # arithmetic of brute force - the opposite of PQ's point).
    nsub = len(books[0])
    q_rows = q.collect()
    if rotation is not None:
        import numpy as _np

        _R = _np.asarray(rotation, dtype=_np.float64)
    lut_rows = []
    for row in q_rows:
        qv = row["qv"]
        if rotation is not None:
            # same rotation as the corpus side; the refine's cosine
            # over two rotated unit vectors equals the unrotated one
            qv = [float(x) for x in (_R @ _np.asarray(qv))]
        flat = []
        for j, book in enumerate(books):
            sub = qv[j * ds : (j + 1) * ds]
            for cent in book:
                acc = 0.0
                for x, y in zip(sub, cent):
                    d = x - y
                    acc += d * d
                flat.append(acc)
        # query norm once per QUERY on the driver (r15 hoist): same
        # left-fold order as the Catalyst dot, so the refine's sim is
        # bit-identical to the old per-pair cosine
        lut_rows.append((row["query_id"], qv, flat, _py_norm(qv)))
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    lut_schema = StructType(
        [
            StructField("query_id", q.schema["query_id"].dataType),
            StructField("qv", ArrayType(DoubleType())),
            StructField("lut", ArrayType(DoubleType())),
            StructField("qn", DoubleType()),
        ]
    )
    lut_df = corpus.sparkSession.createDataFrame(lut_rows, lut_schema)
    pairs = coded.join(
        F.broadcast(lut_df), F.col("neighbor_id") != F.col("query_id")
    )
    adist = None
    for j in range(m):
        term = F.element_at(
            F.col("lut"), F.lit(j * nsub) + F.col("pq_codes")[j] + 1
        )
        adist = term if adist is None else adist + term
    scored = pairs.select("query_id", "neighbor_id", adist.alias("adist"))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    # ADC shortlist + exact refine (the standard PQ serving shape): the
    # compressed scan keeps refine_factor*k candidates per query, then
    # ONLY those re-score against their true vectors - the full-width
    # read is O(queries * refine_factor * k) rows, never the corpus.
    shortlist = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= refine_factor * k
    )
    # corpus norm once per refine row, below the join (r15 hoist)
    true_vecs = corpus_n.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("__cn", norm(F.col("cv")))
    refined = (
        shortlist.select("query_id", "neighbor_id")
        .join(true_vecs, on="neighbor_id")
        .join(F.broadcast(lut_df.select("query_id", "qv", "qn")), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("__cn"))
            ).alias("sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return refined.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )
