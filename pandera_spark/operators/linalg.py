"""Embedding-column linear algebra: per-dimension moments, PCA fit,
whitening / low-rank projection.

The standard conditioning pass before similarity search: embedding
corpora drift (per-dim scale differences, correlated dimensions), which
degrades cosine ANN recall; PCA-whitening fixes both.  The reference has
no counterpart (its pyspark backend validates scalars only) — this is
part of the beyond-parity training-data tier, same family as
operators/similarity.py.

Design for 100 TB:
- *fit* is two JVM passes over a column-pruned scan: per-dim mean/std
  via ``ml.stat.Summarizer`` and the d×d Pearson matrix via
  ``ml.stat.Correlation`` (RowMatrix treeAggregate with BLAS —
  map-side mergeable, never a per-pair codegen explosion).  Only the
  d×d matrix (64×64 here) ever reaches the driver; the
  eigendecomposition of a d×d matrix is trivial there.
- *transform* broadcasts the (k×d) projection and applies it as ONE
  Arrow-batched BLAS matmul per batch (default; ~21× the interpreted
  HOF alternative, kept as ``method="expr"`` for Python-worker-free
  clusters) — no shuffle, no state.  The whitened output feeds
  :mod:`.similarity` / :mod:`.ann_ivf` directly.
- the report helpers (:func:`dim_stats`, :func:`dim_corr`) use plain
  mergeable SQL aggregates so they are exactly replayable by an ANSI
  oracle; use them on the dimension SUBSETS a report needs, not all
  d² pairs (that's what the BLAS path above is for).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dim_stats",
    "dim_corr",
    "fit_pca",
    "pca_transform",
    "whiten",
    "group_centroids",
    "centroid_separation",
    "pool_embeddings",
    "fit_ols",
    "apply_ols",
]


def dim_stats(df: DataFrame, col: str, dims: Sequence[int]) -> DataFrame:
    """Per-dimension mean / sample-std / null-free count for the listed
    dimensions of an ``array`` column, in ONE aggregation job —
    long-format ``(dim, mean, std)``."""
    dims = list(dims)
    aggs = []
    for i in dims:
        x = F.col(col).getItem(i).cast("double")
        aggs.append(F.avg(x).alias(f"__m_{i}"))
        aggs.append(F.stddev_samp(x).alias(f"__s_{i}"))
    agg = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("dim"),
                F.col(f"__m_{i}").alias("mean"),
                F.col(f"__s_{i}").alias("std"),
            )
            for i in dims
        ]
    )
    return agg.select(F.explode(rows).alias("s")).select(
        "s.dim", "s.mean", "s.std"
    )


def dim_corr(
    df: DataFrame, col: str, pairs: Sequence[tuple[int, int]]
) -> DataFrame:
    """Pearson correlation of the listed dimension pairs in ONE
    aggregation job, long-format ``(dim_a, dim_b, corr)``.  Uses the
    ANSI-safe ``try_divide(covar_samp, std*std)`` form (null on a
    zero-variance dimension) like :func:`..numeric.correlation_matrix`.
    """
    pairs = list(pairs)

    def pearson(i: int, j: int):
        x = F.col(col).getItem(i).cast("double")
        y = F.col(col).getItem(j).cast("double")
        return F.try_divide(
            F.covar_samp(x, y), F.stddev_samp(x) * F.stddev_samp(y)
        )

    agg = df.agg(
        *[pearson(i, j).alias(f"__c_{k}") for k, (i, j) in enumerate(pairs)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("dim_a"),
                F.lit(j).alias("dim_b"),
                F.col(f"__c_{k}").alias("corr"),
            )
            for k, (i, j) in enumerate(pairs)
        ]
    )
    return agg.select(F.explode(rows).alias("s")).select(
        "s.dim_a", "s.dim_b", "s.corr"
    )


def fit_pca(df: DataFrame, col: str, dim: int):
    """Fit PCA on an ``array`` embedding column: returns
    ``(mean, eigvals, eigvecs)`` as numpy arrays (means: d; eigvals: d,
    DESCENDING; eigvecs: d×d, column k = k-th component).

    Two distributed passes (Summarizer moments + Correlation matrix via
    RowMatrix BLAS treeAggregate); covariance is reassembled driver-side
    as ``corr * outer(std, std)`` and eigendecomposed there (d×d only).
    Rows with a null embedding are ignored.
    """
    import numpy as np
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Correlation, Summarizer

    vecs = (
        df.select(F.col(col).alias("__e"))
        .where(F.col("__e").isNotNull())
        .select(array_to_vector(F.col("__e").cast("array<double>"))
                .alias("__v"))
    )
    summ = vecs.select(
        Summarizer.metrics("mean", "std", "count").summary(F.col("__v"))
        .alias("__s")
    ).first()["__s"]
    mean = np.asarray(summ["mean"].toArray(), dtype=float)
    std = np.asarray(summ["std"].toArray(), dtype=float)
    if len(mean) != dim:  # fail fast before the matrix pass
        raise ValueError(f"embedding dim {len(mean)} != declared {dim}")
    if summ["count"] < 2:
        raise ValueError("need at least 2 rows to fit PCA")
    corr = np.asarray(
        Correlation.corr(vecs, "__v", "pearson").first()[0].toArray(),
        dtype=float,
    )
    # zero-variance dims: Pearson is NaN there; their covariance is 0
    corr = np.nan_to_num(corr, nan=0.0)
    np.fill_diagonal(corr, 1.0)
    cov = corr * np.outer(std, std)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1]
    eigvals = np.clip(eigvals[order], 0.0, None)
    eigvecs = eigvecs[:, order]
    return mean, eigvals, eigvecs


def _project(
    df: DataFrame,
    col: str,
    out_col: str,
    mean,
    rows,  # (k, d) projection matrix as a numpy array
    method: str = "arrow",
) -> DataFrame:
    """``out = P @ (x - mean)``.

    ``method="arrow"`` (default): one Arrow-batched pandas UDF doing a
    BLAS matmul per batch — measured ~19x faster than the expression
    path at d=64 (BASELINE §3.17: 0.17 s vs 3.2 s per 50k-row pass),
    because the O(d²)-per-row dot products are interpreted
    (non-codegen) as HOF lambdas but a single ``(X-μ)Pᵀ`` in numpy.
    ``method="expr"``: pure Column projection (zip_with dot per output
    component, the ``P_k·mean`` constant folded into an offset) for
    environments where Python workers are unavailable.
    """
    if method == "expr":
        comps = []
        for k in range(rows.shape[0]):
            wk = rows[k]
            offset = float(wk @ mean)
            wk_lit = F.array(*[F.lit(float(w)) for w in wk])
            dot = F.aggregate(
                F.zip_with(
                    F.col(col).cast("array<double>"), wk_lit,
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            comps.append(dot - F.lit(offset))
        return df.withColumn(
            out_col,
            F.when(F.col(col).isNotNull(), F.array(*comps)),
        )
    if method != "arrow":
        raise ValueError(f"method must be 'arrow' or 'expr', got {method!r}")

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bc = df.sparkSession.sparkContext.broadcast(
        (np.asarray(rows, float), np.asarray(mean, float))
    )

    def _proj_fn(s):
        p, mu = bc.value
        m = s.notna().to_numpy()
        out = np.empty(len(s), dtype=object)
        out[:] = None
        if m.any():
            x = np.vstack(s.to_numpy()[m])
            y = (x - mu) @ p.T
            rows_obj = np.empty(y.shape[0], dtype=object)
            rows_obj[:] = list(y)
            out[m] = rows_obj
        return pd.Series(out)

    # real annotation objects: `from __future__ import annotations` would
    # stringify inline hints, which pandas_udf's inference rejects
    _proj_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _proj = pandas_udf(_proj_fn, "array<double>")

    return df.withColumn(
        out_col, _proj(F.col(col).cast("array<double>"))
    )


def pca_transform(
    df: DataFrame,
    col: str,
    mean,
    eigvecs,
    *,
    k: Optional[int] = None,
    out_col: str = "pca",
    method: str = "arrow",
) -> DataFrame:
    """Project onto the top-``k`` principal components (all when k is
    None): ``out = V_kᵀ (x - mean)``.  Null embeddings yield null."""
    import numpy as np

    v = np.asarray(eigvecs, dtype=float)
    kk = v.shape[1] if k is None else int(k)
    return _project(
        df, col, out_col, np.asarray(mean, float), v[:, :kk].T, method
    )


def whiten(
    df: DataFrame,
    col: str,
    mean,
    eigvals,
    eigvecs,
    *,
    k: Optional[int] = None,
    eps: float = 1e-9,
    out_col: str = "white",
    method: str = "arrow",
) -> DataFrame:
    """PCA-whitening: ``out = diag(1/sqrt(λ+eps)) V_kᵀ (x - mean)`` —
    unit variance, zero pairwise correlation (verified by the
    whiten-property tests).  Null embeddings yield null."""
    import numpy as np

    v = np.asarray(eigvecs, dtype=float)
    lam = np.asarray(eigvals, dtype=float)
    kk = v.shape[1] if k is None else int(k)
    scale = 1.0 / np.sqrt(lam[:kk] + eps)
    rows = scale[:, None] * v[:, :kk].T
    return _project(
        df, col, out_col, np.asarray(mean, float), rows, method
    )


def group_centroids(
    df: DataFrame,
    col: str,
    by: str,
    *,
    dims: Optional[Sequence[int]] = None,
) -> DataFrame:
    """Per-group element-wise centroid of an array column, long-format
    ``(group, dim, n, mean)`` — the class-conditional mean screen for
    labeled embedding corpora (drifting/collapsed classes show up here
    before they hurt a classifier).

    Plan shape for 100 TB: ``posexplode`` is map-side; the partial
    aggregate collapses each partition to (groups × d) rows BEFORE the
    one shuffle, so wire volume is bounded by cardinality, never the
    corpus.  ``dims`` restricts output (the explode is pruned by a
    pushed ``pos`` filter); None emits all dimensions.
    """
    e = df.select(
        F.col(by).alias("grp"),
        F.posexplode(F.col(col).cast("array<double>")).alias("pos", "x"),
    )
    if dims is not None:
        e = e.where(F.col("pos").isin([int(i) for i in dims]))
    return (
        e.groupBy("grp", "pos")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("x").alias("mean"))
        .select(
            F.col("grp").alias(by),
            F.col("pos").alias("dim"),
            "n",
            "mean",
        )
    )


def centroid_separation(df: DataFrame, col: str, by: str) -> DataFrame:
    """Between-class separability screen: pairwise cosine similarity and
    Euclidean distance of the per-group centroids, long-format
    ``(group_a, group_b, cosine, distance)`` with ``group_a <
    group_b``.  Near-1 cosine between two labels' centroids means the
    classes are not separable in this embedding space.

    The centroid frame is (groups × d) rows — aggregated as in
    :func:`group_centroids`, then assembled to one array per group
    (sorted by dim) and self-joined on ``group_a < group_b``; with G
    groups that is a G²-row join of d-length arrays, trivially
    broadcastable for any real label set.
    """
    cent = (
        group_centroids(df, col, by)
        .groupBy(by)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("dim", "mean"))
                ),
                lambda s: s.getField("mean"),
            ).alias("__c")
        )
    )
    a = cent.select(
        F.col(by).alias("group_a"), F.col("__c").alias("__ca")
    )
    b = cent.select(
        F.col(by).alias("group_b"), F.col("__c").alias("__cb")
    )
    pairs = a.join(
        F.broadcast(b), F.col("group_a") < F.col("group_b")
    )
    dot = F.aggregate(
        F.zip_with("__ca", "__cb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, t: acc + t * t)
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("__ca", "__cb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    )
    return pairs.select(
        "group_a",
        "group_b",
        F.try_divide(dot, norm(F.col("__ca")) * norm(F.col("__cb")))
        .alias("cosine"),
        dist.alias("distance"),
    )


def pool_embeddings(
    df: DataFrame,
    col: str,
    by: str,
    *,
    mode: str = "mean",
    out_col: str = "pooled",
) -> DataFrame:
    """Pool many vectors per key into one — chunk embeddings → document
    embedding (the RAG / doc-level-ANN bridge after
    :mod:`.chunking` + embedding), or member vectors → cluster
    prototype.  ``mode``: "mean" | "max" | "sum".

    Same 100 TB shape as :func:`group_centroids`: map-side
    ``posexplode`` + partial agg collapse to (keys × d) rows before the
    single shuffle, then per-key reassembly (``array_sort`` on the
    TINY d-length struct list, not a corpus sort).  Null vectors are
    ignored; keys with only nulls drop out.
    """
    aggs = {"mean": F.avg, "max": F.max, "sum": F.sum}
    if mode not in aggs:
        raise ValueError(f"mode must be one of {sorted(aggs)}, got {mode!r}")
    e = df.select(
        F.col(by).alias("__k"),
        F.posexplode(F.col(col).cast("array<double>")).alias("pos", "x"),
    )
    per_dim = e.groupBy("__k", "pos").agg(aggs[mode]("x").alias("v"))
    return (
        per_dim.groupBy("__k")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda s: s.getField("v"),
            ).alias(out_col)
        )
        .select(F.col("__k").alias(by), out_col)
    )


def _ols_design_moments(
    df: DataFrame,
    y: str,
    xs: "Sequence[str]",
    intercept: bool,
):
    """ONE distributed aggregation of the normal-equation moments
    (n, Σxᵢ, Σxᵢxⱼ for i≤j, Σxᵢy, Σy, Σy²); returns
    ``(xtx, xty, n, syy, sy)`` with the intercept column folded in as
    the LAST design dimension when requested.  The shuffle carries one
    O(d²) moment row per task, never data; rows with a null in ``y``
    or any ``xs`` drop.  Shared by :func:`fit_ols` and
    :func:`pandera_spark.operators.regression.ols_inference`."""
    import numpy as np

    xs = list(xs)
    if not xs:
        raise ValueError("need at least one feature column")
    d = len(xs)
    yc = F.col(y).cast("double")
    xc = [F.col(c).cast("double") for c in xs]
    cond = yc.isNotNull()
    for c in xc:
        cond = cond & c.isNotNull()
    aggs = [
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(yc).alias("sy"),
        F.sum(yc * yc).alias("syy"),
    ]
    for i in range(d):
        aggs.append(F.sum(xc[i]).alias(f"sx_{i}"))
        aggs.append(F.sum(xc[i] * yc).alias(f"sxy_{i}"))
        for j in range(i, d):
            aggs.append(F.sum(xc[i] * xc[j]).alias(f"sxx_{i}_{j}"))
    row = df.where(cond).agg(*aggs).first()
    n = row["n"]
    if n < d + (1 if intercept else 0):
        raise ValueError(f"need more rows ({int(n)}) than parameters")
    p = d + (1 if intercept else 0)
    xtx = np.zeros((p, p))
    xty = np.zeros(p)
    for i in range(d):
        xty[i] = row[f"sxy_{i}"]
        for j in range(i, d):
            xtx[i, j] = xtx[j, i] = row[f"sxx_{i}_{j}"]
    if intercept:
        xtx[d, d] = n
        for i in range(d):
            xtx[i, d] = xtx[d, i] = row[f"sx_{i}"]
        xty[d] = row["sy"]
    return xtx, xty, n, row["syy"], row["sy"]


def fit_ols(
    df: DataFrame,
    y: str,
    xs: "Sequence[str]",
    *,
    intercept: bool = True,
):
    """Multivariate least squares of ``y`` on named numeric columns.

    Returns ``(coef, intercept, stats)`` — ``coef`` a numpy array
    aligned with ``xs``, ``stats`` a dict with ``n, r2, rmse``.

    ONE distributed aggregation collects the normal-equation moments
    (n, Σxᵢ, Σxᵢxⱼ for i≤j, Σxᵢy, Σy, Σy²) — the shuffle carries one
    O(d²) moment row per task, never data — and the (d+1)×(d+1) solve
    happens driver-side with ``lstsq`` (rank-deficient designs get the
    minimum-norm solution instead of a crash).  Rows with a null in
    ``y`` or any ``xs`` drop.  For d beyond a few hundred columns the
    d² expression count stops being the right plan — use the array-
    column BLAS path (:func:`fit_pca`-style RowMatrix) instead.
    """
    import numpy as np

    xtx, xty, n, syy, sy = _ols_design_moments(df, y, xs, intercept)
    d = len(list(xs))
    beta, *_ = np.linalg.lstsq(xtx, xty, rcond=None)
    coef = beta[:d]
    b0 = float(beta[d]) if intercept else 0.0
    ss_res = max(
        0.0,
        syy - 2.0 * float(beta @ xty) + float(beta @ xtx @ beta),
    )
    ybar = sy / n
    ss_tot = max(0.0, syy - n * ybar * ybar)
    stats = {
        "n": int(n),
        "r2": (1.0 - ss_res / ss_tot) if ss_tot > 0 else None,
        "rmse": float(np.sqrt(ss_res / n)),
    }
    return coef, b0, stats


def apply_ols(
    df: DataFrame,
    xs: "Sequence[str]",
    coef,
    intercept: float = 0.0,
    *,
    out_col: str = "prediction",
) -> DataFrame:
    """Score a fitted linear model: pure Column projection (zero
    shuffle, zero UDF) — ``pred = Σ coefᵢ·xᵢ + intercept``."""
    xs = list(xs)
    if len(xs) != len(coef):
        raise ValueError(f"{len(xs)} columns vs {len(coef)} coefficients")
    expr = F.lit(float(intercept))
    for c, b in zip(xs, coef):
        expr = expr + F.col(c).cast("double") * F.lit(float(b))
    return df.withColumn(out_col, expr)
