"""IVF (inverted-file) approximate nearest neighbor over embedding columns.

The scale path complementary to random-hyperplane LSH
(:mod:`pandera_spark.operators.similarity`): partition the corpus into
``n_centroids`` Voronoi cells, then answer a query by scanning only its
``nprobe`` closest cells.

Spark shape, designed for a 100 TB corpus:

- **fit** — k-means on a bounded driver-side sample (numpy, deterministic
  seed).  Centroid count is small (sqrt(N) rule of thumb), so the model is
  kilobytes; it ships to executors as a closure constant, no broadcast
  bookkeeping.
- **assign** — one Arrow-batched pandas UDF per corpus row: a single
  ``(batch, dim) @ (dim, n_centroids)`` numpy matmul per Arrow batch.  This
  is the documented vectorized escape hatch (SURVEY.md §2.G) — a per-row
  expression over `n_centroids` dot products would be interpreted and
  ~100x slower.
- **search** — queries assign to their ``nprobe`` nearest cells, then an
  equi-join on ``cell`` (broadcast on the query side) scans only matching
  cells; exact cosine + per-query window top-k on the candidates.  The
  shuffle key is the small cell id; corpus vectors never cross the network
  when the corpus side is pre-partitioned (``repartition("cell")`` +
  persisted/bucketed table).
"""

from __future__ import annotations

import random
from typing import Iterable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window


def _as_matrix(rows: Iterable[list[float]]) -> np.ndarray:
    m = np.asarray(list(rows), dtype=np.float64)
    if m.ndim != 2:
        raise ValueError("embedding sample is not rectangular")
    return m


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def ivf_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    n_centroids: int = 16,
    sample_size: int = 10_000,
    n_iter: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Fit spherical k-means centroids on a bounded sample.

    The sample is capped at ``sample_size`` rows regardless of corpus size
    (``df.sample`` + ``limit`` — never a full collect), so driver memory is
    O(sample * dim).  Returns unit-norm centroids ``(n_centroids, dim)``.
    Deterministic for a given seed.
    """
    n = df.count()
    if n == 0:
        raise ValueError("cannot fit IVF on an empty corpus")
    fraction = min(1.0, (sample_size * 2) / max(n, 1))
    sample_rows = (
        df.select(F.col(vec_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .sample(fraction=fraction, seed=seed)
        .limit(sample_size)
        .collect()
    )
    x = _normalize(_as_matrix(r.v for r in sample_rows))
    k = min(n_centroids, len(x))
    rng = np.random.RandomState(seed)
    centroids = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(n_iter):
        # cosine assignment == dot product on unit vectors
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_fit_distributed(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    n_iter: int = 10,
    tol: float = 1e-4,
) -> np.ndarray:
    """Full-corpus spherical k-means via the distributed Lloyd loop
    (:func:`..kmeans.fit_kmeans`) — the upgrade over :func:`ivf_fit`'s
    bounded driver sample when the corpus is too skewed for a 10k-row
    sample to place centroids well.  Rows are L2-normalized in-plan
    (pure Column expression) so Euclidean Lloyd == spherical k-means;
    per iteration the corpus contributes k × d × partitions wire rows
    and nothing reaches the driver but the k×d matrix.  Deterministic
    (min-hash seeding, no RNG).  Returns unit-norm centroids."""
    from .kmeans import fit_kmeans
    from .similarity import l2_norm

    normed = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        l2_norm(F.col(vec_col).cast("array<double>")).alias("__n"),
    )
    unit = normed.where(F.col("__n") > 0).select(
        F.col(id_col),
        F.transform(
            F.col("__v"), lambda x: x / F.col("__n")
        ).alias("__unit"),
    )
    fit = fit_kmeans(
        unit, vec_col="__unit", id_col=id_col,
        k=n_centroids, max_iter=n_iter, tol=tol,
    )
    return _normalize(np.asarray(fit.centroids, dtype=float))


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    *,
    out_col: str = "cell",
    nprobe: int = 1,
) -> DataFrame:
    """Attach the ``nprobe`` nearest centroid ids to every row.

    ``nprobe=1`` adds an int ``cell`` column (corpus indexing);
    ``nprobe>1`` adds an array and explodes it (query-side probing).
    One numpy matmul per Arrow batch — no per-row Python.
    """
    c = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def nearest_cells(vecs: pd.Series) -> pd.Series:
        m = _normalize(_as_matrix(vecs.tolist()))
        sims = m @ c.T  # (batch, n_centroids)
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series(list(top.astype("int32")))

    cells = nearest_cells(F.col(vec_col))
    if nprobe == 1:
        return df.withColumn(out_col, cells.getItem(0))
    return df.withColumn(out_col, F.explode(cells))


def ivf_write_index(
    corpus: DataFrame,
    centroids: np.ndarray,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "error",
) -> None:
    """Materialize the IVF index: corpus partitioned on disk by cell, plus
    a centroid sidecar table.

    Layout: ``{path}/data/cell=<i>/*.parquet`` and
    ``{path}/centroids/*.parquet``.  Because ``cell`` is a PARTITION
    column, a probe query's ``cell IN (...)`` filter prunes at the file
    index — unprobed cells are never opened (the ANN analogue of
    partition pruning; see PLANS.md §5).
    """
    assigned = ivf_assign(
        corpus.select(F.col(id_col), F.col(vec_col)), vec_col, centroids
    )
    (
        assigned.repartition("cell")
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(f"{path}/data")
    )
    spark = corpus.sparkSession
    cent_rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(centroids)
    ]
    spark.createDataFrame(
        cent_rows, "cell int, centroid array<double>"
    ).coalesce(1).write.mode(mode).parquet(f"{path}/centroids")


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    *,
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k against a materialized IVF index — scans ONLY probed cells.

    The probed cell set is collected driver-side from the (small) query
    frame, then applied as a partition filter on the index scan; Spark's
    file index prunes every other cell's files before any task launches.
    """
    from .similarity import cosine
    from pyspark.sql import Window

    cent = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    centroids = np.asarray([r.centroid for r in cent], dtype=np.float64)

    q_assigned = ivf_assign(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qvec"),
        ),
        "__qvec",
        centroids,
        nprobe=min(nprobe, len(centroids)),
    )
    probed = [r.cell for r in q_assigned.select("cell").distinct().collect()]

    corpus = (
        spark.read.parquet(f"{path}/data")
        .filter(F.col("cell").isin(probed))  # partition pruning
        .select(
            F.col("cell"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__cvec"),
        )
    )
    scored = (
        F.broadcast(q_assigned)
        .join(corpus, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qvec"), F.col("__cvec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    centroids: Optional[np.ndarray] = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF cell probing.

    Returns (query_id, neighbor_id, cosine_sim, rank).  Cost vs brute
    force: each query scans ~``nprobe/n_centroids`` of the corpus; recall
    rises with ``nprobe`` (== n_centroids gives exact brute-force
    coverage).  The corpus is repartitioned by cell so one shuffle builds
    the index; a persisted/bucketed corpus amortizes it across queries.
    """
    from .similarity import cosine
    from .dedup import _ensure_parallelism

    if centroids is None:
        centroids = ivf_fit(
            corpus, vec_col, n_centroids=n_centroids, seed=seed
        )

    c_assigned = ivf_assign(
        _ensure_parallelism(corpus).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cvec"),
        ),
        "__cvec",
        centroids,
        nprobe=1,
    ).repartition("cell")

    q_assigned = F.broadcast(
        ivf_assign(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.col(query_vec_col).alias("__qvec"),
            ),
            "__qvec",
            centroids,
            nprobe=min(nprobe, len(centroids)),
        )
    )

    scored = (
        q_assigned.join(c_assigned, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qvec"), F.col("__cvec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
