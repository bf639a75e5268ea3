"""K-means clustering over embedding columns + cluster-based curation.

Why k-means belongs in a curation engine: cluster-then-work-within is the
published scale recipe for semantic dedup and diversity-balanced sampling
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023; Sorscher et al., "Beyond neural scaling
laws", NeurIPS'22).  Cluster once, then do the O(n²) pairwise work WITHIN
clusters only — O(n²/k) total — and sample per-cluster to control the
diversity mix of a training corpus.

Scale design (100 TB):

- Centroids are k×d — always driver/broadcast-sized.  Assignment never
  shuffles the data: one Arrow-batched pandas UDF doing a single BLAS
  ``‖x‖² − 2XCᵀ + ‖c‖²`` argmin per batch (same measured ~20× win over
  interpreted HOF lambdas as :mod:`.linalg`'s projection, BASELINE §3.17).
- The Lloyd update reuses :func:`..linalg.group_centroids`'s
  posexplode-collapse: the map-side partial agg bounds wire volume at
  k × d × partitions rows per iteration — never the corpus.
- The iteration loop runs on a persisted ``(id, vec)`` projection, so the
  source is scanned once, not once per Lloyd round.
- :func:`semdedup` gram matrices are row-blocked and a cluster-size cap
  fails fast instead of OOMing an executor; size k so clusters land well
  under the cap (the SemDeDup paper uses n/k ≈ 10⁴).
- :func:`cluster_sample` keeps exactly m per cluster via a rank window
  that Spark 3.5+ executes as WindowGroupLimit (per-partition top-m
  push-down, no full per-cluster sort materialization).

Determinism/oracle story: seeding is min-id or min-portable-hash (no RNG),
assignment tie-breaks on the lowest cluster id, and the dedup drop rule is
a pure predicate — every step is replayable by an external ANSI SQL engine
(the ``kmeans`` / ``semdedup`` / ``clustersample`` contract rows in
``__spark_entry__.py`` replay seed → assign → update in DuckDB).

Reference parity: none — the reference has no clustering surface; this
tier is part of the beyond-reference LLM-curation set (SURVEY §6).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .dedup import portable_hash28
from .linalg import group_centroids

__all__ = [
    "seed_centroids",
    "assign_clusters",
    "fit_kmeans",
    "KMeansFit",
    "semdedup",
    "cluster_sample",
    "cluster_quality",
    "davies_bouldin",
]


def seed_centroids(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int,
    method: str = "min_hash",
    salt: str = "",
):
    """Deterministic k seed vectors as a ``(k, d)`` float64 numpy array,
    ordered by the seeding key (cluster i = i-th seed).

    ``method="min_hash"`` (default): the k rows whose
    ``portable_hash28(id || salt)`` is smallest — a uniform deterministic
    sample, robust to sorted/clustered id layouts, replayable by any SQL
    engine (ORDER BY the md5-prefix hash).  ``method="min_id"``: the k
    smallest ids — simplest possible oracle, fine when ids are not
    correlated with content.  Both are a TakeOrdered (k rows to the
    driver, never a full sort).
    """
    if method not in ("min_hash", "min_id"):
        raise ValueError(
            f"method must be 'min_hash' or 'min_id', got {method!r}"
        )
    import numpy as np

    key: C = F.col(id_col)
    if method == "min_hash":
        key = portable_hash28(
            F.concat(F.col(id_col).cast("string"), F.lit(salt))
        )
    rows = (
        df.where(F.col(vec_col).isNotNull())
        .select(
            key.alias("__k"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .orderBy("__k", "__id")
        .limit(int(k))
        .collect()
    )
    if len(rows) < k:
        raise ValueError(
            f"need at least k={k} non-null vectors, found {len(rows)}"
        )
    return np.asarray([r["__v"] for r in rows], dtype=float)


def assign_clusters(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    centroids,
    out_col: str = "cluster_id",
    dist_col: Optional[str] = None,
) -> DataFrame:
    """Append the nearest-centroid id (and optionally the Euclidean
    distance) to every row.  Pure Arrow map — no shuffle, no join: each
    batch computes ``‖x‖² − 2XCᵀ + ‖c‖²`` with one BLAS matmul and takes
    the argmin (ties → lowest cluster id, numpy argmin's convention —
    the same tie-break the SQL oracle encodes).  Null vectors get a null
    cluster id.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(centroids, dtype=float)
    if cmat.ndim != 2:
        raise ValueError("centroids must be a (k, d) matrix")
    bc = df.sparkSession.sparkContext.broadcast(cmat)

    def _assign_fn(s):
        cm = bc.value
        c_sq = (cm * cm).sum(axis=1)
        m = s.notna().to_numpy()
        cid = np.empty(len(s), dtype=object)
        cid[:] = None
        dist = np.empty(len(s), dtype=object)
        dist[:] = None
        if m.any():
            x = np.vstack(s.to_numpy()[m])
            # ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²; ‖x‖² constant per row → omit
            # from the argmin, add back only for the reported distance
            cross = x @ cm.T
            d2 = c_sq[None, :] - 2.0 * cross
            best = np.argmin(d2, axis=1)
            # the expanded form is fine for the ARGMIN but loses exact
            # cancellation (BLAS summation order) when x ≈ c — report
            # the distance from the stable direct form against the one
            # winning centroid (O(n·d), noise next to the matmul)
            diff = x - cm[best]
            bd = np.sqrt((diff * diff).sum(axis=1))
            cid[m] = [int(b) for b in best]
            dist[m] = [float(v) for v in bd]
        return pd.DataFrame({"cluster_id": cid, "dist": dist})

    _assign_fn.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    _assign = pandas_udf(_assign_fn, "cluster_id int, dist double")

    res = df.withColumn(
        "__asg", _assign(F.col(vec_col).cast("array<double>"))
    )
    out = res.withColumn(out_col, F.col("__asg.cluster_id"))
    if dist_col is not None:
        out = out.withColumn(dist_col, F.col("__asg.dist"))
    return out.drop("__asg")


@dataclass
class KMeansFit:
    """Result of :func:`fit_kmeans`: final ``(k, d)`` centroids, the
    per-iteration max centroid shift, and final cluster sizes (empty
    clusters keep their previous centroid and report size 0)."""

    centroids: object
    n_iter: int
    shifts: list = field(default_factory=list)
    sizes: list = field(default_factory=list)


def fit_kmeans(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: Optional[int] = None,
    init=None,
    max_iter: int = 10,
    tol: float = 1e-4,
    seed_method: str = "min_hash",
    salt: str = "",
    persist: bool = True,
) -> KMeansFit:
    """Lloyd's algorithm.  Per iteration: one Arrow assignment map (no
    shuffle) + one cardinality-bounded centroid aggregation
    (:func:`..linalg.group_centroids` — wire = k × d × partitions after
    the map-side partial agg) + a k×d collect.  The input projection is
    persisted so the source parquet is scanned once, not per iteration.

    Stops when the max centroid L2 shift drops below ``tol`` or after
    ``max_iter`` rounds.  Empty clusters keep their previous centroid.
    Fully deterministic: seeding via :func:`seed_centroids`, no RNG.
    """
    import numpy as np

    if init is None:
        if k is None:
            raise ValueError("pass k= or init=")
        cent = seed_centroids(
            df, vec_col=vec_col, id_col=id_col, k=k,
            method=seed_method, salt=salt,
        )
    else:
        cent = np.asarray(init, dtype=float)
        if k is not None and cent.shape[0] != k:
            raise ValueError(
                f"init has {cent.shape[0]} rows but k={k}"
            )
    kk, d = cent.shape

    vecs = (
        df.select(F.col(vec_col).cast("array<double>").alias("__v"))
        .where(F.col("__v").isNotNull())
    )
    if persist:
        vecs = vecs.persist()
    fit = KMeansFit(centroids=cent, n_iter=0)
    try:
        for _ in range(int(max_iter)):
            assigned = assign_clusters(
                vecs, vec_col="__v", centroids=cent
            )
            pdf = (
                group_centroids(assigned, "__v", "cluster_id")
                .toPandas()
            )
            new = cent.copy()
            sizes = [0] * kk
            for cid, g in pdf.groupby("cluster_id"):
                g = g.sort_values("dim")
                new[int(cid)] = g["mean"].to_numpy(dtype=float)
                sizes[int(cid)] = int(g["n"].iloc[0])
            shift = float(
                np.sqrt(((new - cent) ** 2).sum(axis=1)).max()
            )
            cent = new
            fit.n_iter += 1
            fit.shifts.append(shift)
            fit.sizes = sizes
            if shift < tol:
                break
        fit.centroids = cent
        return fit
    finally:
        if persist:
            vecs.unpersist()


def semdedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids,
    threshold: float,
    cluster_col: str = "cluster_id",
    out_col: str = "is_dup",
    max_cluster_rows: int = 50_000,
    block: int = 2048,
) -> DataFrame:
    """SemDeDup-style within-cluster semantic dedup: assign every row to
    its nearest centroid, then inside each cluster mark row *i* a
    duplicate iff some row *j* in the same cluster has
    ``cosine(i, j) ≥ threshold`` and ``id_j < id_i`` — the deterministic
    keep-the-smallest-id rule (pure predicate, SQL-replayable; dropped
    rows still suppress later ones, matching the EXISTS semantics).

    O(n²/k) instead of O(n²): the gram matrix is computed per cluster
    (one ``applyInPandas`` group per cluster — the ONLY shuffle, keyed
    on cluster id), row-blocked at ``block`` rows so peak memory is
    ``block × cluster_size`` doubles, and clusters larger than
    ``max_cluster_rows`` raise instead of OOMing — size k so clusters
    land well under the cap.  Null vectors pass through with
    ``is_dup = false`` and a null cluster id.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import StructType

    assigned = assign_clusters(
        df, vec_col=vec_col, centroids=centroids, out_col=cluster_col
    )
    # copy before .add(): StructType.add mutates in place, and the frame
    # holds a reference to this object
    schema = StructType(list(assigned.schema.fields)).add(
        out_col, "boolean"
    )
    tau = float(threshold)
    cap = int(max_cluster_rows)
    blk = int(block)

    def _dedup_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        vec_ok = pdf[vec_col].notna().to_numpy()
        dup = np.zeros(len(pdf), dtype=bool)
        if vec_ok.any() and pdf[cluster_col].notna().any():
            n = int(vec_ok.sum())
            if n > cap:
                raise ValueError(
                    f"cluster of {n} rows exceeds max_cluster_rows="
                    f"{cap}; increase k or raise the cap"
                )
            x = np.vstack(pdf.loc[vec_ok, vec_col].to_numpy()).astype(
                float
            )
            norms = np.linalg.norm(x, axis=1)
            norms[norms == 0.0] = 1.0
            xh = x / norms[:, None]
            sub_dup = np.zeros(n, dtype=bool)
            for lo in range(0, n, blk):
                hi = min(lo + blk, n)
                g = xh[lo:hi] @ xh.T  # (hi-lo, n)
                for r in range(hi - lo):
                    i = lo + r
                    if i > 0 and (g[r, :i] >= tau).any():
                        sub_dup[i] = True
            dup[vec_ok] = sub_dup
        pdf[out_col] = dup
        return pdf

    return assigned.groupBy(cluster_col).applyInPandas(
        _dedup_group, schema
    )


def cluster_sample(
    df: DataFrame,
    *,
    key_col: str,
    cluster_col: str = "cluster_id",
    n_per_cluster: int,
    salt: str = "",
) -> DataFrame:
    """Diversity-balanced sampling: keep exactly ``n_per_cluster`` rows
    from every cluster, chosen by the portable md5-prefix hash of the
    key (+ salt) — deterministic, engine-independent, and independent of
    row order.  Change ``salt`` to draw a fresh sample.

    The rank window is per-cluster top-m: Spark 3.5+ plans it as
    WindowGroupLimit (each task keeps only its local top-m before the
    shuffle), so no cluster is ever fully sorted in one task.
    """
    h = portable_hash28(
        F.concat(F.col(key_col).cast("string"), F.lit(salt))
    )
    w = Window.partitionBy(cluster_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(n_per_cluster))
        .drop("__rn")
    )


def cluster_quality(
    assigned: DataFrame,
    centroids,
    *,
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Per-cluster quality readout against FIXED centroids: one row
    per cluster with ``n, mean_dist, silhouette`` where ``mean_dist``
    is the average euclidean distance to the own centroid (the
    within-cluster scatter σᵢ) and ``silhouette`` is the mean
    SIMPLIFIED silhouette ``(b − a)/max(a, b)`` with ``a`` = distance
    to own centroid, ``b`` = distance to the nearest OTHER centroid —
    the O(n·k) surrogate for the O(n²) exact silhouette (identical
    ranking behavior in practice, and the only formulation that scales).

    All distances are JVM-side higher-order-function expressions over
    the centroid LITERALS (k·d doubles folded into the plan — no
    broadcast, no UDF, no shuffle beyond the final per-cluster
    aggregate).  Degenerate rows with ``a = b = 0`` score 0.
    """
    import numpy as np

    from pandera_spark.checks import _sql_ident

    from .similarity import _fmt_double

    cent = np.asarray(centroids, dtype=float)
    k = cent.shape[0]
    if k < 2:
        raise ValueError("need at least 2 centroids for silhouette")
    v = F.col(vec_col).cast("array<double>")
    # per-centroid distances generated as SQL and projected ONCE as
    # columns: the Column build was ~k·d literal round trips (~4k py4j
    # calls at k=8, d=64 — pure driver latency), and the projection
    # computes each distance once per row instead of once per CASE
    # branch referencing it.  The parsed trees are operation-for-
    # operation the Column builds (exact repr literals, same fold
    # order) — bit-identical, pinned by a differential test.
    vs = f"CAST({_sql_ident(vec_col)} AS ARRAY<DOUBLE>)"

    def _dist_sql(c_row) -> str:
        arr = ", ".join(_fmt_double(x) for x in c_row)
        return (
            f"sqrt(aggregate(zip_with({vs}, array({arr}), "
            f"(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x))"
        )

    cid_sql = _sql_ident(cluster_col)
    cid = F.col(cluster_col)
    base = assigned.where(v.isNotNull() & cid.isNotNull()).selectExpr(
        f"{cid_sql} AS __cid",
        *[f"{_dist_sql(cent[i])} AS __d{i}" for i in range(k)],
    )
    # own-centroid distance / nearest-other distance as flat CASEs over
    # the projected columns (branches are mutually exclusive, so the
    # flat form equals the nested when/otherwise chain it replaces)
    a_sql = (
        "CASE "
        + " ".join(f"WHEN __cid = {i} THEN __d{i}" for i in range(k))
        + " ELSE CAST(NULL AS DOUBLE) END"
    )

    def _nearest(i: int) -> str:
        others = [f"__d{j}" for j in range(k) if j != i]
        return (
            others[0] if len(others) == 1
            else "least(" + ", ".join(others) + ")"
        )

    b_sql = (
        "CASE "
        + " ".join(f"WHEN __cid = {i} THEN {_nearest(i)}" for i in range(k))
        + " ELSE CAST(NULL AS DOUBLE) END"
    )
    scored = base.selectExpr(
        "__cid", f"({a_sql}) AS __a", f"({b_sql}) AS __b"
    ).selectExpr(
        "__cid",
        "__a",
        "CASE WHEN greatest(__a, __b) > 0 "
        "THEN (__b - __a) / greatest(__a, __b) ELSE 0.0D END AS __s",
    )
    return (
        scored.groupBy(F.col("__cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg("__a").alias("mean_dist"),
            F.avg("__s").alias("silhouette"),
        )
    )


def davies_bouldin(
    quality: DataFrame,
    centroids,
) -> float:
    """Davies-Bouldin index from a :func:`cluster_quality` frame:
    ``(1/k)·Σᵢ maxⱼ≠ᵢ (σᵢ + σⱼ)/d(cᵢ, cⱼ)`` — lower is better.  The
    per-cluster scatters collect (k rows, bounded by construction);
    centroid pairwise distances are driver-side numpy on the given
    (k, d) array.  Clusters absent from ``quality`` (empty) drop."""
    import numpy as np

    cent = np.asarray(centroids, dtype=float)
    rows = quality.select("cluster_id", "mean_dist").collect()
    sig = {int(r["cluster_id"]): float(r["mean_dist"]) for r in rows}
    ids = sorted(sig)
    if len(ids) < 2:
        raise ValueError("need at least 2 non-empty clusters")
    worst = []
    for i in ids:
        ratios = []
        for j in ids:
            if j == i:
                continue
            dij = float(np.linalg.norm(cent[i] - cent[j]))
            if dij > 0:
                ratios.append((sig[i] + sig[j]) / dij)
        if ratios:
            worst.append(max(ratios))
    return float(sum(worst) / len(worst))
