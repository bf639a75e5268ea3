"""Product quantization (PQ): compress embeddings to m-byte codes and
search them without ever touching the float vectors again.

The ANN tier's storage ladder: float32 (``similarity``/``ann_ivf``) →
int8 scalar codes (``quantize``, 4×) → PQ codes (this module, 16–64×).
PQ splits each d-dim vector into ``m`` subvectors, k-means-quantizes
each subspace to ``k`` centroids (Jégou et al. 2011, "Product
quantization for nearest neighbor search"), and stores only the m
centroid ids.  Search uses asymmetric distance computation (ADC): the
QUERY stays float, a tiny (m × k) lookup table of exact
query-to-centroid distances is built once per query, and each stored
code's distance is m table lookups — no decode, no float vectors.

Spark shapes:

- **fit** (:func:`pq_fit`): m independent subspace k-means runs through
  the deterministic :func:`..kmeans.fit_kmeans` (min-hash seeding, no
  RNG — the same fit replays run-to-run).  Each run's shuffle is the
  cardinality-bounded centroid aggregation; only m × k × (d/m) floats
  reach the driver.
- **encode** (:func:`pq_encode`): Arrow-batched pandas UDF, one BLAS
  ``argmin ‖x_sub − c‖²`` per subspace per batch — a pure map, no
  shuffle; codes are ``array<int>`` (tinyint-range values when
  k ≤ 256).
- **search** (:func:`pq_search`): the per-query table is built
  driver-side (m × k doubles), shipped in the UDF closure, and the
  scan is a projection + ``TakeOrderedAndProject`` top-k — the classic
  ADC scan, embarrassingly parallel.
- **fidelity** (:func:`pq_error_report`): one aggregation over the
  reconstruction error — run it before switching retrieval to codes,
  same contract as ``quantize.quantization_error_report``.

Reference parity: none (no ANN in pandera); beyond-reference
similarity tier.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["pq_fit", "pq_encode", "pq_search", "pq_error_report"]


def _check_codebooks(codebooks):
    import numpy as np

    cb = np.asarray(codebooks, dtype=float)
    if cb.ndim != 3:
        raise ValueError(
            f"codebooks must be (m, k, d/m), got shape {cb.shape}"
        )
    return cb


def pq_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    max_iter: int = 10,
    salt: str = "",
):
    """Fit PQ codebooks: returns a numpy array of shape (m, k, d/m).

    ``d`` must divide evenly by ``m``.  Each subspace fits with the
    deterministic k-means (min-hash seeding keyed by ``salt``-``j`` so
    subspaces seed independently); rows with null vectors are ignored.
    """
    import numpy as np

    from .kmeans import fit_kmeans

    first = df.where(F.col(vec_col).isNotNull()).select(
        F.size(vec_col).alias("d")
    ).first()
    if first is None:
        raise ValueError("no non-null vectors to fit")
    d = int(first["d"])
    if m < 1 or d % m != 0:
        raise ValueError(f"dim {d} must divide evenly by m={m}")
    dsub = d // m
    books = []
    for j in range(m):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * dsub + 1, dsub).alias(vec_col),
        )
        fit = fit_kmeans(
            sub, vec_col=vec_col, id_col=id_col, k=k,
            max_iter=max_iter, salt=f"{salt}pq{j}",
        )
        books.append(np.asarray(fit.centroids, dtype=float))
    return np.stack(books)  # (m, k, dsub)


def pq_encode(
    df: DataFrame,
    codebooks,
    *,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Append the m-int PQ code column (null vector -> null code).

    Arrow-batched: per batch and subspace, one
    ``‖x‖² − 2·X·Cᵀ + ‖c‖²`` argmin — the same expanded BLAS form as
    k-means assignment.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cb = _check_codebooks(codebooks)
    mm, kk, dsub = cb.shape
    cb_flat = cb  # closure capture

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _encode(s):
        out = []
        mask = s.notna()
        if not mask.any():
            return pd.Series([None] * len(s))
        X = np.stack(s[mask].to_numpy())
        codes = np.empty((X.shape[0], mm), dtype=np.int32)
        for j in range(mm):
            sub = X[:, j * dsub:(j + 1) * dsub]
            c = cb_flat[j]
            d2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * sub @ c.T
                + (c * c).sum(axis=1)
            )
            codes[:, j] = np.argmin(d2, axis=1)
        it = iter(codes.tolist())
        for ok in mask:
            out.append(next(it) if ok else None)
        return pd.Series(out)

    return df.withColumn(out_col, _encode(F.col(vec_col)))


def pq_search(
    codes: DataFrame,
    query,
    codebooks,
    *,
    code_col: str = "pq_code",
    id_col: str = "vec_id",
    topk: int = 10,
) -> DataFrame:
    """ADC top-k over a PQ-coded corpus for ONE float query vector.

    The (m × k) exact query-to-centroid distance table is built
    driver-side and shipped in the UDF closure (m·k doubles — bytes,
    not data); scoring is a pure Arrow map over the codes and the
    result is a ``TakeOrderedAndProject`` top-k (per-partition local
    top-k, no global sort).  Returns ``(id_col, adc_dist)`` ascending.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cb = _check_codebooks(codebooks)
    mm, kk, dsub = cb.shape
    q = np.asarray(query, dtype=float)
    if q.shape != (mm * dsub,):
        raise ValueError(
            f"query dim {q.shape} != codebook dim {(mm * dsub,)}"
        )
    table = np.empty((mm, kk))
    for j in range(mm):
        diff = cb[j] - q[j * dsub:(j + 1) * dsub]
        table[j] = (diff * diff).sum(axis=1)
    tbl = table

    @pandas_udf(T.DoubleType())
    def _adc(s):
        vals = np.full(len(s), np.nan)
        mask = s.notna()
        if mask.any():
            C = np.stack(s[mask].to_numpy()).astype(np.int64)
            vals[mask.to_numpy()] = tbl[np.arange(mm), C].sum(axis=1)
        return pd.Series(vals)

    scored = codes.select(
        F.col(id_col), _adc(F.col(code_col)).alias("adc_dist")
    ).where(~F.isnan("adc_dist"))
    return scored.orderBy(F.asc("adc_dist"), F.asc(id_col)).limit(topk)


def pq_error_report(
    df: DataFrame,
    codebooks,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Reconstruction fidelity in ONE aggregation: ``n, mse, max_sq_err,
    mean_cos`` between each vector and its PQ reconstruction — run
    before trusting code-domain retrieval (the PQ analogue of
    ``quantize.quantization_error_report``)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cb = _check_codebooks(codebooks)
    mm, kk, dsub = cb.shape

    @pandas_udf(
        T.StructType([
            T.StructField("sq_err", T.DoubleType()),
            T.StructField("cos", T.DoubleType()),
        ])
    )
    def _err(s):
        n = len(s)
        sq = np.full(n, np.nan)
        cos = np.full(n, np.nan)
        mask = s.notna()
        if mask.any():
            X = np.stack(s[mask].to_numpy())
            R = np.empty_like(X)
            for j in range(mm):
                sub = X[:, j * dsub:(j + 1) * dsub]
                c = cb[j]
                d2 = (
                    (sub * sub).sum(axis=1, keepdims=True)
                    - 2.0 * sub @ c.T
                    + (c * c).sum(axis=1)
                )
                R[:, j * dsub:(j + 1) * dsub] = c[np.argmin(d2, axis=1)]
            diff = X - R
            sqv = (diff * diff).sum(axis=1)
            num = (X * R).sum(axis=1)
            den = np.linalg.norm(X, axis=1) * np.linalg.norm(R, axis=1)
            cosv = np.where(den > 0, num / np.maximum(den, 1e-300), np.nan)
            sq[mask.to_numpy()] = sqv
            cos[mask.to_numpy()] = cosv
        return pd.DataFrame({"sq_err": sq, "cos": cos})

    e = df.select(_err(F.col(vec_col)).alias("__e")).select("__e.*")
    ok = e.where(~F.isnan("sq_err"))
    return ok.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("sq_err").alias("mse"),
        F.max("sq_err").alias("max_sq_err"),
        F.avg("cos").alias("mean_cos"),
    )
