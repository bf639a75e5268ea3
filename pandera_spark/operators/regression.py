"""Supervised model fitting on tabular columns: OLS inference
(coefficients + standard errors + t-statistics) and binary logistic
regression via fixed-iteration Newton-Raphson.

Both follow the moments-to-the-driver design that every distributed
linear-model fitter (Spark MLlib included) uses: the DATA never leaves
the executors — each pass is ONE map-side-combined aggregation whose
shuffle carries a single O(d²) (OLS) or O(1)-per-iteration (logistic)
moment row per task, and the tiny (d+1)×(d+1) solve happens
driver-side.  At 100 TB each pass is a column-pruned scan with no
per-group shuffle at all.

* :func:`ols_inference` extends ``linalg.fit_ols`` with the classical
  inference quantities: ``se(βᵢ) = √(σ̂²·(XᵀX)⁻¹ᵢᵢ)`` with
  ``σ̂² = SSR/(n−p)``, t-statistics, R²/adjusted-R².  Output is a long
  DataFrame (one row per term) so it joins/round-trips like any other
  report frame.
* :func:`logistic_fit` runs ``iters`` Newton steps from β = 0.  Each
  step aggregates the gradient ``Xᵀ(y−p)`` and Hessian ``XᵀWX``
  (W = p(1−p)) in one pass, then solves the 2×2 (intercept + single
  feature) or general p×p system driver-side.  A FIXED iteration count
  (not a convergence loop) keeps the computation deterministic and
  exactly replayable — four Newton steps are quadratically convergent,
  ~12 correct digits on separable-free data.  The projected
  ``(y, x…)`` frame should be cached by the caller for >2 iterations
  on cold storage; pass ``storage_level`` to have the fitter do it.

Reference parity: none (pandera has no model-fitting tier); this is
beyond-reference analytics in the family of ``operators/stats.py`` /
``operators/abtest.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .linalg import _ols_design_moments

__all__ = [
    "ols_inference",
    "logistic_fit",
    "logistic_report",
    "logistic_score",
    "quantile_fit",
    "quantile_score",
]

_OLS_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("coef", T.DoubleType(), False),
    T.StructField("se", T.DoubleType(), True),
    T.StructField("t_stat", T.DoubleType(), True),
    T.StructField("n", T.LongType(), False),
    T.StructField("r2", T.DoubleType(), True),
    T.StructField("adj_r2", T.DoubleType(), True),
])


def ols_inference(
    df: DataFrame,
    y: str,
    xs: "Sequence[str]",
    *,
    intercept: bool = True,
) -> DataFrame:
    """OLS fit of ``y`` on ``xs`` with classical inference: one row per
    term ``(term, coef, se, t_stat, n, r2, adj_r2)``.

    ONE distributed aggregation (the shared normal-equation moments,
    ``linalg._ols_design_moments``); the p×p inverse for the standard
    errors is driver-side numpy.  Requires a full-rank design with
    ``n > p`` (raises otherwise — use :func:`linalg.fit_ols` for the
    minimum-norm fallback when inference isn't needed).
    """
    import numpy as np

    xs = list(xs)
    xtx, xty, n, syy, sy = _ols_design_moments(df, y, xs, intercept)
    p = len(xs) + (1 if intercept else 0)
    if n <= p:
        raise ValueError(
            f"need n > p for inference (n={int(n)}, p={p})"
        )
    try:
        xtx_inv = np.linalg.inv(xtx)
    except np.linalg.LinAlgError as exc:  # pragma: no cover - rank guard
        raise ValueError(
            "singular design (collinear columns?) — "
            "use linalg.fit_ols for the minimum-norm solution"
        ) from exc
    beta = xtx_inv @ xty
    ss_res = max(0.0, syy - 2.0 * float(beta @ xty)
                 + float(beta @ xtx @ beta))
    ybar = sy / n
    ss_tot = max(0.0, syy - n * ybar * ybar)
    r2 = (1.0 - ss_res / ss_tot) if ss_tot > 0 else None
    adj_r2 = (
        1.0 - (1.0 - r2) * (n - 1.0) / (n - p)
        if r2 is not None else None
    )
    sigma2 = ss_res / (n - p)
    se = np.sqrt(np.clip(sigma2 * np.diag(xtx_inv), 0.0, None))
    terms = list(xs) + (["(intercept)"] if intercept else [])
    rows = []
    for i, term in enumerate(terms):
        se_i = float(se[i])
        rows.append((
            term,
            float(beta[i]),
            se_i if se_i > 0 else None,
            float(beta[i]) / se_i if se_i > 0 else None,
            int(n),
            r2,
            adj_r2,
        ))
    return df.sparkSession.createDataFrame(rows, _OLS_SCHEMA)


def logistic_fit(
    df: DataFrame,
    y,
    xs: "Sequence[str]",
    *,
    iters: int = 4,
    intercept: bool = True,
    ridge: float = 0.0,
    storage_level: Optional[str] = "MEMORY_AND_DISK",
) -> dict:
    """Binary logistic regression by ``iters`` Newton-Raphson steps
    from β = 0.

    ``y`` is a column name or boolean Column (nulls drop); ``xs`` are
    numeric feature columns (nulls drop).  Each iteration is ONE
    map-side-combined aggregation of the gradient/Hessian moments —
    Σ(y−p), Σ(y−p)xᵢ, Σw, Σwxᵢ, Σwxᵢxⱼ with w = p(1−p) — followed by a
    driver-side p×p solve; the data never moves.  ``ridge`` adds an
    L2 term (λ·I on the Hessian, −λβ on the gradient) as the standard
    guard against complete separation.

    Returns ``{"terms", "beta", "n", "log_lik", "iters",
    "last_step_norm"}`` with ``beta`` aligned to ``terms``
    (``(intercept)`` LAST when fitted, matching
    :func:`ols_inference`).  Deterministic: fixed iteration count and
    order-insensitive moments.
    """
    import numpy as np

    xs = list(xs)
    if not xs:
        raise ValueError("need at least one feature column")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    d = len(xs)
    p = d + (1 if intercept else 0)
    ycol = (F.col(y) if isinstance(y, str) else y).cast("boolean")
    proj = [ycol.cast("double").alias("__y")]
    cond = ycol.isNotNull()
    for i, c in enumerate(xs):
        xc = F.col(c).cast("double")
        cond = cond & xc.isNotNull()
        proj.append(xc.alias(f"__x_{i}"))
    base = df.where(cond).select(*proj)
    persisted = False
    if storage_level and iters > 1:
        from pyspark import StorageLevel

        base = base.persist(getattr(StorageLevel, storage_level))
        persisted = True
    try:
        beta = np.zeros(p)
        n = None
        log_lik = None
        step_norm = None
        for _ in range(iters):
            # eta = Xβ with the current (driver-side) coefficients
            eta = F.lit(float(beta[d])) if intercept else F.lit(0.0)
            for i in range(d):
                eta = eta + F.col(f"__x_{i}") * F.lit(float(beta[i]))
            prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            w = prob * (F.lit(1.0) - prob)
            resid = F.col("__y") - prob
            aggs = [
                F.count(F.lit(1)).cast("double").alias("n"),
                # log-likelihood of the CURRENT beta, same pass
                F.sum(
                    F.col("__y") * eta - F.log1p(F.exp(eta))
                ).alias("ll"),
                F.sum(resid).alias("g_int"),
                F.sum(w).alias("h_int"),
            ]
            for i in range(d):
                xi = F.col(f"__x_{i}")
                aggs.append(F.sum(resid * xi).alias(f"g_{i}"))
                aggs.append(F.sum(w * xi).alias(f"h_int_{i}"))
                for j in range(i, d):
                    aggs.append(
                        F.sum(w * xi * F.col(f"__x_{j}"))
                        .alias(f"h_{i}_{j}")
                    )
            row = base.agg(*aggs).first()
            n = int(row["n"])
            if n < p:
                raise ValueError(
                    f"need more rows ({n}) than parameters ({p})"
                )
            log_lik = float(row["ll"])
            grad = np.zeros(p)
            hess = np.zeros((p, p))
            for i in range(d):
                grad[i] = row[f"g_{i}"]
                for j in range(i, d):
                    hess[i, j] = hess[j, i] = row[f"h_{i}_{j}"]
            if intercept:
                grad[d] = row["g_int"]
                hess[d, d] = row["h_int"]
                for i in range(d):
                    hess[i, d] = hess[d, i] = row[f"h_int_{i}"]
            if ridge > 0.0:
                grad -= ridge * beta
                hess += ridge * np.eye(p)
            step = np.linalg.solve(hess, grad)
            beta = beta + step
            step_norm = float(np.sqrt(step @ step))
    finally:
        if persisted:
            base.unpersist()
    terms = list(xs) + (["(intercept)"] if intercept else [])
    return {
        "terms": terms,
        "beta": [float(b) for b in beta],
        "n": n,
        "log_lik": log_lik,
        "iters": iters,
        "last_step_norm": step_norm,
    }


def logistic_report(
    spark: SparkSession,
    fit: dict,
) -> DataFrame:
    """One row per term ``(term, coef, n, log_lik, iters)`` from a
    :func:`logistic_fit` result — the report-frame shape the rest of
    the engine round-trips."""
    schema = T.StructType([
        T.StructField("term", T.StringType(), False),
        T.StructField("coef", T.DoubleType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("log_lik", T.DoubleType(), True),
        T.StructField("iters", T.IntegerType(), False),
    ])
    rows = [
        (term, coef, fit["n"], fit["log_lik"], fit["iters"])
        for term, coef in zip(fit["terms"], fit["beta"])
    ]
    return spark.createDataFrame(rows, schema)


def logistic_score(
    df: DataFrame,
    xs: "Sequence[str]",
    beta: "Sequence[float]",
    *,
    intercept: float = 0.0,
    out_col: str = "probability",
) -> DataFrame:
    """Score a fitted logistic model: pure Column projection
    (``p = σ(Σ βᵢ·xᵢ + b₀)``) — zero shuffle, zero UDF, broadcast-free
    (the coefficients fold into the plan as literals)."""
    xs = list(xs)
    beta = list(beta)  # once: a generator would exhaust in the guard
    if len(xs) != len(beta):
        raise ValueError(
            f"{len(xs)} columns vs {len(beta)} coefficients"
        )
    eta = F.lit(float(intercept))
    for c, b in zip(xs, beta):
        eta = eta + F.col(c).cast("double") * F.lit(float(b))
    return df.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    )


def quantile_fit(
    df: DataFrame,
    y,
    xs: "Sequence[str]",
    *,
    tau: float = 0.5,
    iters: int = 10,
    intercept: bool = True,
    eps: float = 1e-6,
    ridge: float = 0.0,
    storage_level: Optional[str] = "MEMORY_AND_DISK",
) -> dict:
    """Linear quantile regression (pinball / check loss) by ``iters``
    IRLS steps — "what drives the p95, not the mean": latency SLOs,
    tail token counts, worst-case cost models, where OLS answers the
    wrong question because the conditional MEAN hides the tail.

    Minimizes ``Σ ρ_τ(y − Xβ)`` with ``ρ_τ(r) = r·(τ − 1[r<0])`` via
    iteratively reweighted least squares on the standard smoothed
    weights ``w = |τ − 1[r<0]| / max(|r|, eps)``; iteration 0 is the
    plain least-squares solve (w = 1), a deterministic warm start.
    Each step is ONE map-side-combined aggregation of the weighted
    moments Σw, Σw·xᵢ, Σw·xᵢxⱼ, Σw·y, Σw·y·xᵢ followed by a
    driver-side p×p solve — the data never moves, exactly the
    :func:`logistic_fit` shape.  ``ridge`` adds λ·I for collinear
    designs; ``eps`` bounds the weight of near-zero residuals (the
    smoothing that makes the non-differentiable loss IRLS-able —
    coefficients converge to the exact quantile fit as eps → 0).

    Returns ``{"terms", "beta", "n", "tau", "pinball", "iters",
    "last_step_norm"}`` with ``pinball`` the mean check loss of the
    FINAL coefficients (one extra aggregation).  Deterministic: fixed
    iteration count, order-insensitive moments.
    """
    import numpy as np

    xs = list(xs)
    if not xs:
        raise ValueError("need at least one feature column")
    if not 0.0 < tau < 1.0:
        raise ValueError(f"tau must be in (0, 1), got {tau}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    d = len(xs)
    p = d + (1 if intercept else 0)
    ycol = (F.col(y) if isinstance(y, str) else y).cast("double")
    proj = [ycol.alias("__y")]
    cond = ycol.isNotNull()
    for i, c in enumerate(xs):
        xc = F.col(c).cast("double")
        cond = cond & xc.isNotNull()
        proj.append(xc.alias(f"__x_{i}"))
    base = df.where(cond).select(*proj)
    persisted = False
    if storage_level:
        from pyspark import StorageLevel

        base = base.persist(getattr(StorageLevel, storage_level))
        persisted = True

    def feats(i):
        # feature i in solve order; index d = the intercept column
        return F.lit(1.0) if i == d else F.col(f"__x_{i}")

    try:
        beta = None
        n = None
        step_norm = None
        for it in range(iters + 1):
            if beta is None:
                w = F.lit(1.0)  # warm start: plain least squares
            else:
                eta = F.lit(0.0)
                for i in range(p):
                    eta = eta + feats(i) * F.lit(float(beta[i]))
                r = F.col("__y") - eta
                w = F.abs(
                    F.lit(float(tau))
                    - F.when(r < 0, F.lit(1.0)).otherwise(F.lit(0.0))
                ) / F.greatest(F.abs(r), F.lit(float(eps)))
            aggs = [F.count(F.lit(1)).alias("__n")]
            for i in range(p):
                aggs.append(F.sum(w * feats(i) * F.col("__y"))
                            .alias(f"__b_{i}"))
                for j in range(i, p):
                    aggs.append(F.sum(w * feats(i) * feats(j))
                                .alias(f"__a_{i}_{j}"))
            row = base.agg(*aggs).first()
            n = row["__n"]
            if not n:
                raise ValueError("no complete rows to fit on")
            A = np.zeros((p, p))
            bvec = np.zeros(p)
            for i in range(p):
                bvec[i] = row[f"__b_{i}"]
                for j in range(i, p):
                    A[i, j] = A[j, i] = row[f"__a_{i}_{j}"]
            if ridge:
                A = A + float(ridge) * np.eye(p)
            new_beta, *_ = np.linalg.lstsq(A, bvec, rcond=None)
            step_norm = (
                float(np.linalg.norm(new_beta - beta))
                if beta is not None else None
            )
            beta = new_beta
        eta = F.lit(0.0)
        for i in range(p):
            eta = eta + feats(i) * F.lit(float(beta[i]))
        r = F.col("__y") - eta
        loss = base.agg(
            F.avg(
                r * (F.lit(float(tau))
                     - F.when(r < 0, F.lit(1.0)).otherwise(F.lit(0.0)))
            ).alias("__l")
        ).first()["__l"]
    finally:
        if persisted:
            base.unpersist()
    terms = list(xs) + (["(intercept)"] if intercept else [])
    return {
        "terms": terms,
        "beta": [float(b) for b in beta],
        "n": int(n),
        "tau": float(tau),
        "pinball": float(loss),
        "iters": int(iters),
        "last_step_norm": step_norm,
    }


def quantile_score(
    df: DataFrame,
    xs: "Sequence[str]",
    beta: "Sequence[float]",
    *,
    intercept: float = 0.0,
    out_col: str = "prediction",
) -> DataFrame:
    """Score a fitted quantile model: pure Column projection
    (``ŷ = Σ βᵢ·xᵢ + b₀``) — zero shuffle, zero UDF, coefficients
    fold into the plan as literals."""
    xs = list(xs)
    beta = list(beta)  # once: a generator would exhaust in the guard
    if len(xs) != len(beta):
        raise ValueError(
            f"{len(xs)} columns vs {len(beta)} coefficients"
        )
    eta = F.lit(float(intercept))
    for c, b in zip(xs, beta):
        eta = eta + F.col(c).cast("double") * F.lit(float(b))
    return df.withColumn(out_col, eta)
