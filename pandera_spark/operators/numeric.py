"""Numeric outlier handling: percentile bounds and winsorization.

The standard numeric-hygiene pass before aggregate statistics or model
features: clip (or flag) the tails at percentile bounds.

Design for 100 TB:
- ALL columns' bounds come from ONE aggregation job (a percentile
  aggregate with an array of probabilities per column — same
  single-pass shape as :func:`..inference.numeric_percentiles`); the
  bounds frame is one row and is broadcast, so clipping is a pure
  projection.
- the DEFAULT path is ``approx_percentile`` (Greenwald-Khanna sketch:
  bounded memory, fully map-side mergeable — rank error <=
  n/``accuracy``), because exact ``percentile`` buffers EVERY value of
  every column inside one final aggregate buffer: fine into the
  hundreds of millions, a genuine single-reducer memory wall at 100 TB.
  Pass ``exact=True`` to opt back into exact interpolated
  (percentile_cont) bounds when the data fits.
- approx semantics differ from exact: the sketch returns an ACTUAL data
  value whose rank is within n/``accuracy`` of the target (ANSI
  ``percentile_disc``-style), never an interpolated value, so it can
  equal a ``percentile_cont`` replay only by coincidence.  Contract
  queries pinning a ``quantile_cont`` oracle must pass ``exact=True``;
  the approx path's own contract row
  (``approx_percentiles_lineitem``) verifies the rank-error bound
  instead.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _resolve_exact(exact: bool, approx: Optional[bool]) -> bool:
    """Honour the pre-r5 ``approx=`` keyword as a deprecated alias for
    ``exact=not approx`` (the default flipped to approx in r5)."""
    if approx is None:
        return exact
    warnings.warn(
        "the approx= keyword is deprecated; approx is the default — "
        "pass exact=True to opt into exact interpolated percentiles",
        DeprecationWarning,
        stacklevel=3,
    )
    return not approx

__all__ = [
    "percentile_bounds",
    "winsorize",
    "winsorize_report",
    "grouped_percentiles",
    "standardize",
    "trimmed_mean",
    "correlation_matrix",
    "sketch_bins",
    "mad_outlier_report",
    "mahalanobis_outliers",
    "chi2_threshold",
]


def _bounds_agg(cols: Sequence[str], lower: float, upper: float,
                exact: bool, accuracy: int):
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(
            f"need 0 <= lower < upper <= 1, got {lower=} {upper=}"
        )
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1, got {accuracy}")
    probs = F.array(F.lit(float(lower)), F.lit(float(upper)))
    exprs = []
    for c in cols:
        v = F.col(c).cast("double")
        q = (
            F.percentile(v, probs)
            if exact
            else F.approx_percentile(v, probs, F.lit(int(accuracy)))
        )
        exprs.append(q.getItem(0).alias(f"__lo_{c}"))
        exprs.append(q.getItem(1).alias(f"__hi_{c}"))
    return exprs


def percentile_bounds(
    df: DataFrame,
    cols: Sequence[str],
    *,
    lower: float = 0.01,
    upper: float = 0.99,
    exact: bool = False,
    accuracy: int = 10000,
    approx: Optional[bool] = None,
) -> DataFrame:
    """One-row frame of ``(__lo_<col>, __hi_<col>)`` per column — the
    broadcastable clip bounds, from ONE aggregation job.  Default is the
    mergeable bounded-memory sketch (rank error <= n/``accuracy``);
    ``exact=True`` opts into exact interpolated percentiles."""
    exact = _resolve_exact(exact, approx)
    return df.agg(*_bounds_agg(cols, lower, upper, exact, accuracy))


def winsorize(
    df: DataFrame,
    cols: Sequence[str],
    *,
    lower: float = 0.01,
    upper: float = 0.99,
    exact: bool = False,
    accuracy: int = 10000,
    approx: Optional[bool] = None,
) -> DataFrame:
    """Clip every listed column into its [lower, upper] percentile range
    (nulls pass through).  One bounds job + one broadcast, then a pure
    projection — two scans total regardless of column count."""
    exact = _resolve_exact(exact, approx)
    bounds = F.broadcast(
        percentile_bounds(
            df, cols, lower=lower, upper=upper, exact=exact,
            accuracy=accuracy,
        )
    )
    out = df.crossJoin(bounds)
    for c in cols:
        clipped = F.least(
            F.greatest(F.col(c).cast("double"), F.col(f"__lo_{c}")),
            F.col(f"__hi_{c}"),
        )
        out = out.withColumn(
            c, F.when(F.col(c).isNotNull(), clipped)
        )
    return out.drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def winsorize_report(
    df: DataFrame,
    cols: Sequence[str],
    *,
    lower: float = 0.01,
    upper: float = 0.99,
    exact: bool = False,
    accuracy: int = 10000,
    approx: Optional[bool] = None,
) -> DataFrame:
    """Long-format tail report per column: the bounds and how many rows
    fall outside them — ``(col_name, lo, hi, n_below, n_above)``.
    Bounds job + one counting pass."""
    exact = _resolve_exact(exact, approx)
    bounds = F.broadcast(
        percentile_bounds(
            df, cols, lower=lower, upper=upper, exact=exact,
            accuracy=accuracy,
        )
    )
    joined = df.crossJoin(bounds)
    agg = joined.agg(
        *[
            e
            for c in cols
            for e in (
                F.first(f"__lo_{c}").alias(f"__l_{c}"),
                F.first(f"__hi_{c}").alias(f"__h_{c}"),
                F.count(
                    F.when(F.col(c).cast("double") < F.col(f"__lo_{c}"), 1)
                ).alias(f"__b_{c}"),
                F.count(
                    F.when(F.col(c).cast("double") > F.col(f"__hi_{c}"), 1)
                ).alias(f"__a_{c}"),
            )
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__l_{c}").alias("lo"),
                F.col(f"__h_{c}").alias("hi"),
                F.col(f"__b_{c}").cast("long").alias("n_below"),
                F.col(f"__a_{c}").cast("long").alias("n_above"),
            )
            for c in cols
        ]
    )
    return agg.select(F.explode(rows).alias("s")).select(
        "s.col_name", "s.lo", "s.hi", "s.n_below", "s.n_above"
    )


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pearson correlation of every column pair in ONE aggregation job,
    long-format ``(col_a, col_b, corr)`` with ``col_a < col_b``.

    Computed as ``try_divide(covar_samp, stddev_samp * stddev_samp)``
    (the (n-1) factors cancel — identical to Pearson ``corr``) because
    the builtin ``corr`` raises DIVIDE_BY_ZERO on a zero-variance
    column under ANSI mode; this form returns null there, matching SQL
    ``corr`` semantics.  All are numerically-stable co-moment
    aggregates merged map-side — ONE column-pruned scan however many
    pairs.  The multicollinearity screen of a feature-quality report."""
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1:]
    ]

    def pearson(a: str, b: str):
        x, y = F.col(a).cast("double"), F.col(b).cast("double")
        return F.try_divide(
            F.covar_samp(x, y), F.stddev_samp(x) * F.stddev_samp(y)
        )

    agg = df.agg(
        *[
            pearson(a, b).alias(f"__c_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"__c_{i}").alias("corr"),
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    return agg.select(F.explode(rows).alias("s")).select(
        "s.col_a", "s.col_b", "s.corr"
    )


def sketch_bins(
    df: DataFrame,
    col: "str | Sequence[str]",
    n_bins: int,
    *,
    exact: bool = False,
    accuracy: int = 10000,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Equi-depth bins for CONTINUOUS scores at scale — the third leg of
    the binning family (``curation.ntile_bins``: exact but a global
    single-task sort; ``curation.cdf_bins``: exact but aggregates one
    row per DISTINCT score, fine only for low-cardinality scores).

    Interior edges (quantiles at i/n_bins) come from ONE percentile
    aggregate — for EVERY listed column at once when ``col`` is a list
    (the module's one-job-for-all-columns shape) — the mergeable GK
    sketch by default (rank error ≤ n/``accuracy``, so bin POPULATIONS
    are off by at most that), the exact interpolated path with
    ``exact=True`` — broadcast as a 1-row frame; bin assignment is then
    a pure projection: ``bin = 1 + #edges < x`` (ties with an edge go
    LEFT, nulls get a null bin).  No window, no per-score state —
    survives any corpus width.  The typical uses: perplexity/quality
    bucketing for curriculum mixing, and equi-depth histogram edges for
    drift PSI.

    ``out_col`` names the single output column (default ``"bin"``) when
    one column is binned; with several, outputs are ``<col>_bin`` and
    ``out_col`` must stay None.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    cols = [col] if isinstance(col, str) else list(col)
    if len(cols) != 1 and out_col is not None:
        raise ValueError("out_col only applies to single-column binning")
    outs = (
        [out_col or "bin"]
        if len(cols) == 1
        else [f"{c}_bin" for c in cols]
    )
    probs = [i / n_bins for i in range(1, n_bins)]
    if not probs:
        for c, oc in zip(cols, outs):
            df = df.withColumn(
                oc,
                F.when(F.col(c).isNotNull(), F.lit(1)).cast("int"),
            )
        return df
    parr = F.array(*[F.lit(p) for p in probs])

    def q(c: str):
        v = F.col(c).cast("double")
        return (
            F.percentile(v, parr)
            if exact
            else F.approx_percentile(v, parr, F.lit(int(accuracy)))
        )

    edges = F.broadcast(
        df.agg(*[q(c).alias(f"__edges_{c}") for c in cols])
    )

    def _below(v):
        # close over v: a default-arg lambda would change the arity
        # pyspark infers for the HOF merge function
        return lambda acc, e: acc + F.when(e < v, F.lit(1)).otherwise(
            F.lit(0)
        )

    binned = df.crossJoin(edges)
    for c, oc in zip(cols, outs):
        v = F.col(c).cast("double")
        binned = binned.withColumn(
            oc,
            F.when(
                v.isNotNull(),
                F.lit(1)
                + F.aggregate(
                    F.col(f"__edges_{c}"), F.lit(0), _below(v)
                ),
            ).cast("int"),
        )
    return binned.drop(*[f"__edges_{c}" for c in cols])


def mad_outlier_report(
    df: DataFrame,
    cols: Sequence[str],
    *,
    k: float = 3.5,
    exact: bool = False,
    accuracy: int = 10000,
    consistency: float = 1.4826,
) -> DataFrame:
    """Robust outlier screen: median ± k · (consistency · MAD) fences —
    immune to the outliers themselves, unlike mean/stddev z-scores
    (Iglewicz & Hoaglin's modified z-score; ``consistency=1.4826``
    makes MAD estimate σ under normality, ``k=3.5`` is their
    recommended cut).  Long-format output per column:
    ``(col_name, n_nonnull, median_r, mad_r, n_low, n_high)``.

    Two jobs total REGARDLESS of column count (the module's
    one-agg-for-all-columns shape): ONE action computes medians for
    every column and the MADs over the absolute deviations (the 1-row
    median frame broadcast back in — the conformal fold), then the
    fence counts are the returned frame's own job — all mergeable
    map-side (GK sketch by default; ``exact=True`` switches both
    quantile passes to exact interpolation, the oracle-replayable
    lane).  Only 2·|cols| scalars ever reach the driver.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("need at least one column")
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1, got {accuracy}")

    def med_of(exprs):
        return [
            (
                F.percentile(v, F.lit(0.5))
                if exact
                else F.approx_percentile(
                    v, F.lit(0.5), F.lit(int(accuracy))
                )
            ).alias(f"__m{i}")
            for i, v in enumerate(exprs)
        ]

    vals = [F.col(c).cast("double") for c in cols]
    # ONE action for medians AND MADs (the conformal fold,
    # evalmetrics.fit_conformal): the 1-row medians frame rides back in
    # as a broadcast, deviations reference its columns, and the driver
    # reads both scalar sets from a single collect — the former shape
    # was two sequential .first() probes, each a full scheduler round
    # trip.  abs(v − NULL) is NULL, so an all-null column still yields
    # a NULL MAD exactly like the old F.lit(None) branch.
    meds = df.agg(*med_of(vals))
    dev_aggs = med_of(
        [
            F.abs(v - F.col(f"__m{i}"))
            for i, v in enumerate(vals)
        ]
    )
    row = (
        df.crossJoin(F.broadcast(meds))
        .agg(
            *[a.alias(f"__d{i}") for i, a in enumerate(dev_aggs)],
            *[
                F.first(F.col(f"__m{i}")).alias(f"__m{i}")
                for i in range(len(cols))
            ],
        )
        .first()
    )
    medians = [row[f"__m{i}"] for i in range(len(cols))]
    mads = [row[f"__d{i}"] for i in range(len(cols))]

    aggs = []
    for i, (c, v, m, d) in enumerate(zip(cols, vals, medians, mads)):
        if m is None or d is None:
            aggs += [
                F.lit(0).alias(f"__nn{i}"),
                F.lit(0).alias(f"__lo{i}"),
                F.lit(0).alias(f"__hi{i}"),
            ]
            continue
        half = float(k) * float(consistency) * d
        lo, hi = m - half, m + half
        aggs += [
            F.count(v).alias(f"__nn{i}"),
            F.sum((v < F.lit(lo)).cast("long")).alias(f"__lo{i}"),
            F.sum((v > F.lit(hi)).cast("long")).alias(f"__hi{i}"),
        ]
    counts = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__nn{i}").cast("long").alias("n_nonnull"),
                F.lit(
                    None if medians[i] is None
                    else round(medians[i], 6)
                ).cast("double").alias("median_r"),
                F.lit(
                    None if mads[i] is None else round(mads[i], 6)
                ).cast("double").alias("mad_r"),
                F.coalesce(F.col(f"__lo{i}"), F.lit(0))
                .cast("long").alias("n_low"),
                F.coalesce(F.col(f"__hi{i}"), F.lit(0))
                .cast("long").alias("n_high"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return counts.select(F.explode(rows).alias("s")).select(
        "s.col_name", "s.n_nonnull", "s.median_r", "s.mad_r",
        "s.n_low", "s.n_high",
    )


def grouped_percentiles(
    df: DataFrame,
    cols: Sequence[str],
    by: Sequence[str],
    *,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-SEGMENT percentile profile: every column × probability for
    every group in ONE grouped aggregation — the segmented twin of
    :func:`..inference.numeric_percentiles` (global) for "does the
    p99 differ by region/source/day?" questions.

    Long format: ``(by..., col_name, p, value)``.  Same engine rules
    as the module: mergeable GK sketch by default (per-group state is
    one sketch per column — map-side combinable, so skewed group sizes
    spill, not OOM), ``exact=True`` for interpolated percentile_cont
    semantics (the oracle-replayable lane; buffers each group-column's
    values in the final aggregate — fine to ~1e8 rows per group).
    One shuffle on the group keys regardless of |cols| × |probs|.
    """
    cols, by, probs = list(cols), list(by), [float(p) for p in probs]
    if not cols or not by:
        raise ValueError("need at least one value column and one key")
    if not all(0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probabilities must be in [0,1], got {probs}")
    parr = F.array(*[F.lit(p) for p in probs])
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        q = (
            F.percentile(v, parr)
            if exact
            else F.approx_percentile(v, parr, F.lit(int(accuracy)))
        )
        aggs.append(q.alias(f"__q_{c}"))
    g = df.groupBy(*[F.col(k) for k in by]).agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.lit(p).alias("p"),
                F.col(f"__q_{c}").getItem(i).alias("value"),
            )
            for c in cols
            for i, p in enumerate(probs)
        ]
    )
    return g.select(
        *[F.col(k) for k in by], F.explode(rows).alias("s")
    ).select(*by, "s.col_name", "s.p", "s.value")


def standardize(
    df: DataFrame,
    cols: Sequence[str],
    *,
    method: str = "zscore",
    exact: bool = False,
    accuracy: int = 10000,
    suffix: str = "_std",
) -> DataFrame:
    """Feature scaling: ``zscore`` ((x−mean)/stddev_samp), ``robust``
    ((x−median)/IQR — outlier-immune), or ``minmax`` ((x−min)/(max−min)
    into [0,1]).  The module's standard shape: ALL columns' statistics
    from ONE aggregation job, broadcast as a 1-row frame, then a pure
    projection — two scans total regardless of column count.  The
    robust quantiles use the mergeable GK sketch by default
    (``exact=True`` for the interpolated oracle-replayable lane).
    Zero-spread columns (std/IQR/range = 0) scale to null rather than
    ±inf; nulls pass through.  Scaled columns are added as
    ``<col><suffix>``.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("need at least one column")
    if method not in ("zscore", "robust", "minmax"):
        raise ValueError(f"unknown method {method!r}")
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        if method == "zscore":
            aggs += [
                F.avg(v).alias(f"__c_{c}"),
                F.stddev_samp(v).alias(f"__s_{c}"),
            ]
        elif method == "minmax":
            aggs += [
                F.min(v).alias(f"__c_{c}"),
                (F.max(v) - F.min(v)).alias(f"__s_{c}"),
            ]
        else:
            probs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
            q = (
                F.percentile(v, probs)
                if exact
                else F.approx_percentile(v, probs, F.lit(int(accuracy)))
            )
            aggs += [
                q.getItem(1).alias(f"__c_{c}"),
                (q.getItem(2) - q.getItem(0)).alias(f"__s_{c}"),
            ]
    stats = F.broadcast(df.agg(*aggs))
    out = df.crossJoin(stats)
    for c in cols:
        v = F.col(c).cast("double")
        scaled = F.when(
            F.col(f"__s_{c}") > 0,
            (v - F.col(f"__c_{c}")) / F.col(f"__s_{c}"),
        )
        out = out.withColumn(f"{c}{suffix}", scaled)
    return out.drop(
        *[f"__c_{c}" for c in cols], *[f"__s_{c}" for c in cols]
    )


def trimmed_mean(
    df: DataFrame,
    cols: Sequence[str],
    *,
    lower: float = 0.05,
    upper: float = 0.95,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Trimmed mean per column: the mean of values INSIDE the
    [lower, upper] percentile band — the robust location estimate that,
    unlike winsorize, drops the tails instead of clipping them.  Long
    format ``(col_name, n_kept, n_dropped, tmean)``.

    Module shape: ONE bounds aggregation for every column (mergeable
    sketch by default, ``exact=True`` for the oracle-replayable
    interpolated lane), broadcast, then ONE conditional-average pass —
    two scans regardless of column count.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("need at least one column")
    bounds = F.broadcast(
        percentile_bounds(
            df, cols, lower=lower, upper=upper, exact=exact,
            accuracy=accuracy,
        )
    )
    joined = df.crossJoin(bounds)
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        inside = (v >= F.col(f"__lo_{c}")) & (v <= F.col(f"__hi_{c}"))
        aggs += [
            F.count(F.when(inside, 1)).cast("long").alias(f"__k_{c}"),
            F.count(F.when(v.isNotNull() & ~inside, 1))
            .cast("long").alias(f"__d_{c}"),
            F.avg(F.when(inside, v)).alias(f"__m_{c}"),
        ]
    g = joined.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__k_{c}").alias("n_kept"),
                F.col(f"__d_{c}").alias("n_dropped"),
                F.col(f"__m_{c}").alias("tmean"),
            )
            for c in cols
        ]
    )
    return g.select(F.explode(rows).alias("s")).select(
        "s.col_name", "s.n_kept", "s.n_dropped", "s.tmean"
    )


def mahalanobis_outliers(
    df: DataFrame,
    cols: Sequence[str],
    *,
    threshold: Optional[float] = None,
    out_col: str = "mahalanobis_sq",
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Multivariate outlier screen: squared Mahalanobis distance of each
    row from the column means under the sample covariance — the
    correlated-columns complement of :func:`mad_outlier_report` (a
    point can sit inside every univariate fence yet be wildly
    improbable jointly).

    Appends ``mahalanobis_sq`` (null when any input column is null)
    and, with ``threshold``, ``is_outlier`` (``d² > threshold``; under
    multivariate normality d² is ~χ²(d), so e.g. 16.27 ≈ the 99.9%
    cut at d=3 — pick from a χ² table for your d).

    Plan: ONE aggregation collects the d means + d(d+1)/2 sample
    co-moments (moment rows on the wire, never data), the d×d inverse
    happens driver-side (``pinv``, so a singular/collinear covariance
    degrades to the pseudo-inverse instead of crashing), and the
    distance is a pure Column projection — expanded quadratic form,
    zero UDF, one scan for the stats + one for the scoring.
    """
    import numpy as np

    cols = list(cols)
    d = len(cols)
    if d < 1:
        raise ValueError("need at least one column")
    xs = [F.col(c).cast("double") for c in cols]
    cond = xs[0].isNotNull()
    for x in xs[1:]:
        cond = cond & x.isNotNull()
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i in range(d):
        aggs.append(F.avg(xs[i]).alias(f"m_{i}"))
        for j in range(i, d):
            aggs.append(F.covar_samp(xs[i], xs[j]).alias(f"s_{i}_{j}"))
    row = df.where(cond).agg(*aggs).first()
    if row["n"] < 2:
        raise ValueError("need at least 2 complete rows")
    mean = np.array([row[f"m_{i}"] for i in range(d)])
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            cov[i, j] = cov[j, i] = row[f"s_{i}_{j}"]
    prec = np.linalg.pinv(cov)
    centered = [xs[i] - F.lit(float(mean[i])) for i in range(d)]
    dist = F.lit(0.0)
    for i in range(d):
        for j in range(d):
            w = float(prec[i, j])
            if w != 0.0:
                dist = dist + F.lit(w) * centered[i] * centered[j]
    out = df.withColumn(out_col, F.when(cond, dist))
    if threshold is not None:
        out = out.withColumn(
            flag_col, F.col(out_col) > F.lit(float(threshold))
        )
    return out


def chi2_threshold(p: float, dof: int) -> float:
    """Approximate chi-square quantile (driver-side scalar helper for
    :func:`mahalanobis_outliers` thresholds): the Wilson-Hilferty
    inverse ``k·(1 − 2/(9k) + z_p·sqrt(2/(9k)))³`` with Φ⁻¹ via the
    Beasley-Springer-Moro rational approximation — within ~2.5% of the
    exact quantile for dof ≥ 1, p ∈ (0.5, 0.9995) (worst at dof=1),
    which is threshold territory (no scipy, same no-dependency policy as the p-value
    forms in hypotheses.py)."""
    import math

    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    if dof < 1:
        raise ValueError(f"dof must be >= 1, got {dof}")
    # Beasley-Springer-Moro inverse normal CDF
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        z = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
             * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    elif p <= phigh:
        q = p - 0.5
        r = q * q
        z = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
             * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4])
            * r + 1)
    else:
        q = math.sqrt(-2 * math.log(1 - p))
        z = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
              * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    k = float(dof)
    t = 1 - 2 / (9 * k) + z * math.sqrt(2 / (9 * k))
    return k * t ** 3
