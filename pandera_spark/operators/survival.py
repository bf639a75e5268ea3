"""Survival analysis: the Kaplan-Meier product-limit estimator (with
Greenwood standard errors) — time-to-event readouts (churn, failure,
conversion latency) with right-censoring done correctly.

Naive "average time to event" silently drops censored subjects and
biases the estimate; KM is the standard fix.  The estimator is exactly
replayable in SQL: the running product ``Π (1 − d/n)`` becomes
``exp(Σ ln(1 − d/n))`` over the ordered distinct event times, and the
at-risk counts come from one cumulative window.

Scale shape: ONE aggregation collapses subjects to the
(group, duration) grain — events ``d_t`` and censorings ``c_t`` per
distinct time — so everything after the first shuffle is bounded by
distinct-time cardinality, not subject count.  The cumulative windows
partition by the group key; a keyless call runs the (already
collapsed) time grain in one task — fine for readouts, pass ``by``
for many-group fan-outs.

Reference parity: none (no survival tier in pandera);
beyond-reference analytics next to ``operators/abtest.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["km_curve", "nelson_aalen", "logrank_test", "rmst"]


def km_curve(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    *,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Kaplan-Meier survival curve per group.

    Input: one row per subject — ``duration_col`` (numeric time on
    study) and ``event_col`` (truthy = event observed at that time,
    falsy = right-censored there).  Null durations are excluded; null
    events count as censored.

    Output: one row per (group, distinct duration):
    ``by..., t, n_risk, d, c, survival, std_err`` where ``survival``
    is S(t) after the deaths at t (right-continuous KM) and
    ``std_err`` is the Greenwood estimate
    ``S(t)·sqrt(Σ_{u≤t} d/(n(n−d)))`` (null once S hits 0).
    Censoring-only times appear as rows (they change ``n_risk``) with
    the carried survival.
    """
    keys = [] if by is None else [by] if isinstance(by, str) else list(by)
    t = F.col(duration_col).cast("double")
    ev = F.coalesce(F.col(event_col).cast("boolean"), F.lit(False))
    grain = (
        df.where(t.isNotNull())
        .groupBy(*[F.col(k) for k in keys], t.alias("t"))
        .agg(
            F.sum(ev.cast("long")).alias("d"),
            F.sum((~ev).cast("long")).alias("c"),
        )
    )
    pb = [F.col(k) for k in keys]
    w_ord = (
        Window.partitionBy(*pb)
        .orderBy(F.col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = Window.partitionBy(*pb).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    removed = F.col("d") + F.col("c")
    base = grain.withColumn(
        "n_risk",
        (
            F.sum(removed).over(w_full)
            - F.sum(removed).over(w_ord)
            + removed
        ).cast("long"),
    )
    n = F.col("n_risk").cast("double")
    d = F.col("d").cast("double")
    # Π(1 − d/n) as exp(Σ ln): a time where every at-risk subject dies
    # (d = n) sends S to exactly 0 — flag it instead of ln(0)
    logterm = F.when(d < n, F.log1p(-F.try_divide(d, n))).otherwise(
        F.lit(0.0)
    )
    deadall = F.when((d >= n) & (d > 0), 1).otherwise(0)
    gw_term = F.when(
        (d > 0) & (d < n), F.try_divide(d, n * (n - d))
    ).otherwise(F.lit(0.0))
    scored = (
        base.withColumn("__lt", F.sum(logterm).over(w_ord))
        .withColumn("__z", F.sum(deadall).over(w_ord))
        .withColumn("__gw", F.sum(gw_term).over(w_ord))
    )
    surv = F.when(F.col("__z") > 0, F.lit(0.0)).otherwise(
        F.exp(F.col("__lt"))
    )
    return scored.select(
        *keys,
        "t",
        "n_risk",
        F.col("d").cast("long").alias("d"),
        F.col("c").cast("long").alias("c"),
        surv.alias("survival"),
        F.when(
            F.col("__z") == 0, surv * F.sqrt(F.col("__gw"))
        ).alias("std_err"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    *,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator per group:
    ``H(t) = Σ_{u≤t} d_u/n_u`` with variance ``Σ d_u/n_u²`` — the
    additive companion to :func:`km_curve` (``S ≈ exp(−H)``), better
    behaved at small risk sets and the basis for hazard-ratio eyeball
    checks.

    Same input contract and grain as :func:`km_curve` (one row per
    subject; null durations drop, null events censor) and the same
    scale shape: ONE aggregation to the (group, distinct-time) grain,
    cumulative windows over that.  Output: ``by..., t, n_risk, d, c,
    cum_hazard, std_err``.
    """
    keys = [] if by is None else [by] if isinstance(by, str) else list(by)
    t = F.col(duration_col).cast("double")
    ev = F.coalesce(F.col(event_col).cast("boolean"), F.lit(False))
    grain = (
        df.where(t.isNotNull())
        .groupBy(*[F.col(k) for k in keys], t.alias("t"))
        .agg(
            F.sum(ev.cast("long")).alias("d"),
            F.sum((~ev).cast("long")).alias("c"),
        )
    )
    pb = [F.col(k) for k in keys]
    w_ord = (
        Window.partitionBy(*pb)
        .orderBy(F.col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = Window.partitionBy(*pb).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    removed = F.col("d") + F.col("c")
    base = grain.withColumn(
        "n_risk",
        (
            F.sum(removed).over(w_full)
            - F.sum(removed).over(w_ord)
            + removed
        ).cast("long"),
    )
    n = F.col("n_risk").cast("double")
    d = F.col("d").cast("double")
    return (
        base.withColumn(
            "cum_hazard", F.sum(F.try_divide(d, n)).over(w_ord)
        )
        .withColumn(
            "__var", F.sum(F.try_divide(d, n * n)).over(w_ord)
        )
        .select(
            *keys,
            "t",
            "n_risk",
            F.col("d").cast("long").alias("d"),
            F.col("c").cast("long").alias("c"),
            "cum_hazard",
            F.sqrt(F.col("__var")).alias("std_err"),
        )
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-group log-rank test — THE standard survival comparison
    (does variant A churn/convert on a different time curve than B),
    right-censoring handled.  One row: ``n_a, n_b, observed_a,
    expected_a, chi2, z, pvalue``.

    At every distinct event time t: ``e_a = d_t · n_a(t)/n(t)``
    (expected A-deaths under H₀) and the hypergeometric variance
    ``v_t = d_t·(n_a/n)·(1 − n_a/n)·(n − d)/(n − 1)``; the statistic
    is ``z = Σ(d_a − e_a)/√Σv`` and ``chi2 = z²`` (1 dof).

    Same scale shape as :func:`km_curve`: subjects collapse to the
    (time) grain with per-group death/censor counts in ONE shuffle;
    at-risk counts come from cumulative windows over that grain.
    """
    t = F.col(duration_col).cast("double")
    ev = F.coalesce(F.col(event_col).cast("boolean"), F.lit(False))
    g = F.col(group_col)
    ga, gb = g == F.lit(group_a), g == F.lit(group_b)
    grain = (
        df.where(t.isNotNull() & (ga | gb))
        .groupBy(t.alias("t"))
        .agg(
            F.sum((ga & ev).cast("long")).alias("d_a"),
            F.sum((ga & ~ev).cast("long")).alias("c_a"),
            F.sum((gb & ev).cast("long")).alias("d_b"),
            F.sum((gb & ~ev).cast("long")).alias("c_b"),
        )
    )
    w_ord = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rem_a = F.col("d_a") + F.col("c_a")
    rem_b = F.col("d_b") + F.col("c_b")
    base = grain.select(
        "t", "d_a", "d_b",
        (F.sum(rem_a).over(w_full) - F.sum(rem_a).over(w_ord) + rem_a)
        .cast("double").alias("n_a_t"),
        (F.sum(rem_b).over(w_full) - F.sum(rem_b).over(w_ord) + rem_b)
        .cast("double").alias("n_b_t"),
    )
    n_t = F.col("n_a_t") + F.col("n_b_t")
    d_t = (F.col("d_a") + F.col("d_b")).cast("double")
    e_a = d_t * F.col("n_a_t") / n_t
    v_t = F.when(
        n_t > 1,
        d_t * (F.col("n_a_t") / n_t) * (F.col("n_b_t") / n_t)
        * (n_t - d_t) / (n_t - 1),
    ).otherwise(F.lit(0.0))
    agg = base.agg(
        F.max("n_a_t").cast("long").alias("n_a"),
        F.max("n_b_t").cast("long").alias("n_b"),
        F.sum("d_a").cast("long").alias("observed_a"),
        F.sum(e_a).alias("expected_a"),
        F.sum(F.col("d_a") - e_a).alias("__num"),
        F.sum(v_t).alias("__var"),
    )
    z = F.when(
        F.col("__var") > 0,
        F.col("__num") / F.sqrt(F.col("__var")),
    )
    from .drift import _norm_sf

    return agg.select(
        "n_a", "n_b", "observed_a", "expected_a",
        (z * z).alias("chi2"),
        z.alias("z"),
        F.when(z.isNotNull(), 2.0 * _norm_sf(F.abs(z)))
        .alias("pvalue"),
    )


def rmst(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    *,
    tau: float,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Restricted mean survival time: ``∫₀^τ S(t) dt`` per group — the
    clinically standard "average event-free time over the first τ"
    summary, robust where median survival is undefined (censoring-
    heavy data) and the natural effect size next to
    :func:`logrank_test`'s p-value.

    Computed as the exact step integral of the :func:`km_curve`
    estimator: S is right-continuous and piecewise constant, so
    ``RMST = Σ S(t_{i-1})·(min(t_i, τ) − t_{i-1})`` over event-grain
    rows up to τ (with S(0) = 1).  One row per group:
    ``by..., tau, rmst, n_times``.  Same scale shape as the curve
    itself — everything past the subject collapse is distinct-time
    grain.
    """
    if tau <= 0:
        raise ValueError(f"tau must be > 0: {tau}")
    keys = [] if by is None else [by] if isinstance(by, str) else list(by)
    curve = km_curve(df, duration_col, event_col, by=by)
    pb = [F.col(k) for k in keys]
    w = Window.partitionBy(*pb).orderBy(F.col("t"))
    prev_t = F.coalesce(F.lag("t").over(w), F.lit(0.0))
    prev_s = F.coalesce(F.lag("survival").over(w), F.lit(1.0))
    # the segment [prev_t, min(t, tau)) is covered at the PREVIOUS
    # survival level; segments starting at/after tau contribute 0
    seg = F.greatest(
        F.least(F.col("t"), F.lit(float(tau))) - prev_t, F.lit(0.0)
    )
    tail_start = F.least(F.col("t"), F.lit(float(tau)))
    contrib = prev_s * seg
    agg = (
        curve.withColumn("__contrib", contrib)
        .withColumn("__tail_t", tail_start)
        .withColumn("__s", F.col("survival"))
        .groupBy(*pb)
        .agg(
            F.sum("__contrib").alias("__area"),
            F.max("__tail_t").alias("__last_t"),
            F.max_by("__s", F.col("t")).alias("__last_s"),
            F.count(F.lit(1)).cast("long").alias("n_times"),
        )
    )
    # the plateau after the last event time up to tau stays at the
    # final survival level
    tail = F.greatest(
        F.lit(float(tau)) - F.col("__last_t"), F.lit(0.0)
    ) * F.col("__last_s")
    return agg.select(
        *keys,
        F.lit(float(tau)).alias("tau"),
        (F.col("__area") + tail).alias("rmst"),
        "n_times",
    )
