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

__all__ = ["km_curve", "nelson_aalen"]


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
