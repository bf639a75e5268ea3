"""Evaluation metrics for binary filter/quality models, engine-native.

The engine trains and scores its own filter models (``text.nb_train``,
``text.hashed_linear_score``, ``lm_score``, DSIR) — this module closes
the loop with the metrics that decide whether a filter ships: ROC AUC,
threshold confusion/precision/recall, and calibration.  All computed
as aggregations over the DISTINCT-SCORE grain (the ``ks_drift``
pattern): one tag-count shuffle collapses the corpus to one row per
distinct score, cumulative windows then run over THAT — fine for the
bounded-precision scores real models emit; quantize first
(``F.round(score, 4)``) for a truly continuous 100 TB column, which
perturbs AUC by at most the bin width.

AUC uses the rank formulation with the standard tie correction
(average ranks — identical to the trapezoidal ROC area):
``AUC = (Σ_{positives} avgrank - P(P+1)/2) / (P·N)``.

Reference parity: no pandera analogue; beyond-reference ML-evaluation
tier next to operators/drift.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = [
    "binary_auc",
    "confusion_report",
    "calibration_bins",
    "fit_conformal",
    "apply_conformal",
]


def binary_auc(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """One row ``(n_pos, n_neg, auc)``.

    Tie-corrected rank AUC on the distinct-score grain: per distinct
    score count positives/negatives (ONE shuffle, map-side collapsed),
    then average ranks from a cumulative window over the distinct
    scores.  Rows with a null score or label are excluded.  AUC is
    null when either class is empty.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.where(s.isNotNull() & y.isNotNull())
    per_score = base.groupBy(s.alias("v")).agg(
        F.sum(y).cast("long").alias("p"),
        F.sum(1 - y).cast("long").alias("n"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_score.select(
        "v", "p", "n",
        (F.sum(F.col("p") + F.col("n")).over(w)).alias("cum_all"),
    )
    # average rank of the tie group ending at cum_all with size p+n:
    # (first rank + last rank) / 2 = cum_all - (p+n-1)/2
    avg_rank = F.col("cum_all") - (F.col("p") + F.col("n") - 1) / 2.0
    agg = cum.agg(
        F.sum("p").alias("P"),
        F.sum("n").alias("N"),
        F.sum(avg_rank * F.col("p")).alias("rank_sum"),
    )
    auc = F.when(
        (F.col("P") > 0) & (F.col("N") > 0),
        (F.col("rank_sum") - F.col("P") * (F.col("P") + 1) / 2.0)
        / (F.col("P") * F.col("N")).cast("double"),
    )
    return agg.select(
        F.col("P").cast("long").alias("n_pos"),
        F.col("N").cast("long").alias("n_neg"),
        auc.alias("auc"),
    )


def confusion_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: Sequence[float],
) -> DataFrame:
    """Per-threshold confusion counts + precision/recall/F1 in ONE
    aggregation pass (every threshold is a conditional count inside
    the same agg — the corpus is scanned once however many operating
    points are probed).  Long format: ``(threshold, tp, fp, fn, tn,
    precision, recall, f1)``; prediction rule is ``score >= t``.
    """
    ts = [float(t) for t in thresholds]
    if not ts:
        raise ValueError("need at least one threshold")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.where(s.isNotNull() & y.isNotNull())
    aggs = []
    for i, t in enumerate(ts):
        pred = s >= F.lit(t)
        aggs += [
            F.sum((pred & (y == 1)).cast("long")).alias(f"__tp{i}"),
            F.sum((pred & (y == 0)).cast("long")).alias(f"__fp{i}"),
            F.sum(((~pred) & (y == 1)).cast("long")).alias(f"__fn{i}"),
            F.sum(((~pred) & (y == 0)).cast("long")).alias(f"__tn{i}"),
        ]
    g = base.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.coalesce(f"__tp{i}", F.lit(0)).alias("tp"),
                F.coalesce(f"__fp{i}", F.lit(0)).alias("fp"),
                F.coalesce(f"__fn{i}", F.lit(0)).alias("fn"),
                F.coalesce(f"__tn{i}", F.lit(0)).alias("tn"),
            )
            for i, t in enumerate(ts)
        ]
    )
    out = g.select(F.explode(rows).alias("s")).select(
        "s.threshold", "s.tp", "s.fp", "s.fn", "s.tn"
    )
    prec = F.try_divide(
        F.col("tp").cast("double"), F.col("tp") + F.col("fp")
    )
    rec = F.try_divide(
        F.col("tp").cast("double"), F.col("tp") + F.col("fn")
    )
    f1 = F.try_divide(2 * prec * rec, prec + rec)
    return out.select(
        "threshold", "tp", "fp", "fn", "tn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability diagram data: equal-WIDTH score bins over [lo, hi]
    with ``(bin, n, avg_score, pos_rate)`` — a calibrated model has
    ``avg_score ≈ pos_rate`` per bin.  One groupBy on the bin id
    (pure-arithmetic bucketing, no quantile pass; scores at ``hi``
    clamp into the last bin).
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got {lo=} {hi=}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.where(
        s.isNotNull() & y.isNotNull() & (s >= lo) & (s <= hi)
    )
    width = (hi - lo) / n_bins
    b = F.least(
        F.floor((s - F.lit(lo)) / F.lit(width)), F.lit(n_bins - 1)
    ).cast("int")
    return (
        base.groupBy(b.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.avg(s).alias("avg_score"),
            F.avg(y.cast("double")).alias("pos_rate"),
        )
    )


def fit_conformal(
    df: DataFrame,
    y_col: str,
    pred_col: str,
    *,
    alpha: float = 0.1,
) -> float:
    """Split-conformal interval half-width: the finite-sample-corrected
    empirical quantile of calibration absolute residuals.

    ``q`` is the ``k``-th smallest ``|y − ŷ|`` with
    ``k = ceil((n + 1)(1 − alpha))`` — the exact order statistic (no
    interpolation: engine-replayable, and the coverage guarantee
    P(y ∈ ŷ ± q) ≥ 1 − alpha needs this discrete form, Vovk et al.).
    Requires ``k <= n`` (i.e. n ≥ (1−alpha)/alpha); raises otherwise —
    too few calibration rows cannot certify the coverage level.
    Null y/pred rows are excluded.

    Scale shape: the order statistic comes from the distinct-residual
    grain ranked with the two-pass prefix sum (``ranks.value_midranks``
    — cum-through-value = midrank + (cnt−1)/2, exact in double), so
    the answer is ``min(value where cum ≥ k)``: one value-grain
    aggregation + one 1-row reduce, never a global sort or a k-row
    driver merge.
    """
    import math

    from .ranks import value_midranks

    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    r = F.abs(
        F.col(y_col).cast("double") - F.col(pred_col).cast("double")
    )
    sub = df.where(r.isNotNull()).select(r.alias("__r"))
    mr = value_midranks(sub, "__r").select(
        "__v",
        (F.col("__rank") + (F.col("__cnt") - 1) / 2.0).alias("__cum"),
    )
    row = mr.agg(
        F.max("__cum").alias("__n"),
    ).first()
    n = int(row["__n"] or 0)
    k = math.ceil((n + 1) * (1.0 - alpha))
    if n == 0 or k > n:
        raise ValueError(
            f"need at least {math.ceil((1 - alpha) / alpha)} calibration"
            f" rows for alpha={alpha}, got {n}"
        )
    got = mr.where(F.col("__cum") >= F.lit(float(k))).agg(
        F.min("__v").alias("__q")
    ).first()
    return float(got["__q"])


def apply_conformal(
    df: DataFrame,
    pred_col: str,
    q: float,
    *,
    lo_col: str = "pi_lo",
    hi_col: str = "pi_hi",
) -> DataFrame:
    """Append the conformal prediction interval ``[ŷ − q, ŷ + q]`` —
    a pure projection (fit on a held-out CALIBRATION split, apply
    anywhere; applying to the calibration rows themselves overstates
    coverage)."""
    p = F.col(pred_col).cast("double")
    return df.withColumn(lo_col, p - F.lit(float(q))).withColumn(
        hi_col, p + F.lit(float(q))
    )
