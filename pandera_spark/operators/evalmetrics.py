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
    "pr_auc",
    "confusion_report",
    "calibration_bins",
    "fit_conformal",
    "apply_conformal",
    "cohen_kappa",
    "fleiss_kappa",
    "isotonic_calibrate",
    "ranking_metrics",
    "calibration_summary",
    "lift_table",
]


def _score_grain(base: DataFrame, s, score_bins, accuracy):
    """Shared lane dispatch for :func:`binary_auc` / :func:`pr_auc`:
    ``score_bins=None`` keeps the exact distinct-score grain;
    ``score_bins=b`` first replaces the score with its equi-depth
    sketch-bin id (``numeric.sketch_bins``: ONE mergeable GK percentile
    aggregate broadcast as a 1-row edges frame, then a pure
    projection), capping the cumulative window at ``b`` rows no matter
    how continuous the score is.  The bin id is monotone in the score,
    so ranks are preserved up to within-bin ties.
    """
    flat = base.select(s.alias("__s"), F.col("__y"))
    if score_bins is None:
        return flat, F.col("__s")
    from .numeric import sketch_bins

    binned = sketch_bins(
        flat, "__s", int(score_bins), accuracy=accuracy, out_col="__sb"
    )
    return binned, F.col("__sb").cast("double")


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    score_bins: "int | None" = None,
    accuracy: int = 10000,
) -> DataFrame:
    """One row ``(n_pos, n_neg, auc)``.

    Tie-corrected rank AUC on the distinct-score grain: per distinct
    score count positives/negatives (ONE shuffle, map-side collapsed),
    then average ranks from a cumulative window over the distinct
    scores.  Rows with a null score or label are excluded.  AUC is
    null when either class is empty.

    The exact lane's window frame is the DISTINCT-score grain — fine
    for integer or otherwise low-cardinality scores, but a continuous
    64-bit score makes that grain ~ the row count and the single-task
    cumulative window the bottleneck.  For that case pass
    ``score_bins=b``: scores first collapse to ``b`` equi-depth
    sketch bins (``numeric.sketch_bins``), and the window runs over at
    most ``b`` rows.  Accuracy: within-bin opposite-class pairs score
    as ties (0.5), so ``|auc_binned − auc_exact|`` is bounded by half
    the fraction of opposite-class pairs sharing a bin (≈ ``1/b`` for
    a well-spread score) plus the GK sketch rank error
    (``n/accuracy`` rows per edge).  BASELINE §3.28 records the
    measured gap on the contract fixtures.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.where(s.isNotNull() & y.isNotNull()).withColumn(
        "__y", y
    )
    grain, v = _score_grain(base, s, score_bins, accuracy)
    yy = F.col("__y")
    per_score = grain.groupBy(v.alias("v")).agg(
        F.sum(yy).cast("long").alias("p"),
        F.sum(1 - yy).cast("long").alias("n"),
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
    # ONE action: the 1-row n-frame rides back in as a broadcast and the
    # threshold k = ceil((n+1)(1-alpha)) is computed in-plan (bit-identical
    # to the former driver-side math.ceil over the same doubles), so the
    # former two sequential .first() probes — each recomputing the whole
    # midrank pipeline — collapse into one job whose mr subtrees share
    # their exchanges (ReuseExchange).  The grain never collapses to one
    # task: both sides stay the range-partitioned distinct-residual frame.
    nfr = mr.agg(F.max("__cum").alias("__n"))
    thr = F.ceil(
        (F.col("__n") + F.lit(1.0)) * F.lit(1.0 - alpha)
    ).cast("double")
    row = (
        mr.crossJoin(F.broadcast(nfr))
        .agg(
            F.max("__n").alias("__n"),
            F.min(
                F.when(F.col("__cum") >= thr, F.col("__v"))
            ).alias("__q"),
        )
        .first()
    )
    n = int(row["__n"] or 0)
    k = math.ceil((n + 1) * (1.0 - alpha))
    if n == 0 or k > n:
        raise ValueError(
            f"need at least {math.ceil((1 - alpha) / alpha)} calibration"
            f" rows for alpha={alpha}, got {n}"
        )
    return float(row["__q"])


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


def cohen_kappa(
    df: DataFrame, rater_a: str, rater_b: str
) -> DataFrame:
    """Cohen's kappa agreement between two categorical labelings of
    the same rows: one row ``(n, observed_agreement,
    expected_agreement, kappa)``.

    ``κ = (p_o − p_e)/(1 − p_e)`` with ``p_e = Σ_c p_a(c)·p_b(c)``
    from the marginal label distributions.  The standard QA readout
    for double-annotated training data (two annotators, a model vs a
    gold column, two heuristic filters).  Rows where either label is
    null drop; kappa is null when ``p_e = 1`` (both raters constant).

    Plan shape: ONE shuffle to the (label_a, label_b) confusion grain
    (map-side combined — at most |A|·|B| cells), marginals and the
    diagonal from a second tiny aggregate over the cells.
    """
    a = F.col(rater_a).cast("string")
    b = F.col(rater_b).cast("string")
    cells = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )
    # p_e = sum over labels c of rowmarg(c) * colmarg(c) / n^2: join
    # the two marginals on the label value
    ma = cells.groupBy(F.col("__a").alias("__l")).agg(
        F.sum("__c").alias("__ra")
    )
    mb = cells.groupBy(F.col("__b").alias("__l")).agg(
        F.sum("__c").alias("__rb")
    )
    pe_frame = ma.join(mb, "__l").agg(
        F.sum(F.col("__ra") * F.col("__rb")).alias("__pe_num")
    )
    tot = cells.agg(
        F.sum("__c").alias("__n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))
              .otherwise(F.lit(0.0))).alias("__agree"),
    )
    out = tot.crossJoin(F.broadcast(pe_frame))
    n = F.col("__n")
    po = F.col("__agree") / n
    pe = F.col("__pe_num") / (n * n)
    return out.select(
        n.cast("long").alias("n"),
        po.alias("observed_agreement"),
        pe.alias("expected_agreement"),
        F.try_divide(po - pe, F.lit(1.0) - pe).alias("kappa"),
    )


def fleiss_kappa(
    df: DataFrame, item_col: str, label_col: str
) -> DataFrame:
    """Fleiss' kappa for n raters per item (long format: one row per
    (item, rating); rater identity irrelevant).  One row:
    ``(n_items, n_ratings, p_bar, p_e, kappa)``.

    Requires the SAME number of ratings per item (the classic Fleiss
    formulation) — items with a deviating count are dropped and the
    modal count used, so partially-annotated batches don't poison the
    statistic; ``n_items`` reports what was kept.

    Plan shape: (item, label) cell counts in one shuffle, per-item
    agreement ``Σ n_ij(n_ij−1)/(n(n−1))`` from a second grouped pass,
    label marginals from a third tiny aggregate over cells.
    """
    cells = (
        df.where(
            F.col(item_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(
            F.col(item_col).alias("__i"),
            F.col(label_col).cast("string").alias("__l"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )
    per_item = cells.groupBy("__i").agg(
        F.sum("__c").alias("__n"),
        F.sum(F.col("__c") * (F.col("__c") - 1)).alias("__agree"),
    )
    modal = (
        per_item.groupBy("__n").agg(F.count(F.lit(1)).alias("__k"))
        .orderBy(F.col("__k").desc(), F.col("__n").desc())
        .limit(1)
        .select(F.col("__n").alias("__nr"))
    )
    kept = per_item.join(
        F.broadcast(modal), per_item["__n"] == F.col("__nr")
    ).where(F.col("__nr") >= 2)
    pbar_frame = kept.agg(
        F.count(F.lit(1)).cast("double").alias("__items"),
        F.first("__nr").alias("__nper"),
        F.avg(
            F.col("__agree") / (F.col("__nr") * (F.col("__nr") - 1))
        ).alias("__pbar"),
    )
    marg = (
        cells.join(kept.select("__i"), "__i")  # cells of kept items only
        .groupBy("__l")
        .agg(F.sum("__c").alias("__cl"))
    )
    pe_frame = marg.agg(
        F.sum(F.col("__cl") * F.col("__cl")).alias("__pe_num"),
        F.sum("__cl").alias("__tot"),
    )
    out = pbar_frame.crossJoin(F.broadcast(pe_frame))
    pe = F.col("__pe_num") / (F.col("__tot") * F.col("__tot"))
    pbar = F.col("__pbar")
    return out.select(
        F.col("__items").cast("long").alias("n_items"),
        F.col("__nper").cast("long").alias("n_ratings"),
        pbar.alias("p_bar"),
        pe.alias("p_e"),
        F.try_divide(pbar - pe, F.lit(1.0) - pe).alias("kappa"),
    )


def isotonic_calibrate(
    scores: DataFrame,
    score_col: str,
    label_col: str,
    *,
    by: Sequence[str] = (),
) -> DataFrame:
    """Isotonic (PAV) calibration curve per ``by`` group: the
    monotone step function mapping scores to calibrated probabilities
    that minimizes squared error — the standard non-parametric
    recalibration for filter/quality models whose scores rank well
    but aren't probabilities.

    Returns one row per pooled block: ``(*by, score_lo, score_hi,
    n, calibrated_p)`` — apply with a range join / ``asof_join`` on
    ``score_lo``.

    Implementation: the corpus first collapses to the DISTINCT-SCORE
    grain (one shuffle — same pattern as :func:`binary_auc`), then the
    pool-adjacent-violators sweep runs per group inside ONE
    Arrow-batched ``applyInPandas`` (PAV is inherently sequential —
    O(d) on the d distinct scores, which is bounded by score
    precision, NOT corpus size; round scores first for truly
    continuous columns).
    """
    import pandas as pd

    by = list(by)
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    grain = (
        scores.where(s.isNotNull() & y.isNotNull())
        .groupBy(*[F.col(k) for k in by], s.alias("__s"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.sum(y).alias("__sum"),
        )
    )
    if not by:
        grain = grain.withColumn("__g", F.lit(1))
        group_cols = ["__g"]
    else:
        group_cols = by

    out_fields = ", ".join(
        f"`{k}` {t}" for k, t in zip(
            by,
            [dict(grain.dtypes)[k] for k in by],
        )
    )
    schema = (
        (out_fields + ", " if out_fields else "")
        + "score_lo double, score_hi double, n long, calibrated_p double"
    )

    def _pav(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("__s").reset_index(drop=True)
        # blocks: [score_lo, score_hi, weight, value_sum].  Violation
        # compare is cross-multiplied (s1/w1 >= s2/w2 <=> s1*w2 >=
        # s2*w1 for positive weights) — EXACT in doubles whenever
        # weights and sums are integers (0/1 labels), so the block
        # structure is replayable by the SQL minimax oracle; the mean
        # is one division at output time, never cascaded.  The sweep
        # walks plain numpy arrays (the iterrows() form cost ~10× per
        # batch for identical output).
        vs = pdf["__s"].to_numpy(dtype=float)
        ns = pdf["__n"].to_numpy(dtype=float)
        ss = pdf["__sum"].to_numpy(dtype=float)
        blocks: list[list[float]] = []
        for i in range(len(vs)):
            blocks.append([vs[i], vs[i], ns[i], ss[i]])
            while (
                len(blocks) >= 2
                and blocks[-2][3] * blocks[-1][2]
                >= blocks[-1][3] * blocks[-2][2]
            ):
                _, hi2, w2, s2 = blocks.pop()
                lo1, _, w1, s1 = blocks.pop()
                blocks.append([lo1, hi2, w1 + w2, s1 + s2])
        rows = []
        keyvals = {k: pdf[k].iloc[0] for k in by}
        for lo, hi, w, s in blocks:
            rows.append({
                **keyvals, "score_lo": lo, "score_hi": hi,
                "n": int(w), "calibrated_p": s / w,
            })
        return pd.DataFrame(rows)

    return grain.groupBy(*group_cols).applyInPandas(_pav, schema=schema)


def ranking_metrics(
    df: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    *,
    k: int = 10,
) -> DataFrame:
    """Offline search/retrieval evaluation over a ranked-results frame
    (one row per (query, result) with a 1-based rank and a graded
    relevance): one summary row ``(n_queries, mrr, ndcg, recall,
    precision)`` with every metric cut at ``k``.

    - ``MRR`` — mean over queries of ``1/rank`` of the first relevant
      (rel > 0) result within the cut (0 when none);
    - ``NDCG@k`` — ``Σ (2^rel − 1)/log2(rank+1)`` normalized by the
      ideal DCG of the query's OWN relevance multiset (ideal ranking =
      its relevances sorted descending, cut at k);
    - ``recall@k`` — relevant-in-cut / relevant-anywhere-in-frame;
    - ``precision@k`` — relevant-in-cut / k.

    Plan shape: ONE shuffle to the query grain.  The in-cut
    aggregates are conditional sums; the ideal-DCG denominator uses a
    rank-over-relevance window INSIDE the same query partition (no
    second shuffle — both windows and the final groupBy share the
    query-key partitioning).  Queries with zero relevant results
    anywhere contribute to precision/MRR but drop from the
    recall/NDCG means (0/0).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    q = F.col(query_col)
    r = F.col(rank_col).cast("int")
    rel = F.coalesce(F.col(rel_col).cast("double"), F.lit(0.0))
    base = df.where(q.isNotNull() & r.isNotNull()).select(
        q.alias("__q"), r.alias("__r"), rel.alias("__rel")
    )
    ideal_rank = F.row_number().over(
        Window.partitionBy("__q").orderBy(
            F.col("__rel").desc(), F.col("__r")
        )
    )
    gain = (F.pow(F.lit(2.0), F.col("__rel")) - 1.0)
    in_cut = F.col("__r") <= k
    tagged = base.withColumn("__irank", ideal_rank)
    per_q = tagged.groupBy("__q").agg(
        F.min(F.when(in_cut & (F.col("__rel") > 0), F.col("__r")))
        .alias("__first_rel"),
        F.sum(F.when(
            in_cut, gain / F.log2(F.col("__r") + F.lit(1.0))
        ).otherwise(F.lit(0.0))).alias("__dcg"),
        F.sum(F.when(
            F.col("__irank") <= k,
            gain / F.log2(F.col("__irank") + F.lit(1.0)),
        ).otherwise(F.lit(0.0))).alias("__idcg"),
        F.sum((in_cut & (F.col("__rel") > 0)).cast("long"))
        .alias("__rel_in_cut"),
        F.sum((F.col("__rel") > 0).cast("long")).alias("__rel_total"),
    )
    rr = F.coalesce(
        F.lit(1.0) / F.col("__first_rel").cast("double"), F.lit(0.0)
    )
    ndcg = F.when(
        F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg")
    )
    recall = F.when(
        F.col("__rel_total") > 0,
        F.col("__rel_in_cut").cast("double") / F.col("__rel_total"),
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.avg(rr).alias("mrr"),
        F.avg(ndcg).alias("ndcg"),
        F.avg(recall).alias("recall"),
        F.avg(F.col("__rel_in_cut").cast("double") / F.lit(float(k)))
        .alias("precision"),
    )


def calibration_summary(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """One-row calibration scorecard for a probabilistic filter model:
    ``(n, brier, ece, mce)`` — the Brier score ``mean((p − y)²)`` from
    one scan, and the expected / maximum calibration errors
    ``Σ (n_b/n)·|p̄_b − ȳ_b|`` / ``max_b |p̄_b − ȳ_b|`` over the same
    equal-width bins as :func:`calibration_bins`.

    Two tiny aggregations (row scan for Brier + bin grain for
    ECE/MCE), both map-side combined; scores outside [lo, hi] are
    excluded like :func:`calibration_bins`.
    """
    bins = calibration_bins(
        df, score_col, label_col, n_bins=n_bins, lo=lo, hi=hi
    )
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.where(
        s.isNotNull() & y.isNotNull() & (s >= lo) & (s <= hi)
    )
    brier = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg((s - y.cast("double"))
              * (s - y.cast("double"))).alias("brier"),
    )
    gap = F.abs(F.col("avg_score") - F.col("pos_rate"))
    ece = bins.agg(
        F.sum(F.col("n") * gap).alias("__wgap"),
        F.sum("n").alias("__n"),
        F.max(gap).alias("mce"),
    ).select(
        (F.col("__wgap") / F.col("__n")).alias("ece"),
        "mce",
    )
    return brier.crossJoin(F.broadcast(ece)).select(
        "n", "brier", "ece", "mce"
    )


def pr_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    score_bins: "int | None" = None,
    accuracy: int = 10000,
) -> DataFrame:
    """One row ``(n_pos, n_neg, prevalence, average_precision)``.

    Average precision (the step-interpolated area under the
    precision-recall curve, sklearn's ``average_precision_score``
    convention): thresholds at every DISTINCT score descending,
    ``AP = Σ_t (R_t − R_{t−1}) · P_t`` with tie groups entering as one
    threshold.  The right headline for rare-positive filter models,
    where ROC-AUC saturates (compare ``prevalence`` — the
    always-positive baseline — not 0.5).

    Same scale shape as :func:`binary_auc`: ONE shuffle collapses to
    the distinct-score grain, one cumulative window over that bounded
    frame, one closing fold.  Every input to the statistic is an
    integer count, so an external SQL engine replays it exactly.
    Rows with a null score or label drop; AP is null when there are
    no positives.

    ``score_bins`` enables the same sketch-binned lane as
    :func:`binary_auc` (see there for the error bound): thresholds
    become the ``b`` equi-depth bin boundaries, each bin one tie
    group, capping the cumulative window at ``b`` rows for continuous
    scores.  Default stays the exact distinct-score lane.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.where(s.isNotNull() & y.isNotNull()).withColumn(
        "__y", y
    )
    grain, v = _score_grain(base, s, score_bins, accuracy)
    yy = F.col("__y")
    per_score = grain.groupBy(v.alias("v")).agg(
        F.sum(yy).cast("long").alias("p"),
        F.sum(1 - yy).cast("long").alias("n"),
    )
    w = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_score.select(
        "p",
        F.sum("p").over(w).alias("tp"),
        (F.sum(F.col("p") + F.col("n")).over(w)).alias("pp"),
    )
    agg = cum.agg(
        F.sum("p").cast("long").alias("P"),
        F.sum(
            F.col("p").cast("double") * F.col("tp") / F.col("pp")
        ).alias("__ap_num"),
        F.max("pp").cast("long").alias("__total"),
    )
    P = F.col("P").cast("double")
    total = F.col("__total").cast("double")
    return agg.select(
        F.col("P").cast("long").alias("n_pos"),
        (F.col("__total") - F.col("P")).cast("long").alias("n_neg"),
        F.try_divide(P, total).alias("prevalence"),
        F.when(F.col("P") > 0, F.col("__ap_num") / P)
        .alias("average_precision"),
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Decile (``n_bins``-tile) lift / gain table — the campaign-
    targeting readout: "if I act on the top k score-bins, what share
    of positives do I capture (gain) and how much better than random
    am I (lift)?".

    One row per populated score bin, TOP SCORES FIRST (``tier`` 1 is
    the highest-score bin): ``tier, n, n_pos, pos_rate, lift, cum_n,
    cum_pos, cum_gain, cum_lift`` where ``lift = pos_rate /
    overall_rate``, ``cum_gain = cum_pos / total_pos`` and
    ``cum_lift = (cum_pos/cum_n) / overall_rate``.

    Bins are equi-depth by score via :func:`~pandera_spark.operators.
    numeric.sketch_bins` (ONE percentile aggregate broadcast as a
    1-row edges frame; GK sketch by default, ``exact=True`` for the
    interpolated percentile_cont edges) — NOT ``ntile``, whose global
    window is a single task at scale.  Tied scores land whole in one
    bin, so bin populations are equal only up to tie mass; the
    cumulative columns are exact for the realized binning either way.
    One data shuffle (the bin groupBy); the windows run on the
    ≤``n_bins``-row frame.  Rows with NULL score or label drop; all
    counts integer, so an external SQL engine replays the table
    exactly when ``exact=True``.
    """
    from .numeric import sketch_bins

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.where(s.isNotNull() & y.isNotNull()).select(
        s.alias("__s"), y.alias("__y")
    )
    binned = sketch_bins(
        base, "__s", int(n_bins), exact=exact,
        accuracy=accuracy, out_col="__bin",
    )
    per = binned.groupBy("__bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("n_pos"),
    )
    # top scores first: highest bin id = highest scores = tier 1
    wcum = Window.orderBy(F.col("__bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy()
    total_n = F.sum("n").over(wtot).cast("double")
    total_pos = F.sum("n_pos").over(wtot).cast("double")
    overall = F.try_divide(total_pos, total_n)
    cum_n = F.sum("n").over(wcum).cast("long")
    cum_pos = F.sum("n_pos").over(wcum).cast("long")
    pos_rate = F.try_divide(F.col("n_pos").cast("double"), F.col("n"))
    return per.select(
        F.row_number().over(Window.orderBy(F.col("__bin").desc()))
        .cast("long").alias("tier"),
        "n", "n_pos",
        pos_rate.alias("pos_rate"),
        F.try_divide(pos_rate, overall).alias("lift"),
        cum_n.alias("cum_n"),
        cum_pos.alias("cum_pos"),
        F.try_divide(cum_pos.cast("double"), total_pos)
        .alias("cum_gain"),
        F.try_divide(
            F.try_divide(cum_pos.cast("double"), cum_n), overall
        ).alias("cum_lift"),
    )
