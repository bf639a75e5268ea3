"""Binary-model evaluation metrics (operators/evalmetrics.py)."""

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.evalmetrics import (
    binary_auc,
    calibration_bins,
    confusion_report,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, label int")


def _sk_auc(rows):
    # pure-python tie-corrected rank AUC (sklearn-equivalent)
    pairs = sorted((s, y) for s, y in rows if s is not None and y is not None)
    n = len(pairs)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and pairs[j][0] == pairs[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for t in range(i, j):
            ranks[t] = avg
        i = j
    P = sum(y for _, y in pairs)
    N = n - P
    if P == 0 or N == 0:
        return None
    rank_sum = sum(ranks[t] for t, (_, y) in enumerate(pairs) if y == 1)
    return (rank_sum - P * (P + 1) / 2.0) / (P * N)


def test_auc_perfect_and_random(spark):
    perfect = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    r = binary_auc(_scored(spark, perfect), "score", "label").first()
    assert r.auc == pytest.approx(1.0)
    assert (r.n_pos, r.n_neg) == (50, 50)
    inverted = [(float(i), 0 if i >= 50 else 1) for i in range(100)]
    r2 = binary_auc(_scored(spark, inverted), "score", "label").first()
    assert r2.auc == pytest.approx(0.0)


def test_auc_with_ties_matches_reference(spark):
    import random

    rng = random.Random(5)
    rows = [
        (round(rng.random(), 1), rng.randint(0, 1)) for _ in range(300)
    ]  # heavy ties from 1-dp rounding
    got = binary_auc(_scored(spark, rows), "score", "label").first().auc
    assert got == pytest.approx(_sk_auc(rows), rel=1e-12)


def test_auc_degenerate_single_class(spark):
    rows = [(0.3, 1), (0.7, 1)]
    assert binary_auc(_scored(spark, rows), "score", "label").first().auc is None


def _continuous_rows(n=4000, seed=11):
    # deterministic continuous scores: positives shifted up, every
    # score distinct — the shape where the exact lane's window frame
    # degenerates to the row count
    import random

    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        y = 1 if rng.random() < 0.3 else 0
        mu = 0.62 if y else 0.42
        rows.append((min(1.0, max(0.0, rng.gauss(mu, 0.15))), y))
    return rows


class TestSketchBinnedLane:
    """VERDICT r10 item 4: the sketch-binned lane must track the exact
    lane within the documented bound (~1/bins + sketch rank error) on
    continuous scores, while capping the window frame at `bins`."""

    def test_binned_auc_tracks_exact(self, spark):
        rows = _continuous_rows()
        df = _scored(spark, rows)
        exact = binary_auc(df, "score", "label").first().auc
        binned = binary_auc(
            df, "score", "label", score_bins=64
        ).first().auc
        assert exact == pytest.approx(_sk_auc(rows), rel=1e-12)
        assert abs(binned - exact) < 64 ** -1 + 0.005

    def test_binned_pr_auc_tracks_exact(self, spark):
        from pandera_spark.operators.evalmetrics import pr_auc

        rows = _continuous_rows(seed=12)
        df = _scored(spark, rows)
        e = pr_auc(df, "score", "label").first()
        b = pr_auc(df, "score", "label", score_bins=64).first()
        assert (e.n_pos, e.n_neg) == (b.n_pos, b.n_neg)
        assert abs(b.average_precision - e.average_precision) < 0.02

    def test_binned_lane_grain_is_bounded(self, spark):
        # the per-score frame the window runs over must have <= bins
        # rows — assert via the lane's own building block
        from pandera_spark.operators.numeric import sketch_bins

        df = _scored(spark, _continuous_rows(seed=13))
        assert df.select("score").distinct().count() > 1000
        binned = sketch_bins(df, "score", 16, out_col="b")
        assert binned.select("b").distinct().count() <= 16

    def test_binned_perfect_separation_stays_high(self, spark):
        # fully separated classes: at most the one straddling bin can
        # mix, so binned AUC stays within 1/bins of 1.0
        rows = [(float(i) + 0.5, 1 if i >= 500 else 0)
                for i in range(1000)]
        r = binary_auc(
            _scored(spark, rows), "score", "label", score_bins=32
        ).first()
        assert r.auc > 1.0 - 1.0 / 32

    def test_exact_lane_unchanged_by_default(self, spark):
        # default call still runs the exact distinct-score lane
        rows = [(round(i * 0.1, 1) % 1.0, i % 2) for i in range(200)]
        df = _scored(spark, rows)
        assert binary_auc(df, "score", "label").first().auc == \
            pytest.approx(_sk_auc(rows), rel=1e-12)


def test_confusion_report_counts(spark):
    rows = [(0.9, 1), (0.8, 0), (0.4, 1), (0.1, 0)]
    rep = {
        r.threshold: (r.tp, r.fp, r.fn, r.tn, r.precision, r.recall)
        for r in confusion_report(
            _scored(spark, rows), "score", "label", [0.5]
        ).collect()
    }
    tp, fp, fn, tn, prec, rec = rep[0.5]
    assert (tp, fp, fn, tn) == (1, 1, 1, 1)
    assert prec == pytest.approx(0.5) and rec == pytest.approx(0.5)


def test_confusion_single_pass_plan(spark):
    rows = [(0.9, 1), (0.1, 0)]
    df = confusion_report(
        _scored(spark, rows), "score", "label", [0.1, 0.5, 0.9]
    )
    raw = df._jdf.queryExecution().executedPlan().toString()
    assert raw.count("Exchange") == 1  # one single-row agg shuffle
    with pytest.raises(ValueError, match="threshold"):
        confusion_report(_scored(spark, rows), "score", "label", [])


def test_calibration_bins(spark):
    rows = [(0.05, 0), (0.15, 0), (0.95, 1), (0.85, 1), (1.0, 1)]
    out = {
        r.bin: (r.n, r.pos_rate)
        for r in calibration_bins(
            _scored(spark, rows), "score", "label", n_bins=10
        ).collect()
    }
    assert out[0] == (1, 0.0)
    assert out[1] == (1, 0.0)
    assert out[8] == (1, 1.0)
    assert out[9] == (2, 1.0)  # score 1.0 clamps into last bin


def test_fit_conformal_exact_order_statistic(spark):
    import math

    from pandera_spark.operators.evalmetrics import (
        apply_conformal,
        fit_conformal,
    )

    # residuals 1..100 (pred=0, y=i): k = ceil(101*0.9) = 91 -> q = 91
    df = spark.createDataFrame(
        [(float(i), 0.0) for i in range(1, 101)], "y double, p double"
    )
    q = fit_conformal(df, "y", "p", alpha=0.1)
    assert q == 91.0
    # python replay at another alpha
    q2 = fit_conformal(df, "y", "p", alpha=0.25)
    assert q2 == float(math.ceil(101 * 0.75))
    out = apply_conformal(df, "p", q).collect()
    assert all(r.pi_lo == -91.0 and r.pi_hi == 91.0 for r in out)
    # empirical coverage on calibration >= 1 - alpha by construction
    cover = sum(1 for r in out if r.pi_lo <= r.y <= r.pi_hi)
    assert cover / 100 >= 0.9


def test_fit_conformal_ties_and_guards(spark):
    import pytest as _pytest

    from pandera_spark.operators.evalmetrics import fit_conformal

    df = spark.createDataFrame(
        [(5.0, 0.0)] * 30 + [(9.0, 0.0)] * 10 + [(None, 0.0)],
        "y double, p double",
    )
    # n=40, alpha=0.2 -> k = ceil(41*0.8) = 33 -> 33rd smallest = 9.0
    assert fit_conformal(df, "y", "p", alpha=0.2) == 9.0
    with _pytest.raises(ValueError, match="alpha"):
        fit_conformal(df, "y", "p", alpha=1.5)
    tiny = spark.createDataFrame([(1.0, 0.0)], "y double, p double")
    with _pytest.raises(ValueError, match="calibration"):
        fit_conformal(tiny, "y", "p", alpha=0.1)


def test_calibration_summary_hand_computed(spark):
    from pandera_spark.operators.evalmetrics import calibration_summary

    # two bins with known gaps: bin0 scores 0.1/0.2 labels 0,1;
    # bin1 scores 0.8/0.9 labels 1,1
    rows = [(0.1, 0), (0.2, 1), (0.8, 1), (0.9, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = calibration_summary(df, "score", "label", n_bins=2).first()
    brier = ((0.1 - 0) ** 2 + (0.2 - 1) ** 2 + (0.8 - 1) ** 2
             + (0.9 - 1) ** 2) / 4
    gap0 = abs(0.15 - 0.5)
    gap1 = abs(0.85 - 1.0)
    ece = (2 * gap0 + 2 * gap1) / 4
    assert out["brier"] == pytest.approx(brier, abs=1e-12)
    assert out["ece"] == pytest.approx(ece, abs=1e-12)
    assert out["mce"] == pytest.approx(max(gap0, gap1), abs=1e-12)
    assert out["n"] == 4


def test_calibration_summary_perfect_model(spark):
    from pandera_spark.operators.evalmetrics import calibration_summary

    rows = [(0.0, 0)] * 10 + [(1.0, 1)] * 10
    df = spark.createDataFrame(rows, "score double, label int")
    out = calibration_summary(df, "score", "label").first()
    assert out["brier"] == pytest.approx(0.0)
    assert out["ece"] == pytest.approx(0.0)
