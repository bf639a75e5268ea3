"""A/B readouts: two-proportion z-test, CUPED — python-replay
differentials and known cases."""

import math

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.abtest import cuped_adjust, proportion_ztest


def test_proportion_ztest_known_counts(spark):
    # A: 40/200 convert; B: 25/200
    rows = (
        [("A", True)] * 40 + [("A", False)] * 160
        + [("B", True)] * 25 + [("B", False)] * 175
    )
    df = spark.createDataFrame(rows, "g string, s boolean")
    r = proportion_ztest(df, "g", "A", "B", F.col("s")).first()
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (200, 200, 40, 25)
    assert r.p_a == pytest.approx(0.2) and r.p_b == pytest.approx(0.125)
    assert r.lift == pytest.approx(0.075)
    p = 65 / 400
    se = math.sqrt(p * (1 - p) * (1 / 200 + 1 / 200))
    assert r.z == pytest.approx(0.075 / se, rel=1e-12)
    assert 0 < r.pvalue < 0.05  # z ~ 2.07


def test_proportion_ztest_null_success_and_degenerate(spark):
    df = spark.createDataFrame(
        [("A", None), ("A", True), ("B", True)], "g string, s boolean"
    )
    r = proportion_ztest(df, "g", "A", "B", F.col("s")).first()
    assert r.conv_a == 1  # null success counts as false
    # pooled p == 2/3, fine; degenerate: all success -> se 0 -> null z
    allwin = spark.createDataFrame(
        [("A", True), ("B", True)], "g string, s boolean"
    )
    rz = proportion_ztest(allwin, "g", "A", "B", F.col("s")).first()
    assert rz.z is None and rz.pvalue is None


def test_proportion_ztest_empty_group_null_z(spark):
    df = spark.createDataFrame([("A", True)], "g string, s boolean")
    r = proportion_ztest(df, "g", "A", "B", F.col("s")).first()
    assert r.n_b == 0 and r.z is None


def _cuped_py(rows, a="A"):
    ys = [y for _, y, _ in rows]
    xs = [x for _, _, x in rows]
    n = len(rows)
    my, mx = sum(ys) / n, sum(xs) / n
    cov = sum((y - my) * (x - mx) for _, y, x in rows) / (n - 1)
    vx = sum((x - mx) ** 2 for x in xs) / (n - 1)
    vy = sum((y - my) ** 2 for y in ys) / (n - 1)
    theta = cov / vx
    rho = cov / math.sqrt(vx * vy)
    out = {}
    for g in ("A", "B"):
        gy = [y for gg, y, _ in rows if gg == g]
        gx = [x for gg, _, x in rows if gg == g]
        out[g] = (
            sum(gy) / len(gy) - theta * (sum(gx) / len(gx) - mx),
            sum(gy) / len(gy),
        )
    return theta, rho, vy, out


def test_cuped_matches_python_replay(spark):
    # covariate x strongly predicts y; treatment adds +2 to A
    rows = []
    for i in range(60):
        x = float(i % 13)
        noise = ((i * 7) % 5 - 2) * 0.1
        g = "A" if i % 2 == 0 else "B"
        y = 3.0 * x + noise + (2.0 if g == "A" else 0.0)
        rows.append((g, y, x))
    df = spark.createDataFrame(rows, "g string, y double, x double")
    r = cuped_adjust(df, "y", "x", "g", "A", "B").first()
    theta, rho, vy, out = _cuped_py(rows)
    assert r.theta == pytest.approx(theta, rel=1e-9)
    assert r.rho == pytest.approx(rho, rel=1e-9)
    assert r.adj_mean_a == pytest.approx(out["A"][0], rel=1e-9)
    assert r.adj_mean_b == pytest.approx(out["B"][0], rel=1e-9)
    assert r.mean_a == pytest.approx(out["A"][1], rel=1e-9)
    # the adjustment should recover ~the true +2 effect and the
    # covariate removes most variance
    assert r.adj_diff == pytest.approx(2.0, abs=0.35)
    assert r.var_reduction > 0.8
    assert r.pvalue < 0.01


def test_cuped_uncorrelated_covariate_changes_little(spark):
    rows = []
    for i in range(80):
        g = "A" if i % 2 == 0 else "B"
        y = float((i * 11) % 17)
        x = float(i % 2)  # unrelated to y pattern? deterministic enough
        rows.append((g, y + (1.0 if g == "A" else 0.0), x))
    df = spark.createDataFrame(rows, "g string, y double, x double")
    r = cuped_adjust(df, "y", "x", "g", "A", "B").first()
    assert r.var_reduction < 0.5
    assert r.adj_diff == pytest.approx(r.diff, abs=1.0)


def test_cuped_null_rows_excluded_and_constant_covariate(spark):
    df = spark.createDataFrame(
        [("A", 1.0, 2.0), ("A", None, 1.0), ("B", 2.0, None),
         ("B", 3.0, 2.0), ("A", 2.0, 2.0)],
        "g string, y double, x double",
    )
    r = cuped_adjust(df, "y", "x", "g", "A", "B").first()
    assert r.n_a == 2 and r.n_b == 1
    # constant covariate: vx = 0 -> theta null (ANSI-safe), not a crash
    assert r.theta is None


def test_abtest_plans_single_aggregation_no_shuffle_join(spark):
    from pandera_spark.audit import plan_report

    df = spark.createDataFrame(
        [("A", 1.0, 2.0, True), ("B", 2.0, 1.0, False)],
        "g string, y double, x double, s boolean",
    )
    for frame in (
        proportion_ztest(df, "g", "A", "B", F.col("s")),
        cuped_adjust(df, "y", "x", "g", "A", "B"),
    ):
        rep = plan_report(frame)
        assert rep["cartesian_products"] == 0
        assert rep["broadcast_nested_loop_joins"] == 0
        assert rep["sort_merge_joins"] == 0
        assert rep["exchanges"] <= 1  # one global aggregate exchange


def _ratio_py(rows, a="A"):
    """Local delta-method replay: rows = (group, unit, num, den)."""
    import math
    from collections import defaultdict

    sums = defaultdict(lambda: [0.0, 0.0])
    for g, u, n, d in rows:
        if u is None or g not in ("A", "B"):
            continue
        sums[(g, u)][0] += n or 0.0
        sums[(g, u)][1] += d or 0.0
    out = {}
    for g in ("A", "B"):
        pts = [v for (gg, _), v in sums.items() if gg == g]
        k = len(pts)
        mn = sum(p[0] for p in pts) / k
        md = sum(p[1] for p in pts) / k
        vn = sum((p[0] - mn) ** 2 for p in pts) / (k - 1)
        vd = sum((p[1] - md) ** 2 for p in pts) / (k - 1)
        cnd = sum((p[0] - mn) * (p[1] - md) for p in pts) / (k - 1)
        r = mn / md
        var = (vn - 2 * r * cnd + r * r * vd) / (k * md * md)
        out[g] = (k, r, var)
    diff = out["A"][1] - out["B"][1]
    se = math.sqrt(out["A"][2] + out["B"][2])
    return out, diff, se


def test_ratio_metric_matches_python_replay(spark):
    import numpy as np

    from pandera_spark.operators.abtest import ratio_metric_ztest

    rng = np.random.RandomState(11)
    rows = []
    for u in range(60):
        g = "A" if u % 2 == 0 else "B"
        for _ in range(int(rng.randint(1, 6))):
            rows.append((
                g, u,
                float(rng.uniform(0, 10)) + (1.0 if g == "A" else 0.0),
                1.0,
            ))
    df = spark.createDataFrame(
        rows, "g string, unit long, num double, den double"
    )
    out = ratio_metric_ztest(
        df, "g", "A", "B", F.col("num"), F.col("den"), "unit"
    ).first()
    local, diff, se = _ratio_py(rows)
    assert out["k_a"] == local["A"][0] and out["k_b"] == local["B"][0]
    assert out["ratio_a"] == pytest.approx(local["A"][1], abs=1e-12)
    assert out["ratio_b"] == pytest.approx(local["B"][1], abs=1e-12)
    assert out["diff"] == pytest.approx(diff, abs=1e-12)
    assert out["se"] == pytest.approx(se, rel=1e-10)
    assert out["z"] == pytest.approx(diff / se, rel=1e-10)
    assert 0.0 <= out["pvalue"] <= 1.0


def test_ratio_metric_null_handling_and_degenerate(spark):
    from pandera_spark.operators.abtest import ratio_metric_ztest

    # B has a single unit -> var undefined -> null z/p
    rows = [
        ("A", 1, 2.0, 1.0), ("A", 2, 4.0, 1.0), ("A", 3, None, 1.0),
        ("B", 9, 5.0, 1.0),
        ("C", 4, 99.0, 1.0), ("A", None, 99.0, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "g string, unit long, num double, den double"
    )
    out = ratio_metric_ztest(
        df, "g", "A", "B", F.col("num"), F.col("den"), "unit"
    ).first()
    assert out["k_a"] == 3 and out["k_b"] == 1  # C and null-unit dropped
    assert out["ratio_a"] == pytest.approx(2.0)  # (2+4+0)/3
    assert out["ratio_b"] == pytest.approx(5.0)
    assert out["se"] is None and out["z"] is None and out["pvalue"] is None


def test_ratio_metric_unit_clustering_widens_se(spark):
    """Duplicating a unit's rows must NOT shrink the standard error
    (the whole point of unit-grain variance)."""
    from pandera_spark.operators.abtest import ratio_metric_ztest

    base = []
    for u in range(40):
        g = "A" if u % 2 == 0 else "B"
        base.append((g, u, float(u % 7) + 1.0, 1.0))
    df1 = spark.createDataFrame(
        base, "g string, unit long, num double, den double"
    )
    # same data, every row split into two half-weight rows
    split = [(g, u, n / 2, d / 2) for g, u, n, d in base for _ in (0, 1)]
    df2 = spark.createDataFrame(
        split, "g string, unit long, num double, den double"
    )
    a = ratio_metric_ztest(
        df1, "g", "A", "B", F.col("num"), F.col("den"), "unit"
    ).first()
    b = ratio_metric_ztest(
        df2, "g", "A", "B", F.col("num"), F.col("den"), "unit"
    ).first()
    assert a["se"] == pytest.approx(b["se"], rel=1e-12)
    assert a["ratio_a"] == pytest.approx(b["ratio_a"], rel=1e-12)
