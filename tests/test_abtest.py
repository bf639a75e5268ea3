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
