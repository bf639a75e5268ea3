"""Rank-based screens: midranks, Mann-Whitney U, Kruskal-Wallis,
Spearman — differential vs pure-python replays."""

import math

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.ranks import (
    kruskal_wallis,
    mann_whitney_u,
    spearman_corr,
    value_midranks,
)


def _py_midranks(values):
    """value -> average 1-based rank of its ties."""
    s = sorted(values)
    out = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        out[s[i]] = (i + 1 + j) / 2.0
        i = j
    return out


def _py_mw(a, b):
    ranks = _py_midranks(a + b)
    n_a, n_b, n = len(a), len(b), len(a) + len(b)
    r_a = sum(ranks[v] for v in a)
    u_a = r_a - n_a * (n_a + 1) / 2.0
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(a + b).values())
    sigma2 = n_a * n_b / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2.0) / math.sqrt(sigma2) if sigma2 > 0 else None
    return u_a, z


def test_value_midranks_matches_python(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["__v"]: r["__rank"]
        for r in value_midranks(df, "x", num_partitions=4).collect()
    }
    assert got == _py_midranks(vals)
    # counts are the tie sizes
    cnts = {
        r["__v"]: r["__cnt"]
        for r in value_midranks(df, "x", num_partitions=4).collect()
    }
    assert cnts[5.0] == 3 and cnts[1.0] == 2 and cnts[9.0] == 1


def test_value_midranks_weighted_equals_exploded(spark):
    rows = [(1.0, 3), (2.0, 1), (2.5, 4), (7.0, 2)]
    wdf = spark.createDataFrame(rows, "x double, w long")
    exploded = spark.createDataFrame(
        [(v,) for v, w in rows for _ in range(w)], "x double"
    )
    got_w = {
        (r["__v"], r["__cnt"], r["__rank"])
        for r in value_midranks(
            wdf, "x", weight_col="w", num_partitions=3
        ).collect()
    }
    got_e = {
        (r["__v"], r["__cnt"], r["__rank"])
        for r in value_midranks(exploded, "x", num_partitions=3).collect()
    }
    assert got_w == got_e


def test_mann_whitney_matches_python_replay(spark):
    a = [1.1, 2.0, 2.0, 3.5, 4.0, 7.2, 2.0, 9.9]
    b = [2.0, 5.5, 6.1, 6.1, 8.0, 3.5, 10.0]
    df = spark.createDataFrame(
        [("A", v) for v in a] + [("B", v) for v in b],
        "g string, x double",
    )
    row = mann_whitney_u(df, "x", "g", "A", "B", num_partitions=3).first()
    u_a, z = _py_mw(a, b)
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["u_a"] == pytest.approx(u_a)
    assert row["u_b"] == pytest.approx(len(a) * len(b) - u_a)
    assert row["z"] == pytest.approx(z, rel=1e-12)
    # two-sided normal p, A&S polynomial: sanity bounds + symmetry
    assert 0 < row["pvalue"] < 1
    rev = mann_whitney_u(df, "x", "g", "B", "A", num_partitions=3).first()
    assert rev["z"] == pytest.approx(-row["z"], rel=1e-12)
    assert rev["pvalue"] == pytest.approx(row["pvalue"], rel=1e-9)


def test_mann_whitney_no_effect_and_strong_effect(spark):
    same = spark.createDataFrame(
        [("A", float(i % 10)) for i in range(50)]
        + [("B", float(i % 10)) for i in range(50)],
        "g string, x double",
    )
    r = mann_whitney_u(same, "x", "g", "A", "B").first()
    assert abs(r["z"]) < 1e-9 and r["pvalue"] == pytest.approx(1.0)
    shifted = spark.createDataFrame(
        [("A", float(i)) for i in range(30)]
        + [("B", float(i + 100)) for i in range(30)],
        "g string, x double",
    )
    r2 = mann_whitney_u(shifted, "x", "g", "A", "B").first()
    assert r2["u_a"] == 0.0  # complete separation
    assert r2["pvalue"] < 1e-6


def test_mann_whitney_degenerate_all_tied(spark):
    df = spark.createDataFrame(
        [("A", 5.0)] * 4 + [("B", 5.0)] * 4, "g string, x double"
    )
    r = mann_whitney_u(df, "x", "g", "A", "B").first()
    assert r["z"] is None  # sigma = 0 -> null, not a crash (ANSI-safe)


def test_kruskal_wallis_textbook_and_mw_consistency(spark):
    # k=2 Kruskal-Wallis is equivalent to two-sided Mann-Whitney:
    # H_corrected == z^2 (both tie-corrected)
    a = [1.1, 2.0, 2.0, 3.5, 4.0, 7.2, 2.0, 9.9]
    b = [2.0, 5.5, 6.1, 6.1, 8.0, 3.5, 10.0]
    df = spark.createDataFrame(
        [("A", v) for v in a] + [("B", v) for v in b],
        "g string, x double",
    )
    kw = kruskal_wallis(df, "x", "g", num_partitions=3).first()
    mw = mann_whitney_u(df, "x", "g", "A", "B", num_partitions=3).first()
    assert kw["n"] == 15 and kw["k"] == 2 and kw["dof"] == 1
    assert kw["h_corrected"] == pytest.approx(mw["z"] ** 2, rel=1e-10)
    # three identical groups -> H ~ 0, p ~ 1
    same = spark.createDataFrame(
        [(g, float(i % 7)) for g in "XYZ" for i in range(21)],
        "g string, x double",
    )
    r = kruskal_wallis(same, "x", "g").first()
    assert abs(r["h_corrected"]) < 1e-9
    assert r["pvalue"] is None or r["pvalue"] > 0.99


def test_kruskal_wallis_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("A", 1.0), ("A", None), (None, 3.0), ("B", 2.0), ("B", 4.0)],
        "g string, x double",
    )
    r = kruskal_wallis(df, "x", "g").first()
    assert r["n"] == 3 and r["k"] == 2


def test_spearman_known_values(spark):
    # perfect monotone (nonlinear) relationship -> rho = 1
    df = spark.createDataFrame(
        [(float(i), float(i**3)) for i in range(1, 20)],
        "x double, y double",
    )
    r = spearman_corr(df, "x", "y").first()
    assert r["n"] == 19 and r["rho"] == pytest.approx(1.0)
    # reversed -> -1
    rev = spark.createDataFrame(
        [(float(i), float(-i) ** 3) for i in range(1, 20)],
        "x double, y double",
    )
    assert spearman_corr(rev, "x", "y").first()["rho"] == pytest.approx(
        -1.0
    )


def test_spearman_ties_and_nulls(spark):
    rows = [
        (1.0, 2.0), (2.0, 2.0), (2.0, 5.0), (3.0, 4.0),
        (None, 9.0), (4.0, None), (5.0, 8.0),
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    r = spearman_corr(df, "x", "y").first()
    assert r["n"] == 5
    # python replay: pearson on midranks of the complete pairs
    xs = [1.0, 2.0, 2.0, 3.0, 5.0]
    ys = [2.0, 2.0, 5.0, 4.0, 8.0]
    rx = _py_midranks(xs)
    ry = _py_midranks(ys)
    vx = [rx[v] for v in xs]
    vy = [ry[v] for v in ys]
    mx = sum(vx) / 5
    my = sum(vy) / 5
    num = sum((p - mx) * (q - my) for p, q in zip(vx, vy))
    den = math.sqrt(
        sum((p - mx) ** 2 for p in vx) * sum((q - my) ** 2 for q in vy)
    )
    assert r["rho"] == pytest.approx(num / den, rel=1e-12)


def test_ranks_plans_no_cartesian_no_global_data_window(spark):
    from pandera_spark.audit import plan_report

    df = spark.createDataFrame(
        [("A", float(i % 13)) for i in range(40)]
        + [("B", float(i % 11)) for i in range(40)],
        "g string, x double",
    )
    for frame in (
        mann_whitney_u(df, "x", "g", "A", "B"),
        kruskal_wallis(df, "x", "g"),
        spearman_corr(df.select("x", F.col("x").alias("y")), "x", "y"),
    ):
        rep = plan_report(frame)
        assert rep["cartesian_products"] == 0
        # the only un-partitioned windows allowed are over the tiny
        # #partitions offset frame (__pid), never the value column
        for spec in rep["unpartitioned_windows"]:
            assert "__pid" in spec


def test_gini_known_values(spark):
    from pandera_spark.operators.ranks import gini

    # perfect equality -> 0
    eq = spark.createDataFrame([(5.0,)] * 40, "x double")
    r = gini(eq, "x").first()
    assert r.n == 40 and r.gini == pytest.approx(0.0, abs=1e-12)
    # one holder of everything -> (n-1)/n
    mono = spark.createDataFrame(
        [(0.0,)] * 9 + [(100.0,)], "x double"
    )
    assert gini(mono, "x").first().gini == pytest.approx(0.9)
    # python replay on arbitrary data (sorted-rank formula with ties)
    vals = [1.0, 4.0, 4.0, 7.0, 0.0, 2.0, 9.0, 4.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ranks = _py_midranks(vals)
    n, tot = len(vals), sum(vals)
    g = 2 * sum(ranks[v] * v for v in vals) / (n * tot) - (n + 1) / n
    assert gini(df, "x").first().gini == pytest.approx(g, rel=1e-12)


def test_gini_guards(spark):
    from pandera_spark.operators.ranks import gini

    neg = spark.createDataFrame([(1.0,), (-2.0,)], "x double")
    with pytest.raises(ValueError, match="negative"):
        gini(neg, "x")
    zero = spark.createDataFrame([(0.0,), (0.0,)], "x double")
    assert gini(zero, "x").first().gini is None
