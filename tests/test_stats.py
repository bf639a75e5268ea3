"""Statistical screens: trend, corr pairs, chi2, MI, ANOVA."""

import math

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.stats import (
    anova_f,
    chi2_independence,
    corr_pairs,
    group_trend,
    mutual_info,
)


def test_group_trend_exact_line(spark):
    df = spark.createDataFrame(
        [(float(x), 2.0 * x + 1.0) for x in range(10)], "x double, y double"
    )
    r = group_trend(df, "y", "x").collect()[0]
    assert r.n == 10
    assert r.slope == pytest.approx(2.0)
    assert r.intercept == pytest.approx(1.0)
    assert r.r2 == pytest.approx(1.0)
    assert r.x_mean == pytest.approx(4.5)


def test_group_trend_per_group_and_nulls(spark):
    rows = [("a", float(x), 3.0 * x) for x in range(5)]
    rows += [("b", float(x), -1.0 * x + 7) for x in range(5)]
    rows += [("a", 99.0, None)]  # null y drops from the regression
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in group_trend(df, "y", "x", by="g").collect()}
    assert out["a"].n == 5 and out["a"].slope == pytest.approx(3.0)
    assert out["b"].slope == pytest.approx(-1.0)
    assert out["b"].intercept == pytest.approx(7.0)


def test_corr_pairs_signs_and_counts(spark):
    df = spark.createDataFrame(
        [(float(x), 2.0 * x, -x + 3.0, None if x == 2 else float(x * x))
         for x in range(6)],
        "a double, b double, c double, d double",
    )
    out = {(r.col_a, r.col_b): r
           for r in corr_pairs(df, ["a", "b", "c", "d"]).collect()}
    assert len(out) == 6
    assert out[("a", "b")].corr == pytest.approx(1.0)
    assert out[("a", "c")].corr == pytest.approx(-1.0)
    assert out[("a", "d")].n == 5  # null row drops pairwise


def test_corr_pairs_explicit_pairs_per_group(spark):
    df = spark.createDataFrame(
        [("g", float(x), float(x)) for x in range(4)],
        "k string, a double, b double",
    )
    out = corr_pairs(df, ["a", "b"], by="k", pairs=[("a", "b")]).collect()
    assert len(out) == 1 and out[0].k == "g"
    assert out[0].corr == pytest.approx(1.0)


def test_corr_pairs_dunder_names_and_duplicate_pairs(spark):
    # aliases are positional: names containing "__" (which would have
    # collided under name-embedded aliases) and a repeated pair both
    # unpivot to the right cells
    df = spark.createDataFrame(
        [(float(x), 2.0 * x, -1.0 * x) for x in range(5)],
        "`a__b` double, `b` double, `a__b__b` double",
    )
    out = corr_pairs(df, ["a__b", "b", "a__b__b"]).collect()
    got = {(r.col_a, r.col_b): r.corr for r in out}
    assert len(out) == 3
    assert got[("a__b", "b")] == pytest.approx(1.0)
    assert got[("a__b", "a__b__b")] == pytest.approx(-1.0)
    dup = corr_pairs(
        df, ["a__b", "b"], pairs=[("a__b", "b"), ("a__b", "b")]
    ).collect()
    assert len(dup) == 2
    assert all(r.corr == pytest.approx(1.0) for r in dup)


def test_chi2_independent_table_is_zero(spark):
    # perfectly proportional 2x2 -> chi2 == 0
    rows = (
        [("x", "u")] * 20 + [("x", "v")] * 40
        + [("y", "u")] * 10 + [("y", "v")] * 20
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    assert r.n == 90 and r.dof == 1
    assert r.chi2_stat == pytest.approx(0.0, abs=1e-9)
    assert r.cramers_v == pytest.approx(0.0, abs=1e-9)


def test_chi2_known_2x2(spark):
    # classic hand-computed 2x2: [[10, 20], [30, 40]]
    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20
        + [("y", "u")] * 30 + [("y", "v")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    # expected: e_xu = 30*40/100 = 12 etc; chi2 = sum (o-e)^2/e
    exp = (
        (10 - 12) ** 2 / 12 + (20 - 18) ** 2 / 18
        + (30 - 28) ** 2 / 28 + (40 - 42) ** 2 / 42
    )
    assert r.chi2_stat == pytest.approx(exp)
    assert 0.0 < r.chi2_pvalue < 1.0
    v = math.sqrt(exp / (100 * 1))
    assert r.cramers_v == pytest.approx(v)


def test_mutual_info_identical_columns(spark):
    rows = [(c, c) for c in "aabbbbcccc"]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_info(df, "a", "b").collect()[0]
    # identical columns: MI == H(A) == H(B), NMI == 1
    p = [0.2, 0.4, 0.4]
    h = -sum(x * math.log(x) for x in p)
    assert r.mi == pytest.approx(h)
    assert r.h_a == pytest.approx(h)
    assert r.h_b == pytest.approx(h)
    assert r.nmi == pytest.approx(1.0)


def test_mutual_info_independent_columns(spark):
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_info(df, "a", "b").collect()[0]
    assert r.n == 100
    assert r.mi == pytest.approx(0.0, abs=1e-12)
    assert r.h_a == pytest.approx(math.log(2))


def test_anova_known_values(spark):
    # groups [1,2,3], [2,3,4], [5,6,7]: hand-computed decomposition
    rows = [("a", v) for v in (1.0, 2.0, 3.0)]
    rows += [("b", v) for v in (2.0, 3.0, 4.0)]
    rows += [("c", v) for v in (5.0, 6.0, 7.0)]
    df = spark.createDataFrame(rows, "g string, y double")
    r = anova_f(df, "y", "g").collect()[0]
    grand = (2 + 3 + 6) / 3
    ssb = 3 * ((2 - grand) ** 2 + (3 - grand) ** 2 + (6 - grand) ** 2)
    ssw = sum((v - 2) ** 2 for v in (1, 2, 3)) + \
        sum((v - 3) ** 2 for v in (2, 3, 4)) + \
        sum((v - 6) ** 2 for v in (5, 6, 7))
    assert r.k == 3 and r.n == 9
    assert r.ss_between == pytest.approx(ssb)
    assert r.ss_within == pytest.approx(ssw)
    assert r.f_stat == pytest.approx((ssb / 2) / (ssw / 6))


def test_anova_zero_within_variance_is_null_f(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)],
        "g string, y double",
    )
    r = anova_f(df, "y", "g").collect()[0]
    assert r.ss_within == pytest.approx(0.0)
    assert r.f_stat is None


def test_stats_plans_are_join_free_or_broadcast(spark):
    from pandera_spark.audit import plan_report

    df = spark.createDataFrame(
        [("x", "u", 1.0)] * 4 + [("y", "v", 2.0)] * 4,
        "a string, b string, y double",
    )
    for frame in (
        group_trend(df, "y", "y", by="a"),
        corr_pairs(df, ["y"], pairs=[("y", "y")]),
        mutual_info(df, "a", "b"),
        anova_f(df, "y", "a"),
        chi2_independence(df, "a", "b"),
    ):
        rep = plan_report(frame)
        assert rep["cartesian_products"] == 0
        assert rep["broadcast_nested_loop_joins"] == 0


def test_chi2_null_category_is_a_level(spark):
    rows = [("x", "u"), ("x", None), (None, "u"), (None, None)] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    # 2x2 perfectly independent (every cell = 5): chi2 == 0, all rows kept
    assert r.n == 20 and r.n_a == 2 and r.n_b == 2
    assert r.chi2_stat == pytest.approx(0.0, abs=1e-9)


def test_fit_ols_recovers_exact_plane(spark):
    import numpy as np
    from pandera_spark.operators.linalg import apply_ols, fit_ols

    rows = [
        (float(i % 7), float((i * 3) % 5), 0.0)
        for i in range(40)
    ]
    rows = [(x1, x2, 2.0 * x1 - 3.0 * x2 + 4.0) for x1, x2, _ in rows]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    coef, b0, stats = fit_ols(df, "y", ["x1", "x2"])
    assert coef[0] == pytest.approx(2.0)
    assert coef[1] == pytest.approx(-3.0)
    assert b0 == pytest.approx(4.0)
    assert stats["r2"] == pytest.approx(1.0)
    assert stats["rmse"] == pytest.approx(0.0, abs=1e-6)
    pred = apply_ols(df, ["x1", "x2"], coef, b0).collect()
    for r in pred:
        assert r.prediction == pytest.approx(r.y)


def test_fit_ols_matches_numpy_lstsq(spark):
    import numpy as np
    from pandera_spark.operators.linalg import fit_ols

    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 3))
    yv = X @ np.array([1.5, -0.5, 0.25]) + 0.7 + rng.normal(
        scale=0.1, size=200
    )
    rows = [
        (float(a), float(b), float(c), float(t))
        for (a, b, c), t in zip(X, yv)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double, y double")
    coef, b0, stats = fit_ols(df, "y", ["a", "b", "c"])
    Xd = np.column_stack([X, np.ones(len(X))])
    ref, *_ = np.linalg.lstsq(Xd, yv, rcond=None)
    assert coef == pytest.approx(ref[:3], rel=1e-6)
    assert b0 == pytest.approx(ref[3], rel=1e-6)
    resid = yv - Xd @ ref
    assert stats["rmse"] == pytest.approx(
        float(np.sqrt((resid ** 2).mean())), rel=1e-5
    )
    assert 0.9 < stats["r2"] <= 1.0


def test_fit_ols_null_rows_drop_and_guards(spark):
    from pandera_spark.operators.linalg import fit_ols

    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (None, 9.0), (3.0, None), (3.0, 6.0)],
        "x double, y double",
    )
    coef, b0, stats = fit_ols(df, "y", ["x"])
    assert stats["n"] == 3
    assert coef[0] == pytest.approx(2.0)
    with pytest.raises(ValueError, match="at least one feature"):
        fit_ols(df, "y", [])


def test_fit_ols_collinear_design_minimum_norm(spark):
    from pandera_spark.operators.linalg import apply_ols, fit_ols

    # x2 = 2*x1: rank-deficient; lstsq must still predict correctly
    rows = [(float(i), 2.0 * i, 5.0 * i + 1.0) for i in range(10)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    coef, b0, stats = fit_ols(df, "y", ["x1", "x2"])
    pred = apply_ols(df, ["x1", "x2"], coef, b0).collect()
    for r in pred:
        assert r.prediction == pytest.approx(r.y, rel=1e-6)


# ---------------------------------------------------------------------------
# property tests (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings as hsettings
from hypothesis import strategies as st

_HSET = hsettings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_pairs = st.lists(
    st.tuples(st.sampled_from("abc"), st.sampled_from("uvw")),
    min_size=2, max_size=60,
)


@_HSET
@given(data=_pairs)
def test_chi2_nonnegative_and_symmetric(spark, data):
    df = spark.createDataFrame(data, "a string, b string")
    r1 = chi2_independence(df, "a", "b", pvalue=False).collect()[0]
    r2 = chi2_independence(df, "b", "a", pvalue=False).collect()[0]
    assert r1.chi2_stat >= 0.0
    assert r1.chi2_stat == pytest.approx(r2.chi2_stat, abs=1e-9)
    assert r1.dof == r2.dof and r1.n == r2.n


@_HSET
@given(data=_pairs)
def test_mutual_info_bounds_and_symmetry(spark, data):
    import math

    df = spark.createDataFrame(data, "a string, b string")
    r = mutual_info(df, "a", "b").collect()[0]
    rb = mutual_info(df, "b", "a").collect()[0]
    # MI symmetric; 0 <= MI <= min(H(A), H(B)) (up to fp slack)
    assert r.mi == pytest.approx(rb.mi, abs=1e-9)
    assert r.mi >= -1e-9
    assert r.mi <= min(r.h_a, r.h_b) + 1e-9
    if r.nmi is not None:
        assert -1e-9 <= r.nmi <= 1.0 + 1e-9


@_HSET
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from("ab"),
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=4, max_size=50,
    )
)
def test_anova_decomposition_sums_to_total_variance(spark, data):
    df = spark.createDataFrame(data, "g string, y double")
    r = anova_f(df, "y", "g").collect()[0]
    ys = [y for _, y in data]
    grand = sum(ys) / len(ys)
    ss_tot = sum((y - grand) ** 2 for y in ys)
    assert r.ss_between + r.ss_within == pytest.approx(
        ss_tot, rel=1e-6, abs=1e-6
    )
    assert r.ss_between >= -1e-9 and r.ss_within >= -1e-9


@_HSET
@given(
    words=st.lists(
        st.text(alphabet="xyz", min_size=1, max_size=3),
        min_size=1, max_size=40,
    )
)
def test_cms_one_sided_error_property(spark, words):
    from collections import Counter

    from pandera_spark.operators.sketches import cms_counters, cms_estimate

    df = spark.createDataFrame([(w,) for w in words], "w string")
    grid = cms_counters(df, "w", depth=2, width=16)
    keys = df.distinct()
    est = {r.w: r.est
           for r in cms_estimate(grid, keys, "w", depth=2, width=16)
           .collect()}
    exact = Counter(words)
    for w, c in exact.items():
        assert est[w] >= c       # never undercounts
        assert est[w] <= len(words)  # never exceeds the stream length


@_HSET
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from("abcd"),
            st.floats(-50, 50, allow_nan=False),
        ),
        min_size=2, max_size=40,
    ),
    smoothing=st.floats(0.0, 100.0, allow_nan=False),
)
def test_target_encoding_shrinks_toward_prior(spark, data, smoothing):
    from pandera_spark.operators.encode import fit_target_encoding

    df = spark.createDataFrame(data, "cat string, y double")
    rows = fit_target_encoding(
        df, "cat", "y", smoothing=smoothing
    ).collect()
    for r in rows:
        lo, hi = sorted((r.cat_mean, r.prior))
        assert lo - 1e-9 <= r.enc <= hi + 1e-9  # convex combination


def test_chi2_degenerate_table_null_v_both_lanes(spark):
    # one level on a side: dof 0 -> null V / null p, no ANSI
    # DIVIDE_BY_ZERO (the hypothesis-found case, pinned)
    df = spark.createDataFrame([("a", "u"), ("a", "u")], "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    assert r.dof == 0
    assert r.cramers_v is None and r.chi2_pvalue is None


def test_triangle_count_known_graph(spark):
    from pandera_spark.operators.graph import triangle_count

    # K4 minus one edge: nodes 1-4, edges 12 13 14 23 24 (no 34)
    # triangles: 123, 124 -> 2; wedges: sum d(d-1)/2 = 3+3+1+1 = 8
    edges = spark.createDataFrame(
        [(1, 2), (3, 1), (1, 4), (2, 3), (4, 2),
         (2, 1),  # duplicate reversed edge
         (3, 3)],  # self-loop
        "src int, dst int",
    )
    r = triangle_count(edges).collect()[0]
    assert r.n_nodes == 4 and r.n_edges == 5
    assert r.n_triangles == 2
    assert r.global_clustering == pytest.approx(6 / 8)


def test_triangle_count_per_node(spark):
    from pandera_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src int, dst int"
    )
    per = {r.node: r.triangles
           for r in triangle_count(edges, per_node=True).collect()}
    assert per == {1: 1, 2: 1, 3: 1}  # node 4 in no triangle -> absent


def test_triangle_count_wedge_free_null_clustering(spark):
    from pandera_spark.operators.graph import triangle_count

    edges = spark.createDataFrame([(1, 2)], "src int, dst int")
    r = triangle_count(edges).collect()[0]
    assert r.n_triangles == 0 and r.global_clustering is None


def test_mahalanobis_identity_cov_is_euclidean(spark):
    import numpy as np
    from pandera_spark.operators.numeric import mahalanobis_outliers

    # x, y independent with unit sample variance -> d^2 == z_x^2 + z_y^2
    rows = [(-1.0, -1.0), (1.0, 1.0), (-1.0, 1.0), (1.0, -1.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = mahalanobis_outliers(df, ["x", "y"]).collect()
    # var_samp = 4/3 here; d^2 = (x^2 + y^2) / (4/3) = 1.5 for all rows
    for r in out:
        assert r.mahalanobis_sq == pytest.approx(1.5)


def test_mahalanobis_matches_numpy(spark):
    import numpy as np
    from pandera_spark.operators.numeric import mahalanobis_outliers

    rng = np.random.default_rng(3)
    X = rng.normal(size=(60, 3)) @ np.array(
        [[1.0, 0.4, 0.0], [0.0, 1.0, 0.3], [0.0, 0.0, 1.0]]
    )
    df = spark.createDataFrame(
        [tuple(map(float, r)) for r in X], "a double, b double, c double"
    )
    out = mahalanobis_outliers(df, ["a", "b", "c"]).collect()
    mean = X.mean(axis=0)
    prec = np.linalg.pinv(np.cov(X, rowvar=False))
    got = {(round(r.a, 9), round(r.b, 9)): r.mahalanobis_sq for r in out}
    for xrow in X:
        ref = float((xrow - mean) @ prec @ (xrow - mean))
        assert got[(round(xrow[0], 9), round(xrow[1], 9))] == pytest.approx(
            ref, rel=1e-9
        )


def test_mahalanobis_null_rows_and_flag(spark):
    from pandera_spark.operators.numeric import mahalanobis_outliers

    # enough inliers that the in-sample distance bound (n-1)^2/n can
    # actually exceed the threshold (masking effect at tiny n)
    rows = [(float(i % 5), float((i * 3) % 7)) for i in range(30)]
    rows += [(50.0, -50.0), (None, 1.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = mahalanobis_outliers(df, ["x", "y"], threshold=10.0).collect()
    by = {(r.x, r.y): r for r in out}
    assert by[(None, 1.0)].mahalanobis_sq is None
    assert by[(None, 1.0)].is_outlier is None
    assert by[(50.0, -50.0)].is_outlier is True
    assert by[(0.0, 0.0)].is_outlier is False


def test_mahalanobis_collinear_uses_pinv(spark):
    from pandera_spark.operators.numeric import mahalanobis_outliers

    rows = [(float(i), 2.0 * i) for i in range(8)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = mahalanobis_outliers(df, ["x", "y"]).collect()
    assert all(r.mahalanobis_sq is not None for r in out)


def test_chi2_threshold_matches_known_quantiles():
    from pandera_spark.operators.numeric import chi2_threshold

    # exact scipy.stats.chi2.ppf references, computed offline
    for p, d, exact in [
        (0.99, 2, 9.2103), (0.95, 3, 7.8147), (0.999, 3, 16.266),
        (0.99, 10, 23.209), (0.95, 1, 3.8415), (0.99, 1, 6.6349),
    ]:
        got = chi2_threshold(p, d)
        assert abs(got - exact) / exact < 0.03, (p, d, got)
    import pytest as _pt
    with _pt.raises(ValueError):
        chi2_threshold(1.5, 2)
    with _pt.raises(ValueError):
        chi2_threshold(0.9, 0)


def test_join_cardinality_approx_estimates(spark):
    from pandera_spark.operators.relational import join_cardinality_approx

    left = spark.createDataFrame(
        [(i % 100, "x") for i in range(1000)], "k int, p string"
    )
    right = spark.createDataFrame(
        [(i, "y") for i in range(100)], "k int, q string"
    )
    r = join_cardinality_approx(left, right, "k").collect()[0]
    assert r.left_rows == 1000 and r.right_rows == 100
    # HLL at lgk=12 on 100 keys is near-exact
    assert abs(r.left_keys_est - 100) / 100 < 0.05
    assert abs(r.right_keys_est - 100) / 100 < 0.05
    assert r.left_dup_factor == pytest.approx(10.0, rel=0.05)
    assert r.right_dup_factor == pytest.approx(1.0, rel=0.05)
    # full containment here: the bound should approximate the true
    # join size (1000 rows)
    assert r.fanout_bound_est == pytest.approx(1000, rel=0.1)


def test_join_cardinality_approx_composite_and_null_keys(spark):
    from pandera_spark.operators.relational import join_cardinality_approx

    left = spark.createDataFrame(
        [(1, "a"), (1, "a"), (None, "b"), (2, None)],
        "k1 int, k2 string",
    )
    right = spark.createDataFrame([(1, "a")], "k1 int, k2 string")
    r = join_cardinality_approx(
        left, right, ["k1", "k2"]
    ).collect()[0]
    assert r.left_rows == 4
    # null-bearing composites are distinct key values, not dropped
    assert abs(r.left_keys_est - 3) < 0.5
    assert r.right_rows == 1


def test_join_cardinality_approx_plan_no_join(spark):
    from pandera_spark.audit import plan_report
    from pandera_spark.operators.relational import join_cardinality_approx

    left = spark.createDataFrame([(1,)], "k int")
    right = spark.createDataFrame([(1,)], "k int")
    rep = plan_report(join_cardinality_approx(left, right, "k"))
    assert rep["cartesian_products"] == 0
    assert rep["broadcast_nested_loop_joins"] == 0
    assert rep["sort_merge_joins"] == 0 and rep["broadcast_joins"] == 0


def test_fdr_bh_matches_python_replay(spark):
    from pandera_spark.operators.stats import fdr_bh

    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212,
          0.216, 0.222, 0.251, 0.269, 0.275, 0.34, 0.341, 0.384, 0.569,
          0.594, 0.696, 0.762, 0.94, 0.942, 0.975, 0.986]
    df = spark.createDataFrame([(f"t{i}", p) for i, p in enumerate(ps)],
                               "test string, p double")
    out = {r.test: r for r in fdr_bh(df, "p", alpha=0.05).collect()}
    # python replay
    m = len(ps)
    order = sorted(range(m), key=lambda i: ps[i])
    q = [0.0] * m
    running = 1.0
    for rank_from_top in range(m, 0, -1):
        i = order[rank_from_top - 1]
        running = min(running, ps[i] * m / rank_from_top)
        q[i] = running
    for i, p in enumerate(ps):
        assert out[f"t{i}"].q_value == pytest.approx(q[i], rel=1e-12), i
    # the classic Benjamini-Hochberg (1995) dataset rejects exactly
    # the 4 smallest p-values at alpha=0.05... verify against replay
    assert {t for t, r in out.items() if r.rejected} == {
        f"t{i}" for i in range(m) if q[i] <= 0.05
    }


def test_fdr_bh_ties_get_equal_q_and_nulls_pass_through(spark):
    from pandera_spark.operators.stats import fdr_bh

    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.01), ("c", 0.5), ("d", None)],
        "test string, p double",
    )
    out = {r.test: r for r in fdr_bh(df, "p").collect()}
    assert out["a"].q_value == pytest.approx(out["b"].q_value)
    assert out["d"].q_value is None and out["d"].rejected is None
    # m counts non-null only: q(c) = 0.5 * 3/3 = 0.5
    assert out["c"].q_value == pytest.approx(0.5)


def test_fdr_bh_per_group(spark):
    from pandera_spark.operators.stats import fdr_bh

    df = spark.createDataFrame(
        [("g1", 0.01), ("g1", 0.04), ("g2", 0.01)],
        "g string, p double",
    )
    out = fdr_bh(df, "p", by="g").collect()
    g2 = [r for r in out if r.g == "g2"][0]
    assert g2.q_value == pytest.approx(0.01)  # m=1 in its own group


def test_bootstrap_ci_mean_basic_properties(spark):
    from pandera_spark.operators.stats import bootstrap_ci_mean

    df = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(2000)], "k long, x double"
    )
    r = bootstrap_ci_mean(df, "x", "k", n_boot=64, alpha=0.05).first()
    assert r.n == 2000
    assert r.mean == pytest.approx(49.5)
    # CI brackets the mean, is tight-ish (se of mean ~0.65), nonempty
    assert r.ci_lo < r.mean < r.ci_hi
    assert r.ci_hi - r.ci_lo < 5.0
    assert 0.0 < r.se_boot < 2.5
    # deterministic: identical on rerun; different salt -> different CI
    r2 = bootstrap_ci_mean(df, "x", "k", n_boot=64, alpha=0.05).first()
    assert (r.ci_lo, r.ci_hi) == (r2.ci_lo, r2.ci_hi)
    r3 = bootstrap_ci_mean(
        df, "x", "k", n_boot=64, alpha=0.05, salt="z"
    ).first()
    assert (r3.ci_lo, r3.ci_hi) != (r.ci_lo, r.ci_hi)


def test_bootstrap_ci_matches_python_replay(spark):
    import hashlib
    import math

    from pandera_spark.operators.stats import bootstrap_ci_mean

    rows = [(i, float((i * 7) % 13)) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, x double")
    B = 16
    r = bootstrap_ci_mean(df, "x", "k", n_boot=B, alpha=0.1).first()

    acc, th = 0.0, []
    for k in range(13):
        acc += math.exp(-1.0) / math.factorial(k)
        th.append(acc)

    def w(key, rep):
        h = int(hashlib.md5(f"{key}:{rep}".encode()).hexdigest()[:7], 16)
        u = (h + 0.5) / (1 << 28)
        return sum(1 for t in th if u > t)

    reps = []
    for rep in range(B):
        sw = sx = 0.0
        for k, x in rows:
            wi = w(k, rep)
            sw += wi
            sx += wi * x
        reps.append(sx / sw)
    srt = sorted(reps)
    k_lo = max(1, math.ceil(B * 0.05))
    k_hi = min(B, math.ceil(B * 0.95))
    assert r.ci_lo == pytest.approx(srt[k_lo - 1], rel=1e-12)
    assert r.ci_hi == pytest.approx(srt[k_hi - 1], rel=1e-12)
    m = sum(reps) / B
    sd = math.sqrt(sum((v - m) ** 2 for v in reps) / (B - 1))
    assert r.se_boot == pytest.approx(sd, rel=1e-9)


def test_bootstrap_ci_guards_and_plan(spark):
    from pandera_spark.audit import plan_report
    from pandera_spark.operators.stats import bootstrap_ci_mean

    df = spark.createDataFrame([(1, 2.0)], "k long, x double")
    with pytest.raises(ValueError, match="n_boot"):
        bootstrap_ci_mean(df, "x", "k", n_boot=4)
    with pytest.raises(ValueError, match="alpha"):
        bootstrap_ci_mean(df, "x", "k", alpha=0.0)
    rep = plan_report(bootstrap_ci_mean(df, "x", "k", n_boot=8))
    assert rep["exchanges"] <= 1  # ONE aggregation, no resample shuffle
    assert rep["cartesian_products"] == 0


def test_fdr_by_harmonic_factor(spark):
    from pandera_spark.operators.stats import fdr_bh

    ps = [0.001, 0.008, 0.039, 0.041, 0.20, None]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    bh = {r["p"]: r["q_value"]
          for r in fdr_bh(df, "p", alpha=0.05).collect()}
    by = {r["p"]: r["q_value"]
          for r in fdr_bh(df, "p", alpha=0.05, method="by").collect()}
    m = 5
    cm = sum(1.0 / i for i in range(1, m + 1))
    # local replay of both
    import itertools
    nn = sorted(p for p in ps if p is not None)
    for label, c, got in (("bh", 1.0, bh), ("by", cm, by)):
        raw = [p * c * m / (i + 1) for i, p in enumerate(nn)]
        qs = list(itertools.accumulate(raw[::-1], min))[::-1]
        qs = [min(q, 1.0) for q in qs]
        for p, q in zip(nn, qs):
            assert got[p] == pytest.approx(q, abs=1e-12), (label, p)
    assert by[None] is None
    # BY is uniformly more conservative
    assert all(by[p] >= bh[p] for p in nn)
    with pytest.raises(ValueError, match="method"):
        fdr_bh(df, "p", method="bonferroni").collect()


# ---------------------------------------------------------------------------
# fisher_exact + bias-corrected Cramér's V (r11)


def _fisher_ref(a, b, c, d):
    """Pure-python hypergeometric reference via math.lgamma (scipy's
    two-sided sum-of-at-most-as-probable definition)."""
    import math

    r1, c1, n = a + b, a + c, a + b + c + d

    def lp(k):
        return (
            math.lgamma(r1 + 1) + math.lgamma(n - r1 + 1)
            + math.lgamma(c1 + 1) + math.lgamma(n - c1 + 1)
            - math.lgamma(n + 1) - math.lgamma(k + 1)
            - math.lgamma(r1 - k + 1) - math.lgamma(c1 - k + 1)
            - math.lgamma(n - r1 - c1 + k + 1)
        )

    kmin, kmax = max(0, r1 + c1 - n), min(r1, c1)
    obs = lp(a)
    p2 = sum(
        math.exp(lp(k))
        for k in range(kmin, kmax + 1)
        if lp(k) <= obs + 1e-7
    )
    pl = sum(math.exp(lp(k)) for k in range(kmin, a + 1))
    pg = sum(math.exp(lp(k)) for k in range(a, kmax + 1))
    return min(1.0, p2), min(1.0, pl), min(1.0, pg)


def _fisher_df(spark, a, b, c, d):
    rows = (
        [(True, True)] * a + [(True, False)] * b
        + [(False, True)] * c + [(False, False)] * d
    )
    return spark.createDataFrame(rows, "x boolean, y boolean")


class TestFisherExact:
    def test_scipy_documented_example(self, spark):
        from pandera_spark.operators.stats import fisher_exact

        # scipy.stats.fisher_exact([[8, 2], [1, 5]]): two-sided
        # p = 0.034965..., odds ratio 20.0
        r = fisher_exact(
            _fisher_df(spark, 8, 2, 1, 5), "x", "y"
        ).first()
        assert (r.a, r.b, r.c, r.d, r.n) == (8, 2, 1, 5, 16)
        assert r.odds_ratio == pytest.approx(20.0)
        assert r.p_two == pytest.approx(0.03496503496503495, abs=1e-9)

    def test_matches_lgamma_reference_on_grid(self, spark):
        from pandera_spark.operators.stats import fisher_exact

        for a, b, c, d in [
            (2, 3, 4, 5), (0, 10, 10, 0), (1, 1, 1, 1),
            (12, 5, 3, 9), (7, 0, 2, 11), (0, 0, 5, 5),
        ]:
            r = fisher_exact(_fisher_df(spark, a, b, c, d), "x", "y").first()
            p2, pl, pg = _fisher_ref(a, b, c, d)
            assert r.p_two == pytest.approx(p2, abs=1e-9), (a, b, c, d)
            assert r.p_less == pytest.approx(pl, abs=1e-9), (a, b, c, d)
            assert r.p_greater == pytest.approx(pg, abs=1e-9), (a, b, c, d)

    def test_null_conditions_drop(self, spark):
        from pandera_spark.operators.stats import fisher_exact

        df = _fisher_df(spark, 8, 2, 1, 5).union(
            _fisher_df(spark, 1, 1, 1, 1).select(
                F.lit(None).cast("boolean").alias("x"), "y"
            )
        )
        r = fisher_exact(df, "x", "y").first()
        assert r.n == 16

    def test_over_max_terms_nulls(self, spark):
        from pandera_spark.operators.stats import fisher_exact

        r = fisher_exact(
            _fisher_df(spark, 8, 2, 1, 5), "x", "y", max_terms=3
        ).first()
        assert r.p_two is None and r.p_less is None
        assert r.n == 16  # counts still real

    def test_zero_margin_degenerate(self, spark):
        from pandera_spark.operators.stats import fisher_exact

        # no positives on condition A at all: support is {0}, p = 1
        r = fisher_exact(_fisher_df(spark, 0, 0, 5, 5), "x", "y").first()
        assert r.p_two == pytest.approx(1.0, abs=1e-9)


class TestCramersVBiasCorrection:
    def test_bc_below_raw_and_matches_formula(self, spark):
        from pandera_spark.operators.stats import chi2_independence

        rows = []
        counts = {("a", "x"): 12, ("a", "y"): 5, ("b", "x"): 4,
                  ("b", "y"): 11, ("c", "x"): 7, ("c", "y"): 2}
        for (u, v), k in counts.items():
            rows += [(u, v)] * k
        df = spark.createDataFrame(rows, "u string, v string")
        r = chi2_independence(df, "u", "v", bias_correction=True).first()
        n, ra, cb = r.n, r.n_a, r.n_b
        phi2 = r.chi2_stat / n
        phi2c = max(0.0, phi2 - (ra - 1) * (cb - 1) / (n - 1))
        rt = ra - (ra - 1) ** 2 / (n - 1)
        ct = cb - (cb - 1) ** 2 / (n - 1)
        import math

        want = math.sqrt(phi2c / (min(rt, ct) - 1))
        assert r.cramers_v_bc == pytest.approx(want, abs=1e-12)
        assert r.cramers_v_bc <= r.cramers_v + 1e-12

    def test_bc_degenerate_null(self, spark):
        from pandera_spark.operators.stats import chi2_independence

        df = spark.createDataFrame(
            [("a", "x"), ("a", "y")], "u string, v string"
        )
        r = chi2_independence(df, "u", "v", bias_correction=True).first()
        assert r.cramers_v_bc is None

    def test_default_lane_has_no_bc_column(self, spark):
        from pandera_spark.operators.stats import chi2_independence

        df = spark.createDataFrame(
            [("a", "x"), ("b", "y")], "u string, v string"
        )
        assert "cramers_v_bc" not in chi2_independence(df, "u", "v").columns
