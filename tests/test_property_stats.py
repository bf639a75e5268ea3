"""Property-based differentials for the second-sitting statistics
tier: Hypothesis generates data, the engine result must equal an
independent pure-Python evaluation of the same estimator (and hold the
estimator's structural invariants)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

vals = st.lists(
    st.floats(min_value=-100, max_value=100,
              allow_nan=False, allow_infinity=False)
    .map(lambda x: round(x, 3)),
    min_size=5, max_size=40,
)


class TestOlsProperties:
    @SET
    @given(xs=vals)
    def test_perfect_line_recovered(self, spark, xs):
        from pandera_spark.operators.regression import ols_inference

        if len(set(xs)) < 3:
            return
        rows = [(float(x), 3.0 * x - 7.0) for x in xs]
        df = spark.createDataFrame(rows, "x double, y double")
        out = {r["term"]: r for r in ols_inference(df, "y", ["x"]).collect()}
        assert out["x"]["coef"] == pytest.approx(3.0, abs=1e-6)
        assert out["(intercept)"]["coef"] == pytest.approx(-7.0, abs=1e-4)

    @SET
    @given(xs=vals, shift=st.floats(min_value=-50, max_value=50,
                                    allow_nan=False))
    def test_intercept_shift_equivariance(self, spark, xs, shift):
        """Shifting y by c moves ONLY the intercept by c."""
        from pandera_spark.operators.regression import ols_inference

        if len(set(xs)) < 3:
            return
        ys = [0.5 * x + ((-1) ** i) * 2.0 for i, x in enumerate(xs)]
        d1 = spark.createDataFrame(
            list(zip(map(float, xs), map(float, ys))), "x double, y double"
        )
        d2 = spark.createDataFrame(
            [(x, y + shift) for x, y in zip(map(float, xs), ys)],
            "x double, y double",
        )
        o1 = {r["term"]: r for r in ols_inference(d1, "y", ["x"]).collect()}
        o2 = {r["term"]: r for r in ols_inference(d2, "y", ["x"]).collect()}
        assert o2["x"]["coef"] == pytest.approx(o1["x"]["coef"], abs=1e-7)
        assert o2["(intercept)"]["coef"] == pytest.approx(
            o1["(intercept)"]["coef"] + shift, abs=1e-6
        )


class TestRankProperties:
    @SET
    @given(xs=vals)
    def test_qq_self_is_diagonal(self, spark, xs):
        from pandera_spark.operators.ranks import qq_points

        rows = [("a", float(x)) for x in xs] + [("b", float(x)) for x in xs]
        df = spark.createDataFrame(rows, "g string, v double")
        out = qq_points(df, "v", "g", "a", "b").collect()
        assert all(r["diff"] == 0.0 for r in out)

    @SET
    @given(xs=st.lists(
        st.floats(min_value=0, max_value=100, allow_nan=False,
                  allow_infinity=False).map(lambda x: round(x, 2)),
        min_size=5, max_size=40,
    ))
    def test_lorenz_monotone_and_under_diagonal(self, spark, xs):
        from pandera_spark.operators.ranks import lorenz_points

        if sum(xs) <= 0:
            return
        df = spark.createDataFrame([(float(x),) for x in xs], "v double")
        out = sorted(lorenz_points(df, "v").collect(),
                     key=lambda r: r["q"])
        shares = [r["value_share"] for r in out]
        assert all(a <= b + 1e-12 for a, b in zip(shares, shares[1:]))
        for r in out:
            assert r["value_share"] <= r["pop_share"] + 1e-9

    @SET
    @given(xs=vals)
    def test_mann_kendall_antisymmetry(self, spark, xs):
        """Reversing time negates S (and z)."""
        import datetime

        from pandera_spark.operators.temporal import mann_kendall

        if len(xs) < 3:
            return
        t0 = datetime.datetime(2024, 1, 1)
        fwd = spark.createDataFrame(
            [(t0 + datetime.timedelta(hours=i), float(v))
             for i, v in enumerate(xs)],
            "bucket_start timestamp, v double",
        )
        rev = spark.createDataFrame(
            [(t0 + datetime.timedelta(hours=i), float(v))
             for i, v in enumerate(reversed(xs))],
            "bucket_start timestamp, v double",
        )
        a = mann_kendall(fwd, "v").first()
        b = mann_kendall(rev, "v").first()
        assert a["s_stat"] == -b["s_stat"]
        assert a["var_s"] == pytest.approx(b["var_s"], rel=1e-12)


class TestPavProperties:
    @SET
    @given(pts=st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=1, allow_nan=False)
            .map(lambda x: round(x, 2)),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=4, max_size=50,
    ))
    def test_pav_invariants(self, spark, pts):
        from pandera_spark.operators.evalmetrics import isotonic_calibrate

        df = spark.createDataFrame(
            [(float(s), int(y)) for s, y in pts],
            "score double, label int",
        )
        out = sorted(isotonic_calibrate(df, "score", "label").collect(),
                     key=lambda r: r["score_lo"])
        ps = [r["calibrated_p"] for r in out]
        # strictly increasing blocks, probabilities in [0, 1]
        assert all(a < b for a, b in zip(ps, ps[1:]))
        assert all(0.0 <= p <= 1.0 for p in ps)
        # weights conserve the sample, mean conserves the positive rate
        assert sum(r["n"] for r in out) == len(pts)
        total_pos = sum(y for _, y in pts)
        assert sum(r["n"] * r["calibrated_p"] for r in out) == \
            pytest.approx(total_pos, abs=1e-9)
        # blocks tile the score range without overlap
        for a, b in zip(out, out[1:]):
            assert a["score_hi"] < b["score_lo"]


class TestKappaProperties:
    @SET
    @given(labels=st.lists(
        st.tuples(st.sampled_from("xyz"), st.sampled_from("xyz")),
        min_size=5, max_size=60,
    ))
    def test_kappa_symmetry_and_range(self, spark, labels):
        from pandera_spark.operators.evalmetrics import cohen_kappa

        df = spark.createDataFrame(labels, "a string, b string")
        k1 = cohen_kappa(df, "a", "b").first()
        df2 = spark.createDataFrame(
            [(b, a) for a, b in labels], "a string, b string"
        )
        k2 = cohen_kappa(df2, "a", "b").first()
        if k1["kappa"] is None:
            assert k2["kappa"] is None
        else:
            assert k1["kappa"] == pytest.approx(k2["kappa"], abs=1e-12)
            assert -1.0 - 1e-9 <= k1["kappa"] <= 1.0 + 1e-9
