"""Differential tests for operators/regression.py: OLS inference and
fixed-iteration Newton logistic regression vs independent local numpy
implementations of the same estimators."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from pandera_spark.operators.regression import (
    logistic_fit,
    logistic_report,
    logistic_score,
    ols_inference,
)


def _toy(spark, n=400, seed=7):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, 10, n)
    x2 = rng.uniform(-3, 3, n)
    noise = rng.normal(0, 1.5, n)
    y = 4.0 + 2.5 * x1 - 1.25 * x2 + noise
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    return df, np.column_stack([x1, x2]), y


def _local_ols(X, y, intercept=True):
    n = len(y)
    if intercept:
        X = np.column_stack([X, np.ones(n)])
    p = X.shape[1]
    xtx_inv = np.linalg.inv(X.T @ X)
    beta = xtx_inv @ (X.T @ y)
    resid = y - X @ beta
    sigma2 = float(resid @ resid) / (n - p)
    se = np.sqrt(sigma2 * np.diag(xtx_inv))
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - float(resid @ resid) / ss_tot
    return beta, se, r2


class TestOlsInference:
    def test_matches_local_numpy(self, spark):
        df, X, y = _toy(spark)
        out = {
            r["term"]: r
            for r in ols_inference(df, "y", ["x1", "x2"]).collect()
        }
        beta, se, r2 = _local_ols(X, y)
        for i, term in enumerate(["x1", "x2", "(intercept)"]):
            assert out[term]["coef"] == pytest.approx(beta[i], abs=1e-8)
            assert out[term]["se"] == pytest.approx(se[i], rel=1e-8)
            assert out[term]["t_stat"] == pytest.approx(
                beta[i] / se[i], rel=1e-8
            )
            assert out[term]["r2"] == pytest.approx(r2, abs=1e-10)
            assert out[term]["n"] == len(y)

    def test_no_intercept(self, spark):
        df, X, y = _toy(spark)
        out = ols_inference(df, "y", ["x1", "x2"], intercept=False)
        rows = {r["term"]: r for r in out.collect()}
        beta, se, _ = _local_ols(X, y, intercept=False)
        assert set(rows) == {"x1", "x2"}
        assert rows["x1"]["coef"] == pytest.approx(beta[0], abs=1e-8)
        assert rows["x2"]["se"] == pytest.approx(se[1], rel=1e-8)

    def test_perfect_fit(self, spark):
        df = spark.createDataFrame(
            [(float(i), 2.0 * i + 1.0) for i in range(20)],
            "x double, y double",
        )
        rows = {r["term"]: r for r in ols_inference(df, "y", ["x"]).collect()}
        assert rows["x"]["coef"] == pytest.approx(2.0, abs=1e-9)
        assert rows["(intercept)"]["coef"] == pytest.approx(1.0, abs=1e-8)
        assert rows["x"]["r2"] == pytest.approx(1.0, abs=1e-12)

    def test_singular_design_raises(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0, 3.0), (2.0, 4.0, 5.0), (3.0, 6.0, 8.0),
             (4.0, 8.0, 9.0)],
            "x1 double, x2 double, y double",  # x2 = 2*x1 exactly
        )
        with pytest.raises(ValueError, match="singular|more rows"):
            ols_inference(df, "y", ["x1", "x2"])

    def test_nulls_drop(self, spark):
        df = spark.createDataFrame(
            [(1.0, 3.0), (2.0, 5.0), (None, 99.0), (3.0, None),
             (4.0, 9.0), (5.0, 11.0)],
            "x double, y double",
        )
        rows = {r["term"]: r for r in ols_inference(df, "y", ["x"]).collect()}
        assert rows["x"]["n"] == 4
        assert rows["x"]["coef"] == pytest.approx(2.0, abs=1e-9)


def _local_logistic(X, y, iters, intercept=True, ridge=0.0):
    n = len(y)
    if intercept:
        X = np.column_stack([X, np.ones(n)])
    p = X.shape[1]
    beta = np.zeros(p)
    ll = None
    for _ in range(iters):
        eta = X @ beta
        prob = 1.0 / (1.0 + np.exp(-eta))
        ll = float((y * eta - np.log1p(np.exp(eta))).sum())
        w = prob * (1.0 - prob)
        grad = X.T @ (y - prob) - ridge * beta
        hess = (X * w[:, None]).T @ X + ridge * np.eye(p)
        beta = beta + np.linalg.solve(hess, grad)
    return beta, ll


class TestLogisticFit:
    def _toy(self, spark, n=500, seed=3):
        rng = np.random.RandomState(seed)
        x = rng.uniform(-2, 2, n)
        p = 1.0 / (1.0 + np.exp(-(0.5 + 1.5 * x)))
        y = (rng.uniform(0, 1, n) < p).astype(float)
        df = spark.createDataFrame(
            [(float(a), bool(b)) for a, b in zip(x, y)],
            "x double, label boolean",
        )
        return df, x[:, None], y

    def test_matches_local_newton(self, spark):
        df, X, y = self._toy(spark)
        fit = logistic_fit(df, "label", ["x"], iters=4)
        beta, ll = _local_logistic(X, y, iters=4)
        assert fit["terms"] == ["x", "(intercept)"]
        assert fit["beta"][0] == pytest.approx(beta[0], abs=1e-9)
        assert fit["beta"][1] == pytest.approx(beta[1], abs=1e-9)
        # log_lik reported for the beta ENTERING the last step — the
        # local replica computes it at the same point
        assert fit["log_lik"] == pytest.approx(ll, rel=1e-9)
        assert fit["n"] == len(y)
        assert fit["last_step_norm"] < 0.05  # near-converged by step 4

    def test_direction_and_multifeature(self, spark):
        df, X, y = self._toy(spark)
        df2 = df.withColumn("x2", F.col("x") * 0.5 + F.lit(1.0))
        # x2 is collinear with x -> ridge keeps the solve well-posed
        fit = logistic_fit(df2, "label", ["x", "x2"], iters=3, ridge=1.0)
        assert fit["beta"][0] > 0  # positive slope recovered
        assert len(fit["beta"]) == 3

    def test_ridge_tames_separation(self, spark):
        df = spark.createDataFrame(
            [(float(i), i >= 0) for i in range(-20, 20)],
            "x double, label boolean",
        )
        fit = logistic_fit(df, "label", ["x"], iters=6, ridge=0.5)
        assert all(math.isfinite(b) for b in fit["beta"])
        assert fit["beta"][0] > 0

    def test_nulls_drop_and_bool_expr(self, spark):
        df = spark.createDataFrame(
            [(1.0, "a"), (2.0, "b"), (None, "a"), (3.0, None), (4.0, "b"),
             (0.5, "a"), (3.5, "b"), (0.1, "a")],
            "x double, g string",
        )
        fit = logistic_fit(
            df, F.col("g") == "b", ["x"], iters=2, storage_level=None
        )
        assert fit["n"] == 6  # null x and null g both drop
        assert fit["beta"][0] > 0  # larger x -> more likely 'b'

    def test_report_and_score(self, spark):
        df, X, y = self._toy(spark, n=200)
        fit = logistic_fit(df, "label", ["x"], iters=3)
        rep = logistic_report(spark, fit)
        assert rep.columns == ["term", "coef", "n", "log_lik", "iters"]
        assert rep.count() == 2
        scored = logistic_score(
            df, ["x"], fit["beta"][:1], intercept=fit["beta"][1]
        )
        row = scored.where(F.col("x") > 1.5).select("probability").first()
        assert 0.5 < row["probability"] < 1.0
        # pure projection: no exchange in the scoring plan
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_iters_validation(self, spark):
        df, _, _ = self._toy(spark, n=50)
        with pytest.raises(ValueError, match="iters"):
            logistic_fit(df, "label", ["x"], iters=0)
