"""Tests for the categorical-epidemiology screens: two-group log-rank,
McNemar's paired test, and Cochran-Mantel-Haenszel — local python
replays on deterministic data."""

import math

import pytest

from pyspark.sql import functions as F

from pandera_spark.operators.stats import cmh_test, mcnemar_test
from pandera_spark.operators.survival import logrank_test


def _local_logrank(subjects):
    """subjects: (group 'a'/'b', duration, event)"""
    times = sorted({t for _, t, _ in subjects})
    n_a = sum(1 for g, _, _ in subjects if g == "a")
    n_b = len(subjects) - n_a
    num = var = 0.0
    obs_a = 0
    for t in times:
        d_a = sum(1 for g, tt, e in subjects if g == "a" and tt == t and e)
        d_b = sum(1 for g, tt, e in subjects if g == "b" and tt == t and e)
        d = d_a + d_b
        n = n_a + n_b
        if d > 0 and n > 1:
            e_a = d * n_a / n
            v = d * (n_a / n) * (n_b / n) * (n - d) / (n - 1)
            num += d_a - e_a
            var += v
        obs_a += d_a
        n_a -= sum(1 for g, tt, _ in subjects if g == "a" and tt == t)
        n_b -= sum(1 for g, tt, _ in subjects if g == "b" and tt == t)
    return obs_a, num, var


class TestLogrank:
    def test_matches_local(self, spark):
        import numpy as np

        rng = np.random.RandomState(17)
        subjects = []
        for i in range(150):
            g = "a" if i % 2 == 0 else "b"
            scale = 8.0 if g == "a" else 12.0
            t = round(float(rng.exponential(scale)), 1)
            e = bool(rng.uniform() < 0.8)
            subjects.append((g, t, e))
        df = spark.createDataFrame(
            subjects, "g string, dur double, ev boolean"
        )
        out = logrank_test(df, "dur", "ev", "g", "a", "b").first()
        obs_a, num, var = _local_logrank(subjects)
        assert out["observed_a"] == obs_a
        assert out["z"] == pytest.approx(num / math.sqrt(var), rel=1e-10)
        assert out["chi2"] == pytest.approx(num * num / var, rel=1e-10)
        assert out["n_a"] == 75 and out["n_b"] == 75
        assert 0 <= out["pvalue"] <= 1

    def test_identical_groups_z_zero(self, spark):
        rows = [("a", float(t), True) for t in (1, 2, 3, 4)] + [
            ("b", float(t), True) for t in (1, 2, 3, 4)
        ]
        df = spark.createDataFrame(rows, "g string, dur double, ev boolean")
        out = logrank_test(df, "dur", "ev", "g", "a", "b").first()
        assert out["z"] == pytest.approx(0.0, abs=1e-12)
        assert out["expected_a"] == pytest.approx(out["observed_a"])

    def test_all_censored_null(self, spark):
        rows = [("a", 1.0, False), ("b", 2.0, False)]
        df = spark.createDataFrame(rows, "g string, dur double, ev boolean")
        out = logrank_test(df, "dur", "ev", "g", "a", "b").first()
        assert out["z"] is None and out["pvalue"] is None


class TestMcnemar:
    def test_textbook(self, spark):
        # classic: b=10 (a-only), c=25 (b-only), 50 both, 15 neither
        rows = (
            [(True, True)] * 50 + [(True, False)] * 10
            + [(False, True)] * 25 + [(False, False)] * 15
        )
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        out = mcnemar_test(df, F.col("a"), F.col("b")).first()
        assert (out["b"], out["c"], out["n"]) == (10, 25, 100)
        chi2 = (abs(10 - 25) - 1) ** 2 / 35
        assert out["chi2"] == pytest.approx(chi2)
        assert out["pvalue"] < 0.05

    def test_no_correction_and_no_discordant(self, spark):
        rows = [(True, False)] * 8 + [(False, True)] * 8
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        out = mcnemar_test(df, F.col("a"), F.col("b"),
                           correction=False).first()
        assert out["chi2"] == pytest.approx(0.0)
        conc = spark.createDataFrame(
            [(True, True), (False, False)], "a boolean, b boolean"
        )
        out2 = mcnemar_test(conc, F.col("a"), F.col("b")).first()
        assert out2["chi2"] is None and out2["pvalue"] is None


class TestCmh:
    def test_matches_local(self, spark):
        import numpy as np

        rng = np.random.RandomState(31)
        rows = []
        for s in ("s1", "s2", "s3"):
            base = {"s1": 0.2, "s2": 0.5, "s3": 0.7}[s]
            for _ in range(200):
                e = bool(rng.uniform() < 0.5)
                o = bool(rng.uniform() < base + (0.15 if e else 0.0))
                rows.append((s, e, o))
        df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
        out = cmh_test(df, F.col("e"), F.col("o"), "s").first()
        num = var = orn = ord_ = 0.0
        for s in ("s1", "s2", "s3"):
            a = sum(1 for ss, e, o in rows if ss == s and e and o)
            b = sum(1 for ss, e, o in rows if ss == s and e and not o)
            c = sum(1 for ss, e, o in rows if ss == s and not e and o)
            d = sum(1 for ss, e, o in rows if ss == s and not e and not o)
            n = a + b + c + d
            num += a - (a + b) * (a + c) / n
            var += ((a + b) * (c + d) * (a + c) * (b + d)
                    / (n * n * (n - 1)))
            orn += a * d / n
            ord_ += b * c / n
        chi2 = (abs(num) - 0.5) ** 2 / var
        assert out["n"] == 600 and out["n_strata"] == 3
        assert out["chi2"] == pytest.approx(chi2, rel=1e-10)
        assert out["or_mh"] == pytest.approx(orn / ord_, rel=1e-10)
        assert out["pvalue"] < 0.05  # real effect in every stratum

    def test_simpsons_paradox_guard(self, spark):
        # pooled table shows a negative association; within each
        # stratum the association is positive -> CMH follows strata
        rows = []
        rows += [("low", True, True)] * 18 + [("low", True, False)] * 2
        rows += [("low", False, True)] * 70 + [("low", False, False)] * 10
        rows += [("high", True, True)] * 10 + [("high", True, False)] * 70
        rows += [("high", False, True)] * 1 + [("high", False, False)] * 19
        df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
        out = cmh_test(df, F.col("e"), F.col("o"), "s").first()
        assert out["or_mh"] > 1.0  # stratum-adjusted association
        # naive pooled OR is < 1 (the paradox)
        a = 28.0; b = 72.0; c = 71.0; d = 29.0
        assert (a * d) / (b * c) < 1.0

    def test_null_and_degenerate_strata(self, spark):
        rows = [("s1", True, True), ("s1", False, False),
                ("s1", True, False), ("s1", False, True),
                ("s2", True, True),  # single-row stratum: V = 0
                (None, True, True), ("s1", None, True)]
        df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
        out = cmh_test(df, F.col("e"), F.col("o"), "s").first()
        assert out["n"] == 5 and out["n_strata"] == 2


class TestCochranQ:
    def test_hand_computed(self, spark):
        from pandera_spark.operators.stats import cochran_q

        # 6 items x 3 treatments (classic layout)
        data = [
            (1, 1, 1, 0), (2, 1, 1, 0), (3, 0, 1, 0),
            (4, 1, 0, 0), (5, 1, 1, 1), (6, 0, 1, 0),
        ]
        df = spark.createDataFrame(data, "item int, a int, b int, c int")
        out = cochran_q(
            df, "item",
            [F.col("a") == 1, F.col("b") == 1, F.col("c") == 1],
        ).first()
        g = [4, 5, 1]
        l = [2, 2, 1, 1, 3, 1]
        k = 3
        gbar = sum(g) / k
        q = (k * (k - 1) * sum((x - gbar) ** 2 for x in g)
             / (k * sum(l) - sum(x * x for x in l)))
        assert out["n_items"] == 6 and out["k"] == 3 and out["dof"] == 2
        assert out["q_stat"] == pytest.approx(q, rel=1e-12)
        assert 0 <= out["pvalue"] <= 1

    def test_k2_equals_mcnemar_uncorrected(self, spark):
        from pandera_spark.operators.stats import cochran_q, mcnemar_test

        rows = [(i, bool(i % 3 == 0), bool(i % 4 == 0)) for i in range(40)]
        df = spark.createDataFrame(rows, "item int, a boolean, b boolean")
        cq = cochran_q(df, "item", [F.col("a"), F.col("b")]).first()
        mn = mcnemar_test(df, F.col("a"), F.col("b"),
                          correction=False).first()
        assert cq["q_stat"] == pytest.approx(mn["chi2"], rel=1e-12)
        assert cq["pvalue"] == pytest.approx(mn["pvalue"], abs=1e-12)

    def test_degenerate_and_dedup(self, spark):
        from pandera_spark.operators.stats import cochran_q

        # all items identical across treatments -> denominator 0
        df = spark.createDataFrame(
            [(1, 1, 1), (2, 1, 1), (3, 0, 0)], "item int, a int, b int"
        )
        out = cochran_q(df, "item", [F.col("a") == 1, F.col("b") == 1]).first()
        assert out["q_stat"] is None and out["pvalue"] is None
        # duplicate item rows OR together
        df2 = spark.createDataFrame(
            [(1, 1, 0), (1, 0, 1), (2, 0, 0), (3, 1, 0)],
            "item int, a int, b int",
        )
        out2 = cochran_q(df2, "item",
                         [F.col("a") == 1, F.col("b") == 1]).first()
        assert out2["n_items"] == 3
        with pytest.raises(ValueError, match="treatments"):
            cochran_q(df2, "item", [F.col("a") == 1])
