"""Tests for distribution diagnostics: Lorenz points, head-coverage
curve, and deterministic-noise DP counts."""

import math

import pytest

from pyspark.sql import functions as F

from pandera_spark.operators.heavyhitters import coverage_curve
from pandera_spark.operators.privacy import dp_noisy_counts
from pandera_spark.operators.ranks import lorenz_points


class TestLorenzPoints:
    def _local(self, xs, q):
        xs = sorted(xs)
        n, total = len(xs), sum(xs)
        t = math.ceil(q * n)
        # first distinct-value boundary whose cumulative count >= t
        cum_c, cum_m = 0, 0.0
        i = 0
        while i < n:
            v = xs[i]
            j = i
            while j < n and xs[j] == v:
                cum_c += 1
                cum_m += v
                j += 1
            if cum_c >= t:
                return cum_c / n, cum_m / total
            i = j
        return 1.0, 1.0

    def test_matches_local(self, spark):
        import numpy as np

        rng = np.random.RandomState(8)
        xs = [float(x) for x in rng.lognormal(0, 1.2, 500).round(2)]
        df = spark.createDataFrame([(x,) for x in xs], "v double")
        out = {round(r["q"], 6): r
               for r in lorenz_points(df, "v").collect()}
        for q in (0.1, 0.5, 0.9):
            p, l = self._local(xs, q)
            assert out[q]["pop_share"] == pytest.approx(p, abs=1e-12)
            assert out[q]["value_share"] == pytest.approx(l, rel=1e-10)
        # Lorenz curve lies under the diagonal for unequal data
        assert out[0.5]["value_share"] < out[0.5]["pop_share"]

    def test_uniform_values_on_diagonal(self, spark):
        df = spark.createDataFrame([(float(i),) for i in range(1, 101)],
                                   "v double")
        out = {round(r["q"], 6): r for r in lorenz_points(df, "v").collect()}
        # bottom half of 1..100 holds 25.25% of the mass
        assert out[0.5]["pop_share"] == pytest.approx(0.5)
        assert out[0.5]["value_share"] == pytest.approx(
            sum(range(1, 51)) / sum(range(1, 101))
        )

    def test_validation(self, spark):
        df = spark.createDataFrame([(1.0,), (-2.0,)], "v double")
        with pytest.raises(ValueError, match="negative"):
            lorenz_points(df, "v")
        df2 = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="fractions"):
            lorenz_points(df2, "v", fractions=[1.5])


class TestCoverageCurve:
    def test_hand_computed(self, spark):
        rows = (["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 4
                + ["e"] * 1)
        df = spark.createDataFrame([(v,) for v in rows], "cat string")
        out = {r["rank"]: r for r in
               coverage_curve(df, "cat", k=3).collect()}
        assert [out[i]["value"] for i in (1, 2, 3)] == ["a", "b", "c"]
        assert out[1]["share"] == pytest.approx(0.5)
        assert out[2]["cum_share"] == pytest.approx(0.8)
        assert out[3]["cum_share"] == pytest.approx(0.95)
        assert out[3]["cnt"] == 15

    def test_tie_break_and_k_past_cardinality(self, spark):
        df = spark.createDataFrame(
            [("x",), ("y",), ("x",), ("y",), (None,)], "cat string"
        )
        out = coverage_curve(df, "cat", k=10).collect()
        assert [r["value"] for r in out] == ["x", "y"]  # ties by value
        assert out[-1]["cum_share"] == pytest.approx(1.0)

    def test_windowgrouplimit_in_plan(self, spark):
        df = spark.createDataFrame([(str(i % 7),) for i in range(100)],
                                   "cat string")
        plan = coverage_curve(df, "cat", k=3)._jdf.queryExecution() \
            .executedPlan().toString()
        assert ("TakeOrderedAndProject" in plan
                or "WindowGroupLimit" in plan)


class TestDpNoisyCounts:
    def test_deterministic_and_replayable(self, spark):
        rows = [("a",)] * 40 + [("b",)] * 10 + [("c",)] * 3
        df = spark.createDataFrame(rows, "cat string")
        out1 = {r["value"]: r["noisy_count"]
                for r in dp_noisy_counts(df, "cat", epsilon=0.5).collect()}
        out2 = {r["value"]: r["noisy_count"]
                for r in dp_noisy_counts(df, "cat", epsilon=0.5).collect()}
        assert out1 == out2  # derived noise: identical release
        # local replay of the hash -> laplace pipeline
        import hashlib

        def local(v, cnt, eps):
            h = int(hashlib.md5(f"{v}|dp|".encode()).hexdigest()[:7], 16)
            u = (h + 0.5) / 268435456.0
            c = u - 0.5
            noise = -(1 / eps) * math.copysign(1, c) * math.log1p(
                -2 * abs(c)
            )
            return max(cnt + noise, 0.0)

        for v, cnt in (("a", 40), ("b", 10), ("c", 3)):
            assert out1[v] == pytest.approx(local(v, cnt, 0.5), abs=1e-10)

    def test_salt_changes_noise_epsilon_scales(self, spark):
        df = spark.createDataFrame([("a",)] * 100, "cat string")
        base = dp_noisy_counts(df, "cat", epsilon=1.0).first()
        other = dp_noisy_counts(df, "cat", epsilon=1.0, salt="2").first()
        assert base["noisy_count"] != other["noisy_count"]
        tight = dp_noisy_counts(df, "cat", epsilon=100.0).first()
        assert abs(tight["noisy_count"] - 100.0) < abs(
            base["noisy_count"] - 100.0
        ) + 1e-12
        with pytest.raises(ValueError, match="epsilon"):
            dp_noisy_counts(df, "cat", epsilon=0.0)

    def test_clamp(self, spark):
        df = spark.createDataFrame([("z",)], "cat string")
        out = dp_noisy_counts(df, "cat", epsilon=0.0001).first()
        assert out["noisy_count"] >= 0.0


class TestQqPoints:
    def _local_q(self, xs, q):
        import math
        xs = sorted(xs)
        return xs[math.ceil(q * len(xs)) - 1]

    def test_matches_local(self, spark):
        import numpy as np

        from pandera_spark.operators.ranks import qq_points

        rng = np.random.RandomState(4)
        a = [float(x) for x in rng.normal(10, 2, 300).round(3)]
        b = [float(x) for x in rng.normal(12, 4, 200).round(3)]
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {round(r["q"], 6): r
               for r in qq_points(df, "v", "g", "a", "b").collect()}
        for q in (0.1, 0.5, 0.9):
            qa, qb = self._local_q(a, q), self._local_q(b, q)
            assert out[q]["q_a"] == pytest.approx(qa, abs=1e-12)
            assert out[q]["q_b"] == pytest.approx(qb, abs=1e-12)
            assert out[q]["diff"] == pytest.approx(qa - qb, abs=1e-12)
            assert out[q]["ratio"] == pytest.approx(qa / qb, rel=1e-12)
        # b has heavier tails: the gap widens at the 90th percentile
        assert abs(out[0.9]["diff"]) > abs(out[0.5]["diff"]) - 5

    def test_identical_groups_on_diagonal(self, spark):
        from pandera_spark.operators.ranks import qq_points

        rows = [(g, float(v)) for g in ("a", "b") for v in range(1, 51)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = qq_points(df, "v", "g", "a", "b").collect()
        assert all(r["diff"] == 0.0 for r in out)
        assert all(r["ratio"] == pytest.approx(1.0) for r in out)

    def test_other_groups_excluded_and_validation(self, spark):
        from pandera_spark.operators.ranks import qq_points

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
             ("z", 999.0), ("a", None)],
            "g string, v double",
        )
        out = {round(r["q"], 2): r
               for r in qq_points(df, "v", "g", "a", "b",
                                  quantiles=[0.5, 1.0]).collect()}
        assert out[1.0]["q_a"] == 2.0 and out[1.0]["q_b"] == 4.0
        with pytest.raises(ValueError, match="quantiles"):
            qq_points(df, "v", "g", "a", "b", quantiles=[0.0])
