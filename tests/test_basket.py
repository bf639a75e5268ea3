"""Tests for operators/basket.py (frequent pairs) and temporal.acf —
hand-computed references on small deterministic inputs."""

import datetime

import pytest

from pyspark.sql import functions as F

from pandera_spark.operators.basket import basket_stats, frequent_pairs
from pandera_spark.operators.temporal import acf


def _orders(spark):
    # baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b} 5:{a,b} (dup line for b)
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
        (5, "a"), (5, "b"), (5, "b"),
    ]
    return spark.createDataFrame(rows, "basket int, item string")


class TestFrequentPairs:
    def test_counts_and_stats(self, spark):
        out = frequent_pairs(
            _orders(spark), "basket", "item",
            min_pair_support=2, min_item_support=1,
        ).collect()
        by_pair = {(r["item_a"], r["item_b"]): r for r in out}
        # (a,b) in baskets 1,2,5 ; (a,c) in 1,3 ; (b,c) only basket 1
        assert set(by_pair) == {("a", "b"), ("a", "c")}
        ab = by_pair[("a", "b")]
        assert ab["pair_count"] == 3
        assert ab["count_a"] == 4 and ab["count_b"] == 4
        assert ab["n_baskets"] == 5
        assert ab["support"] == pytest.approx(3 / 5)
        assert ab["conf_a_to_b"] == pytest.approx(3 / 4)
        assert ab["conf_b_to_a"] == pytest.approx(3 / 4)
        assert ab["lift"] == pytest.approx(3 * 5 / (4 * 4))
        ac = by_pair[("a", "c")]
        assert ac["pair_count"] == 2 and ac["count_b"] == 2

    def test_item_support_prunes_before_pairs(self, spark):
        # c appears in 2 baskets; with min_item_support=3 it cannot pair
        out = frequent_pairs(
            _orders(spark), "basket", "item",
            min_pair_support=1, min_item_support=3,
        ).collect()
        items = {r["item_a"] for r in out} | {r["item_b"] for r in out}
        assert "c" not in items
        assert {(r["item_a"], r["item_b"]) for r in out} == {("a", "b")}

    def test_basket_size_cap(self, spark):
        out = frequent_pairs(
            _orders(spark), "basket", "item",
            min_pair_support=1, min_item_support=1,
            max_items_per_basket=2,
        ).collect()
        by_pair = {(r["item_a"], r["item_b"]): r for r in out}
        # basket 1 (3 items) dropped -> (a,c) only from basket 3,
        # (b,c) gone entirely, denominator now 4 baskets
        assert ("b", "c") not in by_pair
        assert by_pair[("a", "c")]["pair_count"] == 1
        assert by_pair[("a", "b")]["n_baskets"] == 4

    def test_nulls_and_duplicates_collapse(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "b"), (None, "z"), (2, None),
             (2, "a"), (2, "b")],
            "basket int, item string",
        )
        out = frequent_pairs(
            df, "basket", "item", min_pair_support=1, min_item_support=1
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["item_a"], r["item_b"], r["pair_count"]) == ("a", "b", 2)
        assert r["n_baskets"] == 2

    def test_threshold_validation(self, spark):
        with pytest.raises(ValueError, match="support"):
            frequent_pairs(_orders(spark), "basket", "item",
                           min_pair_support=0)

    def test_basket_stats(self, spark):
        out = {r["basket_size"]: r["n_baskets"]
               for r in basket_stats(_orders(spark), "basket", "item")
               .collect()}
        assert out == {3: 1, 2: 3, 1: 1}


class TestAcf:
    def _series(self, spark, values):
        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (t0 + datetime.timedelta(hours=i), float(v))
            for i, v in enumerate(values)
        ]
        return spark.createDataFrame(rows, "bucket_start timestamp, v double")

    def _local_acf(self, xs, k):
        n = len(xs)
        m = sum(xs) / n
        den = sum((x - m) ** 2 for x in xs)
        num = sum((xs[t] - m) * (xs[t + k] - m) for t in range(n - k))
        return num / den

    def test_matches_local(self, spark):
        xs = [1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 5.0, 8.0]
        out = {
            r["lag"]: r
            for r in acf(self._series(spark, xs), "v", max_lag=3).collect()
        }
        for k in (1, 2, 3):
            assert out[k]["acf_value"] == pytest.approx(
                self._local_acf(xs, k), abs=1e-12
            )
            assert out[k]["n_pairs"] == len(xs) - k

    def test_constant_series_null_acf(self, spark):
        out = acf(self._series(spark, [2.0] * 6), "v", max_lag=2).collect()
        assert all(r["acf_value"] is None for r in out)

    def test_gaps_pair_only_existing(self, spark):
        df = self._series(spark, [1.0, 2.0, 3.0, 4.0, 5.0])
        df = df.where(F.hour("bucket_start") != 2)  # drop index 2
        out = {r["lag"]: r for r in acf(df, "v", max_lag=1).collect()}
        # pairs at lag 1: (0,1), (3,4) -> 2 pairs
        assert out[1]["n_pairs"] == 2

    def test_keys(self, spark):
        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        for g, xs in [("a", [1.0, 2.0, 1.0, 2.0]), ("b", [1.0, 2.0, 3.0, 4.0])]:
            rows += [
                (g, t0 + datetime.timedelta(hours=i), v)
                for i, v in enumerate(xs)
            ]
        df = spark.createDataFrame(
            rows, "g string, bucket_start timestamp, v double"
        )
        out = {
            (r["g"], r["lag"]): r["acf_value"]
            for r in acf(df, "v", max_lag=1, keys=["g"]).collect()
        }
        assert out[("a", 1)] == pytest.approx(
            self._local_acf([1.0, 2.0, 1.0, 2.0], 1), abs=1e-12
        )
        assert out[("b", 1)] == pytest.approx(
            self._local_acf([1.0, 2.0, 3.0, 4.0], 1), abs=1e-12
        )

    def test_validation(self, spark):
        df = self._series(spark, [1.0, 2.0])
        with pytest.raises(ValueError, match="max_lag"):
            acf(df, "v", max_lag=0)
        with pytest.raises(ValueError, match="step_seconds"):
            acf(df, "v", step_seconds=0)


class TestMannKendall:
    def _series(self, spark, values):
        import datetime
        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (t0 + datetime.timedelta(hours=i), float(v))
            for i, v in enumerate(values)
        ]
        return spark.createDataFrame(rows, "bucket_start timestamp, v double")

    def _local_mk(self, xs):
        import math
        from collections import Counter
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n) for j in range(i + 1, n)
        )
        ties = Counter(xs)
        tie = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var_s = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        n0 = n * (n - 1) / 2.0
        n1 = sum(t * (t - 1) / 2.0 for t in ties.values())
        tau = s / math.sqrt(n0 * (n0 - n1))
        if s > 0:
            z = (s - 1) / math.sqrt(var_s)
        elif s < 0:
            z = (s + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        return s, var_s, tau, z

    def test_matches_local_with_ties(self, spark):
        from pandera_spark.operators.temporal import mann_kendall

        xs = [1.0, 3.0, 2.0, 3.0, 5.0, 4.0, 5.0, 7.0, 6.0, 8.0]
        out = mann_kendall(self._series(spark, xs), "v").first()
        s, var_s, tau, z = self._local_mk(xs)
        assert out["s_stat"] == pytest.approx(s)
        assert out["var_s"] == pytest.approx(var_s, rel=1e-12)
        assert out["tau_b"] == pytest.approx(tau, rel=1e-12)
        assert out["z"] == pytest.approx(z, rel=1e-12)
        assert out["n"] == len(xs)
        assert out["pvalue"] < 0.05  # clearly increasing

    def test_no_trend_and_decreasing(self, spark):
        from pandera_spark.operators.temporal import mann_kendall

        flat = mann_kendall(self._series(spark, [2.0] * 8), "v").first()
        assert flat["s_stat"] == 0.0
        assert flat["z"] is None  # all-tied -> var_s == 0
        dec = mann_kendall(
            self._series(spark, [9.0, 7.0, 8.0, 5.0, 4.0, 3.0, 1.0]), "v"
        ).first()
        assert dec["s_stat"] < 0 and dec["tau_b"] < 0

    def test_keys(self, spark):
        import datetime
        from pandera_spark.operators.temporal import mann_kendall

        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        for g, xs in [("up", [1, 2, 3, 4, 5]), ("dn", [5, 4, 3, 2, 1])]:
            rows += [
                (g, t0 + datetime.timedelta(hours=i), float(v))
                for i, v in enumerate(xs)
            ]
        df = spark.createDataFrame(
            rows, "g string, bucket_start timestamp, v double"
        )
        out = {r["g"]: r for r in mann_kendall(df, "v", keys=["g"]).collect()}
        assert out["up"]["s_stat"] == 10.0 and out["dn"]["s_stat"] == -10.0
        assert out["up"]["tau_b"] == pytest.approx(1.0)

    def test_keyed_plan_has_no_cartesian(self, spark):
        import datetime
        from pandera_spark.operators.temporal import mann_kendall

        t0 = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("g", t0 + datetime.timedelta(hours=i), float(i))
             for i in range(4)],
            "g string, bucket_start timestamp, v double",
        )
        plan = mann_kendall(
            df, "v", keys=["g"]
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


class TestTimeWeightedMean:
    def _df(self, spark, rows):
        import datetime
        t0 = datetime.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(t0 + datetime.timedelta(seconds=s), float(v)) for s, v in rows],
            "ts timestamp, v double",
        )

    def test_twap_vs_hand(self, spark):
        from pandera_spark.operators.temporal import time_weighted_mean

        # value 10 in force 100s, value 2 in force 300s; last (8) dropped
        df = self._df(spark, [(0, 10.0), (100, 2.0), (400, 8.0)])
        out = time_weighted_mean(df, "ts", "v").first()
        assert out["twap"] == pytest.approx((10 * 100 + 2 * 300) / 400)
        assert out["span_seconds"] == pytest.approx(400.0)
        assert out["n"] == 3
        assert out["simple_mean"] == pytest.approx(20 / 3)

    def test_horizon_extends_last(self, spark):
        from pandera_spark.operators.temporal import time_weighted_mean

        df = self._df(spark, [(0, 10.0), (100, 2.0)])
        out = time_weighted_mean(
            df, "ts", "v", horizon_end="2024-01-01 00:03:20"
        ).first()
        # 10 for 100s, 2 for 100s until the 200s horizon
        assert out["twap"] == pytest.approx((10 * 100 + 2 * 100) / 200)

    def test_keys_and_single_point(self, spark):
        import datetime
        from pandera_spark.operators.temporal import time_weighted_mean

        t0 = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("a", t0, 5.0),
             ("a", t0 + datetime.timedelta(seconds=10), 7.0),
             ("b", t0, 3.0)],
            "g string, ts timestamp, v double",
        )
        out = {r["g"]: r for r in
               time_weighted_mean(df, "ts", "v", keys=["g"]).collect()}
        assert out["a"]["twap"] == pytest.approx(5.0)  # only first weighted
        assert out["b"]["twap"] is None  # no successor, no horizon
        assert out["b"]["simple_mean"] == pytest.approx(3.0)


class TestTheilSen:
    def _series(self, spark, values):
        import datetime
        t0 = datetime.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(t0 + datetime.timedelta(hours=i), float(v))
             for i, v in enumerate(values)],
            "bucket_start timestamp, v double",
        )

    def _local(self, xs):
        import statistics
        n = len(xs)
        slopes = [
            (xs[j] - xs[i]) / (j - i)
            for i in range(n) for j in range(i + 1, n)
        ]
        slope = statistics.median(slopes)
        # ticks are epoch-hours, not 0-based: intercept uses the same
        # absolute ticks the operator sees
        import datetime
        t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
        base_tick = int(t0.timestamp()) // 3600
        inter = statistics.median(
            x - slope * (base_tick + i) for i, x in enumerate(xs)
        )
        return slope, inter

    def test_matches_local(self, spark):
        from pandera_spark.operators.temporal import theil_sen

        xs = [1.0, 2.5, 2.0, 4.0, 3.5, 6.0, 5.0, 7.5]
        out = theil_sen(self._series(spark, xs), "v").first()
        slope, inter = self._local(xs)
        assert out["slope"] == pytest.approx(slope, abs=1e-12)
        assert out["intercept"] == pytest.approx(inter, rel=1e-9)
        assert out["n"] == len(xs)

    def test_outlier_robustness(self, spark):
        from pandera_spark.operators.temporal import theil_sen

        clean = [float(2 * i + 1) for i in range(12)]
        dirty = clean.copy()
        dirty[3] = 500.0
        dirty[8] = -400.0
        a = theil_sen(self._series(spark, clean), "v").first()
        b = theil_sen(self._series(spark, dirty), "v").first()
        assert a["slope"] == pytest.approx(2.0, abs=1e-12)
        assert b["slope"] == pytest.approx(2.0, abs=0.3)  # barely moves

    def test_keys(self, spark):
        import datetime
        from pandera_spark.operators.temporal import theil_sen

        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        for g, sl in (("up", 3.0), ("dn", -1.0)):
            rows += [(g, t0 + datetime.timedelta(hours=i), sl * i)
                     for i in range(6)]
        df = spark.createDataFrame(
            rows, "g string, bucket_start timestamp, v double"
        )
        out = {r["g"]: r for r in theil_sen(df, "v", keys=["g"]).collect()}
        assert out["up"]["slope"] == pytest.approx(3.0, abs=1e-12)
        assert out["dn"]["slope"] == pytest.approx(-1.0, abs=1e-12)
