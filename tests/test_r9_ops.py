"""Round-9 statistics additions: Brown-Forsythe variance homogeneity,
Herfindahl concentration, hash-replayable randomization test, effect
sizes, Kendall tau-b, Yuen's trimmed t, and PMI collocations.

Each test pins the operator against an independent local reference
(numpy / brute force) on data with ties, skew, and group imbalance.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.abtest import effect_size
from pandera_spark.operators.ranks import kendall_tau_b, yuen_trimmed_t
from pandera_spark.operators.stats import (
    brown_forsythe,
    herfindahl,
    randomization_test_mean,
)
from pandera_spark.operators.text import pmi_collocations


@pytest.fixture(scope="module")
def rng_rows():
    import random

    random.seed(11)
    return [
        (float(random.randint(0, 30)), float(random.randint(0, 9)),
         "A" if random.random() < 0.6 else "B", i)
        for i in range(400)
    ]


@pytest.fixture(scope="module")
def xdf(spark, rng_rows):
    return spark.createDataFrame(
        rng_rows, "x double, y double, g string, id long"
    )


class TestBrownForsythe:
    def test_matches_numpy(self, spark, xdf, rng_rows):
        x = np.array([r[0] for r in rng_rows])
        gs = np.array([r[2] for r in rng_rows])
        za = np.abs(x[gs == "A"] - np.median(x[gs == "A"]))
        zb = np.abs(x[gs == "B"] - np.median(x[gs == "B"]))
        z = np.concatenate([za, zb])
        ssb = (
            len(za) * (za.mean() - z.mean()) ** 2
            + len(zb) * (zb.mean() - z.mean()) ** 2
        )
        ssw = ((za - za.mean()) ** 2).sum() + ((zb - zb.mean()) ** 2).sum()
        f_ref = (ssb / 1.0) / (ssw / (len(z) - 2))
        row = brown_forsythe(xdf, "x", "g").first()
        assert row["k"] == 2 and row["n"] == len(z)
        assert row["f_stat"] == pytest.approx(f_ref, rel=1e-9)

    def test_detects_unequal_spread(self, spark):
        rows = [(float(i % 5), "tight") for i in range(200)]
        rows += [(float((i * 37) % 100), "wide") for i in range(200)]
        df = spark.createDataFrame(rows, "x double, g string")
        row = brown_forsythe(df, "x", "g").first()
        # wide group's spread dwarfs the tight group's -> huge F
        assert row["f_stat"] > 50

    def test_nulls_drop(self, spark):
        df = spark.createDataFrame(
            [(1.0, "a"), (None, "a"), (2.0, "a"), (5.0, "b"), (9.0, "b")],
            "x double, g string",
        )
        assert brown_forsythe(df, "x", "g").first()["n"] == 4


class TestHerfindahl:
    def test_uniform_vs_concentrated(self, spark):
        uni = spark.createDataFrame(
            [(g, 1.0) for g in "abcd" for _ in range(5)],
            "g string, w double",
        )
        r = herfindahl(uni, "g", F.col("w")).first()
        assert r["hhi"] == pytest.approx(0.25)
        assert r["hhi_normalized"] == pytest.approx(0.0, abs=1e-12)
        assert r["effective_k"] == pytest.approx(4.0)
        conc = spark.createDataFrame(
            [("a", 97.0), ("b", 1.0), ("c", 1.0), ("d", 1.0)],
            "g string, w double",
        )
        r2 = herfindahl(conc, "g", F.col("w")).first()
        assert r2["hhi"] > 0.9 and r2["hhi_normalized"] > 0.9
        assert r2["effective_k"] < 1.1

    def test_rowcount_weight_default(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 3 + [("b",)] * 1, "g string"
        )
        r = herfindahl(df, "g").first()
        assert r["total"] == pytest.approx(4.0)
        assert r["hhi"] == pytest.approx((9 + 1) / 16.0)


class TestRandomizationTest:
    def test_null_is_uniformish_and_deterministic(self, spark, xdf):
        out1 = randomization_test_mean(
            xdf, "x", "g", "A", "B", "id", n_rep=32
        ).first()
        out2 = randomization_test_mean(
            xdf, "x", "g", "A", "B", "id", n_rep=32
        ).first()
        # pure hash -> bit-identical reruns
        assert out1["n_extreme"] == out2["n_extreme"]
        assert out1["pvalue"] == out2["pvalue"]
        assert 0 < out1["pvalue"] <= 1
        # x is independent of g -> should not be extreme-significant
        assert out1["pvalue"] > 1.0 / 33

    def test_detects_real_shift(self, spark):
        rows = [(float(i % 10), "A", i) for i in range(300)]
        rows += [(float(i % 10) + 6.0, "B", 1000 + i) for i in range(300)]
        df = spark.createDataFrame(rows, "x double, g string, id long")
        out = randomization_test_mean(
            df, "x", "g", "A", "B", "id", n_rep=64
        ).first()
        assert out["obs_diff"] == pytest.approx(-6.0)
        # no relabeling reaches a 6-point gap
        assert out["n_extreme"] == 0
        assert out["pvalue"] == pytest.approx(1.0 / 65)

    def test_empty_group_raises(self, spark):
        df = spark.createDataFrame(
            [(1.0, "A", 1), (2.0, "A", 2)], "x double, g string, id long"
        )
        with pytest.raises(ValueError, match="both groups"):
            randomization_test_mean(df, "x", "g", "A", "B", "id")


class TestEffectSize:
    def test_matches_numpy(self, spark, xdf, rng_rows):
        x = np.array([r[0] for r in rng_rows])
        gs = np.array([r[2] for r in rng_rows])
        a, b = x[gs == "A"], x[gs == "B"]
        sp = math.sqrt(
            ((len(a) - 1) * a.var(ddof=1) + (len(b) - 1) * b.var(ddof=1))
            / (len(a) + len(b) - 2)
        )
        d_ref = (a.mean() - b.mean()) / sp
        g_ref = d_ref * (1 - 3.0 / (4 * (len(a) + len(b)) - 9))
        row = effect_size(xdf, "x", "g", "A", "B").first()
        assert row["cohens_d"] == pytest.approx(d_ref, rel=1e-12)
        assert row["hedges_g"] == pytest.approx(g_ref, rel=1e-12)
        assert row["var_ratio"] == pytest.approx(
            a.var(ddof=1) / b.var(ddof=1), rel=1e-12
        )

    def test_degenerate_null_not_error(self, spark):
        df = spark.createDataFrame(
            [(1.0, "A"), (1.0, "A"), (1.0, "B")], "x double, g string"
        )
        row = effect_size(df, "x", "g", "A", "B").first()
        # zero pooled variance -> NULL d, no ANSI error
        assert row["cohens_d"] is None


class TestKendallTauB:
    def test_matches_bruteforce(self, spark, xdf, rng_rows):
        x = np.array([r[0] for r in rng_rows])
        y = np.array([r[1] for r in rng_rows])
        C = D = 0
        for i in range(len(x)):
            s = (x[i + 1:] - x[i]) * (y[i + 1:] - y[i])
            C += int((s > 0).sum())
            D += int((s < 0).sum())
        row = kendall_tau_b(xdf, "x", "y").first()
        assert row["concordant"] == C and row["discordant"] == D
        n = len(x)
        n0 = n * (n - 1) / 2
        from collections import Counter

        n1 = sum(v * (v - 1) / 2 for v in Counter(x).values())
        n2 = sum(v * (v - 1) / 2 for v in Counter(y).values())
        tau_ref = (C - D) / math.sqrt((n0 - n1) * (n0 - n2))
        assert row["tau_b"] == pytest.approx(tau_ref, rel=1e-12)

    def test_perfect_orders(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(i * 2)) for i in range(50)], "x double, y double"
        )
        assert kendall_tau_b(df, "x", "y").first()["tau_b"] == pytest.approx(1.0)
        df2 = spark.createDataFrame(
            [(float(i), float(-i)) for i in range(50)], "x double, y double"
        )
        assert kendall_tau_b(df2, "x", "y").first()["tau_b"] == pytest.approx(-1.0)


class TestYuenTrimmedT:
    @staticmethod
    def _ref(a, trim=0.2):
        a = np.sort(a)
        n = len(a)
        k = int(np.floor(trim * n))
        h = n - 2 * k
        tm = a[k:n - k].mean()
        w = a.copy()
        w[:k] = a[k]
        w[n - k:] = a[n - k - 1]
        return n, h, tm, w.var(ddof=1)

    def test_matches_numpy(self, spark, xdf, rng_rows):
        x = np.array([r[0] for r in rng_rows])
        gs = np.array([r[2] for r in rng_rows])
        na, ha, tma, swa = self._ref(x[gs == "A"])
        nb, hb, tmb, swb = self._ref(x[gs == "B"])
        da = swa * (na - 1) / (ha * (ha - 1))
        db = swb * (nb - 1) / (hb * (hb - 1))
        t_ref = (tma - tmb) / math.sqrt(da + db)
        dof_ref = (da + db) ** 2 / (da ** 2 / (ha - 1) + db ** 2 / (hb - 1))
        row = yuen_trimmed_t(xdf, "x", "g", "A", "B").first()
        assert (row["h_a"], row["h_b"]) == (ha, hb)
        assert row["tmean_a"] == pytest.approx(tma, rel=1e-12)
        assert row["tmean_b"] == pytest.approx(tmb, rel=1e-12)
        assert row["t_stat"] == pytest.approx(t_ref, rel=1e-9)
        assert row["dof"] == pytest.approx(dof_ref, rel=1e-9)

    def test_outlier_robust(self, spark):
        # same central mass, one group has monster outliers: Yuen's
        # trimmed means should stay close (|t| small)
        rows = [(float(i % 10), "A") for i in range(100)]
        rows += [(float(i % 10), "B") for i in range(95)]
        rows += [(1e6, "B")] * 5
        df = spark.createDataFrame(rows, "x double, g string")
        row = yuen_trimmed_t(df, "x", "g", "A", "B").first()
        assert abs(row["t_stat"]) < 2.0

    def test_bad_trim_raises(self, spark, xdf):
        with pytest.raises(ValueError, match="trim"):
            yuen_trimmed_t(xdf, "x", "g", "A", "B", trim=0.5)


class TestPmiCollocations:
    def test_hand_corpus(self, spark):
        # "new york" always together; "the" everywhere
        docs = [
            ("d1", "the new york times the report"),
            ("d2", "new york skyline the photo"),
            ("d3", "the report the photo new york"),
            ("d4", "new york new york the the"),
        ]
        df = spark.createDataFrame(docs, "doc_id string, text string")
        out = pmi_collocations(df, "text", min_count=2, k=5).collect()
        assert out, "expected collocations"
        top = out[0]
        assert top["gram"] == "new york"
        # verify the closed form on the top pair
        uni = {}
        n_uni = n_bi = 0
        bi = {}
        for _, t in docs:
            toks = t.split(" ")
            for w in toks:
                uni[w] = uni.get(w, 0) + 1
                n_uni += 1
            for a, b in zip(toks, toks[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
                n_bi += 1
        ref = math.log(
            (bi[("new", "york")] / n_bi)
            / ((uni["new"] / n_uni) * (uni["york"] / n_uni))
        )
        assert top["pmi"] == pytest.approx(ref, rel=1e-12)

    def test_min_count_floors(self, spark):
        df = spark.createDataFrame(
            [("d1", "a b c d"), ("d2", "a b x y")],
            "doc_id string, text string",
        )
        out = pmi_collocations(df, "text", min_count=2, k=10).collect()
        assert [r["gram"] for r in out] == ["a b"]
        with pytest.raises(ValueError, match="min_count"):
            pmi_collocations(df, "text", min_count=0)


class TestMedianTest:
    def test_matches_manual(self, spark):
        import random

        random.seed(3)
        rows = [(float(random.randint(0, 30)), random.choice("ABC"))
                for _ in range(600)]
        df = spark.createDataFrame(rows, "x double, g string")
        from pandera_spark.operators.stats import median_test

        x = np.array([r[0] for r in rows])
        g = np.array([r[1] for r in rows])
        med = np.percentile(x, 50, method="linear")
        A, N, S = (x > med).sum(), len(x), 0.0
        for lvl in "ABC":
            m = g == lvl
            S += (x[m] > med).sum() ** 2 / m.sum()
        chi2_ref = N * (N * S - A * A) / (A * (N - A))
        r = median_test(df, "x", "g").first()
        assert r["k"] == 3 and r["n"] == N and r["n_above"] == A
        assert r["chi2_stat"] == pytest.approx(chi2_ref, rel=1e-12)
        assert 0 < r["pvalue"] < 1

    def test_detects_shift_and_degenerate(self, spark):
        from pandera_spark.operators.stats import median_test

        rows = [(float(i % 20), "A") for i in range(300)]
        rows += [(float(i % 20) + 10.0, "B") for i in range(300)]
        df = spark.createDataFrame(rows, "x double, g string")
        r = median_test(df, "x", "g").first()
        assert r["chi2_stat"] > 50 and r["pvalue"] < 1e-6
        # one group only -> dof 0, NULL chi2/pvalue (no ANSI error)
        one = spark.createDataFrame([(1.0, "A"), (2.0, "A")],
                                    "x double, g string")
        r1 = median_test(one, "x", "g").first()
        assert r1["dof"] == 0 and r1["pvalue"] is None
        # all-null input: EMPTY result frame (r12 — the pooled-median
        # probe folded into the lazy plan, so there is no build-time
        # action left to raise from; the closing k > 0 filter drops
        # the degenerate row instead)
        empty = median_test(
            spark.createDataFrame([(None, "A")], "x double, g string"),
            "x", "g",
        )
        assert empty.count() == 0
