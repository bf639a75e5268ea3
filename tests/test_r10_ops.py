"""Round-10 additions: URL/domain curation operators (weburl), the
sample-ratio-mismatch gate, TOST equivalence, plus the r9-advice
hardening (median_test dof-1 exact lane, herfindahl NULL weights,
yuen h=1 ANSI guard).

Each test pins the operator against an independent local reference
(hand computation / numpy) on data covering the edge shapes the
ADVICE items named.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.abtest import srm_check, tost_equivalence
from pandera_spark.operators.stats import herfindahl, median_test
from pandera_spark.operators.ranks import yuen_trimmed_t
from pandera_spark.operators.weburl import (
    domain_cap,
    domain_stats,
    registrable_domain,
    url_features,
    url_host,
)


@pytest.fixture(scope="module")
def urls_df(spark):
    rows = [
        (1, "https://www.example.com/a/b?x=1&utm_source=news"),
        (2, "https://blog.example.com/a"),
        (3, "http://example.co.uk/"),
        (4, "https://deep.sub.example.co.uk/a/b/c?gclid=42"),
        (5, "https://something.weirdtld/p"),   # unknown TLD fallback
        (6, "https://localhost/admin"),        # single label -> NULL
        (7, "https://example.com:8080/x"),     # port excluded from host
        (8, "not a url at all"),               # malformed -> NULL host
        (9, "https://UPPER.Example.COM/Y"),    # case folding
        (10, "https://docs.python.org/3/library/index.html?a=1&b=2&c=3"),
    ]
    return spark.createDataFrame(rows, "id long, url string")


class TestHostAndDomain:
    def test_host_and_registrable_domain(self, spark, urls_df):
        out = urls_df.select(
            "id",
            url_host(F.col("url")).alias("host"),
            registrable_domain(url_host(F.col("url"))).alias("dom"),
        )
        got = {r["id"]: (r["host"], r["dom"]) for r in out.collect()}
        assert got[1] == ("www.example.com", "example.com")
        assert got[2] == ("blog.example.com", "example.com")
        assert got[3] == ("example.co.uk", "example.co.uk")
        assert got[4] == ("deep.sub.example.co.uk", "example.co.uk")
        # unknown TLD: fall back to the last two labels
        assert got[5] == ("something.weirdtld", "something.weirdtld")
        # single-label host has nothing registrable
        assert got[6] == ("localhost", None)
        # parse_url HOST excludes the port
        assert got[7] == ("example.com", "example.com")
        assert got[8] == (None, None)
        assert got[9] == ("upper.example.com", "example.com")
        assert got[10] == ("docs.python.org", "python.org")

    def test_bare_suffix_host_yields_null(self, spark):
        df = spark.createDataFrame(
            [("https://co.uk/x",), ("https://com/x",)], "url string"
        )
        out = df.select(
            registrable_domain(url_host(F.col("url"))).alias("dom")
        ).collect()
        assert [r["dom"] for r in out] == [None, None]


class TestUrlFeatures:
    def test_features(self, spark, urls_df):
        out = url_features(urls_df, "url")
        got = {r["id"]: r.asDict() for r in out.collect()}
        assert got[1]["url_path_depth"] == 2
        assert got[1]["url_n_params"] == 2
        assert got[1]["url_has_tracking"] is True
        assert got[1]["url_is_https"] is True
        assert got[2]["url_n_params"] == 0
        assert got[2]["url_has_tracking"] is False
        assert got[3]["url_path_depth"] == 0
        assert got[3]["url_is_https"] is False
        assert got[4]["url_has_tracking"] is True   # gclid
        assert got[10]["url_n_params"] == 3
        assert got[10]["url_has_tracking"] is False
        assert got[10]["url_path_depth"] == 3
        assert got[1]["url_host_labels"] == 3


class TestDomainStatsAndCap:
    def test_domain_stats(self, spark):
        rows = [
            (i, f"https://h{i % 3}.example.com/p", float(i))
            for i in range(8)
        ] + [(100 + i, "https://one.example.co.uk/p", 1.0)
             for i in range(2)]
        df = spark.createDataFrame(rows, "id long, url string, q double")
        out = {
            r["domain"]: r
            for r in domain_stats(df, "url", quality_col="q").collect()
        }
        assert out["example.com"]["n_docs"] == 8
        assert out["example.com"]["n_hosts"] == 3
        assert out["example.co.uk"]["n_docs"] == 2
        assert out["example.co.uk"]["n_hosts"] == 1
        assert abs(out["example.com"]["share"] - 0.8) < 1e-12
        assert abs(out["example.com"]["mean_quality"] - 3.5) < 1e-12

    def test_domain_stats_approx_hosts(self, spark):
        rows = [
            (i, f"https://h{i % 3}.example.com/p", float(i))
            for i in range(8)
        ]
        df = spark.createDataFrame(rows, "id long, url string, q double")
        out = domain_stats(df, "url", approx_hosts=True).collect()[0]
        # HLL is exact at this cardinality; docs/share stay exact
        assert out["n_hosts"] == 3 and out["n_docs"] == 8

    def test_domain_cap_deterministic(self, spark):
        rows = [
            (i, f"https://x.dom{i % 4}.com/p") for i in range(200)
        ]
        df = spark.createDataFrame(rows, "id long, url string")
        out = domain_cap(
            df, "url", max_per_domain=7, key_col="id",
            domain_out="dom",
        )
        counts = {
            r["dom"]: r["count"]
            for r in out.groupBy("dom").count().collect()
        }
        assert set(counts.values()) == {7}
        # row-order independence: same kept set after a reshuffle
        kept1 = sorted(r["id"] for r in out.collect())
        kept2 = sorted(
            r["id"]
            for r in domain_cap(
                df.repartition(7), "url", max_per_domain=7,
                key_col="id", domain_out="dom",
            ).collect()
        )
        assert kept1 == kept2
        # a different salt draws a different subset
        kept3 = sorted(
            r["id"]
            for r in domain_cap(
                df, "url", max_per_domain=7, key_col="id",
                salt="v2", domain_out="dom",
            ).collect()
        )
        assert kept3 != kept1


class TestSrmCheck:
    def test_no_mismatch(self, spark):
        rows = [("a",)] * 500 + [("b",)] * 500
        df = spark.createDataFrame(rows, "g string")
        r = srm_check(df, "g", {"a": 1, "b": 1}).collect()[0]
        assert r["n"] == 1000
        assert r["chi2_stat"] == 0.0
        assert r["dof"] == 1
        assert r["pvalue"] == pytest.approx(1.0, abs=1e-6)
        assert r["max_share_dev"] == 0.0

    def test_detects_mismatch(self, spark):
        rows = [("a",)] * 520 + [("b",)] * 480 + [("other",)] * 33
        df = spark.createDataFrame(rows, "g string")
        r = srm_check(df, "g", {"a": 1, "b": 1}).collect()[0]
        # "other" is excluded
        assert r["n"] == 1000
        # chi2 = (520-500)^2/500 + (480-500)^2/500 = 1.6
        assert r["chi2_stat"] == pytest.approx(1.6, abs=1e-9)
        assert r["max_share_dev"] == pytest.approx(0.02, abs=1e-12)
        # dof=1 exact lane: p = 2*Phi_bar(sqrt(1.6))
        assert r["pvalue"] == pytest.approx(0.2059, abs=2e-4)

    def test_unequal_weights(self, spark):
        rows = [("a",)] * 900 + [("b",)] * 100
        df = spark.createDataFrame(rows, "g string")
        r = srm_check(df, "g", {"a": 9, "b": 1}).collect()[0]
        assert r["chi2_stat"] == pytest.approx(0.0, abs=1e-9)

    def test_zero_observed_arm_dominates_dev(self, spark):
        # a fully missing arm IS the worst mismatch: dev must read the
        # absent arm's expected share, not the max over observed arms
        rows = [("a",)] * 500 + [("b",)] * 500
        df = spark.createDataFrame(rows, "g string")
        r = srm_check(df, "g", {"a": 1, "b": 1, "c": 1}).collect()[0]
        assert r["n"] == 1000
        assert r["max_share_dev"] == pytest.approx(1.0 / 3.0, abs=1e-12)
        # chi2 = sum o^2/(n w) - n = (2*500^2/(1000/3)) - 1000 = 500
        assert r["chi2_stat"] == pytest.approx(500.0, abs=1e-9)
        assert r["dof"] == 2
        assert r["pvalue"] == pytest.approx(0.0, abs=1e-9)

    def test_bad_weights_raise(self, spark):
        df = spark.createDataFrame([("a",)], "g string")
        with pytest.raises(ValueError):
            srm_check(df, "g", {})
        with pytest.raises(ValueError):
            srm_check(df, "g", {"a": 0.0})

    def test_empty_input_null_chi2(self, spark):
        # zero matching rows: chi2 must come back NULL, not raise
        # DIVIDE_BY_ZERO under ANSI (the 0/0 __s/n division)
        df = spark.createDataFrame([], "g string")
        r = srm_check(df, "g", {"a": 1, "b": 1}).collect()[0]
        assert r["n"] == 0
        assert r["chi2_stat"] is None and r["pvalue"] is None

    def test_no_expected_level_present_null_chi2(self, spark):
        df = spark.createDataFrame([("zz",)] * 10, "g string")
        r = srm_check(df, "g", {"a": 1, "b": 1}).collect()[0]
        assert r["n"] == 0
        assert r["chi2_stat"] is None
        # both arms fully absent: dev = the larger expected share
        assert r["max_share_dev"] == pytest.approx(0.5, abs=1e-12)


class TestTostEquivalence:
    def test_equivalent_when_identical(self, spark):
        import random

        random.seed(3)
        rows = [
            (float(random.gauss(10, 2)), "a" if i % 2 == 0 else "b")
            for i in range(2000)
        ]
        df = spark.createDataFrame(rows, "x double, g string")
        r = tost_equivalence(
            df, "x", "g", "a", "b", margin=1.0
        ).collect()[0]
        assert r["equivalent"] is True
        assert r["p_tost"] < 0.001
        # z_lower = (diff + margin)/se, z_upper = (diff - margin)/se
        assert r["z_lower"] > 0 > r["z_upper"]

    def test_not_equivalent_with_real_gap(self, spark):
        rows = [(10.0 + (i % 7) * 0.1, "a") for i in range(300)] + [
            (13.0 + (i % 7) * 0.1, "b") for i in range(300)
        ]
        df = spark.createDataFrame(rows, "x double, g string")
        r = tost_equivalence(
            df, "x", "g", "a", "b", margin=1.0
        ).collect()[0]
        assert r["equivalent"] is False
        assert r["mean_diff"] == pytest.approx(-3.0, abs=1e-9)

    def test_margin_validation(self, spark):
        df = spark.createDataFrame([(1.0, "a")], "x double, g string")
        with pytest.raises(ValueError):
            tost_equivalence(df, "x", "g", "a", "b", margin=0.0)

    def test_degenerate_group_yields_nulls(self, spark):
        df = spark.createDataFrame(
            [(1.0, "a"), (2.0, "a"), (3.0, "b")], "x double, g string"
        )
        r = tost_equivalence(df, "x", "g", "a", "b", margin=1.0).collect()[0]
        assert r["se"] is None and r["p_tost"] is None


class TestAdviceHardening:
    def test_median_test_dof1_exact_lane(self, spark):
        # k=2: p must use the exact chi2_1 = Z^2 identity, not W-H
        rows = [(float(v), "a") for v in [1, 2, 3, 4, 10, 11]] + [
            (float(v), "b") for v in [5, 6, 7, 8, 9, 12]
        ]
        df = spark.createDataFrame(rows, "x double, g string")
        r = median_test(df, "x", "g").collect()[0]
        assert r["dof"] == 1
        z = math.sqrt(r["chi2_stat"])
        # A&S 26.2.17 upper tail, same closed form the engine uses
        t = 1.0 / (1.0 + 0.2316419 * z)
        poly = t * (0.319381530 + t * (-0.356563782 + t * (
            1.781477937 + t * (-1.821255978 + t * 1.330274429))))
        expect = 2.0 * math.exp(-z * z / 2) / 2.5066282746310002 * poly
        assert r["pvalue"] == pytest.approx(expect, abs=1e-12)

    def test_herfindahl_null_weights_dropped(self, spark):
        rows = [
            ("a", 10.0), ("a", 10.0), ("b", 20.0),
            ("c", None), ("c", None),       # all-NULL group: no mass
            ("b", None),                    # partial-NULL row drops
        ]
        df = spark.createDataFrame(rows, "g string, w double")
        r = herfindahl(df, "g", F.col("w")).collect()[0]
        # only groups a (20) and b (20) carry mass -> k=2, hhi=0.5
        assert r["k"] == 2
        assert r["total"] == pytest.approx(40.0)
        assert r["hhi"] == pytest.approx(0.5, abs=1e-12)
        assert r["effective_k"] == pytest.approx(2.0, abs=1e-9)

    def test_yuen_h1_no_ansi_error(self, spark):
        # group b retains a single value after trimming (n=2, trim=0.3
        # -> k=0... force h=1 via n=1): must yield NULL t, not a
        # DIVIDE_BY_ZERO under ANSI
        rows = [(float(v), "a") for v in range(10)] + [(5.0, "b")]
        df = spark.createDataFrame(rows, "x double, g string")
        r = yuen_trimmed_t(df, "x", "g", "a", "b", trim=0.2).collect()[0]
        assert r["h_b"] == 1
        assert r["t_stat"] is None and r["dof"] is None


class TestPrAuc:
    def test_matches_hand_reference(self, spark):
        from pandera_spark.operators.evalmetrics import pr_auc

        rows = [(0.9, 1), (0.8, 0), (0.7, 1), (0.6, 1), (0.5, 0),
                (0.4, 0), (0.3, 1)]
        df = spark.createDataFrame(rows, "s double, y int")
        r = pr_auc(df, "s", "y").collect()[0]
        # sklearn average_precision_score convention, no ties:
        # hits at ranks 1,3,4,7 -> AP = (1/1 + 2/3 + 3/4 + 4/7)/4
        want = (1.0 + 2.0 / 3.0 + 3.0 / 4.0 + 4.0 / 7.0) / 4.0
        assert r["average_precision"] == pytest.approx(want, abs=1e-12)
        assert r["n_pos"] == 4 and r["n_neg"] == 3
        assert r["prevalence"] == pytest.approx(4 / 7, abs=1e-12)

    def test_tie_group_is_one_threshold(self, spark):
        from pandera_spark.operators.evalmetrics import pr_auc

        # two tied scores (one pos, one neg) enter as ONE threshold:
        # thresholds: s=0.9 (tp=1, pp=1), s=0.5 (tp=2, pp=3)
        rows = [(0.9, 1), (0.5, 1), (0.5, 0)]
        df = spark.createDataFrame(rows, "s double, y int")
        r = pr_auc(df, "s", "y").collect()[0]
        want = (1.0 * 1.0 / 1.0 + 1.0 * 2.0 / 3.0) / 2.0
        assert r["average_precision"] == pytest.approx(want, abs=1e-12)

    def test_no_positives_yields_null(self, spark):
        from pandera_spark.operators.evalmetrics import pr_auc

        df = spark.createDataFrame([(0.5, 0), (0.4, 0)], "s double, y int")
        r = pr_auc(df, "s", "y").collect()[0]
        assert r["average_precision"] is None
        assert r["n_pos"] == 0 and r["n_neg"] == 2

    def test_perfect_ranking(self, spark):
        from pandera_spark.operators.evalmetrics import pr_auc

        rows = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
        df = spark.createDataFrame(rows, "s double, y int")
        r = pr_auc(df, "s", "y").collect()[0]
        assert r["average_precision"] == pytest.approx(1.0, abs=1e-12)


class TestFriedman:
    def test_matches_scipy_formula(self, spark):
        from pandera_spark.operators.ranks import friedman_test

        # 4 blocks x 3 treatments, no ties (scipy.friedmanchisquare
        # closed form: Q = 12/(nk(k+1)) sum R^2 - 3n(k+1))
        data = {
            "b1": {"t1": 1.0, "t2": 2.0, "t3": 3.0},
            "b2": {"t1": 2.0, "t2": 1.0, "t3": 3.0},
            "b3": {"t1": 1.0, "t2": 2.0, "t3": 3.0},
            "b4": {"t1": 1.0, "t2": 3.0, "t3": 2.0},
        }
        rows = [(b, t, v) for b, ts in data.items()
                for t, v in ts.items()]
        df = spark.createDataFrame(rows, "b string, t string, v double")
        r = friedman_test(df, "b", "t", F.max("v")).collect()[0]
        # ranks per block equal the values here; R = (5, 8, 11)
        n, k = 4, 3
        want = 12.0 / (n * k * (k + 1)) * (25 + 64 + 121) - 3 * n * (k + 1)
        assert r["chi2_stat"] == pytest.approx(want, abs=1e-12)
        assert r["k"] == 3 and r["n_blocks"] == 4 and r["n_dropped"] == 0
        assert r["dof"] == 2

    def test_tie_correction_and_incomplete_blocks(self, spark):
        from pandera_spark.operators.ranks import friedman_test

        rows = [
            ("b1", "t1", 1.0), ("b1", "t2", 1.0), ("b1", "t3", 2.0),
            ("b2", "t1", 3.0), ("b2", "t2", 1.0), ("b2", "t3", 2.0),
            ("b3", "t1", 5.0),  # incomplete: dropped
        ]
        df = spark.createDataFrame(rows, "b string, t string, v double")
        r = friedman_test(df, "b", "t", F.max("v")).collect()[0]
        assert r["n_blocks"] == 2 and r["n_dropped"] == 1
        # block b1 midranks: t1=t2=1.5, t3=3; tie term (2^3-2)=6
        # R = (1.5+3, 1.5+1, 3+2) = (4.5, 2.5, 5); n=2, k=3
        # standard Friedman tie correction: 1 - sum(T)/(n*(k^3-k))
        # (scipy.stats.friedmanchisquare gives 2.0 on this input)
        q_raw = 12.0 / (2 * 3 * 4) * (4.5**2 + 2.5**2 + 25) - 3 * 2 * 4
        denom = 1.0 - 6.0 / (2 * (27 - 3))
        assert r["chi2_stat"] == pytest.approx(q_raw / denom, abs=1e-12)
        assert r["chi2_stat"] == pytest.approx(2.0, abs=1e-12)

    def test_degenerate_k1_yields_null_row(self, spark):
        # k < 2: one lazy plan, no eager driver action to raise from —
        # the statistic row comes back NULL instead (r11, VERDICT
        # r10 item 5 fold of the two .first() probes)
        from pandera_spark.operators.ranks import friedman_test

        df = spark.createDataFrame([("b", "t", 1.0)],
                                   "b string, t string, v double")
        r = friedman_test(df, "b", "t", F.max("v")).collect()[0]
        assert r["k"] == 1 and r["dof"] == 0
        assert r["chi2_stat"] is None and r["pvalue"] is None

    def test_empty_input_yields_null_row(self, spark):
        from pandera_spark.operators.ranks import friedman_test

        df = spark.createDataFrame([], "b string, t string, v double")
        r = friedman_test(df, "b", "t", F.max("v")).collect()[0]
        assert r["chi2_stat"] is None and r["pvalue"] is None
        assert r["n_dropped"] == 0


class TestSeasonality:
    def test_dow_profile(self, spark):
        from pandera_spark.operators.temporal import seasonality_profile
        import datetime

        # 2026-08-16 is a Sunday
        base = datetime.datetime(2026, 8, 16, 12, 0, 0)
        rows = [(base,)] * 3 + [(base + datetime.timedelta(days=1),)] * 7
        df = spark.createDataFrame(rows, "ts timestamp")
        out = {r["bucket"]: r for r in
               seasonality_profile(df, "ts", grain="dow").collect()}
        assert set(out) == {0, 1}          # Sunday=0, Monday=1
        assert out[0]["n"] == 3 and out[1]["n"] == 7
        assert out[1]["share"] == pytest.approx(0.7, abs=1e-12)
        assert out[1]["dev_uniform"] == pytest.approx(
            0.7 - 1 / 7, abs=1e-12
        )

    def test_hour_and_dowhour(self, spark):
        from pandera_spark.operators.temporal import seasonality_profile
        import datetime

        base = datetime.datetime(2026, 8, 16, 5, 30, 0)  # Sunday 05:xx
        df = spark.createDataFrame([(base,)], "ts timestamp")
        [h] = seasonality_profile(df, "ts", grain="hour").collect()
        assert h["bucket"] == 5
        [dh] = seasonality_profile(df, "ts", grain="dowhour").collect()
        assert dh["bucket"] == 5           # dow 0 * 24 + 5
        with pytest.raises(ValueError):
            seasonality_profile(df, "ts", grain="minute")
