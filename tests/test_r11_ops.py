"""Round-11 operators: domain_quality_gate / domain_drift (weburl),
lift_table (evalmetrics), holt_winters (temporal)."""

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    # 3 domains: good.com high quality, bad.com low, thin.com tiny
    rows = []
    for i in range(20):
        rows.append((i, f"https://a{i % 4}.good.com/p{i}", 80.0))
    for i in range(20, 40):
        rows.append((i, f"https://b{i % 3}.bad.com/p{i}", 20.0))
    rows.append((40, "https://only.thin.com/x", 99.0))
    rows.append((41, None, 50.0))
    return spark.createDataFrame(
        rows, "doc_id long, url string, quality double"
    )


class TestDomainQualityGate:
    def test_gate_keeps_good_domain_only(self, spark):
        from pandera_spark.operators.weburl import domain_quality_gate

        out = domain_quality_gate(
            _docs(spark), "url", quality_col="quality",
            min_quality=50.0, min_docs=2, domain_out="dom",
        )
        doms = {r.dom for r in out.select("dom").distinct().collect()}
        assert doms == {"good.com"}  # bad fails quality, thin min_docs
        assert out.count() == 20

    def test_null_url_dropped(self, spark):
        from pandera_spark.operators.weburl import domain_quality_gate

        out = domain_quality_gate(
            _docs(spark), "url", quality_col="quality",
            min_quality=0.0, min_docs=1,
        )
        # everything with a parseable URL passes; the NULL-url row drops
        assert out.count() == 41

    def test_cap_composes(self, spark):
        from pandera_spark.operators.weburl import domain_quality_gate

        out = domain_quality_gate(
            _docs(spark), "url", quality_col="quality",
            min_quality=50.0, min_docs=2,
            max_per_domain=7, key_col="doc_id", domain_out="dom",
        )
        assert out.count() == 7
        with pytest.raises(ValueError, match="key_col"):
            domain_quality_gate(
                _docs(spark), "url", quality_col="quality",
                min_quality=0.0, max_per_domain=3,
            )

    def test_cap_deterministic_and_salted(self, spark):
        from pandera_spark.operators.weburl import domain_quality_gate

        kw = dict(quality_col="quality", min_quality=0.0,
                  max_per_domain=5, key_col="doc_id")
        a = {r.doc_id for r in domain_quality_gate(
            _docs(spark), "url", **kw).collect()}
        b = {r.doc_id for r in domain_quality_gate(
            _docs(spark), "url", **kw).collect()}
        c = {r.doc_id for r in domain_quality_gate(
            _docs(spark), "url", salt="v2", **kw).collect()}
        assert a == b
        assert a != c


class TestDomainDrift:
    def _frame(self, spark):
        import datetime

        rows = []
        d1 = datetime.datetime(2024, 1, 1)
        d2 = datetime.datetime(2024, 1, 2)
        # stable.com: same distribution both days
        for day in (d1, d2):
            for i in range(50):
                rows.append((f"https://x.stable.com/{i}", day, float(i % 10)))
        # moved.com: day-2 values shift up
        for i in range(50):
            rows.append((f"https://x.moved.com/{i}", d1, float(i % 10)))
        for i in range(50):
            rows.append(
                (f"https://x.moved.com/{i}", d2, 80.0 + float(i % 10))
            )
        return spark.createDataFrame(
            rows, "url string, ts timestamp, v double"
        )

    def test_moved_domain_flags(self, spark):
        from pandera_spark.operators.weburl import domain_drift

        out = domain_drift(
            self._frame(spark), "url", "ts", "v",
            edges=[20.0, 40.0, 60.0], grain="day",
        ).collect()
        psi = {(r.domain, str(r.period)[:10]): r.psi for r in out}
        assert psi[("stable.com", "2024-01-01")] == pytest.approx(0.0, abs=1e-9)
        assert psi[("stable.com", "2024-01-02")] == pytest.approx(0.0, abs=1e-9)
        assert psi[("moved.com", "2024-01-01")] > 1.0
        assert psi[("moved.com", "2024-01-02")] > 1.0
        n = {(r.domain, str(r.period)[:10]): r.n_rows for r in out}
        assert n[("moved.com", "2024-01-01")] == 50

    def test_min_docs_screens_thin_domains(self, spark):
        from pandera_spark.operators.weburl import domain_drift

        df = self._frame(spark).union(
            spark.createDataFrame(
                [("https://t.thin.com/1",
                  __import__("datetime").datetime(2024, 1, 1), 1.0)],
                "url string, ts timestamp, v double",
            )
        )
        doms = {
            r.domain
            for r in domain_drift(
                df, "url", "ts", "v", edges=[20.0], min_docs=10
            ).select("domain").distinct().collect()
        }
        assert doms == {"stable.com", "moved.com"}


class TestLiftTable:
    def _scored(self, spark):
        # 100 distinct scores; the top 20 scores are the positives
        rows = [(float(i), 1 if i > 80 else 0) for i in range(1, 101)]
        return spark.createDataFrame(rows, "score double, label int")

    def test_perfect_targeting_deciles(self, spark):
        from pandera_spark.operators.evalmetrics import lift_table

        out = lift_table(
            self._scored(spark), "score", "label",
            n_bins=10, exact=True,
        ).collect()
        by_tier = {r.tier: r for r in out}
        assert len(out) == 10
        # overall rate 0.2; the top two tiers hold all positives
        assert by_tier[1].lift == pytest.approx(5.0)
        assert by_tier[2].cum_gain == pytest.approx(1.0)
        assert by_tier[1].cum_gain == pytest.approx(0.5)
        assert by_tier[3].n_pos == 0
        # closing invariants
        last = by_tier[10]
        assert last.cum_n == 100 and last.cum_pos == 20
        assert last.cum_gain == pytest.approx(1.0)
        assert last.cum_lift == pytest.approx(1.0)

    def test_tier_monotone_gain(self, spark):
        from pandera_spark.operators.evalmetrics import lift_table

        import random

        rng = random.Random(3)
        rows = [(rng.random(), 1 if rng.random() < 0.3 else 0)
                for _ in range(2000)]
        df = spark.createDataFrame(rows, "score double, label int")
        out = sorted(
            lift_table(df, "score", "label", n_bins=8).collect(),
            key=lambda r: r.tier,
        )
        gains = [r.cum_gain for r in out]
        assert gains == sorted(gains)
        assert sum(r.n for r in out) == 2000

    def test_null_rows_drop_and_guard(self, spark):
        from pandera_spark.operators.evalmetrics import lift_table

        df = spark.createDataFrame(
            [(1.0, 1), (2.0, 0), (None, 1), (3.0, None)],
            "score double, label int",
        )
        out = lift_table(df, "score", "label", n_bins=2, exact=True)
        assert sum(r.n for r in out.collect()) == 2
        with pytest.raises(ValueError, match="n_bins"):
            lift_table(df, "score", "label", n_bins=0)


class TestHoltWinters:
    def _series(self, spark, ys, start="2024-01-01"):
        import datetime

        t0 = datetime.datetime.fromisoformat(start)
        rows = [
            (t0 + datetime.timedelta(hours=i), float(v))
            for i, v in enumerate(ys)
        ]
        return spark.createDataFrame(rows, "ts timestamp, v double")

    def test_pure_seasonal_is_fixed_point(self, spark):
        from pandera_spark.operators.temporal import holt_winters

        season = [3.0, 7.0, 5.0, 1.0]
        df = self._series(spark, season * 6)
        out = holt_winters(
            df, "ts", F.max("v"), grain="hour", season_length=4
        ).orderBy("bucket_ts").collect()
        assert len(out) == 24
        for r in out:
            assert r.resid == pytest.approx(0.0, abs=1e-12)
            assert r.trend == pytest.approx(0.0, abs=1e-12)
            assert r.level == pytest.approx(4.0, abs=1e-12)

    def test_constant_series(self, spark):
        from pandera_spark.operators.temporal import holt_winters

        df = self._series(spark, [5.0] * 20)
        out = holt_winters(
            df, "ts", F.max("v"), season_length=4
        ).collect()
        for r in out:
            assert r.fitted == pytest.approx(5.0, abs=1e-12)
            assert r.seasonal == pytest.approx(0.0, abs=1e-12)

    def test_level_tracks_step_change(self, spark):
        from pandera_spark.operators.temporal import holt_winters

        ys = [10.0] * 24 + [30.0] * 24
        out = holt_winters(
            self._series(spark, ys), "ts", F.max("v"), season_length=4
        ).orderBy("bucket_ts").collect()
        assert out[20].level == pytest.approx(10.0, abs=1e-9)
        assert out[-1].level > 25.0

    def test_too_short_returns_empty(self, spark):
        from pandera_spark.operators.temporal import holt_winters

        df = self._series(spark, [1.0, 2.0, 3.0])
        assert holt_winters(
            df, "ts", F.max("v"), season_length=4
        ).count() == 0
        with pytest.raises(ValueError, match="season_length"):
            holt_winters(df, "ts", F.max("v"), season_length=1)

    def test_bucket_aggregation_counts(self, spark):
        # value = COUNT per bucket: y must be the arrival count
        from pandera_spark.operators.temporal import holt_winters
        import datetime

        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        for h in range(12):
            for _ in range(h + 1):  # h+1 events in hour h
                rows.append(
                    (t0 + datetime.timedelta(hours=h, minutes=30),)
                )
        df = spark.createDataFrame(rows, "ts timestamp")
        out = holt_winters(
            df, "ts", F.count(F.lit(1)), season_length=3
        ).orderBy("bucket_ts").collect()
        assert [int(r.y) for r in out] == list(range(1, 13))


class TestOverdispersion:
    def _events(self, spark, counts_per_hour):
        import datetime

        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        for h, c in enumerate(counts_per_hour):
            for _ in range(c):
                rows.append((t0 + datetime.timedelta(hours=h, minutes=5),))
        return spark.createDataFrame(rows, "ts timestamp")

    def test_constant_counts_underdispersed(self, spark):
        from pandera_spark.operators.temporal import overdispersion_check

        r = overdispersion_check(
            self._events(spark, [5] * 24), "ts"
        ).first()
        assert r.n_buckets == 24
        assert r.mean_count == pytest.approx(5.0)
        assert r.var_count == pytest.approx(0.0)
        assert r.dispersion == pytest.approx(0.0)
        # no overdispersion: NB fit undefined
        assert r.nb_r is None and r.nb_p is None

    def test_bursty_counts_fire(self, spark):
        from pandera_spark.operators.temporal import overdispersion_check

        r = overdispersion_check(
            self._events(spark, [1, 19] * 12), "ts"
        ).first()
        assert r.dispersion > 5.0
        assert r.pvalue < 1e-6
        # method-of-moments NB: r = m^2/(v-m), p = m/v
        m, v = r.mean_count, r.var_count
        assert r.nb_r == pytest.approx(m * m / (v - m), rel=1e-12)
        assert r.nb_p == pytest.approx(m / v, rel=1e-12)

    def test_grouped_by_key(self, spark):
        from pandera_spark.operators.temporal import overdispersion_check
        import datetime

        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        for h in range(24):
            for _ in range(5):
                rows.append(("steady", t0 + datetime.timedelta(hours=h)))
            for _ in range(20 if h % 2 else 1):
                rows.append(("bursty", t0 + datetime.timedelta(hours=h)))
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        out = {r.k: r for r in overdispersion_check(
            df, "ts", by=["k"]).collect()}
        assert out["steady"].dispersion == pytest.approx(0.0)
        assert out["bursty"].dispersion > 3.0


class TestUrlContentFilter:
    def _urls(self, spark, urls):
        return spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "id long, url string"
        )

    def test_rules_fire_by_name(self, spark):
        from pandera_spark.operators.weburl import url_content_filter

        urls = [
            "https://a.com/article/why-spark",        # content
            "https://a.com/tag/spark",                # path_pattern
            "https://a.com/static/app.js",            # extension
            "https://a.com/p?utm_source=x",           # params (tracking)
            "https://a.com/" + "/".join("abcdefghi"), # path_depth 9
            "not a url",                              # unparseable
        ]
        out = url_content_filter(
            self._urls(spark, urls), "url", flag_out="drop"
        ).orderBy("id").collect()
        assert [r.drop for r in out] == [
            False, True, True, True, True, True
        ]
        assert [r.drop_rule for r in out] == [
            None, "path_pattern", "extension", "params",
            "path_depth", "unparseable",
        ]

    def test_segment_exact_not_substring(self, spark):
        from pandera_spark.operators.weburl import url_content_filter

        out = url_content_filter(
            self._urls(spark, [
                "https://a.com/tagging-guide",   # must SURVIVE
                "https://a.com/blog/tag/x",      # must drop
            ]),
            "url",
        ).collect()
        assert [r.url for r in out] == ["https://a.com/tagging-guide"]

    def test_filter_mode_drops(self, spark):
        from pandera_spark.operators.weburl import url_content_filter

        df = self._urls(spark, [
            "https://a.com/post/1", "https://a.com/feed",
            "https://a.com/deep?a=1&b=2&c=3", "https://a.com/x.png",
        ])
        kept = url_content_filter(df, "url", max_params=2).collect()
        assert {r.id for r in kept} == {0}

    def test_custom_patterns(self, spark):
        from pandera_spark.operators.weburl import url_content_filter

        df = self._urls(spark, ["https://a.com/intern/x",
                                "https://a.com/tag/x"])
        kept = url_content_filter(
            df, "url", path_patterns=["intern"]
        ).collect()
        # custom list replaces the default: /tag/ now survives
        assert {r.url for r in kept} == {"https://a.com/tag/x"}


class TestHoltWintersAnomalies:
    def _series(self, spark, ys):
        import datetime

        t0 = datetime.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(t0 + datetime.timedelta(hours=i), float(v))
             for i, v in enumerate(ys)],
            "ts timestamp, v double",
        )

    def test_spike_in_seasonal_series_flagged(self, spark):
        from pandera_spark.operators.temporal import holt_winters_anomalies

        season = [3.0, 7.0, 5.0, 1.0]
        ys = season * 12
        ys[30] += 40.0  # inject one spike well past warmup
        out = holt_winters_anomalies(
            self._series(spark, ys), "ts", F.max("v"),
            season_length=4,
        ).orderBy("bucket_ts").collect()
        flagged = [i for i, r in enumerate(out) if r.is_anomaly]
        # warmup (4 buckets) excluded from output; index shifts by 4
        assert flagged and 30 - 4 in flagged
        assert len(flagged) <= 3  # the spike echoes at most briefly

    def test_constant_series_no_flags(self, spark):
        from pandera_spark.operators.temporal import holt_winters_anomalies

        out = holt_winters_anomalies(
            self._series(spark, [5.0] * 20), "ts", F.max("v"),
            season_length=4,
        ).collect()
        assert out and not any(r.is_anomaly for r in out)
        # zero MAD: robust_z NULL, flag False (never raises under ANSI)
        assert all(r.robust_z is None for r in out)

    def test_warmup_excluded(self, spark):
        from pandera_spark.operators.temporal import holt_winters_anomalies

        ys = [1.0, 9.0] * 12
        out = holt_winters_anomalies(
            self._series(spark, ys), "ts", F.max("v"),
            season_length=2, warmup=6,
        ).orderBy("bucket_ts").collect()
        assert len(out) == 24 - 6


class TestQuantileFit:
    def _line(self, spark):
        rows = [(float(i), 3.0 * i - 7.0) for i in range(40)]
        return spark.createDataFrame(rows, "x double, y double")

    def test_exact_line_any_tau(self, spark):
        from pandera_spark.operators.regression import quantile_fit

        for tau in (0.25, 0.5, 0.9):
            fit = quantile_fit(self._line(spark), "y", ["x"], tau=tau)
            assert fit["terms"] == ["x", "(intercept)"]
            assert fit["beta"][0] == pytest.approx(3.0, abs=1e-6)
            assert fit["beta"][1] == pytest.approx(-7.0, abs=1e-4)
            assert fit["pinball"] == pytest.approx(0.0, abs=1e-6)

    def _asym(self, spark):
        # y = 10 + x, except every 10th row spikes +100: the median
        # line ignores the spikes, the tau=0.95 line sits above them
        rows = [
            (float(i % 50),
             10.0 + (i % 50) + (100.0 if i % 10 == 0 else 0.0))
            for i in range(500)
        ]
        return spark.createDataFrame(rows, "x double, y double")

    def test_tau_targets_the_right_tail(self, spark):
        from pandera_spark.operators.regression import quantile_fit

        med = quantile_fit(self._asym(spark), "y", ["x"], tau=0.5)
        hi = quantile_fit(self._asym(spark), "y", ["x"], tau=0.95)
        # median line ignores the 10% spikes
        assert med["beta"][1] == pytest.approx(10.0, abs=0.5)
        assert med["beta"][0] == pytest.approx(1.0, abs=0.05)
        # the 95th-percentile line sits near the spiked intercept
        assert hi["beta"][1] > 60.0
        assert hi["pinball"] < med["pinball"] + 10.0

    def test_predictions_monotone_in_tau(self, spark):
        from pandera_spark.operators.regression import (
            quantile_fit, quantile_score,
        )

        df = self._asym(spark)
        preds = []
        for tau in (0.25, 0.5, 0.9):
            fit = quantile_fit(df, "y", ["x"], tau=tau)
            scored = quantile_score(
                df.limit(1), ["x"], fit["beta"][:1],
                intercept=fit["beta"][1],
            ).first()
            preds.append(scored.prediction)
        assert preds == sorted(preds)

    def test_refinement_improves_on_this_fixture(self, spark):
        # iters=1 is the LS warm start PLUS one IRLS step (iteration 0
        # is the unweighted solve); pure LS is unreachable by design.
        # IRLS is not a guaranteed-descent method for the check loss,
        # so this is a behavior pin on THIS fixture (where further
        # refinement clearly helps), not an implementation invariant.
        from pandera_spark.operators.regression import quantile_fit

        df = self._asym(spark)
        one_step = quantile_fit(df, "y", ["x"], tau=0.9, iters=1)
        refined = quantile_fit(df, "y", ["x"], tau=0.9, iters=12)
        assert refined["pinball"] <= one_step["pinball"] + 1e-9
        # and the refined solution has (near-)converged steps
        assert refined["last_step_norm"] < one_step["last_step_norm"]

    def test_score_rejects_and_handles_iterators(self, spark):
        from pandera_spark.operators.regression import quantile_score

        df = self._line(spark)
        # a generator must not silently exhaust into intercept-only
        out = quantile_score(
            df, ["x"], iter([3.0]), intercept=-7.0
        ).first()
        assert out.prediction == pytest.approx(3.0 * out.x - 7.0)
        with pytest.raises(ValueError, match="coefficients"):
            quantile_score(df, ["x"], [1.0, 2.0])

    def test_guards(self, spark):
        from pandera_spark.operators.regression import quantile_fit

        df = self._line(spark)
        with pytest.raises(ValueError, match="tau"):
            quantile_fit(df, "y", ["x"], tau=1.5)
        with pytest.raises(ValueError, match="feature"):
            quantile_fit(df, "y", [])
        empty = df.where(F.col("x") < -1)
        with pytest.raises(ValueError, match="complete rows"):
            quantile_fit(empty, "y", ["x"])
