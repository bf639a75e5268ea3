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


class TestTrendProperties:
    @SET
    @given(xs=vals, a=st.floats(min_value=0.1, max_value=5,
                                allow_nan=False),
           b=st.floats(min_value=-20, max_value=20, allow_nan=False))
    def test_theil_sen_affine_equivariance(self, spark, xs, a, b):
        """theil_sen(a·x + b) has slope a·slope(x) and the intercept
        transforms affinely."""
        import datetime

        from pandera_spark.operators.temporal import theil_sen

        if len(set(xs)) < 4:
            return
        t0 = datetime.datetime(2024, 1, 1)
        mk = lambda vs: spark.createDataFrame(  # noqa: E731
            [(t0 + datetime.timedelta(hours=i), float(v))
             for i, v in enumerate(vs)],
            "bucket_start timestamp, v double",
        )
        base = theil_sen(mk(xs), "v").first()
        scaled = theil_sen(mk([a * x + b for x in xs]), "v").first()
        assert scaled["slope"] == pytest.approx(
            a * base["slope"], rel=1e-9, abs=1e-9
        )
        assert scaled["intercept"] == pytest.approx(
            a * base["intercept"] + b, rel=1e-7, abs=1e-6
        )

    @SET
    @given(xs=st.lists(
        st.floats(min_value=0.5, max_value=50, allow_nan=False)
        .map(lambda x: round(x, 2)),
        min_size=4, max_size=25,
    ))
    def test_twap_between_min_max_and_constant_exact(self, spark, xs):
        import datetime

        from pandera_spark.operators.temporal import time_weighted_mean

        t0 = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(t0 + datetime.timedelta(seconds=10 * i), float(v))
             for i, v in enumerate(xs)],
            "ts timestamp, v double",
        )
        out = time_weighted_mean(df, "ts", "v").first()
        assert min(xs) - 1e-9 <= out["twap"] <= max(xs) + 1e-9
        # uniform spacing: TWAP = simple mean of all but the last
        assert out["twap"] == pytest.approx(
            sum(xs[:-1]) / (len(xs) - 1), rel=1e-12
        )


class TestCoverageProperties:
    @SET
    @given(cats=st.lists(st.sampled_from("abcdef"),
                         min_size=3, max_size=80))
    def test_coverage_invariants(self, spark, cats):
        from pandera_spark.operators.heavyhitters import coverage_curve

        df = spark.createDataFrame([(c,) for c in cats], "cat string")
        out = sorted(coverage_curve(df, "cat", k=6).collect(),
                     key=lambda r: r["rank"])
        # counts non-increasing, cum share increasing to 1 at full k
        cnts = [r["cnt"] for r in out]
        assert all(a >= b for a, b in zip(cnts, cnts[1:]))
        assert out[-1]["cum_share"] == pytest.approx(
            sum(r["share"] for r in out), abs=1e-12
        )
        if len(out) == len(set(cats)):
            assert out[-1]["cum_share"] == pytest.approx(1.0)
        assert sum(cnts) <= len(cats)


class TestRankingMetricProperties:
    @SET
    @given(rels=st.lists(st.integers(min_value=0, max_value=3),
                         min_size=2, max_size=15))
    def test_ideal_ranking_ndcg_one(self, spark, rels):
        """Results already sorted by relevance descending -> NDCG = 1."""
        from pandera_spark.operators.evalmetrics import ranking_metrics

        ordered = sorted(rels, reverse=True)
        rows = [("q", i + 1, float(r)) for i, r in enumerate(ordered)]
        df = spark.createDataFrame(rows, "q string, rank int, rel double")
        out = ranking_metrics(df, "q", "rank", "rel",
                              k=len(rels)).first()
        if any(r > 0 for r in rels):
            assert out["ndcg"] == pytest.approx(1.0, abs=1e-12)
            assert out["recall"] == pytest.approx(1.0)
            assert out["mrr"] == pytest.approx(1.0)
        else:
            assert out["ndcg"] is None and out["recall"] is None

    @SET
    @given(rels=st.lists(st.integers(min_value=0, max_value=1),
                         min_size=3, max_size=12),
           k=st.integers(min_value=1, max_value=12))
    def test_metrics_bounded(self, spark, rels, k):
        from pandera_spark.operators.evalmetrics import ranking_metrics

        rows = [("q", i + 1, float(r)) for i, r in enumerate(rels)]
        df = spark.createDataFrame(rows, "q string, rank int, rel double")
        out = ranking_metrics(df, "q", "rank", "rel", k=k).first()
        for m in ("mrr", "precision"):
            assert 0.0 <= out[m] <= 1.0 + 1e-12
        for m in ("ndcg", "recall"):
            if out[m] is not None:
                assert 0.0 <= out[m] <= 1.0 + 1e-12


class TestDpProperties:
    @SET
    @given(counts=st.lists(st.integers(min_value=1, max_value=500),
                           min_size=1, max_size=6),
           eps=st.sampled_from([0.1, 0.5, 1.0, 5.0]))
    def test_noise_bounded_by_tail(self, spark, counts, eps):
        """Derived Laplace noise: |noisy - true| <= b*ln(2^28) (the
        extreme of the inverse CDF on the hash grid)."""
        import math

        from pandera_spark.operators.privacy import dp_noisy_counts

        rows = [(f"c{i}",) for i, n in enumerate(counts)
                for _ in range(n)]
        df = spark.createDataFrame(rows, "cat string")
        out = {r["value"]: r["noisy_count"]
               for r in dp_noisy_counts(
                   df, "cat", epsilon=eps, clamp_nonneg=False
               ).collect()}
        bound = (1.0 / eps) * math.log(2 ** 28)
        for i, n in enumerate(counts):
            assert abs(out[f"c{i}"] - n) <= bound


class TestR9Properties:
    @SET
    @given(xs=vals)
    def test_kendall_monotone_transform_invariance(self, spark, xs):
        """τ-b is rank-based: a strictly increasing transform of either
        column leaves it unchanged; negating one column negates it."""
        from pandera_spark.operators.ranks import kendall_tau_b

        if len(set(xs)) < 3:
            return
        rows = [(float(x), float((i * 7) % 11)) for i, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "x double, y double")
        base = kendall_tau_b(df, "x", "y").first()
        if base["tau_b"] is None or math.isnan(base["tau_b"]):
            return
        mono = spark.createDataFrame(
            [(math.exp(x / 50.0), y) for x, y in rows], "x double, y double"
        )
        t2 = kendall_tau_b(mono, "x", "y").first()
        assert t2["tau_b"] == pytest.approx(base["tau_b"], abs=1e-12)
        assert t2["concordant"] == base["concordant"]
        neg = spark.createDataFrame(
            [(-x, y) for x, y in rows], "x double, y double"
        )
        t3 = kendall_tau_b(neg, "x", "y").first()
        assert t3["tau_b"] == pytest.approx(-base["tau_b"], abs=1e-12)

    @SET
    @given(xs=vals, a=st.floats(min_value=0.5, max_value=3.0,
                                allow_nan=False),
           b=st.floats(min_value=-20, max_value=20, allow_nan=False))
    def test_yuen_affine_invariance(self, spark, xs, a, b):
        """Yuen's t is invariant under x -> a*x + b (a > 0) applied to
        BOTH groups — location/scale cancel in the standardized stat."""
        from pandera_spark.operators.ranks import yuen_trimmed_t

        if len(xs) < 10:
            return
        rows = [(float(x), "A" if i % 2 == 0 else "B")
                for i, x in enumerate(xs)]
        df1 = spark.createDataFrame(rows, "x double, g string")
        r1 = yuen_trimmed_t(df1, "x", "g", "A", "B").first()
        if r1["t_stat"] is None:
            return
        df2 = spark.createDataFrame(
            [(a * x + b, g) for x, g in rows], "x double, g string"
        )
        r2 = yuen_trimmed_t(df2, "x", "g", "A", "B").first()
        assert r2["t_stat"] == pytest.approx(r1["t_stat"], rel=1e-9)
        assert r2["dof"] == pytest.approx(r1["dof"], rel=1e-9)
        assert (r2["h_a"], r2["h_b"]) == (r1["h_a"], r1["h_b"])

    @SET
    @given(xs=vals, shift=st.floats(min_value=-50, max_value=50,
                                    allow_nan=False))
    def test_brown_forsythe_location_invariance(self, spark, xs, shift):
        """BF measures SPREAD: shifting one whole group never changes F
        (the group median absorbs the shift)."""
        from pandera_spark.operators.stats import brown_forsythe

        if len(xs) < 10:
            return
        rows = [(float(x), "A" if i % 2 == 0 else "B")
                for i, x in enumerate(xs)]
        df1 = spark.createDataFrame(rows, "x double, g string")
        f1 = brown_forsythe(df1, "x", "g").first()["f_stat"]
        if f1 is None:
            return
        df2 = spark.createDataFrame(
            [(x + (shift if g == "A" else 0.0), g) for x, g in rows],
            "x double, g string",
        )
        f2 = brown_forsythe(df2, "x", "g").first()["f_stat"]
        assert f2 == pytest.approx(f1, rel=1e-9)

    @SET
    @given(ws=st.lists(st.floats(min_value=0.1, max_value=100,
                                 allow_nan=False),
                       min_size=2, max_size=12))
    def test_herfindahl_bounds_and_merge(self, spark, ws):
        """1/k <= HHI <= 1; merging two groups can only increase HHI
        (concentration never drops when groups coalesce)."""
        from pandera_spark.operators.stats import herfindahl

        rows = [(f"g{i}", float(w)) for i, w in enumerate(ws)]
        df = spark.createDataFrame(rows, "g string, w double")
        r = herfindahl(df, "g", F.col("w")).first()
        k = len(ws)
        assert 1.0 / k - 1e-12 <= r["hhi"] <= 1.0 + 1e-12
        assert r["effective_k"] == pytest.approx(1.0 / r["hhi"], rel=1e-12)
        merged = spark.createDataFrame(
            [("g0" if g == "g1" else g, w) for g, w in rows],
            "g string, w double",
        )
        r2 = herfindahl(merged, "g", F.col("w")).first()
        assert r2["hhi"] >= r["hhi"] - 1e-12

    @SET
    @given(xs=vals, scale=st.sampled_from([0.25, 0.5, 2.0, 4.0]))
    def test_randomization_scale_invariance(self, spark, xs, scale):
        """Scaling the metric scales obs and every replicate alike, so
        n_extreme and p are invariant.  Power-of-two scales only: they
        are EXACT in IEEE doubles, so replicate-vs-observed ties can't
        flip on the comparison boundary (an arbitrary scale perturbs
        |T_r| == |T_obs| ties by an ulp — hypothesis found
        scale=0.5000000000000001 doing exactly that)."""
        from pandera_spark.operators.stats import randomization_test_mean

        if len(xs) < 10:
            return
        rows = [(float(x), "A" if i % 3 != 0 else "B", i)
                for i, x in enumerate(xs)]
        df1 = spark.createDataFrame(rows, "x double, g string, id long")
        r1 = randomization_test_mean(
            df1, "x", "g", "A", "B", "id", n_rep=16
        ).first()
        df2 = spark.createDataFrame(
            [(scale * x, g, i) for x, g, i in rows],
            "x double, g string, id long",
        )
        r2 = randomization_test_mean(
            df2, "x", "g", "A", "B", "id", n_rep=16
        ).first()
        assert r2["n_extreme"] == r1["n_extreme"]
        assert r2["pvalue"] == r1["pvalue"]
        assert r2["obs_diff"] == pytest.approx(scale * r1["obs_diff"],
                                               rel=1e-9)

    @SET
    @given(xs=vals)
    def test_median_test_monotone_invariance(self, spark, xs):
        """Mood's test sees only above/below the pooled median, so any
        strictly increasing transform leaves the whole row unchanged."""
        from pandera_spark.operators.stats import median_test

        if len(set(xs)) < 5 or len(xs) < 10:
            return
        rows = [(float(x), "A" if i % 2 == 0 else "B")
                for i, x in enumerate(xs)]
        df1 = spark.createDataFrame(rows, "x double, g string")
        r1 = median_test(df1, "x", "g").first()
        df2 = spark.createDataFrame(
            [(x ** 3, g) for x, g in rows], "x double, g string"
        )
        r2 = median_test(df2, "x", "g").first()
        assert r2["n_above"] == r1["n_above"]
        if r1["chi2_stat"] is not None:
            assert r2["chi2_stat"] == pytest.approx(r1["chi2_stat"],
                                                    rel=1e-9)

    @SET
    @given(reps=st.integers(min_value=2, max_value=4))
    def test_pmi_corpus_duplication_invariance(self, spark, reps):
        """Duplicating every document multiplies all counts by the same
        factor — every PMI value is unchanged."""
        from pandera_spark.operators.text import pmi_collocations

        docs = [("d1", "new york is big"), ("d2", "new york new york"),
                ("d3", "big apple is new york")]
        base = spark.createDataFrame(docs, "doc_id string, text string")
        dup = spark.createDataFrame(
            [(f"{i}_{d}", t) for i in range(reps) for d, t in docs],
            "doc_id string, text string",
        )
        b = {r["gram"]: r["pmi"]
             for r in pmi_collocations(base, "text", min_count=2, k=50)
             .collect()}
        d = {r["gram"]: r["pmi"]
             for r in pmi_collocations(dup, "text", min_count=2, k=50)
             .collect()}
        assert set(b) <= set(d)  # duplication can only add eligible grams
        for gram, p in b.items():
            assert d[gram] == pytest.approx(p, abs=1e-12)


class TestFisherExactProperties:
    @SET
    @given(
        a=st.integers(0, 25), b=st.integers(0, 25),
        c=st.integers(0, 25), d=st.integers(0, 25),
    )
    def test_matches_lgamma_reference(self, spark, a, b, c, d):
        """Engine p-values equal an independent math.lgamma evaluation
        of the hypergeometric tails on arbitrary 2x2 tables."""
        from pandera_spark.operators.stats import fisher_exact
        from tests.test_stats import _fisher_df, _fisher_ref

        if a + b + c + d == 0:
            return
        r = fisher_exact(_fisher_df(spark, a, b, c, d), "x", "y").first()
        p2, pl, pg = _fisher_ref(a, b, c, d)
        assert r.p_two == pytest.approx(p2, abs=1e-9), (a, b, c, d)
        assert r.p_less == pytest.approx(pl, abs=1e-9), (a, b, c, d)
        assert r.p_greater == pytest.approx(pg, abs=1e-9), (a, b, c, d)
        # structural invariant: both tails include the observed table,
        # so they overlap (NOTE: p_two <= 2*min(tails) does NOT hold
        # for the sum-of-at-most-as-probable definition — only for the
        # tail-doubling one)
        assert r.p_less + r.p_greater >= 1.0 - 1e-9

    @SET
    @given(
        a=st.integers(0, 15), b=st.integers(0, 15),
        c=st.integers(0, 15), d=st.integers(0, 15),
    )
    def test_transpose_invariance(self, spark, a, b, c, d):
        """Fisher's exact test is invariant under transposing the
        table (swapping the roles of the two conditions)."""
        from pandera_spark.operators.stats import fisher_exact
        from tests.test_stats import _fisher_df

        if a + b + c + d == 0:
            return
        r1 = fisher_exact(_fisher_df(spark, a, b, c, d), "x", "y").first()
        # transpose = ONE swap: the table [[a,b],[c,d]] becomes
        # [[a,c],[b,d]] with the SAME condition roles.  (Swapping the
        # roles too would transpose twice and test nothing.)
        r2 = fisher_exact(_fisher_df(spark, a, c, b, d), "x", "y").first()
        assert (r2.b, r2.c) == (c, b)
        assert r1.p_two == pytest.approx(r2.p_two, abs=1e-12)
        assert r1.p_less == pytest.approx(r2.p_less, abs=1e-12)
        assert r1.p_greater == pytest.approx(r2.p_greater, abs=1e-12)
