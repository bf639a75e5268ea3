"""Tests for annotator-agreement metrics (Cohen/Fleiss kappa),
isotonic PAV calibration, and the difference-in-differences readout —
hand-computed or local-replay references."""

import pytest

from pyspark.sql import functions as F

from pandera_spark.operators.evalmetrics import (
    cohen_kappa,
    fleiss_kappa,
    isotonic_calibrate,
)
from pandera_spark.operators.abtest import did_ztest


class TestCohenKappa:
    def test_textbook_example(self, spark):
        # classic 2x2: raters agree on 20 yes + 15 no of 50;
        # marginals: A says yes 25, B says yes 30
        rows = (
            [("y", "y")] * 20 + [("n", "n")] * 15
            + [("y", "n")] * 5 + [("n", "y")] * 10
        )
        df = spark.createDataFrame(rows, "a string, b string")
        out = cohen_kappa(df, "a", "b").first()
        po = 35 / 50
        pe = (25 / 50) * (30 / 50) + (25 / 50) * (20 / 50)
        assert out["n"] == 50
        assert out["observed_agreement"] == pytest.approx(po)
        assert out["expected_agreement"] == pytest.approx(pe)
        assert out["kappa"] == pytest.approx((po - pe) / (1 - pe))

    def test_perfect_and_constant(self, spark):
        same = spark.createDataFrame(
            [("x", "x"), ("y", "y"), ("x", "x")], "a string, b string"
        )
        assert cohen_kappa(same, "a", "b").first()["kappa"] is None \
            or cohen_kappa(same, "a", "b").first()["kappa"] == 1.0
        # both raters constant AND equal -> pe = 1 -> kappa null
        const = spark.createDataFrame(
            [("x", "x")] * 4, "a string, b string"
        )
        assert const.count() == 4
        assert cohen_kappa(const, "a", "b").first()["kappa"] is None

    def test_nulls_drop(self, spark):
        df = spark.createDataFrame(
            [("y", "y"), ("y", None), (None, "n"), ("n", "y")],
            "a string, b string",
        )
        assert cohen_kappa(df, "a", "b").first()["n"] == 2


class TestFleissKappa:
    def test_wikipedia_style(self, spark):
        # 4 items x 3 raters, 2 labels; per-item label counts:
        # i1: (3,0)  i2: (2,1)  i3: (1,2)  i4: (0,3)
        rows = (
            [(1, "a")] * 3
            + [(2, "a")] * 2 + [(2, "b")]
            + [(3, "a")] + [(3, "b")] * 2
            + [(4, "b")] * 3
        )
        df = spark.createDataFrame(rows, "item int, label string")
        out = fleiss_kappa(df, "item", "label").first()
        # P_i = sum n_ij(n_ij-1) / (n(n-1)); n=3
        p = [(3 * 2) / 6, (2 * 1) / 6, (2 * 1) / 6, (3 * 2) / 6]
        p_bar = sum(p) / 4
        # marginals: a: 6/12, b: 6/12
        p_e = 0.5 ** 2 + 0.5 ** 2
        assert out["n_items"] == 4 and out["n_ratings"] == 3
        assert out["p_bar"] == pytest.approx(p_bar)
        assert out["p_e"] == pytest.approx(p_e)
        assert out["kappa"] == pytest.approx(
            (p_bar - p_e) / (1 - p_e)
        )

    def test_uneven_items_dropped(self, spark):
        rows = (
            [(1, "a")] * 3 + [(2, "a")] * 3 + [(3, "b")] * 3
            + [(9, "a")] * 2  # deviating count -> dropped
        )
        df = spark.createDataFrame(rows, "item int, label string")
        out = fleiss_kappa(df, "item", "label").first()
        assert out["n_items"] == 3 and out["n_ratings"] == 3


class TestIsotonicCalibrate:
    def _local_pav(self, pts):
        # sum-tracking + cross-multiplied compare, mirroring the
        # operator's exact-arithmetic block merge (r9)
        blocks = []
        for s, n, sm in sorted(pts):
            blocks.append([s, s, float(n), float(sm)])
            while (
                len(blocks) >= 2
                and blocks[-2][3] * blocks[-1][2]
                >= blocks[-1][3] * blocks[-2][2]
            ):
                _, hi2, w2, s2 = blocks.pop()
                lo1, _, w1, s1 = blocks.pop()
                blocks.append([lo1, hi2, w1 + w2, s1 + s2])
        return [[lo, hi, w, sm / w] for lo, hi, w, sm in blocks]

    def test_matches_local_pav(self, spark):
        import numpy as np

        rng = np.random.RandomState(5)
        rows = []
        for _ in range(400):
            s = float(rng.randint(0, 20)) / 20.0
            y = int(rng.uniform() < 0.2 + 0.6 * s)
            rows.append((s, y))
        df = spark.createDataFrame(rows, "score double, label int")
        out = sorted(
            isotonic_calibrate(df, "score", "label").collect(),
            key=lambda r: r["score_lo"],
        )
        pts = {}
        for s, y in rows:
            n, sm = pts.get(s, (0, 0.0))
            pts[s] = (n + 1, sm + y)
        local = self._local_pav(
            [(s, n, sm) for s, (n, sm) in pts.items()]
        )
        assert len(out) == len(local)
        for r, (lo, hi, w, m) in zip(out, local):
            assert r["score_lo"] == pytest.approx(lo)
            assert r["score_hi"] == pytest.approx(hi)
            assert r["n"] == int(w)
            assert r["calibrated_p"] == pytest.approx(m, abs=1e-12)
        # monotone non-decreasing
        ps = [r["calibrated_p"] for r in out]
        assert all(a < b for a, b in zip(ps, ps[1:]))

    def test_grouped(self, spark):
        rows = [("g1", 0.1, 0), ("g1", 0.2, 1), ("g1", 0.3, 0),
                ("g2", 0.5, 1), ("g2", 0.9, 0)]
        df = spark.createDataFrame(rows, "g string, score double, label int")
        out = isotonic_calibrate(df, "score", "label", by=["g"]).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["g"], []).append(r)
        # g1: 0, 1, 0 -> pools (0.2, 0.3) to 0.5
        g1 = sorted(by_g["g1"], key=lambda r: r["score_lo"])
        assert [r["calibrated_p"] for r in g1] == [0.0, 0.5]
        # g2: 1 then 0 pools to one block at 0.5
        assert len(by_g["g2"]) == 1
        assert by_g["g2"][0]["calibrated_p"] == pytest.approx(0.5)


class TestDid:
    def test_hand_computed(self, spark):
        import numpy as np

        rng = np.random.RandomState(9)
        rows = []
        for g, p, mu in [("A", "pre", 10.0), ("A", "post", 14.0),
                         ("B", "pre", 9.0), ("B", "post", 10.5)]:
            for _ in range(200):
                rows.append((g, p, float(mu + rng.normal(0, 2))))
        df = spark.createDataFrame(rows, "g string, period string, y double")
        out = did_ztest(
            df, "g", "A", "B", "period", "pre", "post", F.col("y")
        ).first()
        import statistics
        cells = {}
        for g, p, y in rows:
            cells.setdefault((g, p), []).append(y)
        means = {k: statistics.fmean(v) for k, v in cells.items()}
        effect = (
            (means[("A", "post")] - means[("A", "pre")])
            - (means[("B", "post")] - means[("B", "pre")])
        )
        se = sum(
            statistics.variance(v) / len(v) for v in cells.values()
        ) ** 0.5
        assert out["effect"] == pytest.approx(effect, abs=1e-10)
        assert out["se"] == pytest.approx(se, rel=1e-10)
        assert out["z"] == pytest.approx(effect / se, rel=1e-10)
        assert out["pvalue"] < 0.05  # true DiD effect = 2.5
        assert out["n_a_pre"] == 200

    def test_degenerate_cell_null_se(self, spark):
        df = spark.createDataFrame(
            [("A", "pre", 1.0), ("A", "post", 2.0), ("A", "post", 3.0),
             ("B", "pre", 1.0), ("B", "pre", 2.0), ("B", "post", 4.0)],
            "g string, period string, y double",
        )
        out = did_ztest(
            df, "g", "A", "B", "period", "pre", "post", F.col("y")
        ).first()
        assert out["se"] is None and out["pvalue"] is None
        assert out["n_a_pre"] == 1

    def test_rows_outside_cells_ignored(self, spark):
        df = spark.createDataFrame(
            [("A", "pre", 1.0), ("A", "pre", 2.0),
             ("A", "post", 5.0), ("A", "post", 6.0),
             ("B", "pre", 1.0), ("B", "pre", 3.0),
             ("B", "post", 2.0), ("B", "post", 4.0),
             ("C", "pre", 99.0), ("A", "mid", 99.0), ("A", "post", None)],
            "g string, period string, y double",
        )
        out = did_ztest(
            df, "g", "A", "B", "period", "pre", "post", F.col("y")
        ).first()
        assert out["n_a_post"] == 2 and out["n_b_post"] == 2
        assert out["effect"] == pytest.approx((5.5 - 1.5) - (3.0 - 2.0))


class TestRankingMetrics:
    def test_hand_computed(self, spark):
        import math
        from pandera_spark.operators.evalmetrics import ranking_metrics

        # q1: rel at ranks 1,3 (rel 2 and 1), 4 results, 3 relevant total
        # q2: first rel at rank 4; q3: no relevant anywhere
        rows = [
            ("q1", 1, 2.0), ("q1", 2, 0.0), ("q1", 3, 1.0), ("q1", 9, 1.0),
            ("q2", 1, 0.0), ("q2", 2, 0.0), ("q2", 4, 1.0),
            ("q3", 1, 0.0), ("q3", 2, 0.0),
        ]
        df = spark.createDataFrame(rows, "q string, rank int, rel double")
        out = ranking_metrics(df, "q", "rank", "rel", k=5).first()
        # MRR: q1 -> 1/1, q2 -> 1/4, q3 -> 0
        assert out["mrr"] == pytest.approx((1.0 + 0.25 + 0.0) / 3)
        # q1 dcg = 3/log2(2) + 1/log2(4) = 3 + 0.5
        dcg1 = 3.0 + 1.0 / 2.0
        # ideal: rels [2,1,1,0] at ranks 1..4
        idcg1 = 3.0 + 1.0 / math.log2(3) + 1.0 / 2.0
        ndcg1 = dcg1 / idcg1
        # q2 dcg = 1/log2(5); ideal rel 1 at rank 1 -> 1
        ndcg2 = (1.0 / math.log2(5)) / 1.0
        assert out["ndcg"] == pytest.approx((ndcg1 + ndcg2) / 2)
        # recall: q1 2/3, q2 1/1; q3 excluded
        assert out["recall"] == pytest.approx((2 / 3 + 1.0) / 2)
        # precision@5: q1 2/5, q2 1/5, q3 0
        assert out["precision"] == pytest.approx((0.4 + 0.2 + 0.0) / 3)
        assert out["n_queries"] == 3

    def test_perfect_ranking(self, spark):
        from pandera_spark.operators.evalmetrics import ranking_metrics

        rows = [("q", i, float(5 - i)) for i in range(1, 5)]
        df = spark.createDataFrame(rows, "q string, rank int, rel double")
        out = ranking_metrics(df, "q", "rank", "rel", k=4).first()
        assert out["ndcg"] == pytest.approx(1.0)
        assert out["mrr"] == pytest.approx(1.0)
        assert out["recall"] == pytest.approx(1.0)

    def test_validation(self, spark):
        from pandera_spark.operators.evalmetrics import ranking_metrics

        df = spark.createDataFrame([("q", 1, 1.0)], "q string, rank int, rel double")
        with pytest.raises(ValueError, match="k"):
            ranking_metrics(df, "q", "rank", "rel", k=0)


class TestIpwAte:
    def test_matches_local_replay(self, spark):
        import numpy as np

        rng = np.random.RandomState(21)
        rows = []
        for _ in range(600):
            x = float(rng.uniform(-1, 1))
            p_t = 1.0 / (1.0 + np.exp(-(0.3 + 0.8 * x)))
            t = bool(rng.uniform() < p_t)
            y = float(2.0 + 1.5 * t + 0.5 * x + rng.normal(0, 0.5))
            rows.append((t, y, x))
        df = spark.createDataFrame(rows, "t boolean, y double, x double")
        from pandera_spark.operators.abtest import ipw_ate

        out = ipw_ate(df, F.col("t"), F.col("y"), ["x"], iters=4).first()
        # local replay: same Newton, same clipping, same estimators
        X = np.array([[r[2]] for r in rows])
        tv = np.array([float(r[0]) for r in rows])
        yv = np.array([r[1] for r in rows])
        Xd = np.column_stack([X, np.ones(len(tv))])
        beta = np.zeros(2)
        for _ in range(4):
            eta = Xd @ beta
            p = 1 / (1 + np.exp(-eta))
            w = p * (1 - p)
            beta = beta + np.linalg.solve(
                (Xd * w[:, None]).T @ Xd, Xd.T @ (tv - p)
            )
        e = 1 / (1 + np.exp(-(Xd @ beta)))
        e = np.clip(e, 0.01, 0.99)
        ht = np.mean(tv * yv / e) - np.mean((1 - tv) * yv / (1 - e))
        hajek = (np.sum(tv * yv / e) / np.sum(tv / e)
                 - np.sum((1 - tv) * yv / (1 - e))
                 / np.sum((1 - tv) / (1 - e)))
        assert out["b_x0"] == pytest.approx(beta[0], abs=1e-9)
        assert out["b0"] == pytest.approx(beta[1], abs=1e-9)
        assert out["ate_ht"] == pytest.approx(ht, abs=1e-9)
        assert out["ate_hajek"] == pytest.approx(hajek, abs=1e-9)
        # true effect is 1.5; both estimators should land near it
        assert 1.0 < out["ate_hajek"] < 2.0
        assert out["n"] == 600 and out["n_treated"] == int(tv.sum())

    def test_clip_validation_and_nulls(self, spark):
        from pandera_spark.operators.abtest import ipw_ate

        df = spark.createDataFrame(
            [(True, 1.0, 0.5), (False, 2.0, -0.5), (None, 3.0, 0.1),
             (True, None, 0.2), (False, 4.0, None),
             (True, 2.0, 0.0), (False, 1.0, 0.3), (True, 3.0, -0.2)],
            "t boolean, y double, x double",
        )
        with pytest.raises(ValueError, match="clip"):
            ipw_ate(df, F.col("t"), F.col("y"), ["x"], clip=0.7)
        out = ipw_ate(df, F.col("t"), F.col("y"), ["x"], iters=2).first()
        assert out["n"] == 5  # three null rows dropped
