"""Kaplan-Meier estimator vs hand-computed and python-replay values."""

import math

import pytest

from pandera_spark.operators.survival import km_curve


def _py_km(pairs):
    """pairs: (duration, observed). Returns {t: (n_risk, d, c, S, se)}."""
    from collections import defaultdict

    d = defaultdict(int)
    c = defaultdict(int)
    for t, e in pairs:
        (d if e else c)[t] += 1
    times = sorted(set(d) | set(c))
    n = len(pairs)
    s = 1.0
    gw = 0.0
    out = {}
    for t in times:
        dt, ct = d.get(t, 0), c.get(t, 0)
        if dt:
            if dt >= n:
                s = 0.0
            else:
                s *= 1 - dt / n
                gw += dt / (n * (n - dt))
        se = None if s == 0.0 else s * math.sqrt(gw)
        out[t] = (n, dt, ct, s, se)
        n -= dt + ct
    return out


def test_km_textbook_example(spark):
    # classic: events at 1, 3, 5; censored at 2, 4
    pairs = [(1.0, True), (2.0, False), (3.0, True), (4.0, False), (5.0, True)]
    df = spark.createDataFrame(pairs, "t double, e boolean")
    got = {r.t: r for r in km_curve(df, "t", "e").collect()}
    exp = _py_km(pairs)
    assert set(got) == set(exp)
    for t, (n, d, c, s, se) in exp.items():
        r = got[t]
        assert (r.n_risk, r.d, r.c) == (n, d, c)
        assert r.survival == pytest.approx(s, rel=1e-12)
        if se is None:
            assert r.std_err is None
        else:
            assert r.std_err == pytest.approx(se, rel=1e-9)
    # S(1)=4/5, S(3)=4/5*2/3, S(5)=0 (last at-risk subject dies)
    assert got[1.0].survival == pytest.approx(0.8)
    assert got[3.0].survival == pytest.approx(0.8 * 2 / 3)
    assert got[5.0].survival == 0.0 and got[5.0].std_err is None


def test_km_heavy_ties_and_replay(spark):
    pairs = []
    for i in range(200):
        t = float((i % 7) + 1)
        e = (i % 3) != 0
        pairs.append((t, e))
    df = spark.createDataFrame(pairs, "t double, e boolean")
    got = {r.t: r for r in km_curve(df, "t", "e").collect()}
    exp = _py_km(pairs)
    assert set(got) == set(exp)
    for t, (n, d, c, s, se) in exp.items():
        assert got[t].n_risk == n
        assert got[t].survival == pytest.approx(s, rel=1e-12)


def test_km_groups_and_null_handling(spark):
    rows = [
        ("A", 1.0, True), ("A", 2.0, False), ("A", None, True),
        ("B", 1.0, None), ("B", 3.0, True),
    ]
    df = spark.createDataFrame(rows, "g string, t double, e boolean")
    out = km_curve(df, "t", "e", by="g").collect()
    a = {r.t: r for r in out if r.g == "A"}
    b = {r.t: r for r in out if r.g == "B"}
    assert set(a) == {1.0, 2.0} and set(b) == {1.0, 3.0}
    assert a[1.0].n_risk == 2  # null duration excluded
    assert b[1.0].c == 1       # null event counts as censored
    assert b[3.0].survival == 0.0  # only remaining subject dies


def test_km_all_censored_flat_curve(spark):
    df = spark.createDataFrame(
        [(float(i), False) for i in range(1, 6)], "t double, e boolean"
    )
    out = km_curve(df, "t", "e").collect()
    assert all(r.survival == 1.0 for r in out)
    assert all(r.std_err == 0.0 for r in out)


def test_km_plan_partitioned_windows(spark):
    from pandera_spark.audit import plan_report

    df = spark.createDataFrame(
        [("A", 1.0, True)], "g string, t double, e boolean"
    )
    rep = plan_report(km_curve(df, "t", "e", by="g"))
    assert rep["unpartitioned_windows"] == []
    assert rep["cartesian_products"] == 0


def _py_na(pairs):
    """Local Nelson-Aalen replay: pairs = (duration, observed)."""
    from collections import Counter

    times = sorted({t for t, _ in pairs})
    n_risk = len(pairs)
    d_at = Counter(t for t, e in pairs if e)
    all_at = Counter(t for t, _ in pairs)
    out = {}
    h, v = 0.0, 0.0
    for t in times:
        d = d_at.get(t, 0)
        if n_risk > 0 and d > 0:
            h += d / n_risk
            v += d / (n_risk * n_risk)
        out[t] = (n_risk, d, h, v ** 0.5)
        n_risk -= all_at[t]
    return out


def test_nelson_aalen_matches_local(spark):
    from pandera_spark.operators.survival import nelson_aalen

    pairs = [(2.0, True), (3.0, True), (3.0, False), (5.0, True),
             (5.0, True), (7.0, False), (9.0, True), (9.0, False)]
    df = spark.createDataFrame(pairs, "dur double, ev boolean")
    out = {r["t"]: r for r in nelson_aalen(df, "dur", "ev").collect()}
    local = _py_na(pairs)
    assert set(out) == set(local)
    for t, (nr, d, h, se) in local.items():
        assert out[t]["n_risk"] == nr
        assert out[t]["d"] == d
        assert out[t]["cum_hazard"] == pytest.approx(h, abs=1e-12)
        assert out[t]["std_err"] == pytest.approx(se, abs=1e-12)


def test_nelson_aalen_vs_km_exp_relation(spark):
    import math

    from pandera_spark.operators.survival import km_curve, nelson_aalen

    import numpy as np
    rng = np.random.RandomState(3)
    pairs = [(float(rng.exponential(10.0)), bool(rng.uniform() < 0.7))
             for _ in range(300)]
    df = spark.createDataFrame(pairs, "dur double, ev boolean")
    na = {r["t"]: r["cum_hazard"]
          for r in nelson_aalen(df, "dur", "ev").collect()}
    km = {r["t"]: r["survival"] for r in km_curve(df, "dur", "ev").collect()}
    # exp(-H) approximates S; agree within a few percent mid-curve
    mid = sorted(na)[len(na) // 2]
    assert math.exp(-na[mid]) == pytest.approx(km[mid], rel=0.05)


def test_nelson_aalen_groups(spark):
    from pandera_spark.operators.survival import nelson_aalen

    df = spark.createDataFrame(
        [("a", 1.0, True), ("a", 2.0, True), ("b", 1.0, False),
         ("b", 3.0, True)],
        "g string, dur double, ev boolean",
    )
    out = {(r["g"], r["t"]): r
           for r in nelson_aalen(df, "dur", "ev", by="g").collect()}
    assert out[("a", 1.0)]["cum_hazard"] == pytest.approx(0.5)
    assert out[("a", 2.0)]["cum_hazard"] == pytest.approx(1.5)
    assert out[("b", 1.0)]["cum_hazard"] == pytest.approx(0.0)
    assert out[("b", 3.0)]["cum_hazard"] == pytest.approx(1.0)


def test_rmst_hand_computed(spark):
    from pandera_spark.operators.survival import rmst

    # events at t=2 (S->0.75), t=5 (S->0.5), censor at 7, event 9 (S->0.25? )
    pairs = [(2.0, True), (5.0, True), (7.0, False), (9.0, True)]
    df = spark.createDataFrame(pairs, "dur double, ev boolean")
    # S: [0,2)=1, [2,5)=0.75, [5,9)=0.5, [9,..)=0.5*(1-1/1)=0
    out = rmst(df, "dur", "ev", tau=8.0).first()
    expected = 1.0 * 2 + 0.75 * 3 + 0.5 * 3
    assert out["rmst"] == pytest.approx(expected, abs=1e-12)
    assert out["tau"] == 8.0
    # tau beyond the last time: plateau at the final S (0 here)
    out2 = rmst(df, "dur", "ev", tau=20.0).first()
    expected2 = 1.0 * 2 + 0.75 * 3 + 0.5 * 4 + 0.0 * 11
    assert out2["rmst"] == pytest.approx(expected2, abs=1e-12)


def test_rmst_no_events_equals_tau(spark):
    from pandera_spark.operators.survival import rmst

    df = spark.createDataFrame(
        [(3.0, False), (6.0, False)], "dur double, ev boolean"
    )
    out = rmst(df, "dur", "ev", tau=5.0).first()
    assert out["rmst"] == pytest.approx(5.0)  # S = 1 throughout
    with pytest.raises(ValueError, match="tau"):
        rmst(df, "dur", "ev", tau=0.0)


def test_rmst_groups_match_km_integral(spark):
    import numpy as np

    from pandera_spark.operators.survival import km_curve, rmst

    rng = np.random.RandomState(12)
    rows = []
    for g, scale in (("a", 6.0), ("b", 12.0)):
        for _ in range(120):
            rows.append((g, float(rng.exponential(scale)),
                         bool(rng.uniform() < 0.75)))
    df = spark.createDataFrame(rows, "g string, dur double, ev boolean")
    tau = 10.0
    out = {r["g"]: r["rmst"]
           for r in rmst(df, "dur", "ev", tau=tau, by="g").collect()}
    for g in ("a", "b"):
        curve = sorted(
            (r["t"], r["survival"])
            for r in km_curve(df, "dur", "ev", by="g").collect()
            if r["g"] == g
        )
        area, prev_t, prev_s = 0.0, 0.0, 1.0
        for t, sv in curve:
            area += prev_s * max(min(t, tau) - prev_t, 0.0)
            prev_t, prev_s = min(t, tau), sv
        area += max(tau - prev_t, 0.0) * prev_s
        assert out[g] == pytest.approx(area, abs=1e-10)
    assert out["b"] > out["a"]  # longer-lived group
