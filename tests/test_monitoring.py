"""Operational monitoring: freshness, completeness, seasonal baseline,
fact-vs-rollup reconciliation."""

import datetime

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.monitoring import (
    completeness,
    freshness,
    seasonal_baseline,
)
from pandera_spark.operators.relational import reconcile_aggregate


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_freshness_lag_and_stale_flag(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00")),
            ("a", _ts("2024-01-02 12:00:00")),
            ("b", _ts("2024-01-03 00:00:00")),
        ],
        "g string, ts timestamp",
    )
    out = {
        r.g: r
        for r in freshness(
            df, "ts", by="g",
            as_of="2024-01-03 00:00:00",
            max_lag_seconds=6 * 3600,
        ).collect()
    }
    assert out["a"].n == 2
    assert out["a"].lag_seconds == 12 * 3600
    assert out["a"].stale is True
    assert out["b"].lag_seconds == 0
    assert out["b"].stale is False


def test_freshness_future_ts_is_negative_lag(spark):
    df = spark.createDataFrame(
        [("x", _ts("2024-01-05 00:00:00"))], "g string, ts timestamp"
    )
    r = freshness(df, "ts", by="g", as_of="2024-01-04 00:00:00").collect()[0]
    assert r.lag_seconds == -24 * 3600


def test_completeness_long_format(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (None, "x"), (4, "y")],
        "a int, b string",
    )
    out = {r.column: r for r in completeness(df, ["a", "b"]).collect()}
    assert out["a"].n == 4 and out["a"].n_null == 1
    assert out["a"].null_frac == pytest.approx(0.25)
    assert out["a"].n_distinct == 3
    assert out["b"].n_null == 1 and out["b"].n_distinct == 2


def test_completeness_bucketed_by_day(spark):
    df = spark.createDataFrame(
        [
            (_ts("2024-01-01 03:00:00"), 1),
            (_ts("2024-01-01 05:00:00"), None),
            (_ts("2024-01-02 03:00:00"), 3),
        ],
        "ts timestamp, v int",
    )
    out = completeness(df, ["v"], bucket="day", ts_col="ts").collect()
    by_day = {r.bucket.day: r for r in out}
    assert by_day[1].n == 2 and by_day[1].n_null == 1
    assert by_day[2].n == 1 and by_day[2].n_null == 0


def test_completeness_requires_paired_bucket_args(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError, match="go together"):
        completeness(df, ["a"], bucket="day")


def test_seasonal_baseline_flags_spike(spark):
    # same hour across 4 weeks: counts 10,10,10,40 -> week-4 bucket is hot
    rows = []
    for week in range(4):
        day = 1 + 7 * week
        n = 40 if week == 3 else 10
        for i in range(n):
            rows.append((_ts(f"2024-01-{day:02d} 09:{i % 60:02d}:00"),))
    df = spark.createDataFrame(rows, "ts timestamp")
    out = seasonal_baseline(df, "ts", min_sigma=1.5).collect()
    assert len(out) == 4
    hot = [r for r in out if r.metric == 40.0]
    cold = [r for r in out if r.metric == 10.0]
    assert len(hot) == 1 and hot[0].is_anomaly is True
    assert all(r.is_anomaly is False for r in cold)
    assert hot[0].base_mean == pytest.approx(17.5)
    # all four buckets share one hour-of-week slot
    assert len({(r.day_slot, r.hod) for r in out}) == 1


def test_seasonal_baseline_single_observation_null_z(spark):
    df = spark.createDataFrame([(_ts("2024-01-01 09:00:00"),)], "ts timestamp")
    r = seasonal_baseline(df, "ts").collect()[0]
    assert r.z is None and r.is_anomaly is None


def test_reconcile_aggregate_matches_and_violations(spark):
    parent = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 5.0, "A"), (3, 7.0, "B"), (4, 1.0, "B")],
        "k int, total double, seg string",
    )
    child = spark.createDataFrame(
        [(1, 4.0), (1, 6.0), (2, 5.0), (3, 6.0)],  # k=3 off by 1, k=4 missing
        "k int, amt double",
    )
    out = {
        r.seg: r
        for r in reconcile_aggregate(
            parent, child, "k", "total", F.col("amt"),
            by="seg", tol_abs=0.5,
        ).collect()
    }
    assert out["A"].n_parents == 2
    assert out["A"].n_violations == 0
    assert out["B"].n_missing_child == 1
    assert out["B"].n_violations == 2  # diff 1.0 > 0.5, plus missing child
    assert out["B"].max_abs_diff == pytest.approx(1.0)


def test_reconcile_aggregate_relative_tolerance(spark):
    parent = spark.createDataFrame([(1, 100.0)], "k int, total double")
    child = spark.createDataFrame([(1, 98.0)], "k int, amt double")
    ok = reconcile_aggregate(
        parent, child, "k", "total", F.col("amt"), tol_rel=0.05
    ).collect()[0]
    assert ok.n_violations == 0
    strict = reconcile_aggregate(
        parent, child, "k", "total", F.col("amt"), tol_rel=0.01
    ).collect()[0]
    assert strict.n_violations == 1


def test_monitoring_plans_no_cartesian(spark):
    from pandera_spark.audit import plan_report

    df = spark.createDataFrame(
        [(_ts("2024-01-01 00:00:00"), 1.0)], "ts timestamp, v double"
    )
    for frame in (
        freshness(df, "ts", as_of="2024-01-02 00:00:00"),
        completeness(df, ["v"], bucket="day", ts_col="ts"),
        seasonal_baseline(df, "ts", value="v"),
    ):
        rep = plan_report(frame)
        assert rep["cartesian_products"] == 0
        assert rep["broadcast_nested_loop_joins"] == 0


def test_gap_fill_locf_and_zero(spark):
    from pandera_spark.operators.temporal import gap_fill

    rollup = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00"), 5.0),
            ("a", _ts("2024-01-01 03:00:00"), 9.0),  # 01:00, 02:00 missing
            ("b", _ts("2024-01-01 01:00:00"), 1.0),
        ],
        "k string, bucket_start timestamp, m double",
    )
    locf = gap_fill(
        rollup, keys=["k"], value_cols=["m"], strategy="locf"
    ).collect()
    a = sorted(
        [r for r in locf if r.k == "a"], key=lambda r: r.bucket_start
    )
    assert [r.m for r in a] == [5.0, 5.0, 5.0, 9.0]
    assert [r.is_filled for r in a] == [False, True, True, False]
    assert len([r for r in locf if r.k == "b"]) == 1  # single-bucket span

    zero = gap_fill(
        rollup, keys=["k"], value_cols=["m"], strategy="zero"
    ).collect()
    az = sorted(
        [r for r in zero if r.k == "a"], key=lambda r: r.bucket_start
    )
    assert [r.m for r in az] == [5.0, 0.0, 0.0, 9.0]


def test_gap_fill_misaligned_rows_surface_not_vanish(spark):
    from pandera_spark.operators.temporal import gap_fill

    # 00:30 is not min + k*3600 for key "a" -> it cannot land on a
    # spine tick; the full-outer join must SURFACE it (flagged) rather
    # than silently drop it, and it still feeds LOCF in time order
    rollup = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00"), 5.0),
            ("a", _ts("2024-01-01 00:30:00"), 7.0),
            ("a", _ts("2024-01-01 02:00:00"), 9.0),
        ],
        "k string, bucket_start timestamp, m double",
    )
    out = sorted(
        gap_fill(rollup, keys=["k"], value_cols=["m"]).collect(),
        key=lambda r: r.bucket_start,
    )
    assert len(out) == 4  # 3 spine ticks + the misaligned actual
    assert [r.is_misaligned for r in out] == [False, True, False, False]
    assert [r.is_filled for r in out] == [False, False, True, False]
    # the 01:00 filled tick carries the misaligned 00:30 value forward
    assert [r.m for r in out] == [5.0, 7.0, 7.0, 9.0]
    # aligned input: no misaligned rows, same spine as before
    aligned = gap_fill(
        rollup.where("m <> 7.0"), keys=["k"], value_cols=["m"]
    ).collect()
    assert all(not r.is_misaligned for r in aligned)
    assert len(aligned) == 3


def test_gap_fill_rejects_unknown_columns_and_strategy(spark):
    from pandera_spark.operators.temporal import gap_fill

    df = spark.createDataFrame(
        [(_ts("2024-01-01 00:00:00"), 1.0)], "bucket_start timestamp, m double"
    )
    with pytest.raises(ValueError, match="not in frame"):
        gap_fill(df, value_cols=["nope"])
    with pytest.raises(ValueError, match="strategy"):
        gap_fill(df, value_cols=["m"], strategy="interp")


def test_gap_fill_window_is_key_partitioned(spark):
    from pandera_spark.audit import plan_report
    from pandera_spark.operators.temporal import gap_fill

    rollup = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:00:00"), 1.0)],
        "k string, bucket_start timestamp, m double",
    )
    rep = plan_report(
        gap_fill(rollup, keys=["k"], value_cols=["m"])
    )
    assert rep["unpartitioned_windows"] == []
    assert rep["cartesian_products"] == 0


def test_freshness_heartbeat_ledger_and_replay(spark, tmp_path):
    from pandera_spark.operators.monitoring import (
        freshness_heartbeat_foreach_batch,
        read_freshness_ledger,
    )

    path = str(tmp_path / "hb")
    assert read_freshness_ledger(spark, path, "g") is None

    proc = freshness_heartbeat_foreach_batch(path, "ts", ["g"])
    b0 = spark.createDataFrame(
        [("a", _ts("2024-01-01 01:00:00")),
         ("a", _ts("2024-01-01 02:00:00")),
         ("b", _ts("2024-01-01 03:00:00"))],
        "g string, ts timestamp",
    )
    b1 = spark.createDataFrame(
        [("a", _ts("2024-01-01 05:00:00"))], "g string, ts timestamp"
    )
    proc(b0, 0)
    proc(b1, 1)
    proc(b1, 1)  # at-least-once replay: must not double-count n

    out = {
        r.g: r
        for r in read_freshness_ledger(
            spark, path, "g",
            as_of="2024-01-01 06:00:00", max_lag_seconds=2 * 3600,
        ).collect()
    }
    assert out["a"].n == 3  # 2 + 1, replay collapsed
    assert out["a"].max_ts == _ts("2024-01-01 05:00:00")
    assert out["a"].lag_seconds == 3600 and out["a"].stale is False
    assert out["b"].lag_seconds == 3 * 3600 and out["b"].stale is True
    # ledger is heartbeat-sized: one row per (batch, group) appended
    assert spark.read.parquet(path).count() == 4  # 2 + 1 + 1 replay


def test_freshness_heartbeat_global_grain(spark, tmp_path):
    from pandera_spark.operators.monitoring import (
        freshness_heartbeat_foreach_batch,
        read_freshness_ledger,
    )

    path = str(tmp_path / "hb2")
    proc = freshness_heartbeat_foreach_batch(path, "ts")
    proc(
        spark.createDataFrame(
            [(_ts("2024-01-01 01:00:00"),)], "ts timestamp"
        ),
        0,
    )
    r = read_freshness_ledger(spark, path).collect()[0]
    assert r.n == 1 and r.max_ts == _ts("2024-01-01 01:00:00")


def test_temporal_split_labels_and_embargo(spark):
    from pandera_spark.operators.curation import temporal_split

    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),
            (2, _ts("2024-01-09 23:59:59")),
            (3, _ts("2024-01-10 00:00:00")),   # boundary -> embargo
            (4, _ts("2024-01-10 11:59:59")),   # inside embargo
            (5, _ts("2024-01-10 12:00:00")),   # test starts
            (6, None),
        ],
        "id int, ts timestamp",
    )
    out = {r.id: r.split for r in temporal_split(
        df, "ts", train_before="2024-01-10 00:00:00",
        embargo_seconds=12 * 3600,
    ).collect()}
    assert out[1] == "train" and out[2] == "train"
    assert out[3] == "embargo" and out[4] == "embargo"
    assert out[5] == "test"
    assert out[6] is None


def test_temporal_split_explicit_test_from(spark):
    from pandera_spark.operators.curation import temporal_split

    df = spark.createDataFrame(
        [(1, _ts("2024-02-01 00:00:00"))], "id int, ts timestamp"
    )
    r = temporal_split(
        df, "ts", train_before="2024-01-01 00:00:00",
        test_from="2024-03-01 00:00:00",
    ).collect()[0]
    assert r.split == "embargo"


def test_class_weights_inverse_and_effective(spark):
    import pytest as _pt
    from pandera_spark.operators.curation import class_weights

    rows = [("a",)] * 8 + [("b",)] * 2
    df = spark.createDataFrame(rows, "y string")
    out = {r.y: r for r in class_weights(df, "y", beta=0.9).collect()}
    # inverse frequency: tot/(k*n) = 10/(2*8), 10/(2*2)
    assert out["a"].inv_weight == _pt.approx(10 / 16)
    assert out["b"].inv_weight == _pt.approx(10 / 4)
    assert out["a"].frac == _pt.approx(0.8)
    # frequency-weighted mean of inv_weight is 1
    assert sum(r.inv_weight * r.n for r in out.values()) == _pt.approx(10)
    # effective weights: rare class boosted, mean over classes == 1
    assert out["b"].eff_weight > out["a"].eff_weight
    assert (out["a"].eff_weight + out["b"].eff_weight) / 2 == _pt.approx(1.0)
    with _pt.raises(ValueError, match="beta"):
        class_weights(df, "y", beta=1.0)


# ---------------------------------------------------------------------------
# property tests (hypothesis) — post-close hardening, test-only
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings as hsettings
from hypothesis import strategies as st

_HSET = hsettings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_HSET
@given(
    hours=st.lists(
        st.tuples(st.integers(0, 40), st.floats(-5, 5, allow_nan=False)),
        min_size=1, max_size=25, unique_by=lambda t: t[0],
    )
)
def test_gap_fill_locf_matches_python_replay(spark, hours):
    from pandera_spark.operators.temporal import gap_fill

    base = _ts("2024-01-01 00:00:00")
    rows = [
        (base + datetime.timedelta(hours=h), float(v)) for h, v in hours
    ]
    df = spark.createDataFrame(rows, "bucket_start timestamp, m double")
    out = sorted(
        gap_fill(df, value_cols=["m"], strategy="locf").collect(),
        key=lambda r: r.bucket_start,
    )
    # python replay
    by_h = {h: v for h, v in hours}
    lo, hi = min(by_h), max(by_h)
    assert len(out) == hi - lo + 1
    last = None
    for i, r in enumerate(out):
        h = lo + i
        if h in by_h:
            last = by_h[h]
            assert r.is_filled is False
        else:
            assert r.is_filled is True
        assert r.m == pytest.approx(last)


@_HSET
@given(
    data=st.lists(
        st.one_of(st.none(), st.integers(-3, 3)),
        min_size=1, max_size=40,
    )
)
def test_completeness_matches_python_counts(spark, data):
    from pandera_spark.operators.monitoring import completeness

    df = spark.createDataFrame([(v,) for v in data], "a int")
    r = completeness(df, ["a"]).collect()[0]
    n_null = sum(1 for v in data if v is None)
    assert r.n == len(data)
    assert r.n_null == n_null
    assert r.n_distinct == len({v for v in data if v is not None})
    assert r.null_frac == pytest.approx(n_null / len(data))


@_HSET
@given(
    parents=st.lists(
        st.tuples(st.integers(0, 8), st.floats(-50, 50, allow_nan=False)),
        min_size=1, max_size=12, unique_by=lambda t: t[0],
    ),
    children=st.lists(
        st.tuples(st.integers(0, 8), st.floats(-20, 20, allow_nan=False)),
        min_size=0, max_size=30,
    ),
    tol=st.floats(0.0, 10.0, allow_nan=False),
)
def test_reconcile_matches_python_replay(spark, parents, children, tol):
    from pandera_spark.operators.relational import reconcile_aggregate

    pdf = spark.createDataFrame(parents, "k int, total double")
    cdf = (
        spark.createDataFrame(children, "k int, amt double")
        if children
        else spark.createDataFrame([], "k int, amt double")
    )
    r = reconcile_aggregate(
        pdf, cdf, "k", "total", F.col("amt"), tol_abs=tol
    ).collect()[0]
    sums = {}
    for k, a in children:
        sums[k] = sums.get(k, 0.0) + a
    miss = sum(1 for k, _ in parents if k not in sums)
    viol = sum(
        1 for k, t in parents
        if k not in sums or abs(t - sums[k]) > tol + 1e-12
    )
    loose = sum(
        1 for k, t in parents
        if k not in sums or abs(t - sums[k]) > tol - 1e-12
    )
    assert r.n_parents == len(parents)
    assert r.n_missing_child == miss
    # fp slack: the engine's strict > can land either side of a
    # tolerance that hypothesis set exactly at a diff boundary
    assert viol <= r.n_violations <= loose


def test_cusum_changepoint_finds_known_shift(spark):
    from pandera_spark.operators.temporal import cusum_changepoints

    # key "a": mean 0 for 40 points then mean 10 for 40 -> cp at idx 40
    rows = []
    for i in range(80):
        v = 0.0 if i < 40 else 10.0
        v += (i % 5) * 0.1  # mild noise, deterministic
        rows.append(("a", _ts(f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}"), v))
    for i in range(50):  # key "b": flat
        rows.append(("b", _ts(f"2024-01-01 01:{i // 60:02d}:{i % 60:02d}"), 5.0 + (i % 3) * 0.01))
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    out = {r.k: r for r in cusum_changepoints(
        df, "ts", "x", keys=["k"]).collect()}
    a = out["a"]
    assert a.n == 80 and a.cp_index == 40
    assert a.mean_before == pytest.approx(0.2, abs=1e-9)
    assert a.mean_after == pytest.approx(10.2, abs=1e-9)
    assert a.strength > 3.0
    b = out["b"]
    assert b.strength is None or b.strength < 1.5
    # python replay of S at the changepoint for key a
    xs = [r[2] for r in rows if r[0] == "a"]
    mean = sum(xs) / len(xs)
    s = 0.0
    best = (0.0, -1)
    for i, v in enumerate(xs, 1):
        s += v - mean
        if abs(s) > best[0]:
            best = (abs(s), i)
    assert a.cp_index == best[1]
    assert a.s_max_abs == pytest.approx(best[0], rel=1e-12)


def test_cusum_degenerate_constant_series(spark):
    from pandera_spark.operators.temporal import cusum_changepoints

    df = spark.createDataFrame(
        [("a", _ts(f"2024-01-01 00:00:{i:02d}"), 7.0) for i in range(10)],
        "k string, ts timestamp, x double",
    )
    r = cusum_changepoints(df, "ts", "x", keys=["k"]).first()
    assert r.s_range == 0.0 and r.strength is None  # std=0 -> null (ANSI-safe)
    assert r.mean_before == 7.0


def test_cusum_plan_one_shuffle_partitioned_windows(spark):
    from pandera_spark.audit import plan_report
    from pandera_spark.operators.temporal import cusum_changepoints

    df = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:00:01"), 1.0)],
        "k string, ts timestamp, x double",
    )
    rep = plan_report(cusum_changepoints(df, "ts", "x", keys=["k"]))
    assert rep["unpartitioned_windows"] == []
    assert rep["cartesian_products"] == 0
    # all window passes reuse the single key shuffle
    assert rep["exchanges"] <= 2


def test_benford_digits_known_distribution(spark):
    from pandera_spark.operators.monitoring import benford_digits

    # 1, 11, 111: digit 1 x3; 2: x1; plus excluded junk (0, null, tiny)
    df = spark.createDataFrame(
        [(1.0,), (11.0,), (111.5,), (2.5,), (0.0,), (None,), (1e-9,)],
        "x double",
    )
    rows = {r.digit: r for r in benford_digits(df, "x").collect()}
    assert sorted(rows) == list(range(1, 10))  # full spine, always 9 rows
    assert rows[1].n == 3 and rows[2].n == 1
    assert all(rows[d].n == 0 for d in range(3, 10))
    assert rows[1].obs_frac == pytest.approx(0.75)
    import math
    assert rows[1].exp_frac == pytest.approx(math.log10(2))
    assert rows[9].dev == pytest.approx(-math.log10(1 + 1 / 9))


def test_benford_digit_boundary_powers_of_ten(spark):
    from pandera_spark.operators.monitoring import benford_digits

    # powers of ten are the classic log10-ulp trap; the integer-
    # mantissa route must put them all in digit 1
    vals = [0.001, 0.01, 0.1, 1.0, 10.0, 100.0, 1000.0, 1e6, 1e9]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r.digit: r.n for r in benford_digits(df, "x").collect()}
    assert rows[1] == len(vals)
    # 9.999999 stays digit 9 at precision 6; 9.9999999 rounds to 10.0
    df2 = spark.createDataFrame([(9.999999,), (9.9999999,)], "x double")
    rows2 = {r.digit: r.n for r in benford_digits(df2, "x").collect()}
    assert rows2[9] == 1 and rows2[1] == 1


def test_benford_summary_conforming_vs_uniform(spark):
    import math

    from pandera_spark.operators.monitoring import benford_summary

    # geometric ramp = near-perfect Benford; uniform 100..999 = flat
    geo = spark.createDataFrame(
        [(math.pow(10, (i % 1000) / 1000.0),) for i in range(9000)],
        "x double",
    )
    uni = spark.createDataFrame(
        [(float(100 + i % 900),) for i in range(9000)], "x double"
    )
    g = benford_summary(geo, "x").first()
    u = benford_summary(uni, "x").first()
    assert g.n == 9000 and u.n == 9000
    assert g.mad < 0.006          # Nigrini close conformity
    assert u.mad > 0.015          # clear nonconformity
    assert g.chi2 < u.chi2
    assert u.pvalue < 1e-6 and g.pvalue > 0.1


def test_benford_empty_input_null_summary(spark):
    from pandera_spark.operators.monitoring import benford_summary

    df = spark.createDataFrame([(0.0,), (None,)], "x double")
    r = benford_summary(df, "x").first()
    assert r.n == 0
    assert r.pvalue is None  # no chi2 on an empty screen
