"""Categorical encoding: smoothed target encoding (+LOO), frequency."""

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.encode import (
    fit_target_encoding,
    frequency_encode,
    target_encode,
)


def _df(spark):
    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 10.0), ("c", 2.0)]
    return spark.createDataFrame(rows, "cat string, y double")


def test_fit_target_encoding_smoothing_math(spark):
    enc = {r.cat: r for r in
           fit_target_encoding(_df(spark), "cat", "y", smoothing=2.0)
           .collect()}
    prior = (1 + 3 + 10 + 10 + 2) / 5  # 5.2
    assert enc["a"].n == 2
    assert enc["a"].cat_mean == pytest.approx(2.0)
    assert enc["a"].prior == pytest.approx(prior)
    assert enc["a"].enc == pytest.approx((4 + 2 * prior) / 4)
    assert enc["c"].enc == pytest.approx((2 + 2 * prior) / 3)


def test_fit_zero_smoothing_is_plain_mean(spark):
    enc = {r.cat: r.enc for r in
           fit_target_encoding(_df(spark), "cat", "y", smoothing=0.0)
           .collect()}
    assert enc["a"] == pytest.approx(2.0)
    assert enc["b"] == pytest.approx(10.0)


def test_target_encode_appends_column(spark):
    out = target_encode(_df(spark), "cat", "y", smoothing=2.0)
    prior = 5.2
    vals = {(r.cat, r.y): r.cat_te for r in out.collect()}
    assert vals[("a", 1.0)] == pytest.approx((4 + 2 * prior) / 4)
    assert out.columns == ["cat", "y", "cat_te"]


def test_target_encode_unseen_category_gets_prior(spark):
    train = _df(spark)
    enc = fit_target_encoding(train, "cat", "y", smoothing=2.0)
    val = spark.createDataFrame([("zz", 0.0)], "cat string, y double")
    r = target_encode(val, "cat", "y", encoder=enc).collect()[0]
    assert r.cat_te == pytest.approx(5.2)


def test_target_encode_leave_one_out(spark):
    out = target_encode(
        _df(spark), "cat", "y", smoothing=2.0, leave_one_out=True
    )
    prior = 5.2
    vals = {(r.cat, r.y): r.cat_te for r in out.collect()}
    # row (a, 1.0): exclude own target -> (4 - 1 + 2*prior) / (2 - 1 + 2)
    assert vals[("a", 1.0)] == pytest.approx((3 + 2 * prior) / 3)
    assert vals[("a", 3.0)] == pytest.approx((1 + 2 * prior) / 3)
    # LOO differs from the plain encoding (the leak it removes)
    assert vals[("a", 1.0)] != pytest.approx((4 + 2 * prior) / 4)


def test_target_encode_null_target_rows_get_plain_encoding(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 5.0)], "cat string, y double"
    )
    out = {(r.cat, r.y): r.cat_te
           for r in target_encode(df, "cat", "y", smoothing=0.0).collect()}
    # null-y row joins its category's encoding fitted WITHOUT it
    assert out[("a", None)] == pytest.approx(1.0)


def test_target_encode_loo_null_target_gets_full_enc_not_prior(spark):
    # a null-target row contributed nothing to the fit, so LOO has
    # nothing to exclude: seen categories must get the FULL encoding,
    # not the global prior (which is only for unseen categories)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 8.0), ("c", None)],
        "cat string, y double",
    )
    s = 2.0
    prior = (1.0 + 3.0 + 8.0) / 3
    enc_a = (4.0 + s * prior) / (2 + s)
    out = {
        (r.cat, r.y): r.cat_te
        for r in target_encode(
            df, "cat", "y", smoothing=s, leave_one_out=True
        ).collect()
    }
    assert out[("a", None)] == pytest.approx(enc_a)
    # unseen category (all-null targets) still falls back to prior
    assert out[("c", None)] == pytest.approx(prior)
    # non-null rows keep the LOO form
    assert out[("a", 1.0)] == pytest.approx((3.0 + s * prior) / (1 + s))


def test_frequency_encode(spark):
    df = _df(spark)
    out = {r.cat: r.cat_freq
           for r in frequency_encode(df, "cat").collect()}
    assert out["a"] == pytest.approx(0.4)
    assert out["c"] == pytest.approx(0.2)
    raw = {r.cat: r.cat_freq
           for r in frequency_encode(df, "cat", normalize=False).collect()}
    assert raw["a"] == 2 and raw["c"] == 1


def test_frequency_encode_null_category(spark):
    df = spark.createDataFrame(
        [("a",), (None,), (None,)], "cat string"
    )
    out = frequency_encode(df, "cat", normalize=False).collect()
    vals = {r.cat: r.cat_freq for r in out}
    assert vals[None] == 2 and vals["a"] == 1


def test_encode_plans_no_cartesian(spark):
    from pandera_spark.audit import plan_report

    df = _df(spark)
    for frame in (
        fit_target_encoding(df, "cat", "y"),
        frequency_encode(df, "cat"),
    ):
        rep = plan_report(frame)
        assert rep["cartesian_products"] == 0


def test_fit_quantile_bins_exact_edges(spark):
    from pandera_spark.operators.encode import fit_quantile_bins

    # 0..99: quartile edges at linear-interpolated order stats
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    edges = fit_quantile_bins(df, "x", 4)
    assert edges == pytest.approx([24.75, 49.5, 74.25])
    with pytest.raises(ValueError, match="n_bins"):
        fit_quantile_bins(df, "x", 1)
    empty = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError, match="no non-null"):
        fit_quantile_bins(empty, "x", 4)


def test_quantile_bin_balanced_and_null_bin(spark):
    from pandera_spark.operators.encode import quantile_bin

    rows = [(float(i),) for i in range(100)] + [(None,)]
    df = spark.createDataFrame(rows, "x double")
    out = quantile_bin(df, "x", n_bins=4)
    counts = {
        r["x_bin"]: r["n"]
        for r in out.groupBy("x_bin").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert counts[-1] == 1  # null bin
    assert sum(v for k, v in counts.items() if k >= 0) == 100
    # equal-frequency: every bin gets ~25
    assert all(v == 25 for k, v in counts.items() if k >= 0)


def test_quantile_bin_train_edges_on_validation(spark):
    from pandera_spark.operators.encode import (
        fit_quantile_bins,
        quantile_bin,
    )

    train = spark.createDataFrame(
        [(float(i),) for i in range(1000)], "x double"
    )
    edges = fit_quantile_bins(train, "x", 5)
    val = spark.createDataFrame(
        [(-50.0,), (100.5,), (999.0,), (5000.0,)], "x double"
    )
    got = {
        r.x: r.x_bin
        for r in quantile_bin(val, "x", edges=edges).collect()
    }
    assert got[-50.0] == 0 and got[5000.0] == 4  # out-of-range clamps
    with pytest.raises(ValueError, match="exactly one"):
        quantile_bin(val, "x")
    with pytest.raises(ValueError, match="exactly one"):
        quantile_bin(val, "x", n_bins=3, edges=edges)


def test_quantile_bin_apply_is_projection_only(spark):
    from pandera_spark.audit import plan_report
    from pandera_spark.operators.encode import quantile_bin

    df = spark.createDataFrame([(float(i),) for i in range(50)], "x double")
    rep = plan_report(quantile_bin(df, "x", edges=[10.0, 25.0]))
    assert rep["exchanges"] == 0  # pure CASE projection, no shuffle
    assert rep["cartesian_products"] == 0
