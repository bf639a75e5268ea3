"""numeric.grouped_percentiles: per-segment distribution profile."""

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.numeric import grouped_percentiles


def _df(spark):
    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(i * 10)) for i in range(1, 11)
    ]
    return spark.createDataFrame(rows, "g string, v double")


def test_exact_grouped_percentiles_known_values(spark):
    out = grouped_percentiles(
        _df(spark), ["v"], ["g"], probs=(0.5,), exact=True
    )
    rows = {(r.g, r.p): r.value for r in out.collect()}
    assert rows[("a", 0.5)] == pytest.approx(50.5)  # interpolated
    assert rows[("b", 0.5)] == pytest.approx(55.0)


def test_approx_default_within_rank_bound(spark):
    out = grouped_percentiles(_df(spark), ["v"], ["g"], probs=(0.5,))
    rows = {(r.g, r.p): r.value for r in out.collect()}
    # sketch returns an actual data value near the target rank
    assert rows[("a", 0.5)] in {50.0, 51.0}
    assert rows[("b", 0.5)] in {50.0, 60.0}


def test_single_grouped_aggregation_plan(spark):
    out = grouped_percentiles(
        _df(spark), ["v"], ["g"], probs=(0.25, 0.5, 0.75), exact=True
    )
    raw = out._jdf.queryExecution().executedPlan().toString()
    assert raw.count("Exchange") == 1  # one shuffle on the keys


def test_long_format_shape_and_validation(spark):
    out = grouped_percentiles(
        _df(spark), ["v"], ["g"], probs=(0.1, 0.9), exact=True
    )
    assert out.columns == ["g", "col_name", "p", "value"]
    assert out.count() == 2 * 2  # groups x probs
    with pytest.raises(ValueError, match="at least one"):
        grouped_percentiles(_df(spark), [], ["g"])
    with pytest.raises(ValueError, match="probabilities"):
        grouped_percentiles(_df(spark), ["v"], ["g"], probs=(1.5,))


def test_standardize_zscore_properties(spark):
    from pandera_spark.operators.numeric import standardize

    df = _df(spark)
    out = standardize(df, ["v"], method="zscore")
    chk = out.agg(
        F.round(F.avg("v_std"), 9).alias("m"),
        F.round(F.stddev_samp("v_std"), 9).alias("s"),
    ).first()
    assert chk.m == pytest.approx(0.0, abs=1e-9)
    assert chk.s == pytest.approx(1.0, abs=1e-9)


def test_standardize_minmax_and_robust(spark):
    from pandera_spark.operators.numeric import standardize

    df = _df(spark)
    mm = standardize(df, ["v"], method="minmax").agg(
        F.min("v_std"), F.max("v_std")
    ).first()
    assert (mm[0], mm[1]) == (0.0, 1.0)
    rb = standardize(df, ["v"], method="robust", exact=True)
    med = rb.where(F.col("g") == "a").agg(
        F.percentile(F.col("v_std"), F.lit(0.5))
    ).first()[0]
    assert med is not None  # scaled, non-degenerate


def test_standardize_zero_spread_and_nulls(spark):
    from pandera_spark.operators.numeric import standardize

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("a", None)], "g string, v double"
    )
    rows = standardize(df, ["v"], method="zscore").select("v_std").collect()
    assert all(r.v_std is None for r in rows)
    with pytest.raises(ValueError, match="unknown method"):
        standardize(df, ["v"], method="nope")


def test_trimmed_mean_known_values(spark):
    from pandera_spark.operators.numeric import trimmed_mean

    # 1..100 plus two wild outliers; 5-95% band keeps the middle
    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("a", 1e9), ("a", 2e9), ("a", None)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = trimmed_mean(df, ["v"], lower=0.05, upper=0.95, exact=True).first()
    assert r.col_name == "v"
    assert r.n_kept + r.n_dropped == 102  # nulls in neither bucket
    assert abs(r.tmean - 50.5) < 3  # outliers gone
    # plain mean would be dominated by the 1e9 outliers
    plain = df.agg(F.avg("v")).first()[0]
    assert plain > 1e7  # dominated by the outliers
