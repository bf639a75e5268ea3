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
