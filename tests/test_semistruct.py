"""JSON column profiling and typed extraction."""

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.semistruct import (
    json_extract_typed,
    json_key_profile,
)


def _df(spark):
    return spark.createDataFrame(
        [
            ('{"a": 1, "b": "x", "c": null}',),
            ('{"a": 2.5, "d": {"e": 1}, "f": [1,2]}',),
            ('{"a": "7", "b": "y"}',),
            ("not json",),
            (None,),
        ],
        "j string",
    )


def test_json_key_profile_type_tally(spark):
    out = {r.key: r for r in json_key_profile(_df(spark), "j").collect()}
    a = out["a"]
    assert a.n_present == 3
    # 1, 2.5 and "7" all try-cast to double (the dirty-data signal)
    assert a.n_numeric == 3 and a.n_string == 0
    assert a.num_min == pytest.approx(1.0)
    assert a.num_max == pytest.approx(7.0)
    assert a.num_avg == pytest.approx((1 + 2.5 + 7) / 3)
    assert a.n_distinct == 3
    assert out["b"].n_string == 2 and out["b"].n_numeric == 0
    assert out["c"].n_null_value == 1
    assert out["d"].n_object == 1
    assert out["f"].n_array == 1
    # malformed / null documents contribute no keys at all
    assert sum(r.n_present for r in out.values()) == 3 + 2 + 1 + 1 + 1


def test_json_extract_typed_and_error_tally(spark):
    df = spark.createDataFrame(
        [('{"k": 69, "s": "ok"}',), ('{"k": "oops", "s": 5}',), ('{}',)],
        "j string",
    )
    out = json_extract_typed(
        df, "j",
        {"k": ("$.k", "long"), "s": ("$.s", "string")},
        error_count_col="n_badcast",
    ).collect()
    rows = {(r.k, r.s, r.n_badcast) for r in out}
    assert (69, "ok", 0) in rows
    assert (None, "5", 1) in rows  # "oops" miscast counted; 5 -> "5" fine
    assert (None, None, 0) in rows  # absent paths are not errors


def test_json_extract_requires_fields(spark):
    with pytest.raises(ValueError, match="at least one field"):
        json_extract_typed(_df(spark), "j", {})


def test_json_profile_plan_single_aggregate(spark):
    from pandera_spark.audit import plan_report

    rep = plan_report(json_key_profile(_df(spark), "j"))
    assert rep["cartesian_products"] == 0
    assert rep["sort_merge_joins"] == 0
    assert rep["broadcast_joins"] == 0


def test_context_fit_known_values(spark):
    from pandera_spark.operators.text import context_fit

    df = spark.createDataFrame(
        [("a b c",), ("one two three four five",), ("",)],
        "text string",
    )  # token counts: 3, 5, 0
    out = {r.budget: r for r in
           context_fit(df, budgets=[4, 8]).collect()}
    assert out[4].n_docs == 3 and out[4].tokens_total == 8
    assert out[4].n_fit == 2  # 3 and 0 fit, 5 does not
    assert out[4].tokens_lost == 1  # 5 - 4
    assert out[4].fit_frac == pytest.approx(2 / 3)
    assert out[8].n_fit == 3 and out[8].tokens_lost == 0


def test_context_fit_rejects_bad_budgets(spark):
    from pandera_spark.operators.text import context_fit

    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="positive"):
        context_fit(df, budgets=[0])
