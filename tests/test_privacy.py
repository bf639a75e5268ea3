"""Privacy screens: k-anonymity and l-diversity."""

import pytest

from pandera_spark.operators.privacy import (
    k_anonymity_report,
    l_diversity_report,
    risky_groups,
)


def _df(spark):
    rows = (
        [("us", "a", "x")] * 5       # safe group (n=5)
        + [("us", "b", "x")] * 2     # risky at k=5
        + [("de", "a", "y")]         # singleton
    )
    return spark.createDataFrame(rows, "country string, seg string, s string")


def test_k_anonymity_report_values(spark):
    r = k_anonymity_report(_df(spark), ["country", "seg"], k=5).first()
    assert (r.n_rows, r.n_groups) == (8, 3)
    assert r.min_group_n == 1  # the table is 1-anonymous
    assert (r.risky_groups, r.risky_rows, r.k) == (2, 3, 5)


def test_k_anonymity_all_safe(spark):
    r = k_anonymity_report(_df(spark), ["country", "seg"], k=1).first()
    assert (r.risky_groups, r.risky_rows) == (0, 0)


def test_risky_groups_worklist(spark):
    got = {
        (r.country, r.seg, r.group_n)
        for r in risky_groups(_df(spark), ["country", "seg"], k=5).collect()
    }
    assert got == {("us", "b", 2), ("de", "a", 1)}


def test_l_diversity(spark):
    rows = (
        [("us", "flu")] * 3          # 1-diverse: everyone has flu
        + [("de", "flu"), ("de", "ok")]  # 2-diverse
    )
    df = spark.createDataFrame(rows, "country string, diag string")
    r = l_diversity_report(df, ["country"], "diag", l=2).first()
    assert r.n_groups == 2
    assert r.min_distinct == 1
    assert (r.weak_groups, r.weak_rows) == (1, 3)


def test_privacy_validation(spark):
    with pytest.raises(ValueError, match="quasi"):
        k_anonymity_report(_df(spark), [])
    with pytest.raises(ValueError, match="k must"):
        k_anonymity_report(_df(spark), ["country"], k=0)
    with pytest.raises(ValueError, match="l must"):
        l_diversity_report(_df(spark), ["country"], "s", l=0)
