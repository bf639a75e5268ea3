"""CUBE / ROLLUP / GROUPING SETS reports with grouping-id labels."""

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.olap import olap_report


def _df(spark):
    rows = [
        ("x", "u", 1.0), ("x", "u", 2.0), ("x", "v", 4.0),
        ("y", "u", 8.0), (None, "v", 16.0),
    ]
    return spark.createDataFrame(rows, "a string, b string, m double")


def test_cube_levels_and_gid(spark):
    out = olap_report(
        _df(spark), ["a", "b"],
        {"n": F.count(F.lit(1)).cast("long"), "s": F.sum("m")},
    ).collect()
    by = {(r.a, r.b, r.gid): r for r in out}
    # 4 finest (a,b) combos + 3 a-subtotals + 2 b-subtotals + 1 total
    assert len(out) == 10
    # finest grain (gid 0): 4 distinct (a, b) combos incl. real NULL a
    assert by[("x", "u", 0)].n == 2 and by[("x", "u", 0)].s == 3.0
    assert by[(None, "v", 0)].n == 1  # genuine null category, bit 0
    # a-only level (b aggregated away -> gid 0b01 = 1)
    assert by[("x", None, 1)].n == 3 and by[("x", None, 1)].s == 7.0
    assert by[(None, None, 1)].n == 1  # null-a subtotal, still level 1
    # b-only level (a away -> gid 0b10 = 2)
    assert by[(None, "u", 2)].n == 3
    assert by[(None, "v", 2)].s == 20.0
    # grand total gid 3
    assert by[(None, None, 3)].n == 5 and by[(None, None, 3)].s == 31.0


def test_rollup_is_prefix_hierarchy(spark):
    out = olap_report(
        _df(spark), ["a", "b"], {"n": F.count(F.lit(1)).cast("long")},
        mode="rollup",
    ).collect()
    gids = sorted({r.gid for r in out})
    assert gids == [0, 1, 3]  # (a,b), (a), () — never b-only
    assert sum(1 for r in out if r.gid == 3) == 1


def test_grouping_sets_explicit(spark):
    out = olap_report(
        _df(spark), ["a", "b"], {"n": F.count(F.lit(1)).cast("long")},
        mode=[["b"], []],
    ).collect()
    gids = sorted({r.gid for r in out})
    assert gids == [2, 3]
    with pytest.raises(ValueError, match="non-dims"):
        olap_report(
            _df(spark), ["a"], {"n": F.count(F.lit(1))}, mode=[["zz"]]
        )
    with pytest.raises(ValueError, match="dimension"):
        olap_report(_df(spark), [], {"n": F.count(F.lit(1))})
    with pytest.raises(ValueError, match="aggregate"):
        olap_report(_df(spark), ["a"], {})


def test_cube_single_expand_plan(spark):
    df = _df(spark)
    frame = olap_report(df, ["a", "b"], {"n": F.count(F.lit(1))})
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1  # one pass, not k unioned scans
    from pandera_spark.audit import plan_report

    rep = plan_report(frame)
    assert rep["cartesian_products"] == 0
    assert rep["exchanges"] <= 1
