"""Count-min sketch: overcount guarantee, merge = rebuild, ledger
replay safety."""

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.sketches import (
    cms_counters,
    cms_estimate,
    cms_ledger_foreach_batch,
    cms_merge,
    read_cms_ledger,
)

DW = dict(depth=3, width=64)


def _words(spark, words):
    return spark.createDataFrame([(w,) for w in words], "w string")


def test_cms_estimate_overcounts_never_under(spark):
    data = ["a"] * 10 + ["b"] * 5 + ["c"] * 1 + [f"x{i}" for i in range(50)]
    df = _words(spark, data)
    grid = cms_counters(df, "w", **DW)
    keys = _words(spark, ["a", "b", "c", "never_seen"]).distinct()
    est = {r.w: r.est for r in
           cms_estimate(grid, keys, "w", **DW).collect()}
    exact = {"a": 10, "b": 5, "c": 1, "never_seen": 0}
    n = len(data)
    for k, true in exact.items():
        assert est[k] >= true  # one-sided error
        assert est[k] <= true + 2 * n / DW["width"] + n  # sanity bound
    # wide grid relative to n: heavy key should be near-exact
    assert est["a"] == 10 or est["a"] - 10 <= n


def test_cms_grid_is_bounded_and_consistent(spark):
    df = _words(spark, [f"k{i}" for i in range(500)])
    grid = cms_counters(df, "w", **DW)
    rows = grid.collect()
    assert len(rows) <= DW["depth"] * DW["width"]
    # every depth row sums to the total occurrence count
    per_j = {}
    for r in rows:
        assert 0 <= r.cell < DW["width"]
        per_j[r.j] = per_j.get(r.j, 0) + r.cnt
    assert per_j == {0: 500, 1: 500, 2: 500}


def test_cms_weight_column(spark):
    df = spark.createDataFrame([("a", 7), ("a", 3), ("b", 2)], "w string, n int")
    grid = cms_counters(df, "w", weight="n", **DW)
    keys = _words(spark, ["a", "b"]).distinct()
    est = {r.w: r.est for r in cms_estimate(grid, keys, "w", **DW).collect()}
    assert est["a"] >= 10 and est["b"] >= 2


def test_cms_merge_equals_rebuild(spark):
    d1 = ["a"] * 4 + ["b"] * 2
    d2 = ["a"] * 1 + ["c"] * 3
    g1 = cms_counters(_words(spark, d1), "w", **DW)
    g2 = cms_counters(_words(spark, d2), "w", **DW)
    merged = {(r.j, r.cell): r.cnt for r in cms_merge(g1, g2).collect()}
    rebuilt = {(r.j, r.cell): r.cnt
               for r in cms_counters(_words(spark, d1 + d2), "w", **DW).collect()}
    assert merged == rebuilt


def test_cms_null_values_skipped(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "w string")
    grid = cms_counters(df, "w", **DW)
    assert grid.agg(F.sum("cnt")).collect()[0][0] == 2 * DW["depth"]


def test_cms_ledger_replay_does_not_double_count(spark, tmp_path):
    path = str(tmp_path / "cms")
    proc = cms_ledger_foreach_batch("w", path, **DW)
    b0 = _words(spark, ["a"] * 3 + ["b"])
    b1 = _words(spark, ["a"] * 2)
    proc(b0, 0)
    proc(b1, 1)
    proc(b1, 1)  # at-least-once replay of batch 1
    grid = read_cms_ledger(spark, path)
    keys = _words(spark, ["a", "b"]).distinct()
    est = {r.w: r.est for r in cms_estimate(grid, keys, "w", **DW).collect()}
    assert est["a"] == 5  # not 7: the replayed segment collapsed
    assert est["b"] == 1


def test_cms_plan_no_cartesian_and_broadcast_grid(spark):
    from pandera_spark.audit import plan_report

    df = _words(spark, ["a", "b"])
    grid = cms_counters(df, "w", **DW)
    est = cms_estimate(grid, df.distinct(), "w", **DW)
    rep = plan_report(est)
    assert rep["cartesian_products"] == 0
    assert rep["broadcast_nested_loop_joins"] == 0
    assert rep["broadcast_joins"] >= 1  # grid joins broadcast
