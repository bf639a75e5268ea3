"""Graph centrality (operators/graph.py) — differential vs a numpy
power-iteration reference, invariants (rank mass = 1 every round,
dangling redistribution), and the lineage/scale guards."""

import numpy as np
import pytest

from pandera_spark.operators.graph import (
    degree_report,
    node_frame,
    pagerank,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _np_pagerank(pairs, iters, d=0.85):
    nodes = sorted({u for u, v in pairs} | {v for u, v in pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in pairs:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        new = np.full(n, (1 - d) / n + d * dangling / n)
        for u, v in pairs:
            new[idx[v]] += d * r[idx[u]] / deg[idx[u]]
        r = new
    return dict(zip(nodes, r))


PAIRS = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("e", "d"), ("f", "e"),
    # g is dangling (in-edges only)
    ("a", "g"), ("b", "g"),
]


def test_node_frame_and_degree_report(spark):
    e = _edges_df(spark, PAIRS)
    assert {r["node"] for r in node_frame(e).collect()} == set("abcdefg")
    rep = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in degree_report(e).collect()}
    assert rep["a"] == (3, 1)
    assert rep["g"] == (0, 2)
    assert rep["f"] == (1, 0)


@pytest.mark.parametrize("iters", [1, 5])
def test_pagerank_matches_numpy(spark, iters):
    e = _edges_df(spark, PAIRS)
    got = {r["node"]: r["rank"]
           for r in pagerank(e, iters=iters).collect()}
    ref = _np_pagerank(PAIRS, iters)
    assert set(got) == set(ref)
    for v in got:
        assert got[v] == pytest.approx(ref[v], rel=1e-12)
    # rank mass is conserved exactly (dangling redistribution)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_tol_stops_early(spark):
    e = _edges_df(spark, PAIRS)
    # with a loose tolerance the loop must converge well before 50
    out = pagerank(e, iters=50, tol=1e-3)
    ranks = {r["node"]: r["rank"] for r in out.collect()}
    ref = _np_pagerank(PAIRS, 50)
    for v in ranks:
        assert ranks[v] == pytest.approx(ref[v], abs=5e-3)


def test_pagerank_null_edges_and_validation(spark):
    e = spark.createDataFrame(
        [("a", "b"), (None, "c"), ("b", None)],
        "src string, dst string",
    )
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=2).collect()}
    assert set(got) == {"a", "b"}
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.5)


def test_pagerank_empty_graph(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert pagerank(e, iters=3).count() == 0


def test_pagerank_plan_flat_across_iters(spark):
    """localCheckpoint must keep the final plan size independent of the
    iteration count — the lineage guard for large iters."""
    e = _edges_df(spark, PAIRS)
    p3 = pagerank(e, iters=3)._jdf.queryExecution() \
        .executedPlan().toString()
    p9 = pagerank(e, iters=9)._jdf.queryExecution() \
        .executedPlan().toString()
    assert abs(len(p9) - len(p3)) < 200


def test_pagerank_representative_selection_composes(spark):
    """Centrality feeds representative selection: the hub of a near-dup
    cluster outranks its satellites."""
    star = [("sat1", "hub"), ("sat2", "hub"), ("sat3", "hub"),
            ("hub", "sat1")]
    got = {r["node"]: r["rank"]
           for r in pagerank(_edges_df(spark, star), iters=8).collect()}
    assert got["hub"] > max(got["sat2"], got["sat3"])
