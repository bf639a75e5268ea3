"""Graph centrality over curation graphs (edge-list DataFrames).

Dedup and similarity stages already produce graphs — kNN edges
(:mod:`.similarity`), near-dup candidate pairs (:mod:`.dedup`), and
relational links (customer→supplier through the order book).  Centrality
over those graphs is a data-SELECTION signal: pick the most central
document of a near-dup cluster as its representative, weight a corpus
mix by link authority, spot hub accounts in an interaction graph.

Scale design (100 TB edges):

- Pure DataFrame power iteration: per round ONE ranks⋈edges join +
  ONE groupBy-sum — both shuffle on the node key, so consecutive
  rounds reuse the same hash partitioning.  The rank frame is N rows
  (nodes, not edges).
- Nothing reaches the driver but the optional 1-row L1 delta; the
  dangling-rank mass stays in-plan as a broadcast 1-row frame.
- Lineage is cut every round (``localCheckpoint``) exactly like
  :mod:`.clustering`'s connected components, so the plan stays flat for
  any iteration count.
- Degrees are computed once, outside the loop.

Determinism: pure double arithmetic from a uniform start — replayable in
ANSI SQL by unrolling the recurrence (the ``pagerank_orders`` contract
row replays two full rounds, dangling mass included, in DuckDB).

Reference parity: none — no graph surface in the reference; part of the
beyond-reference curation set (SURVEY §6).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["node_frame", "degree_report", "pagerank", "triangle_count"]


def node_frame(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Distinct node set of an edge list — one column ``node``."""
    return (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .where(F.col("node").isNotNull())
        .distinct()
    )


def degree_report(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node out/in degree — the pre-centrality screen (hubs,
    sinks, dangling nodes).  Two key-grain aggs + one outer join on the
    node key; output is N rows."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        node_frame(edges, src=src, dst=dst)
        .join(out_d, "node", "left")
        .join(in_d, "node", "left")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    tol: Optional[float] = None,
    checkpoint: bool = True,
    broadcast_nodes: int = 1_000_000,
) -> DataFrame:
    """Standard damped PageRank with dangling-mass redistribution:

    ``r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/deg(u) + dangling/N)``

    starting uniform at ``1/N``; ranks sum to 1 every round.  Returns
    ``(node, rank)``.  ``tol`` (optional) stops early when the L1 change
    drops below it (costs one extra 1-row action per round).

    Physical shape per round: one ranks⋈edges join + one groupBy-sum on
    the node key (the partitioning Catalyst reuses round-to-round); the
    dangling mass folds into the plan as a broadcast 1-row frame, so a
    round is ONE action.  With ``checkpoint=True`` (default) the graph
    structure (nodes, degrees, degree-annotated edges) is materialized
    once up front — otherwise every round would re-derive the upstream
    edge plan (often an expensive join) from scratch — and the N-row
    rank frame is localCheckpoint-ed per round so lineage never grows
    with ``iters``.  When the node count is at most ``broadcast_nodes``
    the rank frame is explicitly broadcast into the edge join —
    checkpointed frames lose size statistics, so without the hint Spark
    shuffle-joins the whole edge list against an N-row frame every
    round; above the threshold the joins fall back to consistent
    node-key shuffles (the billions-of-nodes regime).  Deduplicate edge
    rows first if multi-edges should not weigh double.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).where(F.col("__s").isNotNull() & F.col("__d").isNotNull())
    if checkpoint:
        # materialize the (possibly expensive) upstream edge plan
        # ONCE; everything below derives from the cached edge list
        e = e.localCheckpoint(eager=True)
    deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    # node set annotated with out-degree (null = dangling): ONE
    # checkpointed N-row frame replaces the former separate nodes +
    # deg materializations, and carrying the degree on the rank frame
    # lets every round read the dangling mass with a filter instead of
    # an anti-join against deg
    nd = node_frame(e, src="__s", dst="__d").join(
        deg.select(F.col("__s").alias("node"),
                   F.col("__deg").alias("__rdeg")),
        "node", "left",
    )
    # out-edges annotated with the sender's degree, computed once
    e_deg = e.join(deg, "__s")
    if checkpoint:
        # cheap actions over the cached edges — keeps every loop round
        # from re-deriving them
        nd = nd.localCheckpoint(eager=True)
        e_deg = e_deg.localCheckpoint(eager=True)
    n = nd.count()
    if n == 0:
        return nd.select(
            "node", F.lit(0.0).alias("rank")
        )
    ranks = nd.select("node", "__rdeg", F.lit(1.0 / n).alias("rank"))
    if checkpoint:
        ranks = ranks.localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    small = n <= int(broadcast_nodes)
    for _ in range(int(iters)):
        r_side = F.broadcast(ranks) if small else ranks
        # dangling rank mass folded into the plan as a broadcast 1-row
        # frame — no extra driver action per round
        dang = (
            ranks.where(F.col("__rdeg").isNull())
            .agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
        )
        contrib = (
            r_side.join(e_deg, ranks["node"] == e_deg["__s"])
            .select(
                F.col("__d").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        new = (
            nd.join(
                F.broadcast(contrib) if small else contrib,
                "node",
                "left",
            )
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "__rdeg",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("__in", F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if tol is not None:
            delta = (
                new.join(
                    ranks.select(
                        "node", F.col("rank").alias("__old")
                    ),
                    "node",
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))))
                .first()[0]
            )
        if checkpoint:
            # per-round materialization is the cheap option here: an
            # un-checkpointed rank frame would be re-executed by BOTH
            # its broadcast side and the dangling-mass subplan next
            # round (two full subplan evaluations per skipped cut)
            new = new.localCheckpoint(eager=True)
        ranks = new
        if tol is not None and delta < tol:
            break
    return ranks.select("node", "rank")


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    per_node: bool = False,
) -> DataFrame:
    """Triangles in an undirected graph given as an edge list.

    Output: one row ``(n_nodes, n_edges, n_triangles, global_clustering)``
    — or, with ``per_node``, one row per node ``(node, triangles)``.
    ``global_clustering`` is the transitivity ratio
    ``3·triangles / wedges`` (null for wedge-free graphs).

    Direction, duplicate edges and self-loops are normalized away first
    (canonical ``lo < hi`` form + distinct).  The count uses the
    ordered-triple join: each triangle (a<b<c) is found exactly once by
    joining (a,b)+(b,c) and probing (a,c) — two equi-joins on node
    keys, never a cross product.  At scale the joins shuffle on node
    id; for power-law graphs pre-filter hubs or count on the
    mutual-kNN edge set (bounded degree by construction).  Wedge counts
    come from ONE degree aggregation: ``Σ d·(d−1)/2``.
    """
    lo, hi = F.least(F.col(src), F.col(dst)), F.greatest(
        F.col(src), F.col(dst)
    )
    e = (
        edges.where(F.col(src) != F.col(dst))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
    )
    e_ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e_bc = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e_ac = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e_ab.join(e_bc, "y")  # x < y < z by construction
    tris = wedges.join(e_ac, ["x", "z"])
    if per_node:
        melted = tris.select(
            F.explode(F.array("x", "y", "z")).alias("node")
        )
        return melted.groupBy("node").agg(
            F.count(F.lit(1)).cast("long").alias("triangles")
        )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("double").alias("d"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("__wedges"),
    )
    tri_n = tris.agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    # two 1-row frames: the bounded bounds-cross pattern
    out = stats.crossJoin(F.broadcast(tri_n))
    return out.select(
        "n_nodes", "n_edges", "n_triangles",
        F.try_divide(
            3.0 * F.col("n_triangles"), F.col("__wedges")
        ).alias("global_clustering"),
    )
