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
- The only driver values are true scalars: the dangling-rank mass and
  the optional L1 delta (1-row aggs) — never node or edge data.
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

__all__ = ["node_frame", "degree_report", "pagerank"]


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
) -> DataFrame:
    """Standard damped PageRank with dangling-mass redistribution:

    ``r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/deg(u) + dangling/N)``

    starting uniform at ``1/N``; ranks sum to 1 every round.  Returns
    ``(node, rank)``.  ``tol`` (optional) stops early when the L1 change
    drops below it.  Each round is one join + one groupBy-sum on the
    node key (the partitioning Catalyst reuses round-to-round), the
    dangling mass is a 1-row agg scalar, and the N-row rank frame is
    localCheckpoint-ed so lineage never grows with ``iters``.
    Deduplicate edge rows first if multi-edges should not weigh double.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).where(F.col("__s").isNotNull() & F.col("__d").isNotNull())
    nodes = node_frame(e, src="__s", dst="__d")
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("rank")
        )
    deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    # out-edges annotated with the sender's degree, computed once
    e_deg = e.join(deg, "__s")
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    if checkpoint:
        ranks = ranks.localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    for _ in range(int(iters)):
        # scalar: total rank parked on nodes with no out-edges
        dangling = (
            ranks.join(deg, ranks["node"] == deg["__s"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contrib = (
            ranks.join(e_deg, ranks["node"] == e_deg["__s"])
            .select(
                F.col("__d").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        new = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("__in", F.lit(0.0))
                        + F.lit(dangling / n)
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
            new = new.localCheckpoint(eager=True)
        ranks = new
        if tol is not None and delta < tol:
            break
    return ranks
