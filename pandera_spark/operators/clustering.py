"""Connected components + dedup clustering over candidate-pair graphs.

The last step of corpus-level near-dedup: MinHash/SimHash/embedding LSH
produce *pairs*; groups of mutually-similar documents form components, and
one canonical document per component is kept.  Pair lists alone over-keep
(A~B, B~C but A!~C still means one cluster).

``connected_components`` implements the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — the published standard for trillion-edge graphs): each round is
two groupBy-min + join passes over the edge list, converging in
O(log^2 n) rounds (2-3 for the short-diameter clusters dedup produces) to
a star graph pointing every node at its component's minimum id.  No
driver-side graph state — the only collected value per round is the
1-row convergence fingerprint.  Lineage is truncated every round
(localCheckpoint) so iteration count can't blow up the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters", "apply_dedup"]


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) undirected -> edges (v, m(u)) for v > u, with
    m(u) = min(neighbors(u) + {u}).  Output edges all point large -> small.

    No ``distinct()`` here: duplicate edges don't change any groupBy-min
    downstream, and the following small-star dedups — one shuffle per
    round instead of two."""
    nbr = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        nbr.groupBy("u").agg(F.min("v").alias("__mv"))
        .select("u", F.least(F.col("__mv"), F.col("u")).alias("m"))
    )
    return (
        nbr.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Directed large->small edges: rewire every neighbor (and u itself)
    to u's minimum neighbor."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        e.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _fingerprint(e: DataFrame):
    """Order-insensitive edge-set fingerprint: one tiny agg row.

    ``bit_xor`` (not ``sum``) of the per-edge hashes: xor never overflows,
    so the same plan runs under ``spark.sql.ansi.enabled=true`` (summing
    uniformly-random 64-bit longs raises ARITHMETIC_OVERFLOW there).  The
    edge set is distinct at every fingerprint site (the input is
    ``.distinct()``-ed and ``_small_star`` ends in ``distinct()``), so xor
    is collision-equivalent to a multiset hash here."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def _truncate(e: DataFrame) -> DataFrame:
    """Cut lineage between rounds; falls back to a plain cache where
    localCheckpoint is unavailable (Spark Connect)."""
    try:
        return e.localCheckpoint(eager=True)
    except Exception:  # pragma: no cover - Connect fallback
        e = e.persist()
        e.count()
        return e


def _union_find(edges) -> dict:
    """Driver-side union-find; roots are component minima."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    small_graph_threshold: int = 200_000,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    ``component`` is the minimum node id of its connected component.

    Adaptive execution: the deduped edge list is materialized and counted
    once; at or below ``small_graph_threshold`` edges (a few MB) the
    components are solved by a driver union-find — the pair graph of a
    100 TB corpus is usually *tiny* relative to the corpus, and one bounded
    collect beats 4-6 distributed iterations of pure scheduling overhead.
    Above the threshold (billions of pairs), the alternating star rounds
    run fully distributed; pass ``small_graph_threshold=0`` to force that
    path.  Isolated nodes (absent from ``pairs``) are their own components
    by definition — join the full corpus with ``coalesce(component, id)``
    downstream; this operator never scans the corpus.

    Node ids must be integral (byte/short/int/long): a silent
    ``cast("long")`` of string ids would null them out and return an
    empty result, so non-integral id columns raise — hash string ids to
    longs (e.g. ``xxhash64``) before calling.
    """
    from pyspark.sql import types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for name in (src, dst):
        dt = pairs.schema[name].dataType
        if not isinstance(dt, integral):
            raise TypeError(
                f"connected_components: id column {name!r} has type "
                f"{dt.simpleString()}; integral ids required — hash "
                "string ids to longs (e.g. F.xxhash64) first"
            )
    e = _truncate(
        pairs.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # one action serves both the size probe and (on the large path) the
    # round-0 convergence fingerprint — n_edges is its count component
    prev = _fingerprint(e)
    n_edges = prev[0]

    if n_edges <= small_graph_threshold:
        # one bounded collect (<= threshold rows, ~16 B each): a single
        # job, where toLocalIterator fired one sequential job PER
        # PARTITION (32 driver round-trips of scheduler latency for a
        # graph this path exists to treat as tiny — measured r11)
        comp = _union_find(
            (r["u"], r["v"]) for r in e.collect()
        )
        spark = pairs.sparkSession
        return spark.createDataFrame(
            list(comp.items()), "node long, component long"
        )

    # derived from the TRUNCATED edges: the (possibly expensive) pair
    # lineage — an LSH join upstream — executes exactly once
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    for i in range(max_iter):
        e = _small_star(_large_star(e))
        # lineage only needs cutting every few rounds: the convergence
        # fingerprint action materializes this round's shuffles, which
        # the next round reuses
        if (i + 1) % 3 == 0:
            e = _truncate(e)
        cur = _fingerprint(e)
        if cur == prev:
            break
        prev = cur

    # converged edge set is a star graph node -> component min; the
    # groupBy-min is a no-op at fixpoint but keeps one row per node even
    # if max_iter cut convergence short
    stars = e.groupBy("u").agg(F.min("v").alias("__comp"))
    return nodes.join(
        stars.select(F.col("u").alias("node"), "__comp"),
        "node",
        "left",
    ).select(
        "node",
        F.coalesce(F.col("__comp"), F.col("node")).alias("component"),
    )


def dedup_clusters(
    pairs: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster summary of a near-dup pair graph:
    (component, n_members, keep_id) — ``keep_id`` is the canonical
    (minimum-id) member; ``n_members - 1`` rows per cluster get dropped by
    the downstream anti-join."""
    comp = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("node").alias("keep_id"),
    )


def apply_dedup(
    corpus: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """The final dedup step: keep one canonical document per near-dup
    cluster, pass isolated documents through untouched.

    pairs -> connected components -> drop every node that is not its
    component's minimum id -> anti-join the corpus on the drop list.
    Equivalent to keeping ``keep_id`` per :func:`dedup_clusters` cluster
    plus every document absent from ``pairs`` (the
    ``coalesce(component, id)`` contract: isolated nodes are their own
    components and are never dropped — the corpus is only ever touched by
    the single anti-join, the component computation runs on the tiny pair
    graph).

    Scale shape: the drop list is |non-canonical cluster members| rows.
    For typical dup rates it's far smaller than the corpus and AQE turns
    the anti-join into a broadcast join at runtime (no corpus shuffle);
    for dup-heavy corpora where the list is genuinely big, a forced
    broadcast would OOM the executors — so the choice is left to AQE.
    """
    comp = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    # component ids ARE the per-component minimum node id, so the drop
    # list is just the nodes that aren't their own component
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return corpus.join(drop, id_col, "left_anti")
