"""Training-export sharding: deterministic shard assignment, epoch-keyed
global shuffle order, and physical shard writing.

The last mile of a training-data pipeline: the curated corpus must be
(a) split into a fixed number of shards balanced by content hash, (b)
presented in a different — but *reproducible* — global order every
epoch, and (c) written so each shard is one sorted file set a data
loader can stream.  All three are pure functions of (key, salt, epoch):
no RNG, no driver state, so a re-run, a retry, or a different engine
produces byte-identical shard layouts (same property as
:func:`..curation.hash_split`).

Design for 100 TB:
- shard assignment and the epoch sort key are narrow projections over
  an md5-derived 28-bit hash (JVM codegen, ANSI-safe) — the only
  shuffle in the whole export is the final ``repartition`` on the shard
  id, which the write requires anyway.
- the epoch "shuffle" is sort-based: a new epoch re-keys every row with
  ``hash(key ':epoch=' e)`` and sorts *within* shards — a full-corpus
  deterministic permutation without any global total-order bottleneck
  (no single-partition window, no zipWithIndex).
- per-shard positions come from a window partitioned BY SHARD, so the
  heaviest state any task holds is one shard's keys, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash28

__all__ = [
    "shard_assign",
    "epoch_sort_key",
    "interleave_positions",
    "shard_stats",
    "write_shards",
]


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    *,
    salt: str = "",
    out_col: str = "shard",
) -> DataFrame:
    """Deterministic shard id in ``[0, n_shards)``:
    ``portable_hash28(key || salt) % n_shards``.  Content-hash balanced
    (uniform over keys), replayable by any engine with md5."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = portable_hash28(
        F.concat(F.col(key_col).cast("string"), F.lit(salt))
    )
    return df.withColumn(out_col, (h % F.lit(n_shards)).cast("int"))


def balanced_shards(
    df: DataFrame,
    cost_col: str,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    out_col: str = "shard",
    num_partitions: int | None = None,
) -> DataFrame:
    """Size-balanced shard assignment by SNAKE (boustrophedon) order:
    rows are ranked by cost descending (id ascending tie-break) and
    dealt across shards forward then backward — rank r maps to shard
    ``r % 2n < n ? r % 2n : 2n - 1 - r % 2n``.

    Hash sharding (:func:`shard_assign`) balances ROW counts; when rows
    carry wildly different costs (token counts — the usual case for
    training shards), hash shards skew by total cost.  Snake dealing on
    the sorted costs bounds the shard-total spread by one max-cost row
    (the classic LPT-lite bound), with a CLOSED-FORM assignment any
    engine can replay — no sequential state, unlike true LPT's
    min-load-heap.

    The global rank is the scalable two-pass formulation (the
    :mod:`.ordered` idiom), never an un-partitioned window:
    ``repartitionByRange(cost desc, id)`` makes partitions range-
    disjoint, a window partitioned by ``spark_partition_id()`` ranks in
    PARALLEL, and per-partition row counts (one #partitions-row
    aggregate, cumulated by a window over that tiny frame) provide the
    offsets — global rank = offset(pid) + local rank.  The rank is a
    pure function of the (cost, id) total order, independent of where
    the sampled range boundaries fall, so the assignment stays exactly
    replayable by a plain global ``row_number`` oracle.  Only the
    pre-aggregated (id, cost) pairs — never the payload — flow through
    the rank; the assignment hash-joins back on id.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    order = [F.col(cost_col).desc(), F.col(id_col).asc()]
    # explicit partition count → REPARTITION_BY_NUM: AQE must preserve
    # it exactly, so the rank branch and the counts branch (which reuse
    # this one shuffle stage) always observe the SAME partition ids —
    # a COL-origin exchange could be coalesced differently per reader
    if num_partitions:
        nparts = num_partitions
    else:
        # conf may be non-numeric ("auto" on some platforms)
        try:
            nparts = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                         "200")
            )
        except (TypeError, ValueError):
            nparts = 200
    # the rank branch and the counts branch below both consume `parted`
    # and must observe IDENTICAL range boundaries.  ReuseExchange does
    # NOT fire on these plans (the spark_partition_id projection defeats
    # canonicalization — verified: 0 ReusedExchange nodes, run-to-run
    # divergent results at sf0.1), so pin ONE physical partitioning
    # with a lazy materialization (ranks._pin_range_partitions)
    from .ranks import _pin_range_partitions

    parted = _pin_range_partitions(
        df.select(id_col, cost_col)
        .repartitionByRange(nparts, *order)
        .withColumn("__pid", F.spark_partition_id())
    )
    local = parted.withColumn(
        "__lr",
        F.row_number().over(Window.partitionBy("__pid").orderBy(*order)),
    )
    counts = parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    # cumulative offsets over the #partitions-row counts frame: the one
    # un-partitioned window here sorts partition COUNTS, not the corpus
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(woff), F.lit(0)).alias("__off"),
    )
    ranked = local.join(F.broadcast(offsets), "__pid").withColumn(
        "__r", F.col("__off") + F.col("__lr") - 1
    )
    m = F.col("__r") % F.lit(2 * n_shards)
    snake = F.when(m < n_shards, m).otherwise(
        F.lit(2 * n_shards - 1) - m
    )
    assign = ranked.select(
        id_col, snake.cast("int").alias(out_col)
    )
    return df.join(assign, id_col)


def epoch_sort_key(
    df: DataFrame,
    key_col: str,
    epoch: int,
    *,
    out_col: str = "sort_key",
) -> DataFrame:
    """Per-epoch pseudo-random sort key:
    ``portable_hash28(key || ':epoch=' || e)``.  Sorting by it yields an
    independent, reproducible permutation per epoch — the distributed
    replacement for an in-memory epoch shuffle."""
    return df.withColumn(
        out_col,
        portable_hash28(
            F.concat(F.col(key_col).cast("string"), F.lit(f":epoch={epoch}"))
        ),
    )


def interleave_positions(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    epoch: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Assign every row its exact training-order coordinates for one
    epoch: ``(shard, pos)`` with ``pos`` the 1-based rank inside the
    shard by (sort_key, key).  A loader reading shards round-robin at
    equal ``pos`` consumes the corpus in a deterministic interleave.
    The window partitions by shard — per-task state is one shard."""
    out = epoch_sort_key(
        shard_assign(df, key_col, n_shards, salt=salt), key_col, epoch
    )
    w = Window.partitionBy("shard").orderBy("sort_key", key_col)
    return out.withColumn("pos", F.row_number().over(w))


def shard_stats(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    epoch: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Per-shard balance report: row count and the sort-key range for
    the given epoch.  One hash-grouped aggregation (n_shards rows)."""
    out = epoch_sort_key(
        shard_assign(df, key_col, n_shards, salt=salt), key_col, epoch
    )
    return out.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("sort_key").alias("min_key"),
        F.max("sort_key").alias("max_key"),
    )


def write_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    *,
    epoch: int = 0,
    salt: str = "",
    mode: str = "error",
) -> None:
    """Materialize the export: one directory per shard
    (``shard=<i>/``), rows inside each shard sorted by the epoch key.
    ``repartition(n_shards, shard)`` bounds the writer tasks and the
    partitioned write keeps one shard per directory even when two shard
    ids hash to the same task."""
    out = epoch_sort_key(
        shard_assign(df, key_col, n_shards, salt=salt), key_col, epoch
    )
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "sort_key", key_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def zorder_key(
    df: DataFrame,
    cols: "list[str]",
    *,
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Morton (Z-order) interleave key over numeric columns — sort/range-
    partition by it before writing and parquet min/max stats prune for
    range predicates on EVERY keyed column, not just the leading one
    (the lakehouse `OPTIMIZE ZORDER BY` layout technique).

    Each column is scaled into ``[0, 2^bits)`` against its observed
    min/max (ONE bounds aggregation, broadcast back — same two-scan
    shape as winsorize), then bit-interleaved with pure shift/mask
    expressions: ``k * bits`` must fit a long (<= 62).  Nulls scale to
    0 (sort first).  The key is deterministic given the bounds;
    persist/reuse bounds for stable incremental layouts."""
    k = len(cols)
    if k < 2:
        raise ValueError("z-ordering needs at least two columns")
    if not 1 <= bits * k <= 62:
        raise ValueError(f"k*bits must be in [1, 62], got {k}x{bits}")
    bounds = df.agg(
        *[
            e
            for c in cols
            for e in (
                F.min(F.col(c).cast("double")).alias(f"__zmin_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__zmax_{c}"),
            )
        ]
    )
    out = df.crossJoin(F.broadcast(bounds))
    top = float((1 << bits) - 1)
    cells = []
    for c in cols:
        lo, hi = F.col(f"__zmin_{c}"), F.col(f"__zmax_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        scaled = (
            (F.col(c).cast("double") - lo) * F.lit(top) / span
        ).cast("long")
        cells.append(
            F.when(F.col(c).isNull(), F.lit(0).cast("long")).otherwise(
                F.least(F.greatest(scaled, F.lit(0)), F.lit(int(top)))
            )
        )
    zkey = F.lit(0).cast("long")
    for b in range(bits):
        for i, cell in enumerate(cells):
            bit = F.shiftright(cell, b).bitwiseAND(F.lit(1))
            zkey = zkey.bitwiseOR(
                F.shiftleft(bit, b * k + i)
            )
    return out.withColumn(out_col, zkey).drop(
        *[f"__zmin_{c}" for c in cols], *[f"__zmax_{c}" for c in cols]
    )
