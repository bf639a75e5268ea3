"""Mergeable distinct-count sketches: build once at ingest, union forever.

``COUNT(DISTINCT user_id)`` over arbitrary date ranges is the classic
100 TB trap: every query rescans every partition because exact distinct
state is not mergeable across runs.  The industry answer (Druid, BigQuery
HLL_COUNT, Snowflake APPROX_COUNT_DISTINCT accumulate/combine) is to
persist per-segment HyperLogLog sketches and answer later queries by
UNIONING the sketches — kilobytes per group — instead of rescanning the
data.  Spark 4 ships the Apache DataSketches HLL family as native
JVM aggregates (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), so the whole protocol stays codegen'd:

1. **Build** (:func:`distinct_sketches`), at ingest or per batch: one
   map-side-combinable aggregation per fine-grained segment (e.g.
   (day, event_type)) producing a BINARY sketch column; persist next to
   the data with :func:`write_sketches`.
2. **Roll up** (:func:`rollup_estimates`): estimate distincts at ANY
   coarser grouping by unioning the fine sketches — a shuffle of
   sketch bytes only, the raw table is never touched again.  Standard
   relative error is ~1.04/sqrt(2^lgk) (1.6% at the default lgk=12);
   sketches only ever union losslessly, so rollup error equals
   build-time error.
3. **Append** new segments per ingest batch (:func:`merge_sketches`
   with the same grain) — re-validation/reporting over a growing table
   costs one pass over the NEW data only, same contract as
   :mod:`..incremental`.

Reference parity: no pandera analogue (its statistics are exact and
single-frame); this extends the approx tier of
``inference.approx_profile`` (HLL + t-digest one-shot profile) with the
PERSISTED, mergeable form that makes the 100 TB cadence work.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "distinct_sketches",
    "merge_sketches",
    "rollup_estimates",
    "write_sketches",
    "read_sketches",
    "sketch_ledger_foreach_batch",
    "ledger_estimates",
    "cms_counters",
    "cms_merge",
    "cms_estimate",
    "cms_ledger_foreach_batch",
    "read_cms_ledger",
]

_Cols = Union[str, Sequence[str]]


def _cols(c: Optional[_Cols]) -> list[str]:
    if c is None:
        return []
    return [c] if isinstance(c, str) else list(c)


def distinct_sketches(
    df: DataFrame,
    key_col: str,
    by: Optional[_Cols] = None,
    *,
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-group HLL sketches of ``key_col``: ``by...`` + ``sketch_col``
    (binary) + ``n_rows``.

    One aggregation job, fully map-side combinable (DataSketches HLL
    union is associative+commutative); each output row is ~``2^lgk``
    bytes regardless of key cardinality.  NULL keys are ignored by the
    sketch (matching COUNT(DISTINCT) semantics).
    """
    grp = _cols(by)
    agg = [
        F.hll_sketch_agg(key_col, F.lit(int(lgk))).alias(sketch_col),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    return df.groupBy(*grp).agg(*agg) if grp else df.agg(*agg)


def merge_sketches(
    sketches: DataFrame,
    by: Optional[_Cols] = None,
    *,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union fine-grained sketches to a coarser grain (or to one row).

    Lossless w.r.t. the build-time sketches: HLL unions never add
    error.  Input and output schema share ``sketch_col``, so rollup
    hierarchies compose (hour -> day -> month) and an ingest batch's
    new sketches append by unioning at the same grain.
    """
    grp = _cols(by)
    agg = [
        F.hll_union_agg(sketch_col).alias(sketch_col),
        F.sum("n_rows").alias("n_rows"),
    ]
    return (
        sketches.groupBy(*grp).agg(*agg) if grp else sketches.agg(*agg)
    )


def rollup_estimates(
    sketches: DataFrame,
    by: Optional[_Cols] = None,
    *,
    sketch_col: str = "sketch",
    out_col: str = "distinct_est",
) -> DataFrame:
    """Distinct-count estimates at any grouping coarser than the build
    grain — shuffles sketch BYTES only, never the source table."""
    merged = merge_sketches(sketches, by, sketch_col=sketch_col)
    grp = _cols(by)
    return merged.select(
        *grp,
        F.hll_sketch_estimate(sketch_col).alias(out_col),
        "n_rows",
    )


def write_sketches(
    sketches: DataFrame, path: str, *, mode: str = "append"
) -> None:
    """Persist sketches (binary survives parquet round-trips).  Default
    ``append``: each ingest batch adds its segments; readers union at
    query time, so duplicate segments from a retried batch should be
    deduplicated upstream (or write per-batch subdirectories)."""
    sketches.write.mode(mode).parquet(path)


def read_sketches(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def sketch_ledger_foreach_batch(
    key_col: str,
    by: Optional[_Cols],
    state_path: str,
    *,
    lgk: int = 12,
):
    """Streaming counterpart (same protocol as
    ``incremental.quality_ledger_foreach_batch``): each micro-batch
    appends its per-group sketches under ``segment = "batch:<id>"``;
    :func:`ledger_estimates` answers stream-lifetime distinct counts
    with no replay.  At-least-once retries re-append the same segment
    key; the read side collapses to one row per (segment, group) before
    unioning, so duplicates cannot double-count (any one of the
    duplicate sketches summarizes the same batch data).

    Usage::

        q = (stream.writeStream
             .foreachBatch(
                 sketch_ledger_foreach_batch("user_id", ["event_type"],
                                             path))
             .start())
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sk = distinct_sketches(batch_df, key_col, by, lgk=lgk)
        sk.withColumn("segment", F.lit(f"batch:{batch_id}")).write.mode(
            "append"
        ).parquet(state_path)

    return process


def ledger_estimates(
    spark: SparkSession,
    state_path: str,
    by: Optional[_Cols] = None,
) -> DataFrame:
    """Distinct-count estimates over everything the ledger has seen.

    Collapses retried duplicate segments first (``max`` per (segment,
    group) — duplicates sketch identical data), then unions across
    segments; ``n_rows`` counts each batch exactly once."""
    raw = read_sketches(spark, state_path)
    # collapse at the BUILD grain (segment + every group column the
    # ledger was written with), not the rollup grain — collapsing at a
    # coarser grain would max() away sibling groups' sketches
    build_grain = [
        c for c in raw.columns if c not in ("sketch", "n_rows")
    ]
    collapsed = raw.groupBy(*build_grain).agg(
        F.max("sketch").alias("sketch"),
        F.max("n_rows").alias("n_rows"),
    )
    return rollup_estimates(collapsed, by)


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable approximate POINT counts
# ---------------------------------------------------------------------------
# HLL answers "how many distinct"; count-min answers "how many times did
# THIS value occur" from the same kind of tiny mergeable state: a
# depth x width counter grid where every occurrence increments one cell
# per row (depth independent hashes) and a point estimate is the MIN of
# its depth cells.  Estimates only ever OVERcount (collisions add), by
# at most 2N/width with probability 1 - (1/2)^depth (Cormode-Muthukrishnan
# 2005); merging two sketches is cell-wise addition, so per-segment
# grids roll up losslessly like the HLL ledger above.
#
# The hash family is the repo's portable 28-bit md5 prefix
# (operators/dedup.py:portable_hash28) over "j|value", so a SQL engine
# can replay cell assignment — and therefore the whole sketch —
# bit-exactly (same property the MinHash oracle relies on).


def cms_counters(
    df: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 4096,
    weight: Optional[str] = None,
) -> DataFrame:
    """Build a count-min grid over ``df[col]``: rows ``(j, cell, cnt)``
    (only touched cells materialize; absent cell = 0).

    ONE aggregation after a depth-way melt: the melt is a projection
    (no shuffle) and partial aggregation reduces each task to at most
    ``depth x width`` counter rows before the exchange — the shuffle is
    bounded by the grid size, never the data.  ``weight`` sums that
    column instead of counting rows (e.g. pre-aggregated word counts).
    Null values are skipped (they have no cell).
    """
    from .dedup import portable_hash28

    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    v = F.col(col).cast("string")
    w = (
        F.col(weight).cast("long") if weight is not None else F.lit(1)
    )
    rows = [
        F.struct(
            F.lit(j).alias("j"),
            F.pmod(
                portable_hash28(F.concat_ws("|", F.lit(str(j)), v)),
                F.lit(width),
            ).cast("int").alias("cell"),
        )
        for j in range(depth)
    ]
    return (
        df.where(v.isNotNull())
        .select(F.explode(F.array(*rows)).alias("__c"), w.alias("__w"))
        .groupBy(F.col("__c.j").alias("j"), F.col("__c.cell").alias("cell"))
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Merge count-min grids built with the SAME (depth, width):
    cell-wise addition — union + one grid-bounded aggregation."""
    if not grids:
        raise ValueError("need at least one grid")
    out = grids[0]
    for g in grids[1:]:
        out = out.unionByName(g)
    return out.groupBy("j", "cell").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    grid: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int,
    width: int,
) -> DataFrame:
    """Point estimates for every row of ``keys``: ``keys..., est``.

    ``est = min over j of grid[j][cell_j(key)]`` (0 for untouched
    cells).  The keys explode depth-way and LEFT-join the grid —
    ``depth x width`` rows, always broadcast — then fold back with one
    ``min`` per key; the grid's source data is never touched.
    Guaranteed ``est >= true count`` for grids built over the data the
    keys are probed against.
    """
    from .dedup import portable_hash28

    v = F.col(key_col).cast("string")
    rows = [
        F.struct(
            F.lit(j).alias("j"),
            F.pmod(
                portable_hash28(F.concat_ws("|", F.lit(str(j)), v)),
                F.lit(width),
            ).cast("int").alias("cell"),
        )
        for j in range(depth)
    ]
    exploded = keys.select(
        "*", F.explode(F.array(*rows)).alias("__c")
    ).select("*", "__c.j", "__c.cell").drop("__c")
    joined = exploded.join(F.broadcast(grid), ["j", "cell"], "left")
    return (
        joined.groupBy(*[F.col(c) for c in keys.columns])
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long").alias("est")
        )
    )


def cms_ledger_foreach_batch(
    col: str,
    state_path: str,
    *,
    depth: int = 4,
    width: int = 4096,
    weight: Optional[str] = None,
):
    """Streaming count-min ledger: each micro-batch appends its grid
    under its batch id.  Cell addition is NOT idempotent, so the replay
    protection lives in the read fold (:func:`read_cms_ledger`): grids
    collapse to one row per (batch, cell) before summing — an
    at-least-once replay re-appends byte-identical counter rows, which
    the collapse discards (same protocol as the HLL ledger and
    ``incremental.quality_ledger_foreach_batch``)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        grid = cms_counters(
            batch_df, col, depth=depth, width=width, weight=weight
        )
        grid.withColumn("segment", F.lit(f"batch:{batch_id}")).write.mode(
            "append"
        ).parquet(state_path)

    return process


def read_cms_ledger(spark: SparkSession, state_path: str) -> DataFrame:
    """Stream-lifetime count-min grid from the append-only ledger:
    dedup replayed segments (max of byte-identical duplicates per
    (segment, j, cell)), then cell-wise sum across segments."""
    state = spark.read.parquet(state_path)
    per_seg = state.groupBy("segment", "j", "cell").agg(
        F.max("cnt").alias("cnt")
    )
    return per_seg.groupBy("j", "cell").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
