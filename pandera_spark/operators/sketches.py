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
