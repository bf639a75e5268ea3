"""Heavy hitters over ultra-high-cardinality keys: Misra-Gries + exact pass.

``groupBy(key).count()`` is the right plan when the key cardinality is
bounded (partial aggregation collapses the map side).  For the keys a
training-data pipeline actually screens — tokens, URLs, source domains,
user ids — cardinality grows with the data, the map-side hash fills,
and the shuffle carries one record per distinct key per task.  The
classic fix is frequency summarization:

1. **Summarize** (:func:`misra_gries_candidates`): each partition
   streams its rows through a weighted Misra-Gries summary with at most
   ``counters`` entries (Misra & Gries 1982; weighted form Berinde et
   al., PODS'09).  Per partition, a surviving entry's stored count
   ``mg_count`` satisfies ``f_p(x) - W_p/counters <= mg_count <=
   f_p(x)`` where ``W_p`` is the partition's row count — so every key
   with partition share > 1/``counters`` survives.  Output is at most
   ``counters`` rows per partition, regardless of cardinality.
2. **Exact second pass** (:func:`heavy_hitters`): the union of partition
   summaries is a candidate superset of every global heavy hitter (if
   ``f(x) > n/counters`` globally then by pigeonhole ``f_p(x) >
   W_p/counters`` in some partition).  Candidates are tiny, so they
   broadcast; an inner hash join filters the table to candidate rows
   only and an exact groupBy over that filtered stream yields exact
   counts — deterministic output, no approximation in the result, the
   sketch only bounded the memory.

At 100 TB: phase 1 is a single map-only pass (mapInPandas, Arrow
batches, ``value_counts`` per batch so the Python loop runs per
DISTINCT key per batch, not per row) emitting ~``counters`` rows per
partition; phase 2 shuffles only rows whose key is in the broadcast
candidate set.  Nothing ever materializes the full key->count map.

Reference parity: no pandera analogue (closest is
``unique_values_eq``/value_counts-based checks, which assume bounded
cardinality); beyond-reference tier alongside operators/skew.py (which
screens for skewed keys — this module is how you FIND them when the
key space is too large to count exactly).
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["misra_gries_candidates", "heavy_hitters",
    "coverage_curve",
]


def _mg_insert(counts: dict, key, w: int, k: int) -> None:
    """Weighted Misra-Gries insert: add ``w`` occurrences of ``key``
    into a summary bounded at ``k`` entries.  Amortized cost: the
    subtract-all compaction removes at least one entry per trigger and
    total decrement across the stream is <= W/k."""
    if key in counts:
        counts[key] += w
        return
    if len(counts) < k:
        counts[key] = w
        return
    m = min(counts.values())
    d = m if m < w else w
    for y in list(counts):
        c = counts[y] - d
        if c > 0:
            counts[y] = c
        else:
            del counts[y]
    if w > d:
        counts[key] = w - d


def misra_gries_candidates(
    df: DataFrame,
    key_col: str,
    counters: int = 1024,
) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most ``counters`` rows
    per partition of ``(key, mg_count)``.

    ``mg_count`` is a LOWER bound on the key's partition frequency and
    undercounts by at most ``W_p/counters``; every key whose partition
    share exceeds ``1/counters`` is present.  NULL keys are ignored
    (they are a nullability check's business, not a frequency screen's).
    """
    key_field = df.schema[key_col]
    out_schema = (
        f"`{key_col}` {key_field.dataType.simpleString()}, mg_count long"
    )
    k = int(counters)
    if k < 1:
        raise ValueError("counters must be >= 1")

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            # vectorized pre-count: the MG loop runs once per distinct
            # key in the batch, not once per row.
            vc = pdf[key_col].dropna().value_counts()
            for key, w in vc.items():
                _mg_insert(counts, key, int(w), k)
        yield pd.DataFrame(
            {key_col: list(counts.keys()),
             "mg_count": list(counts.values())}
        )

    return df.select(key_col).mapInPandas(summarize, schema=out_schema)


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi: float,
    *,
    counters: Optional[int] = None,
    total: Optional[int] = None,
) -> DataFrame:
    """Exact frequencies of every key with global share > ``phi``.

    Two-phase: Misra-Gries candidate superset (bounded memory, map-only)
    then an exact count restricted to candidate rows via a broadcast
    semi-filter.  The result is EXACT and deterministic — columns
    ``(key, freq, share)`` — because the sketch only proposes
    candidates; no true heavy hitter can be missed as long as
    ``counters >= 1/phi`` (enforced; default ``ceil(2/phi)`` for slack
    so near-threshold keys skip the partition-boundary coin flips).

    ``total`` (row count with non-null key) is computed with one
    column-pruned count when not supplied; pass it when the caller
    already knows it (e.g. from an ingest manifest) to skip that job.
    """
    if not (0.0 < phi < 1.0):
        raise ValueError("phi must be in (0, 1)")
    k = int(counters) if counters is not None else max(2, int(2.0 / phi) + 1)
    if k < 1.0 / phi:
        raise ValueError(
            f"counters={k} cannot guarantee share > {phi}: need >= {1.0 / phi:.0f}"
        )
    keyed = df.select(key_col).filter(F.col(key_col).isNotNull())
    if total is None:
        # in-plan broadcast 1-row total instead of a driver count
        # action: the keyed lineage (often an upstream explode) already
        # executes for the sketch and the exact pass — this keeps the
        # denominator from adding a third full execution
        totf = keyed.agg(
            F.count(F.lit(1)).cast("double").alias("__tot")
        )
        tot_col = F.col("__tot")
    else:
        totf = None
        tot_col = F.lit(float(total))
    cand = (
        misra_gries_candidates(keyed, key_col, counters=k)
        .select(key_col).distinct()
    )
    counts = (
        keyed.join(F.broadcast(cand), on=key_col, how="inner")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if totf is not None:
        counts = counts.crossJoin(F.broadcast(totf))
    return (
        counts.filter(F.col("freq") > F.lit(float(phi)) * tot_col)
        .withColumn("share", F.round(F.col("freq") / tot_col, 6))
        .drop("__tot")
        .orderBy(F.desc("freq"), key_col)
    )


def coverage_curve(
    df: DataFrame,
    col: str,
    *,
    k: int = 20,
) -> DataFrame:
    """Head-coverage curve of a categorical column: the top-k
    categories by count with their cumulative row share — "the top 20
    sources cover 93% of the corpus" (and, by complement, how heavy
    the long tail is).

    One row per rank ``1..k``: ``(rank, value, cnt, share,
    cum_share)``.  Plan shape: one category-grain aggregate, then
    ``row_number() <= k`` over (count DESC, value) — Spark plans the
    limit as TakeOrderedAndProject (per-task top-k merged on the
    driver, never a global sort); the cumulative share runs over the
    k survivors plus one broadcast 1-row total.  Null categories are
    excluded (profile them with ``monitoring.completeness``).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("double").alias("__total"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("value").asc())
    top = (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    wcum = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.col("rank").cast("int").alias("rank"),
            "value",
            F.col("cnt").cast("long").alias("cnt"),
            (F.col("cnt") / F.col("__total")).alias("share"),
            (F.sum("cnt").over(wcum) / F.col("__total"))
            .alias("cum_share"),
        )
    )
