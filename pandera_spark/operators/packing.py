"""Sequence packing: assign documents to fixed token-budget packs
(training context windows).

Beyond-reference family (no analogue in the reference; this is the step
between a curated corpus and a trainer's fixed-length batches).  Two
strategies, both deterministic and replayable:

- :func:`greedy_pack` — the standard greedy sequential packer: within a
  bucket, documents are visited in a total order and appended to the
  current pack while they fit; a document that would overflow starts a
  new pack.  An oversized document (tokens > budget) gets a pack of its
  own.  Iterative state -> runs as an Arrow-batched ``applyInPandas``
  per bucket; the loop is O(bucket rows) python, but each group's frame
  is only (id, tokens) — the text never reaches the packer.
- :func:`chunk_pack` — the concat-then-chunk approximation: pack id =
  ``floor(cumulative_tokens_before / budget)``.  Pure window expression
  (no UDF), at the price of packs that can straddle the budget by one
  document — the trade-off most large pipelines accept.

Design for 100 TB:
- Packing is embarrassingly parallel across buckets: the single shuffle
  keys on the bucket column, and each bucket's state machine is
  independent.  Size ``num_buckets`` so a bucket's (id, tokens) pairs
  fit an executor (at 16 bytes/row, a million-doc bucket is ~16 MB).
- Determinism: the bucket expression and in-bucket order are pure
  functions of the data (no RNG, no partition order dependence), so a
  re-run — or an external SQL engine replaying the same walk — produces
  byte-identical pack assignments.
"""

from __future__ import annotations

from pyspark.sql import Column as C, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["greedy_pack", "chunk_pack", "pack_stats"]


def _require_numeric(df: DataFrame, *cols: str) -> None:
    """Ids/token counts must be integral — a string id would cast to
    null (legacy mode) or throw mid-job (ANSI); fail fast instead."""
    for c in cols:
        dt = df.schema[c].dataType
        if not isinstance(
            dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            raise TypeError(
                f"column {c!r} must be an integral type for packing, "
                f"got {dt.simpleString()}; hash non-numeric ids to longs "
                "first (e.g. xxhash64)"
            )


def _no_null(col_name: str) -> C:
    """Executor-side null guard with a clear message (a null id/token
    would otherwise surface as an opaque Arrow-worker crash in
    greedy_pack and silently propagate null packs in chunk_pack)."""
    c = F.col(col_name)
    return F.when(
        c.isNull(),
        F.raise_error(
            F.lit(f"packing requires non-null {col_name!r} values")
        ).cast("long"),
    ).otherwise(c.cast("long"))


_PACK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("tokens", T.LongType(), False),
        T.StructField("pack", T.LongType(), False),
    ]
)


def greedy_pack(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    *,
    bucket: C,
) -> DataFrame:
    """Greedy sequential packing within buckets.

    Returns ``(id, bucket, tokens, pack)`` where ``pack`` is 0-based
    within its bucket.  Documents are visited in ascending ``id_col``
    order inside each bucket; a document joins the current pack iff
    ``fill + tokens <= budget``, else it opens the next pack (so an
    oversized document occupies a pack alone).  ``bucket`` must be a
    deterministic integer Column (e.g. ``F.col(id) % 64`` or a
    ``pmod(xxhash64(...))`` for balance).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    _require_numeric(df, id_col, token_col)
    slim = df.select(
        _no_null(id_col).alias("id"),
        bucket.cast("long").alias("bucket"),
        _no_null(token_col).alias("tokens"),
    )

    def pack_group(pdf):
        pdf = pdf.sort_values("id").reset_index(drop=True)
        packs = []
        cur, fill = 0, 0
        for tok in pdf["tokens"]:
            t = int(tok)
            if fill > 0 and fill + t > budget:
                cur += 1
                fill = 0
            fill += t
            packs.append(cur)
        pdf["pack"] = packs
        return pdf[["id", "bucket", "tokens", "pack"]]

    return slim.groupBy("bucket").applyInPandas(pack_group, _PACK_SCHEMA)


def chunk_pack(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    *,
    bucket: C,
) -> DataFrame:
    """Concat-then-chunk packing: ``pack = floor(cum_tokens_before /
    budget)`` over the ascending-id walk within each bucket.  Pure
    window expression — no UDF, one shuffle on the bucket key — but a
    pack may exceed the budget by (at most) one straddling document."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    _require_numeric(df, id_col, token_col)
    slim = df.select(
        _no_null(id_col).alias("id"),
        bucket.cast("long").alias("bucket"),
        _no_null(token_col).alias("tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum("tokens").over(w) - F.col("tokens")
    return slim.withColumn(
        "pack", F.floor(cum_before / F.lit(int(budget))).cast("long")
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack utilization: ``(bucket, pack, n_docs, pack_tokens,
    utilization)`` — the packing-efficiency dashboard (mean utilization
    is the fraction of context-window tokens actually used)."""
    return packed.groupBy("bucket", "pack").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("pack_tokens"),
        (F.sum("tokens") / F.lit(float(budget))).alias("utilization"),
    )
