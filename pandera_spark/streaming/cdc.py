"""Streaming CDC: maintain latest-per-key state from a changelog stream.

The batch module (``operators/cdc.py``) reconstructs state from a
complete log; on a stream you cannot re-read the log per trigger.  The
``foreachBatch`` writer here keeps an APPEND-ONLY parquet state that
any reader folds into the current table:

- **per batch**: reduce the micro-batch to its per-key winners (the
  same one-aggregation ``max_by`` shape — a micro-batch is small, this
  is cheap) and APPEND them; never read-modify-write, so concurrent
  readers see either the old rows or old+new, both of which fold to a
  correct (possibly slightly stale) table.
- **read** (:func:`read_cdc_state`): latest-winner fold over the
  appended rows, then delete-op filtering — exactly
  ``operators.cdc.apply_cdc`` semantics with tombstones retained so a
  delete in batch 7 still masks an upsert from batch 3.
- **retries**: at-least-once replays append byte-identical winner rows
  under the same (key, order) — the fold picks the same winner, so
  retries are no-ops on the folded result (the idempotence protocol
  shared with ``incremental.quality_ledger_foreach_batch``).
- **compaction** (:func:`compact_cdc_state`): folds history down to
  one row per live key with the capture-append-delete protocol of
  ``streaming/novelty.py`` — rows appended mid-compaction survive.
  Tombstones drop at compaction (safe once no older duplicate of the
  key can reappear, i.e. the log's order column is monotone per key —
  the CDC-version contract).

State growth between compactions is one winner row per key per batch —
bounded by update rate, not stream volume.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..operators.cdc import _latest_rows

__all__ = [
    "cdc_upsert_foreach_batch",
    "read_cdc_state",
    "compact_cdc_state",
]


def _order_cols(
    order_by: "str | Sequence[str]", tiebreak: Optional[Sequence[str]]
) -> "list[str]":
    cols = [order_by] if isinstance(order_by, str) else list(order_by)
    return cols + list(tiebreak or [])


def cdc_upsert_foreach_batch(
    state_path: str,
    keys: Sequence[str],
    order_by: "str | Sequence[str]",
    *,
    tiebreak: Optional[Sequence[str]] = None,
    op_col: Optional[str] = None,
):
    """``foreachBatch`` writer: append each micro-batch's per-key
    winners to the state.  ``op_col`` (if the feed carries one) rides
    along so deletes become tombstones; without it every row is an
    upsert.  Passing ``op_col`` asserts the feed's contract: each
    micro-batch must actually carry that column (fail the batch at the
    writer, not silently at read time when tombstones never filter).

    Usage::

        q = (changes.writeStream
             .foreachBatch(cdc_upsert_foreach_batch(
                 path, ["k"], "version"))
             .start())
    """
    key_list, ords = list(keys), _order_cols(order_by, tiebreak)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if op_col is not None and op_col not in batch_df.columns:
            raise ValueError(
                f"micro-batch {batch_id} is missing op column "
                f"{op_col!r}; columns: {batch_df.columns}"
            )
        winners = _latest_rows(batch_df, key_list, ords)
        winners.write.mode("append").parquet(state_path)

    return process


def read_cdc_state(
    spark,
    state_path: str,
    keys: Sequence[str],
    order_by: "str | Sequence[str]",
    *,
    tiebreak: Optional[Sequence[str]] = None,
    op_col: Optional[str] = None,
    delete_op: str = "D",
) -> Optional[DataFrame]:
    """Current table from the append-only state: latest winner per key,
    delete tombstones filtered (and dropped from the schema).  Returns
    None when no state exists yet."""
    try:
        state = spark.read.parquet(state_path)
    except AnalysisException:
        return None
    folded = _latest_rows(
        state, list(keys), _order_cols(order_by, tiebreak)
    )
    if op_col and op_col in folded.columns:
        folded = folded.where(
            F.coalesce(F.col(op_col) != F.lit(delete_op), F.lit(True))
        ).drop(op_col)
    return folded


def compact_cdc_state(
    spark,
    state_path: str,
    keys: Sequence[str],
    order_by: "str | Sequence[str]",
    *,
    tiebreak: Optional[Sequence[str]] = None,
    op_col: Optional[str] = None,
    delete_op: str = "D",
) -> int:
    """Fold the state down to one row per LIVE key (tombstones and
    superseded versions drop).  Capture-append-delete: rows appended
    between capture and delete survive untouched.  Returns the live
    row count."""
    try:
        seg = spark.read.parquet(state_path)
    except AnalysisException:
        return 0
    files = seg.inputFiles()
    if not files:
        return 0
    captured = spark.read.parquet(*files)
    folded = _latest_rows(
        captured, list(keys), _order_cols(order_by, tiebreak)
    )
    if op_col and op_col in folded.columns:
        # null-safe, matching read_cdc_state: a null op means upsert
        # (live row) — `!= delete_op` alone is NULL there and would
        # silently compact live rows away
        folded = folded.where(
            F.coalesce(F.col(op_col) != F.lit(delete_op), F.lit(True))
        )
    folded.write.mode("append").parquet(state_path)
    n = folded.count()
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for f in files:
        path = jvm.org.apache.hadoop.fs.Path(f)
        fs = path.getFileSystem(hconf)
        fs.delete(path, False)
    return n
