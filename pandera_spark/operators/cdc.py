"""Change-data-capture reconstruction: latest-state, upsert-merge, CDC apply.

Event logs and CDC feeds arrive append-only; the table a consumer wants
is "one row per key, the latest version".  The textbook plan is a
``row_number() OVER (PARTITION BY key ORDER BY version DESC) = 1``
window — but a window FIRST shuffles every historical row to its key's
reducer and sorts the full history there.  On a 100 TB changelog where
keys average hundreds of versions, that is a full-data shuffle + sort
to keep <1% of rows.

This module instead reconstructs state with ONE aggregation:
``max_by(struct(<all columns>), struct(<order columns>))`` per key.
Spark's partial aggregation keeps a single candidate row per key per
map task, so the shuffle carries at most ``distinct_keys × tasks`` rows
(the winners), never the history.  Because the row-valued aggregate
buffer is immutable, Spark plans this as SortAggregate — a LOCAL
per-task sort by key (spillable merge sort, no hash map to blow up),
which is categorically cheaper than the window's shuffle-everything
*then* sort-everything-per-reducer.  The same shape
merges an incremental batch into a base snapshot (:func:`merge_upsert`)
and applies insert/update/delete ops (:func:`apply_cdc`).

Determinism: callers must make the ordering struct a TOTAL order per
key (pass ``tiebreak`` — e.g. an event id — when the version column can
tie); struct comparison is lexicographic field-by-field, which both
Spark and the SQL oracle's ``ORDER BY a DESC, b DESC`` replay exactly.
Ordering columns must be non-null (a null version cannot be ranked);
rows with a null ordering field are rejected up front rather than
silently placed.

Reference parity: no pandera analogue (pandera validates frames it is
given; reconstructing the frame from a changelog is upstream of it).
Beyond-reference tier next to operators/temporal.py — ``latest_state``
is the batch dual of streaming's stateful "last seen per key".
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["latest_state", "merge_upsert", "apply_cdc"]


def _latest_rows(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """One row per key: the max_by(struct(all), struct(order)) winner.

    Keys ride inside the payload struct, so ``__row.*`` restores the
    full schema.  One aggregation with map-side partial combine — one
    candidate per key per task crosses the wire; no window function.
    """
    missing = [c for c in [*keys, *order_by] if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    payload = F.struct(*[F.col(c) for c in df.columns])
    ordk = F.struct(*[F.col(c) for c in order_by])
    guarded = df.where(
        F.greatest(*[F.col(c).isNull() for c in order_by]) == F.lit(False)
        if len(order_by) > 1
        else F.col(order_by[0]).isNotNull()
    )
    out = guarded.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(payload, ordk).alias("__row")
    )
    return out.select("__row.*")


def latest_state(
    df: DataFrame,
    keys: Sequence[str],
    order_by: "str | Sequence[str]",
    *,
    tiebreak: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Latest full row per key from an append-only log.

    ``order_by`` (plus ``tiebreak``) must totally order each key's rows
    or the winner is nondeterministic between runs.  Rows whose ordering
    columns are null are dropped (unrankable).  Output schema == input
    schema, one row per distinct key that has at least one rankable row.
    """
    order_cols = (
        [order_by] if isinstance(order_by, str) else list(order_by)
    ) + list(tiebreak or [])
    if not order_cols:
        raise ValueError("need at least one ordering column")
    return _latest_rows(df, list(keys), order_cols)


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_by: "str | Sequence[str]",
    *,
    tiebreak: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Merge an incremental batch into a snapshot: per key the winner of
    base ∪ changes under the same total order (SCD type 1 / lakehouse
    ``MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT``, minus the
    file rewrite).  Schemas must match by name; columns are aligned.

    Plan: union (zero-shuffle narrow op) then the single latest-state
    aggregate — cheaper than the join-based MERGE when the change batch
    is not tiny, and identical in result.  Changed rows must carry an
    order value >= the base row's to win, which CDC version columns do
    by construction; on an EXACT tie of the full ordering struct the
    change wins (source precedence via a trailing ``__src`` tiebreaker,
    the same rule as :func:`apply_cdc` — a change that reuses the
    base's version is an update, not a no-op).
    """
    if set(base.columns) != set(changes.columns):
        raise ValueError(
            "base/changes schemas differ: "
            f"{sorted(set(base.columns) ^ set(changes.columns))}"
        )
    data_cols = base.columns
    tagged_base = base.select(
        *[F.col(c) for c in data_cols], F.lit(0).alias("__src")
    )
    tagged_changes = changes.select(
        *[F.col(c) for c in data_cols], F.lit(1).alias("__src")
    )
    order_cols = (
        [order_by] if isinstance(order_by, str) else list(order_by)
    ) + list(tiebreak or [])
    if not order_cols:
        raise ValueError("need at least one ordering column")
    merged = _latest_rows(
        tagged_base.unionByName(tagged_changes),
        list(keys),
        order_cols + ["__src"],
    )
    return merged.drop("__src")


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_by: "str | Sequence[str]",
    *,
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Apply an insert/update/delete changelog to a snapshot.

    ``changes[op_col]`` marks each change row; the LATEST change per
    key decides: ``delete_op`` removes the key, anything else upserts
    the row.  Base rows behave as pre-existing upserts older than every
    change (implemented by unioning them with a non-delete op and
    letting the total order decide — no separate anti-join pass).
    Output drops ``op_col``.

    One union + one aggregate + one filter: the changelog never joins
    against the snapshot, so there is no skew-prone key join and the
    shuffle carries one candidate row per key per task.
    """
    if op_col not in changes.columns:
        raise ValueError(f"changes is missing op column {op_col!r}")
    data_cols = [c for c in changes.columns if c != op_col]
    if set(base.columns) != set(data_cols):
        raise ValueError(
            "base columns must equal changes minus op column; diff: "
            f"{sorted(set(base.columns) ^ set(data_cols))}"
        )
    tagged_base = base.select(
        *[F.col(c) for c in data_cols],
        F.lit("U").alias(op_col),
        F.lit(0).alias("__src"),
    )
    tagged_changes = changes.select(
        *[F.col(c) for c in data_cols],
        F.col(op_col),
        F.lit(1).alias("__src"),
    )
    order_cols = (
        [order_by] if isinstance(order_by, str) else list(order_by)
    ) + list(tiebreak or []) + ["__src"]
    merged = _latest_rows(
        tagged_base.unionByName(tagged_changes), list(keys), order_cols
    )
    return merged.where(F.col(op_col) != F.lit(delete_op)).drop(
        op_col, "__src"
    )
