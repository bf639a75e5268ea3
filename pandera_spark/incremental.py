"""Incremental re-validation: validate only the NEW files of a growing
table and merge persisted per-file violation counters.

The 100 TB operational reality: a table gains a few hundred files a day,
and re-running ``schema.validate`` over the whole table re-scans
everything that was already certified.  This module keeps a tiny state
table of per-(file, check) violation counters; each run

1. lists the data files (metadata only — no scan),
2. anti-joins against the state's seen files,
3. runs the validator's ONE-PASS grouped aggregation (the exact
   compiled predicates of ``schema.validate`` via
   ``backend.runner.groupwise_report`` keyed by ``input_file_name()``)
   over ONLY the new files,
4. appends the new counters to the state (append-only — retries of a
   failed append are reconciled by last-write-wins dedup on read),

so the whole-table report is always a cheap aggregation of the state
frame (O(files × checks) rows), and the scan cost of a re-validation is
proportional to the NEW data only.

Aggregate-shaped checks (joint uniqueness, hypotheses, monotonicity)
are whole-table properties that cannot be decomposed per file; they are
intentionally out of scope here (run them in the full ``validate`` on
the cadence the table needs), same scoping as ``groupwise_report``.

The reference has no counterpart (its backends validate one in-memory
frame per call); this is part of the beyond-parity scale tier.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "list_data_files",
    "validate_new_files",
    "incremental_report",
    "seen_files",
    "quality_ledger_foreach_batch",
]


def list_data_files(
    spark: SparkSession, data_path: str, *, format: str = "parquet"
) -> list[str]:
    """The table's current file list, from catalog/footer metadata only
    (``inputFiles`` plans the scan but runs no job over row data)."""
    reader = spark.read.format(format)
    return sorted(set(reader.load(data_path).inputFiles()))


def seen_files(spark: SparkSession, state_path: str) -> set[str]:
    """Files already certified into the state table (empty if no state
    has been written yet)."""
    try:
        return {
            r.file for r in
            spark.read.parquet(state_path).select("file").distinct()
            .collect()
        }
    except Exception:
        return set()


def validate_new_files(
    schema,
    spark: SparkSession,
    data_path: str,
    state_path: str,
    *,
    format: str = "parquet",
    run_id: Optional[str] = None,
) -> dict:
    """Validate the table's not-yet-certified files and append their
    per-(file, check) counters to the state.  Returns a summary dict:
    ``{"n_files": total, "n_new": validated_now, "n_seen": skipped}``.

    Scan cost is proportional to the new files only; the rest of the
    table is never touched.  ``run_id`` tags the appended rows (defaults
    to a content-free monotonic marker via the state row itself).
    """
    from .backend.runner import groupwise_report

    files = list_data_files(spark, data_path, format=format)
    seen = seen_files(spark, state_path)
    new = [f for f in files if f not in seen]
    if new:
        # load() takes ONE positional path-or-list: unpacking would bind
        # the second file to the `format` parameter
        df = spark.read.format(format).load(new)
        counters = groupwise_report(
            schema,
            df.withColumn("__file", F.input_file_name()),
            ["__file"],
        ).select(
            F.col("__file").alias("file"),
            "col_name",
            "check",
            F.col("violations").cast("long").alias("violations"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.lit(run_id).alias("run_id"),
        )
        counters.write.mode("append").parquet(state_path)
    return {
        "n_files": len(files),
        "n_new": len(new),
        "n_seen": len(files) - len(new),
    }


def incremental_report(spark: SparkSession, state_path: str) -> DataFrame:
    """Whole-table violation report from the state alone — NO data
    scan: ``(col_name, check, violations, n_rows)`` summed over files.
    Duplicate (file, check) rows from retried appends are collapsed to
    their max (counters are deterministic per file, so any duplicate is
    an exact replay)."""
    state = spark.read.parquet(state_path)
    per_file = state.groupBy("file", "col_name", "check").agg(
        F.max("violations").alias("violations"),
        F.max("n_rows").alias("n_rows"),
    )
    return (
        per_file.groupBy("col_name", "check")
        .agg(
            F.sum("violations").cast("long").alias("violations"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
    )


def quality_ledger_foreach_batch(schema, state_path: str):
    """Streaming counterpart: a ``foreachBatch`` function appending each
    micro-batch's per-check violation counters to the SAME state shape
    (``file = "batch:<id>"``), so :func:`incremental_report` answers
    stream-lifetime quality with no replay.  Retried micro-batches
    (at-least-once delivery) append identical counters under the same
    key and collapse on read — the same idempotence protocol as the
    batch path.

    Usage::

        q = (stream.writeStream
             .foreachBatch(quality_ledger_foreach_batch(schema, path))
             .start())
    """
    from .backend.runner import groupwise_report

    def process(batch_df: DataFrame, batch_id: int) -> None:
        counters = groupwise_report(
            schema,
            batch_df.withColumn("__file", F.lit(f"batch:{batch_id}")),
            ["__file"],
        ).select(
            F.col("__file").alias("file"),
            "col_name",
            "check",
            F.col("violations").cast("long").alias("violations"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.lit(None).cast("string").alias("run_id"),
        )
        counters.write.mode("append").parquet(state_path)

    return process
