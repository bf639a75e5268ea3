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
    "validate_sample_files",
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


def validate_sample_files(
    schema,
    spark: SparkSession,
    data_path: str,
    *,
    file_fraction: float = 0.1,
    format: str = "parquet",
    z: float = 1.959964,
) -> DataFrame:
    """File-level statistical screen: validate a DETERMINISTIC md5-hash
    sample of the table's FILES — scan cost is truly proportional to
    ``file_fraction`` (row-hash sampling still reads every row of the
    files it filters; this tier never opens the unsampled files at
    all).  Same output shape as
    :func:`..inference.validate_sample` (Wilson intervals over the
    sampled rows).

    Caveat stated plainly: files are clusters, not random rows — the
    interval is exact for the sampled rows but extrapolates to the
    table only as far as files are exchangeable (e.g. hash-bucketed or
    round-robin written).  For time-partitioned tables where new files
    differ systematically, screen the NEW files instead
    (:func:`validate_new_files`).
    """
    import hashlib

    from .backend.runner import groupwise_report
    from .inference import wilson_intervals

    if not 0.0 < file_fraction <= 1.0:
        raise ValueError(
            f"need 0 < file_fraction <= 1, got {file_fraction}"
        )
    files = list_data_files(spark, data_path, format=format)
    threshold = int(file_fraction * (1 << 28))
    # the same 28-bit md5-prefix membership rule as the row-level path
    # (operators.dedup.portable_hash28), computed driver-side over the
    # file NAMES — O(files), no job
    sampled = [
        f for f in files
        if int(hashlib.md5(f.encode()).hexdigest()[:7], 16) < threshold
    ] or files[:1]  # degenerate tiny tables: keep at least one file
    df = spark.read.format(format).load(sampled)
    rep = groupwise_report(
        schema, df.withColumn("__g", F.lit(1)), ["__g"]
    )
    return wilson_intervals(rep, z=z)
