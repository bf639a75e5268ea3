"""File-level min/max statistics index and metadata-only file pruning.

The data-skipping layer every table format (Iceberg manifests, Delta
``stats`` JSON, Hive partition columns) provides — rebuilt here as plain
DataFrame ops so a validation/curation pipeline over raw parquet
directories gets the same "read 3 of 3,000 files" behavior without a
table format:

- :func:`file_stats` builds the index: ONE scan of the dataset,
  aggregated by ``input_file_name()``, producing per-file
  ``row_count`` / ``min_<c>`` / ``max_<c>`` / ``nulls_<c>``.  The index
  has (files x stat-columns) cells — at 100 TB with 128 MB files that is
  ~800k rows, kilobytes per column: trivially broadcastable and cheap to
  persist next to the data (see :func:`write_stats` /
  :func:`read_stats`).
- :func:`prune_files` evaluates a conjunction of range predicates
  against the index ONLY (no data scan): a file survives iff every
  predicate interval overlaps the file's [min, max] span.  All-null
  files (min/max NULL) are dropped — a range predicate can never select
  a NULL.
- :func:`pruned_read` turns the surviving file list into a scan of just
  those files plus the residual row-level filter.  The driver-side list
  is file PATHS (one string per file), never data.

Design for 100 TB: the index build is a single map-side-combinable
aggregation (min/max/count are mergeable), so it costs one pass at
write/ingest time; every later validation or curation query that
carries a range predicate on an indexed column pays only the pruned
subset.  This composes with :mod:`..incremental` (which keys persisted
validation state by the same file identity): `file_stats` over ONLY the
new files appends to the index without rescanning history.

Reference parity: pandera has no storage layer (its backends validate
in-memory frames); this is part of the beyond-reference scale tier,
same family as bucketing (operators/bucketing.py) and z-ordering
(operators/sharding.py:zorder_key) — zorder clusters values so these
min/max spans become narrow, which is exactly what makes this pruning
effective.
"""

from __future__ import annotations

import posixpath
from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "file_stats",
    "prune_files",
    "pruned_read",
    "pruning_report",
    "write_stats",
    "read_stats",
    "append_file_stats",
    "compaction_plan",
]


def file_stats(
    df: DataFrame,
    cols: Sequence[str],
    *,
    basename: bool = True,
    file_col: str = "file",
) -> DataFrame:
    """Per-file statistics index: one row per underlying data file.

    ``df`` must be a file-backed scan (parquet/csv/json read) so that
    ``input_file_name()`` is populated; building the index on top of the
    SAME scan the pipeline already performs makes it free at ingest.

    Output columns: ``file`` (basename by default, full URI with
    ``basename=False``), ``row_count``, and per requested column ``c``:
    ``min_<c>``, ``max_<c>``, ``nulls_<c>``.  min/max are NULL iff the
    file has no non-null value for ``c``.
    """
    fname = F.input_file_name()
    if basename:
        # strip the scheme+directory; parquet file names are unique per
        # dataset directory, and basenames keep the index portable when
        # the dataset moves (s3a:// vs file:// prefixes).
        fname = F.element_at(F.split(fname, "/"), -1)
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nulls_{c}")
        )
    return df.groupBy(fname.alias(file_col)).agg(*aggs)


def prune_files(
    stats: DataFrame,
    predicates: Dict[str, Tuple[Optional[float], Optional[float]]],
    *,
    file_col: str = "file",
) -> DataFrame:
    """Files that MAY contain rows matching every range predicate.

    ``predicates`` maps column name -> (lo, hi); either bound may be
    None for a half-open interval.  Bounds are inclusive (matching
    ``Check.in_range`` / BETWEEN semantics).  A file is kept iff, for
    every predicate, its [min, max] span intersects [lo, hi]; files
    whose span is entirely outside any predicate — or all-NULL in a
    predicate column — are provably empty for the conjunction and are
    skipped without being read.

    Runs entirely on the (tiny) index frame: no data scan.
    """
    keep = F.lit(True)
    for c, (lo, hi) in predicates.items():
        mn, mx = F.col(f"min_{c}"), F.col(f"max_{c}")
        cond = mn.isNotNull()  # all-null file: no row can match a range
        if lo is not None:
            cond = cond & (mx >= F.lit(lo))
        if hi is not None:
            cond = cond & (mn <= F.lit(hi))
        keep = keep & cond
    return stats.filter(keep)


def _residual_filter(
    df: DataFrame,
    predicates: Dict[str, Tuple[Optional[float], Optional[float]]],
) -> DataFrame:
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            df = df.filter(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(c) <= F.lit(hi))
    return df


def pruned_read(
    spark: SparkSession,
    path: str,
    stats: DataFrame,
    predicates: Dict[str, Tuple[Optional[float], Optional[float]]],
    *,
    file_col: str = "file",
    fmt: str = "parquet",
) -> DataFrame:
    """Read only the files :func:`prune_files` keeps, then apply the
    residual row filter.

    The file list is collected driver-side — it is metadata (one short
    string per surviving file), the same thing Spark's own
    ``InMemoryFileIndex`` materializes for every scan; the parquet
    reader still applies footer-level row-group skipping and predicate
    pushdown within each file.  If nothing survives, returns an empty
    frame with the dataset's schema (one schema-only read).
    """
    kept = [r[file_col] for r in prune_files(stats, predicates,
                                             file_col=file_col)
            .select(file_col).collect()]
    reader = spark.read.format(fmt)
    if not kept:
        return _residual_filter(
            reader.load(path).limit(0), predicates)
    paths = [posixpath.join(path, f) if "/" not in f else f for f in kept]
    return _residual_filter(reader.load(paths), predicates)


def pruning_report(
    stats: DataFrame,
    predicates: Dict[str, Tuple[Optional[float], Optional[float]]],
    *,
    file_col: str = "file",
) -> DataFrame:
    """One-row skip-rate summary: files/rows total vs. candidate.

    ``candidate_rows`` counts rows in files that must be READ — an upper
    bound on matching rows (the residual filter trims inside files); the
    skip ratio is the I/O the index saves, the number to monitor when
    deciding whether a column deserves z-ordering.
    """
    pruned = prune_files(stats, predicates, file_col=file_col)
    total = stats.agg(
        F.count(F.lit(1)).alias("files_total"),
        F.sum("row_count").alias("rows_total"),
    )
    kept = pruned.agg(
        F.count(F.lit(1)).alias("files_candidate"),
        F.coalesce(F.sum("row_count"), F.lit(0)).alias("rows_candidate"),
    )
    return total.crossJoin(kept).select(
        "files_total", "files_candidate", "rows_total", "rows_candidate",
        F.round(
            F.lit(1.0) - F.try_divide("rows_candidate", "rows_total"), 6
        ).alias("row_skip_ratio"),
    )


def write_stats(stats: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Persist the index next to the data (tiny: coalesced to 1 file)."""
    stats.coalesce(1).write.mode(mode).parquet(path)


def read_stats(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def append_file_stats(
    spark: SparkSession,
    data_path: str,
    stats_path: str,
    cols: Sequence[str],
    *,
    fmt: str = "parquet",
) -> DataFrame:
    """Incrementally extend the index: scan ONLY files not yet indexed.

    Same new-files-only contract as ``incremental.validate_new_files``
    (file identity = basename, matching :func:`file_stats`).  Each call
    scans just the ingest delta and appends its rows; the returned
    frame is the full up-to-date index.  Re-running after a partial
    append re-lists and skips already-indexed files, so retries never
    double-scan; a retry that died mid-write may leave a duplicate
    file row — harmless for pruning (duplicate spans prune
    identically), dedupe with ``dropDuplicates(["file"])`` if exact
    ``pruning_report`` row counts matter.
    """
    from ..incremental import list_data_files

    current = list_data_files(spark, data_path, format=fmt)
    try:
        seen = {
            r.file
            for r in read_stats(spark, stats_path)
            .select(F.col("file")).distinct().collect()
        }
    except Exception:
        seen = set()
    new = [p for p in current if posixpath.basename(p) not in seen]
    if new:
        delta = file_stats(spark.read.format(fmt).load(new), cols)
        delta.write.mode("append").parquet(stats_path)
    return read_stats(spark, stats_path)


def compaction_plan(
    stats: DataFrame,
    *,
    target_rows: int,
    small_frac: float = 0.75,
    file_col: str = "file",
    rows_col: str = "row_count",
) -> DataFrame:
    """Plan small-file compaction (Delta/Iceberg ``OPTIMIZE``-style bin
    packing) from the stats index — METADATA ONLY, no data scan.

    Files with ``row_count >= small_frac * target_rows`` are already
    healthy: they pass through with ``group_id`` null.  Small files are
    packed in FILE-NAME ORDER (preserving any clustering/z-order
    locality the writer established — the reason OPTIMIZE does not
    re-sort) by sequential fill: each file joins the group at
    ``floor(rows_before_it / target_rows)``, so every group holds
    ~``target_rows`` rows (a group may overshoot by at most one file —
    the standard no-split compromise).

    The plan runs a window over the STATS table — one row per FILE, a
    table that is ~millions of rows when the data is 100 TB, so the
    single-partition cumulative sum is bounded by the file count, never
    the data.  Output: ``(file, row_count, is_small, group_id)``;
    execute it by reading each group's files and rewriting them as one.
    """
    if target_rows < 1:
        raise ValueError(f"target_rows must be >= 1, got {target_rows}")
    if not 0.0 < small_frac <= 1.0:
        raise ValueError(f"small_frac must be in (0,1], got {small_frac}")
    cut = float(small_frac) * target_rows
    small = F.col(rows_col) < F.lit(cut)
    w = (
        Window.orderBy(F.col(file_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rows_before = F.coalesce(
        F.sum(F.when(small, F.col(rows_col))).over(w), F.lit(0)
    )
    return stats.select(
        F.col(file_col),
        F.col(rows_col),
        small.alias("is_small"),
        F.when(
            small, F.floor(rows_before / F.lit(float(target_rows)))
        ).cast("int").alias("group_id"),
    )
