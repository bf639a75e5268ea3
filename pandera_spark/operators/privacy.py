"""Privacy screens: k-anonymity and l-diversity over quasi-identifiers.

Before a table ships to a wider audience (or into a training corpus),
the re-identification screen asks: how many rows sit in a
quasi-identifier combination shared by fewer than k rows (Sweeney's
k-anonymity), and do sensitive values vary within each combination
(Machanavajjhala's l-diversity)?  Both are single grouped
aggregations on the quasi-identifier key — the exact shape Spark
partial-aggregates map-side, so the shuffle carries one row per
distinct combination, not per record.

These are SCREENS (measure + locate), not anonymizers: the fix
(generalize, suppress, coarsen buckets) is a policy choice the report
informs.  PII *content* detection/scrubbing lives in
``text.pii_scrub``; this module covers the structured-column attack
surface instead.

Reference parity: no pandera analogue; beyond-reference governance
tier next to operators/relational.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_report", "risky_groups", "l_diversity_report"]


def _group_sizes(df: DataFrame, quasi_cols: Sequence[str]) -> DataFrame:
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count("*").alias("group_n")
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], *, k: int = 5
) -> DataFrame:
    """One row: ``(n_rows, n_groups, min_group_n, risky_groups,
    risky_rows, k)`` — ``risky_*`` count combinations (and the rows in
    them) below the k threshold.  ``min_group_n`` IS the table's
    k-anonymity.  Two aggregations (group sizes, then their summary);
    nothing row-grain crosses the second shuffle."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    g = _group_sizes(df, list(quasi_cols))
    return g.agg(
        F.sum("group_n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.min("group_n").cast("long").alias("min_group_n"),
        F.sum((F.col("group_n") < k).cast("long")).alias("risky_groups"),
        F.sum(F.when(F.col("group_n") < k, F.col("group_n")))
        .cast("long").alias("risky_rows"),
        F.lit(int(k)).alias("k"),
    ).select(
        "n_rows", "n_groups", "min_group_n",
        F.coalesce("risky_groups", F.lit(0)).alias("risky_groups"),
        F.coalesce("risky_rows", F.lit(0)).alias("risky_rows"), "k",
    )


def risky_groups(
    df: DataFrame, quasi_cols: Sequence[str], *, k: int = 5
) -> DataFrame:
    """The offending combinations themselves: ``(quasi_cols...,
    group_n)`` for every group below k — the worklist for
    generalization/suppression.  Output is bounded by the number of
    rare combinations, which is what makes it collectable."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return _group_sizes(df, list(quasi_cols)).where(F.col("group_n") < k)


def l_diversity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    *,
    l: int = 2,
) -> DataFrame:
    """Distinct l-diversity: one row ``(n_groups, min_distinct,
    weak_groups, weak_rows, l)`` where a group is weak if its
    sensitive column shows fewer than ``l`` distinct values — a
    k-anonymous group that is 1-diverse still leaks (everyone in it
    shares the sensitive value).  Exact distinct per group in the same
    single grouped aggregation."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    g = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count("*").alias("group_n"),
        F.count_distinct(F.col(sensitive_col)).alias("n_distinct"),
    )
    return g.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.min("n_distinct").cast("long").alias("min_distinct"),
        F.sum((F.col("n_distinct") < l).cast("long")).alias("weak_groups"),
        F.sum(F.when(F.col("n_distinct") < l, F.col("group_n")))
        .cast("long").alias("weak_rows"),
        F.lit(int(l)).alias("l"),
    ).select(
        "n_groups", "min_distinct",
        F.coalesce("weak_groups", F.lit(0)).alias("weak_groups"),
        F.coalesce("weak_rows", F.lit(0)).alias("weak_rows"), "l",
    )
