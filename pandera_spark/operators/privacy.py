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

__all__ = ["k_anonymity_report", "risky_groups", "l_diversity_report",
    "dp_noisy_counts",
]


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


def dp_noisy_counts(
    df: DataFrame,
    col: str,
    *,
    epsilon: float = 1.0,
    salt: str = "",
    clamp_nonneg: bool = True,
) -> DataFrame:
    """Laplace-mechanism category counts: one row per category with
    ``(value, noisy_count)`` where the noise is Laplace(1/ε) — the
    standard ε-DP release for a unit-sensitivity histogram.

    The noise is DERIVED, not drawn: category → md5-hexfold hash →
    uniform in (0,1) → inverse Laplace CDF.  That makes every release
    reproducible and SQL-replayable (the engine contract), at a real
    privacy cost: a fixed salt means a fixed noise value per category,
    so repeated releases do NOT compose like fresh draws, and an
    adversary who knows the salt can subtract the noise.  Rotate
    ``salt`` per release and treat it as a secret — or swap in true
    randomness where formal DP matters; the mechanism, sensitivity
    bookkeeping, and plan shape are identical.

    Plan: ONE category-grain aggregate + a pure hash/arithmetic
    projection — no UDF, no second pass.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0: {epsilon}")
    from .dedup import portable_hash28

    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
    )
    # u in (0,1): (h + 0.5) / 2^28 — never exactly 0/0.5/1
    u = (
        portable_hash28(
            F.concat(F.col("value"), F.lit("|dp|" + salt))
        ).cast("double") + F.lit(0.5)
    ) / F.lit(268435456.0)
    centered = u - F.lit(0.5)
    b = F.lit(1.0 / float(epsilon))
    noise = (
        -b
        * F.signum(centered)
        * F.log1p(-2.0 * F.abs(centered))
    )
    noisy = F.col("__cnt") + noise
    if clamp_nonneg:
        noisy = F.greatest(noisy, F.lit(0.0))
    return counts.select(
        "value",
        noisy.alias("noisy_count"),
    )
