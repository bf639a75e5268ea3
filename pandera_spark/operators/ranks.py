"""Rank-based (nonparametric) statistical screens: Mann-Whitney U,
Kruskal-Wallis H, Spearman rank correlation.

The parametric screens (``stats.group_trend`` / ``anova_f`` /
``hypotheses.two_sample_t``) assume roughly-normal metrics; production
metrics (latencies, revenues, token counts) rarely oblige.  The rank
family is the standard distribution-free fallback, and every statistic
here is exactly replayable by an external SQL engine — no simulation,
no RNG.

Scale shape — all three share ONE primitive, :func:`value_midranks`:

1. collapse rows to the DISTINCT-VALUE grain first (one aggregation
   with map-side partial combine; ties collapse, so the ranked frame
   is bounded by value cardinality, not row count);
2. rank that grain with the scalable two-pass prefix sum (the
   :mod:`.ordered` / ``sharding.balanced_shards`` idiom):
   ``repartitionByRange(value)`` + a cumulative window partitioned by
   ``spark_partition_id()`` + a #partitions-row offset frame — never
   an un-partitioned window over the data;
3. the statistic is then ONE closed-form aggregation over the ranked
   value grain (Mann-Whitney / Kruskal-Wallis), or one hash join of
   midranks back onto rows plus one ``corr`` aggregation (Spearman).

Truly continuous metrics can make the value grain approach row count;
pre-quantize (``F.round(col, d)``) when distinct cardinality is a
concern — the midrank construction is unchanged.

Reference parity: none (pandera has no nonparametric hypotheses);
beyond-reference statistical tier next to ``operators/stats.py``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .drift import _norm_sf

__all__ = [
    "value_midranks",
    "mann_whitney_u",
    "kruskal_wallis",
    "spearman_corr",
    "gini",
    "lorenz_points",
    "qq_points",
    "kendall_tau_b",
    "yuen_trimmed_t",
    "friedman_test",
]


def _chi2_sf(x: C, k: C) -> C:
    """Chi-square survival function via the Wilson-Hilferty cube-root
    normal approximation — the same form (digit for digit) as
    ``stats.chi2_independence`` / ``drift.category_drift``, so oracle
    replays share one SQL template."""
    z = (F.pow(x / k, F.lit(1.0 / 3.0)) - (1 - 2 / (9 * k))) / F.sqrt(
        2 / (9 * k)
    )
    return F.when(k <= 0, F.lit(None).cast("double")).otherwise(
        _norm_sf(z)
    )


def _pin_range_partitions(parted: DataFrame) -> DataFrame:
    """Materialize a range-partitioned frame ONCE so every consumer
    observes the SAME partition boundaries and ids.

    The two-pass prefix-sum pattern is only exact when its rank branch
    and its counts branch read the identical partitioning.  The old
    contract relied on the planner's ReuseExchange, but the plans NEVER
    reuse here (the ``spark_partition_id()`` projection is
    nondeterministic, which defeats subtree canonicalization): each
    branch re-executed the whole lineage INCLUDING its own
    ``repartitionByRange`` boundary sampling, whose random sample
    differs per execution once the grain outgrows the sample size —
    measured at sf0.1 as run-to-run-varying (and oracle-diverging)
    Mann-Whitney U values, while small SFs stayed green because the
    sample covers the whole frame there.  A lazy localCheckpoint pins
    one physical partitioning (and, as a side effect, stops the whole
    upstream lineage from executing twice); the answer itself is
    partition-invariant, so values at already-green scale factors are
    unchanged."""
    try:
        return parted.localCheckpoint(eager=False)
    except Exception:  # pragma: no cover - Spark Connect
        from pyspark import StorageLevel

        return parted.persist(StorageLevel.MEMORY_AND_DISK)


def value_midranks(
    df: DataFrame,
    value_col: str,
    *,
    weight_col: Optional[str] = None,
    extra_aggs: Optional[dict] = None,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Distinct-value grain with tie-averaged (mid)ranks.

    Output: ``(__v, __cnt, __rank, *extra_aggs)`` — one row per
    distinct non-null value, where ``__rank`` is the average of the
    1-based positions the value's ties would occupy in the sorted
    sample: ``cum_before + (cnt + 1)/2``.  ``weight_col`` makes each
    input row count as that many sample rows (callers passing an
    already-aggregated (value, count) frame); ``extra_aggs`` ride the
    same single value-grain aggregation (e.g. per-group counts), so
    callers never re-aggregate the rows.

    The cumulative count is the two-pass range rank: partitions are
    range-disjoint on value, the running sum is a window PARTITIONED
    by ``spark_partition_id()``, and cross-partition offsets come from
    a #partitions-row aggregate (tiny window).  Exactly equals the
    global-window answer (pinned in tests) without ever collapsing the
    grain to one task.
    """
    cnt_src = (
        F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    )
    aggs = [cnt_src.cast("long").alias("__cnt")]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    vg = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("__v"))
        .agg(*aggs)
    )
    if num_partitions:
        nparts = num_partitions
    else:
        try:
            nparts = int(
                df.sparkSession.conf.get(
                    "spark.sql.shuffle.partitions", "200"
                )
            )
        except (TypeError, ValueError):
            nparts = 200
    parted = _pin_range_partitions(
        vg.repartitionByRange(nparts, F.col("__v").asc()).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    wrun = (
        Window.partitionBy("__pid")
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parted.withColumn("__run", F.sum("__cnt").over(wrun))
    counts = parted.groupBy("__pid").agg(F.sum("__cnt").alias("__n"))
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(woff), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "__rank",
            (F.col("__off") + F.col("__run") - F.col("__cnt")).cast(
                "double"
            )
            + (F.col("__cnt") + 1) / 2.0,
        )
        .drop("__pid", "__run", "__off")
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    *,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test of ``group_a`` vs
    ``group_b`` on ``value_col``.

    One row: ``n_a, n_b, u_a, u_b, z, pvalue`` — the tie-corrected
    normal approximation (two-sided, no continuity correction:
    ``z = (U_a − n_a·n_b/2) / σ`` with
    ``σ² = n_a·n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1)))``).  Null when a
    group is empty or every value is tied (σ = 0).

    Plan: one value-grain aggregation (per-value total + group-a
    counts ride :func:`value_midranks`) + ONE closing aggregation —
    rows are never ranked individually, and nothing reaches the
    driver.
    """
    sub = df.where(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    )
    mr = value_midranks(
        sub,
        value_col,
        extra_aggs={
            "__na": F.sum(
                (F.col(group_col) == F.lit(group_a)).cast("long")
            )
        },
        num_partitions=num_partitions,
    )
    cnt = F.col("__cnt").cast("double")
    agg = mr.agg(
        F.sum("__cnt").cast("long").alias("n"),
        F.sum("__na").cast("long").alias("n_a"),
        F.sum(F.col("__na") * F.col("__rank")).alias("r_a"),
        F.sum(cnt * cnt * cnt - cnt).alias("ties"),
    )
    n = F.col("n").cast("double")
    na = F.col("n_a").cast("double")
    nb = (F.col("n") - F.col("n_a")).cast("double")
    u_a = F.col("r_a") - na * (na + 1) / 2.0
    sigma2 = (
        na
        * nb
        / 12.0
        * ((n + 1) - F.col("ties") / (n * (n - 1)))
    )
    z = F.try_divide(u_a - na * nb / 2.0, F.sqrt(sigma2))
    return (
        agg.select(
            F.col("n_a"),
            (F.col("n") - F.col("n_a")).cast("long").alias("n_b"),
            u_a.alias("u_a"),
            (na * nb - u_a).alias("u_b"),
            z.alias("z"),
        )
        .withColumn("pvalue", 2.0 * _norm_sf(F.abs(F.col("z"))))
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Kruskal-Wallis H test: does ``value_col``'s distribution differ
    across the levels of ``group_col``?  (The k-group generalization
    of Mann-Whitney; the nonparametric ANOVA.)

    One row: ``n, k, h, h_corrected, dof, pvalue`` —
    ``H = 12/(N(N+1)) Σ_g R_g²/n_g − 3(N+1)``, tie correction
    ``C = 1 − Σ(t³−t)/(N³−N)``, ``H_c = H/C``, p via the same
    Wilson-Hilferty χ² survival replay as ``chi2_independence``.
    Rows with a null value or null group are excluded (a null group
    is not a level here, matching ANOVA's treatment).

    Plan: one (value, group)-grain aggregation feeds a value-grain
    midrank pass (weights = per-cell counts), one group-grain rank-sum
    aggregation, one closing aggregation.  All grains are bounded by
    cardinality, not row count.
    """
    sub = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    cells = sub.groupBy(
        F.col(value_col).alias("__v"), F.col(group_col).alias("__g")
    ).agg(F.count(F.lit(1)).cast("long").alias("__w"))
    ranked = value_midranks(
        cells, "__v", weight_col="__w", num_partitions=num_partitions
    ).select("__v", F.col("__cnt").alias("__t"), "__rank")
    per_group = (
        cells.join(ranked.select("__v", "__rank"), "__v")
        .groupBy("__g")
        .agg(
            F.sum("__w").cast("long").alias("__ng"),
            F.sum(F.col("__w") * F.col("__rank")).alias("__rg"),
        )
    )
    ties = ranked.agg(
        F.sum(
            F.col("__t").cast("double") ** 3 - F.col("__t").cast("double")
        ).alias("__ties")
    )
    agg = per_group.crossJoin(F.broadcast(ties)).agg(
        F.sum("__ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.col("__rg") * F.col("__rg") / F.col("__ng").cast("double")
        ).alias("__s"),
        F.first("__ties").alias("__ties"),
    )
    n = F.col("n").cast("double")
    h = 12.0 / (n * (n + 1)) * F.col("__s") - 3.0 * (n + 1)
    corr = 1.0 - F.col("__ties") / (n * n * n - n)
    h_c = F.try_divide(h, corr)
    dof = (F.col("k") - 1).cast("long")
    out = agg.select(
        "n",
        "k",
        h.alias("h"),
        h_c.alias("h_corrected"),
        dof.alias("dof"),
    )
    return out.withColumn(
        "pvalue",
        _chi2_sf(F.col("h_corrected"), F.col("dof").cast("double")),
    )


def spearman_corr(
    df: DataFrame,
    x: str,
    y: str,
    *,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Spearman rank correlation of ``x`` and ``y`` (tie-aware:
    Pearson on midranks — the standard tie-corrected form).

    One row: ``n, rho``.  Rows with a null on either side are dropped
    FIRST (ranks are computed within the pairwise-complete sample,
    matching the textbook definition).

    Plan: two value-grain midrank passes (one per column), each hash
    joined back onto the pairwise-complete rows by value, then ONE
    ``corr`` aggregation.  The joins are value-key equi-joins (AQE
    broadcasts when a side's value grain is small).
    """
    sub = df.where(
        F.col(x).isNotNull() & F.col(y).isNotNull()
    ).select(F.col(x).alias("__x"), F.col(y).alias("__y"))
    rx = value_midranks(
        sub, "__x", num_partitions=num_partitions
    ).select(F.col("__v").alias("__x"), F.col("__rank").alias("__rx"))
    ry = value_midranks(
        sub, "__y", num_partitions=num_partitions
    ).select(F.col("__v").alias("__y"), F.col("__rank").alias("__ry"))
    joined = sub.join(rx, "__x").join(ry, "__y")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.corr("__rx", "__ry").alias("rho"),
    )


def gini(
    df: DataFrame,
    value_col: str,
    *,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Gini coefficient of a non-negative quantity (inequality of
    token counts across documents, revenue across orders, load across
    shards...).

    One row: ``n, total, gini`` with the tie-corrected midrank form
    ``G = 2·Σ r̄_i x_i / (n·Σx) − (n+1)/n`` — identical to the sorted
    Lorenz definition, but computable from :func:`value_midranks`'s
    distinct-value grain in ONE closing aggregation (Σ r̄·x per value =
    rank · value · multiplicity).  Negative values are rejected (the
    coefficient is undefined there); zero-total yields null.
    """
    x = F.col(value_col).cast("double")
    neg = df.where(x < 0).limit(1).count()
    if neg:
        raise ValueError(f"{value_col!r} has negative values; "
                         "gini requires a non-negative quantity")
    mr = value_midranks(df, value_col, num_partitions=num_partitions)
    agg = mr.agg(
        F.sum("__cnt").cast("long").alias("n"),
        F.sum(F.col("__cnt") * F.col("__v")).alias("total"),
        F.sum(
            F.col("__rank") * F.col("__v") * F.col("__cnt")
        ).alias("__rx"),
    )
    n = F.col("n").cast("double")
    g = (
        2.0 * F.col("__rx") / (n * F.col("total"))
        - (n + 1.0) / n
    )
    return agg.select(
        "n",
        "total",
        F.when(F.col("total") > 0, g).alias("gini"),
    )


def _range_prefix_sums(
    spark,
    vg: DataFrame,
    sum_cols: "Sequence[str]",
    *,
    order_col: str = "__v",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Range-partitioned two-pass cumulative sums over a value-grain
    frame: for each ``c`` in ``sum_cols`` adds ``__cum_{c}`` = the
    running sum of ``c`` through the current ``order_col`` value —
    exactly the global ORDER BY window answer, computed without ever
    collapsing the grain to one task (partition-local windows + a
    #partitions-row broadcast offset join, the :func:`value_midranks`
    pattern)."""
    if num_partitions:
        nparts = num_partitions
    else:
        try:
            nparts = int(
                spark.conf.get("spark.sql.shuffle.partitions", "200")
            )
        except (TypeError, ValueError):  # pragma: no cover
            nparts = 200
    sum_cols = list(sum_cols)
    parted = _pin_range_partitions(
        vg.repartitionByRange(
            nparts, F.col(order_col).asc()
        ).withColumn("__pid", F.spark_partition_id())
    )
    wrun = (
        Window.partitionBy("__pid")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parted
    for c in sum_cols:
        local = local.withColumn(f"__run_{c}", F.sum(c).over(wrun))
    per_part = parted.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__p_{c}") for c in sum_cols]
    )
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_part.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__p_{c}").over(woff), F.lit(0.0))
            .alias(f"__off_{c}")
            for c in sum_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "__pid")
    for c in sum_cols:
        out = out.withColumn(
            f"__cum_{c}", F.col(f"__off_{c}") + F.col(f"__run_{c}")
        )
    return out.drop(
        "__pid",
        *[f"__run_{c}" for c in sum_cols],
        *[f"__off_{c}" for c in sum_cols],
    )


def lorenz_points(
    df: DataFrame,
    value_col: str,
    *,
    fractions: "Sequence[float]" = (
        0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9,
    ),
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Empirical Lorenz-curve points — the visual companion to
    :func:`gini`: for each requested population fraction q, the row
    ``(q, pop_share, value_share)`` at the first sorted position whose
    cumulative count reaches ``ceil(q·n)`` ("the bottom 80% of
    documents hold value_share of the tokens").

    Scale shape: the corpus collapses to the DISTINCT-VALUE grain with
    the same range-partitioned two-pass prefix sums as
    :func:`value_midranks` (count AND value mass prefixes in ONE
    window pass — no global one-task sort); the crossing rows come
    from per-fraction conditional ``min`` aggregates over that grain
    (``cum_value`` is monotone because values are non-negative —
    enforced, as in :func:`gini`).
    """
    fr = [float(q) for q in fractions]
    if not fr or not all(0 < q <= 1 for q in fr):
        raise ValueError("fractions must be in (0, 1]")
    x = F.col(value_col).cast("double")
    neg = df.where(x < 0).limit(1).count()
    if neg:
        raise ValueError(f"{value_col!r} has negative values; "
                         "the Lorenz curve needs a non-negative quantity")
    vg = (
        df.where(x.isNotNull())
        .groupBy(x.alias("__v"))
        .agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
        .withColumn("__mass", F.col("__v") * F.col("__cnt"))
    )
    prefixed = _range_prefix_sums(
        df.sparkSession, vg, ["__cnt", "__mass"],
        num_partitions=num_partitions,
    )
    totals = vg.agg(
        F.sum("__cnt").alias("__n"), F.sum("__mass").alias("__total")
    )
    cum = prefixed.select(
        F.col("__cum___cnt").alias("__cumc"),
        F.col("__cum___mass").alias("__cumm"),
    ).crossJoin(F.broadcast(totals))
    aggs = []
    for i, q in enumerate(fr):
        thresh = F.ceil(F.lit(q) * F.col("__n")).cast("double")
        hit = F.col("__cumc") >= thresh
        aggs.append(F.min(F.when(hit, F.col("__cumc")))
                    .alias(f"__pc_{i}"))
        aggs.append(F.min(F.when(hit, F.col("__cumm")))
                    .alias(f"__pm_{i}"))
        aggs.append(F.first("__n").alias(f"__n_{i}"))
        aggs.append(F.first("__total").alias(f"__t_{i}"))
    wide = cum.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(q).alias("q"),
            F.try_divide(F.col(f"__pc_{i}"), F.col(f"__n_{i}"))
            .alias("pop_share"),
            F.try_divide(F.col(f"__pm_{i}"), F.col(f"__t_{i}"))
            .alias("value_share"),
        )
        for i, q in enumerate(fr)
    ])
    return wide.select(F.explode(rows).alias("s")).select(
        "s.q", "s.pop_share", "s.value_share"
    )


def qq_points(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    *,
    quantiles: "Sequence[float]" = (
        0.1, 0.25, 0.5, 0.75, 0.9,
    ),
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Q-Q comparison points between two groups: for each requested
    quantile q the EXACT order statistics of both groups at that
    level — one row ``(q, q_a, q_b, diff, ratio)``.  The drift
    diagnostic that says WHERE two distributions diverge (tails vs
    body), where a KS statistic only says THAT they do.

    Exact, no interpolation: ``q_g`` is the ``ceil(q·n_g)``-th
    smallest value of group g (the lower empirical quantile), so the
    output is engine-replayable.  Scale shape: one shuffle to the
    distinct-value grain with per-group counts, the shared
    range-partitioned two-pass prefix sums (never a one-task global
    sort), then per-quantile conditional ``min`` aggregates.
    """
    qs = [float(q) for q in quantiles]
    if not qs or not all(0 < q <= 1 for q in qs):
        raise ValueError("quantiles must be in (0, 1]")
    x = F.col(value_col).cast("double")
    g = F.col(group_col)
    ga, gb = g == F.lit(group_a), g == F.lit(group_b)
    vg = (
        df.where(x.isNotNull() & (ga | gb))
        .groupBy(x.alias("__v"))
        .agg(
            F.sum(ga.cast("double")).alias("__ca"),
            F.sum(gb.cast("double")).alias("__cb"),
        )
    )
    prefixed = _range_prefix_sums(
        df.sparkSession, vg, ["__ca", "__cb"],
        num_partitions=num_partitions,
    )
    totals = vg.agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    )
    cum = prefixed.select(
        "__v",
        F.col("__cum___ca").alias("__cuma"),
        F.col("__cum___cb").alias("__cumb"),
    ).crossJoin(F.broadcast(totals))
    aggs = []
    for i, q in enumerate(qs):
        ta = F.ceil(F.lit(q) * F.col("__na")).cast("double")
        tb = F.ceil(F.lit(q) * F.col("__nb")).cast("double")
        aggs.append(
            F.min(F.when(F.col("__cuma") >= ta, F.col("__v")))
            .alias(f"__qa_{i}")
        )
        aggs.append(
            F.min(F.when(F.col("__cumb") >= tb, F.col("__v")))
            .alias(f"__qb_{i}")
        )
    wide = cum.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(q).alias("q"),
            F.col(f"__qa_{i}").alias("q_a"),
            F.col(f"__qb_{i}").alias("q_b"),
            (F.col(f"__qa_{i}") - F.col(f"__qb_{i}")).alias("diff"),
            F.try_divide(F.col(f"__qa_{i}"), F.col(f"__qb_{i}"))
            .alias("ratio"),
        )
        for i, q in enumerate(qs)
    ])
    return wide.select(F.explode(rows).alias("s")).select(
        "s.q", "s.q_a", "s.q_b", "s.diff", "s.ratio"
    )


def kendall_tau_b(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Kendall's τ-b rank correlation with the tie-adjusted normal
    z — the concordance companion to :func:`spearman_corr` (τ weights
    each discordant PAIR once, so it is the robust choice when the
    question is "do these two columns order rows the same way").

    One row: ``n, n_cells, concordant, discordant, tau_b, z`` with
    ``τ_b = (C−D)/√((n₀−n₁)(n₀−n₂))`` and the ties-corrected
    variance (Kendall 1970 §4; the scipy ``kendalltau`` form) behind
    ``z``.

    Scale shape: rows collapse to the DISTINCT ``(x, y)`` CELL grain
    first (one aggregation, map-side combined — bounded by |X|·|Y|
    cells, not rows); the O(cells²) concordance count then runs
    vectorized inside ONE Arrow batch (same bounded-grain contract as
    the PAV sweep in ``evalmetrics.isotonic_calibrate`` — pre-quantize
    truly continuous columns).  C and D are integer-exact, so an
    external SQL engine replays them with a pairwise cell join.
    """
    import pandas as pd

    xc = F.col(x_col).cast("double")
    yc = F.col(y_col).cast("double")
    cells = (
        df.where(xc.isNotNull() & yc.isNotNull())
        .groupBy(xc.alias("__x"), yc.alias("__y"))
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
        .withColumn("__g", F.lit(1))
    )

    schema = (
        "n long, n_cells long, concordant double, discordant double, "
        "tau_b double, z double"
    )

    def _tau(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        x = pdf["__x"].to_numpy()
        y = pdf["__y"].to_numpy()
        c = pdf["__c"].to_numpy()
        m = len(c)
        C = D = 0.0
        for i in range(m - 1):
            dx = x[i + 1:] - x[i]
            dy = y[i + 1:] - y[i]
            s = dx * dy
            w = c[i] * c[i + 1:]
            C += float(w[s > 0].sum())
            D += float(w[s < 0].sum())
        n = float(c.sum())
        tx = pd.Series(c).groupby(pd.Series(x)).sum().to_numpy()
        ty = pd.Series(c).groupby(pd.Series(y)).sum().to_numpy()
        n0 = n * (n - 1) / 2.0
        n1 = float((tx * (tx - 1) / 2.0).sum())
        n2 = float((ty * (ty - 1) / 2.0).sum())
        den = np.sqrt((n0 - n1) * (n0 - n2))
        tau = (C - D) / den if den > 0 else float("nan")
        v0 = n * (n - 1) * (2 * n + 5)
        vt = float((tx * (tx - 1) * (2 * tx + 5)).sum())
        vu = float((ty * (ty - 1) * (2 * ty + 5)).sum())
        v1 = (
            float((tx * (tx - 1)).sum())
            * float((ty * (ty - 1)).sum())
            / (2.0 * n * (n - 1))
        ) if n > 1 else 0.0
        v2 = (
            float((tx * (tx - 1) * (tx - 2)).sum())
            * float((ty * (ty - 1) * (ty - 2)).sum())
            / (9.0 * n * (n - 1) * (n - 2))
        ) if n > 2 else 0.0
        var = (v0 - vt - vu) / 18.0 + v1 + v2
        z = (C - D) / np.sqrt(var) if var > 0 else float("nan")
        return pd.DataFrame([{
            "n": int(n), "n_cells": m, "concordant": C,
            "discordant": D, "tau_b": tau, "z": z,
        }])

    return cells.groupBy("__g").applyInPandas(_tau, schema=schema)


def yuen_trimmed_t(
    df: DataFrame,
    col: str,
    group_col: str,
    group_a,
    group_b,
    *,
    trim: float = 0.2,
) -> DataFrame:
    """Yuen's trimmed-mean t test between two groups — the robust
    middle ground between the Student/Welch lanes (outlier-fragile
    means) and Mann-Whitney (which gives up on means entirely):
    compare 20%-trimmed means with winsorized variances and a
    Welch-style dof.

    One row: ``n_a, n_b, h_a, h_b, tmean_a, tmean_b, t_stat, dof``
    where ``h = n − 2·floor(trim·n)`` is the retained count,
    ``t = (t̄_a − t̄_b)/√(d_a+d_b)`` with
    ``d = s²_w·(n−1)/(h·(h−1))`` (winsorized sample variance), and
    Welch–Satterthwaite dof over the two d's (Yuen 1974).

    Scale shape: rows collapse to the per-group DISTINCT-VALUE grain
    (one aggregation); trimmed/winsorized sums come from cumulative
    counts over that grain (windows partitioned by group over
    VALUE-cardinality-bounded frames — the :func:`value_midranks`
    caveat applies: pre-quantize truly continuous metrics); the
    closing two-row pivot is one conditional aggregate.  Every
    intermediate is a count or a value·count product, so an external
    SQL engine replays the statistic exactly.

    Numerical caveat: the winsorized variance uses the
    ``Σx² − (Σx)²/n`` form, which cancels catastrophically when the
    metric's mean is huge relative to its spread (same caveat as
    :func:`stats.anova_f`) — center large-offset metrics (subtract a
    constant) before calling; the trimmed-mean DIFFERENCE is
    unaffected by the shift.
    """
    if not 0.0 < trim < 0.5:
        raise ValueError(f"trim must be in (0, 0.5): {trim}")
    xc = F.col(col).cast("double")
    g = F.col(group_col)
    grain = (
        df.where(xc.isNotNull() & g.isin([group_a, group_b]))
        .groupBy(
            g.alias("__g"), xc.alias("__v")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )
    wcum = (
        Window.partitionBy("__g")
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("__g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = grain.select(
        "__g", "__v", "__c",
        F.sum("__c").over(wcum).alias("__cum"),
        F.sum("__c").over(wall).alias("__n"),
    ).withColumn("__prev", F.col("__cum") - F.col("__c"))
    k = F.floor(F.lit(float(trim)) * F.col("__n")).cast("double")
    hi = F.col("__n") - k
    ov = F.greatest(
        F.lit(0.0),
        F.least(F.col("__cum"), hi) - F.greatest(F.col("__prev"), k),
    )
    per = cum.groupBy("__g").agg(
        F.max("__n").alias("n"),
        F.max(k).alias("k"),
        F.sum(F.col("__v") * ov).alias("tsum"),
        F.sum(F.col("__v") * F.col("__v") * ov).alias("tsumsq"),
        F.min(F.when(F.col("__cum") >= k + 1, F.col("__v"))).alias("vlo"),
        F.min(F.when(F.col("__cum") >= hi, F.col("__v"))).alias("vhi"),
    )
    h = F.col("n") - 2 * F.col("k")
    wsum = F.col("tsum") + F.col("k") * (F.col("vlo") + F.col("vhi"))
    wsumsq = F.col("tsumsq") + F.col("k") * (
        F.col("vlo") ** 2 + F.col("vhi") ** 2
    )
    stats = per.select(
        "__g", "n",
        h.alias("h"),
        (F.col("tsum") / h).alias("tmean"),
        F.when(
            F.col("n") > 1,
            (wsumsq - wsum * wsum / F.col("n")) / (F.col("n") - 1),
        ).alias("swv"),
    )
    isa = F.col("__g") == F.lit(group_a)
    piv = stats.agg(
        F.max(F.when(isa, F.col("n"))).cast("long").alias("n_a"),
        F.max(F.when(~isa, F.col("n"))).cast("long").alias("n_b"),
        F.max(F.when(isa, F.col("h"))).cast("long").alias("h_a"),
        F.max(F.when(~isa, F.col("h"))).cast("long").alias("h_b"),
        F.max(F.when(isa, F.col("tmean"))).alias("tmean_a"),
        F.max(F.when(~isa, F.col("tmean"))).alias("tmean_b"),
        F.max(F.when(isa, F.col("swv"))).alias("__swv_a"),
        F.max(F.when(~isa, F.col("swv"))).alias("__swv_b"),
    )
    ha = F.col("h_a").cast("double")
    hb = F.col("h_b").cast("double")
    # the h > 1 guard must wrap the d expressions THEMSELVES: a retained
    # count of 1 makes h·(h−1) = 0, and evaluating the division inside
    # the outer F.when condition would still raise DIVIDE_BY_ZERO under
    # ANSI mode (conditions evaluate their branches' inputs)
    da = F.when(
        ha > 1, F.col("__swv_a") * (F.col("n_a") - 1) / (ha * (ha - 1))
    )
    db = F.when(
        hb > 1, F.col("__swv_b") * (F.col("n_b") - 1) / (hb * (hb - 1))
    )
    t = F.when(
        (ha > 1) & (hb > 1) & (da + db > 0),
        (F.col("tmean_a") - F.col("tmean_b")) / F.sqrt(da + db),
    )
    dof = F.when(
        (ha > 1) & (hb > 1) & (da + db > 0),
        (da + db) ** 2 / (da ** 2 / (ha - 1) + db ** 2 / (hb - 1)),
    )
    return piv.select(
        "n_a", "n_b", "h_a", "h_b", "tmean_a", "tmean_b",
        t.alias("t_stat"), dof.alias("dof"),
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value,
) -> DataFrame:
    """Friedman rank test for k related treatments over n blocks — the
    repeated-measures complement to :func:`kruskal_wallis` (use it
    when every block sees every treatment: per-cohort metric across
    pipeline variants, per-day ranking of sources, ...).

    ``value`` is an aggregate Column evaluated per (block, treatment)
    CELL (e.g. ``F.count(F.lit(1))`` or ``F.avg("x")``); cells rank
    WITHIN their block by midranks, and only COMPLETE blocks (all k
    treatments present, k = global distinct treatment count) enter
    the statistic — incomplete blocks are dropped and counted.

    One row: ``k, n_blocks, n_dropped, chi2_stat, dof, pvalue`` with
    the tie-corrected statistic
    ``Q = [12/(nk(k+1))·ΣR_j² − 3n(k+1)] / (1 − ΣT/(n(k³−k)))``
    where ``T = Σ(t³−t)`` over tie groups per block (the standard
    Friedman / Kendall-W correction — scipy.stats.friedmanchisquare),
    p via the shared χ²(k−1) replay (exact Z² identity at dof 1).

    The operator is ONE lazy plan with no eager driver actions: the
    global treatment count ``k`` rides a 1-row broadcast frame onto
    the cell grain, dropped blocks are counted in the same final
    aggregation (incomplete-block cells fold into a NULL treatment
    group), and degenerate inputs (k < 2, zero complete blocks) yield
    a NULL ``chi2_stat``/``pvalue`` row instead of raising.

    Scale shape: ONE shuffle to the (block, treatment) cell grain;
    ranks come from windows PARTITIONED BY block over k-row
    partitions (never data rows); treatment rank sums are a k-row
    aggregation.  With an integer cell (counts), every rank decision
    is exact cross-engine.
    """
    bc = block_col if isinstance(block_col, C) else F.col(block_col)
    tc = (
        treatment_col
        if isinstance(treatment_col, C)
        else F.col(treatment_col)
    )
    cells = df.groupBy(
        bc.alias("__b"), tc.alias("__t")
    ).agg(value.cast("double").alias("__v"))
    # global k as a 1-row broadcast frame (no driver action; the cell
    # grain is n_blocks x k rows, the broadcast side is exactly 1 row)
    kframe = cells.agg(
        F.countDistinct("__t").cast("long").alias("__k")
    )
    wb = Window.partitionBy("__b")
    flagged = cells.crossJoin(F.broadcast(kframe)).withColumn(
        "__bk", F.count(F.lit(1)).over(wb)
    )
    keep = F.col("__bk") == F.col("__k")
    # midrank within block: min-rank + (ties-1)/2; tie term t^3-t per
    # (block, value) group counted once via a marker on the first row.
    # Ranks are computed over ALL blocks (same window partitioning);
    # incomplete blocks carry __keep=false and contribute only to the
    # dropped-block count downstream.
    wrank = Window.partitionBy("__b").orderBy("__v")
    wtie = Window.partitionBy("__b", "__v")
    ranked = flagged.select(
        "__b", "__t", "__k", keep.alias("__keep"),
        (
            F.rank().over(wrank)
            + (F.count(F.lit(1)).over(wtie) - 1) / 2.0
        ).alias("__r"),
        F.count(F.lit(1)).over(wtie).alias("__tc"),
        (F.row_number().over(
            Window.partitionBy("__b", "__v").orderBy("__t")
        ) == 1).alias("__first"),
    )
    # kept cells group by treatment; every dropped-block cell folds
    # into the NULL group, whose countDistinct(__b) is n_dropped
    per_t = ranked.groupBy(
        F.when(F.col("__keep"), F.col("__t")).alias("__t2")
    ).agg(
        F.sum(F.when(F.col("__keep"), F.col("__r"))).alias("__R"),
        F.count(F.when(F.col("__keep"), F.lit(1)))
        .cast("long").alias("__nb"),
        F.sum(
            F.when(
                F.col("__keep") & F.col("__first"),
                F.col("__tc") ** 3 - F.col("__tc"),
            ).otherwise(F.lit(0))
        ).alias("__ties"),
        F.countDistinct(
            F.when(~F.col("__keep"), F.col("__b"))
        ).alias("__drops"),
        F.max("__k").alias("__km"),
    )
    agg = per_t.agg(
        F.max("__km").alias("__kk"),
        F.max("__nb").cast("long").alias("n_blocks"),
        F.sum(F.col("__R") * F.col("__R")).alias("__R2"),
        F.sum("__ties").alias("__tsum"),
        F.coalesce(F.sum("__drops"), F.lit(0))
        .cast("long").alias("__nd"),
    )
    nD = F.col("n_blocks").cast("double")
    kD = F.col("__kk").cast("double")
    # try_divide throughout: the guards (k >= 2, n > 0, denom > 0)
    # sit in when-CONDITIONS, which evaluate their inputs — a plain
    # division would raise DIVIDE_BY_ZERO under ANSI on k < 2 / n = 0
    q_raw = (
        F.try_divide(F.lit(12.0), nD * kD * (kD + 1.0))
        * F.col("__R2")
        - 3.0 * nD * (kD + 1.0)
    )
    denom = 1.0 - F.try_divide(
        F.col("__tsum"), nD * (kD ** 3 - kD)
    )
    chi2 = F.when(
        (F.col("__kk") >= 2) & (F.col("n_blocks") > 0) & (denom > 0),
        F.greatest(F.lit(0.0), F.try_divide(q_raw, denom)),
    )
    pv = (
        F.when(chi2.isNull(), F.lit(None).cast("double"))
        .when(F.col("__kk") == 2, 2.0 * _norm_sf(F.sqrt(chi2)))
        .otherwise(_chi2_sf(chi2, kD - 1.0))
    )
    return agg.select(
        F.col("__kk").alias("k"),
        "n_blocks",
        F.col("__nd").alias("n_dropped"),
        chi2.alias("chi2_stat"),
        (F.col("__kk") - F.lit(1)).cast("long").alias("dof"),
        pv.alias("pvalue"),
    )
