"""Statistical screens: trend fits, correlation matrices, independence
tests, one-way ANOVA — the feature-selection / data-understanding pass
a training-data pipeline runs before deciding what to keep.

Every statistic here is an exact closed form over ONE contingency /
moment aggregation, never a sample:

- :func:`group_trend` — per-group simple linear regression (slope,
  intercept, R²) via Spark's ``regr_*`` aggregates.  One hash
  aggregate with map-side partial combine; at 100 TB the shuffle
  carries five moments per group per task, never rows.
- :func:`corr_pairs` — named-column Pearson correlations, all pairs in
  ONE aggregation (optionally per group).
- :func:`chi2_independence` — χ² test of independence between two
  categorical columns.  Contingency cells are one ``groupBy(a, b)``
  over the data (shuffle bounded by |A|×|B| cells per task, not rows);
  marginals come from the CELLS, and the χ² algebraic identity
  ``χ² = n·Σ c²/(rₐ·c_b) − n`` needs only broadcast equi-joins of the
  tiny marginal frames — no second data scan, no cross join.
- :func:`mutual_info` — mutual information + entropies between two
  categoricals from the same contingency shape.  Uses the marginal
  collapse ``Σ_cells c·ln rₐ = Σ_a rₐ·ln rₐ`` so MI, H(A), H(B) and
  NMI all fall out of ONE final aggregation over a union of the three
  counted frames — zero joins.
- :func:`anova_f` — one-way ANOVA F statistic from per-group
  (n, mean, M2) moments; two aggregations, both over already-reduced
  frames.

P-values use the same closed forms as ``operators/drift.py`` (Wilson-
Hilferty χ² → normal, Zelen-Severo Φ) so they stay pure Column
expressions — no scipy, and the SQL oracle can replay them digit for
digit.

Reference parity: pandera's ``Hypothesis`` tier exposes scipy-backed
two-sample tests (reference ``pandera/api/hypotheses.py``,
``pandera/backends/pandas/hypotheses.py``); this module is the
beyond-reference batch-analytics extension of that tier for columns of
ONE frame (independence, trend, variance decomposition), built
expression-first so it distributes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .drift import _norm_sf

__all__ = [
    "group_trend",
    "corr_pairs",
    "chi2_independence",
    "fisher_exact",
    "mutual_info",
    "anova_f",
    "fdr_bh",
    "bootstrap_ci_mean",
    "mcnemar_test",
    "cmh_test",
    "cochran_q",
    "brown_forsythe",
    "herfindahl",
    "randomization_test_mean",
    "median_test",
]


def _by(by: Union[str, Sequence[str], None]) -> list:
    if by is None:
        return []
    return [by] if isinstance(by, str) else list(by)


def group_trend(
    df: DataFrame,
    y: str,
    x: str,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Per-group simple linear regression of ``y`` on ``x``.

    Output: ``by... , n, slope, intercept, r2, x_mean, y_mean`` — one
    row per group.  ``regr_*`` aggregates skip rows where either side
    is null (SQL standard), so ``n`` is the regression count, not the
    group size.  Both columns must be numeric; convert timestamps
    first (e.g. ``unix_timestamp(ts) / 86400.0`` for a per-day slope).
    """
    yc = F.col(y).cast("double")
    xc = F.col(x).cast("double")
    aggs = [
        F.regr_count(yc, xc).alias("n"),
        F.regr_slope(yc, xc).alias("slope"),
        F.regr_intercept(yc, xc).alias("intercept"),
        F.regr_r2(yc, xc).alias("r2"),
        F.regr_avgx(yc, xc).alias("x_mean"),
        F.regr_avgy(yc, xc).alias("y_mean"),
    ]
    keys = _by(by)
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def corr_pairs(
    df: DataFrame,
    cols: Sequence[str],
    by: Union[str, Sequence[str], None] = None,
    *,
    pairs: Optional[Sequence[Tuple[str, str]]] = None,
) -> DataFrame:
    """Pearson correlation for every pair of ``cols`` (or the explicit
    ``pairs``) in ONE aggregation, optionally per group.

    Output is long format: ``by..., col_a, col_b, n, corr`` — one row
    per pair per group, built by unpivoting the single wide aggregate
    row (the unpivot runs on the already-aggregated frame, so it is
    free at scale).  ``n`` counts rows where both sides are non-null.
    """
    cols = list(cols)
    want = list(pairs) if pairs is not None else [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    if not want:
        raise ValueError("need at least one column pair")
    # aliases are keyed by PAIR INDEX, not by embedding the raw column
    # names — names containing "__" (or a duplicated pair) would
    # otherwise collide and mis-wire the unpivot
    aggs = []
    for i, (a, b) in enumerate(want):
        ac, bc = F.col(a).cast("double"), F.col(b).cast("double")
        both = F.when(ac.isNotNull() & bc.isNotNull(), F.lit(1))
        aggs.append(F.corr(ac, bc).alias(f"__c_{i}"))
        aggs.append(F.count(both).alias(f"__n_{i}"))
    keys = _by(by)
    wide = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"__n_{i}").cast("long").alias("n"),
            F.col(f"__c_{i}").alias("corr"),
        )
        for i, (a, b) in enumerate(want)
    ]
    exploded = wide.select(
        *[F.col(k) for k in keys],
        F.explode(F.array(*rows)).alias("__p"),
    )
    return exploded.select(*keys, "__p.*")


def _cells(df: DataFrame, a: str, b: str) -> DataFrame:
    """Contingency cells ``(a, b, __cnt)`` — null categories count as
    their own level via a sentinel-free groupBy (Spark groups nulls).
    The count column is dunder-named so it can never collide with a
    user category column (a column literally named "c" must work)."""
    return df.groupBy(a, b).agg(F.count(F.lit(1)).alias("__cnt"))


def chi2_independence(
    df: DataFrame,
    a: str,
    b: str,
    *,
    pvalue: bool = True,
    bias_correction: bool = False,
) -> DataFrame:
    """Pearson χ² test of independence between categoricals ``a``/``b``.

    One row: ``n, n_a, n_b, dof, chi2_stat, cramers_v`` (+
    ``chi2_pvalue`` via Wilson-Hilferty, as drift.category_drift).
    Uses ``χ² = n·Σ_cells c²/(rₐ·c_b) − n``: the expected-count form
    rearranged so only the row/column totals (broadcast-sized marginal
    frames) ever join the cells.

    ``bias_correction=True`` appends ``cramers_v_bc`` — the
    Bergsma–Wicher bias-corrected V (φ̃² = max(0, φ² −
    (r−1)(c−1)/(n−1)), r̃ = r − (r−1)²/(n−1), likewise c̃,
    Ṽ = √(φ̃²/min(r̃−1, c̃−1))), which removes the upward small-sample
    bias of raw V on sparse tables.  NULL on degenerate inputs
    (n ≤ 1 or a single level on either side).  Pure column arithmetic
    on the same single aggregation — no extra pass.
    """
    cells = _cells(df, a, b)
    marg_a = cells.groupBy(a).agg(F.sum("__cnt").alias("__ra"))
    marg_b = cells.groupBy(b).agg(F.sum("__cnt").alias("__cb"))
    # null-safe equality: a null category is a real level (groupBy keeps
    # it) and must still find its marginal — a plain equi-join would
    # silently drop those cells
    joined = (
        cells
        .join(
            F.broadcast(marg_a.withColumnRenamed(a, "__ka")),
            F.col(a).eqNullSafe(F.col("__ka")),
        )
        .drop("__ka")
        .join(
            F.broadcast(marg_b.withColumnRenamed(b, "__kb")),
            F.col(b).eqNullSafe(F.col("__kb")),
        )
        .drop("__kb")
    )
    out = joined.agg(
        F.sum("__cnt").cast("long").alias("n"),
        # struct-wrap so the null category counts as a level
        # (count_distinct skips bare nulls)
        F.countDistinct(F.struct(F.col(a))).cast("long").alias("n_a"),
        F.countDistinct(F.struct(F.col(b))).cast("long").alias("n_b"),
        F.sum(
            F.col("__cnt").cast("double") ** 2
            / (F.col("__ra") * F.col("__cb"))
        ).alias("__s"),
    ).select(
        "n", "n_a", "n_b",
        ((F.col("n_a") - 1) * (F.col("n_b") - 1)).alias("dof"),
        # clamp: the algebraic form can land at -1e-14 on an exactly
        # independent table, which would NaN the sqrt in cramers_v
        F.greatest(
            F.lit(0.0), F.col("n") * F.col("__s") - F.col("n")
        ).alias("chi2_stat"),
        "__s",
    ).withColumn(
        "cramers_v",
        # try_divide: a degenerate table (one level on either side) has
        # dof 0 → null V, and must not DIVIDE_BY_ZERO under ANSI mode
        F.sqrt(
            F.try_divide(
                F.col("chi2_stat"),
                (
                    F.col("n")
                    * F.least(F.col("n_a") - 1, F.col("n_b") - 1)
                ).cast("double"),
            )
        ),
    ).drop("__s")
    if bias_correction:
        nD = F.col("n").cast("double")
        ra = F.col("n_a").cast("double")
        cb = F.col("n_b").cast("double")
        phi2 = F.try_divide(F.col("chi2_stat"), nD)
        phi2c = F.greatest(
            F.lit(0.0),
            phi2
            - F.try_divide((ra - 1.0) * (cb - 1.0), nD - 1.0),
        )
        rt = ra - F.try_divide((ra - 1.0) ** 2, nD - 1.0)
        ct = cb - F.try_divide((cb - 1.0) ** 2, nD - 1.0)
        out = out.withColumn(
            "cramers_v_bc",
            F.when(
                (F.col("n") > 1) & (F.col("dof") > 0),
                F.sqrt(
                    F.try_divide(
                        phi2c, F.least(rt, ct) - 1.0
                    )
                ),
            ),
        )
    if pvalue:
        k = F.col("dof").cast("double")
        x = F.col("chi2_stat")
        z = (
            F.pow(x / k, F.lit(1.0 / 3.0)) - (1 - 2 / (9 * k))
        ) / F.sqrt(2 / (9 * k))
        out = out.withColumn(
            "chi2_pvalue",
            F.when(k <= 0, F.lit(None).cast("double")).otherwise(
                _norm_sf(z)
            ),
        )
    return out


#: 0.5 * ln(2*pi), written as an explicit literal so the SQL oracle
#: replay uses the identical constant (not its own ln/pi evaluation)
_HALF_LN_2PI = 0.9189385332046727


def _lfact(m):
    """``log(m!)`` for integer ``m >= 0`` as a pure column expression:
    a 4-correction-term Stirling series on ``z = m + 7`` minus the
    shift product ``ln((m+1)...(m+6))`` — relative error < 1e-11 at
    the smallest z and falling fast.  Spark has no lgamma builtin and
    a Python UDF would both leave the JVM and defeat oracle parity;
    this exact arithmetic is replayed token-for-token by the DuckDB
    oracle template, so both engines agree to ~1e-12 instead of
    chasing libm last-ulp parity.
    """
    md = m.cast("double")
    z = md + F.lit(7.0)
    shift = F.log(
        (md + 1.0) * (md + 2.0) * (md + 3.0)
        * (md + 4.0) * (md + 5.0) * (md + 6.0)
    )
    return (
        (z - 0.5) * F.log(z) - z + F.lit(_HALF_LN_2PI)
        + 1.0 / (12.0 * z)
        - 1.0 / (360.0 * z ** 3)
        + 1.0 / (1260.0 * z ** 5)
        - 1.0 / (1680.0 * z ** 7)
        - shift
    )


def _lfact_sql(m: str) -> str:
    """SQL text of :func:`_lfact` over an integer-typed SQL expression
    ``m``, for ``F.expr`` — the identical tree (explicit CAST to double
    first, D-suffixed literals so no decimal arithmetic sneaks in, same
    left-associated term order), so the parsed expression produces
    bit-identical doubles to the Column build."""
    md = f"CAST({m} AS DOUBLE)"
    z = f"({md} + 7.0D)"
    return (
        f"(({z} - 0.5D) * ln({z}) - {z} + {_HALF_LN_2PI!r}D"
        f" + 1.0D / (12.0D * {z})"
        f" - 1.0D / (360.0D * power({z}, 3))"
        f" + 1.0D / (1260.0D * power({z}, 5))"
        f" - 1.0D / (1680.0D * power({z}, 7))"
        f" - ln(({md} + 1.0D) * ({md} + 2.0D) * ({md} + 3.0D)"
        f" * ({md} + 4.0D) * ({md} + 5.0D) * ({md} + 6.0D)))"
    )


def fisher_exact(
    df: DataFrame,
    cond_a,
    cond_b,
    *,
    max_terms: int = 10_000_000,
) -> DataFrame:
    """Fisher's exact test on the 2×2 table of two boolean conditions.

    One row: ``a, b, c, d, n, odds_ratio, p_two, p_less, p_greater``
    where ``a = |A∧B|, b = |A∧¬B|, c = |¬A∧B|, d = |¬A∧¬B|`` (rows
    where either condition is NULL drop), ``odds_ratio`` is the sample
    ``ad/bc`` (NULL when ``bc = 0``), and the p-values are exact
    hypergeometric tail sums: ``p_less``/``p_greater`` the one-sided
    tails over ``k ≤ a`` / ``k ≥ a``, ``p_two`` the standard
    sum-of-at-most-as-probable-tables definition (a table enters when
    ``round(log p_k − log p_obs, 6) ≤ 0`` — the rounding grid keeps
    the borderline-equal-mass mirror tables decided identically by
    an external SQL replay).

    Scale shape: ONE aggregation collapses the data to the four cell
    counts; the support ``k ∈ [max(0, r₁+c₁−n), min(r₁, c₁)]`` is then
    exploded from that 1-row frame and folded — the enumeration costs
    ``min(r₁, c₁)`` rows on ONE executor, which is exactly the regime
    Fisher's exact test is FOR (a rare condition against another
    screen).  When the support exceeds ``max_terms`` the p-values come
    back NULL instead of materializing a giant sequence — at that size
    use :func:`chi2_independence`, whose χ² approximation is already
    exact-grade.  Log-probabilities use the :func:`_lfact` Stirling
    expression (no lgamma builtin in Spark; identical arithmetic in
    the DuckDB oracle).
    """
    ca = F.col(cond_a) if isinstance(cond_a, str) else cond_a
    cb = F.col(cond_b) if isinstance(cond_b, str) else cond_b
    ca = ca.cast("boolean")
    cb = cb.cast("boolean")
    base = df.where(ca.isNotNull() & cb.isNotNull())
    tab = base.agg(
        F.coalesce(F.sum((ca & cb).cast("long")), F.lit(0))
        .alias("a"),
        F.coalesce(F.sum((ca & ~cb).cast("long")), F.lit(0))
        .alias("b"),
        F.coalesce(F.sum((~ca & cb).cast("long")), F.lit(0))
        .alias("c"),
        F.coalesce(F.sum((~ca & ~cb).cast("long")), F.lit(0))
        .alias("d"),
    )
    margins = tab.select(
        "a", "b", "c", "d",
        (F.col("a") + F.col("b") + F.col("c") + F.col("d"))
        .alias("n"),
        (F.col("a") + F.col("b")).alias("__r1"),
        (F.col("c") + F.col("d")).alias("__r2"),
        (F.col("a") + F.col("c")).alias("__c1"),
        (F.col("b") + F.col("d")).alias("__c2"),
    )
    # log p(k) = const − lfact(k) − lfact(r1−k) − lfact(c1−k)
    #            − lfact(d−a+k);   const = Σ lfact(margins) − lfact(n).
    # Generated-SQL build (_lfact_sql): each _lfact is ~35 py4j round
    # trips as a Column tree and this query needs 13 of them — one
    # F.expr parse each for const/lp/lp_obs instead (measured: ~2 s of
    # build latency → ~0.3 s).  The parsed trees are token-for-token
    # the Column trees (D-suffixed double literals, explicit CAST), so
    # the doubles are bit-identical — pinned by a differential test
    const = F.expr(
        f"({_lfact_sql('__r1')} + {_lfact_sql('__r2')}"
        f" + {_lfact_sql('__c1')} + {_lfact_sql('__c2')}"
        f" - {_lfact_sql('n')})"
    )

    def _lp_sql(k: str) -> str:
        return (
            "(__const"
            f" - {_lfact_sql(k)}"
            f" - {_lfact_sql(f'(__r1 - {k})')}"
            f" - {_lfact_sql(f'(__c1 - {k})')}"
            f" - {_lfact_sql(f'(n - __r1 - __c1 + {k})')})"
        )

    kmin = F.greatest(
        F.lit(0).cast("long"),
        F.col("__r1") + F.col("__c1") - F.col("n"),
    )
    kmax = F.least(F.col("__r1"), F.col("__c1"))
    seq = F.when(
        kmax - kmin + 1 <= F.lit(int(max_terms)),
        F.sequence(kmin, kmax),
    )
    # explode_outer: over-max_terms support yields ONE null-k row so
    # the output row survives with NULL p-values (plain explode would
    # silently drop the result row entirely)
    kd = margins.withColumn("__const", const).select(
        "a", "b", "c", "d", "n", "__r1", "__c1", "__const",
        F.explode_outer(seq).alias("__k"),
    )
    kd = kd.withColumn("__lp", F.expr(_lp_sql("__k"))).withColumn(
        "__lp_obs", F.expr(_lp_sql("a"))
    )
    folded = kd.groupBy("a", "b", "c", "d", "n").agg(
        F.sum(
            F.when(
                F.round(F.col("__lp") - F.col("__lp_obs"), 6) <= 0,
                F.exp("__lp"),
            ).otherwise(F.lit(0.0))
        ).alias("__p2"),
        F.sum(
            F.when(F.col("__k") <= F.col("a"), F.exp("__lp"))
            .otherwise(F.lit(0.0))
        ).alias("__pl"),
        F.sum(
            F.when(F.col("__k") >= F.col("a"), F.exp("__lp"))
            .otherwise(F.lit(0.0))
        ).alias("__pg"),
        F.count("__k").alias("__nk"),
    )
    orat = F.try_divide(
        (F.col("a") * F.col("d")).cast("double"),
        (F.col("b") * F.col("c")).cast("double"),
    )
    # NULL p-values when the support was not enumerated (> max_terms)
    clamp = lambda c: F.when(  # noqa: E731
        F.col("__nk") > 0, F.least(F.lit(1.0), c)
    )
    return folded.select(
        "a", "b", "c", "d", "n",
        orat.alias("odds_ratio"),
        clamp(F.col("__p2")).alias("p_two"),
        clamp(F.col("__pl")).alias("p_less"),
        clamp(F.col("__pg")).alias("p_greater"),
    )


def mutual_info(df: DataFrame, a: str, b: str) -> DataFrame:
    """Mutual information between categoricals ``a`` and ``b``.

    One row: ``n, mi, h_a, h_b, nmi`` (natural log; ``nmi`` =
    MI / sqrt(H(A)·H(B)), null when either entropy is 0).

    ``MI = (S_ab − S_a − S_b)/n + ln n`` where ``S_ab = Σ c·ln c`` over
    cells and ``S_a/S_b`` the same over marginals — the cross-term
    ``Σ_cells c·ln rₐ`` collapses to ``Σ_a rₐ·ln rₐ`` because cell
    counts sum to their marginal.  So the whole statistic is one
    tagged UNION of three tiny aggregated frames plus ONE final
    aggregation: no joins, nothing driver-side.
    """
    cells = _cells(df, a, b)
    lx = lambda c: c * F.log(c)  # noqa: E731 — c·ln c, c >= 1 always
    tag = lambda frm, t: frm.select(  # noqa: E731
        F.lit(t).alias("__t"),
        F.col("__cnt").cast("double").alias("__cnt"),
    )
    marg_a = cells.groupBy(a).agg(F.sum("__cnt").alias("__cnt"))
    marg_b = cells.groupBy(b).agg(F.sum("__cnt").alias("__cnt"))
    melted = (
        tag(cells, "ab")
        .unionByName(tag(marg_a, "a"))
        .unionByName(tag(marg_b, "b"))
    )
    is_t = lambda t: F.when(  # noqa: E731
        F.col("__t") == t, F.col("__cnt")
    )
    agg = melted.agg(
        F.sum(is_t("ab")).cast("long").alias("n"),
        F.sum(lx(is_t("ab"))).alias("__sab"),
        F.sum(lx(is_t("a"))).alias("__sa"),
        F.sum(lx(is_t("b"))).alias("__sb"),
    )
    n = F.col("n").cast("double")
    out = agg.select(
        "n",
        (
            (F.col("__sab") - F.col("__sa") - F.col("__sb")) / n
            + F.log(n)
        ).alias("mi"),
        (F.log(n) - F.col("__sa") / n).alias("h_a"),
        (F.log(n) - F.col("__sb") / n).alias("h_b"),
    )
    denom = F.sqrt(F.col("h_a") * F.col("h_b"))
    return out.withColumn(
        "nmi",
        F.when(denom > 0, F.col("mi") / denom),
    )


def anova_f(
    df: DataFrame,
    value: str,
    by: Union[str, Sequence[str]],
) -> DataFrame:
    """One-way ANOVA across the groups of ``by``.

    One row: ``k, n, ss_between, ss_within, df_between, df_within,
    f_stat`` — does the group mean of ``value`` differ across groups
    more than within-group variance explains?  Null values drop (they
    have no group-mean contribution).

    Two aggregations: per-group (n, mean, var_samp) — one data shuffle
    with partial combine — then the grand decomposition over the k-row
    group frame: ``SSW = Σ (n_g−1)·s²_g`` (Spark's var_samp is a
    numerically stable pairwise merge — the raw Σy² − (Σy)²/n form
    cancels catastrophically when |ȳ| ≫ s, which is exactly the 100 TB
    money-column case) and ``SSB = Σ n_g·ȳ_g² − n·ȳ², clamped ≥ 0``.
    """
    keys = _by(by)
    yc = F.col(value).cast("double")
    grp = df.where(yc.isNotNull()).groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("ng"),
        F.avg(yc).alias("m"),
        F.var_samp(yc).alias("v"),
    )
    tot = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum(F.col("ng") * F.col("m")).alias("__sy"),
        F.sum(F.col("ng") * F.col("m") ** 2).alias("__smm"),
        F.sum(
            (F.col("ng") - 1) * F.coalesce(F.col("v"), F.lit(0.0))
        ).alias("__ssw"),
    )
    nD = F.col("n").cast("double")
    out = tot.select(
        "k", "n",
        F.greatest(
            F.lit(0.0), F.col("__smm") - F.col("__sy") ** 2 / nD
        ).alias("ss_between"),
        F.col("__ssw").alias("ss_within"),
        (F.col("k") - 1).alias("df_between"),
        (F.col("n") - F.col("k")).alias("df_within"),
    )
    return out.withColumn(
        "f_stat",
        F.when(
            (F.col("df_between") > 0)
            & (F.col("df_within") > 0)
            & (F.col("ss_within") > 0),
            (F.col("ss_between") / F.col("df_between"))
            / (F.col("ss_within") / F.col("df_within")),
        ),
    )


def fdr_bh(
    df: DataFrame,
    p_col: str,
    *,
    by: Union[str, Sequence[str], None] = None,
    alpha: float = 0.05,
    method: str = "bh",
) -> DataFrame:
    """Benjamini-Hochberg (or Benjamini-Yekutieli) FDR adjustment over
    a frame of test results.

    Appends ``q_value`` (the BH-adjusted p: ``min_{j>=rank}
    p_(j)·m/j``, clamped to 1) and ``rejected`` (``q <= alpha``) to
    every input row.  ``method="by"`` multiplies by the harmonic
    factor ``c(m) = Σ_{i<=m} 1/i`` — Benjamini-Yekutieli, valid under
    ARBITRARY dependence between the tests (BH assumes independence
    or positive regression dependence).  ``m`` counts non-null
    p-values per ``by`` group; null p-values pass through with null
    ``q_value``/``rejected``.  Run it on a SCREEN-RESULTS frame (one
    row per test) — multiple comparisons are a result-grain problem,
    so the windows here order a frame bounded by the number of tests,
    not by data.

    Tied p-values receive identical q-values (the running min from the
    largest rank makes the adjustment order-free within a tie), so no
    tiebreak column is needed for correctness.
    """
    from pyspark.sql import Window

    if method not in ("bh", "by"):
        raise ValueError(f"method must be 'bh' or 'by', got {method!r}")
    keys = _by(by)
    pb = [F.col(k) for k in keys]
    p = F.col(p_col).cast("double")
    w_rank = Window.partitionBy(*pb).orderBy(p.asc_nulls_last())
    w_full = Window.partitionBy(*pb).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = df.withColumn("__r", F.row_number().over(w_rank)).withColumn(
        "__m", F.count(p).over(w_full)
    )
    # BY's c(m) = H_m as a running 1/rank sum over the non-null rows
    # of the same result-grain window (1.0 for BH)
    if method == "by":
        w_h = Window.partitionBy(*pb).orderBy(
            F.col("__r").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        cm = F.sum(
            F.when(p.isNotNull(), 1.0 / F.col("__r").cast("double"))
        ).over(w_h)
    else:
        cm = F.lit(1.0)
    raw = F.when(
        p.isNotNull(),
        p * cm * F.col("__m") / F.col("__r").cast("double"),
    )
    # running min of raw from the LARGEST p down to the current row
    w_tail = (
        Window.partitionBy(*pb)
        .orderBy(p.desc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    q = F.least(F.min(raw).over(w_tail), F.lit(1.0))
    return (
        ranked.withColumn("q_value", F.when(p.isNotNull(), q))
        .withColumn(
            "rejected",
            F.when(
                p.isNotNull(), F.col("q_value") <= F.lit(float(alpha))
            ),
        )
        .drop("__r", "__m")
    )


def _hash_u_sql(key_sql: str, suffix: str) -> str:
    """SQL text of the uniform draw
    ``(portable_hash28(key ∥ suffix) + 0.5) / 2^28`` — operation-for-
    operation the Column tree it replaces (md5 → first 7 hex digits →
    base-16 long → double), so values are bit-identical.

    The suffix literal is rendered for the ACTIVE parser mode: with
    backslash escapes on (default) it uses the checks-lane escape
    table (backslash, quote, control chars); under
    ``spark.sql.parser.escapedStringLiterals=true`` backslashes are
    literal and only quotes need doubling.  Quote-only doubling under
    the default parser silently corrupted salts containing ``\\``
    (and a trailing ``\\`` threw ParseException)."""
    from pandera_spark.checks import (
        _SQL_STR_ESCAPES,
        _backslash_escapes_active,
    )

    if _backslash_escapes_active():
        esc = "".join(_SQL_STR_ESCAPES.get(ch, ch) for ch in suffix)
    else:
        esc = suffix.replace("'", "''")
    return (
        f"(CAST(CAST(conv(substring(md5(concat({key_sql}, '{esc}')), 1, 7), "
        f"16, 10) AS BIGINT) AS DOUBLE) + 0.5D) / 268435456.0D"
    )


def _poisson_weight_sql(
    key_sql: str, suffix: str, thresholds: "list[float]"
) -> str:
    """SQL text of the Poisson(1) inverse-CDF weight: the number of
    CDF thresholds strictly below the hash draw."""
    u = _hash_u_sql(key_sql, suffix)
    terms = " + ".join(
        f"CAST(({u}) > {t!r}D AS INT)" for t in thresholds
    )
    return f"({terms})"


def bootstrap_ci_mean(
    df: DataFrame,
    col: str,
    key_col: str,
    *,
    n_boot: int = 64,
    alpha: float = 0.05,
    salt: str = "",
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the mean of
    ``col`` — deterministic, single-pass, engine-replayable.

    The classic obstacle to bootstrapping 100 TB is resampling: B
    shuffles of the data are a non-starter.  The Poisson bootstrap
    (Chamandy et al. 2012, "Estimating uncertainty for massive data
    streams") replaces each replicate's multinomial resample with an
    independent Poisson(1) weight per row — and here the weight is a
    PURE FUNCTION of ``portable_hash28(key ∥ replicate ∥ salt)``
    pushed through the Poisson inverse CDF, so there is no RNG, no
    extra pass, and an external SQL engine reproduces every replicate
    bit for bit.  All ``n_boot`` replicate means come out of ONE
    aggregation (2B conditional sums, map-side combined).

    One row: ``n, mean, ci_lo, ci_hi, se_boot`` — percentile CI at
    order statistics ``ceil(B·α/2)`` / ``ceil(B·(1−α/2))`` of the
    sorted replicate means, and the replicate standard deviation.
    Null values are excluded; ``key_col`` must identify rows (the
    hash input — duplicated keys correlate their weights).
    """
    import math as _math

    from .dedup import _ensure_parallelism

    if n_boot < 8:
        raise ValueError(f"n_boot must be >= 8, got {n_boot}")
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    # Poisson(1) inverse-CDF thresholds: t_k = P(X <= k); weight =
    # #{k: u > t_k}.  13 terms leave < 1e-13 tail mass.
    acc, thresholds = 0.0, []
    for k in range(13):
        acc += _math.exp(-1.0) / _math.factorial(k)
        thresholds.append(acc)
    x = F.col(col).cast("double")
    sub = _ensure_parallelism(
        df.where(x.isNotNull()).select(
            x.alias("__x"), F.col(key_col).cast("string").alias("__k")
        )
    )
    # one weight COLUMN per replicate (projection), then plain sums over
    # the projected columns: each per-row md5 + 13-way inverse-CDF chain
    # appears once in the plan instead of twice (inside sum(w*x) AND
    # sum(w)) — halves the plan text; the partial aggregation is
    # unchanged.  The repartition above matters more: the 2B conditional
    # sums are the expensive per-row compute of this operator, and a
    # small-file scan otherwise runs them in a single task.  Each weight
    # expression is generated as SQL and parsed in ONE py4j call (vs
    # ~60 Column-construction round trips per replicate); operations
    # and literals are identical, so values are bit-identical — the
    # DuckDB oracle replays every replicate digit for digit.
    wcols = [
        F.expr(
            _poisson_weight_sql("`__k`", f":{r}{salt}", thresholds)
        ).alias(f"__wc_{r}")
        for r in range(n_boot)
    ]
    # 2B+2 aggregates and the replicate-mean array as generated SQL —
    # the Column loop here was ~1k py4j round trips per build; parsed
    # trees are operation-for-operation identical (bit-identical
    # values, pinned by the differential test)
    agg_exprs = [
        "CAST(count(1) AS BIGINT) AS n",
        "avg(__x) AS mean",
    ]
    for r in range(n_boot):
        agg_exprs.append(f"sum(__wc_{r} * __x) AS __s_{r}")
        agg_exprs.append(f"CAST(sum(__wc_{r}) AS DOUBLE) AS __w_{r}")
    wide = sub.select("*", *wcols).selectExpr(*agg_exprs)
    reps = F.expr(
        "array("
        + ", ".join(
            f"try_divide(__s_{r}, __w_{r})" for r in range(n_boot)
        )
        + ")"
    )
    k_lo = max(1, _math.ceil(n_boot * (alpha / 2.0)))
    k_hi = min(n_boot, _math.ceil(n_boot * (1.0 - alpha / 2.0)))
    srt = F.sort_array(reps)
    s1 = F.aggregate(
        reps, F.lit(0.0), lambda a, b: a + F.coalesce(b, F.lit(0.0))
    )
    s2 = F.aggregate(
        reps,
        F.lit(0.0),
        lambda a, b: a + F.coalesce(b * b, F.lit(0.0)),
    )
    bn = float(n_boot)
    return wide.select(
        "n",
        "mean",
        F.element_at(srt, k_lo).alias("ci_lo"),
        F.element_at(srt, k_hi).alias("ci_hi"),
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                (s2 - s1 * s1 / bn) / F.lit(bn - 1.0),
            )
        ).alias("se_boot"),
    )


def mcnemar_test(
    df: DataFrame,
    rater_a: "C",
    rater_b: "C",
    *,
    correction: bool = True,
) -> DataFrame:
    """McNemar's test for PAIRED binary labelings (same rows labeled
    twice — before/after a model change, two filter versions): did the
    flip rates differ, ignoring the cases both agree on?

    ``rater_a``/``rater_b`` are boolean Columns.  One row:
    ``n, b, c, chi2, pvalue`` with ``b`` = a-only positives, ``c`` =
    b-only positives, ``chi2 = (|b−c| − 1)²/(b+c)`` (Edwards
    continuity correction; ``correction=False`` drops the −1) and a
    χ²(1) p-value.  Null on either side drops the pair.  ONE
    conditional-aggregate scan.
    """
    a = rater_a.cast("boolean")
    b = rater_b.cast("boolean")
    base = df.where(a.isNotNull() & b.isNotNull())
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((a & ~b).cast("long")).alias("b"),
        F.sum((~a & b).cast("long")).alias("c"),
    )
    bb, cc = F.col("b").cast("double"), F.col("c").cast("double")
    num = F.abs(bb - cc) - (F.lit(1.0) if correction else F.lit(0.0))
    num = F.greatest(num, F.lit(0.0))
    chi2 = F.when(bb + cc > 0, num * num / (bb + cc))
    from .drift import _norm_sf

    # chi2(1) sf(x) = 2 * norm_sf(sqrt(x))
    p = F.when(chi2.isNotNull(), 2.0 * _norm_sf(F.sqrt(chi2)))
    return agg.select("n", "b", "c", chi2.alias("chi2"),
                      p.alias("pvalue"))


def cmh_test(
    df: DataFrame,
    exposure: "C",
    outcome: "C",
    stratum_col: str,
) -> DataFrame:
    """Cochran-Mantel-Haenszel test + pooled odds ratio for a 2×2
    association ACROSS strata — the Simpson's-paradox guard: a
    per-source/per-segment confounder can reverse a naive pooled 2×2;
    CMH tests the common association with each stratum contributing
    its own margins.

    ``exposure``/``outcome`` are boolean Columns.  One row:
    ``n, n_strata, chi2, pvalue, or_mh`` where
    ``chi2 = (|Σ(a_k − E_k)| − ½)² / ΣV_k`` (continuity-corrected,
    1 dof; ``E_k``/``V_k`` the per-stratum hypergeometric moments)
    and ``or_mh = Σ(a_k·d_k/n_k) / Σ(b_k·c_k/n_k)`` (Mantel-Haenszel
    pooled odds ratio).  Zero-margin strata contribute nothing
    (their V is 0), matching the classical treatment.

    Plan: ONE shuffle to the stratum grain (four conditional counts
    per stratum), then a tiny closing aggregate.
    """
    e = exposure.cast("boolean")
    o = outcome.cast("boolean")
    base = df.where(
        e.isNotNull() & o.isNotNull()
        & F.col(stratum_col).isNotNull()
    )
    cells = base.groupBy(F.col(stratum_col).alias("__s")).agg(
        F.sum((e & o).cast("long")).cast("double").alias("a"),
        F.sum((e & ~o).cast("long")).cast("double").alias("b"),
        F.sum((~e & o).cast("long")).cast("double").alias("c"),
        F.sum((~e & ~o).cast("long")).cast("double").alias("d"),
    )
    n_k = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    r1 = F.col("a") + F.col("b")   # exposed margin
    c1 = F.col("a") + F.col("c")   # outcome margin
    e_k = F.when(n_k > 0, r1 * c1 / n_k).otherwise(F.lit(0.0))
    v_k = F.when(
        n_k > 1,
        r1 * (n_k - r1) * c1 * (n_k - c1) / (n_k * n_k * (n_k - 1)),
    ).otherwise(F.lit(0.0))
    agg = cells.agg(
        F.sum(n_k).cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum(F.col("a") - e_k).alias("__num"),
        F.sum(v_k).alias("__var"),
        F.sum(F.when(n_k > 0, F.col("a") * F.col("d") / n_k)
              .otherwise(F.lit(0.0))).alias("__or_num"),
        F.sum(F.when(n_k > 0, F.col("b") * F.col("c") / n_k)
              .otherwise(F.lit(0.0))).alias("__or_den"),
    )
    num = F.greatest(F.abs(F.col("__num")) - 0.5, F.lit(0.0))
    chi2 = F.when(F.col("__var") > 0, num * num / F.col("__var"))
    from .drift import _norm_sf

    p = F.when(chi2.isNotNull(), 2.0 * _norm_sf(F.sqrt(chi2)))
    return agg.select(
        "n", "n_strata",
        chi2.alias("chi2"),
        p.alias("pvalue"),
        F.try_divide(F.col("__or_num"), F.col("__or_den"))
        .alias("or_mh"),
    )


def cochran_q(
    df: DataFrame,
    item_col: str,
    treatments: "Sequence[C]",
) -> DataFrame:
    """Cochran's Q test for k PAIRED binary treatments of the same
    items (k filter versions / k model variants flagging the same
    corpus): did the positive rates differ, accounting for the
    pairing?  Generalizes :func:`mcnemar_test` beyond k = 2.

    ``Q = k(k−1)·Σ_j(G_j − Ḡ)² / (k·ΣL_i − ΣL_i²)`` with ``G_j`` the
    j-th treatment's positive total and ``L_i`` the i-th item's
    positive count; Q ~ χ²(k−1) under H₀.  One row:
    ``n_items, k, q_stat, dof, pvalue`` (null when the denominator is
    0 — all items all-positive or all-negative).  Rows with any null
    treatment value drop (pairing requires complete rows); items with
    multiple rows aggregate by OR per treatment first.

    Plan shape: ONE shuffle to the item grain carrying k OR-flags,
    then a single closing aggregate of the k totals + the L moments.
    """
    treatments = list(treatments)
    k = len(treatments)
    if k < 2:
        raise ValueError("need at least 2 treatments")
    cond = F.col(item_col).isNotNull()
    flags = []
    for i, t in enumerate(treatments):
        tb = t.cast("boolean")
        cond = cond & tb.isNotNull()
        flags.append(F.max(tb.cast("int")).alias(f"__f_{i}"))
    items = (
        df.where(cond)
        .groupBy(F.col(item_col).alias("__i"))
        .agg(*flags)
    )
    l_i = None
    for i in range(k):
        c = F.col(f"__f_{i}")
        l_i = c if l_i is None else (l_i + c)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(l_i.cast("double")).alias("__sl"),
        F.sum((l_i * l_i).cast("double")).alias("__sl2"),
    ]
    for i in range(k):
        aggs.append(
            F.sum(F.col(f"__f_{i}").cast("double")).alias(f"__g_{i}")
        )
    agg = items.agg(*aggs)
    gbar = F.col("__sl") / F.lit(float(k))
    num = None
    for i in range(k):
        d = F.col(f"__g_{i}") - gbar
        term = d * d
        num = term if num is None else (num + term)
    den = F.lit(float(k)) * F.col("__sl") - F.col("__sl2")
    q = F.when(
        den > 0, F.lit(float(k * (k - 1))) * num / den
    )
    p = F.when(q.isNotNull(), _chi2_sf_stats(q, k - 1))
    return agg.select(
        "n_items",
        F.lit(k).alias("k"),
        q.alias("q_stat"),
        F.lit(k - 1).cast("long").alias("dof"),
        p.alias("pvalue"),
    )


def _chi2_sf_stats(x: "C", dof: int) -> "C":
    """Chi-square survival function: exact normal identity at dof 1
    (matching :func:`mcnemar_test`), the shared Wilson-Hilferty form
    (``ranks._chi2_sf``) above."""
    from .drift import _norm_sf
    from .ranks import _chi2_sf

    if dof == 1:
        return 2.0 * _norm_sf(F.sqrt(x))
    return _chi2_sf(x, F.lit(float(dof)))


def brown_forsythe(
    df: DataFrame,
    value: str,
    by: Union[str, Sequence[str]],
) -> DataFrame:
    """Brown-Forsythe test of variance homogeneity across the groups
    of ``by`` (the robust Levene variant: spreads are measured as
    ``|x − group median|``, so heavy tails don't masquerade as
    unequal variances the way they do with mean-centered Levene).

    Returns the :func:`anova_f` frame computed over the absolute
    deviations: ``k, n, ss_between, ss_within, df_between, df_within,
    f_stat`` — a large F means group spreads differ.  Run it before
    trusting the equal-variance Student lane of
    ``Hypothesis.two_sample_ttest``; if it fires, use the Welch lane.

    Scale shape: pass 1 aggregates exact interpolated group medians
    (``percentile`` — distinct-value-bounded per group; pre-quantize
    truly continuous metrics as with :func:`ranks.value_midranks`);
    the k-row median frame broadcast-joins back (no data shuffle),
    and pass 2 is the one-aggregation ANOVA over ``z``.
    """
    from pyspark.sql.functions import broadcast

    keys = _by(by)
    yc = F.col(value).cast("double")
    meds = (
        df.where(yc.isNotNull())
        .groupBy(*keys)
        .agg(F.percentile(yc, F.lit(0.5)).alias("__med"))
    )
    joined = df.where(yc.isNotNull()).join(broadcast(meds), on=keys)
    z = joined.select(
        *keys, F.abs(yc - F.col("__med")).alias("__z")
    )
    return anova_f(z, "__z", keys)


def herfindahl(
    df: DataFrame,
    by: Union[str, Sequence[str]],
    weight: Optional["C"] = None,
) -> DataFrame:
    """Herfindahl-Hirschman concentration of ``weight`` (row count if
    omitted) over the groups of ``by`` — how concentrated is a corpus
    on few sources / a join on few keys / revenue on few suppliers?

    One row: ``k, total, hhi, hhi_normalized, effective_k`` where
    ``hhi = Σ share²`` (1/k ≤ hhi ≤ 1), ``hhi_normalized =
    (hhi − 1/k)/(1 − 1/k)`` (0 = uniform, 1 = single group) and
    ``effective_k = 1/hhi`` (the "equivalent number of equal groups"
    — the number that matters when sizing partitions for a skewed
    key).  Two aggregations: per-group weight sums (one shuffle with
    map-side combine, k rows out), then the closing fold over the
    k-row frame.  Negative weights raise no error but make shares
    meaningless — filter first.

    NULL weights are dropped BEFORE grouping, so ``k`` and the share
    denominators see the same group set: a group whose weights are all
    NULL contributes nothing (it has no measured mass), rather than
    inflating ``k`` while being absent from ``total``.
    """
    keys = _by(by)
    if weight is None:
        w = F.lit(1.0)
        base = df
    else:
        w = weight.cast("double")
        base = df.where(w.isNotNull())
    grp = base.groupBy(*keys).agg(F.sum(w).alias("__w"))
    agg = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__w").alias("total"),
        F.sum(F.col("__w") * F.col("__w")).alias("__w2"),
    )
    hhi = F.when(
        F.col("total") > 0, F.col("__w2") / (F.col("total") ** 2)
    )
    kD = F.col("k").cast("double")
    return agg.select(
        "k", "total",
        hhi.alias("hhi"),
        F.when(
            F.col("k") > 1, (hhi - 1.0 / kD) / (1.0 - 1.0 / kD)
        ).alias("hhi_normalized"),
        F.when(hhi > 0, 1.0 / hhi).alias("effective_k"),
    )


def randomization_test_mean(
    df: DataFrame,
    col: str,
    group_col: str,
    group_a,
    group_b,
    key_col: str,
    *,
    n_rep: int = 64,
    salt: str = "",
) -> DataFrame:
    """Monte-Carlo randomization test for the difference of means
    between two groups — deterministic and engine-replayable, like
    :func:`bootstrap_ci_mean`.

    Each replicate relabels every row to pseudo-group A with
    probability ``n_a/(n_a+n_b)`` using the PURE hash
    ``portable_hash28(key ∥ replicate ∥ salt)`` — no RNG, no shuffle
    of labels — and recomputes the mean difference.  Under H0
    (exchangeability) the observed difference should look typical
    among relabeled ones; the reported p is the standard add-one
    Monte-Carlo estimate ``(1 + #{|T_r| ≥ |T_obs|}) / (R + 1)``.

    One row: ``n_a, n_b, obs_diff, n_extreme, pvalue``.  Cost is one
    count scan (to fix the relabel probability) plus ONE aggregation
    of ``2R`` conditional sums (map-side combined) — replicates never
    shuffle rows.  This is the scalable substitute for an exact
    permutation test, whose B label shuffles are a non-starter at
    100 TB.
    """
    if n_rep < 8:
        raise ValueError(f"n_rep must be >= 8, got {n_rep}")
    x = F.col(col).cast("double")
    g = F.col(group_col)
    # parallelism floor: the 2R conditional md5 sums below are the
    # heavy per-row compute; a small-file scan would run them in one
    # task (no-op when the scan already has >= defaultParallelism
    # partitions — the 100 TB case)
    from .dedup import _ensure_parallelism

    sub = _ensure_parallelism(
        df.where(
            x.isNotNull() & g.isin([group_a, group_b])
        ).select(
            x.alias("__x"),
            (g == F.lit(group_a)).alias("__a"),
            F.col(key_col).cast("string").alias("__k"),
        )
    )
    counts = sub.groupBy().agg(
        F.sum(F.col("__a").cast("long")).alias("na"),
        F.sum((~F.col("__a")).cast("long")).alias("nb"),
    ).first()
    n_a, n_b = int(counts["na"] or 0), int(counts["nb"] or 0)
    if n_a == 0 or n_b == 0:
        raise ValueError(
            f"both groups need rows: n_a={n_a}, n_b={n_b}"
        )
    p_a = n_a / float(n_a + n_b)
    # one indicator column per replicate, then plain sums: each per-row
    # md5 appears once in the plan instead of twice (same rewrite as
    # bootstrap_ci_mean — halves plan text, partial aggregation
    # unchanged).  EVERYTHING below the probe is generated SQL: the
    # indicator projection, the 2R+3 aggregates, and the replicate
    # extreme-count fold were ~10k py4j round trips as Column builds
    # (~2 s of driver latency per call, measured) and are a handful of
    # selectExpr parses now.  The parsed trees are operation-for-
    # operation the Column trees they replace (same literals via exact
    # repr, same operand order), so every value is bit-identical — the
    # oracle still replays the replicates digit for digit.
    ics = [
        f"CAST(({_hash_u_sql('`__k`', f':{r}{salt}')}) "
        f"< {p_a!r}D AS INT) AS __ic_{r}"
        for r in range(n_rep)
    ]
    projected = sub.selectExpr("*", *ics)
    agg_exprs = [
        "sum(__x) AS __s",
        "CAST(count(1) AS DOUBLE) AS __c",
        "sum(CASE WHEN __a THEN __x END) AS __sa",
    ]
    for r in range(n_rep):
        agg_exprs.append(f"sum(__ic_{r} * __x) AS __s_{r}")
        agg_exprs.append(f"CAST(sum(__ic_{r}) AS DOUBLE) AS __c_{r}")
    wide = projected.selectExpr(*agg_exprs)
    ca = f"{float(n_a)!r}D"
    # observed difference named once so the R extreme comparisons
    # reference a column instead of duplicating the tree R times
    obs = wide.selectExpr(
        "*",
        f"(__sa / {ca} - (__s - __sa) / (__c - {ca})) AS __obs",
    )

    def rep_ext(r: int) -> str:
        # CASE WHEN mirrors when(...)/otherwise(0): a replicate with an
        # empty pseudo-group yields NULL inside abs() and the NULL
        # comparison falls through to 0, exactly like the Column build
        d = (
            f"CASE WHEN ((__c_{r} > 0) AND ((__c - __c_{r}) > 0)) "
            f"THEN __s_{r} / __c_{r} - (__s - __s_{r}) / (__c - __c_{r}) "
            f"END"
        )
        return f"(CASE WHEN abs({d}) >= abs(__obs) THEN 1 ELSE 0 END)"

    ext = obs.selectExpr(
        "*",
        "(" + " + ".join(rep_ext(r) for r in range(n_rep)) + ") AS __ext",
    )
    return ext.selectExpr(
        f"CAST({n_a}L AS BIGINT) AS n_a",
        f"CAST({n_b}L AS BIGINT) AS n_b",
        "__obs AS obs_diff",
        "CAST(__ext AS BIGINT) AS n_extreme",
        f"(CAST(__ext AS DOUBLE) + 1.0D) / {float(n_rep + 1)!r}D AS pvalue",
    )

def median_test(
    df: DataFrame,
    value: str,
    by: Union[str, Sequence[str]],
) -> DataFrame:
    """Mood's median test: do the groups of ``by`` share a common
    median?  The coarsest and most assumption-free of the k-group
    location screens — it reduces every value to "above the pooled
    median or not", so it survives heteroscedastic shapes that
    mislead rank-sum tests (use :func:`ranks.kruskal_wallis` when the
    distributions are shift-alike and you want power; use this when
    they aren't).

    One row: ``k, n, n_above, chi2_stat, dof, pvalue`` — the Pearson
    χ²(k−1) over the 2×k (above / not-above) contingency via the
    margin-collapsed identity ``χ² = N·(N·S − A²) / (A·(N−A))`` with
    ``S = Σ_g a_g²/n_g`` (so no expected-count join is ever needed);
    ties with the median count as "not above" (scipy's
    ``ties='below'`` convention); p via the shared Wilson-Hilferty
    replay.

    Two data passes in ONE action: the exact pooled median (one
    ``percentile`` aggregation — distinct-value-bounded; pre-quantize
    truly continuous metrics) joins back as a broadcast 1-row frame
    into ONE conditional aggregation producing the k-row (n_g, a_g)
    frame, whose closing fold is a k-row aggregate.  Every statistic
    input is a count, so an external SQL engine replays the
    contingency exactly.  All-null/empty input yields an EMPTY result
    frame.
    """
    from .drift import _norm_sf
    from .ranks import _chi2_sf

    keys = _by(by)
    yc = F.col(value).cast("double")
    # in-plan pooled median (the conformal fold): the 1-row median
    # frame rides back in as a broadcast instead of a driver .first()
    # probe — one job at action time instead of two.  The former
    # build-time ValueError on all-null input becomes an EMPTY result
    # frame (the closing k > 0 filter below); the comparison value is
    # the identical percentile double either way.
    medf = df.where(yc.isNotNull()).agg(
        F.percentile(yc, F.lit(0.5)).alias("__med")
    )
    grp = (
        df.where(yc.isNotNull())
        .crossJoin(F.broadcast(medf))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.sum((yc > F.col("__med")).cast("long"))
            .cast("double")
            .alias("__a"),
        )
    )
    tot = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__n").alias("__tn"),
        F.sum("__a").alias("__ta"),
        F.sum(F.col("__a") ** 2 / F.col("__n")).alias("__s"),
    )
    nD, aD = F.col("__tn"), F.col("__ta")
    chi2 = F.when(
        (aD > 0) & (aD < nD) & (F.col("k") > 1),
        nD * (nD * F.col("__s") - aD * aD) / (aD * (nD - aD)),
    )
    out = tot.where(F.col("k") > 0).select(
        "k",
        nD.cast("long").alias("n"),
        aD.cast("long").alias("n_above"),
        F.greatest(F.lit(0.0), chi2).alias("chi2_stat"),
        (F.col("k") - 1).cast("long").alias("dof"),
    )
    # dof == 1 (two groups) uses the exact χ²₁ = Z² identity instead of
    # Wilson-Hilferty, matching _chi2_sf_stats's dispatch for every
    # other chi-square test in this module
    return out.withColumn(
        "pvalue",
        F.when(
            F.col("chi2_stat").isNotNull() & (F.col("dof") == 1),
            2.0 * _norm_sf(F.sqrt(F.col("chi2_stat"))),
        ).when(
            F.col("chi2_stat").isNotNull() & (F.col("dof") > 1),
            _chi2_sf(F.col("chi2_stat"), F.col("dof").cast("double")),
        ),
    )

