"""A/B experiment readouts: two-proportion z-test and CUPED variance
reduction — the two statistics every event-pipeline experimentation
readout needs, as closed-form single-aggregation operators.

Both are ONE global aggregation built from conditional aggregates
(``sum(when(variant == a, ...))``), so there is no per-group shuffle at
all — the whole readout is a map-side-combined scan, the cheapest
possible plan at any scale.  Both are deterministic and exactly
replayable in ANSI SQL (normal p-values via the shared Abramowitz-
Stegun polynomial, as ``drift._norm_sf``).

CUPED (Deng et al. 2013, "Improving the sensitivity of online
controlled experiments by utilizing pre-experiment data"):
``y_adj = y − θ·(x − x̄)`` with ``θ = cov(y, x)/var(x)`` computed on
the pooled sample; the adjusted treatment effect keeps the same
expectation while the variance shrinks by the factor ``1 − ρ²``.  The
covariate must be PRE-experiment (unaffected by treatment) — that is a
design contract, not something the math can check.

Reference parity: none (pandera validates frames; it has no
experimentation tier); beyond-reference analytics next to
``operators/stats.py``.
"""

from __future__ import annotations

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .drift import _norm_sf

__all__ = [
    "proportion_ztest",
    "cuped_adjust",
    "ratio_metric_ztest",
    "did_ztest",
    "ipw_ate",
    "effect_size",
    "srm_check",
    "tost_equivalence",
]


def _is(group_col: str, level) -> C:
    return F.col(group_col) == F.lit(level)


def proportion_ztest(
    df: DataFrame,
    group_col: str,
    group_a,
    group_b,
    success: C,
) -> DataFrame:
    """Two-proportion z-test of ``P(success | a)`` vs ``P(success | b)``.

    ``success`` is any boolean Column (e.g. ``F.col("event_type") ==
    "purchase"``); null successes count as false.  One row:
    ``n_a, n_b, conv_a, conv_b, p_a, p_b, lift, z, pvalue`` — pooled
    standard error, two-sided normal p.  ``z``/``pvalue`` are null
    when a group is empty or the pooled proportion is degenerate
    (0 or 1 → zero variance).
    """
    sa, sb = _is(group_col, group_a), _is(group_col, group_b)
    win = F.coalesce(success.cast("boolean"), F.lit(False))
    agg = df.agg(
        F.sum(sa.cast("long")).alias("n_a"),
        F.sum(sb.cast("long")).alias("n_b"),
        F.sum((sa & win).cast("long")).alias("conv_a"),
        F.sum((sb & win).cast("long")).alias("conv_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    pa = F.try_divide(F.col("conv_a").cast("double"), na)
    pb = F.try_divide(F.col("conv_b").cast("double"), nb)
    pool = F.try_divide(
        (F.col("conv_a") + F.col("conv_b")).cast("double"), na + nb
    )
    inv = F.try_divide(F.lit(1.0), na) + F.try_divide(F.lit(1.0), nb)
    se = F.sqrt(pool * (1 - pool) * inv)
    z = F.try_divide(pa - pb, se)
    return agg.select(
        "n_a", "n_b", "conv_a", "conv_b",
        pa.alias("p_a"),
        pb.alias("p_b"),
        (pa - pb).alias("lift"),
        z.alias("z"),
        (2.0 * _norm_sf(F.abs(z))).alias("pvalue"),
    )


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """CUPED-adjusted difference in means of ``metric_col`` between
    variants, using pre-experiment ``covariate_col``.

    One row: ``n_a, n_b, theta, rho, var_reduction, mean_a, mean_b,
    diff, adj_mean_a, adj_mean_b, adj_diff, z, pvalue`` where

    - ``theta = cov(y, x) / var(x)`` and ``rho = corr(y, x)`` on the
      pooled (both-variant, pairwise-complete) sample;
    - ``adj_mean_g = mean_g(y) − theta·(mean_g(x) − x̄_pooled)``;
    - ``var_reduction = ρ²`` (the fraction of metric variance the
      covariate removes);
    - ``z`` uses the pooled adjusted variance
      ``var(y)·(1 − ρ²)·(1/n_a + 1/n_b)`` — the standard large-sample
      CUPED readout (per-variant variances differ only at higher
      order).

    Rows with a null metric or covariate are excluded (θ must be fit
    and applied on the same sample or the adjustment biases).
    """
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    sub = df.where(
        y.isNotNull() & x.isNotNull()
        & F.col(group_col).isin([group_a, group_b])
    )
    sa, sb = _is(group_col, group_a), _is(group_col, group_b)
    agg = sub.agg(
        F.sum(sa.cast("long")).alias("n_a"),
        F.sum(sb.cast("long")).alias("n_b"),
        F.sum(F.when(sa, y)).alias("sy_a"),
        F.sum(F.when(sb, y)).alias("sy_b"),
        F.sum(F.when(sa, x)).alias("sx_a"),
        F.sum(F.when(sb, x)).alias("sx_b"),
        F.covar_samp(y, x).alias("cov"),
        F.var_samp(x).alias("vx"),
        F.var_samp(y).alias("vy"),
        F.avg(x).alias("x_bar"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    theta = F.try_divide(F.col("cov"), F.col("vx"))
    rho = F.try_divide(
        F.col("cov"), F.sqrt(F.col("vx") * F.col("vy"))
    )
    mean_a = F.try_divide(F.col("sy_a"), na)
    mean_b = F.try_divide(F.col("sy_b"), nb)
    adj_a = mean_a - theta * (F.try_divide(F.col("sx_a"), na) - F.col("x_bar"))
    adj_b = mean_b - theta * (F.try_divide(F.col("sx_b"), nb) - F.col("x_bar"))
    var_adj = F.col("vy") * (1 - rho * rho)
    inv = F.try_divide(F.lit(1.0), na) + F.try_divide(F.lit(1.0), nb)
    z = F.try_divide(adj_a - adj_b, F.sqrt(var_adj * inv))
    return agg.select(
        "n_a", "n_b",
        theta.alias("theta"),
        rho.alias("rho"),
        (rho * rho).alias("var_reduction"),
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        (mean_a - mean_b).alias("diff"),
        adj_a.alias("adj_mean_a"),
        adj_b.alias("adj_mean_b"),
        (adj_a - adj_b).alias("adj_diff"),
        z.alias("z"),
        (2.0 * _norm_sf(F.abs(z))).alias("pvalue"),
    )


def ratio_metric_ztest(
    df: DataFrame,
    group_col: str,
    group_a,
    group_b,
    num: C,
    den: C,
    unit_col: str,
) -> DataFrame:
    """Delta-method z-test for a RATIO metric ``Σnum/Σden`` between two
    variants, with variance at the randomization-unit grain.

    The estimand is a ratio of sums (revenue per session, clicks per
    user, ...), whose naive per-row variance is wrong whenever rows
    cluster within units (they always do).  The standard fix (Deng et
    al.) treats the per-unit sums ``(Nᵤ, Dᵤ)`` as the iid sample and
    delta-expands ``R = N̄/D̄``:

    ``Var(R) ≈ (var(N) − 2R·cov(N, D) + R²·var(D)) / (k·D̄²)``

    with ``k`` units and sample (co)variances.  One row:
    ``k_a, k_b, ratio_a, ratio_b, diff, se, z, pvalue`` (two-sided
    normal).  ``z``/``pvalue``/``se`` are null when a variant has
    fewer than 2 units or a zero denominator mean.

    Plan shape: ONE shuffle on ``(group, unit)`` for the unit sums
    (map-side combined), then a conditional aggregate over the
    unit-grain frame — never a per-variant pass.  Null ``num``/``den``
    values count as 0; rows with a null unit or a group outside
    {a, b} drop.
    """
    gc = F.col(group_col)
    units = (
        df.where(
            F.col(unit_col).isNotNull()
            & ((gc == F.lit(group_a)) | (gc == F.lit(group_b)))
        )
        .groupBy(gc.alias("__g"), F.col(unit_col).alias("__u"))
        .agg(
            F.sum(F.coalesce(num.cast("double"), F.lit(0.0)))
            .alias("__n"),
            F.sum(F.coalesce(den.cast("double"), F.lit(0.0)))
            .alias("__d"),
        )
    )

    def _side(tag, level):
        cond = F.col("__g") == F.lit(level)
        n = F.when(cond, F.col("__n"))
        d = F.when(cond, F.col("__d"))
        return [
            F.count(n).cast("long").alias(f"k_{tag}"),
            F.avg(n).alias(f"mn_{tag}"),
            F.avg(d).alias(f"md_{tag}"),
            F.var_samp(n).alias(f"vn_{tag}"),
            F.var_samp(d).alias(f"vd_{tag}"),
            F.covar_samp(n, d).alias(f"cnd_{tag}"),
        ]

    agg = units.agg(*_side("a", group_a), *_side("b", group_b))

    def _ratio(tag):
        return F.try_divide(F.col(f"mn_{tag}"), F.col(f"md_{tag}"))

    def _var(tag, r):
        ok = (
            (F.col(f"k_{tag}") >= 2)
            & F.col(f"md_{tag}").isNotNull()
            & (F.col(f"md_{tag}") != 0.0)
        )
        v = (
            F.col(f"vn_{tag}")
            - 2.0 * r * F.col(f"cnd_{tag}")
            + r * r * F.col(f"vd_{tag}")
        ) / (
            F.col(f"k_{tag}").cast("double")
            * F.col(f"md_{tag}") * F.col(f"md_{tag}")
        )
        return F.when(ok, v)

    ra, rb = _ratio("a"), _ratio("b")
    out = agg.select(
        "k_a", "k_b",
        ra.alias("ratio_a"), rb.alias("ratio_b"),
        (ra - rb).alias("diff"),
        F.sqrt(_var("a", ra) + _var("b", rb)).alias("se"),
        "vn_a", "vd_a", "cnd_a", "vn_b", "vd_b", "cnd_b",
    )
    z = F.try_divide(F.col("diff"), F.col("se"))
    return out.select(
        "k_a", "k_b", "ratio_a", "ratio_b", "diff", "se",
        z.alias("z"),
        F.when(
            z.isNotNull(), 2.0 * _norm_sf(F.abs(z))
        ).alias("pvalue"),
    )


def did_ztest(
    df: DataFrame,
    group_col: str,
    group_a,
    group_b,
    period_col: str,
    pre,
    post,
    metric: C,
) -> DataFrame:
    """Difference-in-differences estimate of a treatment effect:
    ``((ā_post − ā_pre) − (b̄_post − b̄_pre))`` with the large-sample
    z from the four cell variances — the quasi-experimental readout
    when randomization wasn't possible but a control group and a
    before/after boundary exist (the parallel-trends assumption is a
    DESIGN contract, not something the math checks).

    One row: ``n_a_pre, n_a_post, n_b_pre, n_b_post, mean_a_pre,
    mean_a_post, mean_b_pre, mean_b_post, effect, se, z, pvalue``
    (two-sided normal, ``se = √Σ var_cell/n_cell``).  Null metric rows
    and rows outside the four cells drop; ``se``/``z``/``p`` are null
    when any cell has fewer than 2 rows.

    Plan shape: ONE global conditional aggregate — all four cells'
    moments in a single map-side-combined scan, no group shuffle.
    """
    m = metric.cast("double")
    ga, gb = _is(group_col, group_a), _is(group_col, group_b)
    pp = F.col(period_col)
    cells = {
        "a_pre": ga & (pp == F.lit(pre)),
        "a_post": ga & (pp == F.lit(post)),
        "b_pre": gb & (pp == F.lit(pre)),
        "b_post": gb & (pp == F.lit(post)),
    }
    aggs = []
    for tag, cond in cells.items():
        v = F.when(cond & m.isNotNull(), m)
        aggs += [
            F.count(v).cast("long").alias(f"n_{tag}"),
            F.avg(v).alias(f"mean_{tag}"),
            F.var_samp(v).alias(f"var_{tag}"),
        ]
    agg = df.agg(*aggs)
    effect = (
        (F.col("mean_a_post") - F.col("mean_a_pre"))
        - (F.col("mean_b_post") - F.col("mean_b_pre"))
    )
    ok = None
    var_sum = None
    for tag in cells:
        c_ok = F.col(f"n_{tag}") >= 2
        ok = c_ok if ok is None else (ok & c_ok)
        term = F.col(f"var_{tag}") / F.col(f"n_{tag}").cast("double")
        var_sum = term if var_sum is None else (var_sum + term)
    se = F.when(ok, F.sqrt(var_sum))
    z = F.try_divide(effect, se)
    return agg.select(
        "n_a_pre", "n_a_post", "n_b_pre", "n_b_post",
        "mean_a_pre", "mean_a_post", "mean_b_pre", "mean_b_post",
        effect.alias("effect"),
        se.alias("se"),
        z.alias("z"),
        F.when(z.isNotNull(), 2.0 * _norm_sf(F.abs(z)))
        .alias("pvalue"),
    )


def ipw_ate(
    df: DataFrame,
    treatment: C,
    outcome: C,
    xs: "list[str]",
    *,
    iters: int = 4,
    clip: float = 0.01,
) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect for an
    OBSERVATIONAL comparison: fits the propensity ``e(x) = P(t=1|x)``
    with the engine's fixed-iteration Newton logistic
    (:func:`pandera_spark.operators.regression.logistic_fit` — one
    gradient/Hessian aggregation per step, deterministic), scores it
    as a pure projection, clips to ``[clip, 1−clip]`` (overlap
    trimming), and returns one row with BOTH standard estimators:

    - ``ate_ht`` — Horvitz-Thompson: ``mean(t·y/e) − mean((1−t)·y/(1−e))``
    - ``ate_hajek`` — normalized: ``Σ(t·y/e)/Σ(t/e) − Σ((1−t)·y/(1−e))/Σ((1−t)/(1−e))``

    plus ``n, n_treated, b_x..., b0`` (the fitted propensity
    coefficients, for audit).  HT is unbiased but variance-fragile
    under extreme weights; Hájek is the practical default.  Unconfoundedness
    given ``xs`` is a DESIGN assumption, not something the math checks.

    Plan: iters+1 aggregation scans over a cached 3-column projection
    (the fit) + ONE final conditional-aggregate scan; no shuffles
    beyond map-side combines.
    """
    from .regression import logistic_fit

    if not 0 < clip < 0.5:
        raise ValueError(f"clip must be in (0, 0.5): {clip}")
    t = treatment.cast("boolean")
    y = outcome.cast("double")
    cond = t.isNotNull() & y.isNotNull()
    for c in xs:
        cond = cond & F.col(c).cast("double").isNotNull()
    base = df.where(cond).select(
        t.cast("double").alias("__t"),
        y.alias("__y"),
        *[F.col(c).cast("double").alias(f"__x{i}")
          for i, c in enumerate(xs)],
    )
    fit = logistic_fit(
        base, F.col("__t") == 1.0,
        [f"__x{i}" for i in range(len(xs))], iters=iters,
    )
    eta = F.lit(fit["beta"][-1])
    for i in range(len(xs)):
        eta = eta + F.col(f"__x{i}") * F.lit(fit["beta"][i])
    e = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    e = F.least(F.greatest(e, F.lit(clip)), F.lit(1.0 - clip))
    tt = F.col("__t")
    yy = F.col("__y")
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(tt).cast("long").alias("n_treated"),
        F.avg(tt * yy / e).alias("__ht_t"),
        F.avg((1 - tt) * yy / (1 - e)).alias("__ht_c"),
        F.sum(tt * yy / e).alias("__st"),
        F.sum(tt / e).alias("__wt"),
        F.sum((1 - tt) * yy / (1 - e)).alias("__sc"),
        F.sum((1 - tt) / (1 - e)).alias("__wc"),
    )
    cols = [
        "n", "n_treated",
        (F.col("__ht_t") - F.col("__ht_c")).alias("ate_ht"),
        (F.try_divide(F.col("__st"), F.col("__wt"))
         - F.try_divide(F.col("__sc"), F.col("__wc"))).alias("ate_hajek"),
    ]
    for i in range(len(xs)):
        cols.append(F.lit(fit["beta"][i]).alias(f"b_x{i}"))
    cols.append(F.lit(fit["beta"][-1]).alias("b0"))
    return agg.select(*cols)


def effect_size(
    df: DataFrame,
    col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Standardized effect-size readout between two groups: the
    magnitude companion to the t/z significance screens (at 100 TB
    everything is "significant"; the effect size says whether anyone
    should care).

    One row: ``n_a, n_b, mean_a, mean_b, mean_diff, pooled_sd,
    cohens_d, hedges_g, var_ratio`` where
    ``d = (m_a − m_b)/s_pooled`` with the (n−1)-weighted pooled SD,
    ``g = d·(1 − 3/(4(n_a+n_b)−9))`` (Hedges small-sample
    correction) and ``var_ratio = s²_a/s²_b`` (a quick
    equal-variance sanity read next to :func:`stats.brown_forsythe`).

    ONE conditional-aggregate scan — no group shuffle; degenerate
    inputs (a group absent or zero pooled variance) yield NULL
    effect columns, never an ANSI error.
    """
    x = F.col(col).cast("double")
    ga = _is(group_col, group_a)
    gb = _is(group_col, group_b)
    base = df.where(x.isNotNull() & (ga | gb))
    agg = base.agg(
        F.count(F.when(ga, 1)).cast("long").alias("n_a"),
        F.count(F.when(gb, 1)).cast("long").alias("n_b"),
        F.avg(F.when(ga, x)).alias("mean_a"),
        F.avg(F.when(gb, x)).alias("mean_b"),
        F.var_samp(F.when(ga, x)).alias("__va"),
        F.var_samp(F.when(gb, x)).alias("__vb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    va, vb = F.col("__va"), F.col("__vb")
    pooled = F.when(
        (na + nb > 2) & va.isNotNull() & vb.isNotNull(),
        F.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)),
    )
    d = F.when(pooled > 0, (F.col("mean_a") - F.col("mean_b")) / pooled)
    corr = 1.0 - 3.0 / (4.0 * (na + nb) - 9.0)
    return agg.select(
        "n_a", "n_b", "mean_a", "mean_b",
        (F.col("mean_a") - F.col("mean_b")).alias("mean_diff"),
        pooled.alias("pooled_sd"),
        d.alias("cohens_d"),
        (d * corr).alias("hedges_g"),
        F.when(vb > 0, va / vb).alias("var_ratio"),
    )


def srm_check(
    df: DataFrame,
    group_col: str,
    expected: "dict[object, float]",
) -> DataFrame:
    """Sample-ratio-mismatch check: are the assignment counts of
    ``group_col`` consistent with the ``expected`` allocation weights?
    The first gate of every experiment readout — a significant SRM
    means the randomization (or logging) is broken and every downstream
    metric is untrustworthy, so run this BEFORE the t/z rows.

    ``expected`` maps group level → weight (weights are normalized, so
    ``{"a": 1, "b": 1}`` means 50/50).  Levels not in ``expected`` are
    ignored (document why, or they hide bugs).  One row:
    ``k, n, chi2_stat, dof, pvalue, max_share_dev`` — Pearson χ²
    goodness-of-fit via the margin-collapsed ``Σ o_g²/(n·w_g) − n``
    and the largest |observed − expected| share across ALL expected
    levels: an arm with zero observed rows is the worst possible
    mismatch and must dominate the dev readout, so the k observed
    counts are right-joined onto the expected-level spine (a k-row
    literal relation) before the fold.

    ONE k-row hash aggregation over the data, then a k-row
    broadcast-spine join and fold — everything is a JVM expression
    and an external SQL oracle replays it exactly (counts are
    integers).
    """
    from pyspark.sql import Window

    if not expected or any(w <= 0 for w in expected.values()):
        raise ValueError("expected must map levels to positive weights")
    total_w = float(sum(expected.values()))
    levels = list(expected)
    g = F.col(group_col)
    cnt = (
        df.where(g.isin(levels))
        .groupBy(g.alias("__lv"))
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
    )
    # expected-level spine: one local row exploded to k (level, weight)
    # rows, so zero-observed arms still contribute a share of 0
    spine = df.sparkSession.range(1).select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(lv).alias("__lv"),
                    F.lit(expected[lv] / total_w).alias("__w"),
                )
                for lv in levels
            ])
        ).alias("__e")
    ).select("__e.*")
    joined = spine.join(F.broadcast(cnt), on="__lv", how="left").select(
        F.coalesce(F.col("__o"), F.lit(0)).cast("long").alias("__o"),
        F.col("__w"),
    )
    shared = joined.select(
        "__o", "__w",
        F.try_divide(
            F.col("__o").cast("double"),
            F.sum("__o").over(Window.partitionBy()).cast("double"),
        ).alias("__share"),
    )
    agg = shared.agg(
        F.sum("__o").cast("long").alias("n"),
        F.sum(F.col("__o").cast("double") ** 2 / F.col("__w"))
        .alias("__s"),
        F.max(F.abs(F.coalesce(F.col("__share"), F.lit(0.0)) - F.col("__w")))
        .alias("max_share_dev"),
    )
    nD = F.col("n").cast("double")
    dof = len(levels) - 1
    # n > 0 guard on the division itself: with zero matching rows the
    # bare __s / n is a 0/0 double division — DIVIDE_BY_ZERO under
    # ANSI even inside a downstream when-condition (conditions
    # evaluate their inputs); NULL chi2 is the honest readout there
    chi2 = F.when(
        F.col("n") > 0,
        F.greatest(F.lit(0.0), F.try_divide(F.col("__s"), nD) - nD),
    )
    from .stats import _chi2_sf_stats

    return agg.select(
        F.lit(len(levels)).cast("long").alias("k"),
        "n",
        chi2.alias("chi2_stat"),
        F.lit(dof).cast("long").alias("dof"),
        F.when(
            (F.col("n") > 0) & (F.lit(dof) > 0), _chi2_sf_stats(chi2, dof)
        ).alias("pvalue"),
        "max_share_dev",
    )


def tost_equivalence(
    df: DataFrame,
    col: str,
    group_col: str,
    group_a,
    group_b,
    *,
    margin: float,
    alpha: float = 0.05,
) -> DataFrame:
    """Two-one-sided-tests (TOST) equivalence readout: is the mean
    difference between the groups provably WITHIN ±``margin``?  The
    statistic a non-inferiority launch review actually needs — a
    non-significant t-test is absence of evidence, TOST is evidence of
    absence.

    Schuirmann's procedure with the Welch z form (large-sample normal,
    the right approximation for event pipelines where n is thousands+):
    ``z_lower = (diff + margin)/se`` tests H0: diff ≤ −margin,
    ``z_upper = (diff − margin)/se`` tests H0: diff ≥ +margin, and
    ``p_tost = max(Φ̄(z_lower), Φ(z_upper))`` — equivalence at level
    ``alpha`` iff ``p_tost < alpha`` (equivalently the (1−2α) CI lies
    inside ±margin).

    One row: ``n_a, n_b, mean_diff, se, margin, z_lower, z_upper,
    p_tost, equivalent``.  ONE conditional-aggregate scan (the
    :func:`effect_size` shape); degenerate groups yield NULLs, never an
    ANSI error.
    """
    if margin <= 0:
        raise ValueError(f"margin must be > 0, got {margin}")
    x = F.col(col).cast("double")
    ga, gb = _is(group_col, group_a), _is(group_col, group_b)
    base = df.where(x.isNotNull() & (ga | gb))
    agg = base.agg(
        F.count(F.when(ga, 1)).cast("long").alias("n_a"),
        F.count(F.when(gb, 1)).cast("long").alias("n_b"),
        F.avg(F.when(ga, x)).alias("__ma"),
        F.avg(F.when(gb, x)).alias("__mb"),
        F.var_samp(F.when(ga, x)).alias("__va"),
        F.var_samp(F.when(gb, x)).alias("__vb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    se = F.when(
        (na > 1) & (nb > 1)
        & F.col("__va").isNotNull() & F.col("__vb").isNotNull(),
        F.sqrt(F.col("__va") / na + F.col("__vb") / nb),
    )
    diff = F.col("__ma") - F.col("__mb")
    z_lo = F.when(se > 0, (diff + F.lit(float(margin))) / se)
    z_up = F.when(se > 0, (diff - F.lit(float(margin))) / se)
    p_tost = F.greatest(_norm_sf(z_lo), _norm_sf(-z_up))
    return agg.select(
        "n_a", "n_b",
        diff.alias("mean_diff"),
        se.alias("se"),
        F.lit(float(margin)).alias("margin"),
        z_lo.alias("z_lower"),
        z_up.alias("z_upper"),
        p_tost.alias("p_tost"),
        (p_tost < F.lit(float(alpha))).alias("equivalent"),
    )
