"""Distribution-drift operators: PSI, chi-square, Jensen-Shannon.

Beyond-reference family (the reference's closest surface is its
two-sample hypothesis tier, reference pandera/api/hypotheses.py —
which compares *means*; these compare whole *distributions*).  Drift
screens are the standard corpus-health gate in front of a training
run: did this crawl slice shift against the last one, did a quality
filter change the length profile, did the label mix move.

Design for 100 TB:
- Every operator is **tag -> union -> one hash aggregation**: the two
  input frames are projected to the single drift column plus a 0/1
  side tag, unioned (narrow), and aggregated once on the (category |
  bin) key.  Map-side partial aggregation collapses each scan to at
  most one row per distinct key per task, so the only shuffle moves
  ``O(distinct keys)`` rows regardless of input size.
- The statistic itself is computed on the post-aggregation frame
  (``O(categories)`` rows) with JVM built-ins — a broadcast of the
  one-row totals, never a second pass over the data.
- No UDFs, no collect: the result is a DataFrame the caller can join
  into a monitoring sink.  The optional chi-square p-value
  (Wilson-Hilferty normal approximation) is also a Column expression.
- Binning for PSI is an explicit CASE chain over caller-supplied
  edges: deterministic, engine-portable (an external SQL oracle can
  replay it verbatim), and pushdown-friendly (the projection keeps
  only the drift column, so Parquet reads one column per side).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column as C, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "category_counts",
    "category_drift",
    "psi_bins",
    "psi",
    "bin_column",
    "ks_drift",
    "drift_report",
    "chi2_js_terms",
]

# Fraction floor used by PSI so empty bins contribute a finite term
# (the conventional smoothing; see Yurdakul 2018 on PSI behaviour).
PSI_EPS = 1e-6


def _tagged_counts(
    df_a: DataFrame, df_b: DataFrame, key: C, key_name: str
) -> DataFrame:
    """Project both sides to (key, side), union, and count per key in
    ONE aggregation: ``(key, n_a, n_b)``.  The union is narrow; the
    groupBy is the operator's only shuffle and moves one row per
    distinct key per map task (partial agg)."""
    a = df_a.select(key.alias(key_name), F.lit(0).alias("__side"))
    b = df_b.select(key.alias(key_name), F.lit(1).alias("__side"))
    return (
        a.unionByName(b)
        .groupBy(key_name)
        .agg(
            F.count(F.when(F.col("__side") == 0, 1)).alias("n_a"),
            F.count(F.when(F.col("__side") == 1, 1)).alias("n_b"),
        )
    )


def category_counts(
    df_a: DataFrame, df_b: DataFrame, cat_col: str
) -> DataFrame:
    """Per-category counts on both sides: ``(cat_col, n_a, n_b)``.
    Categories absent from one side appear with a zero count."""
    return _tagged_counts(df_a, df_b, F.col(cat_col), cat_col)


def _with_totals(counts: DataFrame) -> DataFrame:
    """Attach side totals to every row via a broadcast of the one-row
    totals aggregate (the counts frame is already O(categories))."""
    totals = counts.agg(
        F.sum("n_a").cast("double").alias("__tot_a"),
        F.sum("n_b").cast("double").alias("__tot_b"),
    )
    return counts.crossJoin(F.broadcast(totals))


def chi2_js_terms(ca: C, cb: C, ta: C, tb: C) -> "tuple[C, C]":
    """Per-cell chi-square and Jensen-Shannon contributions for a
    (2 x categories) homogeneity table: observed counts ``ca``/``cb``
    with side totals ``ta``/``tb`` (all double Columns).  Shared by the
    batch and streaming drift operators so the math exists once."""
    row_tot = ca + cb
    grand = ta + tb
    ea = ta * row_tot / grand
    eb = tb * row_tot / grand
    chi2 = (ca - ea) ** 2 / ea + (cb - eb) ** 2 / eb
    pa = ca / ta
    pb = cb / tb
    m = (pa + pb) / F.lit(2.0)
    js = (
        F.when(pa > 0, pa * F.log(pa / m) / F.lit(2.0)).otherwise(0.0)
        + F.when(pb > 0, pb * F.log(pb / m) / F.lit(2.0)).otherwise(0.0)
    )
    return chi2, js


def category_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    cat_col: str,
    *,
    pvalue: bool = False,
) -> DataFrame:
    """One-row categorical drift summary between two frames.

    Returns ``(n_a, n_b, n_categories, dof, chi2_stat,
    js_divergence)`` — the chi-square homogeneity statistic over the
    two-way (category x side) table and the Jensen-Shannon divergence
    (natural log; 0 iff identical mixes, ln 2 max) between the two
    category distributions.  With ``pvalue=True`` adds
    ``chi2_pvalue`` via the Wilson-Hilferty cube-root normal
    approximation with a rational Phi tail (Spark SQL has no erf
    built-in), keeping the operator closed-form JVM-side; for exact
    tails feed ``chi2_stat``/``dof`` to driver-side gamma helpers.

    Both inputs must be non-empty (a zero side total makes the
    statistic undefined).
    """
    cnt = _with_totals(category_counts(df_a, df_b, cat_col))
    chi2_term, js_term = chi2_js_terms(
        F.col("n_a").cast("double"), F.col("n_b").cast("double"),
        F.col("__tot_a"), F.col("__tot_b"),
    )
    out = cnt.agg(
        F.sum("n_a").alias("n_a"),
        F.sum("n_b").alias("n_b"),
        F.count(F.lit(1)).alias("n_categories"),
        (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        F.sum(chi2_term).alias("chi2_stat"),
        F.sum(js_term).alias("js_divergence"),
    )
    if pvalue:
        k = F.col("dof").cast("double")
        x = F.col("chi2_stat")
        # Wilson-Hilferty: (x/k)^(1/3) ~ N(1 - 2/(9k), 2/(9k)), so the
        # upper tail is Phi(-z); Phi via the Zelen-Severo rational
        # approximation 26.2.17 (|err| < 7.5e-8) — Spark SQL has no erf
        z = (F.pow(x / k, F.lit(1.0 / 3.0)) - (1 - 2 / (9 * k))) / F.sqrt(
            2 / (9 * k)
        )
        out = out.withColumn(
            "chi2_pvalue",
            F.when(k <= 0, F.lit(None).cast("double")).otherwise(
                _norm_sf(z)
            ),
        )
    return out


def _norm_sf(z: C) -> C:
    """Standard-normal survival function ``1 - Phi(z)`` as a Column
    (Zelen & Severo / Abramowitz-Stegun 26.2.17, |err| < 7.5e-8)."""
    az = F.abs(z)
    t = 1.0 / (1.0 + 0.2316419 * az)
    poly = t * (
        0.319381530
        + t
        * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
    )
    upper = F.exp(-az * az / 2) / F.lit(2.5066282746310002) * poly
    return F.when(z >= 0, upper).otherwise(1 - upper)


def bin_column(col: C, edges: Sequence[float]) -> C:
    """Map a numeric column to a 0-based bin id over ``edges``
    (ascending): bin 0 = ``(-inf, edges[0])``, bin i =
    ``[edges[i-1], edges[i])``, bin len(edges) = ``[edges[-1], inf)``.
    Nulls land in bin -1.  A plain CASE chain — portable and
    codegen-friendly."""
    if not edges or list(edges) != sorted(edges):
        raise ValueError("edges must be a non-empty ascending sequence")
    expr = F.when(col.isNull(), F.lit(-1))
    for i, e in enumerate(edges):
        expr = expr.when(col < F.lit(e), F.lit(i))
    return expr.otherwise(F.lit(len(edges))).cast("int")


def psi_bins(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    edges: Sequence[float],
    *,
    eps: float = PSI_EPS,
) -> DataFrame:
    """Per-bin PSI decomposition: ``(bin, n_a, n_b, frac_a, frac_b,
    psi_term)`` where ``psi_term = (fa - fb) * ln(fa / fb)`` with both
    fractions floored at ``eps`` (finite contribution for empty bins).
    Only bins observed on at least one side appear."""
    cnt = _with_totals(
        _tagged_counts(
            df_a, df_b, bin_column(F.col(value_col), edges), "bin"
        )
    )
    fa = F.greatest(F.col("n_a") / F.col("__tot_a"), F.lit(float(eps)))
    fb = F.greatest(F.col("n_b") / F.col("__tot_b"), F.lit(float(eps)))
    return cnt.select(
        "bin",
        "n_a",
        "n_b",
        fa.alias("frac_a"),
        fb.alias("frac_b"),
        ((fa - fb) * F.log(fa / fb)).alias("psi_term"),
    )


def psi(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    edges: Sequence[float],
    *,
    eps: float = PSI_EPS,
) -> DataFrame:
    """One-row Population Stability Index summary: ``(n_a, n_b,
    n_bins, psi)``.  Rule of thumb: < 0.1 stable, 0.1-0.25 moderate
    shift, > 0.25 significant shift."""
    return psi_bins(df_a, df_b, value_col, edges, eps=eps).agg(
        F.sum("n_a").alias("n_a"),
        F.sum("n_b").alias("n_b"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("psi_term").alias("psi"),
    )


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    pvalue: bool = False,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic: one row
    ``(n_a, n_b, ks_stat)`` where ``ks_stat = sup |F_a(x) - F_b(x)|``
    over the empirical CDFs (nulls excluded).

    Computed on the *distinct-value* grain: tag-union-count per value
    (the operator's one real shuffle), then a cumulative window over the
    aggregated frame.  That window is a single global sort of
    O(distinct values) rows — fine for discrete/quantized columns; for
    a truly continuous 100 TB column quantize first (``F.round``) or
    use :func:`psi` on explicit bins, which needs no ordered pass.

    ``pvalue=True`` adds the asymptotic two-sided p-value via the
    Kolmogorov distribution with the small-sample effective-n
    correction (Numerical Recipes §14.3.3), as a Column expression.
    """
    from pyspark.sql import Window

    col = F.col(value_col)
    cnt = _with_totals(
        _tagged_counts(
            df_a.where(col.isNotNull()), df_b.where(col.isNotNull()),
            col, "v",
        )
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    diff = F.abs(
        F.sum("n_a").over(w) / F.col("__tot_a")
        - F.sum("n_b").over(w) / F.col("__tot_b")
    )
    out = cnt.select(
        F.col("__tot_a").alias("ta"), F.col("__tot_b").alias("tb"),
        diff.alias("d"),
    ).agg(
        F.first("ta").cast("long").alias("n_a"),
        F.first("tb").cast("long").alias("n_b"),
        F.max("d").alias("ks_stat"),
    )
    if pvalue:
        ne = (
            F.col("n_a").cast("double") * F.col("n_b")
            / (F.col("n_a") + F.col("n_b"))
        )
        lam = (
            (F.sqrt(ne) + 0.12 + 0.11 / F.sqrt(ne)) * F.col("ks_stat")
        )
        # Kolmogorov Q(lam) = 2 * sum_{k>=1} (-1)^{k-1} exp(-2 k^2 lam^2);
        # 12 terms are accurate for lam >= 0.2.  Below that the truncated
        # alternating series is meaningless (at lam = 0 it telescopes to
        # exactly 0 — the WRONG end: true Q(0) = 1), so small lam pins
        # the p-value to 1 (Q(0.2) > 1 - 1e-76; no precision lost).
        series = None
        for k in range(1, 13):
            term = F.exp(-2.0 * (k * k) * lam * lam)
            term = term if k % 2 == 1 else -term
            series = term if series is None else series + term
        out = out.withColumn(
            "ks_pvalue",
            F.when(lam < 0.2, F.lit(1.0)).otherwise(
                F.least(F.lit(1.0), F.greatest(F.lit(0.0), 2 * series))
            ),
        )
    return out


def drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    *,
    cat_cols: Sequence[str] = (),
    binned_cols: "dict[str, Sequence[float]] | None" = None,
    eps: float = PSI_EPS,
) -> DataFrame:
    """Whole-table drift dashboard with ONE row-grain shuffle: every
    categorical column and every binned numeric column compared between
    the two frames simultaneously.

    Returns one row per column: ``(col_name, n_a, n_b, n_keys,
    chi2_stat, dof, js_divergence, psi)``.

    Each input row is melted to (col_name, key) entries — categorical
    keys are the string value, numeric keys the bin id over the given
    edges — then both sides union and aggregate by (col_name, key).
    Partial aggregation keeps the row-grain shuffle at O(sum of distinct
    keys per column) rows however many columns are monitored; every
    later exchange (per-column totals, final statistics) moves only the
    O(keys) aggregated frame.  The counts exchange is consumed twice
    (per-key stats + totals) — Spark's exchange reuse collapses it to
    one physical shuffle (asserted by the plan test).  Statistics match
    :func:`category_drift` / :func:`psi` exactly.
    """
    binned = dict(binned_cols or {})
    if not cat_cols and not binned:
        raise ValueError("monitor at least one column")
    for c, edges in binned.items():
        if not edges or list(edges) != sorted(edges):
            raise ValueError(f"edges for {c!r} must be ascending, non-empty")

    def melt(df: DataFrame, side: int) -> DataFrame:
        entries = [
            F.struct(
                F.lit(c).alias("col_name"),
                F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                .alias("key"),
            )
            for c in cat_cols
        ] + [
            F.struct(
                F.lit(c).alias("col_name"),
                bin_column(F.col(c), edges).cast("string").alias("key"),
            )
            for c, edges in binned.items()
        ]
        return df.select(
            F.explode(F.array(*entries)).alias("e")
        ).select("e.col_name", "e.key", F.lit(side).alias("__side"))

    counts = (
        melt(df_a, 0)
        .unionByName(melt(df_b, 1))
        .groupBy("col_name", "key")
        .agg(
            F.count(F.when(F.col("__side") == 0, 1)).alias("n_a"),
            F.count(F.when(F.col("__side") == 1, 1)).alias("n_b"),
        )
    )
    totals = counts.groupBy("col_name").agg(
        F.sum("n_a").cast("double").alias("__tot_a"),
        F.sum("n_b").cast("double").alias("__tot_b"),
    )
    cnt = counts.join(F.broadcast(totals), "col_name")
    ca, cb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ta, tb = F.col("__tot_a"), F.col("__tot_b")
    chi2_term, js_term = chi2_js_terms(ca, cb, ta, tb)
    fa = F.greatest(ca / ta, F.lit(float(eps)))
    fb = F.greatest(cb / tb, F.lit(float(eps)))
    psi_term = (fa - fb) * F.log(fa / fb)
    return cnt.groupBy("col_name").agg(
        F.sum("n_a").alias("n_a"),
        F.sum("n_b").alias("n_b"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(chi2_term).alias("chi2_stat"),
        (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        F.sum(js_term).alias("js_divergence"),
        F.sum(psi_term).alias("psi"),
    )


def column_entropy(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Shannon entropy (nats) + cardinality of many categorical columns
    in ONE melt shuffle: ``(col_name, n_values, n_distinct, entropy)``.

    The diversity screen of a corpus-health report ("did the source mix
    collapse?", "is a column near-constant?").  Each row melts to
    (col_name, value) entries; nulls are excluded (entropy of the
    observed distribution).  Partial aggregation bounds the shuffle at
    O(sum of per-column distinct values); ``entropy = ln n -
    (sum c*ln c)/n`` finishes on the already-aggregated count frame.
    """
    if not cols:
        raise ValueError("need at least one column")
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(c).cast("string").alias("key"),
        )
        for c in cols
    ]
    counts = (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.col_name", "e.key")
        .filter(F.col("key").isNotNull())
        .groupBy("col_name", "key")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c").cast("double")
    s = F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
    return counts.groupBy("col_name").agg(
        F.sum("c").cast("long").alias("n_values"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.when(n > 0, F.log(n) - s / n).otherwise(F.lit(0.0)).alias("entropy"),
    )


def psi_timeline(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    edges: Sequence[float],
    *,
    grain: str = "day",
    eps: float = PSI_EPS,
) -> DataFrame:
    """Drift timeline: per-period PSI of a binned numeric column against
    the ALL-TIME distribution — ``(period, n_rows, psi)``, one row per
    ``grain`` bucket.

    ONE (period, bin) aggregation scans the fact table; the baseline,
    the per-period totals, and the full period×bin grid (so bins a
    period never hit still contribute their eps-floored term — exact
    PSI, same convention as :func:`psi_bins`) all derive from that
    O(periods × bins) aggregated frame.  The monitoring-dashboard
    query: "which day did the value distribution move?"."""
    b = bin_column(F.col(value_col), edges)
    period = F.date_trunc(grain, F.col(ts_col))
    counts = (
        df.select(period.alias("period"), b.alias("bin"))
        .groupBy("period", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = counts.groupBy("bin").agg(F.sum("n").alias("__nb"))
    tot_b = base.agg(F.sum("__nb").cast("double").alias("__tot_b"))
    per_p = counts.groupBy("period").agg(F.sum("n").alias("__tot_p"))
    grid = per_p.crossJoin(F.broadcast(base)).crossJoin(F.broadcast(tot_b))
    j = grid.join(counts, ["period", "bin"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    fa = F.greatest(
        F.col("n").cast("double") / F.col("__tot_p").cast("double"),
        F.lit(float(eps)),
    )
    fb = F.greatest(
        F.col("__nb").cast("double") / F.col("__tot_b"), F.lit(float(eps))
    )
    term = (fa - fb) * F.log(fa / fb)
    return j.groupBy("period").agg(
        F.first("__tot_p").cast("long").alias("n_rows"),
        F.sum(term).alias("psi"),
    )
