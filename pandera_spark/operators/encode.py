"""Categorical feature encoding: smoothed target encoding, frequency
encoding — the ML-prep transforms that turn high-cardinality
categoricals into model-ready numerics without a vocabulary file.

Shapes are the module standard two-pass: fit = ONE aggregation at
category grain (map-side partial combine — the shuffle carries one
stats row per category per task), transform = one equi-join of the
fitted table back onto the rows (category tables are usually tiny →
AQE broadcasts; a genuinely huge vocabulary degrades gracefully to a
shuffle join on the category key).  The global prior attaches to the
FITTED table via a 1-row broadcast cross (bounds pattern — the cross
multiplies k category rows × 1, never data rows).

Leakage note: naive target encoding leaks the row's own label into its
feature.  ``leave_one_out=True`` excludes each row's own target from
its encoding at transform time — the standard train-time guard
(Micci-Barreca 2001's smoothing plus LOO).

Reference parity: no pandera analogue (validation, not featurization);
beyond-reference tier next to ``numeric.standardize``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fit_target_encoding",
    "target_encode",
    "frequency_encode",
    "fit_quantile_bins",
    "quantile_bin",
]


def fit_target_encoding(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    smoothing: float = 20.0,
) -> DataFrame:
    """Fit the encoder table: one row per category with ``(cat, n,
    cat_mean, prior, enc)`` where
    ``enc = (n·cat_mean + smoothing·prior) / (n + smoothing)`` —
    Micci-Barreca smoothing toward the global target mean, so rare
    categories shrink to the prior instead of memorizing noise.
    Rows with a null target are excluded from the fit.
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    y = F.col(target_col).cast("double")
    stats = (
        df.where(y.isNotNull())
        .groupBy(cat_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(y).alias("__sy"),
        )
    )
    prior = stats.agg(
        (F.sum("__sy") / F.sum("n")).alias("prior")
    )
    s = F.lit(float(smoothing))
    return (
        stats.crossJoin(F.broadcast(prior))
        .select(
            cat_col,
            "n",
            (F.col("__sy") / F.col("n")).alias("cat_mean"),
            "prior",
            (
                (F.col("__sy") + s * F.col("prior"))
                / (F.col("n") + s)
            ).alias("enc"),
        )
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    smoothing: float = 20.0,
    out_col: Optional[str] = None,
    leave_one_out: bool = False,
    encoder: Optional[DataFrame] = None,
) -> DataFrame:
    """Append the target-encoded column.

    Unseen categories (absent from the encoder — e.g. when applying a
    TRAIN-fitted ``encoder`` to validation data) and categories the
    smoothing cannot rescue fall back to the prior.  With
    ``leave_one_out`` each row's own target is excluded:
    ``enc_i = (Σy − y_i + s·prior) / (n − 1 + s)`` — use on the frame
    the encoder was fitted from (train), and the plain encoding
    everywhere else.
    """
    out = out_col or f"{cat_col}_te"
    enc = (
        encoder
        if encoder is not None
        else fit_target_encoding(
            df, cat_col, target_col, smoothing=smoothing
        )
    )
    # the scalar prior rides a 1-row broadcast cross so UNSEEN
    # categories (left-join miss) still fall back to it — the bounded
    # bounds-cross pattern, never a data-sized nested loop
    prior1 = enc.agg(F.avg("prior").alias("__prior"))
    joined = (
        df.crossJoin(F.broadcast(prior1))
        .join(
            enc.select(
                F.col(cat_col).alias("__k"), "n", "cat_mean", "enc"
            ),
            F.col(cat_col).eqNullSafe(F.col("__k")),
            "left",
        )
        .drop("__k")
    )
    if leave_one_out:
        y = F.col(target_col).cast("double")
        s = F.lit(float(smoothing))
        sy = F.col("cat_mean") * F.col("n")
        # a null-target row contributed nothing to the fit, so there
        # is nothing to leave out: seen categories get the FULL enc
        # (prior only for genuinely unseen ones); the n+s>1 guard only
        # bites at smoothing=0 with a singleton category, where
        # excluding the row leaves no information -> prior
        val = (
            F.when(y.isNull(), F.coalesce(F.col("enc"), F.col("__prior")))
            .when(
                F.col("n") + s > 1,
                (sy - y + s * F.col("__prior")) / (F.col("n") - 1 + s),
            )
            .otherwise(F.col("__prior"))
        )
    else:
        val = F.col("enc")
    return (
        joined.withColumn(out, F.coalesce(val, F.col("__prior")))
        .drop("n", "cat_mean", "enc", "__prior")
    )


def frequency_encode(
    df: DataFrame,
    cat_col: str,
    *,
    out_col: Optional[str] = None,
    normalize: bool = True,
) -> DataFrame:
    """Append the category's occurrence count (or fraction of rows when
    ``normalize``) — the cheapest useful encoding for high-cardinality
    categoricals, and a direct popularity feature.  Null categories
    encode like any other level (null-safe join)."""
    out = out_col or f"{cat_col}_freq"
    counts = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    if normalize:
        total = counts.agg(F.sum("__n").alias("__tot"))
        counts = counts.crossJoin(F.broadcast(total)).select(
            cat_col,
            (F.col("__n") / F.col("__tot").cast("double")).alias("__f"),
        )
        val = "__f"
    else:
        val = "__n"
    # no forced broadcast: the stated use case is HIGH-cardinality
    # categoricals, where the count table can be arbitrarily large —
    # AQE broadcasts small fits on its own and falls back to a shuffle
    # join keyed on the category otherwise
    joined = df.join(
        counts.select(F.col(cat_col).alias("__k"), val),
        F.col(cat_col).eqNullSafe(F.col("__k")),
        "left",
    ).drop("__k")
    return joined.withColumnRenamed(val, out)


def fit_quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    *,
    exact: bool = True,
    relative_error: float = 1e-4,
) -> list:
    """Equal-frequency bin edges: the ``n_bins - 1`` interior
    quantiles of ``col`` (q = i/n_bins), as a driver-side list of
    floats (bounded: one aggregate row).

    ``exact=True`` uses ``F.percentile`` (linear interpolation — the
    same definition as SQL ``quantile_cont``, so an external engine
    reproduces the edges; interpolated edges fall strictly between
    adjacent order statistics, which makes the downstream ``<``
    binning immune to last-ulp interpolation differences).  At 100 TB
    pass ``exact=False`` for ``percentile_approx`` (sketch-based, one
    pass, no sort) — the edges then carry the sketch's rank error.
    Nulls and NaNs are excluded from the fit.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    qs = [i / n_bins for i in range(1, n_bins)]
    x = F.col(col).cast("double")
    sub = df.where(x.isNotNull() & ~F.isnan(x))
    if exact:
        agg = sub.agg(F.percentile(x, F.lit(qs)).alias("e"))
    else:
        acc = max(1, int(1.0 / float(relative_error)))
        agg = sub.agg(
            F.percentile_approx(x, F.lit(qs), F.lit(acc)).alias("e")
        )
    row = agg.first()
    edges = list(row["e"]) if row and row["e"] is not None else []
    if not edges:
        raise ValueError(f"no non-null values in {col!r} to fit bins")
    return edges


def quantile_bin(
    df: DataFrame,
    col: str,
    *,
    n_bins: Optional[int] = None,
    edges: Optional[list] = None,
    out_col: Optional[str] = None,
    exact: bool = True,
) -> DataFrame:
    """Append the equal-frequency bin id of ``col``: bin i covers
    ``[edge_{i-1}, edge_i)`` (drift.bin_column semantics; nulls land
    in bin -1).  Pass ``n_bins`` to fit on this frame, or ``edges``
    from :func:`fit_quantile_bins` on TRAIN data to bin validation
    data with the train boundaries (the leakage-safe path).  The
    apply side is a pure CASE projection — no join, no shuffle.
    """
    from .drift import bin_column

    if (edges is None) == (n_bins is None):
        raise ValueError("pass exactly one of n_bins or edges")
    if edges is None:
        edges = fit_quantile_bins(df, col, n_bins, exact=exact)
    return df.withColumn(
        out_col or f"{col}_bin",
        bin_column(F.col(col).cast("double"), list(edges)),
    )
