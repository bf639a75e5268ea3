"""Operational table monitoring: freshness, completeness, seasonal
baselines — the screens a data platform runs on every landed partition
before letting downstream training jobs consume it.

All three are deterministic (no ``now()``/RNG — freshness takes an
explicit ``as_of``) and single-data-scan:

- :func:`freshness` — per-group max event time vs a reference instant,
  staleness flag.  ONE aggregation; the shuffle carries one (max_ts,
  count) pair per group per task.
- :func:`completeness` — null fraction / distinct count per column
  (optionally per time bucket), long format.  Columns are melted
  BEFORE aggregation so one shuffle covers every column; the melted
  width-multiplier is removed by map-side partial aggregation, and the
  distinct leg shuffles only distinct (bucket, column, value) triples.
- :func:`seasonal_baseline` — hour-of-week baseline (mean/σ over the
  observed weeks) vs each hourly bucket; z-score anomaly flags.  Two
  aggregations over already-reduced frames plus one broadcast join of
  the ≤168-row baseline.  The day slot is ``floor(epoch/86400) mod 7``
  — pure arithmetic, so any SQL engine replays it without day-of-week
  convention drift (session timezone must be UTC, as recommended_conf
  pins).

Reference parity: pandera has no monitoring tier (it validates frames
synchronously); this is the beyond-reference operational layer next to
``incremental.py``'s new-files-only re-validation.
"""

from __future__ import annotations

import datetime
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "freshness",
    "completeness",
    "seasonal_baseline",
    "freshness_heartbeat_foreach_batch",
    "read_freshness_ledger",
    "benford_digits",
    "benford_summary",
]


def freshness(
    df: DataFrame,
    ts_col: str,
    by: Union[str, Sequence[str], None] = None,
    *,
    as_of: Union[str, datetime.datetime],
    max_lag_seconds: Optional[int] = None,
) -> DataFrame:
    """Per-group data freshness relative to ``as_of``.

    Output: ``by..., n, max_ts, lag_seconds`` (+ ``stale`` when
    ``max_lag_seconds`` is given).  ``as_of`` is an explicit instant
    (ISO string or datetime) so reports are reproducible; pass your
    scheduler's logical run time, not wall clock.  ``lag_seconds`` is
    floor-second (``unix_timestamp`` resolution); a group whose max ts
    is AFTER as_of reports a negative lag rather than clamping — that
    is a real signal (late-arriving future timestamps).
    """
    keys = (
        [] if by is None else [by] if isinstance(by, str) else list(by)
    )
    aggs = [
        F.count(F.col(ts_col)).cast("long").alias("n"),
        F.max(F.col(ts_col)).alias("max_ts"),
    ]
    out = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    ref = F.lit(as_of).cast("timestamp")
    out = out.withColumn(
        "lag_seconds",
        (F.unix_timestamp(ref) - F.unix_timestamp("max_ts")).cast("long"),
    )
    if max_lag_seconds is not None:
        out = out.withColumn(
            "stale", F.col("lag_seconds") > F.lit(int(max_lag_seconds))
        )
    return out


def completeness(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    *,
    bucket: Optional[str] = None,
    ts_col: Optional[str] = None,
) -> DataFrame:
    """Null-fraction / distinct-count matrix, long format.

    Output: ``[bucket,] column, n, n_null, null_frac, n_distinct`` —
    one row per column (per time bucket when ``bucket`` ∈ {'day',
    'week', 'month', 'hour'} and ``ts_col`` are given).  Values are
    compared as their string form for the distinct count (one uniform
    melted type; exact, not a sketch).
    """
    names = list(cols) if cols is not None else [
        c for c in df.columns if c != ts_col
    ]
    if not names:
        raise ValueError("no columns to profile")
    if (bucket is None) != (ts_col is None):
        raise ValueError("bucket and ts_col go together")
    melted = df.select(
        *(
            [F.date_trunc(bucket, F.col(ts_col)).alias("bucket")]
            if bucket
            else []
        ),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast("string").alias("v"),
                )
                for c in names
            ])
        ).alias("__m"),
    ).select(*((["bucket"] if bucket else []) + ["__m.*"]))
    keys = (["bucket"] if bucket else []) + ["column"]
    return (
        melted.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("v").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_null"),
            F.countDistinct("v").cast("long").alias("n_distinct"),
        )
        .withColumn(
            "null_frac",
            F.col("n_null") / F.col("n").cast("double"),
        )
        .select(*keys, "n", "n_null", "null_frac", "n_distinct")
    )


def seasonal_baseline(
    df: DataFrame,
    ts_col: str,
    *,
    value: Optional[str] = None,
    min_sigma: float = 2.0,
) -> DataFrame:
    """Hour-of-week seasonal anomaly screen.

    Buckets rows by hour, computes the per-(day-slot, hour-of-day)
    baseline mean/σ of the hourly metric (row count, or ``sum(value)``
    when ``value`` is given) across the observed weeks, and z-scores
    each bucket against its slot's baseline.  Output: ``bucket_ts,
    day_slot, hod, metric, base_mean, base_std, z, is_anomaly`` —
    ``z`` is null for slots observed only once (σ undefined) or with
    zero variance; ``day_slot`` is ``floor(epoch/86400) mod 7`` (0 =
    1970-01-01's weekday, Thursday), convention-free arithmetic.
    """
    metric = (
        F.count(F.lit(1)).cast("double")
        if value is None
        else F.sum(F.col(value).cast("double"))
    )
    hourly = (
        df.select(F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"))
        if value is None
        else df.select(
            F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"),
            F.col(value),
        )
    ).groupBy("bucket_ts").agg(metric.alias("metric")).withColumn(
        "day_slot",
        F.pmod(
            F.floor(F.unix_timestamp("bucket_ts") / 86400), F.lit(7)
        ).cast("int"),
    ).withColumn("hod", F.hour("bucket_ts"))
    base = hourly.groupBy("day_slot", "hod").agg(
        F.avg("metric").alias("base_mean"),
        F.stddev_samp("metric").alias("base_std"),
    )
    joined = hourly.join(F.broadcast(base), ["day_slot", "hod"])
    z = F.when(
        F.col("base_std") > 0,
        (F.col("metric") - F.col("base_mean")) / F.col("base_std"),
    )
    return joined.select(
        "bucket_ts", "day_slot", "hod", "metric",
        "base_mean", "base_std",
        z.alias("z"),
        F.when(z.isNotNull(), F.abs(z) >= F.lit(float(min_sigma)))
        .alias("is_anomaly"),
    )


def freshness_heartbeat_foreach_batch(
    state_path: str,
    ts_col: str,
    by: Union[str, Sequence[str], None] = None,
):
    """Streaming freshness ledger: each micro-batch appends one
    (group, batch max_ts, row count) heartbeat row — the stream's
    liveness is then queryable from the tiny ledger alone
    (:func:`read_freshness_ledger`) without touching stream data.

    Append-only, one row per group per batch (bounded by trigger rate,
    not volume).  At-least-once replays re-append byte-identical rows
    under the same batch id; the read fold collapses per (batch,
    group) before taking maxima, so retries cannot distort the report
    (the ledger protocol shared with sketches/incremental).

    Usage::

        q = (stream.writeStream
             .foreachBatch(freshness_heartbeat_foreach_batch(
                 path, "ts", ["source"]))
             .start())
    """
    keys = (
        [] if by is None else [by] if isinstance(by, str) else list(by)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        aggs = [
            F.max(F.col(ts_col)).alias("max_ts"),
            F.count(F.col(ts_col)).cast("long").alias("n"),
        ]
        hb = (
            batch_df.groupBy(*keys).agg(*aggs)
            if keys
            else batch_df.agg(*aggs)
        )
        hb.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(state_path)

    return process


def read_freshness_ledger(
    spark,
    state_path: str,
    by: Union[str, Sequence[str], None] = None,
    *,
    as_of: Union[str, datetime.datetime, None] = None,
    max_lag_seconds: Optional[int] = None,
) -> Optional[DataFrame]:
    """Current freshness report from the heartbeat ledger: per group,
    lifetime row count, latest observed event time, and (with
    ``as_of``) the same lag/stale columns as :func:`freshness` — all
    from heartbeat rows only, the stream is never replayed.  Returns
    None when no ledger exists yet."""
    from pyspark.sql.utils import AnalysisException

    try:
        state = spark.read.parquet(state_path)
    except AnalysisException:
        return None
    keys = (
        [] if by is None else [by] if isinstance(by, str) else list(by)
    )
    # collapse replayed batches first: duplicates of (batch, group) are
    # byte-identical, so max() of each is the single true heartbeat
    per_batch = state.groupBy("batch_id", *keys).agg(
        F.max("max_ts").alias("max_ts"), F.max("n").alias("n")
    )
    out = per_batch.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("n").cast("long").alias("n"),
        F.max("max_ts").alias("max_ts"),
    ) if keys else per_batch.agg(
        F.sum("n").cast("long").alias("n"),
        F.max("max_ts").alias("max_ts"),
    )
    if as_of is not None:
        ref = F.lit(as_of).cast("timestamp")
        out = out.withColumn(
            "lag_seconds",
            (F.unix_timestamp(ref) - F.unix_timestamp("max_ts"))
            .cast("long"),
        )
        if max_lag_seconds is not None:
            out = out.withColumn(
                "stale",
                F.col("lag_seconds") > F.lit(int(max_lag_seconds)),
            )
    return out


def _benford_first_digit(x, precision: int):
    """Leading significant digit of ``|x|`` via the integer-mantissa
    route: scale to ``round(|x| * 10^p)`` (exact BIGINT), take the
    first character of its decimal string.  log10-free on purpose —
    ``floor(log10(v))`` flips at powers of ten under lib-specific
    last-ulp differences, which would make the digit engine-dependent;
    integer-to-string is bit-identical everywhere.  Values that scale
    to 0 (|x| < 0.5·10^-p) are invalid (null digit)."""
    m = F.round(F.abs(x) * F.lit(float(10 ** precision))).cast("long")
    return F.when(
        m > 0, F.substring(m.cast("string"), 1, 1).cast("int")
    )


def benford_digits(
    df: DataFrame,
    col: str,
    *,
    precision: int = 6,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-/degenerate-numbers screen for money-like,
    naturally-scaled columns.

    Output: 9 rows ``(digit, n, obs_frac, exp_frac, dev)`` where
    ``exp_frac = log10(1 + 1/d)`` and ``dev = obs_frac − exp_frac``;
    digits nobody hit still appear with ``n = 0`` (they count against
    conformity).  Nulls, zeros, non-finite values, values smaller than
    ``0.5·10^-precision``, and values whose scaled mantissa would
    overflow BIGINT are excluded from the denominator.

    Plan: one digit-grain aggregation (9 survivors) joined onto a
    9-row digit spine with the 1-row total broadcast — nothing beyond
    the first aggregation touches data-sized frames.
    """
    if not 0 <= precision <= 12:
        raise ValueError(f"precision must be in [0, 12]: {precision}")
    x = F.col(col).cast("double")
    ok = (
        x.isNotNull()
        & ~F.isnan(x)
        & (F.abs(x) < F.lit(9.0e18 / 10 ** precision))
    )
    d = _benford_first_digit(x, precision)
    counts = (
        df.where(ok)
        .select(d.alias("digit"))
        .where(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    spark = df.sparkSession
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    total = counts.agg(F.sum("n").alias("__tot"))
    joined = (
        spine.join(F.broadcast(counts), "digit", "left")
        .na.fill({"n": 0})
        .crossJoin(F.broadcast(total))
    )
    exp = F.log10(1.0 + 1.0 / F.col("digit").cast("double"))
    obs = F.try_divide(F.col("n").cast("double"), F.col("__tot"))
    return joined.select(
        "digit",
        "n",
        obs.alias("obs_frac"),
        exp.alias("exp_frac"),
        (obs - exp).alias("dev"),
    )


def benford_summary(
    df: DataFrame,
    col: str,
    *,
    precision: int = 6,
) -> DataFrame:
    """One-row Benford conformity report: ``n, chi2, pvalue (dof 8,
    Wilson-Hilferty), mad, max_abs_dev`` — MAD thresholds per Nigrini:
    < 0.006 close conformity, > 0.015 nonconformity (report, don't
    gate; scale inflates χ² on conforming data, MAD does not)."""
    from .drift import _norm_sf

    digits = benford_digits(df, col, precision=precision)
    agg = digits.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum(
            F.try_divide(
                F.col("dev") * F.col("dev"), F.col("exp_frac")
            )
        ).alias("__chi_over_n"),
        F.avg(F.abs(F.col("dev"))).alias("mad"),
        F.max(F.abs(F.col("dev"))).alias("max_abs_dev"),
    )
    chi2 = F.col("n") * F.col("__chi_over_n")
    k = F.lit(8.0)
    z = (
        F.pow(chi2 / k, F.lit(1.0 / 3.0)) - (1 - 2 / (9 * k))
    ) / F.sqrt(2 / (9 * k))
    return agg.select(
        "n",
        chi2.alias("chi2"),
        F.when(F.col("n") > 0, _norm_sf(z)).alias("pvalue"),
        "mad",
        "max_abs_dev",
    )
