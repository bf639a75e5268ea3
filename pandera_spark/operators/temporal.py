"""Temporal operators: as-of join, banded range join, time-bucket rollup.

Beyond-reference family (the reference validates single tables and has no
join/temporal operators — SURVEY §2.L "Joins: none in the reference");
these are the time-series primitives a large-scale event/training-data
pipeline needs, expressed Spark-first.

Design for 100 TB:
- ``asof_join`` is the union + partitioned-window formulation: ONE shuffle
  on the key columns, then a per-key sort inside each partition — never a
  range join (Spark would otherwise plan a broadcast-nested-loop or
  sort-merge with an inequality post-filter that degenerates on wide time
  ranges).  The right payload travels as a single struct so the window
  carries one ``last(ignorenulls)`` regardless of payload width.
- ``banded_range_join`` buckets time by the band width and explodes one
  side into its 3 adjacent buckets: an equi-join on (key, bucket) plus a
  residual band filter.  Shuffle is keyed on (key, bucket) — bounded
  duplication (3x of the smaller side), no cross product, AQE-splittable.
- ``time_rollup`` is a tumbling-window hash aggregate (map-side partial
  agg); ``rollup_reaggregate`` derives coarser resolutions from a finer
  rollup (hour -> day) without rescanning the fact table — the classic
  hypertable continuous-aggregate cascade.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column as C
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "banded_range_join",
    "time_rollup",
    "rollup_reaggregate",
    "rollup_anomalies",
    "sessionize",
    "session_stats",
    "funnel",
    "retention",
    "event_transitions",
    "rolling_stats",
    "ewma",
    "gap_report",
    "gap_fill",
    "cusum_changepoints",
    "acf",
    "mann_kendall",
    "time_weighted_mean",
    "theil_sen",
    "seasonality_profile",
    "holt_winters",
    "holt_winters_anomalies",
    "overdispersion_check",
]


def _epoch_us(col: C) -> C:
    """Microseconds-since-epoch that accepts TIMESTAMP *and* TIMESTAMP_NTZ.

    ``unix_micros`` rejects TIMESTAMP_NTZ (the parquet nano-ts shim reads
    event timestamps as NTZ), so cast first: a no-op for TIMESTAMP, and for
    NTZ the session-timezone shift cancels in every use here — bucketing and
    deltas compare two values shifted by the same offset.  Sessions should
    pin ``spark.sql.session.timeZone=UTC`` so NTZ epoch values are also
    absolute (and DST can't warp in-band distances).
    """
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: Sequence[str] | None = None,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_r",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: for every left row, the single right row with the
    greatest ``on`` <= left's (``backward``) or smallest ``on`` >= left's
    (``forward``), per ``by`` group; unmatched left rows keep nulls
    (pandas ``merge_asof`` semantics, left-join flavor).

    Implementation: tag and union both sides, then one window pass
    ``last(payload, ignorenulls=True)`` ordered by (ts, side) — right rows
    sort before left rows at equal timestamps, so exact matches are
    inclusive.  Forward direction flips the sort instead of re-deriving
    the window.  Ties *within* the right side at identical (by, ts) are
    broken arbitrarily — supply distinct timestamps per key for
    deterministic output.

    Scale: one shuffle on ``by``; per-key in-partition sort.  ``by=None``
    is a global as-of (single partition) — small-data path only.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    by = list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    out_names = [c + suffix for c in right_cols]

    payload = F.struct(
        F.col(on).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by],
    ).select(*by, "__on", "__side", "__p",
             *[c for c in left.columns if c not in by])
    l = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c) for c in left.columns if c not in by],
    )
    unioned = l.unionByName(r)

    ts_order = F.col("__on").asc() if direction == "backward" else F.col(
        "__on"
    ).desc()
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__m", F.last("__p", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        tol = int(tolerance_seconds * 1_000_000)
        dt = _epoch_us(F.col("__on")) - _epoch_us(F.col("__m.__ts"))
        if direction == "forward":
            dt = -dt
        matched = matched.withColumn(
            "__m", F.when(dt <= F.lit(tol), F.col("__m"))
        )

    return matched.select(
        *[F.col(c) for c in left.columns],
        F.col("__m.__ts").alias(on + suffix),
        *[F.col(f"__m.{c}").alias(o) for c, o in zip(right_cols, out_names)],
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    band_seconds: float,
    by: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with ``|left_on - right_on| <= band`` per
    ``by`` group — the bounded-interval join.

    Never a cross join: both sides bucket time by the band width; the left
    side explodes into its bucket and both neighbors (any in-band pair
    lands in one of those three), then an equi-join on (by, bucket) and a
    residual exact filter.  Column name collisions get a ``_r`` suffix on
    the right side.
    """
    if how != "inner":
        raise ValueError("banded_range_join supports how='inner'")
    by = list(by or [])
    band_us = int(band_seconds * 1_000_000)

    lbucket = F.floor(_epoch_us(F.col(left_on)) / F.lit(band_us))
    rbucket = F.floor(_epoch_us(F.col(right_on)) / F.lit(band_us))

    rename = {
        c: c + "_r"
        for c in right.columns
        if c in left.columns and c not in by
    }
    r = right.select(
        *[F.col(c) for c in by],
        *[F.col(c).alias(rename.get(c, c)) for c in right.columns
          if c not in by],
    ).withColumn("__b", rbucket if right_on not in rename
                 else F.floor(_epoch_us(F.col(rename[right_on]))
                              / F.lit(band_us)))
    l = left.withColumn(
        "__b", F.explode(F.array(lbucket - 1, lbucket, lbucket + 1))
    )
    ron = rename.get(right_on, right_on)
    joined = l.join(r, [*by, "__b"]).drop("__b")
    dt = _epoch_us(F.col(left_on)) - _epoch_us(F.col(ron))
    return joined.filter(F.abs(dt) <= F.lit(band_us))


def sessionize(
    df: DataFrame,
    *,
    by: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based session ids (the islands formulation): a new session
    starts when the time since the previous event of the same key is
    STRICTLY greater than ``gap_seconds`` — matching Spark's
    ``session_window``, which merges adjacent sessions (an event landing
    exactly on the previous session's end extends it).

    ``session_col`` is a per-key 1-based ordinal.  ONE shuffle on the key
    columns, then per-key sorted windows inside each partition — the
    same scale shape as :func:`asof_join`.
    """
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col(ts_col).asc()
    )
    us = _epoch_us(F.col(ts_col))
    prev = F.lag(us).over(w)
    brk = prev.isNull() | (us - prev > gap_seconds * 1_000_000)
    run = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col(ts_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        session_col,
        F.sum(F.when(brk, 1).otherwise(0)).over(run).cast("long"),
    )


def session_stats(
    df: DataFrame,
    *,
    by: Sequence[str],
    ts_col: str,
    gap: str,
    aggs: Mapping[str, C],
) -> DataFrame:
    """Per-session aggregates via the built-in ``session_window`` — the
    native Spark expression of gap sessionization (hash aggregate with
    session merge, no window sort; also valid under Structured Streaming
    with a watermark, unlike the :func:`sessionize` window form).

    Returns (by..., session_start, session_end, aggs...) where
    ``session_end`` = last event + gap.  ``gap`` is a SQL interval
    string like ``"30 minutes"``.
    """
    from pyspark.sql import types as T

    # cast only when needed (the parquet nano-ts shim yields NTZ): a
    # cast on an already-TIMESTAMP column would sever the watermark the
    # caller attached to it, breaking append-mode streaming
    ts = F.col(ts_col)
    if not isinstance(df.schema[ts_col].dataType, T.TimestampType):
        ts = ts.cast("timestamp")
    sw = F.session_window(ts, gap)
    out = df.groupBy(sw.alias("__sw"), *[F.col(c) for c in by]).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return out.select(
        *by,
        F.col("__sw.start").alias("session_start"),
        F.col("__sw.end").alias("session_end"),
        *aggs.keys(),
    )


def time_rollup(
    df: DataFrame,
    ts_col: str,
    *,
    resolution: str = "1 hour",
    keys: Sequence[str] = (),
    aggs: Mapping[str, C] | None = None,
) -> DataFrame:
    """Tumbling-window rollup: one hash aggregate over
    ``window(ts, resolution)`` x ``keys``.

    Returns (bucket_start: timestamp, *keys, *aggs).  ``aggs`` maps output
    name -> aggregate Column; default is a row count.  Map-side partial
    aggregation means the shuffle carries one partial row per
    (partition, bucket, keys) — at 100 TB the reducer sees aggregates,
    never events.
    """
    aggs = dict(aggs) if aggs else {"n_events": F.count(F.lit(1))}
    win = F.window(F.col(ts_col), resolution)
    return (
        df.groupBy(win.alias("__w"), *[F.col(k) for k in keys])
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .select(
            F.col("__w.start").alias("bucket_start"),
            *[F.col(k) for k in keys],
            *[F.col(name) for name in aggs],
        )
    )


def rollup_reaggregate(
    rollup: DataFrame,
    *,
    bucket_col: str = "bucket_start",
    resolution: str = "1 day",
    keys: Sequence[str] = (),
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Coarser rollup derived from a finer one (hour -> day) by
    re-aggregating decomposable aggregates (sum/count/min/max) — the fact
    table is never rescanned.  Input bucket timestamps must align to the
    coarser grid (every standard resolution chain does)."""
    win = F.window(F.col(bucket_col), resolution)
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return (
        rollup.groupBy(win.alias("__w"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("__w.start").alias(bucket_col),
            *[F.col(k) for k in keys],
            *[F.col(c) for c in (*sum_cols, *min_cols, *max_cols)],
        )
    )


def rollup_anomalies(
    rollup: DataFrame,
    metric_col: str,
    *,
    bucket_col: str = "bucket_start",
    keys: Sequence[str] = (),
    season: C | None = None,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Seasonal-baseline anomaly screen over a rollup: flag buckets whose
    metric deviates from the (keys x season) baseline by more than
    ``z_threshold`` population standard deviations.

    ``season`` defaults to hour-of-day (``F.hour(bucket_col)``) — the
    standard daily-seasonality model for event streams; pass e.g.
    ``F.dayofweek(...)`` for weekly patterns.  Output:
    ``(bucket_start, *keys, season, <metric>, baseline_mean,
    baseline_std, z)`` for anomalous buckets only.

    Plan: one hash aggregate over the rollup (already O(buckets) rows)
    builds the baseline, broadcast-joined back — the fact table is never
    rescanned, the baseline frame is |keys| x |season values| rows.
    Buckets whose baseline group has zero variance are only flagged when
    they differ from a constant baseline (z is +/-inf); groups with a
    single bucket are never flagged (std undefined => excluded).
    """
    season = season if season is not None else F.hour(F.col(bucket_col))
    base = rollup.select(
        *keys, season.alias("season"), F.col(metric_col).alias("__m")
    ).groupBy(*keys, "season").agg(
        F.avg("__m").alias("baseline_mean"),
        F.stddev_pop("__m").alias("baseline_std"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    fact = rollup.withColumn("season", season)
    joined = fact.join(F.broadcast(base), [*keys, "season"], "inner")
    m = F.col(metric_col).cast("double")
    z = F.when(
        F.col("baseline_std") > 0,
        (m - F.col("baseline_mean")) / F.col("baseline_std"),
    ).otherwise(
        F.when(m != F.col("baseline_mean"), F.lit(float("inf")))
        .otherwise(F.lit(0.0))
    )
    return (
        joined.withColumn("z", z)
        .filter((F.col("__cnt") > 1) & (F.abs(F.col("z")) > z_threshold))
        .drop("__cnt")
    )


def funnel(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: "list[str]",
    *,
    within_seconds: "float | None" = None,
) -> DataFrame:
    """Ordered-funnel counts with greedy earliest-match semantics:
    ``(step, step_name, n_users)`` — a user converts step ``i`` iff an
    event of ``steps[i]`` occurs strictly AFTER their chosen (earliest)
    time for step ``i-1``, and (with ``within_seconds``) no later than
    that many seconds after their step-1 time — the standard
    conversion-window constraint.

    Per step: one filtered min-timestamp aggregation on the user grain
    joined against the shrinking survivor frame — k steps cost k
    user-grain shuffles over progressively smaller sides (AQE picks
    broadcast once survivors fit).  No window over the whole event
    stream, no event ordering materialized."""
    if len(steps) < 1:
        raise ValueError("need at least one step")
    user, typ, ts = F.col(user_col), F.col(type_col), F.col(ts_col)
    prev = (
        df.filter(typ == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("__t"))
        .withColumn("__t0", F.col("__t"))
    )
    parts = [
        prev.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(1).alias("step"),
            F.lit(steps[0]).alias("step_name"),
            "n_users",
        )
    ]
    for i, s in enumerate(steps[1:], start=2):
        cand = (
            df.filter(typ == s)
            .join(prev.select(user_col, "__t", "__t0"), user_col)
            .filter(ts > F.col("__t"))
        )
        if within_seconds is not None:
            budget_us = int(within_seconds * 1_000_000)
            cand = cand.filter(
                _epoch_us(ts) - _epoch_us(F.col("__t0"))
                <= F.lit(budget_us)
            )
        prev = cand.groupBy(user_col).agg(
            F.min(ts).alias("__t"), F.min("__t0").alias("__t0")
        )
        parts.append(
            prev.agg(
                F.count(F.lit(1)).cast("long").alias("n_users")
            ).select(
                F.lit(i).alias("step"), F.lit(s).alias("step_name"),
                "n_users",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    max_offset: int = 7,
    grain: str = "day",
) -> DataFrame:
    """Cohort retention triangle: ``(cohort, day_offset, n_users)`` —
    users grouped by their first-activity period, counted on each later
    period they return (offset 0 = cohort size).

    Two user-grain aggregations (first-activity + distinct active
    periods) and one join; the counting groupBy runs on the already
    deduplicated (user, period) frame.  The standard corpus/product
    freshness dashboard.  ``day_offset`` (and ``max_offset``) are
    always measured in DAYS — with ``grain='week'`` offsets land on
    multiples of 7."""
    if max_offset < 0:
        raise ValueError("max_offset must be >= 0")
    period = F.date_trunc(grain, F.col(ts_col))
    first = df.groupBy(user_col).agg(F.min(period).alias("cohort"))
    active = df.select(
        F.col(user_col), period.alias("__d")
    ).distinct()
    j = active.join(first, user_col).withColumn(
        "day_offset",
        F.datediff(F.col("__d"), F.col("cohort")).cast("int"),
    )
    return (
        j.filter(F.col("day_offset") <= max_offset)
        .groupBy("cohort", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def event_transitions(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    *,
    tiebreak_cols: "Sequence[str]" = (),
) -> DataFrame:
    """First-order transition matrix over per-user event streams:
    ``(from_type, to_type, n)`` counting consecutive pairs — the
    Markov view of behavioral flows (and, on document streams, of
    section orderings).

    One window partitioned BY USER (per-task state is a single user's
    events) computes ``lead`` over (ts, *tiebreak) — pass tiebreak
    columns (e.g. an event id) whenever timestamps can collide so the
    ordering, and therefore the counts, are deterministic.  The
    counting groupBy shuffles O(type²) aggregated rows."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    nxt = F.lead(F.col(type_col)).over(w)
    return (
        df.select(
            F.col(type_col).alias("from_type"), nxt.alias("to_type")
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def rolling_stats(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    keys: Sequence[str],
    window_seconds: int,
    stats: Sequence[str] = ("count", "mean", "min", "max", "sum"),
) -> DataFrame:
    """Per-key trailing time-window statistics: for every event, the
    aggregate of ``value_col`` over the preceding ``window_seconds`` of
    the SAME key's events (inclusive of the current row) — the
    feature-engineering primitive behind "activity in the last 24 h"
    style signals.

    ONE shuffle partitioned by ``keys``; inside each partition a
    range-frame window over microsecond epochs (``RANGE BETWEEN w
    PRECEDING AND CURRENT ROW``) — per-task state is one key's events, so
    the plan parallelizes across keys at any corpus size.  The frame is a
    time RANGE, not ROWS: simultaneous events are all in-frame regardless
    of tie order, which keeps results deterministic without a tiebreak.
    Skew bound: the hottest key's events must sort in one task — screen
    with ``skew.skew_report`` before running on power-law keys.
    """
    span_us = int(window_seconds) * 1_000_000
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(_epoch_us(F.col(ts_col)))
        .rangeBetween(-span_us, 0)
    )
    v = F.col(value_col)
    exprs = {
        "count": F.count(v),
        "mean": F.avg(v),
        "min": F.min(v),
        "max": F.max(v),
        "sum": F.sum(v),
        "stddev": F.stddev_samp(v),
    }
    unknown = [s for s in stats if s not in exprs]
    if unknown:
        raise ValueError(f"unknown rolling stats: {unknown}")
    out = df
    for s in stats:
        col = exprs[s].over(w)
        if s == "count":
            col = col.cast("long")
        out = out.withColumn(f"roll_{s}", col)
    return out


def ewma(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    keys: Sequence[str],
    alpha: float = 0.3,
    span_rows: int = 64,
    tiebreak_cols: Sequence[str] = (),
    out_col: str = "ewma",
) -> DataFrame:
    """Truncated, normalized exponentially-weighted moving average per
    key: ``y_t = sum_j (1-a)^j x_{t-j} / sum_j (1-a)^j`` over the last
    ``span_rows`` events (pandas ``ewm(adjust=True)`` semantics, window
    truncated where the dropped tail weight is (1-a)^span_rows — 4e-10
    at the defaults).

    Plan: one shuffle on ``keys``; a ROWS-frame window collects the
    trailing value list (bounded at span_rows elements, so per-row state
    is O(span_rows) no matter how long the stream is), then a single
    Horner fold ``acc*(1-a) + x`` over the ascending list — a pure
    Catalyst higher-order function, zero UDF.  The fold is
    left-to-right double arithmetic, so any engine replaying the same
    order reproduces it bit-for-bit.  Order inside a key is (ts,
    *tiebreak): pass a tiebreak (event id) when timestamps collide or
    the fold order — hence the result — is nondeterministic.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    q = 1.0 - alpha
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(ts_col), *[F.col(c) for c in tiebreak_cols])
        .rowsBetween(-(span_rows - 1), 0)
    )
    xs = F.collect_list(F.col(value_col).cast("double")).over(w)
    num = F.aggregate(
        xs, F.lit(0.0), lambda acc, x: acc * F.lit(q) + x
    )
    den = (F.lit(1.0) - F.pow(F.lit(q), F.size(xs))) / F.lit(alpha)
    return df.withColumn(out_col, num / den)


def gap_report(
    df: DataFrame,
    ts_col: str,
    *,
    keys: Optional[Sequence[str]] = None,
    min_gap_seconds: float = 3600.0,
    tiebreak_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Silence detection: intervals between CONSECUTIVE events of a key
    stream longer than ``min_gap_seconds`` — the "sensor went dark" /
    "feed stopped" screen that row-level validation cannot see (every
    individual row is valid; the problem is what is missing between
    them).

    One shuffle on the keys, a LAG window per key (microsecond-epoch
    arithmetic, so sub-second gaps resolve exactly), then a filter —
    the same plan shape as :func:`rolling_stats`.  Output: the key
    columns + ``(gap_start, gap_end, gap_seconds)``, one row per
    offending gap.  Keyless (whole-table) form with ``keys=None`` uses
    a single ordered stream — fine for rollup grains, not for raw
    100 TB streams (document the key!).
    """
    keys = list(keys or [])
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = (
        Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
        if keys
        else Window.orderBy(*order)
    )
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = _epoch_us(F.col(ts_col)) - _epoch_us(prev)
    out = df.select(
        *[F.col(k) for k in keys],
        prev.alias("gap_start"),
        F.col(ts_col).alias("gap_end"),
        (gap_us.cast("double") / F.lit(1e6)).alias("gap_seconds"),
    )
    return out.where(
        F.col("gap_start").isNotNull()
        & (F.col("gap_seconds") > F.lit(float(min_gap_seconds)))
    )


def gap_fill(
    rollup: DataFrame,
    *,
    bucket_col: str = "bucket_start",
    step_seconds: int = 3600,
    keys: Sequence[str] = (),
    value_cols: Sequence[str] = (),
    strategy: str = "locf",
    fill_value: float = 0.0,
) -> DataFrame:
    """Densify a rollup onto a regular time spine and fill the holes.

    Input is bucket-grain (one row per ``keys`` x ``bucket_col`` — the
    output of :func:`time_rollup`); output has one row per key per
    ``step_seconds`` tick from that key's first to last observed
    bucket, with ``is_filled`` marking synthesized rows.  ``strategy``:
    ``"locf"`` carries the last observed value forward (gauge-style
    metrics), ``"zero"`` fills with ``fill_value`` (count-style
    metrics, where an absent bucket really means 0).

    Plan: the spine is ``sequence(min, max, step)`` exploded from ONE
    per-key min/max aggregate — per-key spans, not a global calendar
    cross — then one FULL OUTER join of the actuals (both sides hash
    on the same (keys, tick), co-partitioned) and, for LOCF, a
    ``last(ignorenulls)`` window PARTITIONED by key (single-task only
    if you call it keyless on one giant series — pass keys at scale).

    Misalignment: a bucket that is not ``min + k*step`` for its key
    (mixed grains, or a step that mismatches the rollup resolution)
    cannot land on a spine tick.  The full-outer join SURFACES such
    rows — ``is_misaligned`` is true on them (and false elsewhere) —
    rather than silently dropping them as a spine-side left join
    would; they still feed LOCF in timestamp order.  On aligned input
    (any :func:`time_rollup` output with a matching step) every
    ``is_misaligned`` is false and the result is identical to the
    left-join form.
    """
    if strategy not in ("locf", "zero"):
        raise ValueError(f"strategy must be locf or zero: {strategy!r}")
    key_list = list(keys)
    vals = list(value_cols)
    missing = [
        c for c in [bucket_col, *key_list, *vals] if c not in rollup.columns
    ]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    step = int(step_seconds)
    if step <= 0:
        raise ValueError(f"step_seconds must be > 0: {step_seconds}")
    b = F.col(bucket_col)
    spans = rollup.groupBy(*[F.col(k) for k in key_list]).agg(
        F.min(b).alias("__lo"), F.max(b).alias("__hi")
    )
    spine = spans.select(
        *[F.col(k) for k in key_list],
        F.explode(
            F.sequence(
                F.col("__lo").cast("timestamp"),
                F.col("__hi").cast("timestamp"),
                F.expr(f"INTERVAL {step} SECOND"),
            )
        ).alias(bucket_col),
        F.lit(1).alias("__tick"),
    )
    actual = rollup.select(
        *[F.col(k) for k in key_list],
        b.alias(bucket_col),
        F.lit(1).alias("__seen"),
        *[F.col(v) for v in vals],
    )
    joined = spine.join(actual, [*key_list, bucket_col], "full_outer")
    out = joined.withColumn(
        "is_filled", F.col("__seen").isNull()
    ).withColumn("is_misaligned", F.col("__tick").isNull())
    if strategy == "zero":
        for v in vals:
            out = out.withColumn(
                v, F.coalesce(F.col(v), F.lit(fill_value))
            )
    else:
        w = (
            Window.partitionBy(*[F.col(k) for k in key_list])
            .orderBy(F.col(bucket_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for v in vals:
            out = out.withColumn(
                v, F.last(F.col(v), ignorenulls=True).over(w)
            )
    return out.drop("__seen", "__tick")


def cusum_changepoints(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    keys: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Single most-likely mean-shift changepoint per key, via the
    cumulative-sum (Taylor) estimator: ``S_i = Σ_{j<=i}(x_j − x̄)``,
    changepoint at ``argmax |S_i|``.

    One row per key: ``n, mean, std, cp_ts, cp_index, s_at_cp,
    s_max_abs, s_range, strength, mean_before, mean_after`` where
    ``s_range = max(S) − min(S)`` and
    ``strength = s_range / (σ·√n)`` — the scale-free shift magnitude
    (≳3 is a strong shift; a flat series diffuses around √n·σ·const).
    ``mean_before``/``mean_after`` are the segment means either side
    of the changepoint (after is null when it lands on the last row).
    Significance by bootstrap is deliberately omitted (RNG-free
    contract); rank ``strength`` across keys instead.

    Plan: ONE shuffle on the keys, then window passes that all reuse
    the same partitioning — a row-frame cumulative sum over
    ``(ts, *tiebreak_cols)`` (make the ordering unique: peers are NOT
    pooled, so a non-unique order is nondeterministic), whole-
    partition aggregates, and a rank-1 filter.  Keyless use collapses
    to one task — pass keys at scale (same contract as
    :func:`rolling_stats`).
    """
    key_list = list(keys)
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    pb = [F.col(k) for k in key_list]
    w_ord = (
        Window.partitionBy(*pb)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seq = Window.partitionBy(*pb).orderBy(*order)
    w_full = (
        Window.partitionBy(*pb)
        .rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    x = F.col(value_col).cast("double")
    base = (
        df.where(x.isNotNull())
        .withColumn("__rn", F.row_number().over(w_seq))
        .withColumn("__cum", F.sum(x).over(w_ord))
        .withColumn("__n", F.count(F.lit(1)).over(w_full))
        .withColumn("__mean", F.avg(x).over(w_full))
        .withColumn("__std", F.stddev_samp(x).over(w_full))
    )
    s = F.col("__cum") - F.col("__rn") * F.col("__mean")
    scored = (
        base.withColumn("__s", s)
        .withColumn("__smax", F.max(s).over(w_full))
        .withColumn("__smin", F.min(s).over(w_full))
        .withColumn(
            "__pick",
            F.row_number().over(
                Window.partitionBy(*pb).orderBy(
                    F.abs(F.col("__s")).desc(), *order
                )
            ),
        )
    )
    n = F.col("__n").cast("long")
    rng = F.col("__smax") - F.col("__smin")
    return scored.where(F.col("__pick") == 1).select(
        *key_list,
        n.alias("n"),
        F.col("__mean").alias("mean"),
        F.col("__std").alias("std"),
        F.col(ts_col).alias("cp_ts"),
        F.col("__rn").cast("long").alias("cp_index"),
        F.col("__s").alias("s_at_cp"),
        F.abs(F.col("__s")).alias("s_max_abs"),
        rng.alias("s_range"),
        F.try_divide(
            rng, F.col("__std") * F.sqrt(F.col("__n").cast("double"))
        ).alias("strength"),
        (F.col("__cum") / F.col("__rn")).alias("mean_before"),
        F.try_divide(
            F.col("__mean") * F.col("__n") - F.col("__cum"),
            (F.col("__n") - F.col("__rn")).cast("double"),
        ).alias("mean_after"),
    )


def acf(
    series: DataFrame,
    value_col: str,
    *,
    bucket_col: str = "bucket_start",
    step_seconds: int = 3600,
    max_lag: int = 6,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Sample autocorrelation of a regular time series at lags
    ``1..max_lag``: one row per (``keys``, ``lag``) with
    ``n_pairs, acf_value``.

    Input is a rolled-up series (:func:`time_rollup` output — one row
    per ``keys`` × bucket); ``step_seconds`` is the bucket stride.
    Standard biased estimator:
    ``r_k = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²`` with the
    mean and denominator over the FULL series, so ``r_0 ≡ 1`` and the
    estimates are positive-semidefinite across lags.  Gaps are allowed
    — a lag-k pair exists only where both endpoints do (run
    :func:`gap_fill` first for textbook contiguous semantics).

    Plan shape: the series is already aggregate-sized (one row per
    bucket, not per event), so everything here is cheap relative to
    the rollup that produced it — one grouped moment pass, then ONE
    equi-join on (keys, idx+lag) with the lag set exploded on the
    left (max_lag× a bucket-grain frame, never event-grain).  Global
    moments attach via a broadcast 1-row cross join, per-key moments
    via a hash join on ``keys``.
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    if step_seconds <= 0:
        raise ValueError("step_seconds must be > 0")
    keys = list(keys)
    base = (
        series.where(
            F.col(value_col).isNotNull() & F.col(bucket_col).isNotNull()
        )
        .select(
            *[F.col(k) for k in keys],
            F.floor(
                _epoch_us(F.col(bucket_col))
                / F.lit(int(step_seconds) * 1_000_000)
            ).alias("__idx"),
            F.col(value_col).cast("double").alias("__x"),
        )
    )
    moments = base.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).alias("__ss"),
    ).select(
        *[F.col(k) for k in keys],
        (F.col("__s") / F.col("__n")).alias("__xbar"),
        (F.col("__ss") - F.col("__s") * F.col("__s") / F.col("__n"))
        .alias("__den"),
    )
    if keys:
        centered = base.join(moments, keys)
    else:
        centered = base.crossJoin(F.broadcast(moments))
    lag_arr = F.array(*[F.lit(k) for k in range(1, max_lag + 1)])
    left = centered.select(
        *[F.col(k) for k in keys],
        F.explode(lag_arr).alias("lag"),
        (F.col("__idx") + F.col("lag")).alias("__tidx"),
        (F.col("__x") - F.col("__xbar")).alias("__ca"),
        F.col("__den"),
    )
    right = centered.select(
        *[F.col(k) for k in keys],
        F.col("__idx").alias("__tidx"),
        (F.col("__x") - F.col("__xbar")).alias("__cb"),
    )
    return (
        left.join(right, [*keys, "__tidx"])
        .groupBy(*[F.col(k) for k in keys], F.col("lag"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.try_divide(
                F.sum(F.col("__ca") * F.col("__cb")),
                F.first("__den"),
            ).alias("acf_value"),
        )
    )


def mann_kendall(
    series: DataFrame,
    value_col: str,
    *,
    bucket_col: str = "bucket_start",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Mann-Kendall monotonic-trend test over a rolled-up series: one
    row per ``keys`` group with ``n, s_stat, var_s, tau_b, z, pvalue``.

    ``S = Σ_{i<j} sign(x_j − x_i)`` ordered by time;
    ``Var(S) = [n(n−1)(2n+5) − Σ_p t_p(t_p−1)(2t_p+5)] / 18`` with the
    tie correction over value-tie groups, the ±1 continuity correction
    on z (Kendall 1975), and ``tau_b = S / √(n₀·(n₀ − n₁))`` with
    ``n₀ = n(n−1)/2`` and ``n₁ = Σ t_p(t_p−1)/2`` (time ties are zero
    by construction on a rollup grain).  The nonparametric complement
    to :func:`cusum_changepoints`: CUSUM finds a LEVEL SHIFT, this
    detects a monotonic DRIFT, robust to any monotone transform of the
    values.

    Plan shape: the input is a rollup (bucket grain, not events), so
    the pairwise formulation is a self-join with an ``i < j`` filter —
    O(n²/2) per key at BUCKET count n (an hourly month is ~360k
    pairs), never event-grain.  With ``keys`` it is a hash equi-join;
    the global case deliberately plans a (tiny, bucket-grain)
    cartesian pair expansion — that is the algorithm, not an accident.
    Tie counts come from one grouped pass.  For multi-year fine-grain
    series, re-aggregate coarser first (:func:`rollup_reaggregate`).
    """
    keys = list(keys)
    jk = keys if keys else ["__one"]
    base = series.where(
        F.col(value_col).isNotNull() & F.col(bucket_col).isNotNull()
    ).select(
        *[F.col(k) for k in keys],
        *([] if keys else [F.lit(1).alias("__one")]),
        _epoch_us(F.col(bucket_col)).alias("__t"),
        F.col(value_col).cast("double").alias("__x"),
    )
    left = base.select(
        *[F.col(k) for k in jk],
        F.col("__t").alias("__ti"), F.col("__x").alias("__xi"),
    )
    right = base.select(
        *[F.col(k) for k in jk],
        F.col("__t").alias("__tj"), F.col("__x").alias("__xj"),
    )
    s_frame = (
        left.join(right, jk)
        .where(F.col("__ti") < F.col("__tj"))
        .groupBy(*[F.col(k) for k in jk])
        .agg(
            F.sum(F.signum(F.col("__xj") - F.col("__xi")))
            .cast("double").alias("s_stat"),
        )
    )
    ties = (
        base.groupBy(*[F.col(k) for k in jk], F.col("__x"))
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
        .groupBy(*[F.col(k) for k in jk])
        .agg(
            F.sum("__c").alias("__n"),
            F.sum(
                F.col("__c") * (F.col("__c") - 1)
                * (2 * F.col("__c") + 5)
            ).alias("__tie"),
            F.sum(F.col("__c") * (F.col("__c") - 1) / 2.0)
            .alias("__tiepairs"),
        )
    )
    joined = s_frame.join(ties, jk)
    n = F.col("__n")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("__tie")
    ) / F.lit(18.0)
    s = F.col("s_stat")
    z = F.when(var_s > 0, F.when(
        s > 0, (s - 1) / F.sqrt(var_s)
    ).when(s < 0, (s + 1) / F.sqrt(var_s)).otherwise(F.lit(0.0)))
    n0 = n * (n - 1) / 2.0
    return joined.select(
        *[F.col(k) for k in keys],
        n.cast("long").alias("n"),
        s.alias("s_stat"),
        var_s.alias("var_s"),
        F.try_divide(
            s, F.sqrt(n0 * (n0 - F.col("__tiepairs")))
        ).alias("tau_b"),
        z.alias("z"),
        F.when(z.isNotNull(), 2.0 * _mk_norm_sf(F.abs(z)))
        .alias("pvalue"),
    )


def _mk_norm_sf(z: C) -> C:
    from .drift import _norm_sf

    return _norm_sf(z)


def time_weighted_mean(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    keys: Sequence[str] = (),
    horizon_end: str | None = None,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Time-weighted average (TWAP) per ``keys`` group over an
    IRREGULAR series: each observation is weighted by how long it was
    in force (until the next observation), so sparse-but-long-lived
    values are not drowned out by bursts — the correct mean for
    last-observation-carried-forward metrics (prices, gauge values,
    connection counts).

    One row per group: ``n, span_seconds, twap, simple_mean`` (the
    unweighted mean, for the bias-vs-burstiness diff).  The LAST
    observation per key has no successor: with ``horizon_end`` (an ISO
    timestamp string) it extends to the horizon; otherwise it is
    dropped from the weighting (standard half-open convention) but
    still counts in ``n``/``simple_mean``.  Rows with null ts/value
    drop.  Duplicate timestamps within a key make the in-force order
    ambiguous — pass ``tiebreak_cols`` (e.g. an event id) for a
    deterministic order; tied rows get zero duration except the last
    of the tie run.  Plan: ONE shuffle on ``keys`` for the lead()
    window, then a grouped aggregate.
    """
    keys = list(keys)
    tiebreak_cols = list(tiebreak_cols)
    base = df.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        *[F.col(k) for k in keys],
        _epoch_us(F.col(ts_col)).alias("__t"),
        F.col(value_col).cast("double").alias("__x"),
        *[F.col(c).alias(f"__tb_{i}")
          for i, c in enumerate(tiebreak_cols)],
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        "__t", *[f"__tb_{i}" for i in range(len(tiebreak_cols))]
    )
    nxt = F.lead("__t").over(w)
    if horizon_end is not None:
        horizon = _epoch_us(F.lit(horizon_end).cast("timestamp"))
        nxt = F.coalesce(nxt, horizon)
    dur = (nxt - F.col("__t")).cast("double") / 1e6
    dur = F.when(dur > 0, dur)  # negative horizon or ties -> excluded
    weighted = base.withColumn("__dur", dur)
    return weighted.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__dur").alias("span_seconds"),
        F.try_divide(
            F.sum(F.col("__x") * F.col("__dur")), F.sum("__dur")
        ).alias("twap"),
        F.avg("__x").alias("simple_mean"),
    )


def theil_sen(
    series: DataFrame,
    value_col: str,
    *,
    bucket_col: str = "bucket_start",
    step_seconds: int = 3600,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Theil-Sen robust trend line over a rolled-up series: one row
    per ``keys`` group with ``n, slope, intercept`` where ``slope``
    is the MEDIAN of all pairwise slopes (per ``step_seconds`` tick)
    and ``intercept`` the median of ``x − slope·t`` — the
    breakdown-point-29% alternative to least squares
    (:func:`pandera_spark.operators.stats.group_trend`), immune to a
    third of the buckets being outliers.  Pairs with identical ticks
    are skipped (vertical slope).

    Same plan scale as :func:`mann_kendall`: O(n²/2) pairs at BUCKET
    grain via a keyed self-equi-join (the global case is a documented
    tiny cartesian), then exact interpolated medians; the intercept
    pass joins the k-row slope frame back broadcast.
    """
    if step_seconds <= 0:
        raise ValueError("step_seconds must be > 0")
    keys = list(keys)
    jk = keys if keys else ["__one"]
    base = series.where(
        F.col(value_col).isNotNull() & F.col(bucket_col).isNotNull()
    ).select(
        *[F.col(k) for k in keys],
        *([] if keys else [F.lit(1).alias("__one")]),
        F.floor(
            _epoch_us(F.col(bucket_col))
            / F.lit(int(step_seconds) * 1_000_000)
        ).cast("double").alias("__t"),
        F.col(value_col).cast("double").alias("__x"),
    )
    left = base.select(
        *[F.col(k) for k in jk],
        F.col("__t").alias("__ti"), F.col("__x").alias("__xi"),
    )
    right = base.select(
        *[F.col(k) for k in jk],
        F.col("__t").alias("__tj"), F.col("__x").alias("__xj"),
    )
    slopes = (
        left.join(right, jk)
        .where(F.col("__ti") < F.col("__tj"))
        .groupBy(*[F.col(k) for k in jk])
        .agg(
            F.median(
                (F.col("__xj") - F.col("__xi"))
                / (F.col("__tj") - F.col("__ti"))
            ).alias("slope"),
        )
    )
    joined = base.join(F.broadcast(slopes), jk)
    return (
        joined.groupBy(*[F.col(k) for k in jk])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.first("slope").alias("slope"),
            F.median(
                F.col("__x") - F.col("slope") * F.col("__t")
            ).alias("intercept"),
        )
        .select(*keys, "n", "slope", "intercept")
    )


def seasonality_profile(
    df: DataFrame,
    ts_col: str,
    *,
    grain: str = "dow",
) -> DataFrame:
    """Arrival-time seasonality profile of ``ts_col`` — the first look
    at any event stream (is traffic actually diurnal/weekly?  is a
    "drift" alarm just the weekend?), and the expected-weights input
    for gating screens (feed the shares to ``abtest.srm_check`` to
    test a NEW window against this baseline).

    ``grain``: ``"dow"`` (day of week, 0 = Sunday — the ANSI/DuckDB
    convention, i.e. Spark's ``dayofweek − 1``), ``"hour"`` (0-23) or
    ``"dowhour"`` (0-167: dow·24 + hour).  One row per OBSERVED
    bucket: ``bucket, n, share, dev_uniform`` where ``dev_uniform`` is
    the signed share deviation from the uniform baseline over the
    grain's FULL bucket count (absent buckets simply don't emit a
    row — their deviation is −1/buckets by definition).

    ONE hash aggregation on a ≤168-value key (map-side combined —
    bytes per task at any corpus size) + a window over the bucket
    frame.  Counts are integers, so an external SQL engine replays
    the profile exactly.
    """
    ts = F.col(ts_col)
    if grain == "dow":
        bucket, n_buckets = F.dayofweek(ts) - 1, 7
    elif grain == "hour":
        bucket, n_buckets = F.hour(ts), 24
    elif grain == "dowhour":
        bucket, n_buckets = (F.dayofweek(ts) - 1) * 24 + F.hour(ts), 168
    else:
        raise ValueError(f"unknown grain: {grain!r}")
    cnt = (
        df.where(ts.isNotNull())
        .groupBy(bucket.cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    share = F.col("n") / F.sum("n").over(Window.partitionBy())
    return cnt.select(
        "bucket", "n",
        share.alias("share"),
        (share - 1.0 / float(n_buckets)).alias("dev_uniform"),
    )


def holt_winters(
    df: DataFrame,
    ts_col: str,
    value,
    *,
    grain: str = "hour",
    season_length: int = 24,
    alpha: float = 0.25,
    beta: float = 0.125,
    gamma: float = 0.25,
    state_grid: "int | None" = None,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential) smoothing of a
    bucketed series — the seasonality-aware baseline for arrival-rate
    monitoring (``seasonal_baseline`` assumes a STABLE hour-of-week
    profile; this one tracks level/trend drift through the season).

    ``value`` is an aggregate Column evaluated per ``grain`` bucket
    (e.g. ``F.count(F.lit(1))`` for arrival counts).  One row per
    bucket: ``bucket_ts, y, level, trend, seasonal, fitted, resid``
    with the standard recurrences (m = ``season_length``)::

        fitted_t = L_{t-1} + B_{t-1} + S_{t-m}
        L_t = α(y_t − S_{t-m}) + (1−α)(L_{t-1} + B_{t-1})
        B_t = β(L_t − L_{t-1}) + (1−β)B_{t-1}
        S_t = γ(y_t − L_t) + (1−γ)S_{t-m}

    initialized the textbook way: ``L_0`` = mean of season 1, ``B_0``
    = (mean of season 2 − mean of season 1)/m, initial seasonals =
    season-1 deviations from ``L_0``.  Needs ≥ 2m buckets (returns an
    EMPTY frame otherwise — gate upstream); missing buckets are not
    imputed (run :func:`gap_fill` first for a strict lattice).  The
    default α/β/γ are exact binary fractions so 1−α etc. carry no
    rounding and an external engine replays the arithmetic
    digit-for-digit.

    ``state_grid`` (e.g. ``1_000_000``) switches the recurrence onto an
    exact integer grid of ``1/state_grid`` units: inputs are snapped to
    the grid (``floor(y*S + 0.5)``) and every smoothing update rounds
    its result back to the grid with ``floor(x + 0.5)``.  With dyadic
    α/β/γ (small numerators — the defaults are 1/4, 1/8, 1/4) every
    intermediate of every update is *exactly representable* in an IEEE
    double — a small-numerator dyadic times an integer, sums of
    like-grid dyadics, ``+0.5``, ``floor`` — so the arithmetic carries
    zero rounding error and ANY IEEE-754 engine (a SQL oracle, a
    different libm, an FMA-contracting compiler) replays the state
    sequence bit-for-bit.  Outputs are the grid integers divided by
    ``S`` (one correctly-rounded, hence deterministic, division each).
    This is the mode to use when the series is pinned against an
    external replay; a 720-step free-floating double recurrence WILL
    eventually straddle any fixed decimal-rounding comparison grid.

    Scale shape: ONE aggregation collapses the data to the bucket
    grain (map-side combine; hourly × years = tens of thousands of
    rows), then the inherently-sequential recurrence runs in a single
    Arrow-batched ``applyInPandas`` over that BOUNDED frame — the
    same bounded-frame pattern as the PAV sweep.  The data itself
    never reaches Python.
    """
    import pandas as pd  # noqa: F401 - applyInPandas contract

    if season_length < 2:
        raise ValueError(
            f"season_length must be >= 2, got {season_length}"
        )
    m = int(season_length)
    a, b, g = float(alpha), float(beta), float(gamma)
    if state_grid is not None:
        from fractions import Fraction

        S = int(state_grid)
        if S < 1:
            raise ValueError(f"state_grid must be >= 1, got {state_grid}")
        for nm, coef in (("alpha", a), ("beta", b), ("gamma", g)):
            fr = Fraction(coef)
            # exactness of coef*int and (1-coef)*int for grid-scale ints
            # needs a short dyadic numerator (defaults: 1/4, 1/8, 1/4)
            if fr.numerator.bit_length() > 8 or fr.denominator > 256:
                raise ValueError(
                    f"state_grid mode needs a small dyadic {nm}, got {coef}"
                )
    buckets = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts")
        )
        .agg(value.cast("double").alias("y"))
    )
    out_schema = (
        "bucket_ts timestamp, y double, level double, trend double, "
        "seasonal double, fitted double, resid double"
    )

    def _hw_grid(pdf):
        # Exact-grid replay: state is integer multiples of 1/S.  Every
        # update below is exactly representable in an IEEE double
        # (small-numerator dyadic coefficient x integer, like-grid
        # sums, +0.5, floor), so a SQL oracle running the same formulas
        # on DOUBLEs reproduces the state sequence bit-for-bit; the
        # only non-exact ops are the three init divisions by m and the
        # final /S per cell, each a single correctly-rounded IEEE
        # division and therefore engine-independent too.
        import math

        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        n = len(pdf)
        if n < 2 * m:
            return pdf.iloc[0:0][["bucket_ts", "y"]].assign(
                level=0.0, trend=0.0, seasonal=0.0,
                fitted=0.0, resid=0.0,
            )
        Sf = float(S)
        fm = float(m)
        yv = [float(v) for v in pdf["y"].to_numpy()]
        ys = [math.floor(v * Sf + 0.5) for v in yv]
        if max(abs(v) for v in ys) >= 2 ** 44:
            raise ValueError(
                "state_grid overflow: |y|*state_grid must stay < 2^44"
            )
        s1 = 0.0
        for i in range(m):
            s1 += ys[i]
        s2 = 0.0
        for i in range(m, 2 * m):
            s2 += ys[i]
        lvl = math.floor(s1 / fm + 0.5)
        l0b = math.floor(s2 / fm + 0.5)
        tr = math.floor((l0b - lvl) / fm + 0.5)
        seas = [ys[i] - lvl for i in range(m)]
        ca, cb, cg = 1.0 - a, 1.0 - b, 1.0 - g
        level = [0.0] * n
        trend = [0.0] * n
        seasonal = [0.0] * n
        fitted = [0.0] * n
        resid = [0.0] * n
        for t in range(n):
            s_use = seas[0]
            f_s = lvl + tr + s_use
            lvl_new = math.floor(
                a * (ys[t] - s_use) + ca * (lvl + tr) + 0.5
            )
            tr_new = math.floor(b * (lvl_new - lvl) + cb * tr + 0.5)
            s_new = math.floor(g * (ys[t] - lvl_new) + cg * s_use + 0.5)
            seas = seas[1:] + [s_new]
            lvl, tr = lvl_new, tr_new
            level[t] = lvl / Sf
            trend[t] = tr / Sf
            seasonal[t] = s_new / Sf
            fitted[t] = f_s / Sf
            resid[t] = (ys[t] - f_s) / Sf
        return pdf.assign(
            level=level, trend=trend, seasonal=seasonal, fitted=fitted,
            resid=resid,
        )[["bucket_ts", "y", "level", "trend", "seasonal", "fitted",
           "resid"]]

    def _hw(pdf):
        if state_grid is not None:
            return _hw_grid(pdf)
        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        n = len(pdf)
        if n < 2 * m:
            return pdf.iloc[0:0][["bucket_ts", "y"]].assign(
                level=0.0, trend=0.0, seasonal=0.0,
                fitted=0.0, resid=0.0,
            )
        y = pdf["y"].to_numpy()
        # index-order accumulation (not pairwise) so the SQL replay's
        # sequential AVG agrees beyond rounding noise
        s1 = 0.0
        s2 = 0.0
        for i in range(m):
            s1 += y[i]
        for i in range(m, 2 * m):
            s2 += y[i]
        lvl = s1 / m
        tr = (s2 / m - s1 / m) / m
        seas = [y[i] - lvl for i in range(m)]
        level = [0.0] * n
        trend = [0.0] * n
        seasonal = [0.0] * n
        fitted = [0.0] * n
        for t in range(n):
            s_use = seas[0]
            fitted[t] = lvl + tr + s_use
            lvl_new = a * (y[t] - s_use) + (1.0 - a) * (lvl + tr)
            tr_new = b * (lvl_new - lvl) + (1.0 - b) * tr
            s_new = g * (y[t] - lvl_new) + (1.0 - g) * s_use
            seas = seas[1:] + [s_new]
            lvl, tr = lvl_new, tr_new
            level[t] = lvl
            trend[t] = tr
            seasonal[t] = s_new
        pdf = pdf.assign(
            level=level, trend=trend, seasonal=seasonal, fitted=fitted,
        )
        pdf["resid"] = pdf["y"] - pdf["fitted"]
        return pdf[["bucket_ts", "y", "level", "trend", "seasonal",
                    "fitted", "resid"]]

    return (
        buckets.groupBy(F.lit(1).alias("__g"))
        .applyInPandas(
            lambda _key, pdf: _hw(pdf), schema=out_schema
        )
    )


def overdispersion_check(
    df: DataFrame,
    ts_col: str,
    *,
    grain: str = "hour",
    by: "Sequence[str] | None" = None,
) -> DataFrame:
    """Poisson overdispersion screen on arrival counts — the
    model-choice gate for every count-based monitor: a Poisson
    assumption (variance = mean) under real traffic is usually wrong
    (bursts, daily cycles), and alarms sized on it fire constantly.
    Run this before trusting a Poisson control chart; if it fires,
    size alarms on the negative-binomial fit it returns (or subtract
    seasonality first — :func:`holt_winters` residuals — and re-test).

    Buckets arrivals per ``grain`` (and optional ``by`` keys), then
    one moment aggregation per group over the BUCKET frame:

    - ``dispersion`` = s²/x̄ (variance-to-mean ratio; 1 under Poisson)
    - ``chi2_stat`` = (n−1)·s²/x̄, the classic Poisson dispersion
      (index-of-dispersion) test, χ²(n−1) under H0; ``pvalue`` via
      the shared Wilson-Hilferty replay
    - ``nb_r``/``nb_p``: method-of-moments negative-binomial fit
      (r = x̄²/(s²−x̄), p = x̄/s²), NULL when s² ≤ x̄ (no
      overdispersion to model)

    Scale shape: ONE aggregation to the (by, bucket) grain (map-side
    combined), ONE moment aggregation over that bounded frame.  All
    guards ANSI-safe via try_divide.  Buckets with zero arrivals do
    not emit rows — run :func:`gap_fill` first when silence itself is
    signal (dispersion is understated if empty buckets are dropped).
    """
    keys = list(by or [])
    buckets = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            *keys,
            F.date_trunc(grain, F.col(ts_col)).alias("__b"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("__y"))
    )
    agg = buckets.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.avg("__y").alias("mean_count"),
        F.var_samp("__y").alias("var_count"),
    )
    mean = F.col("mean_count")
    var = F.col("var_count")
    disp = F.try_divide(var, mean)
    chi2 = F.when(
        (F.col("n_buckets") > 1) & (mean > 0),
        (F.col("n_buckets") - 1) * F.try_divide(var, mean),
    )
    dofd = (F.col("n_buckets") - 1).cast("double")
    z = (
        F.pow(F.try_divide(chi2, dofd), F.lit(1.0 / 3.0))
        - (1 - 2 / (9 * dofd))
    ) / F.sqrt(2 / (9 * dofd))
    from .drift import _norm_sf

    over = var > mean
    return agg.select(
        *keys,
        "n_buckets", "mean_count", "var_count",
        disp.alias("dispersion"),
        chi2.alias("chi2_stat"),
        F.when(chi2.isNotNull() & (dofd > 0), _norm_sf(z))
        .alias("pvalue"),
        F.when(over, F.try_divide(mean * mean, var - mean))
        .alias("nb_r"),
        F.when(over, F.try_divide(mean, var)).alias("nb_p"),
    )


def holt_winters_anomalies(
    df: DataFrame,
    ts_col: str,
    value,
    *,
    grain: str = "hour",
    season_length: int = 24,
    alpha: float = 0.25,
    beta: float = 0.125,
    gamma: float = 0.25,
    k: float = 3.5,
    warmup: Optional[int] = None,
    storage_level: Optional[str] = "MEMORY_AND_DISK",
) -> DataFrame:
    """Seasonality-adjusted anomaly screen: :func:`holt_winters`
    residuals fenced by robust MAD limits — the upgrade over
    ``seasonal_baseline``'s |z| rule when level or trend drifts
    through the season (a slow ramp would otherwise light up every
    bucket of the new regime).

    Per bucket: ``bucket_ts, y, fitted, resid, robust_z, is_anomaly``
    where ``robust_z = (resid − median(resid)) / (1.4826·MAD)`` (the
    Iglewicz–Hoaglin modified z over the residual series — immune to
    the anomalies themselves, unlike a stddev fence) and
    ``is_anomaly = |robust_z| > k``.  The first ``warmup`` buckets
    (default ``season_length``) are excluded from BOTH the fence fit
    and flagging — the smoother is still converging there.

    Zero-MAD degeneracy (an exactly-fitted series: more than half the
    residuals are 0, so MAD = 0 and the spike it should catch divides
    by zero) falls back to the Iglewicz–Hoaglin alternative scale
    ``1.253314 · meanAD``; when THAT is also 0 (all residuals equal)
    ``robust_z`` is NULL and nothing flags.

    Scale shape: the residual frame is the BOUNDED bucket grain.  The
    fence fit is inherently two passes over it (median first, then
    the median of |resid − med|), each broadcast back as a 1-row
    frame — so the smoothed frame is PERSISTED (``storage_level``,
    None to disable) before fan-out; without that, every action would
    re-run the sequential smoother once per plan branch.
    """
    hw = holt_winters(
        df, ts_col, value, grain=grain, season_length=season_length,
        alpha=alpha, beta=beta, gamma=gamma,
    )
    w = int(season_length if warmup is None else warmup)
    wnum = Window.orderBy("bucket_ts")
    scored = hw.withColumn("__i", F.row_number().over(wnum)).where(
        F.col("__i") > w
    )
    if storage_level:
        from pyspark import StorageLevel

        scored = scored.persist(getattr(StorageLevel, storage_level))
    fence = scored.agg(
        F.percentile(F.col("resid"), F.lit(0.5)).alias("__med"),
    )
    dev = scored.crossJoin(F.broadcast(fence)).withColumn(
        "__ad", F.abs(F.col("resid") - F.col("__med"))
    )
    mad = dev.agg(
        F.percentile(F.col("__ad"), F.lit(0.5)).alias("__mad"),
        F.avg(F.col("__ad")).alias("__meanad"),
    )
    scale = F.when(
        F.col("__mad") > 0, F.lit(1.4826) * F.col("__mad")
    ).when(
        F.col("__meanad") > 0, F.lit(1.253314) * F.col("__meanad")
    )
    z = F.try_divide(F.col("resid") - F.col("__med"), scale)
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "bucket_ts", "y", "fitted", "resid",
            z.alias("robust_z"),
            F.coalesce(
                F.abs(z) > F.lit(float(k)), F.lit(False)
            ).alias("is_anomaly"),
        )
    )
