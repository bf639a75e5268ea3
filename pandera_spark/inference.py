"""Schema inference: profile a DataFrame and emit a candidate schema.

Reference: /root/reference/pandera/schema_inference/pyspark.py:15-58 and
schema_statistics/pyspark.py:12-62 — per-column null counts via
``sum(when(isNull))``, min/max -> ge/le checks for numeric/datetime columns,
``isin`` for low-cardinality string columns, ``coerce=True`` on the result.

Spark-native upgrade: the reference runs several passes; we fold EVERY
statistic (null count, min, max, approx distinct) for EVERY column into ONE
``df.agg`` job, then fetch exact distinct values only for candidate
categorical columns (second tiny job on those columns alone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .checks import Check
from .components import Column
from .container import DataFrameSchema
from .engine import DATE_TYPES, NUMERIC_TYPES

_CATEGORY_LIMIT = 256  # reference schema_statistics/pyspark.py distinct cap


def infer_schema(
    df: DataFrame,
    *,
    categorical_columns: bool = True,
    category_limit: int = _CATEGORY_LIMIT,
) -> DataFrameSchema:
    """Infer a validation schema from data in at most two Spark jobs."""
    fields = df.schema.fields
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c = F.col(f.name)
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"nulls__{f.name}"))
        if isinstance(f.dataType, NUMERIC_TYPES + DATE_TYPES):
            aggs.append(F.min(c).alias(f"min__{f.name}"))
            aggs.append(F.max(c).alias(f"max__{f.name}"))
        if isinstance(f.dataType, T.StringType):
            aggs.append(
                F.approx_count_distinct(c).alias(f"adist__{f.name}")
            )
    row = df.agg(*aggs).first().asDict()

    # second tiny job: exact value sets for candidate categoricals only
    cat_values: dict[str, list] = {}
    if categorical_columns:
        cat_cols = [
            f.name
            for f in fields
            if isinstance(f.dataType, T.StringType)
            and (row.get(f"adist__{f.name}") or 0) <= category_limit
        ]
        if cat_cols:
            sets = df.agg(
                *[F.collect_set(F.col(c)).alias(c) for c in cat_cols]
            ).first()
            for c in cat_cols:
                cat_values[c] = sorted(sets[c])

    columns: dict[str, Column] = {}
    for f in fields:
        checks: list[Check] = []
        if isinstance(f.dataType, NUMERIC_TYPES + DATE_TYPES):
            lo, hi = row.get(f"min__{f.name}"), row.get(f"max__{f.name}")
            if lo is not None:
                checks.append(Check.ge(lo))
            if hi is not None:
                checks.append(Check.le(hi))
        elif f.name in cat_values and cat_values[f.name]:
            checks.append(Check.isin(cat_values[f.name]))
        nullable = (row.get(f"nulls__{f.name}") or 0) > 0
        columns[f.name] = Column(
            f.dataType,
            checks=checks,
            nullable=nullable,
            coerce=True,
            name=f.name,
        )
    return DataFrameSchema(columns, coerce=True, name="inferred_schema")


def profile(df: DataFrame) -> DataFrame:
    """Single-pass statistics profile as a long-format DataFrame:
    (col_name, null_count, distinct_estimate, min_str, max_str)."""
    spark = df.sparkSession
    fields = df.schema.fields
    aggs = []
    for f in fields:
        c = F.col(f.name)
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"nulls__{f.name}"))
        aggs.append(F.approx_count_distinct(c).alias(f"adist__{f.name}"))
        if isinstance(f.dataType, NUMERIC_TYPES + DATE_TYPES + (T.StringType,)):
            aggs.append(F.min(c).cast("string").alias(f"min__{f.name}"))
            aggs.append(F.max(c).cast("string").alias(f"max__{f.name}"))
    row = df.agg(*aggs).first().asDict()
    data = [
        (
            f.name,
            int(row.get(f"nulls__{f.name}") or 0),
            int(row.get(f"adist__{f.name}") or 0),
            row.get(f"min__{f.name}"),
            row.get(f"max__{f.name}"),
        )
        for f in fields
    ]
    schema = T.StructType(
        [
            T.StructField("col_name", T.StringType(), False),
            T.StructField("null_count", T.LongType(), False),
            T.StructField("distinct_estimate", T.LongType(), False),
            T.StructField("min_str", T.StringType(), True),
            T.StructField("max_str", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(data, schema)


def numeric_percentiles(
    df: DataFrame,
    cols: list[str],
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    *,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Percentiles for many columns in ONE job.

    Long-format result: ``(col_name, p50, p90, ...)`` — one row per
    input column (labels derived from ``probs``).  All percentile
    arrays are computed in a single ``agg``, then the one-row result is
    exploded to long format without touching the data again.

    The DEFAULT is ``approx_percentile`` — a Greenwald-Khanna sketch
    whose partial buffers are bounded (O(accuracy·log n) entries) and
    merge map-side, so the plan survives 100 TB; the result is always
    an ACTUAL data value (ANSI ``percentile_disc`` style, never
    interpolated) whose rank error is at most ``n/accuracy`` (so with
    ``accuracy >= n``, at most one rank).  ``exact=True`` opts into Spark's exact
    ``percentile`` (linear interpolation at rank ``p*(n-1)``, the ANSI
    ``percentile_cont``/DuckDB ``quantile_cont`` definition) — that
    aggregate buffers EVERY value per column in the final reducer, so
    reserve it for frames that fit (tens of millions of rows).
    """
    labels = [
        ("p" + f"{p * 100:g}".replace(".", "_")) for p in probs
    ]
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1, got {accuracy}")
    parr = F.array(*[F.lit(float(p)) for p in probs])

    def q(c: str):
        v = F.col(c).cast("double")
        if exact:
            return F.percentile(v, parr)
        return F.approx_percentile(v, parr, F.lit(int(accuracy)))

    agg = df.agg(*[q(c).alias(c) for c in cols])
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("col_name"), F.col(c).alias("q"))
            for c in cols
        ]
    )
    exploded = agg.select(F.explode(pairs).alias("s"))
    return exploded.select(
        F.col("s.col_name").alias("col_name"),
        *[F.col("s.q")[i].alias(lab) for i, lab in enumerate(labels)],
    )


def approx_profile(
    df: DataFrame,
    cols=None,
    *,
    rsd: float = 0.05,
    probs: "tuple[float, ...]" = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based profiling for corpora where exact statistics are too
    expensive: ONE aggregation job computes, per column, row/null
    counts, HyperLogLog++ approximate distinct (``rsd`` relative
    error), and — for numeric/date columns — min, max, mean and
    t-digest ``approx_percentile`` values (date/timestamp columns are
    epoch-seconds doubles in the stat slots).

    This is the 100 TB path of :func:`profile`: every sketch is
    map-side mergeable (no single-reducer sort the exact ``percentile``
    needs), so the job's combine tree stays balanced at any width.
    Long-format result: ``(col_name, n_rows, n_nulls, approx_distinct,
    min, max, mean, p<50>, ...)`` — non-numeric columns carry nulls in
    the numeric slots.
    """
    fields = [
        f for f in df.schema.fields if cols is None or f.name in (cols or [])
    ]
    if not fields:
        raise ValueError("no columns to profile")
    # date/timestamp columns participate via epoch-seconds cast (matching
    # the exact profile()'s numeric+date min/max coverage)
    numeric = {
        f.name for f in fields if isinstance(f.dataType, tuple(NUMERIC_TYPES))
    }
    dates = {
        f.name for f in fields if isinstance(f.dataType, tuple(DATE_TYPES))
    }
    numeric |= dates
    aggs = []
    for f in fields:
        c, name = F.col(f.name), f.name
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{name}"),
            F.count(F.when(c.isNull(), 1)).alias(f"__z_{name}"),
            F.approx_count_distinct(c, rsd).alias(f"__d_{name}"),
        ]
        if name in numeric:
            # date -> timestamp -> double: epoch seconds (DateType has no
            # direct double cast; TimestampType's double cast is epoch s)
            d = (
                c.cast("timestamp").cast("double")
                if name in dates
                else c.cast("double")
            )
            aggs += [
                F.min(d).alias(f"__min_{name}"),
                F.max(d).alias(f"__max_{name}"),
                F.avg(d).alias(f"__avg_{name}"),
                F.approx_percentile(
                    d,
                    F.array(*[F.lit(float(p)) for p in probs]),
                    F.lit(accuracy),
                ).alias(f"__p_{name}"),
            ]
    agg = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    rows = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("col_name"),
                F.col(f"__n_{f.name}").cast("long").alias("n_rows"),
                F.col(f"__z_{f.name}").cast("long").alias("n_nulls"),
                F.col(f"__d_{f.name}").cast("long").alias("approx_distinct"),
                (F.col(f"__min_{f.name}") if f.name in numeric else null_d)
                .alias("min"),
                (F.col(f"__max_{f.name}") if f.name in numeric else null_d)
                .alias("max"),
                (F.col(f"__avg_{f.name}") if f.name in numeric else null_d)
                .alias("mean"),
                *[
                    (
                        F.col(f"__p_{f.name}").getItem(i)
                        if f.name in numeric
                        else null_d
                    ).alias(f"p{int(p * 100)}")
                    for i, p in enumerate(probs)
                ],
            )
            for f in fields
        ]
    )
    flat = agg.select(F.explode(rows).alias("s"))
    return flat.select(*[f"s.{c}" for c in flat.select("s.*").columns])


def wilson_intervals(
    rep: DataFrame,
    *,
    z: float = 1.959964,
    keep: "tuple[str, ...]" = (),
) -> DataFrame:
    """Decorate a counter frame ``(col_name, check, violations,
    n_rows)`` with the estimated violation rate and its Wilson score
    interval — pure Column math over the O(checks)-row frame.  Output:
    ``(*keep, col_name, check, sample_rows, violations, rate, ci_lo,
    ci_hi)`` — ``keep`` carries extra group columns through.
    """
    n = F.col("n_rows").cast("double")
    p = F.try_divide(F.col("violations").cast("double"), n)
    z2 = float(z * z)
    denom = F.lit(1.0) + F.lit(z2) / n
    center = p + F.lit(z2) / (F.lit(2.0) * n)
    half = F.lit(float(z)) * F.sqrt(
        F.try_divide(p * (F.lit(1.0) - p), n)
        + F.lit(z2) / (F.lit(4.0) * n * n)
    )
    return rep.select(
        *keep,
        "col_name",
        "check",
        F.col("n_rows").cast("long").alias("sample_rows"),
        F.col("violations").cast("long").alias("violations"),
        p.alias("rate"),
        F.greatest(F.lit(0.0), F.try_divide(center - half, denom))
        .alias("ci_lo"),
        F.least(F.lit(1.0), F.try_divide(center + half, denom))
        .alias("ci_hi"),
    )


def validate_sample(
    schema,
    df: DataFrame,
    key_cols: "list[str]",
    *,
    fraction: float = 0.01,
    z: float = 1.959964,
    by: "list[str] | None" = None,
) -> DataFrame:
    """Statistical validation: run every row-resolvable check over a
    DETERMINISTIC hash sample and report per-check violation-rate
    estimates with Wilson score confidence intervals — the screening
    pass when even one full scan of a 100 TB table is too expensive
    (certify the sample; escalate to :func:`full validate
    <..container.DataFrameSchema.validate>` or the incremental path
    only when an interval crosses the budget).

    Membership is the portable 28-bit md5 hash of the concatenated
    ``key_cols`` (replayable by any engine, stable across runs and
    partitionings — never ``df.sample``'s RNG); the sample's counters
    come from the validator's ONE compiled aggregation pass; the CI
    arithmetic is pure Column math on the O(checks)-row result.

    Long-format result: ``(col_name, check, sample_rows, violations,
    rate, ci_lo, ci_hi)``; with ``by`` the result is per segment
    (``(*by, ...)`` — which source / day / shard is dirty) from the
    same single grouped aggregation.
    """
    from .backend.runner import groupwise_report
    from .operators.dedup import portable_hash28

    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"need 0 < fraction <= 1, got {fraction}")
    threshold = int(fraction * (1 << 28))
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    sample = df.where(portable_hash28(key) < F.lit(threshold))
    if by:
        # per-segment screening (which source / day is dirty?) — same
        # ONE grouped agg, one result row per (segment, check)
        rep = groupwise_report(schema, sample, list(by))
        return wilson_intervals(rep, z=z, keep=tuple(by))
    rep = groupwise_report(
        schema, sample.withColumn("__g", F.lit(1)), ["__g"]
    )
    return wilson_intervals(rep, z=z)


def candidate_keys(
    df: DataFrame,
    combos: "Sequence[Sequence[str]]",
    *,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Candidate-key / uniqueness discovery: for each column combo,
    total rows, rows where every combo column is non-null, the distinct
    combo count, and an ``is_key`` verdict (distinct == total — i.e.
    unique AND fully non-null).  The profiling step that proposes
    ``unique=`` constraints for :func:`infer_schema` and validates
    assumed join keys before they silently fan out.

    One aggregation job for ALL combos.  ``exact=True`` (default) uses
    ``count_distinct`` — note Spark plans n exact distincts in one agg
    via Expand (input amplified ×(n+1) pre-shuffle); fine for a
    handful of combos.  ``exact=False`` switches to HLL
    ``approx_count_distinct(rsd)`` — single pass, no Expand, the
    screening mode for wide combo lists at 100 TB (a combo can then
    only be REFUTED as a key, not confirmed; verdicts compare against
    the exact row counts so near-keys may flip either way within the
    sketch error).
    """
    combos = [list(c) for c in combos]
    if not combos or any(not c for c in combos):
        raise ValueError("combos must be non-empty lists of columns")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, combo in enumerate(combos):
        fields = [F.col(c) for c in combo]
        nn = None
        for c in combo:
            cond = F.col(c).isNotNull()
            nn = cond if nn is None else (nn & cond)
        aggs.append(F.sum(nn.cast("long")).alias(f"__nn{i}"))
        if exact:
            aggs.append(F.count_distinct(*fields).alias(f"__d{i}"))
        else:
            aggs.append(
                F.approx_count_distinct(
                    F.struct(*fields), rsd
                ).alias(f"__d{i}")
            )
    agg = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(",".join(c)).alias("combo"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__nn{i}").cast("long").alias("n_nonnull"),
                F.col(f"__d{i}").cast("long").alias("n_distinct"),
                (F.col(f"__d{i}") == F.col("__n")).alias("is_key"),
            )
            for i, c in enumerate(combos)
        ]
    )
    return agg.select(F.explode(rows).alias("s")).select(
        "s.combo", "s.n_rows", "s.n_nonnull", "s.n_distinct",
        "s.is_key",
    )
