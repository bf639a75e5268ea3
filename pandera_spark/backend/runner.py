"""Single-pass validation executor.

The reference pyspark backend launches one Spark ACTION per data check
(``df.filter(~cond).limit(1).count()`` — backends/pyspark/builtin_checks.py:49;
groupBy-count per unique spec — backends/pyspark/container.py:532-540;
``distinct().collect()`` — builtin_checks.py:418-421): O(#checks) scans.

This executor compiles the whole schema into:

  1. zero-job driver metadata checks (column presence, dtype, order, strict,
     duplicate labels — reference backends/pyspark/container.py:251-379,
     562-637, column.py:153-212);
  2. ONE ``df.agg(...)`` pass computing every violation count, null count,
     coercion-error count and ``collect_set`` at once (map-side partial
     aggregation, no shuffle besides the final 1-row exchange — SURVEY.md §4);
  3. one ``groupBy`` job per declared uniqueness constraint (only if set).

At 100 TB this means: a single full scan with all predicates fused into one
WholeStageCodegen stage, column pruning down to the checked columns, and no
per-check job-scheduling overhead.  Coercion-error counters read the
pre-cast column carried alongside the casted one in the same projection, so
coercion costs no extra scan.

Execution order mirrors reference backends/pyspark/container.py:74-116:
strict_filter -> add_missing_columns -> coerce -> defaults -> parsers ->
column names unique -> column presence -> unique -> component checks ->
dataframe checks.
"""

from __future__ import annotations

from collections import Counter
from typing import TYPE_CHECKING, Any, Optional

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..checks import Check
from ..config import ValidationDepth, get_config
from ..engine import dtype_equal
from ..errors import (
    SchemaError,
    SchemaErrorReason,
    UnsupportedDtypeError,
)
from ..report import CheckOutcome, ErrorHandler, ValidationResult

if TYPE_CHECKING:  # pragma: no cover
    from ..container import DataFrameSchema

_ORIG_PREFIX = "__pandera_orig__"


def _schema_depth_on(cfg) -> bool:
    return cfg.validation_depth in (
        ValidationDepth.SCHEMA_ONLY,
        ValidationDepth.SCHEMA_AND_DATA,
    )


def _data_depth_on(cfg) -> bool:
    return cfg.validation_depth in (
        ValidationDepth.DATA_ONLY,
        ValidationDepth.SCHEMA_AND_DATA,
    )


def _violation_count_expr(cond: SparkCol, key: str) -> SparkCol:
    """count of rows where ``cond`` holds, as a non-null long."""
    return F.count(F.when(cond, F.lit(1))).alias(key)


class _Ctx:
    """Mutable compilation context for one validate run."""

    def __init__(self, schema: "DataFrameSchema", df: DataFrame, lazy: bool):
        self.schema = schema
        self.df = df
        self.handler = ErrorHandler(lazy)
        self.outcomes: list[CheckOutcome] = []
        self.agg_exprs: list[SparkCol] = []
        # key -> (finalize callable taking the agg row dict)
        self.finalizers: list = []
        self.pass_conditions: list[SparkCol] = []  # for drop_invalid_rows
        self.unique_specs: list[tuple[str, ...]] = []
        self.deferred: list = []  # post-agg jobs (grouped hypotheses)
        # (column|None, label, violation_cond, n_failure_cases|None) for
        # on-demand failure-case extraction
        self.failure_specs: list[tuple] = []
        # (key, violation_expr, colname, check) for window-based monotonic
        # checks — folded into ONE shared finalizer job however many there
        # are (windows can't ride the main agg pass)
        self.mono_specs: list[tuple] = []
        self.metrics: dict = {}

    def outcome(
        self,
        column: Optional[str],
        check: str,
        reason_code: SchemaErrorReason,
        passed: bool,
        violations: int = 0,
        message: str = "",
    ) -> None:
        o = CheckOutcome(
            schema=self.schema.name or "schema",
            column=column,
            check=check,
            reason_code=reason_code,
            passed=passed,
            violations=violations,
            message=message,
        )
        self.outcomes.append(o)
        if not passed:
            self.handler.collect(
                SchemaError(
                    schema_name=o.schema,
                    column=column,
                    check=check,
                    reason_code=reason_code,
                    message=message or f"check '{check}' failed",
                    failure_cases_count=violations,
                )
            )


def run_validation(
    schema: "DataFrameSchema",
    df: DataFrame,
    *,
    lazy: bool = True,
    head: Optional[int] = None,
    sample: Optional[float] = None,
    random_state: Optional[int] = None,
) -> ValidationResult:
    cfg = get_config()
    if not cfg.validation_enabled:
        # kill switch: reference api/pyspark/container.py:121-122
        return ValidationResult(schema.name or "schema", df)

    # subsampling (reference backends/pyspark/base.py:55-68)
    if head is not None:
        df = df.limit(head)
    if sample is not None:
        df = df.sample(fraction=sample, seed=random_state)

    cached = False
    if cfg.cache_dataframe:
        # reference backends/pyspark/decorators.py:107-172
        df = df.cache()
        cached = True

    ctx = _Ctx(schema, df, lazy)
    try:
        result = _run(ctx, cfg)
    finally:
        if cached and not cfg.keep_cached_dataframe:
            df.unpersist()
    return result


def strip_hidden(df: DataFrame) -> DataFrame:
    """Drop the hidden pre-cast originals carried for coerce-error
    accounting.  Apply AFTER any filter built from ``row_pass_condition``
    (the coerce predicates reference the hidden columns)."""
    return df.drop(*[c for c in df.columns if c.startswith(_ORIG_PREFIX)])


def _pairs_array(specs) -> SparkCol:
    """The (col_name, check, violations) struct array for the grouped
    report, built as ONE generated-SQL expression when every label is
    exactly renderable (one parser round trip instead of ~10 py4j calls
    per spec — measured 7.5k send_commands per groupwise build); falls
    back to the identical Column construction otherwise."""
    from pandera_spark.checks import (
        _SQL_LANE_VERSION_OK,
        _backslash_escapes_active,
        _sql_lit,
    )

    parts = []
    if _SQL_LANE_VERSION_OK:
        for i, (colname, label, _cond, _n) in enumerate(specs):
            cn = _sql_lit(colname if colname is not None else "<df>")
            lb = _sql_lit(label)
            if cn is None or lb is None:
                parts = None
                break
            parts.append(
                f"named_struct('col_name', {cn}, 'check', {lb},"
                f" 'violations', __v{i})"
            )
        if parts is not None and any("\\" in p for p in parts):
            # escaped literals mean something else under
            # spark.sql.parser.escapedStringLiterals=true
            if not _backslash_escapes_active():
                parts = None
    else:  # pragma: no cover - pyspark < 3.5
        parts = None
    if parts is not None:
        return F.expr("array(" + ", ".join(parts) + ")")
    return F.array(
        *[
            F.struct(
                F.lit(colname if colname is not None else "<df>").alias(
                    "col_name"
                ),
                F.lit(label).alias("check"),
                F.col(f"__v{i}").alias("violations"),
            )
            for i, (colname, label, _cond, _n) in enumerate(specs)
        ]
    )


def groupwise_report(
    schema: "DataFrameSchema", df: DataFrame, by: list[str]
) -> DataFrame:
    """Per-group violation counts for every row-resolvable check, in ONE
    grouped aggregation — segment-level data quality ("which source /
    partition / day is dirty?"), the grouped analogue of the engine's
    single-pass report.

    Reuses the exact compiled violation predicates the validator runs
    (``_Ctx.failure_specs``: column checks, not-nullable, dataframe-level
    checks, coerce cast errors), so a group's counts always reconcile
    with the global report.  Long-format result:
    ``(*by, col_name, check, violations, n_rows)`` — one row per
    (group, check).  The wide grouped agg shuffles one row per (task,
    group) thanks to map-side partial aggregation; the explode to long
    format happens on the already-aggregated frame (O(groups) rows).

    Aggregate-shaped checks (unique, hypotheses, monotonic) are
    whole-dataset properties and are not part of the per-group report.
    """
    ctx = _Ctx(schema, df, lazy=True)
    expansion = _expand_components(ctx, list(df.columns))
    transformed, coerce_agg_cols = _apply_transforms(ctx, expansion)
    _compile_column_checks(ctx, transformed, expansion)
    _compile_dataframe_checks(ctx, transformed)
    _compile_coerce_errors(ctx, coerce_agg_cols)
    specs = ctx.failure_specs
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, (_c, _label, cond, _n) in enumerate(specs):
        aggs.append(_violation_count_expr(cond, f"__v{i}"))
    agg = transformed.groupBy(*by).agg(*aggs)
    pairs = _pairs_array(specs)
    # reserved alias: a bare name like "s" would collide with a group
    # column of the same name (ambiguous-reference on the second select)
    return agg.select(
        *by,
        F.col("__n_rows").alias("n_rows"),
        F.explode(pairs).alias("__pair"),
    ).select(
        *by,
        "__pair.col_name",
        "__pair.check",
        "__pair.violations",
        "n_rows",
    )


def annotate_errors(
    schema: "DataFrameSchema",
    df: DataFrame,
    *,
    out_col: str = "failed_checks",
) -> DataFrame:
    """Row-level validation annotation: the input (post-transform) plus an
    ``array<string>`` column naming every row-resolvable check the row
    fails (``column:check_label``; empty array = clean row).

    The row-grain counterpart of the aggregated report — feeds quarantine
    triage ("WHY was this row rejected?") and per-check routing without a
    second validation pass.  Reuses the validator's compiled violation
    predicates (:class:`_Ctx.failure_specs`: column checks, not-nullable,
    dataframe-level checks, coerce cast errors), so the annotation always
    reconciles with the global report; it is a pure projection — no
    shuffle, no action, scan-bound at any scale.  Aggregate-shaped checks
    (unique, hypotheses, monotonic) are dataset properties, not row
    properties, and are not annotated.
    """
    ctx = _Ctx(schema, df, lazy=True)
    expansion = _expand_components(ctx, list(df.columns))
    transformed, coerce_agg_cols = _apply_transforms(ctx, expansion)
    _compile_column_checks(ctx, transformed, expansion)
    _compile_dataframe_checks(ctx, transformed)
    _compile_coerce_errors(ctx, coerce_agg_cols)
    tags = [
        F.when(cond, F.lit(f"{colname if colname is not None else '<df>'}:{label}"))
        for colname, label, cond, _n in ctx.failure_specs
    ]
    if tags:
        arr = F.array_compact(F.array(*tags))
    else:
        arr = F.expr("CAST(array() AS array<string>)")
    return strip_hidden(transformed.withColumn(out_col, arr))


def row_pass_condition(
    schema: "DataFrameSchema", df: DataFrame
) -> tuple[DataFrame, SparkCol]:
    """Compile the conjunction of every row-resolvable check predicate —
    the ``drop_invalid_rows`` condition — WITHOUT running any Spark action.

    Returns (transformed_df, pass_cond): the post-transform projection
    (strict-filter / coerce / defaults / parsers applied, hidden pre-cast
    originals still present — finish with :func:`strip_hidden`) and a
    boolean Column true for rows passing all row-level checks, including
    coerce-cast success.  Used by :mod:`pandera_spark.sinks` to split
    valid/quarantine rows in one pass.
    """
    ctx = _Ctx(schema, df, lazy=True)
    expansion = _expand_components(ctx, list(df.columns))
    transformed, coerce_agg_cols = _apply_transforms(ctx, expansion)
    _compile_column_checks(ctx, transformed, expansion)
    _compile_dataframe_checks(ctx, transformed)
    _compile_coerce_errors(ctx, coerce_agg_cols)
    cond = F.lit(True)
    for c in ctx.pass_conditions:
        cond = cond & c
    return transformed, cond


def _run(ctx: _Ctx, cfg) -> ValidationResult:
    schema = ctx.schema
    df = ctx.df
    name = schema.name or "schema"

    # ---- driver-side schema checks (zero Spark jobs) ------------------------
    df_columns = list(df.columns)

    if _schema_depth_on(cfg):
        _check_unique_column_names(ctx, df_columns)

    # expand components (regex) + presence
    expansion = _expand_components(ctx, df_columns)

    # duplicated labels make any F.col(name) reference ambiguous — drop
    # those columns from expression compilation and surface a schema
    # error instead of letting Spark throw AMBIGUOUS_REFERENCE (the
    # reference's check_column_names_are_unique is likewise driver-side
    # and pre-empts data checks, backends/pyspark/container.py:562-605)
    dup_labels = {c for c, n in Counter(df_columns).items() if n > 1}
    if dup_labels:
        for key, (comp, matched) in list(expansion.items()):
            bad = [m for m in matched if m in dup_labels]
            if bad:
                ctx.outcome(
                    comp.name, "column_label_ambiguous",
                    SchemaErrorReason.DUPLICATE_COLUMN_LABELS,
                    passed=False,
                    message=(
                        f"column(s) {bad} appear more than once in the "
                        "dataframe; their checks were skipped"
                    ),
                )
                expansion[key] = (
                    comp, [m for m in matched if m not in dup_labels]
                )

    if _schema_depth_on(cfg):
        _check_strict_and_ordered(ctx, df_columns, expansion)

    # ---- build transformed projection --------------------------------------
    transformed, coerce_agg_cols = _apply_transforms(ctx, expansion)

    # dtype checks run on the post-transform schema (coerced columns are cast)
    if _schema_depth_on(cfg):
        _check_dtypes(ctx, transformed, expansion)

    # ---- compile data checks into one agg pass ------------------------------
    if _data_depth_on(cfg):
        _compile_column_checks(ctx, transformed, expansion)
        _compile_dataframe_checks(ctx, transformed)
        _compile_coerce_errors(ctx, coerce_agg_cols)
        _compile_unique_in_agg(ctx, transformed)

    # ---- execute -----------------------------------------------------------
    total_rows = None
    if ctx.agg_exprs:
        exprs = [F.count(F.lit(1)).alias("__pandera_total__"), *ctx.agg_exprs]
        row = transformed.agg(*exprs).first().asDict()
        total_rows = row["__pandera_total__"]
        for fin in ctx.finalizers:
            fin(row)

    if _data_depth_on(cfg):
        _run_unique_checks(ctx, transformed, total_rows)
        for job in ctx.deferred:
            job(transformed)

    # ---- finalize ----------------------------------------------------------
    # filter BEFORE dropping hidden originals: coerce pass-conditions
    # reference the pre-cast column
    out_df = transformed
    if schema.drop_invalid_rows and ctx.pass_conditions:
        # reference api/dataframe/container.py:100 (not implemented in the
        # reference pyspark backend — natural as a Spark filter)
        cond = ctx.pass_conditions[0]
        for c in ctx.pass_conditions[1:]:
            cond = cond & c
        out_df = out_df.filter(cond)
    out_df = strip_hidden(out_df)

    report = ctx.handler.summarize()
    result = ValidationResult(
        schema_name=name,
        df=out_df,
        outcomes=ctx.outcomes,
        errors=ctx.handler.errors,
        report=report,
        total_rows=total_rows,
        metrics=ctx.metrics,
    )
    result._failure_specs = ctx.failure_specs
    result._checked_df = transformed
    return result


# ---------------------------------------------------------------------------
# driver-side checks
# ---------------------------------------------------------------------------


def _check_unique_column_names(ctx: _Ctx, df_columns: list[str]) -> None:
    if not ctx.schema.unique_column_names:
        return
    dupes = [c for c, n in Counter(df_columns).items() if n > 1]
    ctx.outcome(
        None,
        "unique_column_names",
        SchemaErrorReason.DUPLICATE_COLUMN_LABELS,
        passed=not dupes,
        violations=len(dupes),
        message=f"duplicate column labels: {dupes}" if dupes else "",
    )


def _expand_components(ctx: _Ctx, df_columns: list[str]) -> dict:
    """Map each schema Column component to its matching df columns.

    Returns {component_key: (component, [matched df column names])}.
    Collects COLUMN_NOT_IN_DATAFRAME errors for required missing columns
    (reference backends/pyspark/container.py:607-637) and regex zero-match
    errors (backends/pandas/components.py:210-227).
    """
    out = {}
    for key, comp in ctx.schema.columns.items():
        matched = comp.matching_columns(df_columns)
        if comp.regex and not matched:
            ctx.outcome(
                comp.name, "regex_column_match",
                SchemaErrorReason.COLUMN_NOT_IN_DATAFRAME,
                passed=False,
                message=(
                    f"no columns match regex {comp.name!r}"
                ),
            )
        elif not matched and comp.required and not (
            ctx.schema.add_missing_columns
            and (comp.default is not None or comp.nullable)
        ):
            ctx.outcome(
                comp.name, "column_in_dataframe",
                SchemaErrorReason.COLUMN_NOT_IN_DATAFRAME,
                passed=False,
                message=f"column '{comp.name}' not in dataframe",
            )
        out[key] = (comp, matched)
    return out


def _check_strict_and_ordered(
    ctx: _Ctx, df_columns: list[str], expansion: dict
) -> None:
    schema = ctx.schema
    declared = set()
    for comp, matched in expansion.values():
        declared.update(matched)
        if not comp.regex and comp.name:
            declared.add(comp.name)
    if schema.strict is True:
        for c in df_columns:
            if c not in declared:
                ctx.outcome(
                    c, "column_in_schema",
                    SchemaErrorReason.COLUMN_NOT_IN_SCHEMA,
                    passed=False,
                    message=f"column '{c}' not in schema",
                )
    if schema.ordered:
        # reference backends/pyspark/container.py ordered semantics: declared
        # (non-regex) columns must appear in schema order in the dataframe
        ordered_names = [
            comp.name
            for comp, _ in expansion.values()
            if not comp.regex and comp.name in df_columns
        ]
        present_in_order = [c for c in df_columns if c in set(ordered_names)]
        if present_in_order != ordered_names:
            ctx.outcome(
                None, "column_ordered",
                SchemaErrorReason.COLUMN_NOT_ORDERED,
                passed=False,
                message=(
                    f"columns out of order: expected {ordered_names}, "
                    f"found {present_in_order}"
                ),
            )
        else:
            ctx.outcome(
                None, "column_ordered",
                SchemaErrorReason.COLUMN_NOT_ORDERED,
                passed=True,
            )


def _check_dtypes(ctx: _Ctx, df: DataFrame, expansion: dict) -> None:
    actual = {f.name: f.dataType for f in df.schema.fields}
    for comp, matched in expansion.values():
        if comp.dtype is None:
            continue
        for colname in matched:
            act = actual.get(colname)
            if act is None:
                continue
            ok = dtype_equal(comp.dtype, act)
            ctx.outcome(
                colname,
                f"dtype('{comp.dtype.simpleString()}')",
                SchemaErrorReason.WRONG_DATATYPE,
                passed=ok,
                message=(
                    ""
                    if ok
                    else (
                        f"expected column '{colname}' to have type "
                        f"{comp.dtype.simpleString()}, got {act.simpleString()}"
                    )
                ),
            )


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def _apply_transforms(ctx: _Ctx, expansion: dict):
    """strict-filter, add_missing_columns, coerce casts, defaults, parsers.

    Returns (transformed_df, coerce_agg_cols) where coerce_agg_cols maps an
    output column name to the hidden original column carried for cast-error
    counting — all inside ONE projection so Catalyst sees a single select.
    """
    schema = ctx.schema
    df = ctx.df
    df_columns = list(df.columns)

    declared: dict[str, Any] = {}
    for comp, matched in expansion.values():
        for c in matched:
            declared[c] = comp

    # duplicated labels cannot be referenced by name (AMBIGUOUS_REFERENCE)
    # — their checks were already skipped upstream; rename them POSITIONALLY
    # (toDF) to temporary unique names so the projection can carry them
    # through (aliased back to their original label) while validation of
    # the rest proceeds.  NB: df[i] is NOT positional in pyspark (it
    # resolves df.columns[i] by name), hence toDF.
    dup_labels = {c for c, n in Counter(df_columns).items() if n > 1}
    dup_tmp: dict[int, str] = {}
    if dup_labels:
        tmp_names = []
        for i, c in enumerate(df_columns):
            if c in dup_labels:
                dup_tmp[i] = f"__pandera_dup_{i}__"
                tmp_names.append(dup_tmp[i])
            else:
                tmp_names.append(c)
        df = df.toDF(*tmp_names)

    cols_with_idx = list(enumerate(df_columns))

    # strict="filter": project extras away
    # (reference backends/pyspark/container.py:329-379)
    if schema.strict == "filter":
        cols_with_idx = [(i, c) for i, c in cols_with_idx if c in declared]

    select_cols: list[SparkCol] = []
    coerce_agg_cols: dict[str, str] = {}

    for i, c in cols_with_idx:
        if c in dup_labels:
            select_cols.append(F.col(dup_tmp[i]).alias(c))
            continue
        comp = declared.get(c)
        expr = F.col(c)
        if comp is not None:
            do_coerce = comp.dtype is not None and (
                comp.coerce or schema.coerce
            )
            if do_coerce:
                actual_dt = df.schema[c].dataType
                if not dtype_equal(comp.dtype, actual_dt):
                    orig_key = _ORIG_PREFIX + c
                    select_cols.append(F.col(c).alias(orig_key))
                    coerce_agg_cols[c] = orig_key
                    # try_cast semantics: invalid -> null (ANSI-safe;
                    # reference assumes ansi off, container.py:437-438)
                    expr = F.col(c).try_cast(comp.dtype)
            if comp.default is not None:
                # set_defaults (reference backends/pandas/container.py:626-651)
                expr = F.coalesce(expr, F.lit(comp.default))
            for parser in comp.parsers:
                expr = parser(expr)
        select_cols.append(expr.alias(c))

    # add_missing_columns (reference backends/pandas/container.py:418-548)
    if schema.add_missing_columns:
        for comp, matched in expansion.values():
            if matched or comp.regex:
                continue
            if comp.default is not None:
                lit = F.lit(comp.default)
            elif comp.nullable:
                lit = F.lit(None)
            else:
                ctx.outcome(
                    comp.name, "add_missing_columns",
                    SchemaErrorReason.ADD_MISSING_COLUMN_NO_DEFAULT,
                    passed=False,
                    message=(
                        f"column '{comp.name}' is missing and has no default"
                    ),
                )
                continue
            dt = comp.dtype or T.StringType()
            select_cols.append(lit.cast(dt).alias(comp.name))
            # make the added column visible to downstream checks
            for key, (c2, m2) in expansion.items():
                if c2 is comp:
                    expansion[key] = (c2, [comp.name])

    transformed = df.select(*select_cols)

    # dataframe-level parsers: arbitrary DataFrame -> DataFrame
    for parser in schema.parsers:
        try:
            transformed = parser(transformed)
        except Exception as exc:
            ctx.outcome(
                None, parser.name, SchemaErrorReason.DATAFRAME_PARSER,
                passed=False, message=f"parser raised: {exc!r}",
            )
    return transformed, coerce_agg_cols


# ---------------------------------------------------------------------------
# data-check compilation
# ---------------------------------------------------------------------------


def _compile_column_checks(
    ctx: _Ctx, df: DataFrame, expansion: dict
) -> None:
    actual = {f.name: f for f in df.schema.fields}
    for comp, matched in expansion.values():
        for colname in matched:
            field = actual.get(colname)
            if field is None:
                continue
            col = F.col(colname)

            # nullable (reference backends/pyspark/column.py:131-151) with
            # the StructField-non-nullable short-circuit (:139)
            if not comp.nullable:
                if not field.nullable:
                    ctx.outcome(
                        colname, "not_nullable",
                        SchemaErrorReason.SERIES_CONTAINS_NULLS, passed=True,
                    )
                else:
                    key = f"__nn__{colname}__{len(ctx.agg_exprs)}"
                    ctx.agg_exprs.append(
                        _violation_count_expr(col.isNull(), key)
                    )
                    ctx.finalizers.append(
                        _count_finalizer(
                            ctx, key, colname, "not_nullable",
                            SchemaErrorReason.SERIES_CONTAINS_NULLS,
                        )
                    )
                    ctx.pass_conditions.append(col.isNotNull())
                    ctx.failure_specs.append(
                        (colname, "not_nullable", col.isNull(), None)
                    )

            # per-column unique (reference backends/pandas/array.py:354-397)
            if comp.unique:
                ctx.unique_specs.append((colname,))

            for check in comp.checks:
                _compile_one_check(ctx, df, check, colname, field.dataType)


def _compile_one_check(
    ctx: _Ctx,
    df: DataFrame,
    check: Check,
    colname: str,
    dtype: T.DataType,
) -> None:
    col = F.col(colname)
    try:
        check.gate_dtype(dtype)
    except UnsupportedDtypeError as exc:
        # reference raises SchemaError with INVALID_TYPE from the
        # type-dispatch decorator (backends/pyspark/decorators.py:92-104)
        ctx.outcome(
            colname, check.error, SchemaErrorReason.CHECK_ERROR,
            passed=False, message=str(exc),
        )
        return

    if check.agg_kind == "unique_values_eq":
        key = f"__uve__{colname}__{len(ctx.agg_exprs)}"
        ctx.agg_exprs.append(F.collect_set(col).alias(key))
        expected = set(check.statistics["values"])

        def fin(row, key=key, colname=colname, check=check, expected=expected):
            got = set(row[key] or [])
            ok = got == expected
            ctx.outcome(
                colname, check.error,
                SchemaErrorReason.SCHEMA_COMPONENT_CHECK,
                passed=ok,
                violations=0 if ok else len(got ^ expected),
                message=(
                    "" if ok else
                    f"unique values {sorted(got)!r} != expected "
                    f"{sorted(expected)!r}"
                ),
            )

        ctx.finalizers.append(fin)
        return

    if check.agg_kind == "is_monotonic":
        _compile_is_monotonic(ctx, check, colname)
        return

    if check.agg_kind and check.agg_kind.startswith("hypothesis"):
        _compile_hypothesis(ctx, check, colname)
        return

    if check.groupby is not None:
        _compile_groupby_check(ctx, check, colname)
        return

    if check.element_wise and not _returns_spark_column(check):
        # escape hatch: arbitrary python value->bool via Arrow-batched
        # pandas UDF (reference element_wise, api/checks.py:61-69 —
        # the documented UDF cost cliff, opt-in)
        from pyspark.sql.functions import pandas_udf

        fn = check.check_fn

        @pandas_udf("boolean")
        def _elem(s):
            return s.map(lambda v: bool(fn(v)) if v is not None else True)

        pred = _elem(col)
        if check.ignore_na:
            cond = col.isNotNull() & ~F.coalesce(pred, F.lit(False))
        else:
            cond = ~F.coalesce(pred, F.lit(False))
        key = f"__chk__{colname}__{len(ctx.agg_exprs)}"
        ctx.agg_exprs.append(_violation_count_expr(cond, key))
        ctx.finalizers.append(
            _count_finalizer(
                ctx, key, colname, check.error,
                SchemaErrorReason.SCHEMA_COMPONENT_CHECK,
                raise_warning=check.raise_warning,
            )
        )
        ctx.pass_conditions.append(~cond)
        ctx.failure_specs.append((colname, check.error, cond, check.n_failure_cases))
        return

    cond = None
    try:
        # generated-SQL lane: one F.expr parse per builtin check instead
        # of dozens of py4j round trips (checks.violation_condition_sql;
        # returns None for custom checks / unsupported literal types)
        sql = check.violation_condition_sql(colname)
        if sql is not None:
            cond = F.expr(sql)
    except Exception:
        cond = None
    if cond is None:
        try:
            cond = check.violation_condition(col)
        except Exception as exc:
            ctx.outcome(
                colname, check.error, SchemaErrorReason.CHECK_ERROR,
                passed=False, message=f"check compilation failed: {exc!r}",
            )
            return
    key = f"__chk__{colname}__{len(ctx.agg_exprs)}"
    ctx.agg_exprs.append(_violation_count_expr(cond, key))
    ctx.finalizers.append(
        _count_finalizer(
            ctx, key, colname, check.error,
            SchemaErrorReason.SCHEMA_COMPONENT_CHECK,
            raise_warning=check.raise_warning,
        )
    )
    # ~cond IS pass_condition(col) (pass = NOT violation); reusing the
    # already-built Column halves the per-check py4j construction cost
    ctx.pass_conditions.append(~cond)
    ctx.failure_specs.append(
        (colname, check.error, cond, check.n_failure_cases)
    )


def _compile_is_monotonic(ctx: _Ctx, check: Check, colname: str) -> None:
    """Monotonicity via a lag window.

    NOTE(scale): a global ``Window.orderBy`` collapses to one partition.
    ``Check.is_monotonic(..., distributed=True)`` routes to
    ``operators.ordered.monotonic_violations`` (range-repartition +
    per-partition windows + driver boundary check); the inline global
    window stays the default for small/medium validation workloads.
    """
    from pyspark.sql import Window

    stats = check.statistics

    if stats.get("distributed"):
        def fin_dist(row, colname=colname, check=check, stats=stats):
            from ..operators.ordered import monotonic_violations

            cnt = monotonic_violations(
                ctx.df, colname, stats["order_by"],
                decreasing=stats["decreasing"], strict=stats["strict"],
            )
            ctx.outcome(
                colname, check.error,
                SchemaErrorReason.SCHEMA_COMPONENT_CHECK,
                passed=cnt == 0, violations=int(cnt),
                message="" if cnt == 0 else f"{cnt} monotonicity violations",
            )

        ctx.finalizers.append(fin_dist)
        if not ctx.agg_exprs:
            ctx.agg_exprs.append(
                F.count(F.lit(1)).alias(f"__mono_anchor_{len(ctx.agg_exprs)}")
            )
        return
    order_col = F.col(stats["order_by"])
    col = F.col(colname)
    w = Window.orderBy(order_col)
    prev = F.lag(col).over(w)
    if stats["decreasing"]:
        ok = col < prev if stats["strict"] else col <= prev
    else:
        ok = col > prev if stats["strict"] else col >= prev
    viol = prev.isNotNull() & col.isNotNull() & ~ok

    # windows can't ride the main agg pass: they run in a separate
    # finalize-time job.  ONE shared job serves every monotonic check on
    # the schema — each contributes a when(viol) column to a single
    # select + sum aggregate (different order_by columns become separate
    # Window nodes in the same plan, still one action / one scan)
    key = f"__mono__{colname}__{len(ctx.mono_specs)}"
    if not ctx.mono_specs:
        def fin_mono_shared(row):
            specs = ctx.mono_specs
            sel = ctx.df.select(
                *[
                    F.when(v, F.lit(1)).otherwise(F.lit(0)).alias(k)
                    for k, v, _, _ in specs
                ]
            )
            counts = sel.agg(
                *[F.sum(k).alias(k) for k, _, _, _ in specs]
            ).first()
            for k, _, cname, chk in specs:
                cnt = counts[k] or 0
                ctx.outcome(
                    cname, chk.error,
                    SchemaErrorReason.SCHEMA_COMPONENT_CHECK,
                    passed=cnt == 0, violations=int(cnt),
                    message=(
                        "" if cnt == 0
                        else f"{cnt} monotonicity violations"
                    ),
                )

        ctx.finalizers.append(fin_mono_shared)
        if not ctx.agg_exprs:
            # ensure the agg pass runs so finalizers execute
            ctx.agg_exprs.append(
                F.count(F.lit(1)).alias(f"__mono_anchor_{len(ctx.agg_exprs)}")
            )
    ctx.mono_specs.append((key, viol, colname, check))


def _returns_spark_column(check: Check) -> bool:
    """Heuristic: expression-based checks (builtin or custom fn over a
    Column) vs plain-python element functions — builtins always have
    statistics; customs declared element_wise are python-valued."""
    return bool(check.statistics) and check.check_fn is not None


def _compile_groupby_check(ctx: _Ctx, check: Check, colname: str) -> None:
    """Grouped custom check (reference Check groupby/groups options,
    api/checks.py:148-154; pandas backend only — `Column._allow_groupby`
    is False in the reference pyspark backend, api/pyspark/components.py:114;
    we support it natively).

    The check fn receives ``dict[group_key -> pandas.Series]`` (the
    reference's contract) built from one groupBy+collect job.  Driver-side
    and bounded by the grouped data size — explicit opt-in (SURVEY.md §2
    hard part 5).

    ``Check(..., distributed=True)`` switches to the 100 TB path: the fn
    runs INSIDE executors via ``applyInPandas``, one group per call (the
    dict it receives holds just that group), and per-group verdicts are
    AND-combined by a tiny aggregate — the driver never sees group values.
    Requires the fn to be per-group decomposable; cross-group comparisons
    need the collect path.
    """
    if check.distributed:
        _compile_groupby_check_distributed(ctx, check, colname)
        return

    def job(df: DataFrame):
        import pandas as pd

        gcol = check.groupby if isinstance(check.groupby, str) else list(check.groupby)
        gexprs = [F.col(gcol)] if isinstance(gcol, str) else [F.col(c) for c in gcol]
        # driver-OOM pre-guard (VERDICT r8): bound the per-group list
        # INSIDE the aggregate (slice to cap+1) so an oversized group is
        # detected by its length without its values ever reaching the
        # driver — same no-extra-job pattern as the custom-hypothesis
        # lane below.
        cap = int(getattr(check, "max_collect_rows", 0) or 0)
        vals_agg = F.collect_list(F.col(colname))
        if cap:
            vals_agg = F.slice(vals_agg, 1, cap + 1)
        rows = (
            df.groupBy(*gexprs)
            .agg(vals_agg.alias("__vals"))
            .collect()
        )
        if cap:
            for r in rows:
                if len(r["__vals"]) > cap:
                    key = (
                        r[gcol] if isinstance(gcol, str)
                        else tuple(r[c] for c in gcol)
                    )
                    raise ValueError(
                        f"grouped check {check.error!r}: group {key!r} "
                        f"exceeds max_collect_rows={cap}; pass "
                        "distributed=True to evaluate on executors, or "
                        "raise max_collect_rows explicitly"
                    )
        if isinstance(gcol, str):
            groups = {r[gcol]: pd.Series(r["__vals"]) for r in rows}
        else:
            groups = {
                tuple(r[c] for c in gcol): pd.Series(r["__vals"]) for r in rows
            }
        wanted = check._kwargs.get("groups")
        if wanted:
            groups = {k: v for k, v in groups.items() if k in set(wanted)}
        try:
            out = check.check_fn(groups)
        except Exception as exc:
            ctx.outcome(
                colname, check.error, SchemaErrorReason.CHECK_ERROR,
                passed=False, message=f"groupby check raised: {exc!r}",
            )
            return
        ok = bool(out)
        ctx.outcome(
            colname, check.error,
            SchemaErrorReason.SCHEMA_COMPONENT_CHECK,
            passed=ok or check.raise_warning,
            message="" if ok else f"groupby check '{check.error}' failed",
        )

    ctx.deferred.append(job)
    if not ctx.agg_exprs:
        ctx.agg_exprs.append(F.count(F.lit(1)).alias("__gb_anchor__"))


def _compile_groupby_check_distributed(
    ctx: _Ctx, check: Check, colname: str
) -> None:
    """Executor-side grouped check: ``applyInPandas`` evaluates the fn per
    group (Arrow batches, no driver data movement); the only collected row
    is the (n_failed, first_error) aggregate.  Shuffle is one hash
    partition on the group key — the same single shuffle the collect path
    pays, minus the driver funnel."""

    def job(df: DataFrame):
        from .._shipping import ensure_package_on_executors

        ensure_package_on_executors(df.sparkSession)
        gcols = (
            [check.groupby]
            if isinstance(check.groupby, str)
            else list(check.groupby)
        )
        single = isinstance(check.groupby, str)
        wanted = check._kwargs.get("groups")
        wanted_set = set(wanted) if wanted else None
        fn = check.check_fn

        def eval_group(pdf):
            import pandas as pd

            key = tuple(pdf.iloc[0][c] for c in gcols)
            k = key[0] if single else key
            if wanted_set is not None and k not in wanted_set:
                return pd.DataFrame({"passed": [True], "err": [None]})
            # .dropna() mirrors the collect path's collect_list null drop
            series = pdf[colname].dropna().reset_index(drop=True)
            try:
                ok = bool(fn({k: series}))
                return pd.DataFrame({"passed": [ok], "err": [None]})
            except Exception as exc:  # noqa: BLE001 - surfaced as outcome
                return pd.DataFrame({"passed": [False], "err": [repr(exc)]})

        verdicts = (
            df.select(*gcols, colname)
            .groupBy(*[F.col(c) for c in gcols])
            .applyInPandas(eval_group, schema="passed boolean, err string")
        )
        row = verdicts.agg(
            F.sum(F.when(~F.col("passed"), 1).otherwise(0)).alias("nfail"),
            F.first("err", ignorenulls=True).alias("err"),
        ).first()
        nfail = int(row["nfail"] or 0)
        if row["err"] is not None:
            ctx.outcome(
                colname, check.error, SchemaErrorReason.CHECK_ERROR,
                passed=False,
                message=f"groupby check raised: {row['err']}",
            )
            return
        ctx.outcome(
            colname, check.error,
            SchemaErrorReason.SCHEMA_COMPONENT_CHECK,
            passed=nfail == 0 or check.raise_warning,
            violations=nfail,
            message="" if nfail == 0 else
            f"groupby check '{check.error}' failed for {nfail} groups",
        )

    ctx.deferred.append(job)
    if not ctx.agg_exprs:
        ctx.agg_exprs.append(F.count(F.lit(1)).alias("__gb_anchor__"))


def _compile_hypothesis(ctx: _Ctx, check, colname: str) -> None:
    """Hypothesis execution (SURVEY.md §2.E).

    one-sample: count/avg/stddev folded into the SHARED agg pass (no extra
    job).  two-sample: one groupBy job on the (tiny) groupby key.  custom:
    collect_list per group — driver-side, opt-in, documented scale hazard.
    """
    from ..hypotheses import one_sample_t, two_sample_t

    col = F.col(colname)
    reason = SchemaErrorReason.SCHEMA_COMPONENT_CHECK

    if check.agg_kind == "hypothesis_one_sample":
        base = f"__hyp1__{colname}__{len(ctx.agg_exprs)}"
        ctx.agg_exprs.extend(
            [
                F.count(col).alias(base + "_n"),
                F.avg(col).alias(base + "_m"),
                F.stddev_samp(col).alias(base + "_s"),
            ]
        )

        def fin(row, base=base):
            n = int(row[base + "_n"] or 0)
            m = float(row[base + "_m"] or 0.0)
            s = float(row[base + "_s"] or 0.0)
            stat, p = one_sample_t(n, m, s, check.popmean)
            ok = check.decide(stat, p)
            ctx.metrics[check.error] = {"stat": stat, "pvalue": p}
            ctx.outcome(
                colname, check.error, reason, passed=ok,
                message="" if ok else
                f"one_sample_ttest failed: t={stat:.4f} p={p:.4g}",
            )

        ctx.finalizers.append(fin)
        return

    if check.agg_kind == "hypothesis_two_sample":
        g1, g2 = check.samples

        def job(df: DataFrame):
            rows = (
                df.filter(F.col(check.groupby).isin([g1, g2]))
                .groupBy(F.col(check.groupby).alias("__g"))
                .agg(
                    F.count(col).alias("n"),
                    F.avg(col).alias("m"),
                    F.var_samp(col).alias("v"),
                )
                .collect()
            )
            stats = {r["__g"]: r for r in rows}
            if g1 not in stats or g2 not in stats:
                ctx.outcome(
                    colname, check.error, reason, passed=False,
                    message=(
                        f"groups {g1!r}/{g2!r} not both present in "
                        f"'{check.groupby}'"
                    ),
                )
                return
            a, b = stats[g1], stats[g2]
            stat, p = two_sample_t(
                int(a["n"]), float(a["m"]), float(a["v"] or 0.0),
                int(b["n"]), float(b["m"]), float(b["v"] or 0.0),
                equal_var=getattr(check, "equal_var", True),
            )
            ok = check.decide(stat, p)
            ctx.metrics[check.error] = {"stat": stat, "pvalue": p}
            ctx.outcome(
                colname, check.error, reason, passed=ok,
                message="" if ok else
                f"two_sample_ttest failed: t={stat:.4f} p={p:.4g}",
            )

        ctx.deferred.append(job)
        return

    if check.agg_kind == "hypothesis_chi2_indep":
        # categorical independence vs another column: one contingency
        # aggregation (operators/stats.py) — the deferred job's shuffle
        # is bounded by |A|x|B| cells, never rows
        def job(df: DataFrame):
            from ..operators.stats import chi2_independence

            other = check.other_col
            if other not in df.columns:
                ctx.outcome(
                    colname, check.error, reason, passed=False,
                    message=f"column {other!r} not in dataframe",
                )
                return
            row = chi2_independence(
                df, colname, other, pvalue=True
            ).collect()[0]
            stat = float(row["chi2_stat"])
            p = (
                float(row["chi2_pvalue"])
                if row["chi2_pvalue"] is not None
                else float("nan")
            )
            ok = check.decide(stat, p)
            ctx.metrics[check.error] = {
                "stat": stat, "pvalue": p, "dof": int(row["dof"]),
                "cramers_v": (
                    float(row["cramers_v"])
                    if row["cramers_v"] is not None else None
                ),
            }
            ctx.outcome(
                colname, check.error, reason, passed=ok,
                message="" if ok else
                f"chi2_independence failed: chi2={stat:.4f} p={p:.4g}",
            )

        ctx.deferred.append(job)
        return

    # custom hypothesis: collect per-group samples (bounded by data size —
    # explicit opt-in, reference api/hypotheses.py:39-99).  distributed=True
    # ships the evaluation to ONE executor task instead (applyInPandas over
    # a constant key): arbitrary test fns still see all samples at once,
    # but the data moves executor->executor over Arrow, never to the
    # driver — executor memory, not driver memory, bounds the group size.
    if getattr(check, "distributed", False):

        def job(df: DataFrame):
            import pandas as pd

            from .._shipping import ensure_package_on_executors

            ensure_package_on_executors(df.sparkSession)
            test, kw = check.test, check.test_kwargs
            names = list(check.samples)
            gb = check.groupby
            if gb:
                sub = df.select(
                    F.col(gb).alias("__g"), col.alias("__v")
                ).filter(col.isNotNull())
                if names:
                    sub = sub.filter(F.col("__g").isin(names))
            else:
                sub = df.select(
                    F.lit("__all__").alias("__g"), col.alias("__v")
                ).filter(col.isNotNull())

            def run(pdf):
                groups = {
                    k: list(g["__v"]) for k, g in pdf.groupby("__g")
                }
                if gb:
                    samples = [groups.get(s, []) for s in names] or list(
                        groups.values()
                    )
                else:
                    samples = [list(pdf["__v"])]
                try:
                    out = test(*samples, **kw)
                except Exception as exc:  # noqa: BLE001
                    return pd.DataFrame(
                        {"stat": [None], "p": [None], "err": [repr(exc)]}
                    )
                if isinstance(out, tuple) and len(out) == 2:
                    stat, p = float(out[0]), float(out[1])
                else:
                    stat, p = float(out), float("nan")
                return pd.DataFrame(
                    {"stat": [stat], "p": [p], "err": [None]}
                )

            row = (
                sub.groupBy(F.lit(1).alias("__k"))
                .applyInPandas(run, schema="stat double, p double, err string")
                .first()
            )
            if row is None:
                # zero input rows -> zero groups: replay the collect path's
                # empty-samples behavior without touching the cluster.
                # Mirror it exactly: with groupby set, one empty sample
                # per named group (zero args when names is empty, matching
                # `groups.values()` on an empty frame); without groupby, a
                # single empty sample
                try:
                    samples = [[] for _ in names] if gb else [[]]
                    out = test(*samples, **kw)
                    stat, p = (
                        (float(out[0]), float(out[1]))
                        if isinstance(out, tuple) and len(out) == 2
                        else (float(out), float("nan"))
                    )
                    err = None
                except Exception as exc:  # noqa: BLE001
                    stat, p, err = None, None, repr(exc)
            else:
                stat, p, err = row["stat"], row["p"], row["err"]
            if err is not None:
                ctx.outcome(
                    colname, check.error, SchemaErrorReason.CHECK_ERROR,
                    passed=False,
                    message=f"hypothesis test raised: {err}",
                )
                return
            ok = check.decide(stat, p)
            ctx.metrics[check.error] = {"stat": stat, "pvalue": p}
            ctx.outcome(
                colname, check.error, reason, passed=ok,
                message="" if ok else f"hypothesis failed: stat={stat:.4f}",
            )

        ctx.deferred.append(job)
        if not ctx.agg_exprs:
            ctx.agg_exprs.append(F.count(F.lit(1)).alias("__hyp_anchor__"))
        return

    def job(df: DataFrame):
        # driver-OOM guard (VERDICT r7 item 2): the collect lane ships
        # every sample value to the driver; cap it and point big
        # columns at distributed=True.  Enforced WITHOUT an extra job:
        # limit(n+1) / slice(collect_list, 1, n+1) bound what reaches
        # the driver, and seeing n+1 values proves the overflow.
        cap = int(getattr(check, "max_collect_rows", 0) or 0)

        def guard(n_got: int, where: str) -> None:
            if cap and n_got > cap:
                raise ValueError(
                    f"custom hypothesis {check.error!r} would collect "
                    f"more than max_collect_rows={cap} values "
                    f"({where}); pass distributed=True to evaluate on "
                    "an executor, or raise max_collect_rows explicitly"
                )

        if check.groupby:
            vals_agg = F.collect_list(col)
            if cap:
                vals_agg = F.slice(vals_agg, 1, cap + 1)
            rows = (
                df.groupBy(F.col(check.groupby).alias("__g"))
                .agg(vals_agg.alias("vals"))
                .collect()
            )
            for r in rows:
                guard(len(r["vals"]), f"group {r['__g']!r}")
            groups = {r["__g"]: r["vals"] for r in rows}
            samples = [groups.get(s, []) for s in check.samples] or [
                v for v in groups.values()
            ]
        else:
            sel = df.select(col).dropna()
            if cap:
                sel = sel.limit(cap + 1)
            vals = [r[0] for r in sel.collect()]
            guard(len(vals), "whole column")
            samples = [vals]
        try:
            out = check.test(*samples, **check.test_kwargs)
        except Exception as exc:
            ctx.outcome(
                colname, check.error, SchemaErrorReason.CHECK_ERROR,
                passed=False, message=f"hypothesis test raised: {exc!r}",
            )
            return
        if isinstance(out, tuple) and len(out) == 2:
            stat, p = float(out[0]), float(out[1])
        else:
            stat, p = float(out), float("nan")
        ok = check.decide(stat, p)
        ctx.metrics[check.error] = {"stat": stat, "pvalue": p}
        ctx.outcome(
            colname, check.error, reason, passed=ok,
            message="" if ok else f"hypothesis failed: stat={stat:.4f}",
        )

    ctx.deferred.append(job)
    # ensure the finalize phase runs even with no other agg exprs
    if not ctx.agg_exprs:
        ctx.agg_exprs.append(F.count(F.lit(1)).alias("__hyp_anchor__"))


def _compile_dataframe_checks(ctx: _Ctx, df: DataFrame) -> None:
    """Container-level checks: ``fn(df) -> boolean Column``
    (reference backends/pyspark/container.py:216-249)."""
    for check in ctx.schema.checks:
        try:
            pred = check.check_fn(df)
        except Exception as exc:
            ctx.outcome(
                None, check.error, SchemaErrorReason.CHECK_ERROR,
                passed=False, message=f"dataframe check failed to compile: {exc!r}",
            )
            continue
        if isinstance(pred, DataFrame):
            ctx.outcome(
                None, check.error, SchemaErrorReason.CHECK_ERROR,
                passed=False,
                message="dataframe checks must return a boolean Column",
            )
            continue
        if check.ignore_na:
            viol = ~F.coalesce(pred, F.lit(True))
        else:
            viol = ~F.coalesce(pred, F.lit(False))
        key = f"__dfchk__{len(ctx.agg_exprs)}"
        ctx.agg_exprs.append(_violation_count_expr(viol, key))
        ctx.finalizers.append(
            _count_finalizer(
                ctx, key, None, check.error,
                SchemaErrorReason.DATAFRAME_CHECK,
                raise_warning=check.raise_warning,
            )
        )
        ctx.pass_conditions.append(~viol)
        ctx.failure_specs.append(
            (None, check.error, viol, check.n_failure_cases)
        )


def _compile_coerce_errors(ctx: _Ctx, coerce_agg_cols: dict) -> None:
    """Count rows where a non-null original failed to cast
    (reference backends/pyspark/container.py:419-483; pandas null-introduction
    semantics backends/pandas/array.py:209-285)."""
    for out_col, orig_col in coerce_agg_cols.items():
        cond = F.col(orig_col).isNotNull() & F.col(out_col).isNull()
        key = f"__coerce__{out_col}"
        ctx.agg_exprs.append(_violation_count_expr(cond, key))
        ctx.finalizers.append(
            _count_finalizer(
                ctx, key, out_col, f"coerce_dtype('{out_col}')",
                SchemaErrorReason.DATATYPE_COERCION,
            )
        )
        # a failed cast is a row-level failure: drop_invalid_rows and the
        # quarantine split must not route it as valid (the predicate
        # references the hidden original column, so filters are applied
        # BEFORE hidden columns are dropped)
        ctx.pass_conditions.append(~cond)
        ctx.failure_specs.append(
            (out_col, f"coerce_dtype('{out_col}')", cond, None)
        )


def _count_finalizer(
    ctx: _Ctx,
    key: str,
    column: Optional[str],
    check_label: str,
    reason: SchemaErrorReason,
    raise_warning: bool = False,
):
    def fin(row):
        cnt = int(row[key] or 0)
        passed = cnt == 0 or raise_warning
        ctx.outcome(
            column, check_label, reason,
            passed=passed, violations=cnt,
            message=(
                ""
                if cnt == 0
                else f"column '{column}': check '{check_label}' failed on "
                f"{cnt} rows"
            ),
        )

    return fin


# ---------------------------------------------------------------------------
# uniqueness (shuffle jobs, only when declared)
# ---------------------------------------------------------------------------


def _all_unique_specs(ctx: _Ctx) -> list[tuple[str, ...]]:
    schema = ctx.schema
    specs = list(ctx.unique_specs)
    if schema.unique:
        cols = (
            [schema.unique]
            if isinstance(schema.unique, str)
            else list(schema.unique)
        )
        specs.append(tuple(cols))
    return specs


def _unique_label_reason(spec: tuple[str, ...]):
    label = (
        f"unique({list(spec)!r})" if len(spec) > 1
        else f"field_uniqueness('{spec[0]}')"
    )
    reason = (
        SchemaErrorReason.DUPLICATES
        if len(spec) > 1
        else SchemaErrorReason.SERIES_CONTAINS_DUPLICATES
    )
    return label, reason


def _compile_unique_in_agg(ctx: _Ctx, df: DataFrame) -> None:
    """exclude_first/exclude_last uniqueness folds into the shared agg pass:
    violation count == total - countDistinct(keys) — no extra job, no
    groupBy stage.  ('all' semantics need per-group counts — handled by the
    groupBy path in :func:`_run_unique_checks`.)"""
    if ctx.schema.report_duplicates == "all":
        return
    existing = set(df.columns)
    for spec in _all_unique_specs(ctx):
        label, reason = _unique_label_reason(spec)
        if any(c not in existing for c in spec):
            ctx.outcome(
                ",".join(spec), label, reason, passed=False,
                message=(
                    f"unique spec references missing columns "
                    f"{[c for c in spec if c not in existing]}"
                ),
            )
            continue
        key = f"__uniq__{len(ctx.agg_exprs)}"
        # struct-wrap the keys: a struct is never null, so null key values
        # count as distinct values exactly like the groupBy path ('all'
        # mode) and the reference's pandas duplicated() treat them — bare
        # count_distinct silently drops rows with any null key, inflating
        # the duplicate count (one all-null row would read as a duplicate)
        ctx.agg_exprs.append(
            F.count_distinct(
                F.struct(*[F.col(c) for c in spec])
            ).alias(key)
        )

        def fin(row, key=key, spec=spec, label=label, reason=reason):
            total = int(row["__pandera_total__"] or 0)
            distinct = int(row[key] or 0)
            violations = max(total - distinct, 0)
            ctx.outcome(
                ",".join(spec), label, reason,
                passed=violations == 0, violations=violations,
                message=(
                    "" if violations == 0 else
                    f"columns {list(spec)} contain {violations} duplicate rows"
                ),
            )

        ctx.finalizers.append(fin)


def _run_unique_checks(
    ctx: _Ctx, df: DataFrame, total_rows: Optional[int]
) -> None:
    """Joint + per-column uniqueness via groupBy-count
    (reference backends/pyspark/container.py:485-556).

    One shuffle per spec on exactly the key columns (column-pruned scan).
    ``report_duplicates`` (reference dtypes.py:627) decides the violation
    count: 'all' counts every row in a duplicated group; 'exclude_first' /
    'exclude_last' count all but one per group (those two run in the shared
    agg pass instead — see _compile_unique_in_agg).
    """
    schema = ctx.schema
    if schema.report_duplicates != "all":
        return
    specs = _all_unique_specs(ctx)

    existing = set(df.columns)
    for spec in specs:
        missing = [c for c in spec if c not in existing]
        label = (
            f"unique({list(spec)!r})" if len(spec) > 1
            else f"field_uniqueness('{spec[0]}')"
        )
        if missing:
            ctx.outcome(
                ",".join(spec), label,
                SchemaErrorReason.DUPLICATES, passed=False,
                message=f"unique spec references missing columns {missing}",
            )
            continue
        agg = (
            df.groupBy(*[F.col(c) for c in spec])
            .agg(F.count(F.lit(1)).alias("__cnt__"))
            .filter(F.col("__cnt__") > 1)
            .agg(
                F.count(F.lit(1)).alias("groups"),
                F.coalesce(F.sum("__cnt__"), F.lit(0)).alias("rows"),
            )
            .first()
        )
        groups, rows = int(agg["groups"] or 0), int(agg["rows"] or 0)
        if schema.report_duplicates == "all":
            violations = rows
        else:  # exclude_first / exclude_last
            violations = rows - groups
        reason = (
            SchemaErrorReason.DUPLICATES
            if len(spec) > 1
            else SchemaErrorReason.SERIES_CONTAINS_DUPLICATES
        )
        ctx.outcome(
            ",".join(spec), label, reason,
            passed=violations == 0, violations=violations,
            message=(
                ""
                if violations == 0
                else f"columns {list(spec)} contain {violations} duplicate rows "
                f"in {groups} groups"
            ),
        )
