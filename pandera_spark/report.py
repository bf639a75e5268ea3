"""Error collection and the validation result object.

Report shape mirrors the reference pyspark error dict
(/root/reference/pandera/api/base/error_handler.py:181-210 ``summarize``:
``{"SCHEMA"|"DATA": {reason_code: [{schema, column, check, error}]}}``),
extended with per-entry violation counts.  The reference attaches the dict to
``df.pandera.errors`` (backends/pyspark/container.py:146-151, accessor
accessors/pyspark_sql_accessor.py:20) — we do the same via
:mod:`pandera_spark.accessor`.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .errors import (
    ErrorCategory,
    SchemaError,
    SchemaErrorReason,
    error_category,
)


class ErrorHandler:
    """Collects SchemaErrors during (lazy) validation
    (reference api/base/error_handler.py:52-233)."""

    def __init__(self, lazy: bool = True):
        self.lazy = lazy
        self._errors: list[SchemaError] = []

    def collect(self, err: SchemaError) -> None:
        if not self.lazy:
            raise err
        self._errors.append(err)

    @property
    def errors(self) -> list[SchemaError]:
        return self._errors

    def summarize(self) -> dict:
        """Nested dict report (reference error_handler.py:181-210)."""
        out: dict = defaultdict(lambda: defaultdict(list))
        for e in self._errors:
            cat = error_category(e.reason_code).name
            out[cat][e.reason_code.value].append(e.to_entry())
        return {k: dict(v) for k, v in out.items()}


_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("schema", T.StringType(), False),
        T.StructField("column", T.StringType(), True),
        T.StructField("check", T.StringType(), True),
        T.StructField("category", T.StringType(), False),
        T.StructField("reason_code", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("violations", T.LongType(), True),
    ]
)


@dataclass
class CheckOutcome:
    """Outcome of one declared check (passed or failed)."""

    schema: str
    column: Optional[str]
    check: str
    reason_code: SchemaErrorReason
    passed: bool
    violations: int = 0
    message: str = ""

    @property
    def category(self) -> ErrorCategory:
        return error_category(self.reason_code)


@dataclass
class ValidationResult:
    """Everything produced by one ``schema.validate`` run."""

    schema_name: str
    df: DataFrame
    outcomes: list[CheckOutcome] = field(default_factory=list)
    errors: list[SchemaError] = field(default_factory=list)
    report: dict = field(default_factory=dict)
    total_rows: Optional[int] = None
    metrics: dict = field(default_factory=dict)

    # set by the runner: compiled violation conditions + the checked frame
    _failure_specs: list = field(default_factory=list, repr=False)
    _checked_df: Optional[DataFrame] = field(default=None, repr=False)

    @property
    def passed(self) -> bool:
        return not self.errors

    def failure_cases(self, n: int = 5) -> Optional[DataFrame]:
        """Sample failing values for every FAILED check
        (reference n_failure_cases, api/checks.py:99-101; the reference
        pyspark backend reduced failure cases to scalars —
        backends/pyspark/base.py:95-98 — ours returns real samples).

        Returns (column, check, failure_case) with up to ``n`` rows per
        failed check (a per-check ``n_failure_cases`` overrides ``n``).
        Runs one filter+limit job per failed check, only on demand.

        Always a DataFrame when validation touched data — EMPTY (same
        3-column schema) when every check passed, so callers can
        ``.count()``/``.filter()`` without a None branch.  ``None`` only
        when validation never ran against data (kill switch /
        SCHEMA_ONLY depth).
        """
        if self._checked_df is None:
            return None
        from pyspark.sql import functions as F

        failed = {
            (o.column, o.check)
            for o in self.outcomes
            if not o.passed and o.violations > 0
        }
        parts = []
        df = self._checked_df
        for column, label, cond, n_override in self._failure_specs:
            key = (column, label)
            if key not in failed:
                continue
            limit = n_override if n_override is not None else n
            value = (
                F.col(column).cast("string")
                if column is not None
                else F.to_json(F.struct(*df.columns))
            )
            parts.append(
                df.filter(cond)
                .select(
                    F.lit(column).alias("column"),
                    F.lit(label).alias("check"),
                    value.alias("failure_case"),
                )
                .limit(limit)
            )
        if not parts:
            from pyspark.sql import types as T

            return self._checked_df.sparkSession.createDataFrame(
                [],
                T.StructType([
                    T.StructField("column", T.StringType(), True),
                    T.StructField("check", T.StringType(), True),
                    T.StructField("failure_case", T.StringType(), True),
                ]),
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    def outcome_rows(self) -> list[tuple]:
        return [
            (
                o.schema,
                o.column,
                o.check,
                o.category.name,
                o.reason_code.value,
                o.passed,
                o.violations,
            )
            for o in self.outcomes
        ]

    def report_df(self, spark: SparkSession) -> DataFrame:
        """Long-format outcome table: one row per declared check.

        The violation counts were computed distributed (single agg pass);
        this materializes the driver-side summary as a DataFrame for
        downstream joins / sinks / the correctness oracle.
        """
        return spark.createDataFrame(self.outcome_rows(), _REPORT_SCHEMA)
