"""Error types and reason codes.

Mirrors the reference's error taxonomy (/root/reference/pandera/errors.py:139-162
``SchemaErrorReason``, :79 ``SchemaError``, :165 ``SchemaErrors``) re-expressed
for a Spark-native engine.  The summarized report shape
``{"SCHEMA"|"DATA": {reason_code: [{schema, column, check, error}]}}`` follows
/root/reference/pandera/api/base/error_handler.py:181-210.
"""

from __future__ import annotations

from enum import Enum


class SchemaErrorReason(Enum):
    """Reason codes for schema errors (reference pandera/errors.py:139-162)."""

    INVALID_TYPE = "invalid_type"
    DATATYPE_COERCION = "dtype_coercion_error"
    COLUMN_NOT_IN_SCHEMA = "column_not_in_schema"
    COLUMN_NOT_ORDERED = "column_not_ordered"
    DUPLICATE_COLUMN_LABELS = "duplicate_dataframe_column_labels"
    COLUMN_NOT_IN_DATAFRAME = "column_not_in_dataframe"
    SCHEMA_COMPONENT_CHECK = "schema_component_check"
    DATAFRAME_CHECK = "dataframe_check"
    CHECK_ERROR = "check_error"
    SCHEMA_COMPONENT_PARSER = "schema_component_parser"
    DATAFRAME_PARSER = "dataframe_parser"
    PARSER_ERROR = "parser_error"
    DUPLICATES = "duplicates"
    WRONG_FIELD_NAME = "wrong_field_name"
    SERIES_CONTAINS_NULLS = "series_contains_nulls"
    SERIES_CONTAINS_DUPLICATES = "series_contains_duplicates"
    WRONG_DATATYPE = "wrong_dtype"
    NO_ERROR = "no_errors"
    ADD_MISSING_COLUMN_NO_DEFAULT = "add_missing_column_no_default"
    INVALID_COLUMN_NAME = "invalid_column_name"


class ErrorCategory(Enum):
    """Error categories (reference pandera/api/base/error_handler.py:33-40)."""

    SCHEMA = "schema"
    DATA = "data"


#: reason code -> category (reference error_handler.get_error_category)
SCHEMA_REASONS = {
    SchemaErrorReason.INVALID_TYPE,
    SchemaErrorReason.DATATYPE_COERCION,
    # nullability is declared in the schema, so null violations file
    # under SCHEMA — matching both the reference's canonical category
    # map (api/base/error_handler.py ERROR_CATEGORY_MAP:
    # SERIES_CONTAINS_NULLS -> SCHEMA) and the observed reference
    # pyspark report shape (r9 container-conformance probes)
    SchemaErrorReason.SERIES_CONTAINS_NULLS,
    SchemaErrorReason.COLUMN_NOT_IN_SCHEMA,
    SchemaErrorReason.COLUMN_NOT_ORDERED,
    SchemaErrorReason.DUPLICATE_COLUMN_LABELS,
    SchemaErrorReason.COLUMN_NOT_IN_DATAFRAME,
    SchemaErrorReason.WRONG_DATATYPE,
    SchemaErrorReason.WRONG_FIELD_NAME,
    SchemaErrorReason.ADD_MISSING_COLUMN_NO_DEFAULT,
    SchemaErrorReason.INVALID_COLUMN_NAME,
    SchemaErrorReason.CHECK_ERROR,
}


def error_category(reason: SchemaErrorReason) -> ErrorCategory:
    return (
        ErrorCategory.SCHEMA if reason in SCHEMA_REASONS else ErrorCategory.DATA
    )


class PanderaSparkError(Exception):
    """Base exception for this engine."""


class SchemaInitError(PanderaSparkError):
    """Raised when schema construction is invalid (reference errors.py:57)."""


class SchemaDefinitionError(PanderaSparkError):
    """Raised when a schema definition is inconsistent."""


class UnsupportedDtypeError(PanderaSparkError):
    """A check was applied to a Spark type it does not support
    (reference pandera/backends/pyspark/decorators.py:42-104)."""


class PysparkSchemaError(PanderaSparkError):
    """Name-compatible with the reference pyspark surface
    (reference errors.py PysparkSchemaError, exported by
    pandera/pyspark.py)."""


class SchemaError(PanderaSparkError):
    """A single validation failure (reference errors.py:79)."""

    def __init__(
        self,
        schema_name: str,
        column: str | None,
        check: str | None,
        reason_code: SchemaErrorReason,
        message: str,
        failure_cases_count: int = 0,
    ):
        super().__init__(message)
        self.schema_name = schema_name
        self.column = column
        self.check = check
        self.reason_code = reason_code
        self.message = message
        self.failure_cases_count = failure_cases_count

    def to_entry(self) -> dict:
        """Summarized-report entry (reference error_handler.py:196-210),
        extended with a violation count."""
        return {
            "schema": self.schema_name,
            "column": self.column,
            "check": self.check,
            "error": self.message,
            "violations": self.failure_cases_count,
        }


class SchemaErrors(PanderaSparkError):
    """Aggregated lazy-validation failure (reference errors.py:165)."""

    def __init__(self, schema_name: str, errors: list[SchemaError], report: dict):
        self.schema_name = schema_name
        self.errors = errors
        self.report = report
        lines = [f"Schema '{schema_name}': {len(errors)} error(s)"]
        for e in errors[:20]:
            lines.append(
                f"  [{e.reason_code.value}] column={e.column} check={e.check}: "
                f"{e.message}"
            )
        super().__init__("\n".join(lines))
