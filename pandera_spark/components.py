"""Schema components: ``Column`` (and standalone ``ColumnSchema``).

Reference: /root/reference/pandera/api/pyspark/components.py:20 (Column),
pandera/api/pandas/components.py:18-111 (full kwarg surface),
pandera/api/pyspark/column_schema.py:19 (standalone column).

A Column is pure metadata: dtype spec + constraint set.  Compilation to Spark
expressions happens in the backend (backend/runner.py).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from typing import Any

from pyspark.sql import types as T

from .checks import Check
from .engine import normalize_dtype
from .errors import SchemaInitError
from .parsers import Parser


def _as_list(x, cls) -> list:
    if x is None:
        return []
    if isinstance(x, cls):
        return [x]
    return list(x)


class Column:
    """A column validation component.

    :param dtype: any dtype spec accepted by ``engine.normalize_dtype``; None
        skips the dtype check.
    :param checks: Check or list of Checks.
    :param parsers: Parser or list of Parsers (run before checks).
    :param nullable: False -> null values are violations
        (reference backends/pyspark/column.py:131-151).
    :param unique: True -> no duplicate values (reference
        backends/pandas/array.py:354-397; the reference pyspark backend omits
        per-column unique — we support it natively).
    :param coerce: cast the column to ``dtype`` before checks; rows where a
        non-null value casts to null are coercion errors
        (reference backends/pyspark/container.py:381-483).
    :param required: False -> column may be absent
        (reference backends/pyspark/container.py:262-273).
    :param regex: treat ``name`` as a regex matched against df.columns
        (reference backends/pandas/components.py:174-227).
    :param default: fill value for nulls (applied before checks; also used by
        add_missing_columns, reference backends/pandas/container.py:418-548).
    """

    def __init__(
        self,
        dtype: Any = None,
        checks: Check | list[Check] | None = None,
        parsers: Parser | list[Parser] | None = None,
        *,
        nullable: bool = True,
        unique: bool = False,
        coerce: bool = False,
        required: bool = True,
        name: str | None = None,
        regex: bool = False,
        default: Any = None,
        title: str | None = None,
        description: str | None = None,
        metadata: dict | None = None,
    ):
        self.dtype: T.DataType | None = (
            normalize_dtype(dtype) if dtype is not None else None
        )
        self.checks = _as_list(checks, Check)
        for c in self.checks:
            if not isinstance(c, Check) and callable(c):
                raise SchemaInitError(
                    "wrap custom callables in Check(...)"
                )
        self.parsers = _as_list(parsers, Parser)
        self.nullable = nullable
        self.unique = unique
        self.coerce = coerce
        self.required = required
        self.name = name
        self.regex = regex
        self.default = default
        self.title = title
        self.description = description
        self.metadata = metadata

    def set_name(self, name: str) -> "Column":
        self.name = name
        return self

    def matching_columns(self, df_columns: list[str]) -> list[str]:
        """Expand regex columns against actual dataframe columns
        (reference backends/pandas/components.py:174-227)."""
        if not self.regex:
            return [self.name] if self.name in df_columns else []
        pat = re.compile(self.name)
        return [c for c in df_columns if pat.match(c)]

    def __repr__(self) -> str:
        dt = self.dtype.simpleString() if self.dtype is not None else None
        return f"<Column {self.name!r} dtype={dt} checks={len(self.checks)}>"

    @property
    def properties(self) -> dict:
        return {
            "dtype": self.dtype,
            "checks": self.checks,
            "parsers": self.parsers,
            "nullable": self.nullable,
            "unique": self.unique,
            "coerce": self.coerce,
            "required": self.required,
            "name": self.name,
            "regex": self.regex,
            "default": self.default,
            "title": self.title,
            "description": self.description,
            "metadata": self.metadata,
        }


class ColumnSchema(Column):
    """Standalone single-column schema — validate one column of a DataFrame
    without declaring the whole table (reference
    pandera/api/pyspark/column_schema.py:19,91-147)."""

    def validate(self, df, column: str | None = None, *, lazy: bool = True):
        from .container import DataFrameSchema

        name = column or self.name
        if name is None:
            raise SchemaInitError("ColumnSchema needs a column name")
        self.name = name
        schema = DataFrameSchema({name: self}, name=f"column_{name}")
        return schema.validate(df, lazy=lazy)
