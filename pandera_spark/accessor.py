"""``df.pandera.errors`` accessor.

Mirrors /root/reference/pandera/accessors/pyspark_sql_accessor.py:20-52: after
``schema.validate(df)`` the error report dict is reachable from the returned
DataFrame.  DataFrames are plain Python objects, so we attach the report as an
instance attribute and expose it through a ``pandera`` property registered on
``pyspark.sql.DataFrame``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    from .report import ValidationResult

_REPORT_ATTR = "_pandera_report"
_RESULT_ATTR = "_pandera_result"


class PanderaAccessor:
    def __init__(self, df: DataFrame):
        self._df = df

    @property
    def errors(self) -> dict:
        """The summarized error report ({} when validation passed)."""
        return getattr(self._df, _REPORT_ATTR, {})

    @property
    def result(self) -> Optional["ValidationResult"]:
        """Full ValidationResult from the last validate call, if any."""
        return getattr(self._df, _RESULT_ATTR, None)


def attach_report(df: DataFrame, report: dict, result=None) -> None:
    object.__setattr__(df, _REPORT_ATTR, report)
    if result is not None:
        object.__setattr__(df, _RESULT_ATTR, result)


def _register() -> None:
    if not hasattr(DataFrame, "pandera"):
        DataFrame.pandera = property(lambda self: PanderaAccessor(self))


_register()
