"""Parser: a pre-check transform (normalization) applied to a column or frame.

Reference: /root/reference/pandera/api/parsers.py:9-86; execution order (parsers
before checks) at backends/pandas/array.py:287-311 and
backends/pandas/container.py:792-809.

Spark-native semantics: a column parser is ``fn(col: Column) -> Column``
compiled into ``df.withColumn(name, fn(F.col(name)))``; a dataframe parser is
``fn(df: DataFrame) -> DataFrame``.
"""

from __future__ import annotations

from collections.abc import Callable


class Parser:
    def __init__(
        self,
        parser_fn: Callable,
        *,
        element_wise: bool = False,
        name: str | None = None,
        title: str | None = None,
        description: str | None = None,
    ):
        if not callable(parser_fn):
            raise ValueError("parser_fn must be callable")
        self.parser_fn = parser_fn
        self.element_wise = element_wise
        self.name = name or getattr(parser_fn, "__name__", "parser")
        self.title = title
        self.description = description

    def __call__(self, target):
        return self.parser_fn(target)

    def __repr__(self) -> str:
        return f"<Parser {self.name}>"
