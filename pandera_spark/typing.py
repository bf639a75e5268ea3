"""Typing generics: ``DataFrame[Model]`` annotations for ``@check_types``.

Reference: /root/reference/pandera/typing/pyspark_sql.py:57-66 (generic
DataFrame bound to a DataFrameModel type parameter).
"""

from __future__ import annotations

from typing import Generic, TypeVar

import pyspark.sql

from .model import DataFrameModel

T = TypeVar("T", bound=DataFrameModel)


class DataFrame(pyspark.sql.DataFrame, Generic[T]):
    """Annotation-only generic: ``def f(df: DataFrame[MyModel]) -> ...``.

    Never instantiated — used purely as a type annotation that
    ``@check_types`` introspects.
    """

    def __init__(self, *args, **kwargs):  # pragma: no cover
        raise TypeError(
            "pandera_spark.typing.DataFrame is annotation-only; "
            "use pyspark.sql.DataFrame instances at runtime"
        )
