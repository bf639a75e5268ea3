"""Spark 4 Python Data Source API integration: ``format("pandera_synth")``.

A schema-driven synthetic data source — the inverse-execution surface of
SURVEY.md §2.J exposed as a first-class Spark source.  The schema ships to
executors as its own JSON serialization (§2.I), so generation is fully
distributed: each :class:`InputPartition` covers a disjoint row-id range and
every row is derived from a per-row seeded RNG, which makes the output

- **partition-invariant**: the same (schema, rows, seed) produces identical
  data for any ``numPartitions``, and
- **retry-safe**: a re-executed task regenerates exactly the rows it lost
  (deterministic sources are what makes speculative execution and
  exactly-once streaming cheap at cluster scale).

Two generation paths exist on purpose (same trade-off as the reference's
hypothesis-strategies vs nothing, strategies/pandas_strategies.py:1539):

- :func:`pandera_spark.strategies.synthesize` — pure Catalyst expressions
  (``spark.range`` + seeded ``rand()``), the 100 TB path; zero Python cost
  but limited to constraints expressible as closed-form expressions.
- this source — Python-side row generation through the same
  ``FieldConstraints`` machinery that powers ``example()``; handles every
  constraint the engine understands, parallel but Python-speed.  Use for
  fixtures, medium-scale soak data, and streaming demos.

The streaming half (``spark.readStream.format("pandera_synth")``) emits
``rowsPerBatch`` conforming rows per micro-batch with monotone offsets —
a rate-source analogue whose payload satisfies a schema, for exercising
``validate_stream``/``foreachBatch`` pipelines end-to-end.

Requires pyspark >= 4.0 (``pyspark.sql.datasource``); import is gated so the
rest of the library works on older runtimes.
"""

from __future__ import annotations

import random
from typing import TYPE_CHECKING, Iterator, Sequence, Tuple

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    HAS_PYTHON_DATASOURCE = True
except ImportError:  # pragma: no cover - env has pyspark 4.1
    HAS_PYTHON_DATASOURCE = False
    DataSource = DataSourceReader = DataSourceStreamReader = object

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value


if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

    from .container import DataFrameSchema


_FORMAT_NAME = "pandera_synth"


def _load_schema(options) -> "DataFrameSchema":
    from .io import schema_from_json

    text = options.get("schema")
    if not text:
        raise ValueError(
            "pandera_synth requires a 'schema' option "
            "(DataFrameSchema JSON from pandera_spark.io.schema_to_json)"
        )
    return schema_from_json(text)


def _gen_columns(schema: "DataFrameSchema"):
    """(column, constraints, is_unique) for each generatable column."""
    from .strategies import column_constraints

    unique_cols = set()
    if schema.unique:
        u = (
            [schema.unique]
            if isinstance(schema.unique, str)
            else schema.unique
        )
        unique_cols |= set(u)
    out = []
    for col in schema.columns.values():
        if col.regex:
            continue
        out.append(
            (col, column_constraints(col), col.unique or col.name in unique_cols)
        )
    return out


def _row_at(gen_cols, seed: int, i: int) -> Tuple:
    """Row for global index ``i`` — seeded per-row so the value stream is
    independent of how rows are sliced into partitions."""
    from pyspark.sql import types as T

    from .strategies import _gen_value

    rng = random.Random((seed << 32) ^ i)
    return tuple(
        _gen_value(col.dtype or T.StringType(), fc, rng, i, is_unique)
        for col, fc, is_unique in gen_cols
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _split(start: int, end: int, n: int) -> Sequence[_RangePartition]:
    total = end - start
    n = max(1, min(n, total)) if total else 1
    step, rem = divmod(total, n)
    parts, lo = [], start
    for k in range(n):
        hi = lo + step + (1 if k < rem else 0)
        parts.append(_RangePartition(lo, hi))
        lo = hi
    return parts


class _SynthReader(DataSourceReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numpartitions", 8))
        self.gen_cols = _gen_columns(_load_schema(options))

    def partitions(self) -> Sequence[InputPartition]:
        return _split(0, self.rows, self.num_partitions)

    def read(self, partition: _RangePartition) -> Iterator[Tuple]:
        for i in range(partition.start, partition.end):
            yield _row_at(self.gen_cols, self.seed, i)


class _SynthStreamReader(DataSourceStreamReader):
    """Monotone row-counter offsets; each poll advances by ``rowsPerBatch``."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self.num_partitions = int(options.get("numpartitions", 4))
        self.gen_cols = _gen_columns(_load_schema(options))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        self._latest = getattr(self, "_latest", 0) + self.rows_per_batch
        return {"index": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return _split(start["index"], end["index"], self.num_partitions)

    def read(self, partition: _RangePartition) -> Iterator[Tuple]:
        for i in range(partition.start, partition.end):
            yield _row_at(self.gen_cols, self.seed, i)

    def commit(self, end: dict) -> None:
        pass


class SyntheticSchemaDataSource(DataSource):
    """``spark.read.format("pandera_synth")`` — see module docstring.

    Options: ``schema`` (required, schema JSON), ``rows`` (batch, default
    1000), ``rowsPerBatch`` (stream, default 100), ``seed`` (default 42),
    ``numPartitions`` (default 8 batch / 4 stream).
    """

    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self):
        from pyspark.sql import types as T

        sch = _load_schema(self.options)
        return T.StructType(
            [
                T.StructField(c.name, c.dtype or T.StringType(), c.nullable)
                for c in sch.columns.values()
                if not c.regex
            ]
        )

    def reader(self, schema) -> _SynthReader:
        return _SynthReader(self.options)

    def streamReader(self, schema) -> _SynthStreamReader:
        return _SynthStreamReader(self.options)


def register(spark: "SparkSession") -> None:
    """Register the source on this session (idempotent)."""
    if not HAS_PYTHON_DATASOURCE:
        raise NotImplementedError(
            "pyspark.sql.datasource requires pyspark >= 4.0"
        )
    spark.dataSource.register(SyntheticSchemaDataSource)


def read_synthetic(
    spark: "SparkSession",
    schema: "DataFrameSchema",
    rows: int,
    *,
    seed: int = 42,
    num_partitions: int = 8,
) -> "DataFrame":
    """Convenience wrapper: register + read ``rows`` conforming rows."""
    from .io import schema_to_json

    register(spark)
    return (
        spark.read.format(_FORMAT_NAME)
        .option("schema", schema_to_json(schema))
        .option("rows", rows)
        .option("seed", seed)
        .option("numPartitions", num_partitions)
        .load()
    )
