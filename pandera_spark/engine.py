"""Type engine: alias resolution + parametrized equality over pyspark.sql.types.

The reference defines a per-library dtype registry
(/root/reference/pandera/engines/pyspark_engine.py: Bool:147, String:179,
Int:201, Float:223, BigInt:245, ShortInt:267, ByteInt:290, Decimal:311 with
parametrized equality :336-360, Double:378, Date:399, Timestamp:431 accepting
TimestampNTZ :420-426, Binary:452, ArrayType:465-514, MapType:522-579 with deep
structural equality).  Spark already gives all of that natively: this module is
just a resolver from user-friendly specs (python types, string aliases, DDL,
DataType classes/instances) to a canonical ``pyspark.sql.types.DataType``, plus
an equality predicate with the reference's Timestamp/TimestampNTZ equivalence.

We additionally support StructType columns (the reference pyspark engine omits
them; Spark makes them free — noted in SURVEY.md §1.2).
"""

from __future__ import annotations

import datetime
import decimal
import re
from typing import Any

from pyspark.sql import types as T

from .errors import SchemaInitError

# -- string aliases -----------------------------------------------------------
# mirrors the "equivalents" lists registered in the reference engine, e.g.
# pyspark_engine.py:301-308 ("bigint", "long"), :410-426 (datetime aliases).
_SIMPLE_ALIASES: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "booleantype()": T.BooleanType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "stringtype()": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "integertype()": T.IntegerType(),
    "int32": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "longtype()": T.LongType(),
    "int64": T.LongType(),
    "smallint": T.ShortType(),
    "short": T.ShortType(),
    "shorttype()": T.ShortType(),
    "int16": T.ShortType(),
    "tinyint": T.ByteType(),
    "byte": T.ByteType(),
    "bytetype()": T.ByteType(),
    "int8": T.ByteType(),
    "float": T.FloatType(),
    "floattype()": T.FloatType(),
    "float32": T.FloatType(),
    "double": T.DoubleType(),
    "doubletype()": T.DoubleType(),
    "float64": T.DoubleType(),
    "decimal": T.DecimalType(10, 0),
    "decimaltype()": T.DecimalType(10, 0),
    "date": T.DateType(),
    "datetype()": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "timestamptype()": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "timestampntztype()": T.TimestampNTZType(),
    "binary": T.BinaryType(),
    "binarytype()": T.BinaryType(),
}

_PYTHON_TYPES: dict[type, T.DataType] = {
    bool: T.BooleanType(),
    int: T.LongType(),  # Spark's createDataFrame convention for python ints
    float: T.DoubleType(),
    str: T.StringType(),
    bytes: T.BinaryType(),
    bytearray: T.BinaryType(),
    datetime.date: T.DateType(),
    datetime.datetime: T.TimestampType(),
    decimal.Decimal: T.DecimalType(38, 18),
}

_DECIMAL_RE = re.compile(r"^decimal(?:type)?\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_ARRAY_RE = re.compile(r"^array\s*<(.+)>$")
_MAP_RE = re.compile(r"^map\s*<(.+)>$")


def _split_top_level(s: str) -> list[str]:
    """Split on top-level commas (not inside <...> or (...))."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts]


def normalize_dtype(spec: Any) -> T.DataType:
    """Resolve a dtype spec to a canonical Spark ``DataType``.

    Accepts DataType instances, DataType classes, python builtin types,
    and string aliases / DDL fragments (``"bigint"``, ``"decimal(10,2)"``,
    ``"array<string>"``, ``"map<string,int>"``).
    """
    if spec is None:
        raise SchemaInitError("dtype spec must not be None")
    if isinstance(spec, T.DataType):
        return spec
    if isinstance(spec, type) and issubclass(spec, T.DataType):
        return spec()
    # abstract dtypes (pandera.pyspark-style: Column(Int64), Decimal(10,2))
    from . import dtypes as _abstract

    if isinstance(spec, _abstract.DataType):
        return spec.resolve()
    if isinstance(spec, type) and issubclass(spec, _abstract.DataType):
        return spec().resolve()
    if isinstance(spec, type) and spec in _PYTHON_TYPES:
        return _PYTHON_TYPES[spec]
    if isinstance(spec, str):
        key = spec.strip().lower()
        if key in _SIMPLE_ALIASES:
            return _SIMPLE_ALIASES[key]
        m = _DECIMAL_RE.match(key)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        m = _ARRAY_RE.match(key)
        if m:
            return T.ArrayType(normalize_dtype(m.group(1)))
        m = _MAP_RE.match(key)
        if m:
            kv = _split_top_level(m.group(1))
            if len(kv) != 2:
                raise SchemaInitError(f"bad map dtype spec: {spec!r}")
            return T.MapType(normalize_dtype(kv[0]), normalize_dtype(kv[1]))
        if key.startswith("struct<"):
            # delegate structs to Spark's DDL parser (driver-only, no JVM in
            # the common path; fall back raises a clear error)
            try:
                return T.StructType.fromDDL(spec)  # type: ignore[attr-defined]
            except Exception as exc:  # pragma: no cover
                raise SchemaInitError(
                    f"cannot parse struct dtype {spec!r}: {exc}"
                ) from exc
        raise SchemaInitError(f"unknown dtype alias: {spec!r}")
    raise SchemaInitError(f"cannot interpret dtype spec: {spec!r}")


def dtype_equal(
    expected: T.DataType,
    actual: T.DataType,
    *,
    ignore_nullability: bool = True,
    timestamp_ntz_equivalent: bool = True,
) -> bool:
    """Deep structural dtype equality.

    - Decimal compares precision & scale (reference pyspark_engine.py:336-360)
    - Array compares element type (containsNull ignored when
      ``ignore_nullability``; reference :494-514 compares it — we relax since
      parquet round-trips flip it)
    - Map compares key/value types (reference :556-579)
    - Timestamp accepts TimestampNTZ when ``timestamp_ntz_equivalent``
      (reference :420-426)
    """
    if timestamp_ntz_equivalent:
        ts = (T.TimestampType, T.TimestampNTZType)
        if isinstance(expected, ts) and isinstance(actual, ts):
            return True
    if isinstance(expected, T.DecimalType) or isinstance(actual, T.DecimalType):
        return (
            isinstance(expected, T.DecimalType)
            and isinstance(actual, T.DecimalType)
            and expected.precision == actual.precision
            and expected.scale == actual.scale
        )
    if isinstance(expected, T.ArrayType) or isinstance(actual, T.ArrayType):
        if not (
            isinstance(expected, T.ArrayType) and isinstance(actual, T.ArrayType)
        ):
            return False
        if not ignore_nullability and expected.containsNull != actual.containsNull:
            return False
        return dtype_equal(
            expected.elementType,
            actual.elementType,
            ignore_nullability=ignore_nullability,
            timestamp_ntz_equivalent=timestamp_ntz_equivalent,
        )
    if isinstance(expected, T.MapType) or isinstance(actual, T.MapType):
        if not (isinstance(expected, T.MapType) and isinstance(actual, T.MapType)):
            return False
        if (
            not ignore_nullability
            and expected.valueContainsNull != actual.valueContainsNull
        ):
            return False
        return dtype_equal(
            expected.keyType, actual.keyType,
            ignore_nullability=ignore_nullability,
        ) and dtype_equal(
            expected.valueType, actual.valueType,
            ignore_nullability=ignore_nullability,
        )
    if isinstance(expected, T.StructType) or isinstance(actual, T.StructType):
        if not (
            isinstance(expected, T.StructType)
            and isinstance(actual, T.StructType)
        ):
            return False
        if [f.name for f in expected.fields] != [f.name for f in actual.fields]:
            return False
        return all(
            dtype_equal(e.dataType, a.dataType,
                        ignore_nullability=ignore_nullability)
            for e, a in zip(expected.fields, actual.fields)
        )
    return type(expected) is type(actual)


# -- dtype families for check type-gating -------------------------------------
# mirrors /root/reference/pandera/backends/pyspark/decorators.py:16-28
NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
DATE_TYPES = (T.DateType, T.TimestampType, T.TimestampNTZType)
STRING_TYPES = (T.StringType,)
BINARY_TYPES = (T.BinaryType,)
BOOLEAN_TYPES = (T.BooleanType,)


def dtype_to_ddl(dtype: T.DataType) -> str:
    """Spark DDL string for a dtype (``simpleString`` is already DDL)."""
    return dtype.simpleString()
