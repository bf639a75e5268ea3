"""Abstract dtype objects — the engine-independent semantic types of the
reference (reference pandera/dtypes.py: Bool:177, Int*:190-241,
UInt*:248-290, Float*:298-347, Complex*:354-396, Decimal:411,
Category:469, String:501, Date:514, Timestamp:522, Timedelta:533,
Binary:549), re-exported from the package root exactly like
``pandera.pyspark`` does, and resolvable anywhere a dtype spec is
accepted (``Column(Int64)``, ``Field`` annotations, ...).

Spark disposition:
- Types with a native Spark equivalent resolve to ``pyspark.sql.types``.
- ``Timedelta`` maps to ``DayTimeIntervalType`` (Spark's duration type) —
  a capability the reference pyspark engine lacks.
- Types Spark cannot represent (unsigned ints, complex, float16/128,
  Category) exist as names for API-compatibility but raise
  ``UnsupportedDtypeError`` when a schema tries to use them — the same
  outcome the reference pyspark engine produces by having no registered
  equivalent (reference pandera/engines/pyspark_engine.py covers only
  Bool/String/Int/Float/BigInt/ShortInt/ByteInt/Decimal/Double/Date/
  Timestamp/Binary/Array/Map).
"""

from __future__ import annotations

from pyspark.sql import types as T

from .errors import UnsupportedDtypeError

__all__ = [
    "DataType",
    "Bool",
    "Int",
    "Int8",
    "Int16",
    "Int32",
    "Int64",
    "UInt",
    "UInt8",
    "UInt16",
    "UInt32",
    "UInt64",
    "Float",
    "Float16",
    "Float32",
    "Float64",
    "Float128",
    "Complex",
    "Complex64",
    "Complex128",
    "Complex256",
    "Decimal",
    "Category",
    "String",
    "Date",
    "DateTime",
    "Timestamp",
    "Timedelta",
    "Binary",
]


class DataType:
    """Abstract dtype marker.  Subclasses either carry a Spark
    equivalent (``spark_type``) or raise on resolution."""

    #: Spark equivalent; None => unsupported on the Spark engine
    spark_type: T.DataType | None = None

    def resolve(self) -> T.DataType:
        if self.spark_type is None:
            raise UnsupportedDtypeError(
                f"dtype {type(self).__name__} has no Spark equivalent "
                "(unsigned/complex/float16/float128/Category are not "
                "representable as Spark column types)"
            )
        return self.spark_type

    def __repr__(self) -> str:  # pragma: no cover
        return type(self).__name__


class Bool(DataType):
    spark_type = T.BooleanType()


class Int(DataType):
    spark_type = T.IntegerType()


class Int8(DataType):
    spark_type = T.ByteType()


class Int16(DataType):
    spark_type = T.ShortType()


class Int32(DataType):
    spark_type = T.IntegerType()


class Int64(DataType):
    spark_type = T.LongType()


class UInt(DataType):
    spark_type = None


class UInt8(UInt):
    pass


class UInt16(UInt):
    pass


class UInt32(UInt):
    pass


class UInt64(UInt):
    pass


class Float(DataType):
    spark_type = T.FloatType()


class Float16(DataType):
    spark_type = None


class Float32(DataType):
    spark_type = T.FloatType()


class Float64(DataType):
    spark_type = T.DoubleType()


class Float128(DataType):
    spark_type = None


class Complex(DataType):
    spark_type = None


class Complex64(Complex):
    pass


class Complex128(Complex):
    pass


class Complex256(Complex):
    pass


class Decimal(DataType):
    """Parametrized decimal (reference dtypes.py:411; pyspark engine
    equality on precision+scale, pyspark_engine.py:336-360)."""

    def __init__(self, precision: int = 10, scale: int = 0):
        self.precision = int(precision)
        self.scale = int(scale)
        self.spark_type = T.DecimalType(self.precision, self.scale)


class Category(DataType):
    """Categorical (reference dtypes.py:469) — no Spark column-type
    equivalent; declare a String column with ``Check.isin(categories)``
    instead (that is also how inference emits categories)."""

    def __init__(self, categories=None, ordered: bool = False):
        self.categories = categories
        self.ordered = ordered
        self.spark_type = None


class String(DataType):
    spark_type = T.StringType()


class Date(DataType):
    spark_type = T.DateType()


class Timestamp(DataType):
    spark_type = T.TimestampType()


#: reference alias (pandera.DateTime is Timestamp, dtypes.py:522)
DateTime = Timestamp


class Timedelta(DataType):
    """Duration — Spark's ``DayTimeIntervalType`` (beyond the reference
    pyspark engine, which cannot represent timedeltas at all)."""

    spark_type = T.DayTimeIntervalType()


class Binary(DataType):
    spark_type = T.BinaryType()
