"""Data synthesis: generate data satisfying a schema (inverse execution).

Reference: /root/reference/pandera/strategies/pandas_strategies.py (1875 LoC,
hypothesis-based) and the constraint aggregator
strategies/constraints.py:77-245 (``FieldConstraints.merge`` with conflict
detection, so sibling checks compile to ONE generator instead of chained
filters).

Spark-native twist: two generation paths —
- :func:`example`: small fixture frames via ``createDataFrame`` (driver rng);
- :func:`synthesize`: scalable generation via ``spark.range(n)`` + seeded
  ``rand()``/hash expressions — generation happens ON the cluster, so you can
  make a 10 TB conforming table without driver involvement.
"""

from __future__ import annotations

import datetime
import math
import random
import string as _string
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .checks import Check
from .components import Column
from .container import DataFrameSchema
from .errors import SchemaDefinitionError


class ConstraintConflictError(SchemaDefinitionError):
    """Two checks on the same column define an empty set
    (reference strategies/constraints.py ConstraintConflictError)."""


@dataclass
class FieldConstraints:
    """Merged constraints from all checks on one column
    (reference strategies/constraints.py:77-245)."""

    min_value: Any = None
    min_exclusive: bool = False
    max_value: Any = None
    max_exclusive: bool = False
    eq: Any = None
    isin: Optional[set] = None
    notin: set = field(default_factory=set)
    str_startswith: Optional[str] = None
    str_endswith: Optional[str] = None
    str_contains: Optional[str] = None
    str_len_min: Optional[int] = None
    str_len_max: Optional[int] = None
    arr_size_min: Optional[int] = None
    arr_size_max: Optional[int] = None
    arr_elem_min: Any = None
    arr_elem_max: Any = None

    def add_check(self, check: Check) -> None:
        s = check.statistics
        name = check.name
        if name == "array_size":
            if s.get("exact_value") is not None:
                self.arr_size_min = self.arr_size_max = s["exact_value"]
            else:
                if s.get("min_value") is not None:
                    self.arr_size_min = s["min_value"]
                if s.get("max_value") is not None:
                    self.arr_size_max = s["max_value"]
            return
        if name == "array_forall_in_range":
            self.arr_elem_min = s["min_value"]
            self.arr_elem_max = s["max_value"]
            return
        if name in ("greater_than",):
            self._merge_min(s["min_value"], exclusive=True)
        elif name == "greater_than_or_equal_to":
            self._merge_min(s["min_value"], exclusive=False)
        elif name == "less_than":
            self._merge_max(s["max_value"], exclusive=True)
        elif name == "less_than_or_equal_to":
            self._merge_max(s["max_value"], exclusive=False)
        elif name == "in_range":
            self._merge_min(s["min_value"], exclusive=not s.get("include_min", True))
            self._merge_max(s["max_value"], exclusive=not s.get("include_max", True))
        elif name == "equal_to":
            if self.eq is not None and self.eq != s["value"]:
                raise ConstraintConflictError(
                    f"conflicting equal_to: {self.eq!r} vs {s['value']!r}"
                )
            self.eq = s["value"]
        elif name == "not_equal_to":
            self.notin.add(s["value"])
        elif name == "isin":
            vals = set(s["allowed_values"])
            self.isin = vals if self.isin is None else (self.isin & vals)
            if not self.isin:
                raise ConstraintConflictError("isin intersection is empty")
        elif name == "notin":
            self.notin |= set(s["forbidden_values"])
        elif name == "unique_values_eq":
            vals = set(s["values"])
            self.isin = vals if self.isin is None else (self.isin & vals)
        elif name == "str_startswith":
            self.str_startswith = s["string"]
        elif name == "str_endswith":
            self.str_endswith = s["string"]
        elif name == "str_contains":
            self.str_contains = s["pattern"]
        elif name == "str_matches":
            # only literal-prefix patterns are synthesized (same limitation
            # class as the reference's regex strategies)
            pat = s["pattern"].lstrip("^")
            prefix = ""
            for ch in pat:
                if ch.isalnum() or ch in "_- #":
                    prefix += ch
                else:
                    break
            if prefix:
                self.str_startswith = prefix
        elif name == "str_length":
            if s.get("exact_value") is not None:
                self.str_len_min = self.str_len_max = s["exact_value"]
            else:
                if s.get("min_value") is not None:
                    self.str_len_min = s["min_value"]
                if s.get("max_value") is not None:
                    self.str_len_max = s["max_value"]
        # unknown/custom checks: skipped (reference filters post-hoc; we
        # document the gap instead of chaining rejection filters)
        self._validate()

    def _merge_min(self, v, exclusive: bool) -> None:
        if self.min_value is None or v > self.min_value or (
            v == self.min_value and exclusive
        ):
            self.min_value = v
            self.min_exclusive = exclusive

    def _merge_max(self, v, exclusive: bool) -> None:
        if self.max_value is None or v < self.max_value or (
            v == self.max_value and exclusive
        ):
            self.max_value = v
            self.max_exclusive = exclusive

    def _validate(self) -> None:
        if (
            self.min_value is not None
            and self.max_value is not None
            and (
                self.min_value > self.max_value
                or (
                    self.min_value == self.max_value
                    and (self.min_exclusive or self.max_exclusive)
                )
            )
        ):
            raise ConstraintConflictError(
                f"empty interval: ({self.min_value}, {self.max_value})"
            )
        if (
            self.str_len_min is not None
            and self.str_len_max is not None
            and self.str_len_min > self.str_len_max
        ):
            raise ConstraintConflictError("empty string-length interval")
        if self.isin is not None and self.notin:
            if not (self.isin - self.notin):
                raise ConstraintConflictError("isin minus notin is empty")


def _array_size_target(fc: FieldConstraints) -> int:
    """Array length satisfying the merged size bounds (default 3)."""
    if fc.arr_size_min is not None:
        return fc.arr_size_min
    if fc.arr_size_max is not None:
        return min(3, fc.arr_size_max)
    return 3


def column_constraints(col: Column) -> FieldConstraints:
    fc = FieldConstraints()
    for check in col.checks:
        if check.statistics:
            fc.add_check(check)
    return fc


# ---------------------------------------------------------------------------
# driver-side example generation
# ---------------------------------------------------------------------------

_INT_BOUNDS = {
    T.ByteType: (-128, 127),
    T.ShortType: (-32768, 32767),
    T.IntegerType: (-(2**31), 2**31 - 1),
    T.LongType: (-(2**40), 2**40),  # keep away from overflow edges
}


def _gen_value(dtype: T.DataType, fc: FieldConstraints, rng: random.Random,
               row_idx: int, unique: bool):
    if fc.eq is not None:
        return fc.eq
    if fc.isin is not None:
        choices = sorted(fc.isin - fc.notin, key=repr)
        return choices[row_idx % len(choices)] if unique else rng.choice(choices)

    if isinstance(dtype, tuple(_INT_BOUNDS)):
        lo, hi = _INT_BOUNDS[type(dtype)]
        lo = int(fc.min_value) + (1 if fc.min_exclusive else 0) if fc.min_value is not None else lo
        hi = int(fc.max_value) - (1 if fc.max_exclusive else 0) if fc.max_value is not None else hi
        if unique:
            return min(lo + row_idx, hi)
        return rng.randint(lo, hi)
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        lo = float(fc.min_value) if fc.min_value is not None else -1e6
        hi = float(fc.max_value) if fc.max_value is not None else 1e6
        span = hi - lo
        eps = span * 1e-9 if span else 1e-9
        lo2 = lo + eps if fc.min_exclusive else lo
        hi2 = hi - eps if fc.max_exclusive else hi
        v = lo2 + rng.random() * (hi2 - lo2)
        if isinstance(dtype, T.DecimalType):
            import decimal

            q = decimal.Decimal(1).scaleb(-dtype.scale)
            return decimal.Decimal(v).quantize(q)
        return v
    if isinstance(dtype, T.BooleanType):
        return bool(rng.getrandbits(1))
    if isinstance(dtype, T.StringType):
        lo = fc.str_len_min if fc.str_len_min is not None else 3
        hi = fc.str_len_max if fc.str_len_max is not None else max(lo, 12)
        prefix = fc.str_startswith or ""
        suffix = fc.str_endswith or ""
        middle = fc.str_contains or ""
        core_len = max(lo - len(prefix) - len(suffix) - len(middle), 0)
        if unique:
            tag = str(row_idx)
            core = tag + "".join(
                rng.choice(_string.ascii_lowercase)
                for _ in range(max(core_len - len(tag), 0))
            )
        else:
            core = "".join(
                rng.choice(_string.ascii_lowercase) for _ in range(core_len)
            )
        s = (prefix + middle + core + suffix)[: max(hi, lo)]
        while len(s) < lo:
            s += "x"
        return s
    if isinstance(dtype, T.DateType):
        lo = fc.min_value or datetime.date(2000, 1, 1)
        hi = fc.max_value or datetime.date(2030, 1, 1)
        if isinstance(lo, datetime.datetime):
            lo = lo.date()
        if isinstance(hi, datetime.datetime):
            hi = hi.date()
        days = (hi - lo).days
        return lo + datetime.timedelta(days=rng.randint(0, max(days, 0)))
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        lo = fc.min_value or datetime.datetime(2000, 1, 1)
        hi = fc.max_value or datetime.datetime(2030, 1, 1)
        if isinstance(lo, datetime.date) and not isinstance(lo, datetime.datetime):
            lo = datetime.datetime.combine(lo, datetime.time())
        if isinstance(hi, datetime.date) and not isinstance(hi, datetime.datetime):
            hi = datetime.datetime.combine(hi, datetime.time())
        secs = int((hi - lo).total_seconds())
        return lo + datetime.timedelta(seconds=rng.randint(0, max(secs, 0)))
    if isinstance(dtype, T.BinaryType):
        return bytes(rng.getrandbits(8) for _ in range(8))
    if isinstance(dtype, T.ArrayType):
        size = _array_size_target(fc)
        elem_fc = FieldConstraints(
            min_value=fc.arr_elem_min, max_value=fc.arr_elem_max
        )
        return [
            _gen_value(dtype.elementType, elem_fc, rng, row_idx, False)
            for _ in range(size)
        ]
    return None


def example(
    schema: DataFrameSchema, spark: SparkSession, size: int = 5, seed: int = 42
) -> DataFrame:
    """Generate ``size`` rows satisfying the schema
    (reference ``schema.example``, api/pandas/components.py:176-220)."""
    rng = random.Random(seed)
    unique_cols = set()
    if schema.unique:
        u = [schema.unique] if isinstance(schema.unique, str) else schema.unique
        unique_cols |= set(u)
    rows = []
    cols = [c for c in schema.columns.values() if not c.regex]
    for i in range(size):
        row = []
        for col in cols:
            fc = column_constraints(col)
            dtype = col.dtype or T.StringType()
            row.append(
                _gen_value(
                    dtype, fc, rng, i, col.unique or col.name in unique_cols
                )
            )
        rows.append(tuple(row))
    struct = T.StructType(
        [
            T.StructField(c.name, c.dtype or T.StringType(), c.nullable)
            for c in cols
        ]
    )
    return spark.createDataFrame(rows, struct)


# ---------------------------------------------------------------------------
# cluster-side scalable generation
# ---------------------------------------------------------------------------


def synthesize(
    schema: DataFrameSchema, spark: SparkSession, rows: int, seed: int = 42
) -> DataFrame:
    """Generate ``rows`` conforming rows distributed: ``spark.range`` +
    seeded rand()/pmod expressions, no driver data movement.  Columns with a
    unique constraint derive from the range id (guaranteed distinct)."""
    df = spark.range(rows)
    unique_cols = set()
    if schema.unique:
        u = [schema.unique] if isinstance(schema.unique, str) else schema.unique
        unique_cols |= set(u)
    exprs = []
    for i, col in enumerate(c for c in schema.columns.values() if not c.regex):
        fc = column_constraints(col)
        dtype = col.dtype or T.StringType()
        cid = F.col("id")
        r = F.rand(seed + i)
        is_unique = col.unique or col.name in unique_cols
        if fc.eq is not None:
            e = F.lit(fc.eq).cast(dtype)
        elif fc.isin is not None:
            choices = sorted(fc.isin - fc.notin, key=repr)
            arr = F.array(*[F.lit(v) for v in choices])
            idx = (
                F.pmod(cid, F.lit(len(choices)))
                if is_unique
                else (r * len(choices)).cast("int")
            )
            e = arr[idx].cast(dtype)
        elif isinstance(dtype, tuple(_INT_BOUNDS)):
            lo, hi = _INT_BOUNDS[type(dtype)]
            if fc.min_value is not None:
                lo = int(fc.min_value) + (1 if fc.min_exclusive else 0)
            if fc.max_value is not None:
                hi = int(fc.max_value) - (1 if fc.max_exclusive else 0)
            if is_unique:
                e = (F.lit(lo) + cid).cast(dtype)
            else:
                e = (F.lit(lo) + (r * (hi - lo + 1)).cast("long")).cast(dtype)
        elif isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
            lo = float(fc.min_value) if fc.min_value is not None else -1e6
            hi = float(fc.max_value) if fc.max_value is not None else 1e6
            eps = (hi - lo) * 1e-9
            lo2 = lo + eps if fc.min_exclusive else lo
            e = (F.lit(lo2) + r * (hi - lo2)).cast(dtype)
        elif isinstance(dtype, T.StringType):
            prefix = fc.str_startswith or ""
            if is_unique:
                e = F.concat(F.lit(prefix or "v"), cid.cast("string"))
            else:
                e = F.concat(
                    F.lit(prefix or "v"),
                    F.abs(F.hash(cid + F.lit(seed + i))).cast("string"),
                )
            if fc.str_len_max is not None:
                e = F.substring(e, 1, fc.str_len_max)
        elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            lo = fc.min_value or datetime.datetime(2000, 1, 1)
            hi = fc.max_value or datetime.datetime(2030, 1, 1)
            if isinstance(lo, datetime.date) and not isinstance(
                lo, datetime.datetime
            ):
                lo = datetime.datetime.combine(lo, datetime.time())
            if isinstance(hi, datetime.date) and not isinstance(
                hi, datetime.datetime
            ):
                hi = datetime.datetime.combine(hi, datetime.time())
            secs = max(int((hi - lo).total_seconds()), 1)
            epoch_lo = int(lo.replace(tzinfo=datetime.timezone.utc).timestamp())
            e = F.timestamp_seconds(
                F.lit(epoch_lo) + (r * secs).cast("long")
            ).cast(dtype)
        elif isinstance(dtype, T.BooleanType):
            e = r > 0.5
        elif isinstance(dtype, T.ArrayType) and isinstance(
            dtype.elementType,
            tuple(_INT_BOUNDS) + (T.DoubleType, T.FloatType),
        ):
            # arrays honoring array_size / array_forall_in_range: element
            # (row, j) derives from pmod(xxhash64(id, j, seed)) — pure
            # expression, deterministic, executor-side
            size = _array_size_target(fc)
            lo = float(fc.arr_elem_min) if fc.arr_elem_min is not None else 0.0
            hi = float(fc.arr_elem_max) if fc.arr_elem_max is not None else 1.0
            span = hi - lo

            def make_elem(_dt, _lo, _span, _i):
                def elem(j):
                    u = (
                        F.pmod(
                            F.xxhash64(F.col("id"), j, F.lit(seed + _i)),
                            F.lit(1_000_000),
                        ).cast("double")
                        / 1_000_000.0
                    )
                    v = F.lit(_lo) + u * F.lit(_span)
                    if isinstance(_dt, tuple(_INT_BOUNDS)):
                        v = F.floor(v)
                    return v.cast(_dt)

                return elem

            if size <= 0:
                # sequence(1, 0) would yield the DESCENDING [1, 0]
                e = F.array().cast(dtype)
            else:
                e = F.transform(
                    F.sequence(F.lit(1), F.lit(int(size))),
                    make_elem(dtype.elementType, lo, span, i),
                ).cast(dtype)
        else:
            e = F.lit(None).cast(dtype)
        exprs.append(e.alias(col.name))
    return df.select(*exprs)
