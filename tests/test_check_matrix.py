"""Conformance matrix: every builtin check × accepted Spark dtype ×
pass/fail data, modeled on the reference's parametrized suite
(/root/reference/tests/pyspark/test_pyspark_check.py — per-check,
per-dtype pass/fail frames with error-report assertions).

Each case builds a two-row frame (one passing, one failing value), runs a
single-column schema, and asserts exactly one violation attributed to the
right check — plus the all-pass frame validates clean.
"""

import datetime

import pytest
from pyspark.sql import types as T

from pandera_spark import Check, Column, DataFrameSchema

D = datetime.datetime

# (label, spark type, check factory, passing value, failing value)
CASES = [
    # equal_to / not_equal_to across numeric, string, date, bool, binary
    ("eq_int", T.IntegerType(), lambda: Check.eq(5), 5, 6),
    ("eq_long", T.LongType(), lambda: Check.eq(5), 5, 6),
    ("eq_short", T.ShortType(), lambda: Check.eq(5), 5, 6),
    ("eq_byte", T.ByteType(), lambda: Check.eq(5), 5, 6),
    ("eq_double", T.DoubleType(), lambda: Check.eq(1.5), 1.5, 2.5),
    ("eq_float", T.FloatType(), lambda: Check.eq(1.5), 1.5, 2.5),
    ("eq_str", T.StringType(), lambda: Check.eq("a"), "a", "b"),
    ("eq_bool", T.BooleanType(), lambda: Check.eq(True), True, False),
    ("eq_binary", T.BinaryType(), lambda: Check.eq(b"a"), b"a", b"b"),
    ("eq_ts", T.TimestampType(), lambda: Check.eq(D(2024, 1, 1)),
     D(2024, 1, 1), D(2024, 1, 2)),
    ("eq_date", T.DateType(),
     lambda: Check.eq(datetime.date(2024, 1, 1)),
     datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)),
    ("ne_int", T.IntegerType(), lambda: Check.ne(5), 6, 5),
    ("ne_str", T.StringType(), lambda: Check.ne("x"), "y", "x"),
    # comparisons: numeric + datetime
    ("gt_int", T.IntegerType(), lambda: Check.gt(5), 6, 5),
    ("gt_double", T.DoubleType(), lambda: Check.gt(0.5), 1.0, 0.25),
    ("gt_decimal", T.DecimalType(10, 2), lambda: Check.gt(5),
     __import__("decimal").Decimal("6.00"),
     __import__("decimal").Decimal("4.00")),
    ("gt_ts", T.TimestampType(), lambda: Check.gt(D(2024, 1, 1)),
     D(2024, 6, 1), D(2023, 1, 1)),
    ("ge_int", T.IntegerType(), lambda: Check.ge(5), 5, 4),
    ("lt_int", T.IntegerType(), lambda: Check.lt(5), 4, 5),
    ("lt_ts", T.TimestampType(), lambda: Check.lt(D(2024, 1, 1)),
     D(2023, 1, 1), D(2024, 6, 1)),
    ("le_int", T.IntegerType(), lambda: Check.le(5), 5, 6),
    # in_range open/closed variants
    ("in_range_closed", T.IntegerType(), lambda: Check.in_range(1, 3), 3, 4),
    ("in_range_open_min", T.IntegerType(),
     lambda: Check.in_range(1, 3, include_min=False), 2, 1),
    ("in_range_open_max", T.IntegerType(),
     lambda: Check.in_range(1, 3, include_max=False), 2, 3),
    ("in_range_ts", T.TimestampType(),
     lambda: Check.in_range(D(2024, 1, 1), D(2024, 12, 31)),
     D(2024, 6, 1), D(2025, 6, 1)),
    # membership: numeric, string, binary
    ("isin_int", T.IntegerType(), lambda: Check.isin([1, 2, 3]), 2, 9),
    ("isin_str", T.StringType(), lambda: Check.isin(["a", "b"]), "a", "z"),
    ("isin_binary", T.BinaryType(), lambda: Check.isin([b"a", b"b"]),
     b"a", b"z"),
    ("notin_int", T.IntegerType(), lambda: Check.notin([1, 2]), 3, 1),
    ("notin_str", T.StringType(), lambda: Check.notin(["bad"]), "ok", "bad"),
    # string family
    ("str_matches", T.StringType(), lambda: Check.str_matches(r"[A-Z]\d"),
     "A1", "a1"),
    ("str_contains", T.StringType(), lambda: Check.str_contains(r"\d"),
     "a1b", "abc"),
    ("str_startswith", T.StringType(), lambda: Check.str_startswith("ab"),
     "abc", "xabc"),
    ("str_endswith", T.StringType(), lambda: Check.str_endswith("yz"),
     "xyz", "yzx"),
    ("str_length_exact", T.StringType(), lambda: Check.str_length(3),
     "abc", "ab"),
    ("str_length_range", T.StringType(), lambda: Check.str_length(2, 4),
     "abc", "a"),
]


@pytest.mark.parametrize(
    "label,dtype,check_factory,ok,bad",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_check_dtype_matrix(spark, label, dtype, check_factory, ok, bad):
    schema = DataFrameSchema(
        {"v": Column(dtype, check_factory())}, name=label
    )
    st = T.StructType([T.StructField("v", dtype, True)])

    clean = spark.createDataFrame([(ok,)], st)
    res = schema.validate_result(clean)
    assert not res.errors, (label, res.report)

    dirty = spark.createDataFrame([(ok,), (bad,)], st)
    res = schema.validate_result(dirty)
    data_errs = [
        e for e in res.errors if e.reason_code.value == "schema_component_check"
    ]
    assert len(data_errs) == 1, (label, res.report)
    assert data_errs[0].failure_cases_count == 1, (label, res.report)


GATING_CASES = [
    # numeric-only comparison on string / boolean / array columns
    ("gt_on_string", T.StringType(), lambda: Check.gt(5), "a"),
    ("in_range_on_bool", T.BooleanType(),
     lambda: Check.in_range(0, 1), True),
    ("str_matches_on_int", T.IntegerType(),
     lambda: Check.str_matches("a"), 3),
    ("str_length_on_double", T.DoubleType(),
     lambda: Check.str_length(1), 1.0),
    ("isin_on_array", T.ArrayType(T.IntegerType()),
     lambda: Check.isin([1]), [1]),
]


@pytest.mark.parametrize(
    "label,dtype,check_factory,value",
    GATING_CASES,
    ids=[c[0] for c in GATING_CASES],
)
def test_type_gating_matrix(spark, label, dtype, check_factory, value):
    """Unsupported dtype -> compile-time check_error, no Spark job
    (reference backends/pyspark/decorators.py:42-104)."""
    schema = DataFrameSchema({"v": Column(dtype, check_factory())})
    st = T.StructType([T.StructField("v", dtype, True)])
    df = spark.createDataFrame([(value,)], st)
    res = schema.validate_result(df)
    assert any(e.reason_code.value == "check_error" for e in res.errors), (
        label,
        res.report,
    )


@pytest.mark.parametrize("alias,canonical", [
    ("eq", "equal_to"), ("ne", "not_equal_to"), ("gt", "greater_than"),
    ("ge", "greater_than_or_equal_to"), ("lt", "less_than"),
    ("le", "less_than_or_equal_to"), ("between", "in_range"),
])
def test_check_aliases(alias, canonical):
    """Aliases construct the same check as the canonical name
    (reference api/checks.py:1004-1051)."""
    args = (1, 3) if alias == "between" else (1,)
    a = getattr(Check, alias)(*args)
    c = getattr(Check, canonical)(*args)
    assert a.name == c.name


NESTED_DTYPE_CASES = [
    ("array_ok", T.ArrayType(T.IntegerType()),
     T.ArrayType(T.IntegerType()), True),
    ("array_elem_mismatch", T.ArrayType(T.IntegerType()),
     T.ArrayType(T.LongType()), False),
    # containsNull is deliberately ignored by default (engine.py:162 —
    # the reference compares it, :494-514, but Spark's createDataFrame
    # rewrites nullability unpredictably, so strict comparison is opt-in)
    ("array_containsnull_relaxed", T.ArrayType(T.IntegerType(), True),
     T.ArrayType(T.IntegerType(), False), True),
    ("map_ok", T.MapType(T.StringType(), T.DoubleType()),
     T.MapType(T.StringType(), T.DoubleType()), True),
    ("map_value_mismatch", T.MapType(T.StringType(), T.DoubleType()),
     T.MapType(T.StringType(), T.FloatType()), False),
    ("decimal_ok", T.DecimalType(10, 2), T.DecimalType(10, 2), True),
    ("decimal_scale_mismatch", T.DecimalType(10, 2),
     T.DecimalType(10, 4), False),
    ("struct_ok",
     T.StructType([T.StructField("x", T.IntegerType())]),
     T.StructType([T.StructField("x", T.IntegerType())]), True),
    ("struct_field_mismatch",
     T.StructType([T.StructField("x", T.IntegerType())]),
     T.StructType([T.StructField("x", T.StringType())]), False),
    ("nested_array_of_map_ok",
     T.ArrayType(T.MapType(T.StringType(), T.LongType())),
     T.ArrayType(T.MapType(T.StringType(), T.LongType())), True),
]


@pytest.mark.parametrize(
    "label,declared,actual,should_pass",
    NESTED_DTYPE_CASES,
    ids=[c[0] for c in NESTED_DTYPE_CASES],
)
def test_nested_dtype_deep_equality(spark, label, declared, actual,
                                    should_pass):
    """Deep structural dtype checks for Array/Map/Decimal/Struct
    (reference engines/pyspark_engine.py:336-360,494-514,556-579; Struct
    is our extension — the reference pyspark engine omits it)."""
    schema = DataFrameSchema({"v": Column(declared)})
    df = spark.createDataFrame(
        [], T.StructType([T.StructField("v", actual, True)])
    )
    res = schema.validate_result(df)
    dtype_errs = [
        e for e in res.errors if e.reason_code.value == "wrong_dtype"
    ]
    assert bool(dtype_errs) != should_pass, (label, res.report)


def test_determined_by_unique_accepted():
    c = Check.gt(0, determined_by_unique=True)
    assert c.determined_by_unique is True
    assert Check.gt(0).determined_by_unique is False
