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


# ---------------------------------------------------------------------------
# Full product matrix: every comparison/equality/membership check × every
# dtype its gate accepts × pass/fail — generated the way the reference
# parametrizes tests/pyspark/test_pyspark_check.py (:414, :682, :1305),
# with exact single-violation report-shape assertions per case.
# ---------------------------------------------------------------------------

import decimal

Dec = decimal.Decimal
date = datetime.date

# (label, dtype, lo < mid < hi sample values)
NUM_KITS = [
    ("byte", T.ByteType(), 1, 5, 9),
    ("short", T.ShortType(), 1, 5, 9),
    ("int", T.IntegerType(), 1, 5, 9),
    ("long", T.LongType(), 1, 5, 9),
    ("float", T.FloatType(), 1.0, 5.0, 9.0),
    ("double", T.DoubleType(), 1.0, 5.0, 9.0),
    ("decimal", T.DecimalType(10, 2), Dec("1.00"), Dec("5.00"), Dec("9.00")),
]
DATE_KITS = [
    ("date", T.DateType(),
     date(2024, 1, 1), date(2024, 6, 1), date(2024, 12, 31)),
    ("ts", T.TimestampType(),
     D(2024, 1, 1), D(2024, 6, 1), D(2024, 12, 31)),
    ("ts_ntz", T.TimestampNTZType(),
     D(2024, 1, 1), D(2024, 6, 1), D(2024, 12, 31)),
]
STR_KIT = [("str", T.StringType(), "a", "m", "z")]
BIN_KIT = [("bin", T.BinaryType(), b"a", b"m", b"z")]
BOOL_KIT = [("bool", T.BooleanType(), False, True, True)]

CMP_KITS = NUM_KITS + DATE_KITS                       # gt/ge/lt/le/in_range
EQ_KITS = CMP_KITS + STR_KIT + BIN_KIT + BOOL_KIT     # eq/ne
SET_KITS = CMP_KITS + STR_KIT + BIN_KIT               # isin/notin


def _product_cases():
    cases = []
    for lbl, dt, lo, mid, hi in EQ_KITS:
        cases.append((f"eq_{lbl}", dt, lambda m=mid: Check.eq(m), mid, lo))
        cases.append((f"ne_{lbl}", dt, lambda m=mid: Check.ne(m), lo, mid))
    for lbl, dt, lo, mid, hi in CMP_KITS:
        cases.append((f"gt_{lbl}", dt, lambda v=lo: Check.gt(v), mid, lo))
        cases.append((f"ge_{lbl}", dt, lambda v=mid: Check.ge(v), mid, lo))
        cases.append((f"lt_{lbl}", dt, lambda v=hi: Check.lt(v), mid, hi))
        cases.append((f"le_{lbl}", dt, lambda v=mid: Check.le(v), mid, hi))
        cases.append((
            f"in_range_{lbl}", dt,
            lambda a=lo, b=mid: Check.in_range(a, b), mid, hi,
        ))
        cases.append((
            f"in_range_omin_{lbl}", dt,
            lambda a=lo, b=hi: Check.in_range(a, b, include_min=False),
            mid, lo,
        ))
        cases.append((
            f"in_range_omax_{lbl}", dt,
            lambda a=lo, b=hi: Check.in_range(a, b, include_max=False),
            mid, hi,
        ))
    for lbl, dt, lo, mid, hi in SET_KITS:
        cases.append((
            f"isin_{lbl}", dt, lambda a=lo, b=mid: Check.isin([a, b]),
            mid, hi,
        ))
        cases.append((
            f"notin_{lbl}", dt, lambda v=hi: Check.notin([v]), mid, hi,
        ))
    return cases


PRODUCT_CASES = _product_cases()


@pytest.mark.parametrize(
    "label,dtype,check_factory,ok,bad",
    PRODUCT_CASES,
    ids=[c[0] for c in PRODUCT_CASES],
)
def test_full_check_dtype_product(spark, label, dtype, check_factory,
                                  ok, bad):
    """Pass/fail frames per (check, dtype) with exact report shape: one
    schema_component_check error, attributed to column 'v' and the right
    check, one failure case; the clean frame validates with zero errors
    and an explicit passing outcome."""
    check = check_factory()
    schema = DataFrameSchema({"v": Column(dtype, check)}, name=label)
    st = T.StructType([T.StructField("v", dtype, True)])

    clean = spark.createDataFrame([(ok,)], st)
    res = schema.validate_result(clean)
    assert not res.errors, (label, res.report)
    ok_out = [o for o in res.outcomes if o.check == check.error]
    assert len(ok_out) == 1 and ok_out[0].passed, (label, res.report)

    dirty = spark.createDataFrame([(ok,), (bad,)], st)
    res = schema.validate_result(dirty)
    data_errs = [
        e for e in res.errors
        if e.reason_code.value == "schema_component_check"
    ]
    assert len(data_errs) == 1, (label, res.report)
    assert data_errs[0].failure_cases_count == 1, (label, res.report)
    bad_out = [o for o in res.outcomes if o.check == check.error]
    assert len(bad_out) == 1, (label, res.report)
    assert not bad_out[0].passed and bad_out[0].violations == 1
    assert bad_out[0].column == "v"


# null semantics per dtype family: default ignore_na=True counts nulls as
# passing; ignore_na=False counts them as violations (reference
# api/checks.py:80-82 + postprocess OR-null)
NULL_CASES = [
    (f"null_{lbl}", dt, (lambda v=mid: Check.eq(v)), mid)
    for lbl, dt, lo, mid, hi in EQ_KITS
]


@pytest.mark.parametrize(
    "label,dtype,check_factory,ok",
    NULL_CASES,
    ids=[c[0] for c in NULL_CASES],
)
def test_ignore_na_matrix(spark, label, dtype, check_factory, ok):
    st = T.StructType([T.StructField("v", dtype, True)])
    df = spark.createDataFrame([(ok,), (None,)], st)

    res = DataFrameSchema(
        {"v": Column(dtype, check_factory())}, name=label
    ).validate_result(df)
    assert not res.errors, (label, res.report)

    strict_check = check_factory()
    strict_check.ignore_na = False
    res = DataFrameSchema(
        {"v": Column(dtype, strict_check)}, name=label
    ).validate_result(df)
    errs = [
        e for e in res.errors
        if e.reason_code.value == "schema_component_check"
    ]
    assert len(errs) == 1 and errs[0].failure_cases_count == 1, (
        label, res.report,
    )


# ---------------------------------------------------------------------------
# array-column checks (beyond-reference: Catalyst higher-order functions)


def _arr_counts(spark, data, check, elem=T.DoubleType()):
    st = T.StructType([T.StructField("v", T.ArrayType(elem), True)])
    df = spark.createDataFrame([(x,) for x in data], st)
    res = DataFrameSchema(
        {"v": Column(checks=[check])}, name="arr"
    ).validate_result(df)
    return {o.check: int(o.violations) for o in res.outcomes}


def test_array_size_exact_and_bounds(spark):
    data = [[1.0, 2.0], [1.0], [], None]
    c = _arr_counts(spark, data, Check.array_size(2, error="sz"))
    assert c["sz"] == 2  # [1.0] and [] violate; null ignored
    c = _arr_counts(
        spark, data, Check.array_size(min_value=1, max_value=2, error="b")
    )
    assert c["b"] == 1  # only []


def test_array_no_nulls_and_forall_range(spark):
    data = [[1.0, None], [0.5, 0.6], None, [2.0]]
    c = _arr_counts(spark, data, Check.array_no_nulls(error="nn"))
    assert c["nn"] == 1
    c = _arr_counts(
        spark, data, Check.array_forall_in_range(0.0, 1.0, error="rng")
    )
    # [1.0, None] has a null elem; [2.0] out of range
    assert c["rng"] == 2


def test_array_finite(spark):
    data = [
        [1.0, 2.0], [float("nan")], [float("inf")], [-float("inf"), 0.0],
        None,
    ]
    c = _arr_counts(spark, data, Check.array_finite(error="fin"))
    assert c["fin"] == 3


def test_array_forall_custom_and_dtype_gating(spark):
    from pyspark.sql import functions as F

    data = [[2.0, 4.0], [2.0, 3.0], None]
    c = _arr_counts(
        spark, data,
        Check.array_forall(lambda x: x % 2 == 0, error="even"),
    )
    assert c["even"] == 1
    # gating: array checks reject scalar dtypes
    st = T.StructType([T.StructField("v", T.DoubleType(), True)])
    df = spark.createDataFrame([(1.0,)], st)
    res = DataFrameSchema(
        {"v": Column(checks=[Check.array_size(2, error="sz")])}, name="g"
    ).validate_result(df)
    assert any(
        o.check == "sz" and not o.passed and "does not accept" in o.message
        for o in res.outcomes
    )


def test_array_checks_via_field_kwargs(spark):
    from pandera_spark import DataFrameModel, Field

    class Vec(DataFrameModel):
        v: T.ArrayType(T.DoubleType()) = Field(array_size=2)

    st = T.StructType(
        [T.StructField("v", T.ArrayType(T.DoubleType()), True)]
    )
    df = spark.createDataFrame([([1.0, 2.0],), ([1.0],)], st)
    res = Vec.to_schema().validate_result(df)
    bad = [o for o in res.outcomes if not o.passed]
    assert len(bad) == 1 and bad[0].violations == 1


def _map_counts(spark, data, check):
    st = T.StructType(
        [T.StructField("v", T.MapType(T.StringType(), T.LongType()), True)]
    )
    df = spark.createDataFrame([(x,) for x in data], st)
    res = DataFrameSchema(
        {"v": Column(checks=[check])}, name="map"
    ).validate_result(df)
    return {o.check: int(o.violations) for o in res.outcomes}


def test_map_size_and_keys(spark):
    data = [{"a": 1, "b": 2}, {"a": 1}, {}, None]
    c = _map_counts(spark, data, Check.map_size(2, error="sz"))
    assert c["sz"] == 2  # one-entry and empty maps
    c = _map_counts(
        spark, data, Check.map_size(min_value=1, max_value=2, error="b")
    )
    assert c["b"] == 1  # only the empty map
    c = _map_counts(
        spark, data, Check.map_keys_isin(["a", "b"], error="keys")
    )
    assert c["keys"] == 0
    c = _map_counts(spark, data, Check.map_keys_isin(["a"], error="k2"))
    assert c["k2"] == 1  # {"a","b"} has a disallowed key


def test_map_values_forall_and_dtype_gating(spark):
    data = [{"a": 2, "b": 4}, {"a": 3}]
    c = _map_counts(
        spark, data, Check.map_values_forall(lambda v: v % 2 == 0, error="ev")
    )
    assert c["ev"] == 1
    # gating: map checks reject non-map dtypes
    df = spark.createDataFrame([(1.0,)], "v double")
    res = DataFrameSchema(
        {"v": Column(checks=[Check.map_size(2, error="sz")])}, name="g"
    ).validate_result(df)
    assert any(
        o.check == "sz" and not o.passed and "does not accept" in o.message
        for o in res.outcomes
    )


def test_struct_field_checks_via_dotted_path(spark):
    """Value checks on nested struct fields via dotted column names —
    F.col('s.x') resolves naturally, so the single-pass agg covers
    nested projections too."""
    st = T.StructType(
        [
            T.StructField(
                "s",
                T.StructType(
                    [
                        T.StructField("x", T.LongType(), True),
                        T.StructField("y", T.StringType(), True),
                    ]
                ),
                True,
            )
        ]
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([((5, "ok"),), ((-1, "bad"),)], st)
    inner = df.select(
        F.col("s.x").alias("sx"), F.col("s.y").alias("sy")
    )
    schema = DataFrameSchema(
        {
            "sx": Column(checks=[Check.ge(0, error="x_ge_0")]),
            "sy": Column(checks=[Check.str_length(1, 3, error="y_len")]),
        },
        name="nested",
    )
    res = schema.validate_result(inner)
    counts = {o.check: int(o.violations) for o in res.outcomes}
    assert counts["x_ge_0"] == 1
    assert counts["y_len"] == 0


# unique_values_eq across its gated dtypes (aggregate-shaped: the value
# SET must equal the expectation; reference api/checks.py:731 gates to
# numeric+date+str+binary)
UVE_KITS = [
    ("int", T.IntegerType(), [1, 2], 3),
    ("long", T.LongType(), [1, 2], 3),
    ("str", T.StringType(), ["a", "b"], "c"),
    ("bin", T.BinaryType(), [b"a", b"b"], b"c"),
    ("date", T.DateType(),
     [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)],
     datetime.date(2024, 1, 3)),
    ("ts", T.TimestampType(), [D(2024, 1, 1), D(2024, 1, 2)],
     D(2024, 1, 3)),
]


@pytest.mark.parametrize(
    "label,dtype,values,extra", UVE_KITS, ids=[k[0] for k in UVE_KITS]
)
def test_unique_values_eq_dtype_matrix(spark, label, dtype, values, extra):
    st = T.StructType([T.StructField("v", dtype, True)])
    check = Check.unique_values_eq(values)
    schema = DataFrameSchema({"v": Column(dtype, check)}, name=label)
    # exact set (with repeats) passes
    clean = spark.createDataFrame([(v,) for v in values + [values[0]]], st)
    res = schema.validate_result(clean)
    assert not res.errors, res.report
    # an extra value fails; a missing value also fails
    for bad_data in ([*values, extra], values[:1]):
        dirty = spark.createDataFrame([(v,) for v in bad_data], st)
        res = schema.validate_result(dirty)
        bad = [o for o in res.outcomes if not o.passed]
        assert len(bad) == 1 and bad[0].check == check.error, (label, res.report)
    # unsupported dtype is rejected at compile time
    from pandera_spark.errors import SchemaError, SchemaInitError

    arr_schema = DataFrameSchema(
        {"v": Column(T.ArrayType(T.IntegerType()),
                     Check.unique_values_eq([1]))},
        name="gate",
    )
    adf = spark.createDataFrame(
        [([1],)],
        T.StructType([T.StructField("v", T.ArrayType(T.IntegerType()), True)]),
    )
    r = arr_schema.validate_result(adf)
    assert any(not o.passed for o in r.outcomes)  # dtype-gate failure


def test_json_matches_schema_check(spark):
    """Malformed or schema-violating JSON strings count as violations;
    valid documents and nulls pass (ignore_na)."""
    check = Check.json_matches_schema("map<string,bigint>")
    schema = DataFrameSchema(
        {"props": Column(T.StringType(), check)}, name="json"
    )
    df = spark.createDataFrame(
        [('{"k": 1}',), ("not json",), ('[1,2]',), (None,)],
        T.StructType([T.StructField("props", T.StringType(), True)]),
    )
    res = schema.validate_result(df)
    bad = [o for o in res.outcomes if not o.passed]
    assert len(bad) == 1 and bad[0].violations == 2, res.report
    # struct DDL variant
    s2 = DataFrameSchema(
        {"props": Column(
            T.StringType(), Check.json_matches_schema("a INT, b STRING"))},
        name="json2",
    )
    df2 = spark.createDataFrame(
        [('{"a": 1, "b": "x"}',), ("{",)],
        T.StructType([T.StructField("props", T.StringType(), True)]),
    )
    r2 = s2.validate_result(df2)
    assert [o.violations for o in r2.outcomes if not o.passed] == [1]
    # dtype gate: rejected on non-string columns
    s3 = DataFrameSchema(
        {"v": Column(T.LongType(), Check.json_matches_schema("map<string,bigint>"))},
        name="gate",
    )
    r3 = s3.validate_result(spark.createDataFrame([(1,)], "v long"))
    assert any(not o.passed for o in r3.outcomes)
    # yaml round-trip keeps the statistic
    from pandera_spark.io import schema_from_yaml, schema_to_yaml

    rt = schema_from_yaml(schema_to_yaml(schema))
    assert rt.columns["props"].checks[0].error == check.error


def test_str_parses_timestamp_check(spark):
    check = Check.str_parses_timestamp("yyyy-MM-dd")
    schema = DataFrameSchema(
        {"d": Column(T.StringType(), check)}, name="fmt"
    )
    df = spark.createDataFrame(
        [("2024-01-31",), ("31/01/2024",), ("not a date",), (None,)],
        T.StructType([T.StructField("d", T.StringType(), True)]),
    )
    res = schema.validate_result(df)
    bad = [o for o in res.outcomes if not o.passed]
    assert len(bad) == 1 and bad[0].violations == 2, res.report
    # round-trips through yaml
    from pandera_spark.io import schema_from_yaml, schema_to_yaml

    rt = schema_from_yaml(schema_to_yaml(schema))
    assert rt.columns["d"].checks[0].error == check.error
    # gated to strings
    g = DataFrameSchema(
        {"v": Column(T.LongType(), Check.str_parses_timestamp("yyyy"))},
        name="g",
    )
    r = g.validate_result(spark.createDataFrame([(1,)], "v long"))
    assert any(not o.passed for o in r.outcomes)


# ---------------------------------------------------------------------------
# Gating product: every check family × every dtype its gate REJECTS ->
# compile-time check_error (no Spark job over the data), mirroring the
# reference's unsupported-datatype parametrization
# (/root/reference/tests/pyspark/test_pyspark_check.py — each check class
# carries pass/fail cases per accepted dtype AND rejection behavior
# outside it via backends/pyspark/decorators.py:42-104).
# ---------------------------------------------------------------------------

_ARR = T.ArrayType(T.LongType())
_MAP = T.MapType(T.StringType(), T.LongType())
_STRUCT = T.StructType([T.StructField("x", T.LongType(), True)])

# one representative value per dtype for the single-row probe frame
_SAMPLES = {
    "int": (T.IntegerType(), 1),
    "long": (T.LongType(), 1),
    "double": (T.DoubleType(), 1.0),
    "decimal": (T.DecimalType(10, 2), Dec("1.00")),
    "str": (T.StringType(), "a"),
    "bin": (T.BinaryType(), b"a"),
    "bool": (T.BooleanType(), True),
    "date": (T.DateType(), date(2024, 1, 1)),
    "ts": (T.TimestampType(), D(2024, 1, 1)),
    "ts_ntz": (T.TimestampNTZType(), D(2024, 1, 1)),
    "array": (_ARR, [1]),
    "map": (_MAP, {"a": 1}),
    "struct": (_STRUCT, (1,)),
}

_CHECK_FAMILIES = {
    # family -> (factory, dtype labels the gate must REJECT)
    "gt": (lambda: Check.gt(0),
           ["str", "bin", "bool", "array", "map", "struct"]),
    "ge": (lambda: Check.ge(0),
           ["str", "bin", "bool", "array", "map", "struct"]),
    "lt": (lambda: Check.lt(9),
           ["str", "bin", "bool", "array", "map", "struct"]),
    "le": (lambda: Check.le(9),
           ["str", "bin", "bool", "array", "map", "struct"]),
    "in_range": (lambda: Check.in_range(0, 9),
                 ["str", "bin", "bool", "array", "map", "struct"]),
    "eq": (lambda: Check.eq(1), ["array", "map", "struct"]),
    "ne": (lambda: Check.ne(1), ["array", "map", "struct"]),
    "isin": (lambda: Check.isin([1]), ["bool", "array", "map", "struct"]),
    "notin": (lambda: Check.notin([1]), ["bool", "array", "map", "struct"]),
    "str_matches": (lambda: Check.str_matches("a"),
                    ["int", "double", "decimal", "date", "ts", "ts_ntz",
                     "bin", "bool", "array", "map"]),
    "str_contains": (lambda: Check.str_contains("a"),
                     ["int", "double", "date", "ts", "bin", "bool",
                      "array", "map"]),
    "str_startswith": (lambda: Check.str_startswith("a"),
                       ["int", "double", "date", "ts", "bin", "bool",
                        "array", "map"]),
    "str_endswith": (lambda: Check.str_endswith("a"),
                     ["int", "double", "date", "ts", "bin", "bool",
                      "array", "map"]),
    "str_length": (lambda: Check.str_length(1),
                   ["int", "double", "decimal", "date", "ts", "ts_ntz",
                    "bin", "bool", "array", "map"]),
    "unique_values_eq": (lambda: Check.unique_values_eq([1]),
                         ["bool", "array", "map", "struct"]),
}

GATE_PRODUCT = [
    (f"{fam}_rejects_{lbl}", factory, lbl)
    for fam, (factory, rejected) in _CHECK_FAMILIES.items()
    for lbl in rejected
]


@pytest.mark.parametrize(
    "label,check_factory,dtype_label",
    GATE_PRODUCT,
    ids=[c[0] for c in GATE_PRODUCT],
)
def test_gating_product(spark, label, check_factory, dtype_label):
    dtype, value = _SAMPLES[dtype_label]
    schema = DataFrameSchema({"v": Column(dtype, check_factory())},
                             name=label)
    st = T.StructType([T.StructField("v", dtype, True)])
    df = spark.createDataFrame([(value,)], st)
    res = schema.validate_result(df)
    assert any(
        e.reason_code.value == "check_error" for e in res.errors
    ), (label, res.report)
    # the rejection is a compile/gate failure, never a data violation
    assert not any(
        e.reason_code.value == "schema_component_check" for e in res.errors
    ), (label, res.report)


# ---------------------------------------------------------------------------
# String-family breadth: each string check × anchoring/unicode/empty/
# multi-row cases with exact violation counts (reference
# test_pyspark_check.py:1305+ parametrizes each str check over data
# variations; semantics here: str_matches anchors at the START of the
# value — reference api/checks.py:594 'the beginning of the string' —
# str_contains matches anywhere, startswith/endswith are literal).
# ---------------------------------------------------------------------------

STR_BREADTH = [
    # (label, check, rows, expected violation count)
    ("matches_anchored_start", Check.str_matches(r"[A-Z]\d"),
     ["A1", "xA1", "A1x", "a1"], 2),       # mid-string match ≠ match
    ("matches_explicit_caret", Check.str_matches(r"^ab"),
     ["abc", "zab"], 1),
    ("matches_dollar_end", Check.str_matches(r"ab$"),
     ["ab", "abx"], 1),
    ("matches_unicode", Check.str_matches(r"héllo"),
     ["héllo world", "hello"], 1),
    ("matches_empty_pattern_all_pass", Check.str_matches(r""),
     ["", "x"], 0),
    ("matches_quantifier", Check.str_matches(r"a{2,}b?"),
     ["aa", "aab", "ab"], 1),
    ("contains_anywhere", Check.str_contains(r"\d"),
     ["a1b", "1ab", "ab1", "abc"], 1),
    ("contains_class", Check.str_contains(r"[xyz]{2}"),
     ["axyb", "axb", "xy"], 1),
    ("contains_literal_dot_needs_escape", Check.str_contains(r"a\.b"),
     ["a.b", "axb"], 1),
    ("contains_empty_string_row", Check.str_contains(r"a"),
     ["", "a"], 1),                         # empty string genuinely fails
    ("startswith_literal_not_regex", Check.str_startswith("a.b"),
     ["a.bc", "axbc"], 1),                  # '.' is literal here
    ("startswith_empty_prefix", Check.str_startswith(""),
     ["", "x"], 0),
    ("startswith_unicode", Check.str_startswith("héllo"),
     ["héllo!", "hello!"], 1),
    ("endswith_literal", Check.str_endswith("y.z"),
     ["xy.z", "xyz"], 1),
    ("endswith_unicode", Check.str_endswith("ño"),
     ["año", "ano"], 1),
    ("length_exact_counts_chars_not_bytes", Check.str_length(5),
     ["héllo", "hello", "hell"], 1),        # é is ONE char
    ("length_min_only", Check.str_length(min_value=2),
     ["ab", "a", ""], 2),
    ("length_max_only", Check.str_length(max_value=2),
     ["ab", "abc", ""], 1),
    ("length_range_boundaries_inclusive", Check.str_length(2, 4),
     ["ab", "abcd", "a", "abcde"], 2),
    ("length_zero_exact", Check.str_length(0),
     ["", "a"], 1),
]


@pytest.mark.parametrize(
    "label,check,rows,expected",
    STR_BREADTH,
    ids=[c[0] for c in STR_BREADTH],
)
def test_string_family_breadth(spark, label, check, rows, expected):
    st = T.StructType([T.StructField("v", T.StringType(), True)])
    df = spark.createDataFrame([(r,) for r in rows], st)
    res = DataFrameSchema({"v": Column(T.StringType(), check)},
                          name=label).validate_result(df)
    out = [o for o in res.outcomes if o.check == check.error]
    assert len(out) == 1, (label, res.report)
    assert int(out[0].violations) == expected, (label, res.report)


# ---------------------------------------------------------------------------
# Timestamp resolution + boundary-inclusion corners
# ---------------------------------------------------------------------------

TS_MICRO = [
    ("ts_gt_microsecond", T.TimestampType(), Check.gt(D(2024, 1, 1, 0, 0, 0, 500000)),
     D(2024, 1, 1, 0, 0, 0, 500001), D(2024, 1, 1, 0, 0, 0, 500000)),
    ("ts_ntz_lt_microsecond", T.TimestampNTZType(),
     Check.lt(D(2024, 1, 1, 0, 0, 0, 2)),
     D(2024, 1, 1, 0, 0, 0, 1), D(2024, 1, 1, 0, 0, 0, 2)),
    ("ts_eq_microsecond", T.TimestampType(),
     Check.eq(D(2024, 1, 1, 12, 30, 15, 123456)),
     D(2024, 1, 1, 12, 30, 15, 123456), D(2024, 1, 1, 12, 30, 15, 123457)),
    ("ts_ntz_isin", T.TimestampNTZType(),
     Check.isin([D(2024, 1, 1), D(2024, 1, 2)]),
     D(2024, 1, 1), D(2024, 1, 3)),
    ("date_notin", T.DateType(), Check.notin([date(2024, 1, 1)]),
     date(2024, 1, 2), date(2024, 1, 1)),
]


@pytest.mark.parametrize(
    "label,dtype,check,ok,bad", TS_MICRO, ids=[c[0] for c in TS_MICRO]
)
def test_timestamp_resolution_corners(spark, label, dtype, check, ok, bad):
    st = T.StructType([T.StructField("v", dtype, True)])
    schema = DataFrameSchema({"v": Column(dtype, check)}, name=label)
    assert not schema.validate_result(
        spark.createDataFrame([(ok,)], st)
    ).errors, label
    res = schema.validate_result(spark.createDataFrame([(ok,), (bad,)], st))
    errs = [e for e in res.errors
            if e.reason_code.value == "schema_component_check"]
    assert len(errs) == 1 and errs[0].failure_cases_count == 1, (
        label, res.report,
    )


# in_range endpoint inclusion per dtype family: both endpoints PASS when
# include_min/include_max default to True (reference api/checks.py:430)
ENDPOINT_KITS = NUM_KITS + DATE_KITS


@pytest.mark.parametrize(
    "label,dtype,lo,mid,hi",
    ENDPOINT_KITS,
    ids=[f"in_range_endpoints_{k[0]}" for k in ENDPOINT_KITS],
)
def test_in_range_endpoints_inclusive(spark, label, dtype, lo, mid, hi):
    st = T.StructType([T.StructField("v", dtype, True)])
    df = spark.createDataFrame([(lo,), (mid,), (hi,)], st)
    res = DataFrameSchema(
        {"v": Column(dtype, Check.in_range(lo, hi))}, name=label
    ).validate_result(df)
    assert not res.errors, (label, res.report)
    # and both-open drops exactly the two endpoints
    res = DataFrameSchema(
        {"v": Column(dtype, Check.in_range(
            lo, hi, include_min=False, include_max=False))},
        name=label,
    ).validate_result(df)
    errs = [e for e in res.errors
            if e.reason_code.value == "schema_component_check"]
    assert len(errs) == 1 and errs[0].failure_cases_count == 2, (
        label, res.report,
    )


# ---------------------------------------------------------------------------
# Map-dtype corners: non-string key types, value-type matrices, and the
# empty-map vs null-map distinction
# ---------------------------------------------------------------------------


def test_map_long_keys_isin_and_size(spark):
    mt = T.MapType(T.LongType(), T.StringType())
    st = T.StructType([T.StructField("v", mt, True)])
    df = spark.createDataFrame(
        [({1: "a", 2: "b"},), ({3: "c"},), ({},), (None,)], st
    )
    res = DataFrameSchema(
        {"v": Column(mt, [Check.map_keys_isin([1, 2], error="keys"),
                          Check.map_size(min_value=1, error="nonempty")])},
        name="map_long",
    ).validate_result(df)
    counts = {o.check: int(o.violations) for o in res.outcomes}
    assert counts["keys"] == 1        # {3: 'c'} has a disallowed key
    assert counts["nonempty"] == 1    # {} fails; null row ignored


def test_map_double_values_forall(spark):
    mt = T.MapType(T.StringType(), T.DoubleType())
    st = T.StructType([T.StructField("v", mt, True)])
    df = spark.createDataFrame(
        [({"a": 0.5},), ({"a": 1.5},), ({"a": 0.1, "b": 2.0},), (None,)], st
    )
    res = DataFrameSchema(
        {"v": Column(mt, [Check.map_values_forall(
            lambda v: (v >= 0.0) & (v <= 1.0), error="unit")])},
        name="map_double",
    ).validate_result(df)
    counts = {o.check: int(o.violations) for o in res.outcomes}
    assert counts["unit"] == 2        # 1.5 and the 2.0 entry


def test_map_key_dtype_deep_equality(spark):
    declared = T.MapType(T.LongType(), T.StringType())
    actual = T.MapType(T.IntegerType(), T.StringType())
    schema = DataFrameSchema({"v": Column(declared)})
    df = spark.createDataFrame(
        [], T.StructType([T.StructField("v", actual, True)])
    )
    res = schema.validate_result(df)
    assert any(e.reason_code.value == "wrong_dtype" for e in res.errors)


def test_nested_array_of_array_deep_equality(spark):
    declared = T.ArrayType(T.ArrayType(T.LongType()))
    ok = T.ArrayType(T.ArrayType(T.LongType()))
    bad = T.ArrayType(T.ArrayType(T.IntegerType()))
    for actual, should_pass in [(ok, True), (bad, False)]:
        res = DataFrameSchema({"v": Column(declared)}).validate_result(
            spark.createDataFrame(
                [], T.StructType([T.StructField("v", actual, True)])
            )
        )
        dtype_errs = [e for e in res.errors
                      if e.reason_code.value == "wrong_dtype"]
        assert bool(dtype_errs) != should_pass


# isin/notin null-in-list semantics: a null element in the allowed list
# never makes null values pass/fail differently — null handling is owned
# by ignore_na, not by SQL IN's three-valued logic
def test_isin_null_semantics(spark):
    st = T.StructType([T.StructField("v", T.IntegerType(), True)])
    df = spark.createDataFrame([(1,), (2,), (None,)], st)
    res = DataFrameSchema(
        {"v": Column(T.IntegerType(), Check.isin([1]))}, name="isin_null"
    ).validate_result(df)
    errs = [e for e in res.errors
            if e.reason_code.value == "schema_component_check"]
    assert len(errs) == 1 and errs[0].failure_cases_count == 1  # only 2
    # notin: null rows pass by default (ignore_na), never violate
    res = DataFrameSchema(
        {"v": Column(T.IntegerType(), Check.notin([2]))}, name="notin_null"
    ).validate_result(df)
    errs = [e for e in res.errors
            if e.reason_code.value == "schema_component_check"]
    assert len(errs) == 1 and errs[0].failure_cases_count == 1  # only 2
