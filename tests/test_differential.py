"""Differential fuzz: engine violation counts vs a pure-Python replay.

Hypothesis generates column data (with nulls) and check parameters; the
engine's single-pass counts must equal an independent per-row Python
evaluation of the same semantics (reference null handling: with
ignore_na=True a null element passes; a check never counts nulls —
reference pandera/api/checks.py:80-82).

This is the oracle the reference's own suite lacks (SURVEY §5.6): the
hand-written matrix pins known cases; this pins the *counting path* on
inputs nobody thought of.
"""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from pandera_spark import Check, Column, DataFrameSchema

SET = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _counts(spark, data, dtype, check, *, nullable=True):
    df = spark.createDataFrame(
        [(v,) for v in data],
        T.StructType([T.StructField("c", dtype, True)]),
    )
    schema = DataFrameSchema(
        {"c": Column(checks=[check], nullable=nullable)}, name="fuzz"
    )
    res = schema.validate_result(df)
    out = {}
    for o in res.outcomes:
        out[(o.column, o.check)] = int(o.violations)
    return out


ints = st.lists(st.none() | st.integers(-1000, 1000), max_size=60)


@SET
@given(data=ints, lo=st.integers(-500, 500), span=st.integers(0, 400))
def test_in_range_counts(spark, data, lo, span):
    hi = lo + span
    got = _counts(
        spark, data, T.IntegerType(),
        Check.in_range(lo, hi, error="r"),
    )[("c", "r")]
    want = sum(1 for v in data if v is not None and not (lo <= v <= hi))
    assert got == want


@SET
@given(data=ints, bound=st.integers(-500, 500))
def test_ge_ignore_na_false(spark, data, bound):
    # ignore_na=False: nulls COUNT as violations (reference ignore_na flag)
    got = _counts(
        spark, data, T.IntegerType(),
        Check.ge(bound, error="g", ignore_na=False),
    )[("c", "g")]
    want = sum(1 for v in data if v is None or v < bound)
    assert got == want


@SET
@given(
    data=ints,
    allowed=st.lists(st.integers(-1000, 1000), min_size=1, max_size=8),
)
def test_isin_counts(spark, data, allowed):
    got = _counts(
        spark, data, T.IntegerType(), Check.isin(allowed, error="i")
    )[("c", "i")]
    want = sum(1 for v in data if v is not None and v not in allowed)
    assert got == want


texts = st.lists(
    st.none() | st.text(alphabet="abcXYZ09 _%", max_size=12), max_size=40
)


@SET
@given(data=texts, pat=st.sampled_from(["a", "ab", "X.Z", "a+b", "[0-9]+"]))
def test_str_contains_counts(spark, data, pat):
    got = _counts(
        spark, data, T.StringType(), Check.str_contains(pat, error="s")
    )[("c", "s")]
    rx = re.compile(pat)
    want = sum(1 for v in data if v is not None and not rx.search(v))
    assert got == want


@SET
@given(data=texts, lo=st.integers(0, 6), span=st.integers(0, 8))
def test_str_length_counts(spark, data, lo, span):
    hi = lo + span
    got = _counts(
        spark, data, T.StringType(),
        Check.str_length(lo, hi, error="L"),
    )[("c", "L")]
    want = sum(
        1 for v in data if v is not None and not (lo <= len(v) <= hi)
    )
    assert got == want


@SET
@given(data=ints)
def test_nullable_counts(spark, data):
    got = _counts(
        spark, data, T.IntegerType(), Check.ge(-10_000, error="g"),
        nullable=False,
    )
    want_nulls = sum(1 for v in data if v is None)
    assert got[("c", "not_nullable")] == want_nulls


@SET
@given(data=st.lists(st.none() | st.integers(0, 5), max_size=60))
def test_unique_counts(spark, data):
    from collections import Counter

    df = spark.createDataFrame(
        [(v,) for v in data],
        T.StructType([T.StructField("c", T.IntegerType(), True)]),
    )
    schema = DataFrameSchema(
        {"c": Column(nullable=True)}, unique=["c"], name="u",
        report_duplicates="exclude_first",
    )
    res = schema.validate_result(df)
    got = {int(o.violations) for o in res.outcomes if "unique" in o.check}
    # exclude_first: every duplicate row beyond the first per value;
    # engine counts rows - distinct (nulls group like values in groupBy)
    cnt = Counter(data)
    want = sum(c - 1 for c in cnt.values() if c > 1)
    assert got == {want}


@SET
@given(
    data=st.lists(
        st.none() | st.floats(-1e6, 1e6, allow_nan=False, width=64),
        max_size=50,
    ),
    bound=st.floats(-1e5, 1e5, allow_nan=False),
)
def test_float_le_counts(spark, data, bound):
    got = _counts(
        spark, data, T.DoubleType(), Check.le(bound, error="le")
    )[("c", "le")]
    want = sum(1 for v in data if v is not None and not (v <= bound))
    assert got == want


def test_nan_semantics_documented(spark):
    """Pin Spark SQL NaN ordering (NaN > any value, NaN == NaN): a NaN is
    NOT null, so ignore_na does not exempt it; under `le` it violates,
    under `ge` it passes.  Divergence from pandas (where NaN is missing)
    is deliberate and documented (SURVEY §7 hard part 1 family)."""
    data = [1.0, float("nan"), None]
    got_le = _counts(
        spark, data, T.DoubleType(), Check.le(100.0, error="le")
    )[("c", "le")]
    got_ge = _counts(
        spark, data, T.DoubleType(), Check.ge(0.0, error="ge")
    )[("c", "ge")]
    assert got_le == 1  # NaN > 100 -> violates; null ignored
    assert got_ge == 0  # NaN >= 0 -> passes


@SET
@given(
    data=ints, lo=st.integers(-500, 500), span=st.integers(1, 400),
    inc_min=st.booleans(), inc_max=st.booleans(),
)
def test_in_range_open_intervals(spark, data, lo, span, inc_min, inc_max):
    hi = lo + span
    got = _counts(
        spark, data, T.IntegerType(),
        Check.in_range(lo, hi, include_min=inc_min, include_max=inc_max,
                       error="r"),
    )[("c", "r")]

    def ok(v):
        lo_ok = v >= lo if inc_min else v > lo
        hi_ok = v <= hi if inc_max else v < hi
        return lo_ok and hi_ok

    want = sum(1 for v in data if v is not None and not ok(v))
    assert got == want


@SET
@given(data=texts, pat=st.sampled_from(["a", "ab+", "X.Z", "[0-9]+", "a c"]))
def test_str_matches_is_anchored(spark, data, pat):
    # reference semantics: str_matches anchors at the START (pandas
    # str.match; pyspark impl prepends '^' — reference
    # backends/pyspark/builtin_checks.py:280)
    got = _counts(
        spark, data, T.StringType(), Check.str_matches(pat, error="m")
    )[("c", "m")]
    rx = re.compile(pat)
    want = sum(1 for v in data if v is not None and not rx.match(v))
    assert got == want


_INTISH = st.one_of(
    st.none(),
    st.integers(-10**9, 10**9).map(str),
    st.sampled_from(["", " ", "abc", "1.5", "2e3", "0x1f", " 7", "9 ", "+3"]),
)


@SET
@given(data=st.lists(_INTISH, max_size=40))
def test_coerce_error_counts(spark, data):
    """Cast-error capture == rows where the value is non-null but Spark's
    int cast nulls it.  The Python replay mirrors Spark ANSI-off cast
    rules (trimmed integral string, optional sign; no floats/hex)."""
    df = spark.createDataFrame(
        [(v,) for v in data],
        T.StructType([T.StructField("c", T.StringType(), True)]),
    )
    schema = DataFrameSchema(
        {"c": Column(T.IntegerType(), coerce=True, nullable=True)},
        name="co",
    )
    res = schema.validate_result(df)
    got = sum(
        int(o.violations)
        for o in res.outcomes
        if o.reason_code.value == "dtype_coercion_error"
    )

    def casts(v):
        s = v.strip()
        if not s:
            return False
        try:
            return -(2**31) <= int(s, 10) <= 2**31 - 1
        except ValueError:
            return False

    want = sum(1 for v in data if v is not None and not casts(v))
    assert got == want


@SET
@given(data=ints, bound=st.integers(-500, 500))
def test_drop_invalid_rows_parity(spark, data, bound):
    df = spark.createDataFrame(
        [(v,) for v in data],
        T.StructType([T.StructField("c", T.IntegerType(), True)]),
    )
    schema = DataFrameSchema(
        {"c": Column(checks=[Check.ge(bound)], nullable=True)},
        drop_invalid_rows=True, name="d",
    )
    out = schema.validate_result(df).df
    got = sorted((r.c is None, r.c if r.c is not None else 0)
                 for r in out.collect())
    want = sorted(
        (v is None, v if v is not None else 0)
        for v in data if v is None or v >= bound  # null passes (ignore_na)
    )
    assert got == want


# ---------------------------------------------------------------------------
# interaction properties: combined features on multi-column frames


@SET
@given(
    rows=st.lists(
        st.tuples(
            st.none() | st.integers(0, 30),            # key (dup-prone)
            st.none() | st.sampled_from(
                ["1", "7", "x", "", "12", "999", "-4"]
            ),                                          # coercible string
            st.none() | st.integers(-50, 50),           # checked value
        ),
        max_size=40,
    ),
    bound=st.integers(-20, 20),
)
def test_combined_coerce_check_unique(spark, rows, bound):
    """coerce + value check + uniqueness in ONE schema: each count must
    match an independent replay, proving the single-pass compiler keeps
    features independent."""
    df = spark.createDataFrame(
        rows or [(None, None, None)],
        T.StructType([
            T.StructField("k", T.IntegerType(), True),
            T.StructField("s", T.StringType(), True),
            T.StructField("v", T.IntegerType(), True),
        ]),
    )
    data = rows or [(None, None, None)]
    schema = DataFrameSchema(
        {
            "k": Column(nullable=True),
            "s": Column(T.IntegerType(), coerce=True, nullable=True),
            "v": Column(checks=[Check.ge(bound, error="g")], nullable=True),
        },
        unique=["k"], report_duplicates="exclude_first", name="mix",
    )
    res = schema.validate_result(df)
    got = {}
    for o in res.outcomes:
        got[(o.column, o.check, o.reason_code.value)] = int(o.violations)

    def casts(x):
        t = x.strip()
        try:
            int(t, 10)
            return True
        except ValueError:
            return False

    want_cast = sum(1 for k, s, v in data if s is not None and not casts(s))
    want_check = sum(1 for k, s, v in data if v is not None and v < bound)
    from collections import Counter

    cnt = Counter(k for k, s, v in data)
    want_dup = sum(c - 1 for c in cnt.values() if c > 1)

    cast_got = sum(v for (c, ch, rc), v in got.items()
                   if rc == "dtype_coercion_error")
    check_got = sum(v for (c, ch, rc), v in got.items() if ch == "g")
    dup_got = sum(v for (c, ch, rc), v in got.items() if "uniq" in ch.lower())
    assert (cast_got, check_got, dup_got) == (want_cast, want_check, want_dup)


@SET
@given(
    rows=st.lists(
        st.tuples(st.none() | st.integers(-100, 100),
                  st.none() | st.integers(-100, 100)),
        max_size=40,
    ),
)
def test_infer_then_validate_roundtrip(spark, rows):
    """infer_schema(df).validate(df) must be clean: inferred bounds and
    nullability always admit their own source frame (reference
    schema_inference/pyspark.py contract)."""
    df = spark.createDataFrame(
        rows or [(1, 2)],
        T.StructType([
            T.StructField("a", T.IntegerType(), True),
            T.StructField("b", T.IntegerType(), True),
        ]),
    )
    from pandera_spark import infer_schema

    schema = infer_schema(df)
    res = schema.validate_result(df)
    assert not res.errors, [str(e) for e in res.errors]


@SET
@given(
    lo=st.integers(-100, 0), hi=st.integers(1, 100),
    allowed=st.lists(st.sampled_from(["A", "B", "C"]), min_size=1,
                     max_size=3, unique=True),
    nullable=st.booleans(), coerce=st.booleans(),
)
def test_yaml_roundtrip_preserves_outcomes(spark, lo, hi, allowed, nullable,
                                           coerce):
    """schema -> yaml -> schema reproduces identical validation outcomes
    on the same frame (serialization loses nothing the engine uses)."""
    from pandera_spark import schema_from_yaml, schema_to_yaml

    schema = DataFrameSchema(
        {
            "x": Column(
                T.IntegerType(), coerce=coerce, nullable=nullable,
                checks=[Check.in_range(lo, hi, error="r")],
            ),
            "f": Column(T.StringType(),
                        checks=[Check.isin(allowed, error="i")]),
        },
        name="rt",
    )
    back = schema_from_yaml(schema_to_yaml(schema))
    df = spark.createDataFrame(
        [(0, "A"), (200, "Z"), (None, None)],
        T.StructType([
            T.StructField("x", T.IntegerType(), True),
            T.StructField("f", T.StringType(), True),
        ]),
    )
    a = {(o.column, o.check): int(o.violations)
         for o in schema.validate_result(df).outcomes}
    b = {(o.column, o.check): int(o.violations)
         for o in back.validate_result(df).outcomes}
    assert a == b


@SET
@given(data=ints, lo=st.integers(-200, 0), span=st.integers(0, 250))
def test_failure_cases_count_matches_violations(spark, data, lo, span):
    """failure_cases() (the extraction path) and outcome.violations (the
    agg path) are two different plans over the same predicate — their
    counts must agree exactly."""
    hi = lo + span
    df = spark.createDataFrame(
        [(v,) for v in data],
        T.StructType([T.StructField("c", T.IntegerType(), True)]),
    )
    schema = DataFrameSchema(
        {"c": Column(checks=[Check.in_range(lo, hi, error="r")],
                     nullable=True)},
        name="fc",
    )
    res = schema.validate_result(df)
    want = sum(int(o.violations) for o in res.outcomes if o.check == "r")
    got = res.failure_cases(n=10_000_000).filter("check = 'r'").count()
    assert got == want


@SET
@given(data=ints, bound=st.integers(-300, 300))
def test_drop_invalid_closure(spark, data, bound):
    """validate(drop_invalid_rows=True) output must re-validate clean
    under the same schema (idempotence / closure)."""
    df = spark.createDataFrame(
        [(v,) for v in data],
        T.StructType([T.StructField("c", T.IntegerType(), True)]),
    )
    schema = DataFrameSchema(
        {"c": Column(checks=[Check.ge(bound)], nullable=True)},
        drop_invalid_rows=True, name="cl",
    )
    cleaned = schema.validate_result(df).df
    strict = DataFrameSchema(
        {"c": Column(checks=[Check.ge(bound)], nullable=True)}, name="cl2"
    )
    res2 = strict.validate_result(cleaned)
    assert not res2.errors


def test_to_script_roundtrip_outcomes(spark):
    """schema -> python source -> exec -> schema validates identically."""
    from pandera_spark import schema_to_script

    schema = DataFrameSchema(
        {
            "x": Column(T.IntegerType(), nullable=False,
                        checks=[Check.in_range(0, 10, error="r")]),
            "y": Column(T.StringType(),
                        checks=[Check.isin(["a", "b"], error="i")]),
        },
        unique=["x"], report_duplicates="exclude_first", name="script_rt",
    )
    src = schema_to_script(schema)
    ns: dict = {}
    exec(src, ns)
    back = next(v for v in ns.values() if isinstance(v, DataFrameSchema))
    df = spark.createDataFrame(
        [(1, "a"), (1, "z"), (None, "b"), (50, None)],
        T.StructType([
            T.StructField("x", T.IntegerType(), True),
            T.StructField("y", T.StringType(), True),
        ]),
    )
    a = {(o.column, o.check): (int(o.violations), o.passed)
         for o in schema.validate_result(df).outcomes}
    b = {(o.column, o.check): (int(o.violations), o.passed)
         for o in back.validate_result(df).outcomes}
    assert a == b


@SET
@given(
    days=st.lists(st.none() | st.integers(0, 3000), max_size=40),
    lo_d=st.integers(0, 1500), span_d=st.integers(0, 1500),
)
def test_date_in_range_counts(spark, days, lo_d, span_d):
    import datetime as dt

    base = dt.date(2017, 1, 1)
    data = [None if d is None else base + dt.timedelta(days=d) for d in days]
    lo = base + dt.timedelta(days=lo_d)
    hi = base + dt.timedelta(days=lo_d + span_d)
    got = _counts(
        spark, data, T.DateType(), Check.in_range(lo, hi, error="d")
    )[("c", "d")]
    want = sum(1 for v in data if v is not None and not (lo <= v <= hi))
    assert got == want


@SET
@given(
    cents=st.lists(st.none() | st.integers(-10**6, 10**6), max_size=40),
    bound_cents=st.integers(-10**5, 10**5),
)
def test_decimal_ge_counts(spark, cents, bound_cents):
    from decimal import Decimal as D

    data = [None if c is None else D(c) / 100 for c in cents]
    bound = D(bound_cents) / 100
    got = _counts(
        spark, data, T.DecimalType(12, 2), Check.ge(bound, error="g")
    )[("c", "g")]
    want = sum(1 for v in data if v is not None and v < bound)
    assert got == want


def test_strict_filter_projects(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], "a int, b string, c double")
    schema = DataFrameSchema(
        {"a": Column(T.IntegerType())}, strict="filter", name="sf"
    )
    out = schema.validate_result(df).df
    assert out.columns == ["a"]

    strict = DataFrameSchema(
        {"a": Column(T.IntegerType())}, strict=True, name="st"
    )
    res = strict.validate_result(df)
    assert res.errors  # extra columns rejected


# ---------------------------------------------------------------------------
# parser / defaults / regex-column / element-wise / array-check surfaces


@SET
@given(data=ints, shift=st.integers(-5, 5), bound=st.integers(-500, 500))
def test_parser_applies_before_checks(spark, data, shift, bound):
    """Column parser output (not the raw input) is what checks see
    (reference execution order, backends/pandas/array.py:287-311)."""
    from pandera_spark import Parser
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(v,) for v in data],
        T.StructType([T.StructField("c", T.IntegerType(), True)]),
    )
    schema = DataFrameSchema(
        {"c": Column(
            checks=[Check.ge(bound, error="g")],
            parsers=[Parser(lambda col: col + shift)],
            nullable=True,
        )},
        name="p",
    )
    res = schema.validate_result(df)
    got = sum(int(o.violations) for o in res.outcomes if o.check == "g")
    want = sum(1 for v in data if v is not None and v + shift < bound)
    assert got == want


@SET
@given(data=ints, default=st.integers(-50, 50), bound=st.integers(-40, 40))
def test_default_fill_before_checks(spark, data, default, bound):
    """Column default fills nulls BEFORE checks (reference
    backends/pandas/array.py:114-116): filled values are checked."""
    df = spark.createDataFrame(
        [(v,) for v in data],
        T.StructType([T.StructField("c", T.IntegerType(), True)]),
    )
    schema = DataFrameSchema(
        {"c": Column(checks=[Check.ge(bound, error="g")],
                     default=default, nullable=True)},
        name="d",
    )
    res = schema.validate_result(df)
    got = sum(int(o.violations) for o in res.outcomes if o.check == "g")
    filled = [default if v is None else v for v in data]
    want = sum(1 for v in filled if v < bound)
    assert got == want
    # the returned frame carries the filled values
    out = res.df
    got_vals = sorted(r.c for r in out.collect())
    assert got_vals == sorted(filled)


@SET
@given(
    cols=st.lists(st.sampled_from(["m_a", "m_b", "m_c", "other"]),
                  min_size=1, max_size=4, unique=True),
    bound=st.integers(-10, 10),
)
def test_regex_column_expansion(spark, cols, bound):
    """Column(regex=True) applies to EVERY matching column; violation
    counts accumulate per real column (reference
    backends/pandas/components.py:174-227)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [tuple(range(len(cols))), tuple(-10 - i for i in range(len(cols)))],
        T.StructType([T.StructField(c, T.IntegerType(), True) for c in cols]),
    )
    schema = DataFrameSchema(
        {r"^m_": Column(checks=[Check.ge(bound, error="g")], regex=True,
                        nullable=True)},
        name="rx",
    )
    res = schema.validate_result(df)
    per_col = {o.column: int(o.violations) for o in res.outcomes
               if o.check == "g"}
    m_cols = [c for c in cols if c.startswith("m_")]
    rows = [list(range(len(cols))), [-10 - i for i in range(len(cols))]]
    for c in m_cols:
        i = cols.index(c)
        want = sum(1 for r in rows if r[i] < bound)
        assert per_col[c] == want, (c, per_col)
    assert set(per_col) == set(m_cols)


@SET
@given(data=st.lists(st.none() | st.integers(-100, 100), max_size=30),
       bound=st.integers(-50, 50))
def test_element_wise_python_check_counts(spark, data, bound):
    """element_wise Python checks (the documented UDF cost cliff) must
    count identically to the vectorized path."""
    df = spark.createDataFrame(
        [(v,) for v in data],
        T.StructType([T.StructField("c", T.IntegerType(), True)]),
    )
    schema = DataFrameSchema(
        {"c": Column(checks=[
            Check(lambda v, b=bound: v >= b, element_wise=True, error="e")
        ], nullable=True)},
        name="ew",
    )
    res = schema.validate_result(df)
    got = sum(int(o.violations) for o in res.outcomes if o.check == "e")
    want = sum(1 for v in data if v is not None and v < bound)
    assert got == want


@SET
@given(
    rows=st.lists(
        st.none() | st.lists(st.integers(-20, 20), max_size=5),
        max_size=25,
    ),
    maxlen=st.integers(0, 5),
)
def test_array_size_check_counts(spark, rows, maxlen):
    """Expression checks over array columns (higher-order functions in
    the shared agg pass)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(v,) for v in rows],
        T.StructType([T.StructField(
            "c", T.ArrayType(T.IntegerType()), True)]),
    )
    schema = DataFrameSchema(
        {"c": Column(checks=[
            Check(lambda c: F.size(c) <= maxlen, error="sz")
        ], nullable=True)},
        name="arr",
    )
    res = schema.validate_result(df)
    got = sum(int(o.violations) for o in res.outcomes if o.check == "sz")
    want = sum(1 for v in rows if v is not None and len(v) > maxlen)
    assert got == want


# ---------------------------------------------------------------------------
# groupby checks (dict[group -> Series] contract) vs pure-Python replay
# ---------------------------------------------------------------------------


@SET
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.none() | st.integers(-100, 100),
        ),
        min_size=1,
        max_size=50,
    ),
    bound=st.integers(-60, 60),
)
def test_groupby_check_parity(spark, rows, bound):
    df = spark.createDataFrame(rows, "g string, v int")

    def fn(groups):
        return all((s >= bound).all() for s in groups.values())

    # collect_list drops nulls, so the Series only sees non-null values
    want = all(v >= bound for _, v in rows if v is not None)
    # BOTH execution paths must agree: driver-collect (reference contract)
    # and executor-side applyInPandas (distributed=True)
    for distributed in (False, True):
        schema = DataFrameSchema(
            {"v": Column(checks=[
                Check(fn, groupby="g", error="gb", distributed=distributed)
            ])},
            name="gbz",
        )
        res = schema.validate_result(df)
        outcome = next(o for o in res.outcomes if o.check == "gb")
        assert outcome.passed == want, f"distributed={distributed}"


@SET
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(-100, 100),
        ),
        min_size=1,
        max_size=50,
    ),
    bound=st.integers(-60, 60),
)
def test_groupby_groups_filter(spark, rows, bound):
    # only group "a" is inspected: violations in "b" must not fail it
    df = spark.createDataFrame(rows, "g string, v int")

    def fn(groups):
        return all((s >= bound).all() for s in groups.values())

    want = all(v >= bound for g, v in rows if g == "a")
    for distributed in (False, True):
        schema = DataFrameSchema(
            {"v": Column(checks=[
                Check(fn, groupby="g", groups=["a"], error="gba",
                      distributed=distributed)
            ])},
            name="gbf",
        )
        res = schema.validate_result(df)
        outcome = next(o for o in res.outcomes if o.check == "gba")
        assert outcome.passed == want, f"distributed={distributed}"


@SET
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.floats(-50, 50, allow_nan=False),
        ),
        min_size=2,
        max_size=40,
    ).filter(lambda rs: {g for g, _ in rs} == {"x", "y"}),
)
def test_custom_hypothesis_two_paths(spark, rows):
    """Custom hypothesis: driver-collect vs single-executor applyInPandas
    must produce the identical statistic and verdict."""
    from pandera_spark.hypotheses import Hypothesis

    df = spark.createDataFrame(rows, "g string, v double")

    def mean_gap(s1, s2):
        m1 = sum(s1) / len(s1) if s1 else 0.0
        m2 = sum(s2) / len(s2) if s2 else 0.0
        return m1 - m2

    got = []
    for distributed in (False, True):
        schema = DataFrameSchema(
            {"v": Column(checks=[
                Hypothesis(
                    test=mean_gap, samples=["x", "y"], groupby="g",
                    relationship=lambda stat, p: abs(stat) < 1000,
                    error="gap", distributed=distributed,
                )
            ])},
            name="hyp2",
        )
        res = schema.validate_result(df)
        outcome = next(o for o in res.outcomes if o.check == "gap")
        got.append((outcome.passed, round(res.metrics["gap"]["stat"], 9)))
    assert got[0] == got[1]


def test_custom_hypothesis_empty_input_replay_parity(spark):
    """Zero input rows: the distributed path's driver-side replay must
    mirror the collect path exactly for every (groupby, samples) shape —
    including groupby with NO named samples, where the test fn is called
    with zero args (not one empty list)."""
    from pandera_spark.hypotheses import Hypothesis

    df = spark.createDataFrame([], "g string, v double")

    def arity_probe(*samples):
        # encode the call shape in the statistic so any divergence
        # between the two paths is visible in the metrics
        return float(len(samples) * 10 + sum(len(s) for s in samples))

    for gb, names in [("g", ["x", "y"]), ("g", None), (None, None)]:
        got = []
        for distributed in (False, True):
            schema = DataFrameSchema(
                {"v": Column(checks=[
                    Hypothesis(
                        test=arity_probe, samples=names, groupby=gb,
                        relationship=lambda stat, p: True,
                        error="probe", distributed=distributed,
                    )
                ])},
                name="hyp_empty",
            )
            res = schema.validate_result(df)
            got.append(res.metrics["probe"]["stat"])
        assert got[0] == got[1], f"gb={gb} names={names}: {got}"


# ---------------------------------------------------------------------------
# Map-typed columns: nullable counting + deep dtype equality
# ---------------------------------------------------------------------------


@SET
@given(
    data=st.lists(
        st.none()
        | st.dictionaries(
            st.sampled_from(["k1", "k2"]), st.integers(0, 9), max_size=2
        ),
        max_size=40,
    )
)
def test_map_nullable_counts(spark, data):
    df = spark.createDataFrame(
        [(v,) for v in data],
        T.StructType([
            T.StructField(
                "m", T.MapType(T.StringType(), T.IntegerType()), True
            )
        ]),
    )
    schema = DataFrameSchema(
        {"m": Column(
            T.MapType(T.StringType(), T.IntegerType()), nullable=False
        )},
        name="mapz",
    )
    res = schema.validate_result(df)
    outcome = next(o for o in res.outcomes if "null" in o.check.lower())
    want = sum(1 for v in data if v is None)
    assert int(outcome.violations) == want
    assert outcome.passed == (want == 0)


def test_map_dtype_deep_equality(spark):
    # value type Long != declared Integer: SCHEMA error, deep comparison
    df = spark.createDataFrame(
        [({"k": 1},)],
        T.StructType([
            T.StructField("m", T.MapType(T.StringType(), T.LongType()), True)
        ]),
    )
    ok = DataFrameSchema(
        {"m": Column(T.MapType(T.StringType(), T.LongType()))}, name="m1"
    ).validate_result(df)
    assert ok.passed
    bad = DataFrameSchema(
        {"m": Column(T.MapType(T.StringType(), T.IntegerType()))}, name="m2"
    ).validate_result(df)
    assert not bad.passed
    assert any("dtype" in o.check.lower() for o in bad.outcomes
               if not o.passed)


# ---------------------------------------------------------------------------
# Curation text operators: Spark expressions vs pure-Python replay
# ---------------------------------------------------------------------------

_WORDS = st.lists(
    st.sampled_from(["the", "cat", "sat", "mat", "a", "b", "xyz", "Zz9"]),
    min_size=0, max_size=30,
)


def _py_repetition(text: str, n: int = 2):
    """Independent Python replay of repetition_stats semantics."""
    tw = [w for w in text.strip().split()] if text.strip() else []
    # Spark split on \s+ of the raw text (shingles side, untrimmed)
    raw_w = re.split(r"\s+", text) if text else [""]
    n_words = len(tw) if text.strip() else 0
    dup_word_frac = (
        0.0 if n_words == 0 else 1.0 - len(set(tw)) / len(tw)
    )
    grams = [
        " ".join(raw_w[i:i + n]) for i in range(max(len(raw_w) - n + 1, 0))
    ]
    n_grams = len(grams)
    if n_grams == 0:
        return n_words, round(dup_word_frac, 6), 0, 0.0, 0.0
    from collections import Counter

    c = Counter(grams)
    dup_gram_frac = 1.0 - len(c) / n_grams
    top_gram_frac = max(c.values()) / n_grams
    return (
        n_words, round(dup_word_frac, 6), n_grams,
        round(dup_gram_frac, 6), round(top_gram_frac, 6),
    )


@SET
@given(docs=st.lists(_WORDS, min_size=1, max_size=12))
def test_repetition_stats_differential(spark, docs):
    from pandera_spark.operators.text import repetition_stats

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (
            r.n_words, r.dup_word_frac, r.n_grams,
            r.dup_gram_frac, r.top_gram_frac,
        )
        for r in repetition_stats(df, ngram_n=2).collect()
    }
    want = {i: _py_repetition(t) for i, t in rows}
    assert got == want


_PII_BITS = st.lists(
    st.sampled_from([
        "plain words here",
        "bob@example.com",
        "10.0.0.255",
        "555-123-4567",
        "not@an@email",
        "1.2.3",
        "999 888 7777",
    ]),
    min_size=0, max_size=6,
)


@SET
@given(docs=st.lists(_PII_BITS, min_size=1, max_size=8))
def test_pii_counts_differential(spark, docs):
    from pandera_spark.operators.text import PII_PATTERNS, pii_counts

    rows = [(i, " ".join(bits)) for i, bits in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_email, r.n_ipv4, r.n_phone)
        for r in pii_counts(df).collect()
    }
    want = {
        i: tuple(
            len(re.findall(pat, t)) for pat in PII_PATTERNS.values()
        )
        for i, t in rows
    }
    assert got == want


# ---------------------------------------------------------------------------
# drift operators vs pure-Python reference


_cats = st.lists(st.sampled_from("pqrs"), min_size=1, max_size=40)


@SET
@given(ca=_cats, cb=_cats)
def test_category_drift_matches_python(spark, ca, cb):
    import math

    from pandera_spark.operators.drift import category_drift

    a = spark.createDataFrame([(c,) for c in ca], "cat string")
    b = spark.createDataFrame([(c,) for c in cb], "cat string")
    row = category_drift(a, b, "cat").first()

    cats = sorted(set(ca) | set(cb))
    na, nb = len(ca), len(cb)
    chi2 = 0.0
    js = 0.0
    for c in cats:
        xa, xb = ca.count(c), cb.count(c)
        ea = na * (xa + xb) / (na + nb)
        eb = nb * (xa + xb) / (na + nb)
        chi2 += (xa - ea) ** 2 / ea + (xb - eb) ** 2 / eb
        pa, pb = xa / na, xb / nb
        m = (pa + pb) / 2
        if pa > 0:
            js += pa * math.log(pa / m) / 2
        if pb > 0:
            js += pb * math.log(pb / m) / 2
    assert row.n_a == na and row.n_b == nb
    assert row.n_categories == len(cats)
    assert row.chi2_stat == pytest.approx(chi2, abs=1e-9)
    assert row.js_divergence == pytest.approx(js, abs=1e-12)


_vals = st.lists(
    st.none() | st.integers(0, 100), min_size=1, max_size=40
).filter(lambda xs: any(v is not None for v in xs))


@SET
@given(va=_vals, vb=_vals, e1=st.integers(10, 50), span=st.integers(1, 40))
def test_psi_matches_python(spark, va, vb, e1, span):
    import math

    from pandera_spark.operators.drift import psi, PSI_EPS

    edges = [float(e1), float(e1 + span)]
    a = spark.createDataFrame([(v,) for v in va], "v int")
    b = spark.createDataFrame([(v,) for v in vb], "v int")
    row = psi(a, b, "v", edges).first()

    def binof(v):
        if v is None:
            return -1
        for i, e in enumerate(edges):
            if v < e:
                return i
        return len(edges)

    bins = sorted({binof(v) for v in va} | {binof(v) for v in vb})
    want = 0.0
    for bn in bins:
        fa = max(sum(1 for v in va if binof(v) == bn) / len(va), PSI_EPS)
        fb = max(sum(1 for v in vb if binof(v) == bn) / len(vb), PSI_EPS)
        want += (fa - fb) * math.log(fa / fb)
    assert row.n_bins == len(bins)
    assert row.psi == pytest.approx(want, abs=1e-9)


@SET
@given(
    data=st.lists(
        st.floats(-1e4, 1e4, allow_nan=False), min_size=2, max_size=50
    ),
    p=st.floats(0.01, 0.99),
)
def test_percentile_matches_python_interpolation(spark, data, p):
    from pandera_spark.inference import numeric_percentiles

    df = spark.createDataFrame([(v,) for v in data], "x double")
    row = numeric_percentiles(df, ["x"], probs=(p,), exact=True).first()
    xs = sorted(data)
    rank = p * (len(xs) - 1)
    lo, frac = int(rank), rank - int(rank)
    want = xs[lo] if frac == 0 else xs[lo] * (1 - frac) + xs[lo + 1] * frac
    got = row[1]
    assert got == pytest.approx(want, rel=1e-9, abs=1e-9)


@SET
@given(
    data=st.lists(
        st.floats(-1e4, 1e4, allow_nan=False), min_size=2, max_size=50
    ),
    p=st.floats(0.01, 0.99),
)
def test_percentile_approx_default_is_data_value_in_rank_window(
    spark, data, p
):
    """DEFAULT (sketch) path property: the result is an actual member of
    the data (percentile_disc-style, no interpolation) and some rank it
    occupies is within the guaranteed n/accuracy (+1 boundary slack) of
    the target rank p*n."""
    from pandera_spark.inference import numeric_percentiles

    df = spark.createDataFrame([(v,) for v in data], "x double")
    n = len(data)
    row = numeric_percentiles(df, ["x"], probs=(p,), accuracy=n).first()
    got = row[1]
    xs = sorted(data)
    assert got in xs
    # got occupies 1-based ranks [n_lt+1, n_le]; that interval must
    # touch [p*n - err, p*n + err] with err = n/accuracy (=1 here) + 1
    n_le = sum(1 for v in xs if v <= got)
    n_lt = sum(1 for v in xs if v < got)
    err = n / n + 1.0
    assert n_lt + 1 <= p * n + err and n_le >= p * n - err


@SET
@given(va=_vals, vb=_vals)
def test_ks_drift_matches_python(spark, va, vb):
    from pandera_spark.operators.drift import ks_drift

    a = spark.createDataFrame([(v,) for v in va], "v int")
    b = spark.createDataFrame([(v,) for v in vb], "v int")
    row = ks_drift(a, b, "v").first()
    xa = sorted(v for v in va if v is not None)
    xb = sorted(v for v in vb if v is not None)
    pts = sorted(set(xa) | set(xb))
    want = max(
        abs(
            sum(1 for v in xa if v <= p) / len(xa)
            - sum(1 for v in xb if v <= p) / len(xb)
        )
        for p in pts
    )
    assert row.n_a == len(xa) and row.n_b == len(xb)
    assert row.ks_stat == pytest.approx(want, abs=1e-12)


@SET
@given(
    toks=st.lists(st.integers(1, 30), min_size=1, max_size=40),
    budget=st.integers(5, 40),
    nb=st.integers(1, 3),
)
def test_greedy_pack_fuzz_matches_python(spark, toks, budget, nb):
    from pyspark.sql import functions as F

    from pandera_spark.operators.packing import greedy_pack

    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "id bigint, toks bigint")
    got = {
        (r.bucket, r.id): r.pack
        for r in greedy_pack(
            df, "id", "toks", budget, bucket=F.col("id") % nb
        ).collect()
    }
    want = {}
    for b in range(nb):
        cur, fill = 0, 0
        for i, t in rows:
            if i % nb != b:
                continue
            if fill > 0 and fill + t > budget:
                cur, fill = cur + 1, 0
            fill += t
            want[(b, i)] = cur
    assert got == want


@SET
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=6),
        min_size=1, max_size=10,
    ),
    maxdf=st.integers(1, 4),
)
def test_corpus_line_dedup_fuzz_matches_python(spark, docs, maxdf):
    from pandera_spark.operators.text import corpus_line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r.text
        for r in corpus_line_dedup(df, max_doc_frequency=maxdf).collect()
    }
    from collections import defaultdict

    freq = defaultdict(set)
    for i, lines in enumerate(docs):
        for ln in lines:
            freq[ln].add(i)
    want = {}
    for i, lines in enumerate(docs):
        kept = [ln for ln in lines if len(freq[ln]) <= maxdf]
        if kept:
            want[i] = "\n".join(kept)
    assert got == want


# --- bloom filter vs pure-Python replay --------------------------------------

_bloom_texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        max_size=12,
    ),
    min_size=1,
    max_size=40,
)


def _py_bloom_positions(value: str, num_bits: int, k: int) -> list[int]:
    import hashlib

    digest = hashlib.md5(value.encode("utf-8")).hexdigest()
    h1 = int(digest[0:7], 16)
    h2 = int(digest[7:14], 16) | 1
    return [(h1 + i * h2) % num_bits for i in range(k)]


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_bloom_texts, probe=_bloom_texts)
def test_bloom_matches_python_replay(spark, data, probe):
    """The distributed filter's words and verdicts equal an independent
    per-value Python evaluation of the same md5 double-hashing."""
    from pandera_spark.operators.bloom import (
        bloom_build, bloom_contains, bloom_dense,
    )

    num_bits, k = 512, 3
    idx = spark.createDataFrame([(v,) for v in data], "text string")
    words = {r.word_idx: r.word
             for r in bloom_build(idx, "text", num_bits, k).collect()}
    py_words: dict[int, int] = {}
    for v in data:
        for p in _py_bloom_positions(v, num_bits, k):
            py_words[p // 32] = py_words.get(p // 32, 0) | (1 << (p % 32))
    assert words == py_words
    dense = bloom_dense(
        bloom_build(idx, "text", num_bits, k), num_bits
    )
    probes = spark.createDataFrame(
        [(i, v) for i, v in enumerate(probe)], "i long, text string"
    )
    got = {r.i: r.might_contain
           for r in bloom_contains(probes, "text", dense,
                                   num_bits, k).collect()}
    for i, v in enumerate(probe):
        expect = all(
            py_words.get(p // 32, 0) & (1 << (p % 32))
            for p in _py_bloom_positions(v, num_bits, k)
        )
        assert got[i] == expect, (v, got[i], expect)


# --- chunking vs pure-Python replay ------------------------------------------


def _py_chunks(text: str, size: int, step: int) -> list[str]:
    n = len(text)
    if n == 0:
        return []
    if n <= size:
        return [text]
    import math

    n_chunks = math.ceil((n - size) / step) + 1
    return [text[i * step: i * step + size] for i in range(n_chunks)]


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(st.text(max_size=80), min_size=1, max_size=10),
    size=st.integers(2, 30),
    overlap=st.integers(0, 10),
)
def test_chunking_matches_python_replay(spark, texts, size, overlap):
    from pandera_spark.operators.chunking import chunk_text

    if overlap >= size:
        overlap = size - 1
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = chunk_text(df, "doc_id", "text", size=size, overlap=overlap)
    got: dict[int, list] = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    for i, t in enumerate(texts):
        expect = list(enumerate(_py_chunks(t, size, size - overlap)))
        assert sorted(got.get(i, [])) == expect, (t, size, overlap)


# --- sharding vs pure-Python replay ------------------------------------------


def _py_hash28(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:7], 16)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.integers(0, 10**9), min_size=1, max_size=40,
                  unique=True),
    n_shards=st.integers(1, 16),
    epoch=st.integers(0, 5),
)
def test_sharding_matches_python_replay(spark, keys, n_shards, epoch):
    """Shard ids, epoch sort keys, and interleave positions all equal an
    independent Python evaluation of the md5 arithmetic."""
    from pandera_spark.operators.sharding import (
        interleave_positions, shard_assign,
    )

    df = spark.createDataFrame([(k,) for k in keys], "id long")
    got = {r.id: (r.shard, r.sort_key, r.pos)
           for r in interleave_positions(df, "id", n_shards,
                                         epoch).collect()}
    # python replay
    shards = {k: _py_hash28(str(k)) % n_shards for k in keys}
    sort_keys = {k: _py_hash28(f"{k}:epoch={epoch}") for k in keys}
    by_shard: dict[int, list] = {}
    for k in keys:
        by_shard.setdefault(shards[k], []).append(k)
    for s, ks in by_shard.items():
        ks.sort(key=lambda k: (sort_keys[k], k))
        for pos, k in enumerate(ks, start=1):
            assert got[k] == (s, sort_keys[k], pos), k
    # sanity: plain shard_assign agrees with the composed op
    sa = {r.id: r.shard for r in shard_assign(df, "id", n_shards).collect()}
    assert sa == shards


# --- funnel / retention / transitions vs pure-Python replay ------------------

_events = st.lists(
    st.tuples(
        st.integers(1, 5),                      # user
        st.integers(0, 50),                     # minute offset
        st.sampled_from(["a", "b", "c"]),       # type
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_events)
def test_funnel_matches_python_replay(spark, events):
    import datetime as dt

    from pandera_spark.operators.temporal import funnel

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, i, T0 + dt.timedelta(minutes=m), t)
        for i, (u, m, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, et string"
    )
    got = {r.step: r.n_users
           for r in funnel(df, "user_id", "et", "ts",
                           ["a", "b", "c"]).collect()}
    # python replay of greedy earliest-match semantics; ties broken by
    # min over equal timestamps exactly as min(ts) does
    by_user: dict[int, list] = {}
    for u, m, t in events:
        by_user.setdefault(u, []).append((m, t))
    expect = {1: 0, 2: 0, 3: 0}
    for u, evs in by_user.items():
        prev_t = None
        for step, name in enumerate(["a", "b", "c"], start=1):
            times = [m for m, t in evs
                     if t == name and (prev_t is None or m > prev_t)]
            if not times:
                break
            prev_t = min(times)
            expect[step] += 1
    assert got == expect


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_events)
def test_retention_matches_python_replay(spark, events):
    import datetime as dt

    from pandera_spark.operators.temporal import retention

    T0 = dt.datetime(2024, 1, 1)
    rows = [(u, T0 + dt.timedelta(hours=m)) for u, m, _ in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort.day, r.day_offset): r.n_users
           for r in retention(df, "user_id", "ts", max_offset=7).collect()}
    days: dict[int, set] = {}
    for u, m, _ in events:
        days.setdefault(u, set()).add((T0 + dt.timedelta(hours=m)).day)
    expect: dict[tuple, int] = {}
    for u, ds in days.items():
        cohort = min(ds)
        for d in ds:
            off = d - cohort
            if off <= 7:
                k = (cohort, off)
                expect[k] = expect.get(k, 0) + 1
    assert got == expect


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_events)
def test_transitions_match_python_replay(spark, events):
    import datetime as dt

    from pandera_spark.operators.temporal import event_transitions

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, i, T0 + dt.timedelta(minutes=m), t)
        for i, (u, m, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, et string"
    )
    got = {(r.from_type, r.to_type): r.n
           for r in event_transitions(df, "user_id", "et", "ts",
                                      tiebreak_cols=["event_id"]).collect()}
    by_user: dict[int, list] = {}
    for i, (u, m, t) in enumerate(events):
        by_user.setdefault(u, []).append((m, i, t))
    expect: dict[tuple, int] = {}
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            expect[(a, b)] = expect.get((a, b), 0) + 1
    assert got == expect


# --- z-order key vs pure-Python replay ---------------------------------------


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(-1000, 1000), st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False)),
        min_size=2, max_size=30, unique_by=lambda t: t,
    ),
    bits=st.sampled_from([4, 8, 16]),
)
def test_zorder_matches_python_replay(spark, rows, bits):
    from pandera_spark.operators.sharding import zorder_key

    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(rows)],
        "id long, x double, y double",
    )
    got = {r.id: r.zkey for r in zorder_key(df, ["x", "y"],
                                            bits=bits).collect()}
    xs = [float(x) for x, _ in rows]
    ys = [float(y) for _, y in rows]
    top = float((1 << bits) - 1)

    def cell(v, lo, hi):
        span = (hi - lo) if hi > lo else 1.0
        s = int((v - lo) * top / span)       # trunc, like cast long
        return min(max(s, 0), int(top))

    for i, (x, y) in enumerate(rows):
        cx = cell(float(x), min(xs), max(xs))
        cy = cell(float(y), min(ys), max(ys))
        expect = 0
        for b in range(bits):
            expect |= ((cx >> b) & 1) << (2 * b)
            expect |= ((cy >> b) & 1) << (2 * b + 1)
        assert got[i] == expect, (i, x, y, bits)


# --- round-4 operators vs pure-Python replays -------------------------------


@SET
@given(
    costs=st.lists(st.integers(0, 10_000), min_size=1, max_size=80),
    n_shards=st.integers(1, 9),
)
def test_balanced_shards_matches_python_replay(spark, costs, n_shards):
    """Snake assignment == an independent Python replay of the
    rank -> fold formula, and the balance bound holds on every input."""
    from pandera_spark.operators.sharding import balanced_shards

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(costs)], "doc_id long, cost long"
    )
    got = {r.doc_id: r.shard
           for r in balanced_shards(df, "cost", n_shards).collect()}
    order = sorted(range(len(costs)), key=lambda i: (-costs[i], i))
    expect = {}
    for rank, i in enumerate(order):
        m = rank % (2 * n_shards)
        expect[i] = m if m < n_shards else 2 * n_shards - 1 - m
    assert got == expect
    totals = [0] * n_shards
    for i, c in enumerate(costs):
        totals[got[i]] += c
    if len(costs) >= n_shards:
        assert max(totals) - min(totals) <= (max(costs) if costs else 0)


@SET
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.lists(st.sampled_from(["red", "blue", "green", "dot"]),
                     min_size=0, max_size=12),
        ),
        min_size=2, max_size=30,
    ).filter(lambda d: len({lbl for lbl, _ in d}) == 2),
)
def test_nb_classifier_matches_python_replay(spark, docs):
    """nb_train + nb_score == an independent Python NB implementation
    (same portable hashing, smoothing, priors, unseen defaults, and
    (score, label) argmax tie-break)."""
    import hashlib
    import math

    from pandera_spark.operators.text import nb_score, nb_train

    B, a = 64, 1.0

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:7], 16) % B

    train = spark.createDataFrame(
        [(i, " ".join(toks), lbl) for i, (lbl, toks) in enumerate(docs)],
        "doc_id long, text string, y string",
    )
    model = nb_train(train, "y", "text", num_buckets=B, smoothing=a)
    got = {r.doc_id: (r.predicted, round(r.score, 6))
           for r in nb_score(train, model, num_buckets=B).collect()}

    # python replay
    from collections import Counter, defaultdict
    by_label_counts = defaultdict(Counter)
    label_docs = Counter()
    for lbl, toks in docs:
        label_docs[lbl] += 1
        for t in toks:
            by_label_counts[lbl][bucket(t)] += 1
    n = len(docs)
    labels = sorted(label_docs)
    for i, (_, toks) in enumerate(docs):
        best = None
        for lbl in labels:
            tot = sum(by_label_counts[lbl].values())
            s = math.log(label_docs[lbl] / n)
            for t in toks:
                c = by_label_counts[lbl][bucket(t)]
                s += math.log((c + a) / (tot + a * B))
            key = (s, lbl)
            if best is None or key > best:
                best = key
        assert got[i][0] == best[1], (i, got[i], best)
        assert got[i][1] == pytest.approx(round(best[0], 6), abs=1e-5), i


@SET
@given(
    data=st.lists(
        # no subnormals: interpolating between a denormal and 0 puts
        # the half-ulp rounding of (hi-lo)*frac outside any portable
        # contract (hypothesis found -5e-324 flipping a strictly-below
        # edge test); the property under test is BIN logic, and the
        # engine's contract rows pin normal-range interpolation parity
        # against DuckDB's quantile_cont
        st.floats(-1e4, 1e4, allow_nan=False, allow_subnormal=False),
        min_size=4, max_size=40,
    ),
    k=st.integers(2, 6),
)
def test_sketch_bins_exact_matches_python(spark, data, k):
    """Exact-edges sketch_bins replays as pure python: edges at
    interpolated quantiles i/k, bin = 1 + #edges strictly below."""
    from pandera_spark.operators.numeric import sketch_bins

    df = spark.createDataFrame([(v,) for v in data], "x double")
    got = {
        r.x: r.bin
        for r in sketch_bins(df, "x", k, exact=True).collect()
    }
    xs = sorted(data)
    n = len(xs)

    def q(p):
        # Replicate Spark's Percentile source arithmetic VERBATIM:
        # result = (higher - pos)*lowerValue + (pos - lower)*higherValue
        # with equal-neighbor collapse (duplicates aggregate to one
        # distinct entry, so both positions resolve to the same value
        # and Spark returns it exactly).  Neither the pure additive
        # form lo + (hi-lo)*frac nor the textbook mix lo*(1-f) + hi*f
        # matches in the last ulp on BOTH hypothesis-found cases: two
        # equal 0.87499s break the mix form (0.87498999...), while
        # [0, 0, 1e4, 1e4-ulp] at p=0.8 breaks the additive form
        # (9999.999999999999 vs Spark's 10000.0).  Verified against
        # Spark over ~900 adversarial probes (duplicates, ulp
        # neighbors, both signs) with zero mismatches.
        import math as _m

        pos = p * (n - 1)
        lo, hi = _m.floor(pos), _m.ceil(pos)
        if lo == hi or xs[lo] == xs[hi]:
            return xs[lo]
        return (hi - pos) * xs[lo] + (pos - lo) * xs[hi]

    edges = [q(i / k) for i in range(1, k)]
    for v in data:
        want = 1 + sum(1 for e in edges if e < v)
        assert got[v] == want, (v, edges)


@SET
@given(
    viol=st.integers(0, 50),
    extra=st.integers(1, 50),
    z=st.floats(0.5, 3.0),
)
def test_wilson_interval_matches_python(spark, viol, extra, z):
    from pandera_spark.inference import wilson_intervals

    n = viol + extra
    rep = spark.createDataFrame(
        [("c", "chk", viol, n)],
        "col_name string, check string, violations long, n_rows long",
    )
    row = wilson_intervals(rep, z=z).first()
    import math

    p = viol / n
    z2 = z * z
    denom = 1 + z2 / n
    center = p + z2 / (2 * n)
    half = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    assert row.ci_lo == pytest.approx(
        max(0.0, (center - half) / denom), abs=1e-12)
    assert row.ci_hi == pytest.approx(
        min(1.0, (center + half) / denom), abs=1e-12)
    assert row.rate == pytest.approx(p)
