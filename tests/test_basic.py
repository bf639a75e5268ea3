"""End-to-end tests over FIXTURES.md F1 (products), F6 (dupes), F7 (coercion).

Mirrors the reference test strategy (SURVEY.md §5): tiny hand-built frames
with explicit StructTypes, asserting the error-report shape.
"""

import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandera_spark import (
    Check,
    Column,
    DataFrameSchema,
    SchemaErrors,
)


# fast contract-relevant lane: `pytest -m smoke` (see pytest.ini)
pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def products(spark):
    # FIXTURES.md F1; reference tests/pyspark/conftest.py:70-86
    schema = T.StructType(
        [
            T.StructField("product", T.StringType(), True),
            T.StructField("price", T.IntegerType(), True),
        ]
    )
    return spark.createDataFrame(
        [("Bread", 9), ("Butter", 15)], schema=schema
    )


def test_all_pass(spark, products):
    schema = DataFrameSchema(
        {
            "product": Column(T.StringType(), Check.str_startswith("B")),
            "price": Column(T.IntegerType(), Check.gt(5)),
        },
        name="products",
    )
    out = schema.validate(products)
    assert out.pandera.errors == {}
    assert out.count() == 2


def test_value_check_fails_with_count(spark, products):
    schema = DataFrameSchema(
        {"price": Column(T.IntegerType(), Check.gt(10))}, name="products"
    )
    result = schema.validate_result(products)
    assert not result.passed
    [err] = result.errors
    assert err.column == "price"
    assert err.failure_cases_count == 1  # only the 9 fails
    report = result.report
    assert "DATA" in report
    assert "schema_component_check" in report["DATA"]


def test_single_agg_job_runs_all_checks(spark, products):
    """Many checks -> still one aggregation (smoke: result correct for all)."""
    schema = DataFrameSchema(
        {
            "product": Column(
                T.StringType(),
                [
                    Check.str_startswith("B"),
                    Check.str_length(1, 6),
                    Check.isin(["Bread", "Butter", "Milk"]),
                    Check.str_matches(r"[A-Z]"),
                ],
            ),
            "price": Column(
                T.IntegerType(),
                [Check.gt(5), Check.lt(100), Check.in_range(9, 15), Check.ne(0)],
            ),
        },
        name="products",
    )
    result = schema.validate_result(products)
    assert result.passed
    assert result.total_rows == 2
    # every declared check shows up in the outcome table
    assert len([o for o in result.outcomes if o.check.startswith("dtype")]) == 2
    assert len(result.outcomes) >= 10


def test_lazy_false_raises(spark, products):
    schema = DataFrameSchema(
        {"price": Column(T.IntegerType(), Check.gt(10))}, name="products"
    )
    with pytest.raises(SchemaErrors) as exc:
        schema.validate(products, lazy=False)
    assert "price" in str(exc.value)


def test_missing_column_and_strict(spark, products):
    schema = DataFrameSchema(
        {
            "price": Column(T.IntegerType()),
            "nonexistent": Column(T.StringType()),
        },
        strict=True,
        name="products",
    )
    result = schema.validate_result(products)
    reasons = {e.reason_code.value for e in result.errors}
    assert "column_not_in_dataframe" in reasons
    assert "column_not_in_schema" in reasons  # 'product' not declared


def test_strict_filter_projects(spark, products):
    schema = DataFrameSchema(
        {"price": Column(T.IntegerType())}, strict="filter", name="products"
    )
    out = schema.validate(products)
    assert out.columns == ["price"]
    assert out.pandera.errors == {}


def test_dtype_mismatch(spark, products):
    schema = DataFrameSchema(
        {"price": Column(T.LongType())}, name="products"
    )
    result = schema.validate_result(products)
    [err] = result.errors
    assert err.reason_code.value == "wrong_dtype"


def test_nullable_violation(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", None)],
        schema=T.StructType(
            [
                T.StructField("k", T.StringType(), True),
                T.StructField("v", T.IntegerType(), True),
            ]
        ),
    )
    schema = DataFrameSchema({"v": Column(T.IntegerType(), nullable=False)})
    result = schema.validate_result(df)
    [err] = result.errors
    assert err.reason_code.value == "series_contains_nulls"
    assert err.failure_cases_count == 1


def test_ignore_na_default_null_passes_value_checks(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (20,)],
        schema=T.StructType([T.StructField("v", T.IntegerType(), True)]),
    )
    result = DataFrameSchema(
        {"v": Column(T.IntegerType(), Check.gt(5))}
    ).validate_result(df)
    [err] = [e for e in result.errors]
    assert err.failure_cases_count == 1  # only value 1; null ignored

    # ignore_na=False: null is a violation too
    result2 = DataFrameSchema(
        {"v": Column(T.IntegerType(), Check.gt(5, ignore_na=False))}
    ).validate_result(df)
    [err2] = result2.errors
    assert err2.failure_cases_count == 2


def test_joint_unique_report_modes(spark):
    # FIXTURES.md F6
    df = spark.createDataFrame(
        [
            (1, "a", 0.1),
            (1, "a", 0.2),
            (2, "b", 0.3),
            (3, "c", 0.4),
            (3, "c", 0.5),
            (3, "c", 0.6),
        ],
        schema="k1 int, k2 string, v double",
    )
    for mode, expected in [("all", 5), ("exclude_first", 3), ("exclude_last", 3)]:
        schema = DataFrameSchema(
            {"k1": Column(T.IntegerType())},
            unique=["k1", "k2"],
            report_duplicates=mode,
        )
        result = schema.validate_result(df)
        dup_errs = [
            e for e in result.errors if e.reason_code.value == "duplicates"
        ]
        assert len(dup_errs) == 1
        assert dup_errs[0].failure_cases_count == expected, mode


def test_column_level_unique(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,)], schema="k1 int"
    )
    schema = DataFrameSchema({"k1": Column(T.IntegerType(), unique=True)})
    result = schema.validate_result(df)
    [err] = result.errors
    assert err.reason_code.value == "series_contains_duplicates"
    assert err.failure_cases_count == 2  # report_duplicates=all


def test_coercion(spark):
    # FIXTURES.md F7
    df = spark.createDataFrame(
        [("1", "2024-01-01", 1), ("2", "not-a-date", 2), ("x", "2024-02-03", 3)],
        schema="s_int string, s_date string, i_dbl int",
    )
    schema = DataFrameSchema(
        {
            "s_int": Column(T.IntegerType(), coerce=True),
            "s_date": Column(T.DateType(), coerce=True),
            "i_dbl": Column(T.DoubleType(), coerce=True),
        }
    )
    result = schema.validate_result(df)
    out = result.df
    assert dict(out.dtypes)["s_int"] == "int"
    assert dict(out.dtypes)["s_date"] == "date"
    assert dict(out.dtypes)["i_dbl"] == "double"
    coercion_errs = {
        e.column: e.failure_cases_count
        for e in result.errors
        if e.reason_code.value == "dtype_coercion_error"
    }
    assert coercion_errs == {"s_int": 1, "s_date": 1}
    # hidden original columns must not leak
    assert all(not c.startswith("__pandera") for c in out.columns)


def test_drop_invalid_rows(spark):
    df = spark.createDataFrame(
        [(1,), (7,), (20,), (None,)],
        schema=T.StructType([T.StructField("v", T.IntegerType(), True)]),
    )
    schema = DataFrameSchema(
        {"v": Column(T.IntegerType(), Check.in_range(5, 25), nullable=False)},
        drop_invalid_rows=True,
    )
    out = schema.validate(df)
    assert sorted(r.v for r in out.collect()) == [7, 20]


def test_dataframe_level_check(spark):
    df = spark.createDataFrame(
        [(1, 2), (5, 3)], schema="a int, b int"
    )
    schema = DataFrameSchema(
        {"a": Column(T.IntegerType()), "b": Column(T.IntegerType())},
        checks=Check(
            lambda d: F.col("a") <= F.col("b"), name="a_le_b", error="a<=b"
        ),
    )
    result = schema.validate_result(df)
    [err] = result.errors
    assert err.reason_code.value == "dataframe_check"
    assert err.failure_cases_count == 1


def test_regex_columns(spark):
    # FIXTURES.md F8
    df = spark.createDataFrame(
        [(1.0, 2.0, -3.0, "x")],
        schema="metric_2021 double, metric_2022 double, metric_2023 double, note string",
    )
    schema = DataFrameSchema(
        {
            r"metric_\d{4}": Column(
                T.DoubleType(), Check.ge(0), regex=True
            ),
            "note": Column(T.StringType()),
        }
    )
    result = schema.validate_result(df)
    [err] = result.errors
    assert err.column == "metric_2023"

    # zero-match regex must error
    schema2 = DataFrameSchema(
        {r"nope_\d+": Column(T.DoubleType(), regex=True)}
    )
    result2 = schema2.validate_result(df)
    assert any(
        e.reason_code.value == "column_not_in_dataframe"
        for e in result2.errors
    )


def test_add_missing_columns_and_defaults(spark):
    df = spark.createDataFrame([(1,), (2,)], schema="a int")
    schema = DataFrameSchema(
        {
            "a": Column(T.IntegerType()),
            "extra": Column(T.IntegerType(), default=0),
        },
        add_missing_columns=True,
    )
    result = schema.validate_result(df)
    assert result.passed
    assert "extra" in result.df.columns
    assert {r.extra for r in result.df.collect()} == {0}


def test_unique_values_eq(spark):
    df = spark.createDataFrame([("A",), ("B",), ("A",)], schema="f string")
    ok = DataFrameSchema(
        {"f": Column(T.StringType(), Check.unique_values_eq({"A", "B"}))}
    ).validate_result(df)
    assert ok.passed
    bad = DataFrameSchema(
        {"f": Column(T.StringType(), Check.unique_values_eq({"A", "B", "C"}))}
    ).validate_result(df)
    assert not bad.passed


def test_type_gating(spark, products):
    """Numeric check on a string column is a compile-time SCHEMA error
    (reference backends/pyspark/decorators.py:42-104)."""
    schema = DataFrameSchema(
        {"product": Column(T.StringType(), Check.gt(5))}
    )
    result = schema.validate_result(products)
    [err] = result.errors
    assert err.reason_code.value == "check_error"
    assert "does not accept" in err.message


def test_ordered(spark, products):
    schema = DataFrameSchema(
        {
            "price": Column(T.IntegerType()),
            "product": Column(T.StringType()),
        },
        ordered=True,
    )
    result = schema.validate_result(products)
    assert any(
        e.reason_code.value == "column_not_ordered" for e in result.errors
    )


def test_validation_disabled(spark, products):
    from pandera_spark import config_context

    schema = DataFrameSchema({"zzz": Column(T.StringType())})
    with config_context(validation_enabled=False):
        result = schema.validate_result(products)
    assert result.passed


def test_schema_only_depth_skips_data_checks(spark, products):
    from pandera_spark import ValidationDepth, config_context

    schema = DataFrameSchema(
        {"price": Column(T.IntegerType(), Check.gt(1000))}
    )
    with config_context(validation_depth=ValidationDepth.SCHEMA_ONLY):
        result = schema.validate_result(products)
    assert result.passed  # data check skipped


def test_to_structtype_and_ddl(spark):
    schema = DataFrameSchema(
        {
            "a": Column(T.LongType(), nullable=False),
            "b": Column(T.StringType()),
        }
    )
    st = schema.to_structtype()
    assert st.fieldNames() == ["a", "b"]
    assert schema.to_ddl() == "a BIGINT, b STRING"


def test_parser_runs_before_checks(spark):
    from pandera_spark import Parser

    df = spark.createDataFrame([(" x ",), ("y",)], schema="s string")
    schema = DataFrameSchema(
        {
            "s": Column(
                T.StringType(),
                Check.str_length(1, 1),
                parsers=Parser(lambda c: F.trim(c)),
            )
        }
    )
    result = schema.validate_result(df)
    assert result.passed


def test_golden_error_report_shape(spark):
    """Golden end-to-end report (reference test strategy: exact nested
    error dicts, tests/pyspark/test_pyspark_check.py:115-120): the full
    {"SCHEMA"|"DATA": {reason_code: [entries]}} structure for a
    multi-failure validate."""
    df = spark.createDataFrame(
        [(1, 5.0, "x"), (2, -1.0, "y"), (None, 200.0, "zz")],
        T.StructType([
            T.StructField("id", T.IntegerType(), True),
            T.StructField("v", T.DoubleType(), True),
            T.StructField("s", T.StringType(), True),
        ]),
    )
    schema = DataFrameSchema(
        {
            "id": Column(T.IntegerType(), nullable=False),
            "v": Column(T.DoubleType(), Check.in_range(0.0, 100.0,
                                                       error="v_in_0_100")),
            "s": Column(T.StringType(), Check.str_length(1, 1,
                                                         error="s_len_1")),
            "missing_col": Column(T.StringType()),
        },
        name="golden",
    )
    report = schema.validate_result(df).report
    assert set(report) <= {"SCHEMA", "DATA"}
    assert report["SCHEMA"]["column_not_in_dataframe"] == [
        {
            "schema": "golden",
            "column": "missing_col",
            "check": "column_in_dataframe",
            "error": "column 'missing_col' not in dataframe",
            "violations": 0,
        }
    ]
    data = report["DATA"]["schema_component_check"]
    by_check = {e["check"]: e for e in data}
    assert by_check["v_in_0_100"]["violations"] == 2
    assert by_check["v_in_0_100"]["column"] == "v"
    assert by_check["s_len_1"]["violations"] == 1
    # nulls file under SCHEMA (reference ERROR_CATEGORY_MAP:
    # SERIES_CONTAINS_NULLS -> SCHEMA; aligned in r9)
    nulls = report["SCHEMA"]["series_contains_nulls"]
    assert nulls[0]["column"] == "id" and nulls[0]["violations"] == 1


def test_empty_dataframe_validates_vacuously(spark):
    st = T.StructType([
        T.StructField("v", T.IntegerType(), True),
        T.StructField("s", T.StringType(), True),
    ])
    empty = spark.createDataFrame([], st)
    schema = DataFrameSchema(
        {
            "v": Column(T.IntegerType(), Check.gt(0), nullable=False,
                        unique=True),
            "s": Column(T.StringType(), Check.str_length(1, 5)),
        },
        unique=["v", "s"],
    )
    res = schema.validate_result(empty)
    assert res.passed and res.total_rows == 0 and not res.errors


def test_all_null_column_reports(spark):
    st = T.StructType([
        T.StructField("v", T.IntegerType(), True),
        T.StructField("s", T.StringType(), True),
    ])
    df = spark.createDataFrame([(None, None)] * 3, st)
    schema = DataFrameSchema(
        {
            "v": Column(T.IntegerType(), Check.gt(0), nullable=False,
                        unique=True),
            "s": Column(T.StringType(), Check.str_length(1, 5)),
        },
        unique=["v", "s"],
    )
    res = schema.validate_result(df)
    got = sorted(
        (e.reason_code.value, e.column, e.failure_cases_count)
        for e in res.errors
    )
    # nulls: 3 not-null violations; null groups count as duplicate tuples
    # (groupBy treats null keys as equal — same as the reference's
    # groupBy-count, backends/pyspark/container.py:532-540); value checks
    # ignore nulls (ignore_na)
    assert got == [
        ("duplicates", "v,s", 3),
        ("series_contains_duplicates", "v", 3),
        ("series_contains_nulls", "v", 3),
    ]


def test_job_count_independent_of_check_count(spark, products):
    """The scale invariant: adding checks adds aggregate expressions, not
    Spark actions (SURVEY §4; vs the reference's job-per-check)."""
    few = DataFrameSchema(
        {"price": Column(T.IntegerType(), [Check.gt(0)])}, name="few"
    )
    many = DataFrameSchema(
        {
            "price": Column(T.IntegerType(), [
                Check.gt(0), Check.lt(1000), Check.ne(-1),
                Check.in_range(0, 999), Check.ge(1), Check.le(999),
            ]),
            "product": Column(T.StringType(), [
                Check.str_length(1, 99), Check.str_matches("."),
                Check.isin(["Bread", "Butter"]), Check.str_startswith("B"),
            ]),
        },
        name="many",
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_for(schema):
        # scope counting to a private job group: counting EVERY job id
        # in the session is load-order-flaky under a full parallel run
        schema.validate_result(products)  # warm
        group = f"jobcount-{schema.name}-{uuid.uuid4().hex[:8]}"
        sc.setJobGroup(group, "job-count invariance probe")
        try:
            schema.validate_result(products)
        finally:
            sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group) or [])

    j_few, j_many = jobs_for(few), jobs_for(many)
    assert j_many == j_few, (j_few, j_many)
    assert j_many <= 3  # one action; AQE may re-plan it into 2-3 job ids


def test_validate_under_ansi_mode(spark, products):
    """Spark 4 defaults to ANSI on; coerce-error capture must use
    try_cast semantics, not rely on ansi-off silent-null casts."""
    original = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        bad = spark.createDataFrame([("1",), ("x",)], "v string")
        s = DataFrameSchema({"v": Column(T.IntegerType(), coerce=True)})
        r = s.validate_result(bad)
        errs = [
            e for e in r.errors
            if e.reason_code.value == "dtype_coercion_error"
        ]
        assert len(errs) == 1 and errs[0].failure_cases_count == 1
        assert DataFrameSchema(
            {"price": Column(T.IntegerType(), Check.gt(5))}
        ).validate_result(products).passed
    finally:
        spark.conf.set("spark.sql.ansi.enabled", original)


def test_is_monotonic_distributed_matches_inline(spark):
    import random

    rng = random.Random(3)
    rows = [(i, float(i if rng.random() > 0.15 else i - 10))
            for i in range(300)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "o int, v double").repartition(6)

    def violations(distributed):
        schema = DataFrameSchema(
            {"v": Column(T.DoubleType(),
                         Check.is_monotonic("o", distributed=distributed))}
        )
        res = schema.validate_result(df)
        if res.passed:
            return 0
        [err] = res.errors
        return err.failure_cases_count

    assert violations(True) == violations(False) > 0


def test_multiple_monotonic_checks_share_one_job(spark):
    """However many window-based monotonic checks a schema carries, they
    fold into ONE finalizer job (each contributes a when(viol) column to
    a single select+sum pass)."""
    df = spark.createDataFrame(
        [(i, float(i), float(100 - i), float(i if i != 25 else -1))
         for i in range(50)],
        "o int, a double, b double, c double",
    )
    one = DataFrameSchema(
        {"a": Column(T.DoubleType(), Check.is_monotonic("o"))}, name="m1"
    )
    three = DataFrameSchema(
        {
            "a": Column(T.DoubleType(), Check.is_monotonic("o")),
            "b": Column(
                T.DoubleType(), Check.is_monotonic("o", decreasing=True)
            ),
            "c": Column(T.DoubleType(), Check.is_monotonic("o")),
        },
        name="m3",
    )
    tracker = spark.sparkContext.statusTracker()

    def jobs_for(schema):
        schema.validate_result(df)  # warm
        # delta of MAX job id, not list length: getJobIdsForGroup is
        # bounded by spark.ui.retainedJobs (1000), so length deltas
        # corrupt once a long-lived session rolls the retention buffer
        before = max(tracker.getJobIdsForGroup(None) or [0])
        schema.validate_result(df)
        return max(tracker.getJobIdsForGroup(None) or [0]) - before

    j1, j3 = jobs_for(one), jobs_for(three)
    assert j3 == j1, (j1, j3)
    # and the folded job still reports each check independently
    res = three.validate_result(df)
    by_col = {o.column: o.passed for o in res.outcomes
              if o.check.startswith("is_monotonic")}
    assert by_col == {"a": True, "b": True, "c": False}


def test_unique_column_names(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int").toDF("a", "a")
    schema = DataFrameSchema(
        {"a": Column(T.IntegerType())}, unique_column_names=True, name="u"
    )
    res = schema.validate_result(df)
    assert any(
        "duplicate" in str(e).lower() or "unique" in str(e).lower()
        for e in res.errors
    )
    # without the flag: no crash (ambiguous references pre-empted), the
    # duplicated column's checks are skipped with a schema error
    schema2 = DataFrameSchema(
        {"a": Column(T.IntegerType(), checks=[Check.ge(0)])}, name="u2"
    )
    res2 = schema2.validate_result(df)
    assert any("ambiguous" in o.check for o in res2.outcomes if not o.passed)


def test_required_false_optional_column(spark):
    df = spark.createDataFrame([(1,)], "a int")
    schema = DataFrameSchema(
        {"a": Column(T.IntegerType()),
         "opt": Column(T.StringType(), required=False,
                       checks=[Check.str_length(1, 5)])},
        name="req",
    )
    res = schema.validate_result(df)
    assert not res.errors  # missing optional column is fine
    # but when present, its checks run
    df2 = spark.createDataFrame([(1, "toolongvalue")], "a int, opt string")
    res2 = schema.validate_result(df2)
    assert any("str_length" in o.check for o in res2.outcomes
               if o.column == "opt" and not o.passed)


def test_validate_head_and_sample_subset(spark):
    # 100 rows, violations only in the tail: head-validation sees none
    df = spark.range(0, 100).select(F.col("id").cast("int").alias("v"))
    schema = DataFrameSchema(
        {"v": Column(T.IntegerType(), checks=[Check.lt(50, error="l")])},
        name="sub",
    )
    full = schema.validate_result(df)
    assert sum(int(o.violations) for o in full.outcomes
               if o.check == "l") == 50
    head = schema.validate_result(df.orderBy("v"), head=10)
    assert sum(int(o.violations) for o in head.outcomes
               if o.check == "l") == 0
    samp = schema.validate_result(df, sample=0.5, random_state=7)
    got = sum(int(o.violations) for o in samp.outcomes if o.check == "l")
    assert 0 < got < 50  # a proper subset of the violations


def test_bench_isolates_query_failures(spark, tmp_path):
    """bench.py must record a broken query's error and keep timing the
    rest — r1's bench artifact was zeroed by one crashing query."""
    import bench

    qs = {
        "ok": lambda s, d: s.range(5),
        "boom": lambda s, d: (_ for _ in ()).throw(ValueError("injected")),
        "ok2": lambda s, d: s.range(3),
    }
    timings, run_counts, errors, canary = bench.run_queries(
        spark, qs, str(tmp_path), runs=1
    )
    assert set(timings) == {"ok", "ok2"}
    assert run_counts == {"ok": 1, "ok2": 1}
    assert list(errors) == ["boom"] and "injected" in errors["boom"]
    # the canary query is absent from this synthetic set: all three
    # probes must degrade to the -1 sentinel, never raise
    assert canary == [-1.0, -1.0, -1.0]
