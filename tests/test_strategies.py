"""Data synthesis + groupby/element-wise check tests (SURVEY §2.J, §2.D
options; reference tests/strategies/test_strategies.py round-trip model:
generate from schema -> validate with same schema)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import pandera_spark as ps
from pandera_spark import Check, Column, DataFrameSchema
from pandera_spark.strategies import (
    ConstraintConflictError,
    FieldConstraints,
    column_constraints,
)


@pytest.fixture(scope="module")
def rich_schema():
    return DataFrameSchema(
        {
            "id": Column(T.LongType(), Check.gt(0), nullable=False, unique=True),
            "qty": Column(T.IntegerType(), Check.in_range(1, 50)),
            "price": Column(T.DoubleType(), [Check.ge(0.5), Check.lt(1000.0)]),
            "flag": Column(T.StringType(), Check.isin(["A", "N", "R"])),
            "name": Column(
                T.StringType(),
                [Check.str_startswith("SKU-"), Check.str_length(5, 20)],
            ),
            "ts": Column(
                T.TimestampType(),
                Check.in_range(
                    __import__("datetime").datetime(2020, 1, 1),
                    __import__("datetime").datetime(2021, 1, 1),
                ),
            ),
            "ok": Column(T.BooleanType()),
        },
        name="rich",
        unique=["id"],
    )


def test_example_roundtrip(spark, rich_schema):
    df = rich_schema.example(spark, size=25, seed=7)
    assert df.count() == 25
    result = rich_schema.validate_result(df)
    assert result.passed, [e.message for e in result.errors]


def test_synthesize_roundtrip(spark, rich_schema):
    df = rich_schema.synthesize(spark, rows=10000, seed=3)
    result = rich_schema.validate_result(df)
    assert result.passed, [e.message for e in result.errors]
    assert result.total_rows == 10000


def test_synthesize_is_distributed(spark, rich_schema):
    # the generator is spark.range-based: no driver-side rows
    df = rich_schema.synthesize(spark, rows=1000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Range" in plan
    assert "Scan ExistingRDD" not in plan


def test_constraint_merge_narrows():
    fc = FieldConstraints()
    fc.add_check(Check.ge(0))
    fc.add_check(Check.gt(5))
    fc.add_check(Check.le(100))
    assert fc.min_value == 5 and fc.min_exclusive
    assert fc.max_value == 100 and not fc.max_exclusive


def test_constraint_conflicts():
    fc = FieldConstraints()
    fc.add_check(Check.ge(10))
    with pytest.raises(ConstraintConflictError):
        fc.add_check(Check.le(5))

    fc2 = FieldConstraints()
    fc2.add_check(Check.isin([1, 2]))
    with pytest.raises(ConstraintConflictError):
        fc2.add_check(Check.isin([3, 4]))


def test_column_constraints_from_checks():
    col = Column(T.IntegerType(), [Check.in_range(1, 7), Check.ne(4)])
    fc = column_constraints(col)
    assert fc.min_value == 1 and fc.max_value == 7
    assert 4 in fc.notin


def test_groupby_check(spark):
    df = spark.createDataFrame(
        [(8.1, "A"), (7.0, "A"), (5.2, "B"), (5.1, "B")],
        "height double, grp string",
    )
    schema = DataFrameSchema(
        {
            "height": Column(
                T.DoubleType(),
                Check(
                    lambda groups: groups["A"].mean() > groups["B"].mean(),
                    groupby="grp",
                    name="mean_A_gt_B",
                    error="mean_A_gt_B",
                ),
            )
        }
    )
    assert schema.validate_result(df).passed

    schema_bad = DataFrameSchema(
        {
            "height": Column(
                T.DoubleType(),
                Check(
                    lambda groups: groups["B"].mean() > groups["A"].mean(),
                    groupby="grp",
                    name="mean_B_gt_A",
                    error="mean_B_gt_A",
                ),
            )
        }
    )
    result = schema_bad.validate_result(df)
    assert not result.passed


def test_element_wise_python_check(spark):
    df = spark.createDataFrame([(3,), (10,), (None,)], "v int")
    schema = DataFrameSchema(
        {
            "v": Column(
                T.IntegerType(),
                Check(
                    lambda x: x % 3 == 0,
                    element_wise=True,
                    name="div3",
                    error="div3",
                ),
            )
        }
    )
    result = schema.validate_result(df)
    [err] = result.errors
    assert err.failure_cases_count == 1  # only 10; null ignored


def test_property_roundtrip_random_bounds(spark):
    """Property-based round-trip (reference tests/strategies/
    test_strategies.py:128,148,212 pattern): for random constraint
    bounds, data generated from the schema validates clean against the
    same schema."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pandera_spark import Check, Column, DataFrameSchema

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        lo=st.integers(min_value=-1000, max_value=0),
        span=st.integers(min_value=1, max_value=1000),
        strlen=st.integers(min_value=1, max_value=20),
    )
    def run(lo, span, strlen):
        schema = DataFrameSchema(
            {
                "n": Column(
                    T.LongType(), Check.in_range(lo, lo + span),
                    nullable=False,
                ),
                "s": Column(T.StringType(), Check.str_length(1, strlen)),
            },
            name="prop",
        )
        df = schema.example(spark, size=7, seed=lo + span)
        res = schema.validate_result(df)
        assert not res.errors, res.report

    run()


def test_example_and_synthesize_array_columns(spark):
    from pyspark.sql import types as T

    from pandera_spark import Check, Column, DataFrameSchema
    from pandera_spark.strategies import example, synthesize

    schema = DataFrameSchema(
        {
            "vec": Column(
                T.ArrayType(T.DoubleType()),
                checks=[
                    Check.array_size(5),
                    Check.array_forall_in_range(-1.0, 1.0),
                    Check.array_no_nulls(),
                    Check.array_finite(),
                ],
                nullable=False,
            ),
            "tag": Column(T.StringType()),
        },
        name="vecs",
    )
    ex = example(schema, spark, size=4)
    assert not schema.validate_result(ex).errors
    syn = synthesize(schema, spark, rows=50)
    assert syn.count() == 50
    assert not schema.validate_result(syn).errors
    # deterministic: same seed -> same data
    a = synthesize(schema, spark, rows=5).collect()
    b = synthesize(schema, spark, rows=5).collect()
    assert a == b
