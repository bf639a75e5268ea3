"""Differential pins for the generated-SQL check-compile lane
(OPTIMIZATION r11): for every supported builtin,
``F.expr(check.violation_condition_sql(col))`` must return exactly the
rows ``check.violation_condition(F.col(col))`` returns — including null
handling, float literal bits, regex anchoring and string escaping — and
every unsupported shape must return None (Column-lane fallback)."""

import datetime

import pytest
from pyspark.sql import functions as F

from pandera_spark.checks import Check


# fast contract-relevant lane: `pytest -m smoke` (see pytest.ini)
pytestmark = pytest.mark.smoke


@pytest.fixture
def edge_df(spark):
    # depends on the parametrized ``spark`` fixture so every
    # differential case runs in BOTH ANSI lanes
    rows = [
        (1, 0.08, "A"),
        (7, 1e-300, "O'Reilly"),
        (-5, -0.0, "back\\slash"),
        (None, None, None),
        (2 ** 40, float("nan"), ""),
        (0, 1.7976931348623157e308, "tab\there"),
        (50, 50.0, "new\nline"),
        (8, float("inf"), "héllo✓"),
        (3, -1.5e-5, "A"),
    ]
    return spark.createDataFrame(rows, "i long, d double, s string")


SUPPORTED = [
    ("i", Check.equal_to(7)),
    ("d", Check.equal_to(0.08)),
    ("s", Check.equal_to("O'Reilly")),
    ("s", Check.equal_to("back\\slash")),
    ("i", Check.not_equal_to(0)),
    ("d", Check.not_equal_to(-0.0)),
    ("i", Check.gt(0)),
    ("i", Check.ge(-5)),
    ("d", Check.lt(1e-5)),
    ("d", Check.le(-1.5e-5)),
    ("i", Check.in_range(1, 7)),
    ("d", Check.in_range(0.0, 0.08)),
    ("d", Check.in_range(0.0, 50.0, include_min=False)),
    ("i", Check.in_range(1, 50, include_max=False)),
    ("i", Check.between(0, 2 ** 40)),
    ("s", Check.isin(["A", "O'Reilly", "héllo✓"])),
    ("i", Check.isin([1, 7, -5])),
    ("s", Check.notin(["", "back\\slash"])),
    ("s", Check.str_matches(r"[A-Z]$")),
    ("s", Check.str_matches(r"^O'R\w+")),
    ("s", Check.str_contains(r"\\")),
    ("s", Check.str_startswith("O'")),
    ("s", Check.str_endswith("slash")),
    ("s", Check.str_length(1)),
    ("s", Check.str_length(1, 8)),
    ("s", Check.str_length(min_value=2)),
    ("s", Check.str_length(max_value=4)),
]


@pytest.mark.parametrize(
    "colname,chk",
    SUPPORTED,
    ids=[f"{c}-{chk.name}-{i}" for i, (c, chk) in enumerate(SUPPORTED)],
)
def test_sql_lane_matches_column_lane(edge_df, colname, chk):
    sql = chk.violation_condition_sql(colname)
    assert sql is not None, f"expected SQL lane for {chk.name}"
    both = edge_df.select(
        chk.violation_condition(F.col(colname)).alias("col_lane"),
        F.expr(sql).alias("sql_lane"),
    ).collect()
    for r in both:
        assert r["col_lane"] == r["sql_lane"], (chk.error, sql, r)


def test_sql_lane_ignore_na_false(edge_df):
    chk = Check.gt(0, ignore_na=False)
    sql = chk.violation_condition_sql("i")
    assert sql is not None
    both = edge_df.select(
        chk.violation_condition(F.col("i")).alias("a"),
        F.expr(sql).alias("b"),
    ).collect()
    for r in both:
        assert r["a"] == r["b"]


def test_unsupported_shapes_fall_back():
    # datetime literals: rendering is timezone-sensitive — Column lane
    dt = Check.in_range(
        datetime.datetime(1995, 1, 1), datetime.datetime(1998, 12, 31)
    )
    assert dt.violation_condition_sql("ts") is None
    # non-finite float literal
    assert Check.gt(float("inf")).violation_condition_sql("d") is None
    # custom predicate
    custom = Check(lambda c: c > 0, name="my_check", error="my_check")
    assert custom.violation_condition_sql("i") is None
    # hand-built check wearing a builtin name but a different fn
    fake = Check(
        lambda c: c < 0, name="greater_than", error="fake",
        statistics={"min_value": 0},
    )
    assert fake.violation_condition_sql("i") is None
    # isin containing a None (Column lane semantics are subtle there)
    assert Check.isin(["A", None]).violation_condition_sql("s") is None
    # int outside long range
    assert Check.gt(2 ** 70).violation_condition_sql("i") is None


def test_escaped_string_literals_conf_falls_back(spark):
    """With spark.sql.parser.escapedStringLiterals=true the parser reads
    backslash escapes literally — the lane must refuse any literal that
    needed escaping (and keep serving escape-free ones)."""
    chk_bs = Check.str_matches(r"\w+")
    chk_plain = Check.gt(0)
    assert chk_bs.violation_condition_sql("s") is not None
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        assert chk_bs.violation_condition_sql("s") is None
        assert chk_plain.violation_condition_sql("i") is not None
    finally:
        spark.conf.set(
            "spark.sql.parser.escapedStringLiterals", "false"
        )
    assert chk_bs.violation_condition_sql("s") is not None


def test_runner_uses_sql_lane_and_reports_match(spark):
    """End-to-end: a validate over builtin checks produces the same
    report whether or not the SQL lane is available."""
    from pandera_spark import Column, DataFrameSchema

    df = spark.createDataFrame(
        [(1, "A"), (0, "bb"), (60, None), (None, "C")],
        "k long, s string",
    )
    schema = DataFrameSchema(
        {
            "k": Column(
                "bigint",
                [Check.gt(0), Check.in_range(1, 50)],
                nullable=True,
            ),
            "s": Column(
                "string",
                [Check.str_length(1), Check.isin(["A", "C"])],
                nullable=True,
            ),
        },
        name="sql_lane_probe",
    )
    out = schema.validate(df, lazy=True)
    res = out.pandera.result
    by_label = {
        (o.column, o.check): o.violations
        for o in res.outcomes
        if o.check in ("greater_than(0)", "in_range(1, 50)",
                       "str_length(1)", "isin(['A', 'C'])")
    }
    assert by_label[("k", "greater_than(0)")] == 1      # 0
    assert by_label[("k", "in_range(1, 50)")] == 2      # 0 and 60
    assert by_label[("s", "str_length(1)")] == 1        # "bb"
    assert by_label[("s", "isin(['A', 'C'])")] == 1     # "bb"
