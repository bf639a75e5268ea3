"""Spark Connect compatibility lane.

The reference runs its whole pyspark suite against classic AND Connect
sessions (reference tests/pyspark/conftest.py:26-64 spins up both fixtures).
This container ships no grpcio, so the lane is skip-marked — the tests are
real and run anywhere `pip install "pyspark[connect]"` has been done, which
is exactly how the gap stays visible instead of silent.

Engine code paths with Connect-specific guards that this lane exercises:
``_shipping.ensure_package_on_executors`` (addArtifacts vs addPyFile),
``operators/dedup._ensure_parallelism`` (no ``sparkContext`` on Connect).
"""

from __future__ import annotations

import pytest

try:
    import grpc  # noqa: F401 - presence gates the whole lane

    HAS_CONNECT = True
except ImportError:
    HAS_CONNECT = False

pytestmark = pytest.mark.skipif(
    not HAS_CONNECT,
    reason="grpcio not installed - Spark Connect lane unavailable "
    "(install pyspark[connect] to run)",
)


@pytest.fixture(scope="module")
def connect_spark():
    from pyspark.sql import SparkSession

    # remote("local[4]") auto-starts an in-process Connect server
    spark = (
        SparkSession.builder.remote("local[4]")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_connect_validation_report(connect_spark):
    from pyspark.sql import functions as F

    from pandera_spark import Check, Column, DataFrameSchema

    df = connect_spark.range(100).select(
        F.col("id").alias("v"), (F.col("id") % 5).alias("g")
    )
    schema = DataFrameSchema(
        {"v": Column(checks=[Check.lt(90, error="lt90")], nullable=False)},
        name="connect_basic",
    )
    res = schema.validate_result(df)
    out = {o.check: int(o.violations) for o in res.outcomes}
    assert out["lt90"] == 10


def test_connect_exact_dedup(connect_spark):
    from pyspark.sql import functions as F

    from pandera_spark.operators.dedup import exact_dedup

    df = connect_spark.range(50).select(
        F.col("id").alias("doc_id"), (F.col("id") % 10).alias("text")
    )
    out = exact_dedup(df, ["text"])
    assert out.count() == 10


def test_connect_asof_join(connect_spark):
    from pyspark.sql import functions as F

    from pandera_spark.operators.temporal import asof_join

    ev = connect_spark.range(20).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        (F.col("id") % 2).alias("user"),
    )
    out = asof_join(
        ev, ev.select("user", "ts", F.col("k").alias("rk")),
        on="ts", by=["user"], right_cols=["rk"],
    )
    assert out.count() == 20


def test_connect_yaml_roundtrip(connect_spark):
    from pandera_spark import Check, Column, DataFrameSchema
    from pandera_spark.io import schema_from_yaml, schema_to_yaml

    schema = DataFrameSchema(
        {"x": Column(checks=[Check.in_range(0, 10)], nullable=False)},
        name="rt",
    )
    assert schema_from_yaml(schema_to_yaml(schema)).columns.keys() == (
        schema.columns.keys()
    )
