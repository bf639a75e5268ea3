"""Spark 4 Python Data Source: the schema-driven synthetic source.

Covers SURVEY.md §2.J's scale path as a first-class ``format()`` source:
determinism under repartitioning (retry-safety at cluster scale), schema
conformance of generated rows, and the streaming micro-batch reader.
"""

import pyspark.sql.types as T
import pytest

from pandera_spark import Check, Column, DataFrameSchema
from pandera_spark import datasource as DS
from pandera_spark.io import schema_to_json


@pytest.fixture(scope="module")
def synth_schema():
    return DataFrameSchema(
        {
            "id": Column(T.LongType(), unique=True, checks=[Check.ge(0)]),
            "grade": Column(
                T.StringType(), checks=[Check.isin(["a", "b", "c"])]
            ),
            "score": Column(
                T.DoubleType(), checks=[Check.in_range(0.0, 1.0)]
            ),
            "when": Column(T.DateType(), nullable=True),
        },
        name="synth",
    )


def test_batch_read_conforms(spark, synth_schema):
    df = DS.read_synthetic(spark, synth_schema, 300, num_partitions=5)
    assert df.rdd.getNumPartitions() == 5
    assert [f.name for f in df.schema.fields] == [
        "id", "grade", "score", "when",
    ]
    res = synth_schema.validate_result(df)
    assert not res.errors
    assert df.count() == 300


def test_partition_invariant_and_deterministic(spark, synth_schema):
    a = sorted(
        map(tuple, DS.read_synthetic(spark, synth_schema, 200,
                                     num_partitions=7).collect())
    )
    b = sorted(
        map(tuple, DS.read_synthetic(spark, synth_schema, 200,
                                     num_partitions=2).collect())
    )
    assert a == b  # slicing must not change the value stream
    c = sorted(
        map(tuple, DS.read_synthetic(spark, synth_schema, 200, seed=43,
                                     num_partitions=2).collect())
    )
    assert a != c  # but the seed must
    assert len({r[0] for r in a}) == 200  # unique column is distinct


def test_missing_schema_option_raises(spark):
    DS.register(spark)
    with pytest.raises(Exception, match="schema"):
        spark.read.format("pandera_synth").option("rows", 5).load().collect()


def test_stream_reader_micro_batches(spark, synth_schema, tmp_path):
    q = (
        spark.readStream.format("pandera_synth")
        .option("schema", schema_to_json(synth_schema))
        .option("rowsPerBatch", 40)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("synth_stream_mem")
    assert got.count() >= 40
    # every emitted micro-batch row conforms to the generating schema
    res = synth_schema.validate_result(got)
    assert not res.errors


def test_stream_validate_with_synth_source(spark, tmp_path):
    """End-to-end: the synthetic stream feeds foreachBatch validation —
    a violation-free source yields clean per-batch reports, and an
    incompatible schema is caught on every micro-batch."""
    from pandera_spark import Check, Column, DataFrameSchema
    from pandera_spark.streaming import validate_stream

    gen = DataFrameSchema(
        {
            "id": Column(T.LongType(), unique=True, checks=[Check.ge(0)]),
            "score": Column(T.DoubleType(),
                            checks=[Check.in_range(0.0, 1.0)]),
        },
        name="gen",
    )
    # stricter than the generator: scores above 0.5 are violations
    strict = DataFrameSchema(
        {"score": Column(T.DoubleType(), checks=[Check.le(0.5, error="le_half")])},
        name="strict",
    )
    reports: list[tuple[int, dict]] = []
    stream = (
        spark.readStream.format("pandera_synth")
        .option("schema", schema_to_json(gen))
        .option("rowsPerBatch", 80)
        .load()
    )
    q = (
        validate_stream(stream, strict, on_report=lambda b, r:
                        reports.append((b, r)))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert reports, "no micro-batch report arrived"
    data_errors = [r for _, r in reports if r.get("DATA")]
    assert data_errors, f"expected le_half violations, got {reports!r}"
