"""Incremental re-validation: new-files-only scans + state merge."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandera_spark import Check, Column, DataFrameSchema
from pandera_spark.incremental import (
    incremental_report,
    list_data_files,
    seen_files,
    validate_new_files,
)


@pytest.fixture
def schema():
    return DataFrameSchema(
        {
            "v": Column(T.LongType(), Check.ge(0), nullable=False),
            "s": Column(T.StringType(), Check.str_length(1, 10)),
        },
        strict=False,
    )


def _write(spark, path, rows, nparts=2, mode="overwrite"):
    spark.createDataFrame(rows, "v long, s string").repartition(
        nparts
    ).write.mode(mode).parquet(path)


def test_incremental_validates_only_new_files(spark, tmp_path, schema):
    data = str(tmp_path / "data")
    state = str(tmp_path / "state")
    _write(spark, data, [(1, "a"), (-2, "b"), (3, None)], nparts=2)

    s1 = validate_new_files(schema, spark, data, state)
    assert s1["n_new"] == s1["n_files"] >= 2 and s1["n_seen"] == 0
    # idempotent second run: metadata only, nothing new
    s2 = validate_new_files(schema, spark, data, state)
    assert s2["n_new"] == 0 and s2["n_seen"] == s1["n_files"]

    rep = {
        (r.col_name, r.check): r.violations
        for r in incremental_report(spark, state).collect()
    }
    assert rep[("v", "greater_than_or_equal_to(0)")] == 1
    assert rep[("v", "not_nullable")] == 0
    total_rows = {
        r.n_rows
        for r in incremental_report(spark, state).collect()
    }
    assert total_rows == {3}

    # a new file arrives: only IT is validated
    _write(spark, data, [(-5, "x")], nparts=1, mode="append")
    s3 = validate_new_files(schema, spark, data, state)
    assert s3["n_new"] == 1 and s3["n_seen"] == s1["n_files"]
    rep2 = {
        (r.col_name, r.check): r.violations
        for r in incremental_report(spark, state).collect()
    }
    assert rep2[("v", "greater_than_or_equal_to(0)")] == 2

    # report reconciles with a one-shot full validation
    full = schema.validate_result(spark.read.parquet(data))
    ge_err = [
        e for e in full.errors
        if "greater_than_or_equal" in (e.check or "")
    ]
    assert ge_err and ge_err[0].failure_cases_count == 2


def test_incremental_retried_append_collapses(spark, tmp_path, schema):
    data = str(tmp_path / "data")
    state = str(tmp_path / "state")
    _write(spark, data, [(-1, "a")], nparts=1)
    validate_new_files(schema, spark, data, state)
    # simulate a retried (duplicate) append of the same counters
    dup = spark.read.parquet(state)
    dup.write.mode("append").parquet(state)
    rep = {
        (r.col_name, r.check): (r.violations, r.n_rows)
        for r in incremental_report(spark, state).collect()
    }
    assert rep[("v", "greater_than_or_equal_to(0)")] == (1, 1)


def test_incremental_helpers(spark, tmp_path, schema):
    data = str(tmp_path / "data")
    state = str(tmp_path / "state")
    _write(spark, data, [(1, "a")], nparts=1)
    assert seen_files(spark, state) == set()  # no state yet
    files = list_data_files(spark, data)
    assert len(files) == 1 and files[0].endswith(".parquet")
    validate_new_files(schema, spark, data, state, run_id="r1")
    assert seen_files(spark, state) == set(files)
    assert {r.run_id for r in spark.read.parquet(state).collect()} == {"r1"}


def test_streaming_quality_ledger(spark, tmp_path, schema):
    """Two micro-batches append batch-keyed counters; the report sums
    them; a replayed batch collapses on read."""
    import json

    from pandera_spark.incremental import (
        incremental_report,
        quality_ledger_foreach_batch,
    )

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text("\n".join(
        json.dumps({"v": v, "s": s}) for v, s in [(1, "a"), (-2, "b")]
    ))
    (src / "b.json").write_text("\n".join(
        json.dumps({"v": v, "s": s}) for v, s in [(-3, "c")]
    ))
    state = str(tmp_path / "ledger")
    fn = quality_ledger_foreach_batch(schema, state)
    stream = spark.readStream.schema("v long, s string").option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    q = stream.writeStream.foreachBatch(fn).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    rep = {
        (r.col_name, r.check): (r.violations, r.n_rows)
        for r in incremental_report(spark, state).collect()
    }
    assert rep[("v", "greater_than_or_equal_to(0)")] == (2, 3)
    files = {r.file for r in spark.read.parquet(state).collect()}
    assert files == {"batch:0", "batch:1"}
    # at-least-once retry: replay batch 1's counters verbatim
    batch1 = spark.read.parquet(state).where(F.col("file") == "batch:1")
    batch1.write.mode("append").parquet(state)
    rep2 = {
        (r.col_name, r.check): (r.violations, r.n_rows)
        for r in incremental_report(spark, state).collect()
    }
    assert rep2 == rep


def test_validate_sample_statistics(spark, schema):
    """Deterministic membership, exact sample counters, and a Wilson
    interval that covers the true rate."""
    from pandera_spark.inference import validate_sample

    df = spark.createDataFrame(
        [(i, "x" if i % 4 else None) for i in range(2000)]
        + [(-j, "y") for j in range(1, 201)],  # 200 negative violations
        "v long, s string",
    )
    rep = {
        (r.col_name, r.check): r
        for r in validate_sample(
            schema, df, ["v"], fraction=0.5
        ).collect()
    }
    ge = rep[("v", "greater_than_or_equal_to(0)")]
    # ~half the rows sampled (hash uniformity), rate near 200/2200
    assert 800 < ge.sample_rows < 1400
    true_rate = 200 / 2200
    assert ge.ci_lo <= true_rate <= ge.ci_hi
    assert 0.0 <= ge.ci_lo < ge.ci_hi <= 1.0
    assert ge.rate == pytest.approx(ge.violations / ge.sample_rows)
    # determinism: identical membership across runs
    rep2 = validate_sample(schema, df, ["v"], fraction=0.5).collect()
    assert sorted((r.col_name, r.check, r.violations) for r in rep2) == \
        sorted((k[0], k[1], v.violations) for k, v in rep.items())
    with pytest.raises(ValueError):
        validate_sample(schema, df, ["v"], fraction=0.0)


def test_validate_sample_files(spark, tmp_path, schema):
    from pandera_spark.incremental import (
        list_data_files,
        validate_sample_files,
    )

    data = str(tmp_path / "data")
    # 20 files so a 0.5 hash-fraction picks a real subset
    _write(spark, data,
           [(i if i % 7 else -i, "a") for i in range(1, 400)], nparts=20)
    rep = {
        (r.col_name, r.check): r
        for r in validate_sample_files(
            schema, spark, data, file_fraction=0.5
        ).collect()
    }
    ge = rep[("v", "greater_than_or_equal_to(0)")]
    n_files = len(list_data_files(spark, data))
    assert n_files == 20
    assert 0 < ge.sample_rows < 399  # a strict subset of the rows
    assert ge.ci_lo <= ge.rate <= ge.ci_hi
    # deterministic across calls
    rep2 = validate_sample_files(
        schema, spark, data, file_fraction=0.5
    ).collect()
    assert {(r.col_name, r.check, r.violations, r.sample_rows)
            for r in rep2} == {
        (k[0], k[1], v.violations, v.sample_rows) for k, v in rep.items()
    }
    # degenerate fraction still validates at least one file
    tiny = validate_sample_files(
        schema, spark, data, file_fraction=1e-9
    ).collect()
    assert all(r.sample_rows > 0 for r in tiny)
    with pytest.raises(ValueError):
        validate_sample_files(schema, spark, data, file_fraction=0)


def test_validate_sample_by_segment(spark, schema):
    from pandera_spark.inference import validate_sample

    df = spark.createDataFrame(
        [(i, "good") for i in range(500)]
        + [(-i, "bad") for i in range(1, 501)],
        "v long, s string",
    )
    seg = {
        (r.s, r.col_name, r.check): r
        for r in validate_sample(
            schema, df, ["v"], fraction=1.0, by=["s"]
        ).collect()
    }
    good = seg[("good", "v", "greater_than_or_equal_to(0)")]
    bad = seg[("bad", "v", "greater_than_or_equal_to(0)")]
    assert good.violations == 0 and good.rate == 0.0
    assert bad.violations == bad.sample_rows == 500
    assert bad.rate == 1.0 and bad.ci_hi == 1.0
    # segment rows partition the sample
    assert good.sample_rows + bad.sample_rows == 1000
