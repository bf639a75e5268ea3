"""Streaming CDC state: append-only winners, tombstones, compaction."""

from pandera_spark.streaming.cdc import (
    cdc_upsert_foreach_batch,
    compact_cdc_state,
    read_cdc_state,
)


def _state(spark, path):
    out = read_cdc_state(
        spark, path, ["k"], "v", tiebreak=["p"], op_col="op"
    )
    return {r.k: (r.v, r.p) for r in out.collect()} if out is not None else None


def test_cdc_stream_upsert_delete_and_retry(spark, tmp_path):
    path = str(tmp_path / "state")
    proc = cdc_upsert_foreach_batch(path, ["k"], "v", tiebreak=["p"])

    assert _state(spark, path) is None  # no state yet

    b0 = spark.createDataFrame(
        [(1, 1, "a1", "U"), (1, 2, "a2", "U"), (2, 1, "b1", "U")],
        "k int, v int, p string, op string",
    )
    proc(b0, 0)
    assert _state(spark, path) == {1: (2, "a2"), 2: (1, "b1")}

    # batch 1: update key 2, delete key 1 (tombstone), insert key 3
    b1 = spark.createDataFrame(
        [(2, 2, "b2", "U"), (1, 3, "x", "D"), (3, 1, "c1", "U")],
        "k int, v int, p string, op string",
    )
    proc(b1, 1)
    assert _state(spark, path) == {2: (2, "b2"), 3: (1, "c1")}

    # at-least-once retry of batch 1: byte-identical append, same fold
    proc(b1, 1)
    assert _state(spark, path) == {2: (2, "b2"), 3: (1, "c1")}


def test_cdc_stream_compaction_preserves_state(spark, tmp_path):
    path = str(tmp_path / "state")
    proc = cdc_upsert_foreach_batch(path, ["k"], "v", tiebreak=["p"])
    for i in range(4):
        b = spark.createDataFrame(
            [(1, i, f"v{i}", "U"), (2, i, f"w{i}", "D" if i == 3 else "U")],
            "k int, v int, p string, op string",
        )
        proc(b, i)
    before = _state(spark, path)
    assert before == {1: (3, "v3")}  # key 2 tombstoned at v=3
    n = compact_cdc_state(
        spark, path, ["k"], "v", tiebreak=["p"], op_col="op"
    )
    assert n == 1  # one live row remains
    assert _state(spark, path) == before
    # state files shrank to the compacted fold
    raw = spark.read.parquet(path)
    assert raw.count() == 1


def test_cdc_stream_with_real_stream(spark, tmp_path):
    import time

    path = str(tmp_path / "state")
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "200").load()
        .selectExpr(
            "CAST(value % 5 AS INT) AS k",
            "CAST(value AS INT) AS v",
            "CAST(value AS STRING) AS p",
            "'U' AS op",
        )
    )
    q = (
        src.writeStream
        .foreachBatch(cdc_upsert_foreach_batch(path, ["k"], "v"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        state = None
        while time.time() < deadline:
            state = read_cdc_state(spark, path, ["k"], "v")
            if state is not None and state.count() >= 3:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert state is not None
    rows = {r.k: r.v for r in state.collect()}
    # latest v per key is the max observed value for that residue class
    for k, v in rows.items():
        assert v % 5 == k


def test_cdc_stream_null_op_rows_survive_compaction(spark, tmp_path):
    # delete-only feeds mark tombstones with op and leave op NULL on
    # upserts; compaction must keep the null-op (live) rows, matching
    # read_cdc_state's null-safe filter
    path = str(tmp_path / "state")
    proc = cdc_upsert_foreach_batch(path, ["k"], "v", op_col="op")
    b0 = spark.createDataFrame(
        [(1, 1, "a1", None), (2, 1, "b1", None), (3, 1, "c1", None)],
        "k int, v int, p string, op string",
    )
    proc(b0, 0)
    b1 = spark.createDataFrame(
        [(2, 2, "x", "D"), (1, 2, "a2", None)],
        "k int, v int, p string, op string",
    )
    proc(b1, 1)
    before = _state(spark, path)
    assert before == {1: (2, "a2"), 3: (1, "c1")}
    n = compact_cdc_state(
        spark, path, ["k"], "v", tiebreak=["p"], op_col="op"
    )
    assert n == 2  # both live null-op rows kept, tombstone dropped
    assert _state(spark, path) == before
    assert spark.read.parquet(path).count() == 2


def test_cdc_stream_writer_requires_declared_op_col(spark, tmp_path):
    import pytest

    path = str(tmp_path / "state")
    proc = cdc_upsert_foreach_batch(path, ["k"], "v", op_col="op")
    batch = spark.createDataFrame([(1, 1)], "k int, v int")
    with pytest.raises(ValueError, match="missing op column"):
        proc(batch, 0)
