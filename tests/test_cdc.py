"""CDC reconstruction: latest_state / merge_upsert / apply_cdc."""

import pytest

from pandera_spark.operators.cdc import apply_cdc, latest_state, merge_upsert


def _log(spark):
    # (key, version, payload) changelog with multiple versions per key
    return spark.createDataFrame(
        [
            (1, 1, "a1"),
            (1, 3, "a3"),
            (1, 2, "a2"),
            (2, 1, "b1"),
            (3, 1, "c1"),
            (3, 1, "c1-dup"),  # version tie -> tiebreak column decides
        ],
        "k int, v int, payload string",
    )


def test_latest_state_picks_max_version(spark):
    out = latest_state(_log(spark), ["k"], "v", tiebreak=["payload"])
    rows = {r.k: (r.v, r.payload) for r in out.collect()}
    assert rows == {1: (3, "a3"), 2: (1, "b1"), 3: (1, "c1-dup")}


def test_latest_state_drops_null_order_rows(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, 5, "y")], "k int, v int, payload string"
    )
    rows = {r.k for r in latest_state(df, ["k"], "v").collect()}
    assert rows == {2}  # key 1 has no rankable row


def test_latest_state_schema_preserved(spark):
    out = latest_state(_log(spark), ["k"], "v", tiebreak=["payload"])
    assert out.columns == ["k", "v", "payload"]


def test_latest_state_is_partial_aggregate_no_window(spark):
    plan = latest_state(
        _log(spark), ["k"], "v", tiebreak=["payload"]
    )._jdf.queryExecution().executedPlan().toString()
    # the scale contract: NO window function (a window shuffles every
    # historical row); instead an aggregate whose map-side partial
    # (partial_max_by) sends one candidate per key per task
    assert "Window" not in plan
    assert "partial_max_by" in plan
    assert plan.count("Exchange") == 1  # winners only, one shuffle


def test_merge_upsert_changes_win_ties_via_order(spark):
    base = spark.createDataFrame(
        [(1, 1, "old"), (2, 1, "keep")], "k int, v int, payload string"
    )
    changes = spark.createDataFrame(
        [(1, 2, "new"), (3, 1, "ins")], "k int, v int, payload string"
    )
    out = merge_upsert(base, changes, ["k"], "v")
    rows = {r.k: r.payload for r in out.collect()}
    assert rows == {1: "new", 2: "keep", 3: "ins"}


def test_merge_upsert_rejects_schema_mismatch(spark):
    base = spark.createDataFrame([(1, 1)], "k int, v int")
    changes = spark.createDataFrame([(1, 1, "x")], "k int, v int, p string")
    with pytest.raises(ValueError, match="schemas differ"):
        merge_upsert(base, changes, ["k"], "v")


def test_apply_cdc_insert_update_delete(spark):
    base = spark.createDataFrame(
        [(1, 0, "b1"), (2, 0, "b2"), (4, 0, "b4")],
        "k int, v int, payload string",
    )
    changes = spark.createDataFrame(
        [
            (1, 1, "u1", "U"),   # update key 1
            (2, 1, "x", "D"),    # delete key 2
            (3, 1, "i3", "I"),   # insert key 3
            (4, 1, "u4a", "U"),  # update then delete: latest op wins
            (4, 2, "x", "D"),
        ],
        "k int, v int, payload string, op string",
    )
    out = apply_cdc(base, changes, ["k"], "v")
    rows = {r.k: r.payload for r in out.collect()}
    assert rows == {1: "u1", 3: "i3"}
    assert out.columns == ["k", "v", "payload"]


def test_apply_cdc_change_beats_base_on_equal_version(spark):
    # same version in base and changes: the change's __src tiebreak wins
    base = spark.createDataFrame([(1, 1, "old")], "k int, v int, p string")
    changes = spark.createDataFrame(
        [(1, 1, "new", "U")], "k int, v int, p string, op string"
    )
    out = apply_cdc(base, changes, ["k"], "v")
    assert out.collect()[0].p == "new"


def test_apply_cdc_stale_delete_loses_to_newer_base(spark):
    # base already has v=5; a delete at v=1 is stale and must NOT win
    base = spark.createDataFrame([(1, 5, "keep")], "k int, v int, p string")
    changes = spark.createDataFrame(
        [(1, 1, "x", "D")], "k int, v int, p string, op string"
    )
    rows = {r.k: r.p for r in apply_cdc(base, changes, ["k"], "v").collect()}
    assert rows == {1: "keep"}


def test_apply_cdc_requires_op_column(spark):
    base = spark.createDataFrame([(1, 1)], "k int, v int")
    changes = spark.createDataFrame([(1, 1)], "k int, v int")
    with pytest.raises(ValueError, match="op column"):
        apply_cdc(base, changes, ["k"], "v")


def test_merge_upsert_change_wins_exact_order_tie(spark):
    # SCD-1: a change reusing the base row's version is an update and
    # must win deterministically (source precedence, as in apply_cdc)
    base = spark.createDataFrame(
        [(1, 5, "stale")], "k int, v int, payload string"
    )
    changes = spark.createDataFrame(
        [(1, 5, "fresh")], "k int, v int, payload string"
    )
    out = merge_upsert(base, changes, ["k"], "v")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].payload == "fresh"
    assert out.columns == ["k", "v", "payload"]  # __src dropped
