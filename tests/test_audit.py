"""Plan auditing library surface (pandera_spark/audit.py)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pandera_spark.audit import (
    assert_plan,
    physical_plan,
    plan_report,
    recommended_conf,
    unpartitioned_windows,
)


def _df(spark, n=100):
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 7).alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def test_plan_report_clean_aggregate(spark):
    rep = plan_report(_df(spark).groupBy("k").agg(F.sum("v")))
    assert rep["cartesian_products"] == 0
    assert rep["broadcast_nested_loop_joins"] == 0
    assert rep["exchanges"] >= 1
    assert rep["unpartitioned_windows"] == []


def test_codegen_spans_visible_without_aqe(spark):
    # AQE inserts codegen per stage at execution, so the count is only
    # populated on non-adaptive plans (documented in plan_report)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        rep = plan_report(_df(spark).groupBy("k").agg(F.sum("v")))
        assert rep["wholestage_codegen_spans"] >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_plan_report_flags_cartesian(spark):
    a, b = _df(spark, 10), _df(spark, 10)
    rep = plan_report(a.crossJoin(b.select(F.col("id").alias("id2"))))
    assert (
        rep["cartesian_products"] + rep["broadcast_nested_loop_joins"]
    ) >= 1
    with pytest.raises(AssertionError, match="plan audit failed"):
        assert_plan(a.crossJoin(b.select(F.col("id").alias("id2"))))


def test_unpartitioned_window_detection(spark):
    df = _df(spark)
    bad = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert plan_report(bad)["unpartitioned_windows"]
    assert not plan_report(good)["unpartitioned_windows"]
    with pytest.raises(AssertionError, match="un-partitioned"):
        assert_plan(bad, no_unpartitioned_window=True)
    assert_plan(good, no_unpartitioned_window=True)


def test_paren_nested_sort_keys_still_detected(spark):
    # regression guard for the comma-split bug (ADVICE r5): a nested
    # function call in the sort key must not hide the missing partition
    df = _df(spark)
    bad = df.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.coalesce(F.col("id"), F.lit(0)), F.col("v"))
        ),
    )
    assert plan_report(bad)["unpartitioned_windows"]


def test_pushed_filter_assertion(spark, tmp_path):
    path = str(tmp_path / "t")
    _df(spark).write.parquet(path)
    t = spark.read.parquet(path)
    assert_plan(
        t.where(F.col("k") == 3), require_pushed_filter=["k"]
    )
    with pytest.raises(AssertionError, match="no pushed filter"):
        # cast around the column defeats pushdown
        assert_plan(
            t.where(F.col("k").cast("string") == "3"),
            require_pushed_filter=["k"],
        )


def test_max_exchanges_bound(spark):
    df = _df(spark).groupBy("k").agg(F.sum("v"))
    with pytest.raises(AssertionError, match="shuffles"):
        assert_plan(df, max_exchanges=0)
    assert_plan(df, max_exchanges=4)


def test_recommended_conf_arithmetic(spark):
    conf = recommended_conf(
        input_bytes=100 * (1 << 40), total_cores=8000,
        executor_memory_gb=32,
    )
    # 100 TiB / 128 MiB = 819200 partitions >> 2x cores
    assert int(conf["spark.sql.shuffle.partitions"]) == 819200
    assert conf["spark.sql.adaptive.enabled"] == "true"
    bcast = int(conf["spark.sql.autoBroadcastJoinThreshold"])
    assert bcast == 256 * (1 << 20)  # capped
    small = recommended_conf(input_bytes=1 << 30, total_cores=32)
    assert int(small["spark.sql.shuffle.partitions"]) == 64
    with pytest.raises(ValueError):
        recommended_conf(input_bytes=-1, total_cores=1)


def test_exchanges_not_double_counted_under_aqe(spark):
    # an executed AQE plan carries AQEShuffleRead readers on top of each
    # Exchange; the shuffle count must stay 1 per shuffle, not 2
    df = _df(spark).groupBy("k").agg(F.sum("v").alias("s"))
    df.collect()  # finalize the adaptive plan
    raw = physical_plan(df, formatted=False)
    rep = plan_report(df)
    n_exchange = raw.count("Exchange hashpartitioning")
    assert n_exchange >= 1
    assert rep["exchanges"] == n_exchange
    if "AQEShuffleRead" in raw:
        assert rep["exchanges"] < n_exchange + raw.count("AQEShuffleRead")
