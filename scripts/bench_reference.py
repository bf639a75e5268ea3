"""Head-to-head: reference pandera pyspark backend vs pandera_spark.

Runs the BASELINE.md workload (lineitem validation: dtype checks on every
column, nullable checks, 15 value checks, joint unique) on BOTH engines in
the same Spark session and reports wall time + Spark job count per
validate.  The reference backend launches one action per check
(``/root/reference/pandera/backends/pyspark/builtin_checks.py:49``); ours
compiles everything into one aggregated pass.

The reference tree is imported read-only via shims for its generated
``_version`` module and the absent ``typeguard`` dependency (stubs affect
only type-annotation checking, not validation semantics).

Usage: python scripts/bench_reference.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import enum
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

# --- shims so the read-only reference imports without its build artifacts ---
_v = types.ModuleType("pandera._version")
_v.__version__ = _v.version = "0.0.0"
_v.__version_tuple__ = _v.version_tuple = (0, 0, 0)
sys.modules["pandera._version"] = _v

_tg = types.ModuleType("typeguard")


class _TypeCheckError(TypeError):
    pass


class _CollectionCheckStrategy(enum.Enum):
    ALL_ITEMS = "ALL_ITEMS"
    FIRST_ITEM = "FIRST_ITEM"


_tg.TypeCheckError = _TypeCheckError
_tg.CollectionCheckStrategy = _CollectionCheckStrategy
_tg.check_type = lambda value, expected_type=None, **kw: value
_tg.__version__ = "4.0.0"
sys.modules["typeguard"] = _tg
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def _spark() -> SparkSession:
    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("bench_reference")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _job_count(sc) -> int:
    return len(sc.statusTracker().getJobIdsForGroup(None) or [])


def build_reference_schema():
    import pandera.pyspark as pa

    c = pa.Check
    return pa.DataFrameSchema(
        {
            "l_orderkey": pa.Column(T.LongType(), [c.gt(0)], nullable=False),
            "l_partkey": pa.Column(T.LongType(), [c.ge(1)], nullable=False),
            "l_suppkey": pa.Column(T.LongType(), [c.ge(1)], nullable=False),
            "l_linenumber": pa.Column(
                T.IntegerType(), [c.in_range(1, 7)], nullable=False
            ),
            "l_quantity": pa.Column(
                T.DoubleType(),
                [c.in_range(1.0, 50.0), c.ne(0.0)],
                nullable=False,
            ),
            "l_extendedprice": pa.Column(
                T.DoubleType(), [c.gt(0.0)], nullable=False
            ),
            "l_discount": pa.Column(
                T.DoubleType(), [c.in_range(0.0, 0.08)]
            ),
            "l_tax": pa.Column(T.DoubleType(), [c.ge(0.0)]),
            "l_returnflag": pa.Column(
                T.StringType(),
                [
                    c.isin(["A", "N", "R"]),
                    c.str_length(1, 1),
                    c.str_matches("[A-Z]$"),
                ],
                nullable=False,
            ),
            "l_linestatus": pa.Column(
                T.StringType(),
                [c.isin(["O", "F"]), c.str_length(1, 1)],
            ),
            "l_shipdate": pa.Column(T.TimestampType(), nullable=False),
        },
        unique=["l_orderkey", "l_linenumber"],
        name="lineitem_ref",
    )


def build_our_schema():
    from pandera_spark import Check, Column, DataFrameSchema

    c = Check
    return DataFrameSchema(
        {
            "l_orderkey": Column(T.LongType(), [c.gt(0)], nullable=False),
            "l_partkey": Column(T.LongType(), [c.ge(1)], nullable=False),
            "l_suppkey": Column(T.LongType(), [c.ge(1)], nullable=False),
            "l_linenumber": Column(
                T.IntegerType(), [c.in_range(1, 7)], nullable=False
            ),
            "l_quantity": Column(
                T.DoubleType(),
                [c.in_range(1.0, 50.0), c.ne(0.0)],
                nullable=False,
            ),
            "l_extendedprice": Column(
                T.DoubleType(), [c.gt(0.0)], nullable=False
            ),
            "l_discount": Column(T.DoubleType(), [c.in_range(0.0, 0.08)]),
            "l_tax": Column(T.DoubleType(), [c.ge(0.0)]),
            "l_returnflag": Column(
                T.StringType(),
                [
                    c.isin(["A", "N", "R"]),
                    c.str_length(1, 1),
                    c.str_matches("[A-Z]$"),
                ],
                nullable=False,
            ),
            "l_linestatus": Column(
                T.StringType(), [c.isin(["O", "F"]), c.str_length(1, 1)]
            ),
            "l_shipdate": Column(T.TimestampType(), nullable=False),
        },
        unique=["l_orderkey", "l_linenumber"],
        name="lineitem_ours",
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = _spark()
    sc = spark.sparkContext
    from pandera_spark.sources import read_parquet

    df = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    n_rows = df.count()  # warm the scan / JVM before either engine is timed

    ref_schema = build_reference_schema()
    our_schema = build_our_schema()

    def time_engine(label, run):
        times = []
        jobs_before = _job_count(sc)
        for _ in range(n_runs):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        jobs = (_job_count(sc) - jobs_before) / n_runs
        return {
            "engine": label,
            "best_sec": round(min(times), 4),
            "mean_sec": round(sum(times) / len(times), 4),
            "spark_jobs_per_validate": jobs,
        }

    def run_ref():
        out = ref_schema.validate(df)
        errs = out.pandera.errors
        assert errs is not None

    def run_ours():
        res = our_schema.validate_result(df)
        assert res.errors is not None

    results = [
        time_engine("reference_pandera_pyspark", run_ref),
        time_engine("pandera_spark", run_ours),
    ]
    ref, ours = results
    print(json.dumps({
        "workload": "lineitem 11-col schema, 15 value + 8 null + dtype "
                    "checks, joint unique",
        "sf_dir": sf_dir,
        "rows": n_rows,
        "n_runs": n_runs,
        "results": results,
        "speedup_best": round(ref["best_sec"] / ours["best_sec"], 2),
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
