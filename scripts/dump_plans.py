"""Dump ``explain("formatted")`` for contract queries to files.

Usage: python scripts/dump_plans.py <outdir> <suffix> [query ...]
Writes <outdir>/<query>_<suffix>.txt for each query (default: top-30
from BENCH_DETAIL.json).  Planning only — nothing executes except any
eager actions a query fires while building.
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
        .appName("plan-dump")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if not names:
        detail = json.load(
            open(os.path.join(os.path.dirname(__file__), "..",
                              "BENCH_DETAIL.json"))
        )
        names = [
            n for n, _ in sorted(
                detail["queries"].items(), key=lambda kv: -kv[1]
            )[:30]
        ]
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        print(f"{name}: {len(text)} bytes", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
