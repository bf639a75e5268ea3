"""Per-query profiling: split bench time into build / compile / execute.

For each query name given on argv (or the top-N from BENCH_DETAIL.json):

- t_build   — python-side DataFrame construction (includes any eager
              actions the query fires while building: counts, persists,
              connected-components iterations)
- t_compile — ``df.explain("formatted")`` on the built frame: Catalyst
              analysis + optimization + physical planning (no execution)
- t_exec    — noop-sink write of the built frame (guide §1.4), the
              actual computation
- n_jobs    — Spark jobs fired across build+exec (via job-group ids)

Usage: python scripts/profile_queries.py [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 32), PROFILE_TOP (default 30)
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pandera-spark-profile")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = sys.argv[1:]
    if not names:
        detail = json.load(
            open(os.path.join(os.path.dirname(__file__), "..",
                              "BENCH_DETAIL.json"))
        )
        top = int(os.environ.get("PROFILE_TOP", "30"))
        names = [
            n for n, _ in sorted(
                detail["queries"].items(), key=lambda kv: -kv[1]
            )[:top]
        ]

    # warmup (JVM/codegen/parquet reader) outside measurements
    try:
        entrymod.entry(spark).count()
    except Exception:
        pass
    spark.catalog.clearCache()

    sc = spark.sparkContext
    results = {}
    for name in names:
        fn = qs[name]
        sc.setJobGroup(f"prof-{name}", name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        # second exec on the SAME frame: warm-codegen / reuse floor
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        try:
            jobs = sc.statusTracker().getJobIdsForGroup(f"prof-{name}")
            n_jobs = len(jobs)
        except Exception:
            n_jobs = -1
        sc.setJobGroup("cleanup", "cleanup")
        spark.catalog.clearCache()
        results[name] = {
            "build": round(t1 - t0, 3),
            "compile": round(t2 - t1, 3),
            "exec1": round(t3 - t2, 3),
            "exec2": round(t4 - t3, 3),
            "total_cold": round(t3 - t0, 3),
            "n_jobs": n_jobs,
            "plan_bytes": len(buf.getvalue()),
        }
        print(
            f"{name:38s} build={t1-t0:6.2f} compile={t2-t1:5.2f} "
            f"exec1={t3-t2:6.2f} exec2={t4-t3:6.2f} jobs={n_jobs:3d} "
            f"plan={len(buf.getvalue())//1024}K",
            flush=True,
        )
    out = os.environ.get("PROFILE_OUT", "/tmp/profile_queries.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
