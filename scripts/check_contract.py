"""Local replica of the driver's correctness harness.

Runs every __spark_entry__.queries() entry on Spark and the matching
oracle_sql() on DuckDB over the same parquet, compares row count, sorted
column names, and an order-insensitive value multiset.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    import datetime
    import decimal
    import math

    if isinstance(v, decimal.Decimal):
        # fetchall() returns DECIMAL columns as Decimal (fetch_df
        # converted them to float); compare on the same float grid
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        # fetchall() keeps DATE as date; Spark date_trunc yields a
        # midnight timestamp — same instant, same normal form (this is
        # what the old fetch_df/pandas conversion did implicitly)
        return datetime.datetime.combine(
            v, datetime.time.min
        ).isoformat()
    return v


def main(sf_dir: str, only: "list[str] | None" = None) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # the driver's oracle harness runs stock Spark 4 => ANSI on;
        # match it here so ANSI-sensitivity bugs surface locally
        .config(
            "spark.sql.ansi.enabled",
            os.environ.get("SPARK_GRAFT_ANSI_CONF", "true"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = [n for n in only if n not in queries]
        if unknown:
            print(f"unknown queries: {unknown}")
            return 1
        queries = {n: queries[n] for n in only}
    failures = 0
    for name, fn in queries.items():
        sdf = fn(spark, sf_dir)
        spark_rows = sdf.collect()
        spark_cols = sorted(sdf.columns)
        s_vals = sorted(
            tuple(norm(r[c]) for c in spark_cols) for r in spark_rows
        )
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_rows)} rows) [no oracle]")
            continue
        # fetchall(), NOT fetch_df(): pandas conversion turns an
        # all-NULL integer column into float64 NaN, which falsely
        # diverges from Spark's None (seen on compaction group_id)
        cur = con.execute(oracles[name])
        names = [d[0] for d in cur.description]
        drows = cur.fetchall()
        duck_cols = sorted(names)
        order = [names.index(c) for c in duck_cols]
        d_vals = sorted(
            tuple(norm(row[i]) for i in order) for row in drows
        )
        ok_rows = len(spark_rows) == len(drows)
        ok_cols = spark_cols == duck_cols
        ok_vals = s_vals == d_vals
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"  {name}: {status} rows={ok_rows} cols={ok_cols} vals={ok_vals}")
            if not ok_cols:
                print(f"    spark cols: {spark_cols}\n    duck  cols: {duck_cols}")
            if not ok_vals:
                sm = [x for x in s_vals if x not in d_vals][:5]
                dm = [x for x in d_vals if x not in s_vals][:5]
                print(f"    spark-only: {sm}\n    duck-only:  {dm}")
        else:
            print(f"  {name}: OK ({len(spark_rows)} rows)")
    # smoke entry() (skipped when a subset was requested)
    if not only:
        edf = entrymod.entry(spark)
        print(
            f"  entry(): {len(edf.collect())} rows, "
            f"schema={sorted(edf.columns)}"
        )
    spark.stop()
    return failures


if __name__ == "__main__":
    # usage: check_contract.py [sf_dir] [--only name1,name2]
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1].split(",")
        args = args[:i] + args[i + 2:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    sys.exit(main(sf, only))
