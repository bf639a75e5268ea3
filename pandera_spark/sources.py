"""Source readers: plain Spark readers plus compatibility shims.

The reference has no scan operators (SURVEY.md §2.A) — sources are Spark
readers feeding ``schema.validate``.  This module adds the one shim local
Spark needs: parquet files with nanosecond timestamps (written by
pandas/pyarrow) are read via ``spark.sql.legacy.parquet.nanosAsLong`` and the
nano-longs are converted back to proper timestamps in a zero-cost projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(
    spark: SparkSession, path: str, *, nanos_to_timestamp: bool = True
) -> DataFrame:
    """Read parquet, tolerating TIMESTAMP(NANOS) columns.

    Spark's vectorized reader rejects INT64 TIMESTAMP(NANOS)
    (PARQUET_TYPE_ILLEGAL).  With the legacy knob the column arrives as a
    nano-epoch long; we convert to TimestampType via ``timestamp_micros`` —
    a pure projection, fused into the scan stage by codegen.
    """
    # inspect the footer driver-side first (no Spark job) so a nano-ts file
    # never triggers a failed schema-inference job
    nano_cols = _nano_timestamp_columns(path)
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if nano_cols and nanos_to_timestamp:
        df = df.withColumns(
            {
                c: F.timestamp_micros((F.col(c) / F.lit(1000)).cast("long"))
                for c in nano_cols
            }
        )
    return df


def _nano_timestamp_columns(path: str) -> list[str]:
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []
