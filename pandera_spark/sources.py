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
    spark: SparkSession,
    path: str,
    *,
    nanos_to_timestamp: bool = True,
    schema=None,
) -> DataFrame:
    """Read parquet, tolerating TIMESTAMP(NANOS) columns.

    Spark's vectorized reader rejects INT64 TIMESTAMP(NANOS)
    (PARQUET_TYPE_ILLEGAL).  With the legacy knob the column arrives as a
    nano-epoch long; we convert to TimestampType via ``timestamp_micros`` —
    a pure projection, fused into the scan stage by codegen.

    ``schema`` (an optional ``StructType``) is the RAW scan schema (nano
    columns as ``long``); passing it skips Spark's footer-inference job
    — one small job per read that adds up when a harness builds hundreds
    of frames over the same files.  Data is still read from parquet on
    every action; only the schema metadata is reused.
    """
    # inspect the footer driver-side first (no Spark job) so a nano-ts file
    # never triggers a failed schema-inference job
    nano_cols = _nano_timestamp_columns(path)
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read if schema is None else spark.read.schema(schema)
    df = reader.parquet(path)
    if nano_cols and nanos_to_timestamp:
        # integer DIV, not float `/`: nano-epoch longs (~2^60) exceed the
        # 53-bit double mantissa, so float division drifts by ±1 µs; DIV
        # matches the truncation every nanos-aware reader applies
        df = df.withColumns(
            {
                c: F.timestamp_micros(F.expr(f"`{c}` DIV 1000"))
                for c in nano_cols
            }
        )
    return df


def _reader_schema(schema):
    """Accept a DataFrameSchema, DataFrameModel, or StructType."""
    from pyspark.sql import types as T

    if isinstance(schema, T.StructType):
        return schema
    if hasattr(schema, "to_structtype"):
        return schema.to_structtype()
    raise TypeError(f"cannot derive a reader schema from {type(schema)!r}")


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    *,
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """CSV scan typed by a pandera schema (``schema.to_structtype()``).

    Declaring the schema up front skips Spark's inference pass (a full
    extra scan at 100 TB) and keeps the scan column-pruned.  Malformed
    rows are kept PERMISSIVE-ly in ``corrupt_col`` so validation can
    quarantine them instead of silently dropping data.
    """
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        st = _reader_schema(schema)
        from pyspark.sql import types as T

        if corrupt_col and corrupt_col not in [f.name for f in st.fields]:
            st = T.StructType(
                [*st.fields, T.StructField(corrupt_col, T.StringType(), True)]
            )
        reader = reader.schema(st).option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema=None,
    *,
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """JSON-lines scan typed by a pandera schema — same contract as
    :func:`read_csv` (no inference scan, corrupt records preserved)."""
    reader = spark.read.options(**options)
    if schema is not None:
        st = _reader_schema(schema)
        from pyspark.sql import types as T

        if corrupt_col and corrupt_col not in [f.name for f in st.fields]:
            st = T.StructType(
                [*st.fields, T.StructField(corrupt_col, T.StringType(), True)]
            )
        reader = reader.schema(st).option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    return reader.json(path)


def read_orc(
    spark: SparkSession, path: str, schema=None, **options
) -> DataFrame:
    """ORC scan, optionally typed by a pandera schema (skips inference;
    ORC supports the same predicate pushdown / column pruning as parquet)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(_reader_schema(schema))
    return reader.orc(path)


def read_text_documents(
    spark: SparkSession,
    path: str,
    *,
    whole_file: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Raw text corpus scan -> (doc_id, text, source_file).

    ``whole_file=False``: one document per line (the common
    one-example-per-line corpus layout).  ``whole_file=True``: one
    document per file (``wholetext`` reader — beware executor memory for
    large files).  ``doc_id`` is a content+provenance hash
    (``xxhash64(file, text)``) — stable across re-runs and partition
    layouts, unlike ``monotonically_increasing_id``.
    """
    from pyspark.sql import functions as F

    reader = spark.read
    if whole_file:
        reader = reader.option("wholetext", "true")
    df = reader.text(path).select(
        F.col("value").alias(text_col),
        F.input_file_name().alias("source_file"),
    )
    return df.select(
        F.xxhash64(F.col("source_file"), F.col(text_col)).alias(id_col),
        text_col,
        "source_file",
    )


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
