"""Sinks: write validated data, quarantining invalid rows.

The reference returns the validated object and an error report
(SURVEY.md §2.A — it has no sink operators); at warehouse scale the
useful sink is *routed* output: rows passing every row-resolvable check
go to the main table, failing rows to a quarantine location for triage.

Scale shape: the valid/invalid split is ONE boolean projection
(`row_pass_condition` — the same compiled predicates the validator
aggregates), and `write_quarantined` writes both routes in a SINGLE pass
using a partitioned write on the validity flag — one scan, one job, two
output directories. No double-scan, no driver round-trip.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from .container import DataFrameSchema

VALID_FLAG = "_pandera_valid"


def split_valid_invalid(
    df: DataFrame, schema: "DataFrameSchema"
) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, invalid_rows) by the conjunction of all row-resolvable
    checks.  Lazy — no Spark action; each side is a filtered view, and a
    filter pushed into the scan when the input is a file source."""
    from .backend.runner import row_pass_condition, strip_hidden

    out, cond = row_pass_condition(schema, df)
    return strip_hidden(out.filter(cond)), strip_hidden(out.filter(~cond))


def write_quarantined(
    df: DataFrame,
    schema: "DataFrameSchema",
    path: str,
    *,
    format: str = "parquet",
    mode: str = "error",
    flag_col: str = VALID_FLAG,
) -> dict[str, str]:
    """Write ``df`` under ``path`` partitioned by a validity flag — one
    scan, one write job; valid rows land in ``{path}/{flag}=true/``,
    quarantined rows in ``{path}/{flag}=false/``.

    Returns the two output locations.  Readers of the main table prune to
    the valid partition for free (partition pruning on the flag column).
    """
    from .backend.runner import row_pass_condition, strip_hidden

    out, cond = row_pass_condition(schema, df)
    (
        strip_hidden(out.withColumn(flag_col, cond))
        .write.format(format)
        .mode(mode)
        .partitionBy(flag_col)
        .save(path)
    )
    return {
        "valid": f"{path}/{flag_col}=true",
        "invalid": f"{path}/{flag_col}=false",
    }


def quarantine_stream(
    stream_df: DataFrame,
    schema: "DataFrameSchema",
    path: str,
    *,
    format: str = "parquet",
    flag_col: str = VALID_FLAG,
):
    """Streaming quarantine routing: every micro-batch appends to
    ``{path}/{flag}=true|false`` via the same single-pass partitioned
    write as :func:`write_quarantined`.

    Returns a ``DataStreamWriter`` (caller adds checkpoint/trigger and
    ``.start()``).  One scan per micro-batch; no per-check jobs.
    """
    from .backend.runner import row_pass_condition, strip_hidden

    out, cond = row_pass_condition(schema, stream_df)
    flagged = strip_hidden(out.withColumn(flag_col, cond))

    def route(batch_df: DataFrame, _batch_id: int) -> None:
        (
            batch_df.write.format(format)
            .mode("append")
            .partitionBy(flag_col)
            .save(path)
        )

    return flagged.writeStream.foreachBatch(route)


def write_validated(
    df: DataFrame,
    schema: "DataFrameSchema",
    path: str,
    *,
    format: str = "parquet",
    mode: str = "error",
    drop_invalid: bool = False,
) -> "DataFrame":
    """Validate then write.  ``drop_invalid=False`` raises on any error
    (nothing is written); ``drop_invalid=True`` filters failing rows and
    writes the clean frame.  Returns the written DataFrame."""
    from .errors import SchemaErrors

    result = schema.validate_result(df)
    if result.errors and not drop_invalid:
        raise SchemaErrors(schema.name or "schema", result.errors,
                           result.report)
    out = result.df
    if drop_invalid:
        valid, _ = split_valid_invalid(df, schema)
        out = valid
    out.write.format(format).mode(mode).save(path)
    return out
