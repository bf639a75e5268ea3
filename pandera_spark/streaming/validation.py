"""Structured Streaming validation.

The reference is batch-only (SURVEY.md §2.L); the documented extension path
is ``foreachBatch`` validation plus ``observe()`` metrics.  Both are
implemented here:

- :func:`validate_stream` wraps a streaming query so every micro-batch runs
  the single-pass validator; per-batch reports go to a callback (alerting,
  dead-letter sink, ...), and optionally invalid rows are dropped before the
  user's sink function runs.
- :func:`observed_validation` attaches violation counters to a (batch or
  streaming) DataFrame via ``DataFrame.observe`` — zero extra passes: the
  counters piggyback on whatever action the pipeline already runs, the right
  tool when validation must not add a scan at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from ..container import DataFrameSchema


def validate_stream(
    stream_df: DataFrame,
    schema: "DataFrameSchema",
    *,
    on_report: Optional[Callable[[int, dict], None]] = None,
    drop_invalid: bool = False,
    sink: Optional[Callable[[DataFrame, int], None]] = None,
):
    """Return a ``foreachBatch`` writer applying the schema per micro-batch.

    Usage::

        q = validate_stream(events, schema, on_report=print,
                            sink=lambda df, bid: df.write...).start()
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        result = schema.validate_result(batch_df)
        if on_report is not None:
            on_report(batch_id, result.report)
        out = batch_df
        if drop_invalid:
            filtered_schema = _with_drop_invalid(schema)
            out = filtered_schema.validate(batch_df)
        if sink is not None:
            sink(out, batch_id)

    return stream_df.writeStream.foreachBatch(process)


def _with_drop_invalid(schema: "DataFrameSchema") -> "DataFrameSchema":
    import copy

    s = copy.copy(schema)
    s.drop_invalid_rows = True
    return s


def observed_validation(
    df: DataFrame, schema: "DataFrameSchema", observation_name: str = "pandera"
) -> tuple[DataFrame, object]:
    """Attach violation counters via ``df.observe`` — metrics materialize on
    the pipeline's own action, adding NO extra scan.

    Returns (df_with_observation, observation).  For batch frames read
    ``observation.get`` after an action; for streaming use a
    ``StreamingQueryListener`` on ``observedMetrics[observation_name]``.
    """
    from pyspark.sql import Observation

    from ..backend.runner import _violation_count_expr  # shared compiler

    exprs = []
    for comp in schema.columns.values():
        if comp.name is None:
            continue
        col = F.col(comp.name)
        if not comp.nullable:
            exprs.append(
                F.count(F.when(col.isNull(), 1)).alias(
                    f"nulls__{comp.name}"
                )
            )
        for chk in comp.checks:
            if chk.check_fn is None:
                continue
            try:
                cond = chk.violation_condition(col)
            except Exception:
                continue
            exprs.append(
                F.count(F.when(cond, F.lit(1))).alias(
                    f"viol__{comp.name}__{chk.error}"
                )
            )
    exprs.append(F.count(F.lit(1)).alias("rows"))
    if df.isStreaming:
        obs = observation_name
        return df.observe(observation_name, *exprs), obs
    observation = Observation(observation_name)
    return df.observe(observation, *exprs), observation
