"""Bucketed-table co-located validation joins and aggregations.

The join/agg-shaped validation families — FK integrity (fact → dim,
operators/relational.py), joint uniqueness (groupBy count > 1,
backend/runner.py), orphan stats — shuffle the fact table on their key
every time they run.  At 100 TB that shuffle IS the cost: a daily pipeline
re-validating the same tables pays it on every run.

Bucketing amortizes it away.  Write the table once with
``bucketBy(n, keys)`` (one shuffle, at write time); afterwards every
sort-merge join and hash aggregation keyed on the bucket columns reads
co-located buckets and plans **no Exchange** — Spark's scan reports the
bucket spec as its output partitioning, so Catalyst drops the shuffle
requirement on that side.  Requirements (all checked here):

- both join sides bucketed on the join keys with the SAME bucket count
  (or a divisor — Spark 3.1+ coalesces compatible counts);
- ``spark.sql.sources.bucketing.enabled`` (default true);
- a merge-join path (broadcast would also avoid the big-side shuffle;
  the ``merge`` hint keeps the demo deterministic).

This is the "bucketed-table co-located validation joins" scale path noted
as future work in SURVEY.md §7 — no reference analogue (pandera never
owns storage); the semantics mirror ``fk_violations`` / joint-unique.
"""

from __future__ import annotations

import contextlib
import io
from typing import Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _cols(c: Union[str, Sequence[str]]) -> list[str]:
    return [c] if isinstance(c, str) else list(c)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Union[str, Sequence[str]],
    num_buckets: int,
    *,
    sort: bool = True,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) catalog table.

    One shuffle now buys shuffle-free joins/aggs on ``keys`` for every
    later validation run.  ``sort=True`` additionally sorts within each
    bucket so single-file buckets skip the merge-join sort.
    """
    keys = _cols(keys)
    writer = (
        df.repartition(num_buckets, *[F.col(k) for k in keys])
        .write.format(file_format)
        .mode(mode)
        .bucketBy(num_buckets, keys[0], *keys[1:])
    )
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(table)


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (public explain output)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the planned query contains any shuffle (Exchange node).

    The assertion tool for co-location claims: a validation join/agg over
    correctly bucketed inputs must plan exchange-free.
    """
    return "Exchange" in physical_plan(df)


def bucketed_fk_violations(
    spark: SparkSession,
    fact_table: str,
    dim_table: str,
    keys: Union[str, Sequence[str]],
    *,
    fact_keys: Union[str, Sequence[str], None] = None,
    dim_keys: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Fact rows whose key has no match in dim — as a co-located
    sort-merge anti-join over two bucketed tables (zero shuffles when both
    are bucketed on the keys with compatible counts).

    Same semantics as ``relational.fk_violations`` (which broadcasts the
    deduped dim — right when dim is small; this is right when both sides
    are big and pre-bucketed).
    """
    fk = _cols(fact_keys or keys)
    dk = _cols(dim_keys or keys)
    fact = spark.table(fact_table)
    dim = spark.table(dim_table).select(*dk)
    cond = [fact[f] == dim[d] for f, d in zip(fk, dk)]
    return fact.join(dim.hint("merge"), cond, "left_anti")


def bucketed_duplicates(
    spark: SparkSession,
    table: str,
    keys: Union[str, Sequence[str]],
) -> DataFrame:
    """Duplicate key tuples (joint-uniqueness violations) of a bucketed
    table: ``groupBy(keys).count > 1`` where the hash aggregation reuses
    the bucket distribution — no Exchange.

    Null-key rows are excluded to match the engine's uniqueness semantics
    (backend/runner.py counts distinct over non-null key structs).
    """
    keys = _cols(keys)
    df = spark.table(table)
    nn = df
    for k in keys:
        nn = nn.filter(F.col(k).isNotNull())
    return (
        nn.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_duplicates"))
        .filter(F.col("n_duplicates") > 1)
    )
