"""Order-dependent checks at scale: monotonicity without a global window.

The inline ``is_monotonic`` check (backend/runner.py) uses
``Window.orderBy`` — correct, but a global window collapses to ONE
partition: a non-starter at 100 TB.  The scalable formulation:

1. ``repartitionByRange(order_col)`` — partition i holds strictly smaller
   order keys than partition i+1 (one shuffle, the same cost class as any
   global sort-ish operation);
2. ``sortWithinPartitions`` + a window partitioned by
   ``spark_partition_id()`` — adjacent-pair checks run in PARALLEL per
   partition;
3. per-partition (first, last) values — a tiny aggregate, #partitions
   rows — checked pairwise on the driver for the cross-boundary adjacent
   pairs.

Total: one range shuffle + one parallel window + one KB-sized collect.
Equivalent to the global-window answer (asserted in tests).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def monotonic_violations(
    df: DataFrame,
    col: str,
    order_by: str,
    *,
    decreasing: bool = False,
    strict: bool = False,
    num_partitions: Optional[int] = None,
) -> int:
    """Count adjacent-pair monotonicity violations of ``col`` when rows
    are ordered by ``order_by``.

    Null values (in either column of a pair) are skipped, matching the
    inline check's ``ignore_na`` semantics.
    """
    parted = (
        df.select(F.col(order_by).alias("__o"), F.col(col).alias("__v"))
        .filter(F.col("__o").isNotNull())
        .repartitionByRange(
            *( [num_partitions] if num_partitions else [] ), F.col("__o")
        )
        .sortWithinPartitions("__o")
        .withColumn("__pid", F.spark_partition_id())
    )

    w = Window.partitionBy("__pid").orderBy("__o")
    prev = F.lag("__v").over(w)
    cur = F.col("__v")
    if decreasing:
        ok = cur < prev if strict else cur <= prev
    else:
        ok = cur > prev if strict else cur >= prev
    viol = prev.isNotNull() & cur.isNotNull() & ~ok

    row = parted.withColumn("__viol", viol.cast("long")).groupBy(
        "__pid"
    ).agg(
        F.sum("__viol").alias("v"),
        F.min_by("__v", "__o").alias("first_v"),
        F.max_by("__v", "__o").alias("last_v"),
        F.min("__o").alias("first_o"),
    )
    parts = sorted(row.collect(), key=lambda r: r.first_o)
    within = sum(int(r.v or 0) for r in parts)

    # cross-boundary adjacent pairs: last of partition i vs first of i+1
    boundary = 0
    for a, b in zip(parts, parts[1:]):
        pa, pb = a.last_v, b.first_v
        if pa is None or pb is None:
            continue
        if decreasing:
            bad = not (pb < pa) if strict else not (pb <= pa)
        else:
            bad = not (pb > pa) if strict else not (pb >= pa)
        if bad:
            boundary += 1
    return within + boundary
