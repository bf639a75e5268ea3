"""Skew mitigation utilities: salted two-phase aggregation and salted
bucket joins.

At 100 TB a handful of hot keys (empty documents, a default user id, a
null-ish sentinel) can put one reducer orders of magnitude behind the
rest.  AQE's skew-join handling covers sort-merge joins; for hash
AGGREGATIONS on a skewed key the standard fix is salting: shard each key
into ``n_salt`` sub-keys, pre-aggregate per shard (parallel), then
aggregate the shards (tiny).  Cost: one extra reduce over ``n_salt`` rows
per key — negligible; benefit: the hot key's work spreads over ``n_salt``
tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_count_by_key(
    df: DataFrame, keys: list[str], *, n_salt: int = 16
) -> DataFrame:
    """groupBy(keys).count() robust to skewed keys.

    Phase 1 groups on (keys, random salt) — hot keys spread over
    ``n_salt`` partitions; phase 2 sums the per-shard counts.  Result is
    identical to a plain groupBy count (asserted in tests).
    """
    salted = df.withColumn(
        SALT, (F.rand(seed=0) * n_salt).cast("int")
    )
    phase1 = salted.groupBy(*keys, SALT).agg(
        F.count(F.lit(1)).alias("__c")
    )
    return phase1.groupBy(*keys).agg(
        F.sum("__c").cast("long").alias("count")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    *,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for decomposable aggregates.

    ``aggs`` maps column -> one of sum/count/min/max (the aggregates that
    re-combine with themselves; avg must be expressed as sum+count by the
    caller).  Output columns are ``{fn}_{col}``.
    """
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in recombine:
            raise ValueError(
                f"{fn!r} is not self-decomposable; use sum+count and "
                "combine driver-side"
            )
    salted = df.withColumn(SALT, (F.rand(seed=0) * n_salt).cast("int"))
    p1 = salted.groupBy(*keys, SALT).agg(
        *[
            first[fn](F.col(c)).alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )
    return p1.groupBy(*keys).agg(
        *[
            recombine[fn](F.col(f"{fn}_{c}")).alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )


def salt_join_key(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salt: int = 8,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Prepare a skew-resistant equi-join: salt the fact side randomly,
    EXPLODE the dim side across all salt values (dim rows replicate
    ``n_salt``×, acceptable for small/medium dims), and return
    (fact', dim', join_keys).  ``fact'.join(dim', join_keys)`` then spreads
    each hot key over ``n_salt`` tasks.
    """
    f = fact.withColumn(SALT, (F.rand(seed=0) * n_salt).cast("int"))
    d = dim.withColumn(
        SALT,
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])),
    )
    return f, d, [key, SALT]


def skew_report(df: DataFrame, cols: "list[str]") -> DataFrame:
    """Hot-key screen for many join/group columns in ONE melt shuffle:
    ``(col_name, n_values, n_distinct, top_key, top_count, top_share)``.

    ``top_share`` (heaviest key's fraction of rows) is the number that
    decides whether a key needs salting or an AQE skew-join hint before
    a 100 TB shuffle; run this BEFORE the expensive job.  One
    (col, key) aggregation bounded by per-column cardinality; the
    heaviest key is picked as ``max(struct(count, key))`` — a total
    order, so ties resolve deterministically on any engine.  Nulls
    count as a key (they hash-partition together too): the null key is
    its OWN group — never folded into a sentinel string, so a genuine
    ``"\\x00null"`` data value can no longer merge with the null
    partition key and inflate its count.  Only for DISPLAY does the
    null group surface as ``top_key = "\\x00null"`` (a null-safe label
    keeps the tie-break total order identical across engines).

    The (col, key) aggregation assumes per-column cardinality is
    bounded; when the key space grows with the data (tokens, URLs,
    user ids), use ``operators.heavyhitters.heavy_hitters`` — bounded
    memory regardless of cardinality, exact counts above a share
    threshold."""
    if not cols:
        raise ValueError("need at least one column")
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(c).cast("string").alias("key"),
        )
        for c in cols
    ]
    counts = (
        # groupBy keeps null as its own group — the COUNT is per real
        # partition key; the display label is applied after grouping
        df.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.col_name", "e.key")
        .groupBy("col_name", "key")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("key", F.coalesce(F.col("key"), F.lit("\x00null")))
    )
    top = F.max(F.struct(F.col("c"), F.col("key")))
    return counts.groupBy("col_name").agg(
        F.sum("c").cast("long").alias("n_values"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        top.getField("key").alias("top_key"),
        top.getField("c").cast("long").alias("top_count"),
        (
            F.max(F.col("c")).cast("double") / F.sum("c").cast("double")
        ).alias("top_share"),
    )
