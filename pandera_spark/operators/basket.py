"""Market-basket co-occurrence mining: frequent item pairs with
support / confidence / lift — the association-rule screen every
behavioral-events and order-lines pipeline wants, as a bounded
self-join.

Design for 100 TB (the classic pair-mining blowup is the self-join):

- **Anti-monotone pruning first** (the Apriori property): a pair can
  only reach ``min_pair_support`` if BOTH items do, so items below
  ``min_item_support`` are dropped *before* the self-join — the
  frequent-item set is broadcast (it is small by construction: at most
  ``total_item_occurrences / min_item_support`` entries).
- **Basket-size cap**: one degenerate mega-basket contributes
  k·(k−1)/2 pairs; ``max_items_per_basket`` drops baskets past the cap
  (reported via the companion :func:`basket_stats`), bounding the join
  output by ``n_baskets · cap²`` instead of the worst basket.
- The self-join shuffles both sides on the basket key ONCE each
  (co-partitioned hash join) and the ``item_a < item_b`` predicate
  halves the output at the join, not after it.
- Per-basket duplicate items collapse in a first ``distinct`` pass
  (support is per-basket, not per-line), which also map-side-combines.

Reference parity: none (pandera has no mining tier); beyond-reference
analytics in the family of ``operators/heavyhitters.py``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_pairs", "basket_stats"]


def _baskets(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    return (
        df.where(
            F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .distinct()
    )


def basket_stats(
    df: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """Distribution of basket sizes (distinct items per basket): one
    row per size with ``n_baskets`` — the sizing input for
    :func:`frequent_pairs`'s ``max_items_per_basket`` cap."""
    return (
        _baskets(df, basket_col, item_col)
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("basket_size"))
        .groupBy("basket_size")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_pair_support: int = 2,
    min_item_support: int = 2,
    max_items_per_basket: Optional[int] = None,
    basket_storage: Optional[str] = None,
) -> DataFrame:
    """Frequent item pairs with association-rule statistics.

    One row per unordered pair (``item_a < item_b``) seen in at least
    ``min_pair_support`` distinct baskets:
    ``item_a, item_b, pair_count, count_a, count_b, n_baskets,
    support, conf_a_to_b, conf_b_to_a, lift`` where
    ``support = pair_count / n_baskets``,
    ``conf(a→b) = pair_count / count_a`` and
    ``lift = support / (support_a · support_b)``.

    ``n_baskets`` (the support denominator) counts every basket that
    survives the size cap — including baskets with only infrequent
    items, matching the textbook definition.  Item counts are
    per-basket (duplicates within a basket collapse).

    ``basket_storage`` optionally persists the deduped
    ``(basket, item)`` frame, which is consumed by the denominator
    aggregate, both sides of the pair self-join, and the item-count
    broadcasts.  The default ``None`` recomputes: at bench scale the
    re-executed lineage is a columnar scan + broadcast join + distinct
    whose exchange statistics let AQE size the self-join, and caching
    measured *slower* (hidden stats + cache-build barrier).  At corpus
    scale, five re-executions of a full scan + distinct shuffle
    dominate — pass ``"DISK_ONLY"``/``"MEMORY_AND_DISK"`` there.
    """
    if min_pair_support < 1 or min_item_support < 1:
        raise ValueError("support thresholds must be >= 1")
    from .similarity import _materialize

    items = _baskets(df, basket_col, item_col)
    if max_items_per_basket is not None:
        sizes = (
            items.groupBy("__b")
            .agg(F.count(F.lit(1)).alias("__sz"))
            .where(F.col("__sz") <= max_items_per_basket)
            .select("__b")
        )
        items = items.join(sizes, "__b")
    # the deduped basket frame feeds FIVE consumers (denominator agg,
    # both self-join sides, the two count broadcasts via ``frequent``);
    # ``basket_storage`` computes it once at corpus scale (see docstring
    # for why recompute is the measured local default)
    items = _materialize(items, basket_storage)
    # the support denominator is fixed BEFORE item pruning; kept in-plan
    # as a broadcast 1-row frame instead of a driver-side count action
    nbf = items.agg(
        F.count_distinct(F.col("__b")).alias("__nb")
    )
    counts = items.groupBy("__i").agg(F.count(F.lit(1)).alias("__c"))
    frequent = counts.where(F.col("__c") >= min_item_support)
    pruned = items.join(
        F.broadcast(frequent.select("__i")), "__i"
    ).select("__b", "__i")
    left = pruned.select("__b", F.col("__i").alias("item_a"))
    right = pruned.select("__b", F.col("__i").alias("item_b"))
    pairs = (
        left.join(right, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_support)
    )
    ca = F.broadcast(
        frequent.select(F.col("__i").alias("item_a"),
                        F.col("__c").alias("count_a"))
    )
    cb = F.broadcast(
        frequent.select(F.col("__i").alias("item_b"),
                        F.col("__c").alias("count_b"))
    )
    nb = F.col("__nb").cast("double")
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(nbf))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.col("__nb").alias("n_baskets"),
            (F.col("pair_count") / nb).alias("support"),
            (F.col("pair_count") / F.col("count_a"))
            .alias("conf_a_to_b"),
            (F.col("pair_count") / F.col("count_b"))
            .alias("conf_b_to_a"),
            (F.col("pair_count") * nb
             / (F.col("count_a") * F.col("count_b"))).alias("lift"),
        )
    )
