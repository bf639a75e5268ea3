"""Relational validation operators: referential integrity / membership
against reference tables.

The reference's ``isin`` takes a literal list (SURVEY §2.D); at warehouse
scale the "allowed values" are usually another table.  These operators
express membership as joins so Catalyst picks the physical strategy:

- small dimension -> ``broadcast()`` hash join, no shuffle of the fact table;
- large dimension -> shuffle hash / sort-merge join on the key only
  (column-pruned scans on both sides).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cols(c: Union[str, list[str]]) -> list[str]:
    return [c] if isinstance(c, str) else list(c)


def fk_violations(
    df: DataFrame,
    keys: Union[str, list[str]],
    ref: DataFrame,
    ref_keys: Union[str, list[str], None] = None,
    *,
    broadcast: bool = True,
) -> DataFrame:
    """Rows of ``df`` whose key has no match in ``ref`` (left ANTI join).

    Null keys are not violations (SQL FK semantics).  ``broadcast=True``
    broadcasts the deduplicated reference keys — the dimension side shrinks
    to distinct keys BEFORE the broadcast, so even a large dim often fits.
    """
    keys = _cols(keys)
    ref_keys = _cols(ref_keys) if ref_keys is not None else keys
    ref_sel = ref.select(
        *[F.col(rk).alias(k) for rk, k in zip(ref_keys, keys)]
    ).dropDuplicates(keys)
    if broadcast:
        ref_sel = F.broadcast(ref_sel)
    non_null = df
    for k in keys:
        non_null = non_null.filter(F.col(k).isNotNull())
    return non_null.join(ref_sel, on=keys, how="left_anti")


def fk_violation_count(
    df: DataFrame,
    keys: Union[str, list[str]],
    ref: DataFrame,
    ref_keys: Union[str, list[str], None] = None,
    *,
    broadcast: bool = True,
) -> DataFrame:
    """One row (violations: bigint) — the FK check verdict."""
    return fk_violations(df, keys, ref, ref_keys, broadcast=broadcast).agg(
        F.count(F.lit(1)).cast("long").alias("violations")
    )


def isin_table(
    df: DataFrame,
    keys: Union[str, list[str]],
    ref: DataFrame,
    ref_keys: Union[str, list[str], None] = None,
    *,
    broadcast: bool = True,
) -> DataFrame:
    """Keep rows whose key IS present in ``ref`` (left SEMI join) — the
    table-valued generalization of ``Check.isin``."""
    keys = _cols(keys)
    ref_keys = _cols(ref_keys) if ref_keys is not None else keys
    ref_sel = ref.select(
        *[F.col(rk).alias(k) for rk, k in zip(ref_keys, keys)]
    ).dropDuplicates(keys)
    if broadcast:
        ref_sel = F.broadcast(ref_sel)
    return df.join(ref_sel, on=keys, how="left_semi")


def orphan_stats(
    fact: DataFrame,
    keys: Union[str, list[str]],
    dim: DataFrame,
    dim_keys: Union[str, list[str], None] = None,
) -> DataFrame:
    """One-row summary of referential integrity: total fact rows, null-key
    rows, orphans (no dim match) — computed in one pass via a left join."""
    keys = _cols(keys)
    dim_keys = _cols(dim_keys) if dim_keys is not None else keys
    marker = "__dim_present"
    dim_sel = (
        dim.select(*[F.col(dk).alias(k) for dk, k in zip(dim_keys, keys)])
        .dropDuplicates(keys)
        .withColumn(marker, F.lit(1))
    )
    joined = fact.join(F.broadcast(dim_sel), on=keys, how="left")
    null_key = F.lit(False)
    for k in keys:
        null_key = null_key | F.col(k).isNull()
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("total_rows"),
        F.count(F.when(null_key, 1)).cast("long").alias("null_key_rows"),
        F.count(
            F.when(~null_key & F.col(marker).isNull(), 1)
        ).cast("long").alias("orphan_rows"),
    )


def star_report(
    facts: "dict[str, DataFrame]",
    fks: "list[tuple[str, Union[str, list[str]], str, Union[str, list[str]]]]",
    *,
    broadcast: bool = True,
) -> DataFrame:
    """Whole-warehouse referential contract in one result: every declared
    foreign key's violation count, long-format
    ``(fact, fk_cols, dim, violations)``.

    ``fks`` entries are ``(fact_name, fact_keys, dim_name, dim_keys)``
    against the ``facts`` mapping.  Each FK compiles to the
    :func:`fk_violations` anti-join (dims deduplicated to keys and
    broadcast — the fact tables never shuffle); the per-FK one-row counts
    union into a single frame, so Spark runs the independent anti-joins
    as parallel stages of ONE job.  The multi-table generalization of
    the reference's single-table validate."""
    if not fks:
        raise ValueError("declare at least one foreign key")
    parts = []
    for fact_name, fkeys, dim_name, dkeys in fks:
        if fact_name not in facts or dim_name not in facts:
            raise KeyError(f"unknown table in FK {fact_name}->{dim_name}")
        cnt = fk_violation_count(
            facts[fact_name], fkeys, facts[dim_name], dkeys,
            broadcast=broadcast,
        )
        parts.append(
            cnt.select(
                F.lit(fact_name).alias("fact"),
                F.lit(",".join(_cols(fkeys))).alias("fk_cols"),
                F.lit(dim_name).alias("dim"),
                F.col("violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def join_cardinality(
    left: DataFrame,
    right: DataFrame,
    left_on: Union[str, list[str]],
    right_on: Union[str, list[str], None] = None,
    *,
    expect: str = "1:N",
) -> DataFrame:
    """Pre-join multiplicity contract: verify a planned join is really
    1:1 / 1:N / N:1 BEFORE running it — the guard against silent
    fan-out row explosions (the classic corrupted-aggregate bug).

    One row: ``(left_keys, left_dup_keys, left_null_rows, right_keys,
    right_dup_keys, right_null_rows, ok)`` where ``*_dup_keys`` counts
    join keys appearing more than once on that side and ``ok`` applies
    ``expect`` ('1:1' needs both sides unique, '1:N' a unique left,
    'N:1' a unique right, 'N:M' always true).  ONE key-grain
    aggregation per side — null keys ride the same groupBy as their own
    groups (map-side partial count), so each side is a single scan and
    no join executes."""
    if expect not in ("1:1", "1:N", "N:1", "N:M"):
        raise ValueError(f"expect must be 1:1, 1:N, N:1 or N:M: {expect!r}")
    lk = _cols(left_on)
    rk = _cols(right_on) if right_on is not None else lk

    def side(df: DataFrame, keys: list[str]):
        per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
        null_cond = F.lit(False)
        for k in keys:
            null_cond = null_cond | F.col(k).isNull()
        return per_key.agg(
            F.count(F.when(~null_cond, 1)).cast("long").alias("keys"),
            F.count(F.when(~null_cond & (F.col("c") > 1), 1))
            .cast("long").alias("dups"),
            F.coalesce(F.sum(F.when(null_cond, F.col("c"))), F.lit(0))
            .cast("long").alias("nulls"),
        )

    l = side(left, lk).select(
        F.col("keys").alias("left_keys"),
        F.col("dups").alias("left_dup_keys"),
        F.col("nulls").alias("left_null_rows"),
    )
    r = side(right, rk).select(
        F.col("keys").alias("right_keys"),
        F.col("dups").alias("right_dup_keys"),
        F.col("nulls").alias("right_null_rows"),
    )
    out = l.crossJoin(r)
    need_left = expect in ("1:1", "1:N")
    need_right = expect in ("1:1", "N:1")
    ok = F.lit(True)
    if need_left:
        ok = ok & (F.col("left_dup_keys") == 0)
    if need_right:
        ok = ok & (F.col("right_dup_keys") == 0)
    return out.withColumn("ok", ok)


def reconcile_aggregate(
    parent: DataFrame,
    child: DataFrame,
    keys: Union[str, list[str]],
    parent_col: str,
    child_expr: Column,
    *,
    by: Union[str, list[str], None] = None,
    tol_abs: float = 0.0,
    tol_rel: float = 0.0,
) -> DataFrame:
    """Fact-vs-rollup reconciliation: does each parent row's stored
    aggregate (``parent_col``) equal the sum of ``child_expr`` over its
    child rows, within ``tol_abs + tol_rel * |parent value|``?  The
    classic warehouse consistency contract (order header total vs line
    detail), grouped by ``by`` for the report.

    Output, one row per ``by`` group (or one row total): ``n_parents,
    n_missing_child, n_violations, max_abs_diff, mean_diff``.  Parents
    with NO child rows count in ``n_missing_child`` and as violations
    (their stored aggregate is unbacked) but not in the diff moments.

    Plan: the child aggregates FIRST on the join keys (map-side partial
    combine — child rows never reach the join), then ONE equi-join
    parent<-child_sums on the same keys (co-partitioned shuffle, AQE
    will broadcast the aggregated side when it is small), then one
    final aggregation.  No window, no second scan of either table.
    """
    key_list = _cols(keys)
    group = [] if by is None else _cols(by)
    child_sums = child.groupBy(*[F.col(k) for k in key_list]).agg(
        F.sum(child_expr).alias("__child_sum")
    )
    joined = parent.join(child_sums, on=key_list, how="left")
    pv = F.col(parent_col).cast("double")
    diff = pv - F.col("__child_sum")
    missing = F.col("__child_sum").isNull()
    bound = F.lit(float(tol_abs)) + F.lit(float(tol_rel)) * F.abs(pv)
    violated = F.when(missing, F.lit(True)).otherwise(F.abs(diff) > bound)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_parents"),
        F.sum(missing.cast("long")).cast("long").alias("n_missing_child"),
        F.sum(violated.cast("long")).cast("long").alias("n_violations"),
        F.max(F.abs(diff)).alias("max_abs_diff"),
        F.avg(diff).alias("mean_diff"),
    ]
    return (
        joined.groupBy(*group).agg(*aggs) if group else joined.agg(*aggs)
    )


def join_cardinality_approx(
    left: DataFrame,
    right: DataFrame,
    left_on: Union[str, list[str]],
    right_on: Union[str, list[str], None] = None,
    *,
    lgk: int = 12,
) -> DataFrame:
    """Sketch-grade pre-join sizing: row counts exactly, DISTINCT key
    counts via HLL (~1.6% standard error at the default lgk) — the
    100 TB screen run before committing a join, where
    :func:`join_cardinality`'s exact key-grain aggregation is itself a
    shuffle you might not want to pay twice.

    One row: ``left_rows, right_rows, left_keys_est, right_keys_est,
    left_dup_factor, right_dup_factor, fanout_bound_est`` — dup factor
    = rows / distinct keys per side; ``fanout_bound_est`` ≈
    ``min(keys) · l_dup · r_dup``, the output-size estimate under full
    key containment (the worst realistic case; a cheap sanity bound
    before a join you expect to be 1:N).

    Plan: ONE tagged-union aggregation — each side reduces map-side to
    (count, HLL sketch) partials, a 2-row grouped agg merges them, and
    the final combine runs on those 2 rows.  Zero joins, zero collects;
    composite keys hash through a struct cast to string (null-safe,
    the HLL input must be a scalar).
    """
    lk = _cols(left_on)
    rk = _cols(right_on) if right_on is not None else lk

    def side(df: DataFrame, keys: list, tag: str) -> DataFrame:
        key = F.to_json(F.struct(*[F.col(k) for k in keys]))
        return df.select(F.lit(tag).alias("__t"), key.alias("__k"))

    melted = side(left, lk, "L").unionByName(side(right, rk, "R"))
    per_side = melted.groupBy("__t").agg(
        F.count(F.lit(1)).cast("long").alias("rows"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg("__k", F.lit(int(lgk)))
        ).cast("double").alias("keys_est"),
    )
    pick = lambda t, c: F.max(F.when(F.col("__t") == t, F.col(c)))  # noqa: E731
    out = per_side.agg(
        pick("L", "rows").cast("long").alias("left_rows"),
        pick("R", "rows").cast("long").alias("right_rows"),
        pick("L", "keys_est").alias("left_keys_est"),
        pick("R", "keys_est").alias("right_keys_est"),
    )
    ld = F.col("left_rows") / F.col("left_keys_est")
    rd = F.col("right_rows") / F.col("right_keys_est")
    return out.select(
        "*",
        ld.alias("left_dup_factor"),
        rd.alias("right_dup_factor"),
        (
            F.least(F.col("left_keys_est"), F.col("right_keys_est"))
            * ld * rd
        ).alias("fanout_bound_est"),
    )


def top_k_per_group(
    df: DataFrame,
    keys: Union[str, list],
    order_col,
    k: int,
    *,
    descending: bool = True,
    tiebreak_cols: Optional[list] = None,
    rank_col: str = "rank",
) -> DataFrame:
    """The k extreme rows per group (top revenue orders per segment,
    longest docs per source, ...) with their 1-based rank.

    Plan note: a ``row_number() <= k`` filter triggers Spark's
    WindowGroupLimit pushdown — every task keeps only its LOCAL top-k
    per group BEFORE the shuffle, so the exchange carries
    O(groups × k × tasks), not the data.  Make the ordering unique
    with ``tiebreak_cols`` (appended ascending) or equal-valued rows
    rank nondeterministically.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key_list = _cols(keys)
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    order = [oc.desc() if descending else oc.asc()]
    order += [F.col(c).asc() for c in (tiebreak_cols or [])]
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in key_list]).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= F.lit(int(k)))
    )
