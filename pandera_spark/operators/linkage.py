"""Record linkage: blocked fuzzy (edit-distance) join between two tables.

Matching a mistyped catalog against a master table — entity resolution —
needs "join on strings within edit distance k" without the O(|A|×|B|)
cross product.  The classic sound blocking is the q-gram count filter
(Gravano et al., VLDB'01) sharpened by prefix filtering (ED-Join,
Xiao et al., VLDB'08):

- **count bound**: if ``ed(s, t) <= k`` then the q-gram sets share at
  least ``|G(s)| - k·q`` grams (one edit destroys at most q grams);
- **prefix filter**: order all grams canonically by (global document
  frequency asc, gram asc); if two sets must share ``|G|-k·q`` grams
  they must share one of each side's first ``k·q + 1`` grams in that
  order.  So it suffices to equi-join on each string's ``k·q+1``
  RAREST grams — frequent grams ("the ", "ion ") never generate
  candidates, which is exactly where the naive q-gram join explodes.

Plan shape at 100 TB: one exploded-gram groupBy computes global gram
frequencies (bounded by the gram vocabulary, partial-agg-collapsed);
a broadcast of that frequency table ranks each string's grams
map-side; the candidate join is an equi-join on rare grams only;
verification runs JVM ``levenshtein(a, b, k)`` (the threshold form
bounds the DP) on DISTINCT candidate pairs after a pushed
``|len(a)-len(b)| <= k`` filter.  No cross product anywhere; the
guarantee is NO FALSE NEGATIVES (the oracle certifies this against a
brute-force edit-distance join).

Strings too short for the count bound to force a shared gram
(len <= q(k+1)-1, plus the k-longer partners they could match) fall
back to a length-band block (emit keys len..len+k on both sides — two
such strings share a key iff their lengths differ by <= k), preserving
the guarantee for the short tail.

Reference parity: no pandera analogue; beyond-reference relational
tier next to operators/dedup.py (within-corpus near-dup) — this is the
CROSS-TABLE form with a provable candidate superset.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = ["fuzzy_join"]


def _grams(col: C, q: int) -> C:
    """Distinct positional-free q-gram set of a string (set semantics —
    the prefix filter works on sets)."""
    n = F.length(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - (q - 1), F.lit(0))),
            lambda i: F.substring(col, i, q),
        )
    )


def _keys_side(
    df: DataFrame,
    id_col: str,
    col: str,
    q: int,
    k: int,
    gram_df: DataFrame,
) -> DataFrame:
    """(id, key) blocking keys: the k·q+1 rarest grams (canonical order:
    global df asc, gram asc) for gram-bearing strings; length-band keys
    for the short tail."""
    prefix_n = k * q + 1
    # the count bound |G∩| >= |G| - k·q forces a shared gram only when
    # |G| > k·q, i.e. len > q(k+1)-1; a true match's partner can be up
    # to k longer, so every string with len <= q(k+1)-1+k must ALSO
    # carry length-band keys (two banded strings share one iff their
    # lengths differ by <= k)
    short_cut = q * (k + 1) - 1 + k
    s = df.select(
        F.col(id_col).alias("__id"), F.col(col).alias("__s")
    ).where(F.col(col).isNotNull())
    long_side = (
        s.where(F.length("__s") >= q)
        .select("__id", F.explode(_grams(F.col("__s"), q)).alias("g"))
        .join(F.broadcast(gram_df), "g", "left")
        .withColumn("__df", F.coalesce("df", F.lit(0)))
    )
    w = Window.partitionBy("__id").orderBy(F.asc("__df"), F.asc("g"))
    rare = (
        long_side.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= prefix_n)
        .select("__id", F.concat(F.lit("G:"), F.col("g")).alias("key"))
    )
    short = (
        s.where(F.length("__s") <= short_cut)
        .select(
            "__id",
            F.explode(
                F.sequence(
                    F.length("__s"), F.length("__s") + F.lit(k)
                )
            ).alias("__l"),
        )
        .select(
            "__id",
            F.concat(F.lit("L:"), F.col("__l").cast("string")).alias("key"),
        )
    )
    return rare.unionByName(short)


def fuzzy_join(
    a: DataFrame,
    b: DataFrame,
    col: str,
    *,
    max_dist: int = 1,
    q: int = 3,
    id_col_a: str = "id",
    id_col_b: str = "id",
    col_b: Optional[str] = None,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """All pairs (a, b) with ``levenshtein(a[col], b[col_b]) <= max_dist``.

    Returns ``(id_a, id_b, val_a, val_b, dist)`` (+ ``keep_cols`` from
    ``a``).  Candidate generation is the prefix-filtered q-gram
    equi-join described in the module docstring — a provable candidate
    SUPERSET of the true result, so the only misses possible are bugs,
    not heuristics; exact bounded-DP verification restores precision.
    Null strings never match.  Self-join: pass the same frame twice and
    filter ``id_a < id_b`` afterwards.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    cb = col_b or col
    # global canonical gram order: document frequency over BOTH sides
    grams_union = (
        a.select(F.explode(_grams(F.col(col), q)).alias("g"))
        .unionAll(b.select(F.explode(_grams(F.col(cb), q)).alias("g")))
        .groupBy("g")
        .agg(F.count("*").alias("df"))
    )
    ka = _keys_side(a, id_col_a, col, q, max_dist, grams_union)
    kb = _keys_side(b, id_col_b, cb, q, max_dist, grams_union)
    cand = (
        ka.join(kb.withColumnRenamed("__id", "__idb"), "key")
        .select(
            F.col("__id").alias("id_a"), F.col("__idb").alias("id_b")
        )
        .distinct()
    )
    av = a.select(
        F.col(id_col_a).alias("id_a"),
        F.col(col).alias("val_a"),
        *[F.col(c) for c in keep_cols],
    )
    bv = b.select(F.col(id_col_b).alias("id_b"), F.col(cb).alias("val_b"))
    pairs = cand.join(av, "id_a").join(bv, "id_b")
    # cheap length filter first, then the bounded DP; levenshtein's
    # threshold form returns -1 when the distance exceeds max_dist
    lt = F.levenshtein(F.col("val_a"), F.col("val_b"), max_dist)
    return (
        pairs.where(
            F.abs(F.length("val_a") - F.length("val_b")) <= max_dist
        )
        .withColumn("dist", lt)
        .where(F.col("dist") >= 0)
        .select("id_a", "id_b", "val_a", "val_b", "dist", *keep_cols)
    )
