"""DSIR-style importance resampling: select raw-corpus documents that
look like a target distribution.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
scores each raw document by how much more likely its hashed-token
features are under a TARGET corpus (the data you want more of) than
under the RAW corpus, then resamples with Gumbel-top-k.  Done
Spark-first:

1. **Bucket distributions** (:func:`bucket_distribution`): tokens hash
   into ``buckets`` ids; ``explode → groupBy(bucket).count()`` — the
   explode is pipelined (never materialized) and map-side partial
   aggregation collapses each task's output to ≤ ``buckets`` rows, so
   the shuffle is O(buckets × tasks) regardless of corpus size.
2. **Log-ratio model**: the two distributions join on bucket id (tiny:
   ``buckets`` rows), smooth (add-α), and collapse into ONE array row —
   the whole "model" is a broadcast of ``buckets`` doubles.
3. **Scoring** (:func:`dsir_scores`): a PURE PROJECTION — per document,
   fold ``log_ratio[bucket(token)]`` over the token array (HOF, zero
   UDF, zero shuffle).  Per-token terms are sorted before summation so
   the float sum is order-canonical: any engine replaying the same
   doubles gets the same bits.
4. **Selection** (:func:`gumbel_topk` / :func:`dsir_resample`):
   score + a DETERMINISTIC Gumbel perturbation (``-ln(-ln(u))`` with
   ``u`` from the portable 28-bit content hash of the document id) —
   Gumbel-top-k is exactly importance resampling without replacement,
   and seeding it from content hashes makes the sample reproducible
   across runs and engines.  Top-k compiles to TakeOrderedAndProject
   (per-partition top-k, no global sort); for huge k, cut by an
   approx-percentile threshold instead (``frac=`` path).

Hashing: ``portable=True`` (default) uses the md5-prefix 28-bit family
(bit-replayable by the SQL oracle); production corpora can pass
``portable=False`` for JVM ``xxhash64`` (~3× cheaper, same
statistics).

Reference parity: no pandera analogue; beyond-reference curation tier
next to operators/curation.py (which filters on intrinsic quality —
this module filters on similarity to a target distribution).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = [
    "bucket_distribution",
    "dsir_scores",
    "gumbel_topk",
    "dsir_resample",
]

_H28_RANGE = 1 << 28


def _tokens(text_col: str) -> C:
    """Lowercase alphanumeric tokens (same family as text.hash_embed,
    so oracles replay it with regexp_extract_all)."""
    return F.coalesce(
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"),
        F.expr("CAST(array() AS array<string>)"),
    )


def _bucket(tok: C, buckets: int, portable: bool) -> C:
    if portable:
        from .dedup import portable_hash28

        return F.pmod(portable_hash28(tok), F.lit(buckets))
    return F.pmod(F.xxhash64(tok), F.lit(buckets))


def bucket_distribution(
    df: DataFrame,
    text_col: str = "text",
    *,
    buckets: int = 4096,
    portable: bool = True,
) -> DataFrame:
    """Hashed-token counts ``(b, cnt)`` — at most ``buckets`` rows.
    Explode is pipelined and the partial agg bounds the shuffle at
    ``buckets`` rows per task."""
    if not 2 <= buckets <= 1 << 20:
        raise ValueError(f"buckets must be in [2, 2^20], got {buckets}")
    tok = F.explode(_tokens(text_col)).alias("__t")
    return (
        df.where(F.col(text_col).isNotNull())
        .select(tok)
        .select(_bucket(F.col("__t"), buckets, portable).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("cnt"))
    )


def _log_ratio_row(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    buckets: int,
    alpha: float,
    portable: bool,
) -> DataFrame:
    """One-row frame holding the length-``buckets`` array of
    ``ln(p_target(b) / p_raw(b))`` (add-α smoothed) — the broadcastable
    model.  Built from two bounded count frames + a range join; only
    ``buckets`` rows ever aggregate into the array."""
    spark = raw.sparkSession
    rc = bucket_distribution(
        raw, text_col, buckets=buckets, portable=portable
    ).withColumnRenamed("cnt", "rc")
    tc = bucket_distribution(
        target, text_col, buckets=buckets, portable=portable
    ).withColumnRenamed("cnt", "tc")
    grid = spark.range(buckets).select(F.col("id").cast("int").alias("b"))
    joined = (
        grid.join(F.broadcast(rc), "b", "left")
        .join(F.broadcast(tc), "b", "left")
        .select(
            "b",
            F.coalesce("rc", F.lit(0)).alias("rc"),
            F.coalesce("tc", F.lit(0)).alias("tc"),
        )
    )
    tot = joined.select(
        F.sum("rc").alias("rn"), F.sum("tc").alias("tn")
    )
    a = float(alpha)
    lr = joined.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log(
                (F.col("tc") + a) / (F.col("tn") + a * buckets)
            )
            - F.log(
                (F.col("rc") + a) / (F.col("rn") + a * buckets)
            )
        ).alias("lr"),
    )
    return lr.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("b", "lr"))),
            lambda s: s.getField("lr"),
        ).alias("__lr_arr")
    )


def dsir_scores(
    df: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    alpha: float = 0.5,
    portable: bool = True,
) -> DataFrame:
    """Per-document DSIR importance score: ``Σ_tokens
    ln(p_target(bucket) / p_raw(bucket))`` — positive means
    "target-like".  Adds ``n_toks`` and ``dsir_score`` to ``df``'s
    (id, text) projection.  Scoring is a projection against the
    broadcast log-ratio array; per-token terms are sorted before the
    fold so the double sum is order-canonical (replayable bit-exact).
    Documents with no tokens score 0.0.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    model = F.broadcast(
        _log_ratio_row(df, target, text_col, buckets, alpha, portable)
    )
    toks = _tokens(text_col)
    terms = F.transform(
        toks,
        lambda t: F.element_at(
            F.col("__lr_arr"),
            (_bucket(t, buckets, portable) + 1).cast("int"),
        ),
    )
    score = F.aggregate(
        F.array_sort(terms), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        df.crossJoin(model)
        .select(
            F.col(id_col),
            F.size(toks).alias("n_toks"),
            F.coalesce(score, F.lit(0.0)).alias("dsir_score"),
        )
    )


def _gumbel(id_col: str) -> C:
    """Deterministic Gumbel(0,1) noise from the portable content hash
    of the id: u ∈ (0,1) strictly, g = -ln(-ln(u)).  Same sample every
    run, every engine."""
    from .dedup import portable_hash28

    u = (portable_hash28(F.col(id_col).cast("string")) + 1).cast(
        "double"
    ) / F.lit(float(_H28_RANGE + 1))
    return -F.log(-F.log(u))


def gumbel_topk(
    scored: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    score_col: str = "dsir_score",
) -> DataFrame:
    """Gumbel-top-k selection = importance resampling without
    replacement (Vieira 2014): rank by ``score + Gumbel`` and keep k.
    Compiles to TakeOrderedAndProject.  Adds ``sel_score`` (the
    perturbed score) and ``sel_rank``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    g = _gumbel(id_col)
    out = scored.withColumn("sel_score", F.col(score_col) + g)
    top = out.orderBy(F.desc("sel_score"), F.asc(id_col)).limit(k)
    # ranking the k survivors is a k-row window, not a corpus sort
    w = Window.orderBy(F.desc("sel_score"), F.asc(id_col))
    return top.withColumn("sel_rank", F.row_number().over(w))


def dsir_resample(
    df: DataFrame,
    target: DataFrame,
    *,
    k: Optional[int] = None,
    frac: Optional[float] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    alpha: float = 0.5,
    portable: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Score + select in one call.  Exactly one of ``k`` (exact top-k,
    TakeOrderedAndProject — right when k fits one result set) or
    ``frac`` (approx-percentile THRESHOLD cut — the 100 TB path: one
    mergeable sketch agg finds the cutoff, then a pure filter keeps
    ~frac of rows; no ordering anywhere) must be given.
    """
    if (k is None) == (frac is None):
        raise ValueError("pass exactly one of k= or frac=")
    scored = dsir_scores(
        df, target, id_col=id_col, text_col=text_col,
        buckets=buckets, alpha=alpha, portable=portable,
    )
    if k is not None:
        return gumbel_topk(scored, k, id_col=id_col)
    if not 0.0 < frac < 1.0:
        raise ValueError(f"frac must be in (0,1), got {frac}")
    perturbed = scored.withColumn(
        "sel_score", F.col("dsir_score") + _gumbel(id_col)
    )
    cut = perturbed.agg(
        F.approx_percentile(
            "sel_score", F.lit(1.0 - frac), F.lit(int(accuracy))
        ).alias("c")
    )
    return perturbed.crossJoin(F.broadcast(cut)).where(
        F.col("sel_score") >= F.col("c")
    ).drop("c")
