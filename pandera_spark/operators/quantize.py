"""Scalar int8 quantization for embedding columns.

A float32 embedding column dominates the storage and shuffle budget of
an embedding table (a 1024-dim float corpus is 4 KB/row before
anything else).  Per-vector max-abs scalar quantization cuts that 4×:
``q_i = floor(x_i / scale * 127 + 0.5)`` with ``scale =
max_i |x_i|`` — every component lands in [-127, 127] and the vector is
recovered as ``q_i * scale / 127``.  Dot products survive quantization
as ``dot(a, b) ≈ dot(q_a, q_b) * scale_a * scale_b / 127²``, so
candidate generation and ranking can run entirely in the integer
domain (4× less scan/shuffle bandwidth, SIMD-friendly integer
multiply-adds on the JVM side) with optional float rescoring of the
few survivors.

Everything here is a pure projection (``transform``/``aggregate``
higher-order functions, zero UDF, zero shuffle) except the top-k,
which inherits the float path's shape: brute force as the exact
baseline, banded LSH / IVF pruning (operators/similarity.py,
operators/ann_ivf.py) as the scale path — quantization composes with
either, it does not replace them.

Per-VECTOR scales (not per-dimension) keep the operator stateless: no
global min/max aggregation pass, no model row to broadcast, and a new
document can be quantized without seeing the corpus — the property
that makes this safe in a streaming ingest path.  ``floor(x + 0.5)``
is used instead of ``round`` because its half-up-everywhere semantics
are identical in Spark and the SQL oracle engines (``round`` ties
differ by engine and sign).

Reference parity: no pandera analogue; beyond-reference ANN tier next
to operators/similarity.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = [
    "quantize_embeddings",
    "dequantize",
    "quantized_dot",
    "quantization_error_report",
    "quantized_topk",
]

_QMAX = 127  # int8 symmetric range


def _maxabs(vec: C) -> C:
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
    )


def quantize_embeddings(
    df: DataFrame,
    col: str = "embedding",
    *,
    q_col: str = "q",
    scale_col: str = "q_scale",
    keep_vec: bool = False,
) -> DataFrame:
    """Add ``q`` (array<int> in [-127, 127]) and ``q_scale`` (double).

    Pure projection — no aggregation, no shuffle, safe row-at-a-time in
    a stream.  A zero/empty vector quantizes to all-zeros with scale 0
    (dequantizes back to zeros).  Null vectors stay null.  With
    ``keep_vec=False`` the float column is dropped — the 4× storage
    saving is the point.
    """
    vec = F.col(col)
    scale = _maxabs(vec)
    quant = F.transform(
        vec,
        lambda x: F.when(scale > 0, F.floor(
            x.cast("double") / scale * _QMAX + F.lit(0.5)
        ).cast("int")).otherwise(F.lit(0)),
    )
    out = df.withColumn(scale_col, F.when(vec.isNotNull(), scale)).withColumn(
        q_col, F.when(vec.isNotNull(), quant)
    )
    return out if keep_vec else out.drop(col)


def dequantize(q: C, scale: C) -> C:
    """Recover the float vector: ``q_i * scale / 127`` (array<double>)."""
    return F.transform(
        q, lambda x: x.cast("double") * scale / F.lit(float(_QMAX))
    )


def quantized_dot(qa: C, qb: C, scale_a: C, scale_b: C) -> C:
    """Approximate float dot from integer codes: integer multiply-add
    fold, ONE float multiply at the end — the hot-loop stays integral."""
    idot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return idot.cast("double") * scale_a * scale_b / F.lit(
        float(_QMAX * _QMAX)
    )


def quantization_error_report(
    df: DataFrame,
    col: str = "embedding",
) -> DataFrame:
    """One-row fidelity report: distribution of cosine(original,
    dequantized) across the corpus — the number to check before
    switching retrieval to the integer domain.  A projection plus ONE
    aggregate; only 4 scalars reach the driver side of the plan."""
    vec = F.col(col).cast("array<double>")
    scale = _maxabs(vec)
    deq = F.transform(
        vec,
        lambda x: F.when(
            scale > 0,
            F.floor(x / scale * _QMAX + F.lit(0.5)) * scale
            / F.lit(float(_QMAX)),
        ).otherwise(F.lit(0.0)),
    )
    dot = F.aggregate(
        F.zip_with(vec, deq, lambda x, y: x * y),
        F.lit(0.0), lambda a, v: a + v,
    )
    n2a = F.aggregate(vec, F.lit(0.0), lambda a, v: a + v * v)
    n2b = F.aggregate(deq, F.lit(0.0), lambda a, v: a + v * v)
    cos = F.when(
        (n2a > 0) & (n2b > 0), dot / F.sqrt(n2a) / F.sqrt(n2b)
    )
    scored = df.where(vec.isNotNull()).select(cos.alias("__cos"))
    return scored.agg(
        F.count("__cos").alias("n_vectors"),
        F.min("__cos").alias("min_cos"),
        F.avg("__cos").alias("avg_cos"),
        F.max("__cos").alias("max_cos"),
    )


def quantized_topk(
    corpus: DataFrame,
    query_ids: Sequence[int],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    max_queries: Optional[int] = 10_000,
) -> DataFrame:
    """Integer-domain cosine top-k: quantize once, rank by
    ``quantized_dot / (|q_a| |q_b|)``.

    Same exact-baseline shape as ``similarity.brute_force_topk`` (the
    query side is a broadcast literal filter; candidate scan is
    O(|Q|×|C|)) but the per-pair work is an integer fold — compose
    with LSH/IVF bucketing for the 100 TB path exactly as the float
    version does.  Ties and the quantized-cosine ordering are made
    deterministic by (score DESC, neighbor_id ASC).

    Returns (query_id, rank, neighbor_id, qcos) — ``qcos`` is the
    integer-domain cosine (scales cancel in cosine, so it is exactly
    the cosine of the integer code vectors).
    """
    if max_queries is not None and len(query_ids) > max_queries:
        raise ValueError(
            f"{len(query_ids)} query ids > max_queries={max_queries}; "
            "use the LSH/IVF scale path for large query sides"
        )
    q = quantize_embeddings(corpus, vec_col, keep_vec=False)
    ids = [int(i) for i in query_ids]
    queries = q.where(F.col(id_col).isin(ids)).select(
        F.col(id_col).alias("query_id"), F.col("q").alias("__qq")
    )
    pairs = F.broadcast(queries).crossJoin(
        q.select(F.col(id_col).alias("neighbor_id"), F.col("q").alias("__qc"))
    ).where(F.col("query_id") != F.col("neighbor_id"))
    idot = F.aggregate(
        F.zip_with("__qq", "__qc", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"), lambda a, v: a + v,
    )

    def _n2(c: str) -> C:
        return F.aggregate(
            F.col(c), F.lit(0).cast("long"),
            lambda a, v: a + (v * v).cast("long"),
        )

    qcos = F.when(
        (_n2("__qq") > 0) & (_n2("__qc") > 0),
        idot.cast("double") / F.sqrt(_n2("__qq").cast("double"))
        / F.sqrt(_n2("__qc").cast("double")),
    ).otherwise(F.lit(0.0))
    scored = pairs.select("query_id", "neighbor_id", qcos.alias("qcos"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qcos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qcos")
    )
