"""Document chunking: fixed-size overlapping windows over text.

The preprocessing step between a curated corpus and a training / RAG
pipeline: long documents become sequences of bounded chunks with a
configurable overlap so no boundary context is lost.  Both units —
characters and whitespace tokens — are pure Column expressions
(``sequence`` + ``posexplode`` + ``substring`` / ``slice``): the chunk
layout is a deterministic function of (text, size, overlap), replayable
by any SQL engine, and the whole operator is a narrow projection — no
shuffle, no UDF, scan-bound at any corpus size.

Chunk layout: chunk ``i`` starts at offset ``i * (size - overlap)``;
``n_chunks = 1`` if the document fits in one window, else
``ceil((len - size) / step) + 1`` so the final chunk always reaches the
end of the document (it may be shorter than ``size``).
"""

from __future__ import annotations

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_text", "chunk_stats"]


def _n_chunks(n: C, size: int, step: int) -> C:
    """Number of chunks for element count ``n`` (0 chunks for empty)."""
    return (
        F.when(n <= 0, F.lit(0))
        .when(n <= size, F.lit(1))
        .otherwise(F.ceil((n - F.lit(size)) / F.lit(step)) + 1)
        .cast("int")
    )


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    size: int = 512,
    overlap: int = 64,
    unit: str = "chars",
    out_prefix: str = "chunk",
) -> DataFrame:
    """Explode each document into overlapping chunks.

    Returns ``(id, <prefix>_idx, <prefix>, n_chunks)`` — one row per
    chunk, 0-based index.  ``unit='chars'`` windows the raw string;
    ``unit='tokens'`` windows the whitespace token sequence and rejoins
    with single spaces.  Null/empty documents produce no rows.
    """
    if unit not in ("chars", "tokens"):
        raise ValueError(f"unit must be 'chars' or 'tokens', got {unit!r}")
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError(
            f"need size > 0 and 0 <= overlap < size, got {size=} {overlap=}"
        )
    step = size - overlap
    text = F.col(text_col)
    if unit == "chars":
        n = F.length(text)
        base = df.filter(text.isNotNull()).select(
            id_col, text.alias("__t"), _n_chunks(n, size, step).alias("n_chunks")
        )
        piece = F.substring(
            F.col("__t"), F.col("__i") * step + 1, size
        )
    else:
        toks = F.filter(
            F.split(text, r"\s+"), lambda t: F.length(t) > 0
        )
        n = F.size(toks)
        base = df.filter(text.isNotNull()).select(
            id_col, toks.alias("__t"), _n_chunks(n, size, step).alias("n_chunks")
        )
        piece = F.array_join(
            F.slice(F.col("__t"), F.col("__i") * step + 1, size), " "
        )
    return (
        base.filter(F.col("n_chunks") > 0)
        .select(
            id_col,
            "n_chunks",
            "__t",
            F.explode(
                F.sequence(F.lit(0), F.col("n_chunks") - 1)
            ).alias("__i"),
        )
        .select(
            id_col,
            F.col("__i").alias(f"{out_prefix}_idx"),
            piece.alias(out_prefix),
            "n_chunks",
        )
    )


def chunk_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    size: int = 512,
    overlap: int = 64,
    unit: str = "chars",
) -> DataFrame:
    """One-row corpus summary of a chunking configuration: document and
    chunk totals plus chunk-length distribution — the sizing check run
    before materializing the exploded corpus."""
    chunks = chunk_text(
        df, id_col, text_col, size=size, overlap=overlap, unit=unit
    )
    clen = (
        F.length("chunk") if unit == "chars"
        else F.size(F.split(F.col("chunk"), r"\s+"))
    )
    return chunks.agg(
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.min(clen).cast("long").alias("min_len"),
        F.max(clen).cast("long").alias("max_len"),
        F.round(F.avg(clen), 6).alias("avg_len"),
    )
