"""Benchmark-contamination detection: corpus documents sharing n-grams
with an evaluation/benchmark set.

The standard decontamination step of a pre-training pipeline (GPT-3
appendix C, PaLM §C: drop training docs with >= k n-gram overlaps with
any eval example).  Spark shape: hash every document n-gram once
(codegen'd, 8-byte keys), explode both sides, inner-join on the gram
hash with the benchmark side broadcast (eval suites are tiny relative to
a 100 TB corpus), then a (doc, bench) groupBy-count with map-side
combine.  N-gram strings never shuffle; the corpus is scanned once.

``portable=True`` switches the gram hash to the md5-prefix family
(``dedup.portable_hash28``) so an external ANSI SQL oracle (DuckDB) can
replay the exact pair set; the default uses ``dedup.hash31``
(pmod(xxhash64) — cheaper, JVM-only).  Both stay below 2^63 in every
intermediate: ANSI-mode safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["contamination_pairs", "decontaminate"]


def _gram_hashes(text_col: str, n: int, portable: bool):
    from .dedup import hash31, portable_hash28, shingles

    h = portable_hash28 if portable else hash31
    return F.array_distinct(
        F.transform(shingles(F.col(text_col), n), h)
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    ngram_n: int = 5,
    min_shared: int = 3,
    broadcast_benchmark: bool = True,
    portable: bool = False,
) -> DataFrame:
    """(doc id, bench id, n_shared) for every corpus/benchmark pair
    sharing at least ``min_shared`` distinct word ``ngram_n``-grams.

    ``broadcast_benchmark=True`` (default) broadcasts the exploded
    benchmark grams — correct for real eval suites (MBs); disable for
    benchmark sets too large to broadcast and the join falls back to a
    shuffle keyed on the 8-byte gram hash.
    """
    bench_text = bench_text_col or text_col
    from .dedup import _ensure_parallelism

    # parallelism floor: hashing every word n-gram (md5 in the portable
    # family) is the heavy per-row compute and the broadcast join keeps
    # it in the scan stage — a small-file scan would run it all in one
    # task (no-op at real scale where the scan is already split)
    cg = _ensure_parallelism(corpus.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(_gram_hashes(text_col, ngram_n, portable)).alias("__g"),
    )
    bg = benchmark.select(
        F.col(bench_id_col),
        F.explode(_gram_hashes(bench_text, ngram_n, portable)).alias("__g"),
    )
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    return (
        cg.join(bg, "__g")
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    ngram_n: int = 5,
    min_shared: int = 3,
    broadcast_benchmark: bool = True,
    portable: bool = False,
) -> DataFrame:
    """Corpus minus every document contaminated by the benchmark set —
    :func:`contamination_pairs` distilled to a drop list + one anti-join
    (the corpus is never shuffled; AQE broadcasts the small drop list)."""
    pairs = contamination_pairs(
        corpus, benchmark,
        id_col=id_col, bench_id_col=bench_id_col, text_col=text_col,
        bench_text_col=bench_text_col, ngram_n=ngram_n,
        min_shared=min_shared, broadcast_benchmark=broadcast_benchmark,
        portable=portable,
    )
    drop = pairs.select(id_col).distinct()
    return corpus.join(drop, id_col, "left_anti")
