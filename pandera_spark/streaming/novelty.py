"""Streaming novelty filtering against a persisted Bloom index.

Cross-batch "have we seen this content before?" at ingest time: each
micro-batch is probed against a Bloom filter accumulated over ALL
previous batches, then contributes its own bits.  The index lives as an
append-only parquet of ``(word_idx, word)`` segments; readers bit_or
the segments back into one filter (exactly :func:`..operators.bloom.
bloom_merge` semantics), so

- **appends never conflict with reads** — no read-modify-write cycle,
  no versioned swap, safe under concurrent readers;
- **failure retries are harmless** — re-appending a batch's words is a
  bit_or no-op (Bloom union is idempotent), so foreachBatch's
  at-least-once replay cannot corrupt the index;
- the index size is bounded by ``segments * num_bits/32`` rows until
  :func:`compact_bloom_index` folds them (a maintenance job bounded by
  the FILTER size, never the data size).

False positives (design rate of the filter) mark genuinely-new content
as seen; false negatives never happen — the safe direction for a
novelty gate feeding a dedup pipeline, since flagged rows can still be
exact-checked downstream.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..operators.bloom import (
    _check_params,
    bloom_build,
    bloom_contains,
    bloom_dense,
)

__all__ = [
    "bloom_novelty_foreach_batch",
    "compact_bloom_index",
    "compact_minhash_index",
    "minhash_novelty_foreach_batch",
]


def _read_index(spark, index_path: str) -> Optional[DataFrame]:
    try:
        seg = spark.read.parquet(index_path)
    except AnalysisException:  # first batch: no index yet
        return None
    return seg.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_novelty_foreach_batch(
    col: str,
    index_path: str,
    num_bits: int,
    k: int,
    sink: Callable[[DataFrame, int], None],
    *,
    out_col: str = "seen_before",
    update_index: bool = True,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` callable:

    ``stream.writeStream.foreachBatch(bloom_novelty_foreach_batch(...))``

    Per micro-batch: (1) load + fold the persisted index, (2) hand
    ``sink`` the batch with a ``seen_before`` flag (all-false on the
    very first batch), (3) append the batch's own filter words.  The
    probe uses the dense broadcast path — right for filters up to the
    broadcast ceiling; swap in :func:`..operators.bloom.
    bloom_contains_sparse` beyond that."""
    _check_params(num_bits, k)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        words = _read_index(spark, index_path)
        if words is None:
            flagged = batch_df.withColumn(out_col, F.lit(False))
        else:
            dense = bloom_dense(words, num_bits)
            flagged = bloom_contains(
                batch_df, col, dense, num_bits, k, out_col=out_col
            )
        sink(flagged, batch_id)
        if update_index:
            bloom_build(batch_df, col, num_bits, k).write.mode(
                "append"
            ).parquet(index_path)

    return process


def compact_bloom_index(spark, index_path: str) -> int:
    """Fold the appended segments into one: collect the bit_or'd words
    (bounded by ``num_bits/32`` rows — the FILTER size, independent of
    how much data ever flowed through), APPEND the folded segment, then
    delete only the segment files that were folded.  Returns the
    compacted word count.

    Safe against a concurrently running stream: the set of input files
    is captured FIRST, the fold reads exactly those files, and the
    delete removes exactly those files — segments appended by
    ``foreachBatch`` between capture and delete are untouched and stay
    in the index.  Because the folded segment is appended before any
    delete, a concurrent reader always sees a superset of the captured
    bits (bit_or union makes the transient overlap harmless), never an
    empty directory.  A crash between append and delete merely leaves
    redundant segments for the next compaction — no bits are ever lost.
    """
    try:
        seg = spark.read.parquet(index_path)
    except AnalysisException:  # no index yet
        return 0
    files = seg.inputFiles()
    if not files:
        return 0
    rows = (
        spark.read.parquet(*files)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
        .collect()
    )
    spark.createDataFrame(rows, "word_idx int, word long").coalesce(
        1
    ).write.mode("append").parquet(index_path)
    # delete ONLY the folded inputs, via Hadoop FS (portable to HDFS/S3A)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for f in files:
        path = jvm.org.apache.hadoop.fs.Path(f)
        fs = path.getFileSystem(hconf)
        fs.delete(path, False)
    return len(rows)


def minhash_novelty_foreach_batch(
    id_col: str,
    text_col: str,
    index_path: str,
    sink: Callable[[DataFrame, int], None],
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    portable: bool = False,
    out_col: str = "near_dup",
    update_index: bool = True,
) -> Callable[[DataFrame, int], None]:
    """NEAR-duplicate novelty at ingest time — the MinHash analogue of
    :func:`bloom_novelty_foreach_batch` (which only catches EXACT
    content): each micro-batch is LSH-joined against the persisted
    banded signature index plus itself, rows with any near-dup
    candidate are flagged, and the batch's own signatures append.

    ``stream.writeStream.foreachBatch(minhash_novelty_foreach_batch(...))``

    Per batch: (1) load the signature index (id + band keys — text is
    never indexed), (2) flag via
    :func:`..operators.dedup.incremental_minhash_candidates`
    (new-vs-index + new-vs-new; a batch row with a near-dup ANYWHERE —
    earlier corpus or same batch — gets ``near_dup=True``; picking a
    canonical keeper is downstream dedup's job), (3) append the batch's
    signature rows.

    At-least-once replay: the FLAGS are exact on replay (the candidate
    join drops index rows whose id is in the current batch, so a
    retried batch never pairs with its own earlier append; flags come
    from a semi-join, so duplicate index rows from other batches cannot
    duplicate output rows).  The index accrues duplicate signature rows
    on retry — harmless for candidate generation, reclaimed by
    :func:`compact_minhash_index`.
    """
    from ..operators.dedup import (
        banded_minhash_frame,
        incremental_minhash_candidates,
        write_minhash_index,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            index = spark.read.parquet(index_path)
        except AnalysisException:  # first batch: empty index, same shape
            index = banded_minhash_frame(
                batch_df.limit(0), id_col, text_col,
                num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
                portable=portable,
            )
        cand = incremental_minhash_candidates(
            batch_df, index, id_col, text_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            portable=portable,
        )
        flagged_ids = (
            cand.select(F.col("id_a").alias(id_col))
            .unionByName(cand.select(F.col("id_b").alias(id_col)))
            .distinct()
            .withColumn(out_col, F.lit(True))
        )
        out = batch_df.join(flagged_ids, id_col, "left").withColumn(
            out_col, F.coalesce(F.col(out_col), F.lit(False))
        )
        sink(out, batch_id)
        if update_index:
            write_minhash_index(
                batch_df, id_col, text_col, index_path,
                num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
                portable=portable, mode="append",
            )

    return process


def compact_minhash_index(spark, index_path: str) -> int:
    """Drop duplicate signature rows accrued by at-least-once replays:
    capture the segment files, append the distinct fold, delete only
    the captured files — the same concurrent-stream-safe
    append-then-delete protocol as :func:`compact_bloom_index` (rows
    appended between capture and delete survive; signature-row
    duplication is harmless in the interim).  Returns the compacted row
    count."""
    try:
        seg = spark.read.parquet(index_path)
    except AnalysisException:
        return 0
    files = seg.inputFiles()
    if not files:
        return 0
    folded = spark.read.parquet(*files).distinct()
    folded.write.mode("append").parquet(index_path)
    n = folded.count()
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for f in files:
        path = jvm.org.apache.hadoop.fs.Path(f)
        fs = path.getFileSystem(hconf)
        fs.delete(path, False)
    return n
