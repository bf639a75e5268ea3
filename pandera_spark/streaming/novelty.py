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

__all__ = ["bloom_novelty_foreach_batch", "compact_bloom_index"]


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
