"""Distributed Bloom-filter membership index.

The missing piece between exact dedup (needs the full digest set) and
LSH (needs signatures): a *constant-size* membership summary of a corpus
that new batches can be probed against without rescanning the corpus —
the classic guard for incremental ingest ("skip documents we have
almost certainly seen") and cross-corpus contamination screens.

Design for 100 TB:
- the filter is built with ONE hash-only aggregation: each row
  contributes ``k`` bit positions (double hashing over an md5-derived
  pair, no RNG, no UDF), exploded to ``(word_index, bit_mask)`` and
  combined with a map-side-partial ``bit_or`` groupBy.  The shuffle
  carries at most ``num_bits / 32`` rows TOTAL (bounded by the filter
  size, not the data size).
- membership probing against a corpus-sized filter uses the **dense
  broadcast** path: the filter collapses to a single ``array<bigint>``
  row, broadcast to every executor, and the probe is a pure projection
  (``forall`` over the k positions) — zero shuffle, zero action.
  A 10^9-item / 1% filter is ~1.2 GB of bits; under the default 8 GB
  broadcast ceiling.  Beyond that, :func:`bloom_contains_sparse` probes
  via a shuffle join keyed on word index instead.
- all arithmetic is bounded (< 2^41) — ANSI-safe — and every step is
  bit-replayable by an external ANSI SQL oracle (md5 prefix hashes,
  integer div/mod, 32-bit words in BIGINT lanes with ``bit_or``), so
  the driver's DuckDB harness value-checks the filter bit-for-bit.

False negatives are impossible by construction; false-positive rate for
``n`` items is ``(1 - exp(-k*n/m))^k`` with ``m = num_bits``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_parameters",
    "bloom_build",
    "bloom_dense",
    "bloom_merge",
    "bloom_contains",
    "bloom_contains_sparse",
]

#: bits per word.  Words live in BIGINT lanes but only the low 32 bits
#: are used, so ``1 << (pos % 32)`` never touches the sign bit — the
#: same shift/mask arithmetic is portable to any ANSI SQL engine.
_WORD_BITS = 32

_MAX_K = 16


def _mask_lut() -> C:
    """array<long> literal of the 32 single-bit masks; ``element_at(lut,
    bit+1)`` replaces a variable-distance shiftleft (whose shift argument
    must be a literal in the DataFrame API)."""
    return F.array(*[F.lit(1 << b).cast("long") for b in range(_WORD_BITS)])


def _bit_mask(pos: C) -> C:
    return F.element_at(_mask_lut(), (F.pmod(pos, F.lit(32)) + 1).cast("int"))


def _check_params(num_bits: int, k: int) -> None:
    if num_bits < _WORD_BITS or num_bits > (1 << 30):
        raise ValueError(f"num_bits must be in [32, 2^30], got {num_bits}")
    if not 1 <= k <= _MAX_K:
        raise ValueError(f"k must be in [1, {_MAX_K}], got {k}")


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal ``(num_bits, k)`` for ``n_items`` at false-positive rate
    ``fpp``: ``m = -n ln(p) / ln(2)^2`` rounded up to a whole word,
    ``k = (m/n) ln 2`` clamped to [1, 16]."""
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + _WORD_BITS - 1) // _WORD_BITS) * _WORD_BITS
    m = min(max(m, _WORD_BITS), 1 << 30)
    k = max(1, min(_MAX_K, int(round(m / n_items * math.log(2)))))
    return m, k


def _hash_pair(col: C) -> tuple[C, C]:
    """(h1, h2) for double hashing: two independent 28-bit values from
    the md5 hex digest (digits 1-7 and 8-14), h2 forced odd so the k
    probe positions stay distinct for power-of-two-free ``num_bits``.
    md5 over UTF-8 is bit-identical across engines — the portability
    anchor (same trick as :func:`..dedup.portable_hash28`)."""
    digest = F.md5(col.cast("string"))
    h1 = F.conv(F.substring(digest, 1, 7), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 8, 7), 16, 10).cast("long").bitwiseOR(
        F.lit(1)
    )
    return h1, h2


def _positions(col: C, num_bits: int, k: int) -> C:
    """array<long> of the k probe bit positions for one value:
    ``(h1 + i*h2) % num_bits``.  Max intermediate ``h1 + 15*h2``
    < 2^28 + 16*2^28 < 2^33 — ANSI-safe."""
    h1, h2 = _hash_pair(col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (h1 + i.cast("long") * h2) % F.lit(num_bits),
    )


def bloom_build(df: DataFrame, col: str, num_bits: int, k: int) -> DataFrame:
    """Build the filter: ``(word_idx int, word long)`` sparse rows, one
    per non-empty 32-bit word.  One explode + one bit_or groupBy whose
    shuffle is bounded by ``num_bits/32`` rows regardless of input size."""
    _check_params(num_bits, k)
    pos = F.explode(_positions(F.col(col), num_bits, k)).alias("__pos")
    sparse = df.filter(F.col(col).isNotNull()).select(pos).select(
        F.shiftright(F.col("__pos"), 5).cast("int").alias("word_idx"),
        _bit_mask(F.col("__pos")).alias("__mask"),
    )
    return sparse.groupBy("word_idx").agg(F.bit_or("__mask").alias("word"))


def bloom_dense(words: DataFrame, num_bits: int) -> DataFrame:
    """Collapse sparse ``(word_idx, word)`` rows into ONE row holding the
    dense ``array<long> bloom_words`` (missing words -> 0) — the
    broadcastable form.  The single-reducer collect_list is bounded by
    the filter size (``num_bits/32`` entries), never the data size."""
    num_words = (num_bits + _WORD_BITS - 1) // _WORD_BITS
    m = F.map_from_entries(
        F.collect_list(F.struct("word_idx", "word"))
    )
    return words.groupBy().agg(m.alias("__m")).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_words - 1)),
            # try_element_at: absent words are expected (sparse filter)
            # and map element_at raises on missing keys under ANSI mode
            lambda i: F.coalesce(
                F.try_element_at(F.col("__m"), i.cast("int")),
                F.lit(0).cast("long"),
            ),
        ).alias("bloom_words")
    )


def bloom_merge(*word_frames: DataFrame) -> DataFrame:
    """Union several sparse filters (built with identical ``num_bits``/
    ``k``) into one: bit_or by word index.  Bloom union is exact — the
    merged filter is bit-identical to building over the concatenated
    corpora, which makes per-partition / per-day filters composable."""
    if not word_frames:
        raise ValueError("need at least one filter")
    out = word_frames[0]
    for w in word_frames[1:]:
        out = out.unionByName(w)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def _probe_expr(col: C, words: C, num_bits: int, k: int) -> C:
    return F.forall(
        _positions(col, num_bits, k),
        lambda p: (
            F.element_at(words, (F.shiftright(p, 5) + 1).cast("int"))
            .bitwiseAND(_bit_mask(p))
            != 0
        ),
    )


def bloom_contains(
    df: DataFrame,
    col: str,
    dense: DataFrame,
    num_bits: int,
    k: int,
    *,
    out_col: str = "might_contain",
) -> DataFrame:
    """Probe path for corpus-scale inputs: broadcast the one-row dense
    filter, flag every probe row map-side (``forall`` over the k bit
    tests).  No shuffle, no action; nulls probe to false."""
    _check_params(num_bits, k)
    joined = df.crossJoin(F.broadcast(dense))
    flag = F.when(
        F.col(col).isNotNull(),
        _probe_expr(F.col(col), F.col("bloom_words"), num_bits, k),
    ).otherwise(F.lit(False))
    return joined.withColumn(out_col, flag).drop("bloom_words")


def bloom_contains_sparse(
    df: DataFrame,
    col: str,
    id_col: str,
    words: DataFrame,
    num_bits: int,
    k: int,
    *,
    out_col: str = "might_contain",
) -> DataFrame:
    """Probe path for filters too big to broadcast: explode the k
    positions, shuffle-join on ``word_idx`` (8-byte keys), and AND the
    bit tests back per probe id.  Carries only ``(id, word_idx, mask)``
    through the shuffle — the probed payload never moves.  ``id_col``
    must functionally determine the probed value (the verdict is
    aggregated per id); use the dense path when rows lack a usable
    key."""
    _check_params(num_bits, k)
    probes = (
        df.select(id_col, F.col(col).alias("__val"))
        .filter(F.col("__val").isNotNull())
        .select(
            id_col,
            F.explode(_positions(F.col("__val"), num_bits, k)).alias("__pos"),
        )
        .select(
            id_col,
            F.shiftright(F.col("__pos"), 5).cast("int").alias("word_idx"),
            _bit_mask(F.col("__pos")).alias("__mask"),
        )
    )
    hit = probes.join(words, "word_idx", "left").select(
        id_col,
        (
            F.coalesce(F.col("word"), F.lit(0).cast("long")).bitwiseAND(F.col("__mask")) != 0
        ).alias("__hit"),
    )
    verdict = hit.groupBy(id_col).agg(F.min("__hit").alias(out_col))
    return df.join(verdict, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(False))
    )
