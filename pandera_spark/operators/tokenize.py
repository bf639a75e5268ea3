"""Distributed BPE tokenizer training over a document corpus.

Byte-pair encoding (Sennrich et al., ACL 2016) is the vocabulary
construction step of every modern LM pipeline.  The naive plan — keep
the corpus as symbol sequences and rescan it per merge — is hopeless at
100 TB (1 full scan × thousands of merges).  The classic fix, done
Spark-first here:

1. **Corpus → word-frequency table, ONCE** (:func:`word_counts`): a
   single groupBy over whitespace words.  By Heaps' law the distinct
   vocabulary grows ~O(corpus^0.5), so the word table is millions of
   rows regardless of corpus bytes — THIS is what merge iterations
   touch; the corpus is never read again.
2. **Pair counting** (:func:`bpe_pair_counts`): adjacent symbol pairs
   of each word, weighted by word frequency — slice+zip projection,
   explode, one groupBy.  Pairs are labeled ``left || '|' || right`` so
   multi-character symbols stay unambiguous.
3. **Merge loop** (:func:`bpe_train`): per round, the argmax pair is
   one ``orderBy(...).limit(1)`` — Spark plans it as
   TakeOrderedAndProject (per-partition top-1, no global sort; ties
   break to the smallest pair label, so training is deterministic) —
   and applying the merge to every word is a pure
   projection: a Catalyst ``aggregate`` fold over the symbol array
   that replaces left-to-right non-overlapping (a, b) runs — zero UDF.
   The frame is localCheckpoint'ed every few rounds to stop plan-depth
   growth (each merge adds a fold on top of the last).
4. **Encoding** (:func:`bpe_encode`): replays the learned merge list in
   rank order over any text column — same fold, also UDF-free, also
   checkpoint-gated.

Symbols start as characters (no end-of-word marker — the word table
already encodes boundaries; a marker variant is a presentation detail
the tests pin down).  Determinism: every argmax tie-breaks on the
lexicographically smallest pair label, so the learned merge table is a
pure function of the corpus.

Reference parity: no pandera analogue; beyond-reference LLM-pipeline
tier next to operators/text.py (which consumes tokenizations; this
module produces them).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_counts",
    "bpe_pair_counts",
    "bpe_train",
    "bpe_encode",
    "save_merges",
    "load_merges",
]


def word_counts(
    df: DataFrame, text_col: str = "text", *, lowercase: bool = False
) -> DataFrame:
    """Whitespace word-frequency table: ``(word, n)`` — the ONE corpus
    scan of BPE training.  Empty fragments from repeated whitespace are
    dropped."""
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    w = F.explode(F.split(F.trim(txt), r"\s+")).alias("word")
    return (
        df.where(txt.isNotNull())
        .select(w)
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _merge_fold(syms: C, left: C, right: C, merged: C) -> C:
    """Replace left-to-right non-overlapping (left, right) adjacencies
    in a symbol array with the merged symbol — one Catalyst fold, the
    accumulator carrying (emitted prefix, pending symbol)."""
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc: C, s: C) -> C:
        return (
            F.when(
                acc.pend.isNull(),
                F.struct(acc.out.alias("out"), s.alias("pend")),
            )
            .when(
                (acc.pend == left) & (s == right),
                F.struct(
                    F.concat(acc.out, F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc.out, F.array(acc.pend)).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    def finish(acc: C) -> C:
        return F.when(acc.pend.isNull(), acc.out).otherwise(
            F.concat(acc.out, F.array(acc.pend))
        )

    return F.aggregate(syms, acc0, step, finish)


def bpe_pair_counts(words: DataFrame, *, sym_col: str = "syms") -> DataFrame:
    """Adjacent-pair frequencies over a symbolized word table:
    ``(left, right, pair_count)`` where ``pair_count`` sums the word
    frequencies of every (possibly repeated) adjacency.  Projection +
    explode + one groupBy; the exploded stream is ~symbols-per-word ×
    vocab rows, never corpus-sized."""
    s = F.col(sym_col)
    n = F.size(s)
    pairs = F.zip_with(
        F.slice(s, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(s, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        words.where(n >= 2)
        .select(F.col("n"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("n").alias("pair_count"))
    )


def _symbolize(words: DataFrame) -> DataFrame:
    return words.select(
        F.col("word"), F.col("n"), F.split(F.col("word"), "").alias("syms")
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 32,
    lowercase: bool = False,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> List[Tuple[int, str, str, int]]:
    """Learn a BPE merge list: ``[(rank, left, right, pair_count), ...]``.

    One corpus scan (word table, persisted), then per merge round ONE
    aggregate (deterministic argmax: max count, ties to the smallest
    pair label) and ONE projection fold applying the merge.  Plan depth
    is cut by ``localCheckpoint`` every ``checkpoint_every`` rounds.
    Stops early when no pair reaches ``min_pair_count``.  Only the
    n_merges winner rows are ever collected.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    # keep the persisted frame in its own name: `words` is rebound to
    # derived frames each merge round, so unpersisting `words` would
    # no-op and leak the cached word table for the session's lifetime
    base_words = _symbolize(
        word_counts(df, text_col, lowercase=lowercase)
    ).persist()
    words = base_words
    try:
        merges: List[Tuple[int, str, str, int]] = []
        for rank in range(1, n_merges + 1):
            pc = bpe_pair_counts(words)
            # TakeOrderedAndProject: per-partition top-1 merged on the
            # driver — no global sort, one row collected
            top_rows = pc.orderBy(
                F.desc("pair_count"), F.asc("left"), F.asc("right")
            ).limit(1).collect()
            top = top_rows[0] if top_rows else None
            if top is None or top["pair_count"] < min_pair_count:
                break
            left, right = top["left"], top["right"]
            merges.append((rank, left, right, int(top["pair_count"])))
            words = words.select(
                "word", "n",
                _merge_fold(
                    F.col("syms"), F.lit(left), F.lit(right),
                    F.lit(left + right),
                ).alias("syms"),
            )
            if rank % checkpoint_every == 0:
                words = words.localCheckpoint(eager=True)
        return merges
    finally:
        base_words.unpersist()


def bpe_encode(
    df: DataFrame,
    merges: Sequence[Tuple[int, str, str, int]],
    text_col: str = "text",
    *,
    out_col: str = "tokens",
    lowercase: bool = False,
    checkpoint_every: Optional[int] = 8,
) -> DataFrame:
    """Tokenize a text column with a learned merge list.

    Splits to words, symbols to characters, then replays every merge in
    rank order (the BPE invariant) as stacked Catalyst folds; tokens
    are the per-word symbol arrays flattened back in document order.
    ``checkpoint_every`` bounds plan depth for long merge lists (None
    disables — fine below ~16 merges).
    """
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    wordsyms = F.transform(
        F.filter(
            F.split(F.trim(txt), r"\s+"), lambda w: F.length(w) > 0
        ),
        lambda w: F.split(w, ""),
    )
    def _apply(left: str, right: str):
        # closure factory: a default-arg lambda would change the arity
        # pyspark infers for the HOF (same gotcha as numeric._below)
        return lambda syms: _merge_fold(
            syms, F.lit(left), F.lit(right), F.lit(left + right)
        )

    out = df.withColumn("__ws", wordsyms)
    for i, (_rank, left, right, _cnt) in enumerate(
        sorted(merges, key=lambda m: m[0]), start=1
    ):
        out = out.withColumn(
            "__ws", F.transform(F.col("__ws"), _apply(left, right))
        )
        if checkpoint_every and i % checkpoint_every == 0:
            out = out.localCheckpoint(eager=False)
    return out.withColumn(out_col, F.flatten(F.col("__ws"))).drop("__ws")


def save_merges(
    spark, merges: "Sequence[Tuple[int, str, str, int]]", path: str,
    *, mode: str = "overwrite",
) -> None:
    """Persist a learned merge list as parquet — train once on the big
    cluster, encode anywhere (`bpe_encode(df, load_merges(spark, p))`).
    Schema: (rank int, left string, right string, pair_count long)."""
    spark.createDataFrame(
        [(int(r), l, rt, int(c)) for r, l, rt, c in merges],
        "rank int, left string, right string, pair_count long",
    ).coalesce(1).write.mode(mode).parquet(path)


def load_merges(spark, path: str) -> List[Tuple[int, str, str, int]]:
    """Load a merge list saved by :func:`save_merges`, in rank order."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [
        (int(r["rank"]), r["left"], r["right"], int(r["pair_count"]))
        for r in rows
    ]
