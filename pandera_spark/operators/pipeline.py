"""The assembled corpus-preparation pipeline: raw documents in,
training-ready shards out.

One composition of the engine's own stages — no new semantics, just the
canonical ordering with a per-stage attrition report:

1. quality gate (:func:`..text.gopher_gate` — rule-annotated keep)
2. optional LM affinity filter (:func:`..text.lm_score` vs a reference
   corpus, CCNet-style)
3. semantic dedup (:func:`..text.hash_embed` →
   :func:`..similarity.embedding_near_dups` →
   :func:`..clustering.apply_dedup`)
4. chunking (:func:`..chunking.chunk_text`)
5. shard + epoch-order assignment (:func:`..sharding`), ready for
   :func:`..sharding.write_shards`-style partitioned writes.

Every stage is deterministic (hash-based, no RNG), so the whole
pipeline is replayable end-to-end; every intermediate is a lazy
DataFrame — nothing materializes until the caller acts.  At 100 TB the
stage costs are the documented per-operator shapes (projections +
bounded-shuffle aggregations + one banded self-join).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["prepare_training_corpus"]


def prepare_training_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    min_stop_hits: int = 0,
    lm_reference: Optional[DataFrame] = None,
    min_avg_logprob: Optional[float] = None,
    dedup_threshold: float = 0.9,
    embed_dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    chunk_size: int = 2048,
    chunk_overlap: int = 128,
    n_shards: int = 64,
    epoch: int = 0,
    gate_kwargs: Optional[dict] = None,
    stage_storage: Optional[str] = "MEMORY_AND_DISK",
) -> dict:
    """Run the canonical preparation pipeline; returns
    ``{"kept", "chunks", "report"}``:

    - ``kept`` — the surviving documents (gate + optional LM filter +
      semantic dedup applied);
    - ``chunks`` — overlapping chunks of the kept corpus with
      ``(shard, sort_key)`` columns assigned per chunk id, ready to
      ``repartition(shard).sortWithinPartitions(...).write``;
    - ``report`` — one row per stage: ``(stage, n_docs)`` attrition
      counts (computed lazily; union of 1-row aggregations).

    ``stage_storage`` (a ``pyspark.StorageLevel`` attribute name)
    persists the two reused stage outputs — the gated corpus and the
    deduped survivors.  The default ``"MEMORY_AND_DISK"`` spills
    rather than evicts, so each stage executes ONCE; without a
    persist, each stage's lineage recomputes per consumer (the gate
    runs ~3×: once under the embed→LSH→dedup chain, once under the
    chunker, once for its report row), which at 100 TB means three
    full corpus reads instead of one — the expensive default
    (VERDICT r7 item 4).  Pass ``None`` to opt out and keep the
    pipeline fully lazy for cases where even spilled executor storage
    can't hold a stage (same trade documented on
    :func:`..similarity._materialize`); callers that persist should
    ``unpersist()`` the returned frames when done.
    """
    from .chunking import chunk_text
    from .clustering import apply_dedup
    from .sharding import epoch_sort_key, shard_assign
    from .similarity import _materialize, embedding_near_dups
    from .text import gopher_gate, hash_embed, lm_score

    stages: list[tuple[str, DataFrame]] = [("input", docs)]

    gate = gopher_gate(
        docs, id_col, text_col,
        min_words=min_words, min_stop_hits=min_stop_hits,
        **(gate_kwargs or {}),
    )
    gated = docs.join(
        gate.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    )
    if lm_reference is None:
        # gated is scanned by the embed chain, the chunker, and its
        # report row — persist it once here (with an LM filter the
        # post-filter frame below is the reused one instead)
        gated = _materialize(gated, stage_storage)
    stages.append(("quality_gate", gated))

    if lm_reference is not None:
        if min_avg_logprob is None:
            raise ValueError(
                "min_avg_logprob is required when lm_reference is given"
            )
        from .text import unigram_model

        scored = lm_score(
            gated, unigram_model(lm_reference, text_col),
            id_col, text_col,
        )
        gated = gated.join(
            scored.filter(
                F.col("avg_logprob") >= float(min_avg_logprob)
            ).select(id_col),
            id_col,
            "left_semi",
        )
        gated = _materialize(gated, stage_storage)
        stages.append(("lm_filter", gated))

    emb = hash_embed(gated, id_col, text_col, dim=embed_dim).select(
        id_col, F.col("embedding").cast("array<double>").alias("embedding")
    )
    # the banded frame is scanned by BOTH sides of the LSH self-join;
    # without its own persist each side re-runs hash_embed (the md5 pass
    # over the gated corpus) — same stage_storage knob, same 100 TB
    # opt-out (None) as the stage persists above
    pairs = embedding_near_dups(
        emb, id_col=id_col, threshold=dedup_threshold, dim=embed_dim,
        n_planes=n_planes, bands=bands, corpus_storage=stage_storage,
    ).select("id_a", "id_b")
    # kept feeds the chunker, the caller, and its own report row
    kept = _materialize(apply_dedup(gated, pairs, id_col=id_col),
                        stage_storage)
    stages.append(("semantic_dedup", kept))

    chunks = chunk_text(
        kept, id_col, text_col, size=chunk_size, overlap=chunk_overlap
    ).withColumn(
        "__cid",
        F.concat_ws(":", F.col(id_col).cast("string"), F.col("chunk_idx")),
    )
    chunks = epoch_sort_key(
        shard_assign(chunks, "__cid", n_shards), "__cid", epoch
    ).drop("__cid")

    report = None
    for name, frame in stages:
        row = frame.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs")
        ).select(F.lit(name).alias("stage"), "n_docs")
        report = row if report is None else report.unionByName(row)

    return {"kept": kept, "chunks": chunks, "report": report}
