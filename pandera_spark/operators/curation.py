"""Training-data curation operators: deterministic splits, dataset
mixing, stratified sampling, quantile binning.

Beyond-reference family (the reference has no sampling/splitting
operators; its closest surface is validate-subset sampling,
reference pandera/backends/pyspark/base.py:55-68).  These are the
curation primitives a training-data pipeline needs in front of a
trainer, expressed Spark-first.

Design for 100 TB:
- ``hash_split`` is a pure projection (hash of the key -> bucket ->
  split label): no shuffle, no RNG, rerun-stable, and leakage-free by
  construction (equal keys always land in the same split — the property
  row-level ``rand()`` splits silently violate for multi-row entities).
  Uses the portable md5-prefix hash so an external SQL engine can replay
  the exact assignment.
- ``stratified_sample`` delegates to ``DataFrame.sampleBy`` — executor-
  side Bernoulli per stratum, no shuffle.
- ``weighted_mix`` samples each corpus at a rate proportional to its
  weight and unions — scan-side sampling, no shuffle, tags provenance.
- ``cdf_bins`` computes exact quantile bins from a groupBy-count CDF:
  the window pass runs over *distinct scores* (tiny after aggregation),
  then a broadcast join maps rows to bins — never a global row sort.
  ``ntile_bins`` is the exact row-level variant (global window) for
  modest data and oracle checks.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column as SparkCol, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash28

__all__ = [
    "hash_split",
    "stratified_sample",
    "hash_stratified_sample",
    "weighted_mix",
    "ntile_bins",
    "cdf_bins",
    "curate_corpus",
    "temperature_sample",
    "uniform_sample",
    "temporal_split",
    "class_weights",
    "weighted_sample",
]

_SPLIT_BUCKETS = 10_000


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: Mapping[str, float],
    *,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic, leakage-free split assignment.

    ``fractions`` maps split name -> fraction (must sum to 1.0 within
    1e-6); rows are assigned by ``portable_hash28(key || salt) % 10000``
    against cumulative thresholds in insertion order.  Same key (and
    salt) -> same split, forever, on any engine.  Change ``salt`` to
    draw an independent re-split.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = portable_hash28(
        F.concat(F.col(key_col).cast("string"), F.lit(salt))
    ) % F.lit(_SPLIT_BUCKETS)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = bucket < F.lit(int(round(acc * _SPLIT_BUCKETS)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    fractions: Mapping[str, float],
    *,
    src: str = "id_a",
    dst: str = "id_b",
    salt: str = "",
    out_col: str = "split",
    broadcast_components: bool = True,
) -> DataFrame:
    """:func:`hash_split` hardened against NEAR-DUPLICATE leakage: a
    near-dup pair split across train and test silently contaminates the
    eval set even after exact dedup.  Given the near-dup ``pairs``
    (from any of the LSH operators), documents split by their connected
    component's canonical root instead of their own id — an entire
    cluster always lands in ONE split; isolated documents keep their
    own id as the key (the ``coalesce(component, id)`` contract of
    :func:`..clustering.connected_components`).

    Scale shape: components run on the tiny pair graph, the corpus is
    touched by one left join (component map is pair-graph bounded,
    usually broadcastable — pass ``broadcast_components=False`` when
    the pair graph itself is huge and the map won't fit the broadcast
    ceiling; the join falls back to a shuffle join on the id) + the
    pure-projection split assignment."""
    from .clustering import connected_components

    comp = connected_components(pairs, src=src, dst=dst).select(
        F.col("node").alias(id_col), "component"
    )
    if broadcast_components:
        comp = F.broadcast(comp)
    keyed = df.join(comp, id_col, "left").withColumn(
        "__skey", F.coalesce(F.col("component"), F.col(id_col))
    )
    return hash_split(
        keyed, "__skey", fractions, salt=salt, out_col=out_col
    ).drop("__skey", "component")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping,
    *,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (``sampleBy``): executor-side, no
    shuffle; strata absent from ``fractions`` are dropped (fraction 0)."""
    return df.sampleBy(strata_col, dict(fractions), seed=seed)


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: Mapping,
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff
    ``portable_hash28(key || salt) % 10000 < fraction[stratum] * 10000``.

    Unlike :func:`stratified_sample` (RNG Bernoulli), membership is a pure
    function of the key — stable across runs, retries, engines, and data
    re-partitioning, so a downsampled corpus is reproducible and
    versionable (same property as :func:`hash_split`).  Strata absent
    from ``fractions`` are dropped.  Pure narrow filter at the scan — no
    shuffle, and Parquet row-group pruning still applies to other
    predicates."""
    bucket = portable_hash28(
        F.concat(F.col(key_col).cast("string"), F.lit(salt))
    ) % F.lit(_SPLIT_BUCKETS)
    thresh: SparkCol = F.lit(0)
    for name, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == F.lit(name),
            F.lit(int(round(frac * _SPLIT_BUCKETS))),
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def weighted_mix(
    parts: Mapping[str, tuple[DataFrame, float]],
    *,
    seed: int = 42,
    source_col: str = "source_corpus",
) -> DataFrame:
    """Mix corpora at rates proportional to their weights.

    The largest weight is sampled at rate 1.0 (no data discarded from
    the dominant corpus); every other corpus at ``weight / max_weight``.
    Adds ``source_col`` provenance.  Sampling happens at the scan —
    union of narrow plans, no shuffle.
    """
    if not parts:
        raise ValueError("weighted_mix needs at least one corpus")
    wmax = max(w for _, w in parts.values())
    if wmax <= 0:
        raise ValueError("weights must be positive")
    out = None
    for i, (name, (df, w)) in enumerate(parts.items()):
        frac = w / wmax
        piece = df if frac >= 1.0 else df.sample(
            fraction=frac, seed=seed + i
        )
        piece = piece.withColumn(source_col, F.lit(name))
        out = piece if out is None else out.unionByName(piece)
    return out


def ntile_bins(
    df: DataFrame,
    score_col: str,
    n_bins: int,
    *,
    tiebreak_cols: Sequence[str] = (),
    out_col: str = "bin",
) -> DataFrame:
    """Exact equi-depth bins via ``ntile`` over a global ordering
    (score, *tiebreaks).  Deterministic when the ordering is total.
    Global window => single-partition sort: fine up to ~10^7 rows;
    beyond that use :func:`cdf_bins`."""
    w = Window.orderBy(
        F.col(score_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    return df.withColumn(out_col, F.ntile(n_bins).over(w))


def cdf_bins(
    df: DataFrame,
    score_col: str,
    n_bins: int,
    *,
    out_col: str = "bin",
) -> DataFrame:
    """Exact equi-depth bins at scale: groupBy-count per distinct score,
    cumulative sum over the (small) aggregated frame, bin by cumulative
    fraction, broadcast-join back.  All rows sharing a score share a bin
    (bins can be uneven under heavy ties — that's the price of never
    splitting a score).  Bin ids are 1-based like ``ntile``."""
    counts = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.orderBy(F.col("__s").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # total row count as a frame over the SAME window sort (unbounded
    # both ways) — no driver-side collect, the whole op stays one action
    w_all = Window.orderBy(F.col("__s").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    binned = (
        counts.withColumn("__cum", F.sum("__c").over(w))
        .withColumn("__tot", F.sum("__c").over(w_all))
        .select(
            "__s",
            F.least(
                F.lit(n_bins),
                (
                    F.floor(
                        (F.col("__cum") - F.col("__c"))
                        * n_bins
                        / F.col("__tot")
                    )
                    + 1
                ).cast("int"),
            ).alias(out_col),
        )
    )
    return df.join(
        F.broadcast(binned), df[score_col] == binned["__s"], "inner"
    ).drop("__s")


def curate_corpus(
    corpus,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_predicate=None,
    benchmark=None,
    bench_id_col: str = "bench_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    decontam_ngram_n: int = 5,
    decontam_min_shared: int = 3,
    portable: bool = False,
    storage_level: str | None = "MEMORY_AND_DISK",
    corpus_storage_level: str | None = None,
):
    """The standard corpus-curation pipeline as one composition:

    quality filter -> MinHash-LSH near-dup removal (pairs -> connected
    components -> keep the minimum-id member per cluster) -> benchmark
    decontamination.  Returns the kept corpus with its original columns.

    Each stage reuses the scale-shaped primitives
    (:func:`~pandera_spark.operators.dedup.minhash_lsh_candidates`,
    :func:`~pandera_spark.operators.clustering.apply_dedup`,
    :func:`~pandera_spark.operators.contamination.decontaminate`), so
    the corpus text never shuffles: the quality gate is a pushed-down
    filter, dedup and decontamination each reduce to an id drop-list
    anti-join.

    ``quality_predicate``: a boolean ``Column`` (e.g.
    ``text.token_count(F.col("text")) >= 30`` or a
    ``text.quality_score`` threshold); ``None`` skips the gate.
    ``benchmark``: eval-set DataFrame (``bench_id_col``, ``text_col``);
    ``None`` skips decontamination.

    The filtered corpus is read by three stages (signature computation,
    dedup anti-join, contamination grams).  ``corpus_storage_level``
    optionally persists it between stages; the default ``None``
    re-scans — columnar parquet scans with a pushed-down filter are
    usually cheaper than caching a 100 TB corpus, so caching is the
    opt-in, not the default (``storage_level`` is the separate knob for
    the tiny banded LSH frame).
    """
    from .clustering import apply_dedup
    from .contamination import decontaminate
    from .dedup import minhash_lsh_candidates
    from .similarity import _materialize

    kept = corpus if quality_predicate is None else corpus.filter(
        quality_predicate
    )
    kept = _materialize(kept, corpus_storage_level)
    pairs = minhash_lsh_candidates(
        kept, id_col, text_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        portable=portable, storage_level=storage_level,
    )
    kept = apply_dedup(kept, pairs, id_col=id_col)
    if benchmark is not None:
        kept = decontaminate(
            kept, benchmark,
            id_col=id_col, bench_id_col=bench_id_col, text_col=text_col,
            ngram_n=decontam_ngram_n, min_shared=decontam_min_shared,
            portable=portable,
        )
    return kept


def uniform_sample(
    df: DataFrame,
    key_col: str,
    n: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministic global EXACT-``n`` uniform sample: the n rows whose
    portable md5-prefix hash of ``key || salt`` (ties: key) is smallest.
    Order-independent, engine-replayable (ORDER BY the same hash in
    SQL), repeatable forever for a given salt; change ``salt`` for an
    independent redraw.  The complement of :func:`hash_split`'s
    fraction-based membership when a budget is a COUNT, not a rate.

    Plan: TakeOrderedAndProject — every partition keeps its local top-n
    by hash, only k×n candidate rows merge; no global sort.  Sized for
    n up to the low millions (the merged result lands in one place —
    for larger budgets use :func:`hash_split` with ``n/N`` fractions).
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    h = portable_hash28(
        F.concat(F.col(key_col).cast("string"), F.lit(salt))
    )
    return (
        df.withColumn("__h", h)
        .orderBy("__h", key_col)
        .limit(int(n))
        .drop("__h")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    *,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-based source rebalancing: sample stratum ``s`` at rate
    ``(c_min / c_s) ** (1 - alpha)`` so post-sampling sizes are
    proportional to ``c_s ** alpha`` (the multinomial temperature
    mixing used for multilingual / multi-source pre-training corpora;
    ``alpha=1`` keeps everything, ``alpha=0`` equalizes strata).  The
    smallest stratum is never downsampled.

    Membership is a pure function of the key (portable md5-prefix hash
    vs a per-stratum threshold), so the sample is rerun-stable,
    engine-replayable, and leakage-free like :func:`hash_split`.  Plan:
    one groupBy for stratum counts (O(strata) rows), broadcast of the
    rate table, then a narrow filter at the scan — no row shuffle.

    ``alpha=0.5`` computes the rate with ``sqrt`` (IEEE
    correctly-rounded, so external SQL engines reproduce thresholds
    bit-identically); other alphas use ``pow`` (engines may differ in
    the last ulp — only relevant when a threshold lands exactly on a
    bucket boundary).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__c"))
    cmin = counts.agg(F.min("__c").alias("__cmin"))
    ratio = F.col("__cmin") / F.col("__c")
    rate = (
        F.sqrt(ratio) if alpha == 0.5
        else F.lit(1.0) if alpha == 1.0
        else F.pow(ratio, F.lit(1.0 - alpha))
    )
    thresholds = counts.crossJoin(F.broadcast(cmin)).select(
        F.col(strata_col).alias("__strat"),
        F.floor(rate * _SPLIT_BUCKETS).cast("long").alias("__thresh"),
    )
    bucket = portable_hash28(
        F.concat(F.col(key_col).cast("string"), F.lit(salt))
    ) % F.lit(_SPLIT_BUCKETS)
    return (
        df.join(
            F.broadcast(thresholds),
            df[strata_col] == thresholds["__strat"],
            "inner",
        )
        .filter(bucket < F.col("__thresh"))
        .drop("__strat", "__thresh")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_col: str,
) -> DataFrame:
    """Audit two corpus versions in one row: ``(n_old, n_new, added,
    removed, changed, unchanged)`` by key and content digest.

    The ingest-pipeline regression check ("what did this refresh
    actually do?").  Both sides project to ``(key, md5(content))``
    before the full-outer join, so the shuffle carries 16-byte digests,
    never documents.  Keys are assumed unique per version (dedupe
    upstream if not); null keys are excluded on both sides."""
    from pyspark.sql import types as _T

    def digest(df: DataFrame, alias: str):
        # raw bytes for string/binary content: a binary-to-string cast is
        # lossy on invalid UTF-8 and could equate distinct payloads
        dt = df.schema[content_col].dataType
        c = F.col(content_col)
        if not isinstance(dt, (_T.StringType, _T.BinaryType)):
            c = c.cast("string")
        return df.filter(F.col(key_col).isNotNull()).select(
            F.col(key_col).alias("__k"), F.md5(c).alias(alias)
        )

    o = digest(old, "__ho")
    n = digest(new, "__hn")
    j = o.join(n, "__k", "full_outer")
    ho, hn = F.col("__ho"), F.col("__hn")
    return j.agg(
        F.count(F.when(ho.isNotNull(), 1)).cast("long").alias("n_old"),
        F.count(F.when(hn.isNotNull(), 1)).cast("long").alias("n_new"),
        F.count(F.when(ho.isNull() & hn.isNotNull(), 1))
        .cast("long").alias("added"),
        F.count(F.when(hn.isNull() & ho.isNotNull(), 1))
        .cast("long").alias("removed"),
        F.count(F.when(ho.isNotNull() & hn.isNotNull() & (ho != hn), 1))
        .cast("long").alias("changed"),
        F.count(F.when(ho.isNotNull() & hn.isNotNull() & (ho == hn), 1))
        .cast("long").alias("unchanged"),
    )


def distribution_match(
    df: DataFrame,
    ref: DataFrame,
    value_col: str,
    edges: Sequence[float],
    *,
    key_col: str,
    ref_value_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministically downsample ``df`` so ``value_col``'s binned
    distribution matches a reference corpus — importance resampling by
    bin with hash-based acceptance (e.g. match the length profile of a
    curated high-quality subset).

    The survivor set's bin fractions EQUAL the reference's (up to hash
    granularity): the achievable total is bottlenecked by the scarcest
    bin, ``T = min_b(n_df_b / ref_frac_b)``, and each bin accepts at
    rate ``a_b = T * ref_frac_b / n_df_b`` — the scarcest bin passes
    whole, every other bin thins proportionally.  A row survives iff
    ``portable_hash28(key || salt) % 10000 < trunc(a_b * 10000)``;
    bins the reference never hits are dropped.  Membership is a pure
    function of (key, salt) — reproducible across runs and engines,
    same property as :func:`hash_split`.  Cost: two tiny bin-histogram
    aggregations broadcast back; the corpus itself is filtered at the
    scan, never shuffled.  (Upsampling scarce bins would need
    duplication — out of scope.  If the reference has mass in a bin
    ``df`` never hits, matching happens over the intersection of
    occupied bins — exactness is per achievable support.)"""
    from .drift import bin_column

    rcol = ref_value_col or value_col
    b_df = bin_column(F.col(value_col), edges)
    b_ref = bin_column(F.col(rcol), edges)
    h_df = (
        df.select(b_df.alias("__bin"))
        .groupBy("__bin").agg(F.count(F.lit(1)).alias("__n_df"))
    )
    h_ref = (
        ref.select(b_ref.alias("__bin"))
        .groupBy("__bin").agg(F.count(F.lit(1)).alias("__n_ref"))
    )
    tot_ref = h_ref.agg(F.sum("__n_ref").cast("double").alias("__t_ref"))
    cap = (
        h_df.join(h_ref, "__bin", "inner")  # ref-absent bins drop
        .crossJoin(tot_ref)
        .select(
            "__bin",
            F.col("__n_df").cast("double").alias("__n_df"),
            (F.col("__n_ref").cast("double") / F.col("__t_ref"))
            .alias("__ref_frac"),
        )
    )
    # achievable matched total: bottlenecked by the scarcest bin
    t_match = cap.agg(
        F.min(F.col("__n_df") / F.col("__ref_frac")).alias("__t_match")
    )
    rates = cap.crossJoin(t_match).select(
        "__bin",
        F.least(
            F.lit(1.0),
            F.col("__t_match") * F.col("__ref_frac") / F.col("__n_df"),
        ).alias("__rate"),
    )
    bucket = portable_hash28(
        F.concat(F.col(key_col).cast("string"), F.lit(salt))
    ) % F.lit(_SPLIT_BUCKETS)
    thresh = (F.col("__rate") * _SPLIT_BUCKETS).cast("int")
    return (
        df.withColumn("__bin", b_df)
        .join(F.broadcast(rates), "__bin")
        .filter(bucket < thresh)
        .drop("__bin", "__rate")
    )


def temporal_split(
    df: DataFrame,
    ts_col: str,
    *,
    train_before: str,
    test_from: Optional[str] = None,
    embargo_seconds: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Time-based train/test split with an embargo gap — the temporal
    analogue of :func:`hash_split` for forecasting / event-prediction
    data, where a RANDOM split leaks the future into training.

    Rows strictly before ``train_before`` label ``train``; rows at or
    after ``test_from`` (default: ``train_before`` +
    ``embargo_seconds``) label ``test``; anything between labels
    ``embargo`` (dropped by convention — features computed near the
    boundary see both sides; López de Prado's purged split).  Null
    timestamps label null.  Pure projection: zero shuffle, zero state,
    stable under any partitioning.
    """
    lo = F.lit(train_before).cast("timestamp")
    if test_from is not None:
        hi = F.lit(test_from).cast("timestamp")
    else:
        hi = F.timestamp_add(
            "SECOND", F.lit(int(embargo_seconds)), lo
        )
    t = F.col(ts_col)
    label = (
        F.when(t.isNull(), F.lit(None).cast("string"))
        .when(t < lo, F.lit("train"))
        .when(t >= hi, F.lit("test"))
        .otherwise(F.lit("embargo"))
    )
    return df.withColumn(out_col, label)


def class_weights(
    df: DataFrame,
    label_col: str,
    *,
    beta: Optional[float] = None,
) -> DataFrame:
    """Per-class sampling/loss weights from label frequencies.

    One aggregation -> one row per class: ``label, n, frac,
    inv_weight`` (inverse-frequency, normalized to mean 1 across
    classes) and, with ``beta``, ``eff_weight`` via the
    effective-number-of-samples form ``(1-β)/(1-β^n)`` (Cui et al.
    2019) — the standard fix when inverse-frequency over-boosts
    ultra-rare classes — normalized the same way.  Null labels are a
    class of their own (they ARE a class at training time; drop them
    upstream if not).
    """
    counts = df.groupBy(label_col).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = counts.agg(
        F.sum("n").alias("__tot"),
        F.count(F.lit(1)).cast("double").alias("__k"),
    )
    out = counts.crossJoin(F.broadcast(tot)).select(
        label_col, "n",
        (F.col("n") / F.col("__tot").cast("double")).alias("frac"),
        # inverse frequency tot/(k*n): mean weight over classes
        # weighted by class frequency is 1
        (
            F.col("__tot").cast("double")
            / (F.col("__k") * F.col("n"))
        ).alias("inv_weight"),
        F.col("__k").alias("__k"),
    )
    if beta is not None:
        b = float(beta)
        if not 0.0 <= b < 1.0:
            raise ValueError(f"beta must be in [0, 1), got {beta}")
        raw = F.lit(1.0 - b) / (
            F.lit(1.0) - F.pow(F.lit(b), F.col("n").cast("double"))
        )
        # normalize so the mean class weight is 1 (needs the sum of
        # raw weights over classes: one more tiny agg on the k-row
        # frame, crossed back — still bounded by class count)
        sums = out.select(raw.alias("__raw")).agg(
            F.sum("__raw").alias("__rawsum")
        )
        out = out.crossJoin(F.broadcast(sums)).withColumn(
            "eff_weight", raw * F.col("__k") / F.col("__rawsum")
        ).drop("__rawsum")
    return out.drop("__k")


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col,
    n: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, exact n:
    Efraimidis-Spirakis A-ES keys.  Row i is scored
    ``k_i = -ln(u_i) / w_i`` with ``u_i`` the portable md5-prefix hash
    of ``key || salt`` mapped to (0, 1); the n SMALLEST scores win —
    inclusion probability is proportional to weight, order-independent,
    engine-replayable, and repeatable for a given salt (change ``salt``
    for an independent redraw).

    ``weight_col`` may be a column name or Column expression; rows
    with a null key, or a null/non-positive/NaN weight, are excluded.

    Plan: same TakeOrderedAndProject shape as :func:`uniform_sample`
    (per-partition local top-n, k×n merge — no global sort); same
    low-millions-of-n sizing contract.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = (
        F.col(weight_col) if isinstance(weight_col, str) else weight_col
    ).cast("double")
    h = portable_hash28(
        F.concat(F.col(key_col).cast("string"), F.lit(salt))
    )
    u = (h.cast("double") + 0.5) / F.lit(float(1 << 28))
    k = -F.log(u) / w
    return (
        df.where(
            F.col(key_col).isNotNull()
            & w.isNotNull() & ~F.isnan(w) & (w > 0)
        )
        .withColumn("__k", k)
        .orderBy("__k", key_col)
        .limit(int(n))
        .drop("__k")
    )
