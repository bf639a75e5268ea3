"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — dot products via ``zip_with`` +
``aggregate`` higher-order functions (JVM-side, no UDF), top-k via a window
partitioned per query (parallel across queries, no global sort).

Scale path: random-hyperplane LSH — bucket the corpus by sign-bit bands so a
query only scans its candidate buckets; at 100 TB the bucket join replaces
the full cross product.  Hyperplanes are seeded-deterministic and shipped as
literal arrays (tiny), so no broadcast variable management is needed.
"""

from __future__ import annotations

import math
import random
from typing import Optional

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def dot(a: C, b: C) -> C:
    """Element-wise dot product of two array columns (pure built-ins)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: C) -> C:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: C, b: C) -> C:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    max_query_rows: Optional[int] = 10_000,
) -> DataFrame:
    """Exact cosine top-k for every query vector.

    Returns (query_id, neighbor_id, cosine_sim, rank).  The query side is
    broadcast — this is the EXACT BASELINE, O(|Q|x|C|): the small-queries
    assumption is enforced, not just documented.  ``max_query_rows`` (None
    disables) rejects oversized query sides with a pointer to the scale
    paths (:func:`lsh_topk`, :mod:`.ann_ivf`); the probe is a
    ``limit(n+1).count()`` — an early-exit scan, not a full count.
    Ranking is a per-query window so work parallelizes across queries;
    ties broken by neighbor id for determinism.
    """
    if max_query_rows is not None:
        probe = queries.limit(max_query_rows + 1).count()
        if probe > max_query_rows:
            raise ValueError(
                f"brute_force_topk query side exceeds max_query_rows="
                f"{max_query_rows}: the cross product is O(|Q|x|C|). Use "
                "lsh_topk or ann_ivf.ivf_topk for large query sets, or "
                "pass max_query_rows=None to force the exact baseline."
            )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qvec"),
        )
    )
    from .dedup import _ensure_parallelism

    c = _ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    sim = cosine(F.col("__qvec"), F.col("__cvec"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            sim.alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _materialize(df: DataFrame, storage_level: Optional[str]) -> DataFrame:
    """Optionally persist + eagerly materialize a reused intermediate.

    At local/benchmark scale caching the banded corpus before a self-join
    is a clear win (computed once, scanned twice); at 100 TB the cache may
    not fit executor storage — pass ``storage_level=None`` to let Spark
    recompute the lineage instead, or ``"DISK_ONLY"`` to spill.  Accepts
    any ``pyspark.StorageLevel`` attribute name.
    """
    if storage_level is None:
        return df
    from pyspark import StorageLevel

    try:
        lvl = getattr(StorageLevel, storage_level.upper())
    except AttributeError as exc:
        raise ValueError(
            f"unknown storage level {storage_level!r}; use a "
            "pyspark.StorageLevel attribute name or None to disable"
        ) from exc
    df = df.persist(lvl)
    df.count()  # eager: both join sides see the cache, not half a build
    return df


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_signature(vec: C, planes: list[list[float]]) -> C:
    """Sign-bit signature (one long per <=64 hyperplanes)."""
    bits = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(dot(vec, p) >= 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def _fmt_double(x: float) -> str:
    """Exact SQL double literal: ``repr`` round-trips (shortest string
    that parses back to the same IEEE-754 double — Java's parseDouble
    and Python agree on nearest-even), ``D`` makes the parser type it
    DOUBLE instead of DECIMAL."""
    return f"{float(x)!r}D"


def _dot_sql(vec_sql: str, vals: "list[float]") -> str:
    """SQL text of :func:`dot` against a literal array — the identical
    zip_with/aggregate tree (same sequential fold order, so the result
    is bit-identical), parsed JVM-side in one call."""
    arr = ", ".join(_fmt_double(v) for v in vals)
    return (
        f"aggregate(zip_with({vec_sql}, array({arr}), (x, y) -> x * y), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def lsh_signature_sql(vec_sql: str, planes: "list[list[float]]") -> str:
    """SQL text equivalent of :func:`lsh_signature` over a column
    reference, for ``F.expr``.

    Why this exists: building the Column form costs one py4j round trip
    per plane element (~22k socket calls at 56 planes x 64 dims,
    seconds of pure driver latency per query build — measured r11);
    parsing one generated SQL string is a single round trip.  The
    parsed tree is operation-for-operation the Column tree (same
    literals via exact ``repr`` round-trip, same fold order), so
    signatures are bit-identical — pinned by a differential test."""
    bits = [
        f"(CASE WHEN {_dot_sql(vec_sql, plane)} >= 0 "
        f"THEN {1 << i}L ELSE 0L END)"
        for i, plane in enumerate(planes)
    ]
    return "(" + " | ".join(bits) + ")"


def _first_matching_band(
    sig_a: C, sig_b: C, bands: int, width: int, mask: int
) -> C:
    """Index of the first band where two sign-bit signatures agree (or -1).

    Banded LSH self-joins emit a (a, b) pair once per shared band; instead
    of a ``distinct()`` over the pair rows (an extra shuffle that at scale
    carries vectors), keep only the row whose band equals this expression —
    dedup by construction, pure bit math in codegen."""
    def bkey(sig: C, b: int) -> C:
        return F.shiftrightunsigned(sig, b * width).bitwiseAND(F.lit(mask))

    expr = F.lit(-1)
    for b in range(bands - 1, -1, -1):
        expr = F.when(bkey(sig_a, b) == bkey(sig_b, b), F.lit(b)).otherwise(
            expr
        )
    return expr


def _banded(
    df: DataFrame,
    idc: str,
    vecc: str,
    prefix: str,
    planes: list[list[float]],
    bands: int,
) -> DataFrame:
    """(id, vec, l2 norm, signature) exploded to one row per band.

    The norm is computed once per vector here so candidate scoring is a
    dot product plus one multiply — never a per-pair norm recomputation."""
    n_planes = len(planes)
    width = n_planes // bands
    mask = (1 << width) - 1
    # one-round-trip SQL build of the (large) signature expression; the
    # parsed tree is bit-identical to lsh_signature(F.col(vecc), planes)
    from pandera_spark.checks import _sql_ident

    sig = F.expr(lsh_signature_sql(_sql_ident(vecc), planes))
    return df.select(
        F.col(idc).alias(f"{prefix}_id"),
        F.col(vecc).alias(f"{prefix}_vec"),
        l2_norm(F.col(vecc)).alias(f"{prefix}_norm"),
        sig.alias(f"{prefix}_sig"),
    ).select(
        f"{prefix}_id",
        f"{prefix}_vec",
        f"{prefix}_norm",
        f"{prefix}_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(f"{prefix}_sig", b * width)
                        .bitwiseAND(F.lit(mask)).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(
        f"{prefix}_id", f"{prefix}_vec", f"{prefix}_norm", f"{prefix}_sig",
        F.col("bh.band").alias("band"), F.col("bh.bkey").alias("bkey"),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    corpus_storage: Optional[str] = "MEMORY_AND_DISK",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH banding.

    Signature of ``n_planes`` sign bits split into ``bands`` bands; a corpus
    vector is a candidate iff it shares at least one full band with the
    query.  Exact cosine is computed only on candidates.  Recall rises with
    bands; cost with band width.

    Dedup of multi-band matches is the first-matching-band filter (bit
    math), not a ``distinct()`` — no second shuffle, and the shuffle that
    does happen carries band keys, ids, norms and one vector copy, with
    per-pair scoring reduced to dot / (norm_a * norm_b).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    rows_per_band = n_planes // bands
    mask = (1 << rows_per_band) - 1

    from .dedup import _ensure_parallelism

    qb = F.broadcast(
        _banded(queries, query_id_col, query_vec_col, "query", planes, bands)
    )
    # corpus signatures computed once and kept (ids + vec refs + band keys);
    # corpus_storage=None skips the cache for corpora bigger than storage
    cb = _materialize(
        _banded(
            _ensure_parallelism(corpus), id_col, vec_col, "neighbor",
            planes, bands,
        ),
        corpus_storage,
    )
    fm = _first_matching_band(
        F.col("query_sig"), F.col("neighbor_sig"), bands, rows_per_band, mask
    )
    candidates = (
        qb.join(cb, on=["band", "bkey"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .filter(F.col("band") == fm)
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("query_vec"), F.col("neighbor_vec"))
            / (F.col("query_norm") * F.col("neighbor_norm"))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dups(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    corpus_storage: Optional[str] = "MEMORY_AND_DISK",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold)
    via LSH candidate generation + exact verify.

    Pair dedup is the first-matching-band filter (see
    :func:`_first_matching_band`) — no ``distinct()`` shuffle of vector
    rows; norms are precomputed per vector so verification is one dot
    product per candidate."""
    from .dedup import _ensure_parallelism

    planes = _hyperplanes(dim, n_planes, seed)
    rows_per_band = n_planes // bands
    mask = (1 << rows_per_band) - 1
    banded = _materialize(
        _banded(_ensure_parallelism(df), id_col, vec_col, "v", planes, bands),
        corpus_storage,  # None -> recompute lineage on each join side
    )
    a, b = banded.alias("a"), banded.alias("b")
    fm = _first_matching_band(
        F.col("a.v_sig"), F.col("b.v_sig"), bands, rows_per_band, mask
    )
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.v_id") < F.col("b.v_id")),
        )
        .filter(F.col("a.band") == fm)
        .select(
            F.col("a.v_id").alias("id_a"),
            F.col("b.v_id").alias("id_b"),
            (
                dot(F.col("a.v_vec"), F.col("b.v_vec"))
                / (F.col("a.v_norm") * F.col("b.v_norm"))
            ).alias("cosine_sim"),
        )
    )
    return pairs.filter(F.col("cosine_sim") >= threshold)


def knn_band_plan(
    n_rows: int,
    *,
    bands: int = 4,
    target_bucket: int = 64,
    max_planes: int = 56,
) -> "tuple[int, int]":
    """Size the LSH banding for :func:`knn_graph` from the corpus size:
    returns ``(n_planes, bands)`` with band width = ceil(log2(n_rows /
    target_bucket)) — the documented rule that keeps an expected bucket
    at ~``target_bucket`` vectors, so candidate pairs stay ≈ ``bands *
    n_rows * target_bucket / 2`` (linear in n at fixed bucket size)
    instead of quadratic.

    ``max_planes`` caps signature width (total planes ≤ 56 keeps the
    packed signature well inside a signed long AND bounds the Catalyst
    compile cost of the plane literals).  Pass the real/estimated corpus
    row count — an approximation within 2× is fine, the width only
    moves by one bit."""
    import math

    if n_rows < 1 or bands < 1:
        raise ValueError("n_rows and bands must be positive")
    width = max(1, math.ceil(math.log2(max(2.0, n_rows / target_bucket))))
    width = min(width, max(1, max_planes // bands))
    return bands * width, bands


def neardup_band_plan(
    n_rows: int,
    threshold: float,
    *,
    target_bucket: int = 64,
    recall: float = 0.9,
    max_planes: int = 56,
) -> "tuple[int, int]":
    """Size (n_planes, bands) for THRESHOLD near-dup queries
    (:func:`embedding_near_dups`) so both the candidate volume and the
    recall contract survive a scale-up.

    :func:`knn_band_plan`'s bucket rule fixes the band WIDTH (width =
    ceil(log2(n / target_bucket)) keeps an expected bucket at
    ~``target_bucket`` vectors) but widening bands alone costs recall: a
    pair at exactly ``threshold`` cosine agrees on one sign bit with
    probability ``p1 = 1 - acos(threshold)/pi`` (Goemans-Williamson /
    Charikar SimHash), so a w-bit band matches with ``p1**w`` and wider
    bands match less often.  This helper compensates by adding bands:
    ``bands = ceil(ln(1-recall) / ln(1-p1**w))`` makes the any-band
    match probability for a threshold-grade pair at least ``recall``.
    Candidate volume stays ≈ ``bands * n * target_bucket / 2`` — linear
    in n at fixed bucket size.  ``max_planes`` caps the packed signature
    (signed long) and the Catalyst compile cost; when the cap binds,
    bands are reduced first (recall degrades gracefully and the verify
    step keeps precision exact either way)."""
    import math

    if n_rows < 1:
        raise ValueError("n_rows must be positive")
    if not 0.0 < threshold < 1.0 or not 0.0 < recall < 1.0:
        raise ValueError("threshold and recall must be in (0, 1)")
    width = max(1, math.ceil(math.log2(max(2.0, n_rows / target_bucket))))
    width = min(width, max_planes)
    p1 = 1.0 - math.acos(threshold) / math.pi
    p_band = p1 ** width
    bands = max(1, math.ceil(math.log(1.0 - recall)
                             / math.log(1.0 - p_band)))
    bands = max(1, min(bands, max_planes // width))
    return bands * width, bands


def knn_graph(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    corpus_storage: Optional[str] = "MEMORY_AND_DISK",
) -> DataFrame:
    """Approximate k-nearest-neighbor graph over the whole corpus:
    directed edges ``(src, dst, cosine_sim, rank)`` with ``rank <= k``
    per source, neighbors drawn from LSH band candidates.

    The corpus-wide analogue of :func:`lsh_topk` (every vector is a
    query): ONE banded self-join keyed on (band, band-key) — never an
    all-pairs product — then exact cosine on candidates and a per-source
    window rank.  The window partitions by ``src``, so per-task state is
    one vector's candidate list.  Feeds graph-based corpus analyses
    (density/outlier screens, cluster seeds, semantic dedup beyond the
    near-dup threshold).

    Sizing for scale: expected candidate pairs ≈ ``bands * n^2 /
    2^(n_planes/bands)`` — pick the band width so a bucket holds a
    bounded neighborhood (width ≈ log2(n / desired_bucket_size));
    :func:`knn_band_plan` computes (n_planes, bands) from the corpus
    size by exactly that rule.  At local test scale the cost is
    Catalyst compile of the plane literals, not data (BASELINE.md
    §3.7)."""
    from .dedup import _ensure_parallelism

    planes = _hyperplanes(dim, n_planes, seed)
    rows_per_band = n_planes // bands
    mask = (1 << rows_per_band) - 1
    banded = _materialize(
        _banded(_ensure_parallelism(df), id_col, vec_col, "v", planes, bands),
        corpus_storage,
    )
    a, b = banded.alias("a"), banded.alias("b")
    fm = _first_matching_band(
        F.col("a.v_sig"), F.col("b.v_sig"), bands, rows_per_band, mask
    )
    edges = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.v_id") != F.col("b.v_id")),
        )
        .filter(F.col("a.band") == fm)
        .select(
            F.col("a.v_id").alias("src"),
            F.col("b.v_id").alias("dst"),
            (
                dot(F.col("a.v_vec"), F.col("b.v_vec"))
                / (F.col("a.v_norm") * F.col("b.v_norm"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("src").orderBy(
        F.col("cosine_sim").desc(), F.col("dst").asc()
    )
    return (
        edges.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def mutual_knn(edges: DataFrame) -> DataFrame:
    """Keep only mutual edges of a :func:`knn_graph` result — (a, b) with
    a < b where a ranks b AND b ranks a.  Mutual-kNN is the standard
    noise-robust graph for clustering: one hash semi-join of the edge
    list against its own reversal (edge rows only, no vectors)."""
    fwd = edges.select("src", "dst")
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return (
        fwd.join(rev, ["src", "dst"], "left_semi")
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )


def centroid(
    df: DataFrame, vec_col: str, *, dim: int
) -> list[float]:
    """Element-wise mean vector as a Python list (one agg job, ``dim``
    ``avg`` aggregates with map-side partials; the only driver transfer
    is the dim-length centroid itself — same bounded-collect shape as the
    IVF centroid fit)."""
    from pandera_spark.checks import _sql_ident

    vc = _sql_ident(vec_col)
    # one generated array-of-avgs expression = one parser round trip
    # instead of ~8 py4j calls per dimension (same avg(vec[i]) tree)
    row = df.agg(
        F.expr(
            "array("
            + ", ".join(f"avg({vc}[{i}])" for i in range(dim))
            + ")"
        ).alias("__c")
    ).first()
    return [float(v or 0.0) for v in row["__c"]]


def embedding_outliers(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
) -> DataFrame:
    """Corpus-health outlier scoring: cosine similarity of every vector
    to the corpus centroid (low similarity = off-distribution — the
    standard cheap screen for corrupt/noise embeddings before they feed
    dedup or retrieval).

    Returns (id, centroid_sim).  Two jobs: the centroid agg, then one
    projection — the centroid ships as a literal array, nothing is
    broadcast or shuffled.  Rank/threshold downstream (e.g.
    ``orderBy('centroid_sim').limit(k)`` — Spark runs top-k as
    TakeOrdered, never a global sort).
    """
    c = centroid(df, vec_col, dim=dim)
    c_lit = F.array(*[F.lit(v) for v in c])
    return df.select(
        F.col(id_col),
        cosine(F.col(vec_col), c_lit).alias("centroid_sim"),
    )


def verify_pairs_cosine(
    pairs: DataFrame,
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_a: str = "id_a",
    id_b: str = "id_b",
    threshold: float = 0.8,
) -> DataFrame:
    """Attach embedding cosine similarity to candidate pairs and keep
    those at or above ``threshold`` — the verification half of a hybrid
    near-dup pipeline (text LSH proposes, embeddings confirm; each
    modality catches duplicates the other misses).

    Returns ``(id_a, id_b, cosine_sim)``.  Two hash joins keyed on the
    id: the pair frame (candidates, tiny relative to the corpus) is the
    probe side, the embedding table is joined by key — never broadcast,
    never all-pairs.  The cosine is the same zip_with/aggregate
    built-in expression as the rest of the family (no UDF).
    """
    ea = embeddings.select(
        F.col(id_col).alias(id_a), F.col(vec_col).alias("__va")
    )
    eb = embeddings.select(
        F.col(id_col).alias(id_b), F.col(vec_col).alias("__vb")
    )
    sim = cosine(
        F.col("__va").cast("array<double>"),
        F.col("__vb").cast("array<double>"),
    )
    return (
        pairs.select(id_a, id_b)
        .join(ea, id_a)
        .join(eb, id_b)
        .select(
            id_a, id_b, sim.alias("cosine_sim")
        )
        .filter(F.col("cosine_sim") >= F.lit(float(threshold)))
    )


def lsh_recall(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_rows: Optional[int] = 2_000,
) -> DataFrame:
    """Evaluation harness: recall of the banded-LSH near-dup pipeline
    against the EXACT pair set on a bounded corpus (sample) — the
    tuning loop for (n_planes, bands) before a production run.
    The exact side's pairwise cosine runs in interpreted higher-order
    functions (~10 µs/pair locally): the default cap of 2k rows ≈ 2M
    pairs keeps it interactive; raise deliberately.

    Because :func:`embedding_near_dups` exact-verifies every candidate,
    its pairs are a subset of the true pairs; recall is simply
    ``|lsh| / |exact|``.  The exact side is an O(n²) guarded self-join
    — run this on a SAMPLE (``max_rows`` rejects oversized inputs, None
    disables); the measured recall transfers to the full corpus because
    banding probability depends only on pair similarity.  One row:
    ``(n_exact_pairs, n_lsh_pairs, recall)`` (recall null when no exact
    pairs exist)."""
    if max_rows is not None:
        # early-exit probe (scan stops at max_rows+1), not a full count
        n = df.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"lsh_recall is O(n^2) exact: input has more than "
                f"max_rows={max_rows} rows; evaluate on a sample "
                "(df.sample or hash_stratified_sample) or raise max_rows"
            )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    a, b = base.alias("a"), base.alias("b")
    exact = (
        a.join(b, F.col("a.__id") < F.col("b.__id"))
        .select(
            (
                dot(F.col("a.__v"), F.col("b.__v"))
                / (F.col("a.__n") * F.col("b.__n"))
            ).alias("__sim")
        )
        .filter(F.col("__sim") >= threshold)
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact_pairs"))
    )
    lsh = embedding_near_dups(
        df, id_col=id_col, vec_col=vec_col, threshold=threshold,
        dim=dim, n_planes=n_planes, bands=bands, seed=seed,
        corpus_storage=None,
    ).agg(F.count(F.lit(1)).cast("long").alias("n_lsh_pairs"))
    return (
        exact.crossJoin(lsh)
        .withColumn(
            "recall",
            F.when(
                F.col("n_exact_pairs") > 0,
                F.round(
                    F.col("n_lsh_pairs").cast("double")
                    / F.col("n_exact_pairs").cast("double"),
                    6,
                ),
            ),
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    score_col: str = "score",
    vec_col: str = "embedding",
    k: int = 10,
    lam: float = 0.7,
    max_candidates: int = 10_000,
):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): greedily pick k items maximizing ``lam·relevance −
    (1−lam)·max_cosine(selected)`` — the diversity-aware final cut
    after any retrieval/curation scorer (two_stage_search, DSIR,
    quality top-k), so the k survivors aren't k near-copies of the
    best hit.

    MMR is inherently SEQUENTIAL in k (each pick changes the next
    penalty), so it runs on the driver over the already-small candidate
    frame — the same bounded-collect contract as k-means seeding; the
    ``max_candidates`` guard enforces it (rerank a top-N result, not a
    corpus).  Deterministic: ties break to the smallest id.  Returns a
    DataFrame ``(id, mmr_rank, mmr_score)``.
    """
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0,1], got {lam}")
    rows = (
        candidates.select(
            F.col(id_col).alias("i"),
            F.col(score_col).cast("double").alias("s"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .where(F.col("s").isNotNull() & F.col("v").isNotNull())
        .limit(max_candidates + 1)
        .collect()
    )
    if len(rows) > max_candidates:
        raise ValueError(
            f"candidate set exceeds max_candidates={max_candidates}; "
            "MMR reranks a top-N result, not a corpus"
        )
    spark = candidates.sparkSession
    out_schema = (
        f"{id_col} {candidates.schema[id_col].dataType.simpleString()}, "
        "mmr_rank int, mmr_score double"
    )
    if not rows:
        return spark.createDataFrame([], out_schema)
    ids = [r["i"] for r in rows]
    scores = np.array([r["s"] for r in rows])
    x = np.vstack([r["v"] for r in rows])
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0.0] = 1.0
    xh = x / norms[:, None]
    sim = xh @ xh.T
    n = len(ids)
    selected: "list[int]" = []
    max_sim = np.zeros(n)
    picked = np.zeros(n, dtype=bool)
    result = []
    for rank in range(1, min(k, n) + 1):
        penalty = max_sim if selected else np.zeros(n)
        mmr = lam * scores - (1.0 - lam) * penalty
        mmr_masked = np.where(picked, -np.inf, mmr)
        best_val = mmr_masked.max()
        # smallest id among the (near-)exact ties
        tied = [
            j for j in range(n)
            if not picked[j] and mmr_masked[j] == best_val
        ]
        j = min(tied, key=lambda t: ids[t])
        picked[j] = True
        selected.append(j)
        max_sim = np.maximum(max_sim, sim[:, j])
        result.append((ids[j], rank, float(mmr[j])))
    return spark.createDataFrame(result, out_schema)
