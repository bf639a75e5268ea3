"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
- exact dedup hashes the payload column FIRST (``xxhash64``/``md5`` — JVM-side,
  whole-stage codegen) so the shuffle moves 8-16 byte keys, never documents.
- MinHash signatures are computed in one projection (no UDF: ``transform`` +
  ``aggregate`` higher-order functions over the shingle array), then banded;
  candidate pairs come from a self-join on (band, band_hash) buckets —
  the classic LSH bucket join, shuffle keyed on small band hashes.
- near-dup verification (exact Jaccard) runs only on LSH candidates.
"""

from __future__ import annotations

import math

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic seed for the permutation-constant generator
_MINHASH_SEED_B = 0xC2B2AE3D27D4EB4F

#: prime modulus of the permutation family (2^31 - 1).  ALL hash
#: arithmetic in this module keeps every intermediate < 2^63 — no silent
#: long wraparound anywhere — so the same plans run under
#: ``spark.sql.ansi.enabled=true`` (stock Spark 4, which raises
#: ARITHMETIC_OVERFLOW instead of wrapping) and the ``portable=True``
#: variants can additionally be replayed bit-exactly by an external ANSI
#: SQL oracle (DuckDB).  Default vs portable differ only in the base
#: hash: ``pmod(xxhash64, P)`` (JVM-cheap) vs a 28-bit md5 prefix
#: (engine-independent).
PORTABLE_P = (1 << 31) - 1


def portable_hash28(col: C) -> C:
    """28-bit content hash = first 7 hex digits of ``md5`` parsed base-16.

    MD5 over UTF-8 bytes is bit-identical across engines, so an external
    SQL oracle can reproduce this hash exactly (DuckDB:
    ``list_reduce`` fold of ``substr(md5(x),1,7)`` hex digits).  Used by
    the ``portable=True`` MinHash/SimHash paths; the default paths use
    ``xxhash64`` (cheaper, JVM-only)."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def portable_permutation_constants(
    n: int, *, bound: int = PORTABLE_P, seed: int = _MINHASH_SEED_B
) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) constants for ``(a*h + b) % PORTABLE_P``
    permutations of the 28-bit portable hash space.  ``a*h < bound * 2^31``
    must stay below 2^63 for overflow-free replay — callers combining
    several products pass a smaller ``bound``."""
    import random

    rng = random.Random(seed ^ n)
    a = [rng.randrange(1, bound) for _ in range(n)]
    b = [rng.randrange(0, PORTABLE_P) for _ in range(n)]
    return a, b


def _perm_min_sql(h: str, a: int, b: int, guard: "str | None" = None) -> str:
    """SQL text of ``min((h*a + b) % PORTABLE_P)`` (optionally guarded by
    a CASE condition) for ``F.expr`` — one parser round trip instead of
    ~10 py4j calls per Column-built aggregate.  Integer arithmetic only,
    so the parsed tree computes the identical exact values; overflow
    bounds are unchanged (h < 2^31, a < bound)."""
    body = f"(({h} * {a}L + {b}L) % {PORTABLE_P}L)"
    if guard is not None:
        body = f"(CASE WHEN {guard} THEN {body} END)"
    return f"min({body})"


def hash31(col: C) -> C:
    """Non-negative 31-bit content hash: ``pmod(xxhash64(x), 2^31 - 1)``.

    The default base hash of the MinHash/SimHash family — one JVM
    codegen'd xxhash64 per value, bounded to [0, 2^31-1) so every
    downstream multiply-add stays below 2^63 under ANSI mode."""
    return F.pmod(F.xxhash64(col), F.lit(PORTABLE_P))


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives in
    fewer partitions (small files).  At real scale inputs already have many
    partitions and this is a no-op — no shuffle added.

    Spark Connect has no ``df.rdd`` / ``sparkContext``; there we return the
    input unchanged (a Connect backend is a real cluster whose scans are
    already split)."""
    try:
        sc = df.sparkSession.sparkContext
        target = sc.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:  # Spark Connect (PySparkNotImplementedError) et al.
        return df
    if n < target:
        return df.repartition(target)
    return df


def exact_dedup_stats(df: DataFrame, col: str) -> DataFrame:
    """Duplicate statistics by exact content hash.

    Returns one row: (n_docs, n_distinct, dup_rows).  Hash-first so the
    groupBy shuffles 128-bit digests instead of full documents.
    String/binary payloads hash their raw bytes; a binary-to-string
    cast would be lossy on invalid UTF-8 and could merge distinct
    payloads into one digest.
    """
    dt = df.schema[col].dataType
    from pyspark.sql import types as _T

    raw = isinstance(dt, (_T.StringType, _T.BinaryType))
    h = F.md5(F.col(col) if raw else F.col(col).cast("string"))
    per_group = (
        df.select(h.alias("__h"))
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_group.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.coalesce(
            F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
        ).cast("long").alias("dup_rows"),
    )


def exact_dedup(df: DataFrame, cols: list[str], keep: str = "first") -> DataFrame:
    """Drop exact duplicates over ``cols``.

    ``keep='any'`` uses ``dropDuplicates`` (fastest — map-side partial
    aggregation).  ``keep='first'`` keeps the row with the smallest
    ``_dedup_order`` column if present, else falls back to 'any'.
    """
    if keep == "any" or "_dedup_order" not in df.columns:
        return df.dropDuplicates(cols)
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in cols]).orderBy("_dedup_order")
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_rows(
    df: DataFrame,
    cols: list[str],
    *,
    mode: str = "all",
    order_by: str | None = None,
) -> DataFrame:
    """Rows that violate uniqueness over ``cols`` — the failure-case
    extractor behind ``report_duplicates`` (SURVEY §2.B; reference
    dtypes.py:627 UniqueSettings).

    - ``mode="all"``: every row of a duplicated group (window count > 1).
    - ``mode="exclude_first"|"exclude_last"``: all but the first/last row
      per group, ordered by ``order_by`` — REQUIRED for these modes: Spark
      has no row order, so determinism needs an explicit ordering column
      (SURVEY §7 hard part 3).

    Scale shape: one shuffle on the key columns; the window never sees a
    global sort (partitionBy keys only).
    """
    from pyspark.sql import Window

    keys = [F.col(c) for c in cols]
    if mode == "all":
        w = Window.partitionBy(*keys)
        return (
            df.withColumn("__cnt", F.count(F.lit(1)).over(w))
            .filter(F.col("__cnt") > 1)
            .drop("__cnt")
        )
    if mode not in ("exclude_first", "exclude_last"):
        raise ValueError(f"unknown report_duplicates mode {mode!r}")
    if order_by is None:
        raise ValueError(
            f"mode={mode!r} needs order_by= for a deterministic 'first'"
        )
    ob = F.col(order_by).asc() if mode == "exclude_first" else F.col(
        order_by
    ).desc()
    w = Window.partitionBy(*keys).orderBy(ob)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .drop("__rn")
    )


def _index_range(k: C) -> C:
    """``[0, k)`` as an int array, empty when ``k == 0``.  A bare
    ``sequence(0, k-1)`` is wrong for k=0: Spark generates a *descending*
    [0, -1], and downstream ``slice``/``element_at`` throw on index 0."""
    return F.slice(F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))), F.lit(1), k)


def shingles(col: C, n: int = 3) -> C:
    """Word n-gram shingle array from a text column (pure built-ins:
    split + transform over index range — stays in codegen).  Documents
    shorter than ``n`` words yield an empty array."""
    words = F.split(col, r"\s+")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    return F.transform(
        _index_range(k),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )


def shingle_hashes(col: C, n: int = 3) -> C:
    """31-bit hashes of word n-gram shingles, without materializing the
    shingle strings: each word is hashed once (:func:`hash31`), then the
    n word-hashes are combined position-sensitively with bounded
    multipliers mod 2^31-1.  ~n× fewer string hashes and no string
    allocation vs hashing ``shingles()`` output.

    Overflow-safe by construction (ANSI-mode compatible): word hashes
    < 2^31, multipliers < 2^28, so each product < 2^59 and an n-term sum
    < 2^63 for n ≤ 15."""
    if n > 15:
        raise ValueError("shingle_hashes supports n <= 15")
    words = F.split(col, r"\s+")
    wh = F.transform(words, hash31)
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    a, _ = portable_permutation_constants(max(n, 2), bound=1 << 28)
    def combine(i: C) -> C:
        out = F.element_at(wh, i + 1) * F.lit(a[0])
        for j in range(1, n):
            out = out + F.element_at(wh, i + 1 + j) * F.lit(a[j % len(a)])
        return out % F.lit(PORTABLE_P)
    return F.transform(_index_range(k), combine)


def minhash_signature(shingle_col: C, num_hashes: int = 64) -> C:
    """MinHash signature as an array<long> using xxhash64 with per-row salt.

    Expression form (min over the shingle array via higher-order functions).
    NOTE: lambda higher-order functions are interpreted, not codegen'd —
    prefer :func:`minhash_signatures` (explode + groupBy formulation) for
    large corpora.
    """
    sigs = []
    for i in range(num_hashes):
        salted = F.transform(
            shingle_col, lambda s, i=i: F.xxhash64(s, F.lit(i))
        )
        sigs.append(F.array_min(salted))
    return F.array(*sigs)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 64,
    shingle_n: int = 3,
    portable: bool = False,
) -> DataFrame:
    """MinHash signatures via explode + groupBy — the scalable formulation.

    Shape: explode shingles (no shuffle), compute ``num_hashes`` codegen'd
    ``xxhash64(shingle, seed)`` values per shingle row, groupBy doc with
    ``min`` aggregates.  Map-side partial aggregation reduces the shuffle to
    ``num_hashes`` longs per doc per partition — at 100 TB the shuffle moves
    signatures, never shingles.

    ``portable=True`` switches to the md5-prefix shingle hash and the
    mod-(2^31-1) permutation family (:func:`portable_hash28`) whose exact
    values an external SQL oracle can replay; plan shape is identical.

    Returns (id_col, sig: array<long>).
    """
    if portable:
        sh = F.transform(
            shingles(F.col(text_col), shingle_n), portable_hash28
        )
    else:
        sh = shingle_hashes(F.col(text_col), shingle_n)
    tokens = _ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(sh)).alias("__h"),
    )
    # one string hash per word (shingle_hashes), then `num_hashes`
    # multiply-add permutations mod 2^31-1: ~10x cheaper than hashing the
    # shingle string once per permutation.  h < 2^31 and a < 2^31 keep
    # every product < 2^62 — ANSI-safe in both the default and portable
    # families (they share the constants; only the base hash differs).
    # Generated-SQL build (one parser round trip per aggregate instead of
    # ~10 py4j calls per Column min) — pure integer arithmetic, so the
    # parsed tree computes the identical exact values
    a, b = portable_permutation_constants(num_hashes)
    mins = tokens.groupBy(id_col).agg(
        *[
            F.expr(_perm_min_sql("__h", a[i], b[i])).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.expr(
            "array(" + ", ".join(f"__h{i}" for i in range(num_hashes)) + ")"
        ).alias("sig"),
    )


def corpus_minhash(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """One-row CORPUS-level MinHash signature: per-permutation global
    min over every shingle hash in the corpus (portable md5-prefix
    family — oracle-replayable).  Treats the whole corpus as ONE
    shingle set, so two corpora's signatures estimate their corpus
    Jaccard resemblance (Broder '97) — see
    :func:`corpus_resemblance`.

    Plan: shingle explode is map-side, the global min agg partial-
    combines to ``num_hashes`` longs per partition — at 100 TB the wire
    carries k longs per partition, never shingles.
    """
    sh = F.transform(
        shingles(F.col(text_col), shingle_n), portable_hash28
    )
    tokens = _ensure_parallelism(df).select(
        F.explode(F.array_distinct(sh)).alias("__h")
    )
    a, b = portable_permutation_constants(num_hashes)
    agg = tokens.agg(
        *[
            F.expr(_perm_min_sql("__h", a[i], b[i])).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    )
    return agg.select(
        F.expr(
            "array(" + ", ".join(f"__m{i}" for i in range(num_hashes)) + ")"
        ).alias("sig")
    )


def corpus_resemblance(
    a_df: DataFrame,
    b_df: DataFrame,
    text_col: str = "text",
    *,
    num_hashes: int = 64,
    shingle_n: int = 3,
    exact: bool = False,
) -> DataFrame:
    """Corpus-level Jaccard resemblance of two corpora — the
    dedup-drift / version-overlap screen ("how much of corpus B is already
    in corpus A?" at the shingle-set grain, e.g. a new crawl vs the
    training set).  One row out:

    - ``n_agree`` / ``est`` — MinHash estimate: the fraction of the
      ``num_hashes`` permutations whose corpus-wide minima agree
      (unbiased for the Jaccard of the two shingle-hash sets, std err
      ``sqrt(J(1-J)/k)``).  This is the 100 TB path: each side costs
      one min-agg, k longs per partition on the wire.
    - with ``exact=True``: ``n_inter`` / ``n_union`` / ``j_exact`` from
      the distinct shingle-hash sets (one distinct + one groupBy over
      hash values — bounded by the 2^28 hash space, but still a
      distinct over corpus shingles; certification-grade, not the
      default at scale).

    Both paths are deterministic bit-replayable functions of the text
    (portable hash family), so an external SQL engine reproduces every
    output exactly — no tolerance verdicts needed.
    """
    if not exact:
        sa = corpus_minhash(
            a_df, text_col, num_hashes=num_hashes, shingle_n=shingle_n
        ).select(F.col("sig").alias("__sa"))
        sb = corpus_minhash(
            b_df, text_col, num_hashes=num_hashes, shingle_n=shingle_n
        ).select(F.col("sig").alias("__sb"))
        agree = F.size(
            F.filter(
                F.zip_with("__sa", "__sb", lambda x, y: x == y),
                lambda v: v,
            )
        )
        return sa.crossJoin(sb).select(
            F.lit(num_hashes).alias("num_hashes"),
            agree.cast("long").alias("n_agree"),
            (agree / F.lit(float(num_hashes))).alias("est"),
        )

    # exact=True: ONE distinct-hash frame feeds both the MinHash minima
    # and the exact set arithmetic.  The previous shape scanned (and
    # md5-shingled) each corpus twice — once for corpus_minhash, once
    # for the exact hash set — and the hash-set scans had no
    # parallelism floor, so the whole corpus hashed in a single task on
    # one-row-group files.  Per-permutation min over the DISTINCT hash
    # set is bit-identical to the min over the shingle multiset (min is
    # duplicate-blind), so every output is unchanged.
    def hash_flags(df: DataFrame, av: int, bv: int) -> DataFrame:
        sh = F.transform(
            shingles(F.col(text_col), shingle_n), portable_hash28
        )
        return _ensure_parallelism(df).select(
            F.explode(F.array_distinct(sh)).alias("__h"),
            F.lit(av).alias("__a"),
            F.lit(bv).alias("__b"),
        )

    grouped = (
        hash_flags(a_df, 1, 0)
        .union(hash_flags(b_df, 0, 1))
        .groupBy("__h")
        .agg(F.max("__a").alias("__a"), F.max("__b").alias("__b"))
    )
    pa, pb = portable_permutation_constants(num_hashes)
    agg = grouped.agg(
        F.count(F.lit(1)).cast("long").alias("n_union"),
        F.sum(F.col("__a") * F.col("__b")).cast("long").alias("n_inter"),
        *[
            F.expr(_perm_min_sql("__h", pa[i], pb[i], guard="__a = 1"))
            .alias(f"__ma{i}")
            for i in range(num_hashes)
        ],
        *[
            F.expr(_perm_min_sql("__h", pa[i], pb[i], guard="__b = 1"))
            .alias(f"__mb{i}")
            for i in range(num_hashes)
        ],
    )
    agree = F.size(
        F.filter(
            F.zip_with(
                F.expr(
                    "array("
                    + ", ".join(f"__ma{i}" for i in range(num_hashes))
                    + ")"
                ),
                F.expr(
                    "array("
                    + ", ".join(f"__mb{i}" for i in range(num_hashes))
                    + ")"
                ),
                lambda x, y: x == y,
            ),
            lambda v: v,
        )
    )
    return agg.select(
        F.lit(num_hashes).alias("num_hashes"),
        agree.cast("long").alias("n_agree"),
        (agree / F.lit(float(num_hashes))).alias("est"),
        "n_inter",
        "n_union",
        F.try_divide(F.col("n_inter"), F.col("n_union"))
        .alias("j_exact"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    portable: bool = False,
    storage_level: str | None = "MEMORY_AND_DISK",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    Returns (id_a, id_b) with id_a < id_b.  Scale shape: one projection to
    compute signatures, explode to ``bands`` rows per doc, shuffle on
    (band, band_hash) — bucket sizes are data-dependent but tiny for
    non-duplicate-heavy corpora; the join never touches raw text.

    ``portable=True``: oracle-replayable hashes (see
    :func:`minhash_signatures`); band keys stay below 2^63 by bounding the
    combine multipliers to 2^28 (sig < 2^31, so each product < 2^59 and a
    4-term sum < 2^61 — no overflow in an ANSI engine).

    ``storage_level`` controls caching of the banded (id, band-keys) frame
    that the self-join reads twice: any ``pyspark.StorageLevel`` name, or
    ``None`` to skip the cache and let Spark recompute the signature
    lineage per side — the right call when |corpus|×bands rows don't fit
    executor storage at 100 TB (see ``similarity._materialize``).
    """
    from pandera_spark.operators.similarity import _materialize

    banded = banded_minhash_frame(
        df, id_col, text_col, num_hashes=num_hashes, bands=bands,
        shingle_n=shingle_n, portable=portable,
    )
    # the self-join reads `banded` twice and Spark does not reuse the
    # exchange across the two sides — optionally persist the (id, band
    # keys) frame (tiny: ids + band keys, never text) so signatures are
    # computed once
    banded = _materialize(banded, storage_level)
    return _first_match_pairs(banded, banded, bands)


def banded_minhash_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    portable: bool = False,
) -> DataFrame:
    """The LSH-ready banded signature frame: one row per (doc, band) —
    ``(__id, __bkeys: array<long>, band, bhash)``.  This is the unit a
    persistent dedup index stores (:func:`write_minhash_index`): ids +
    band keys only, never text."""
    rows = num_hashes // bands
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes=num_hashes, shingle_n=shingle_n,
        portable=portable,
    ).select(F.col(id_col).alias("__id"), F.col("sig").alias("__sig"))
    # band key = multiply-add combine of the band's signature longs (no
    # string building; ~4 long ops per band, tiny codegen footprint).
    # sig values < 2^31 and multipliers < 2^28 keep every product < 2^59
    # and the per-band sum < 2^63 — ANSI-safe, shared by both families
    ca, cb = portable_permutation_constants(rows, bound=1 << 28)

    def band_key_sql(b: int) -> str:
        # same left-associated multiply-add fold as the Column build it
        # replaces; integer arithmetic, identical exact values
        out = f"{cb[0]}L"
        for r in range(rows):
            out = f"{out} + __sig[{b * rows + r}] * {ca[r]}L"
        return f"(({out}) % {PORTABLE_P}L)"
    # carry ALL band keys (bands longs) so multi-band matches dedup by the
    # first-matching-band filter instead of a distinct() — the candidate
    # pair set never takes a second shuffle (on dup-heavy corpora pairs
    # >> rows, so a pair-level shuffle is the expensive one).  One
    # generated-SQL array build = one parser round trip for all bands
    return sigs.select(
        "__id",
        F.expr(
            "array("
            + ", ".join(band_key_sql(b) for b in range(bands))
            + ")"
        ).alias("__bkeys"),
    ).select(
        "__id",
        "__bkeys",
        F.posexplode("__bkeys").alias("band", "bhash"),
    )


def _first_match_pairs(
    left: DataFrame, right: DataFrame, bands: int, *, ordered: bool = True
) -> DataFrame:
    """Join two banded frames on (band, bhash) and keep each colliding
    pair exactly once via the first-matching-band filter.  ``ordered``
    joins on ``a.__id < b.__id`` (self-join); False joins on ``!=`` and
    orients output by least/greatest (cross-frame joins where id ranges
    interleave)."""
    # one generated CASE (checks band 0 first, like the nested whens it
    # replaces) — a single parser round trip instead of 2 py4j-built
    # Column whens per band
    fm = F.expr(
        "CASE "
        + " ".join(
            f"WHEN `a`.`__bkeys`[{b}] = `b`.`__bkeys`[{b}] THEN {b}"
            for b in range(bands)
        )
        + " ELSE -1 END"
    )
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bhash") == F.col("b.bhash"))
        & (
            (F.col("a.__id") < F.col("b.__id"))
            if ordered
            else (F.col("a.__id") != F.col("b.__id"))
        )
    )
    out = (
        left.alias("a")
        .join(right.alias("b"), cond)
        .filter(F.col("a.band") == fm)
    )
    if ordered:
        return out.select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
    return out.select(
        F.least("a.__id", "b.__id").alias("id_a"),
        F.greatest("a.__id", "b.__id").alias("id_b"),
    )


def write_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    portable: bool = False,
    mode: str = "overwrite",
) -> None:
    """Persist the banded signature index for incremental dedup: a
    parquet of (id, band keys) rows, ~``bands`` rows × a few longs per
    document — text never touches the index.  Append each ingested
    batch (``mode="append"``) so tomorrow's crawl only ever joins
    against signatures, never re-reads yesterday's corpus."""
    banded_minhash_frame(
        df, id_col, text_col, num_hashes=num_hashes, bands=bands,
        shingle_n=shingle_n, portable=portable,
    ).write.mode(mode).parquet(path)


def incremental_minhash_candidates(
    new_df: DataFrame,
    index: "DataFrame | str",
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    portable: bool = False,
    storage_level: str | None = "MEMORY_AND_DISK",
) -> DataFrame:
    """Near-dup candidates for an INCREMENTAL batch: new-vs-index plus
    new-vs-new, without touching the already-indexed corpus text.

    ``index`` is a banded frame (:func:`banded_minhash_frame`) or a path
    written by :func:`write_minhash_index` (same LSH parameters!).
    Returns ``(id_a, id_b)``, each colliding pair once — exactly the
    pairs the full-corpus run would emit that involve at least one new
    document.  The daily-ingest shape at 100 TB: signature the new
    batch (one scan of new text), two bucket joins against id+key
    frames; yesterday's corpus is never rescanned.
    """
    from pandera_spark.operators.similarity import _materialize

    if isinstance(index, str):
        index = new_df.sparkSession.read.parquet(index)
    new_banded = _materialize(
        banded_minhash_frame(
            new_df, id_col, text_col, num_hashes=num_hashes, bands=bands,
            shingle_n=shingle_n, portable=portable,
        ),
        storage_level,
    )
    new_new = _first_match_pairs(new_banded, new_banded, bands)
    # a re-ingested document (same id in batch AND index — the
    # append-mode daily workflow) would otherwise surface each of its
    # pairs twice, once per join: drop its index rows, the new-vs-new
    # join already covers it
    old_only = index.join(
        new_banded.select("__id").distinct(),
        "__id",
        "left_anti",
    )
    new_old = _first_match_pairs(
        new_banded, old_only, bands, ordered=False
    )
    return new_new.unionByName(new_old)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    candidates: DataFrame | None = None,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    When ``candidates`` is None, falls back to MinHash-LSH candidate
    generation first (never all-pairs).  Jaccard via
    ``array_intersect``/``array_union`` sizes — JVM built-ins.
    """
    if candidates is None:
        candidates = minhash_lsh_candidates(df, id_col, text_col,
                                            shingle_n=shingle_n)
    # Jaccard over hashed shingles (identical value modulo 64-bit hash
    # collisions): the candidate join carries array<long>, never text
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(
            shingle_hashes(F.col(text_col), shingle_n)
        ).alias("__sh"),
    )
    a = sh.alias("sa")
    b = sh.alias("sb")
    joined = (
        candidates.join(a, F.col("id_a") == F.col("sa.__id"))
        .join(b, F.col("id_b") == F.col("sb.__id"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sa.__sh", "sb.__sh"))
                / F.size(F.array_union("sa.__sh", "sb.__sh"))
            ).alias("jaccard"),
        )
    )
    return joined.filter(F.col("jaccard") >= threshold)


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    candidates: DataFrame | None = None,
    shingle_n: int = 3,
    max_norm_distance: float = 0.2,
    max_chars: int = 2000,
) -> DataFrame:
    """Exact edit-distance verification for candidate pairs: keep pairs
    whose normalized Levenshtein distance ``lev(a, b) / max(len(a),
    len(b))`` is at most ``max_norm_distance``.

    The character-level complement to :func:`ngram_jaccard_pairs`
    (token-set overlap is blind to transpositions and small in-word
    edits; edit distance is not).  ``F.levenshtein`` is a JVM built-in
    — no UDF — but it is O(len_a * len_b) per pair, so two guards keep
    the plan scale-safe: it only ever runs on CANDIDATE pairs (MinHash
    LSH generated when ``candidates`` is None — never all-pairs), and
    both sides are truncated to ``max_chars`` (Spark's own levenshtein
    threshold form ``levenshtein(a, b, k)`` short-circuits the DP at
    distance k, which the expression uses to bound per-pair work).

    Output: ``(id_a, id_b, edit_distance, norm_distance)``.
    """
    if not 0.0 <= max_norm_distance <= 1.0:
        raise ValueError(
            f"max_norm_distance must be in [0, 1]: {max_norm_distance}"
        )
    if candidates is None:
        candidates = minhash_lsh_candidates(df, id_col, text_col,
                                            shingle_n=shingle_n)
    txt = df.select(
        F.col(id_col).alias("__id"),
        F.substring(F.col(text_col), 1, max_chars).alias("__t"),
    )
    a, b = txt.alias("ea"), txt.alias("eb")
    len_max = F.greatest(F.length("ea.__t"), F.length("eb.__t"))
    # distance bound: beyond ceil(max_norm * max_chars) the pair is out
    # anyway (norm uses len <= max_chars), so the threshold form can stop
    # the DP early; the API needs a foldable int, hence the static bound
    bound = int(math.ceil(max_chars * max_norm_distance))
    dist = F.levenshtein(F.col("ea.__t"), F.col("eb.__t"), bound)
    joined = (
        candidates.join(a, F.col("id_a") == F.col("ea.__id"))
        .join(b, F.col("id_b") == F.col("eb.__id"))
        .select(
            "id_a",
            "id_b",
            dist.cast("long").alias("edit_distance"),
            F.when(len_max == 0, F.lit(0.0))
            .otherwise(dist / len_max)
            .alias("norm_distance"),
        )
    )
    # the threshold form returns -1 when the bound is exceeded
    return joined.filter(
        (F.col("edit_distance") >= 0)
        & (F.col("norm_distance") <= max_norm_distance)
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    candidates: DataFrame | None = None,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Asymmetric n-gram containment for candidate pairs:
    ``containment(A in B) = |A ∩ B| / |A|`` — catches doc-in-doc
    duplication (quotes, boilerplate wrappers, prepended headers) that
    symmetric Jaccard under-scores when the containing document is much
    longer.  Returns ``(id_a, id_b, containment_ab, containment_ba)``
    with pairs kept when EITHER direction reaches ``threshold``.

    Same shape as :func:`ngram_jaccard_pairs`: candidates-only (never
    all-pairs), hashed-shingle arrays in the join, JVM built-ins.
    """
    if candidates is None:
        candidates = minhash_lsh_candidates(df, id_col, text_col,
                                            shingle_n=shingle_n)
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(
            shingle_hashes(F.col(text_col), shingle_n)
        ).alias("__sh"),
    )
    a = sh.alias("sa")
    b = sh.alias("sb")
    inter = F.size(F.array_intersect("sa.__sh", "sb.__sh")).cast("double")
    joined = (
        candidates.join(a, F.col("id_a") == F.col("sa.__id"))
        .join(b, F.col("id_b") == F.col("sb.__id"))
        .select(
            "id_a",
            "id_b",
            (inter / F.size("sa.__sh")).alias("containment_ab"),
            (inter / F.size("sb.__sh")).alias("containment_ba"),
        )
    )
    return joined.filter(
        (F.col("containment_ab") >= threshold)
        | (F.col("containment_ba") >= threshold)
    )


def _mask_lit(bit: int) -> C:
    """Signed-long literal with only ``bit`` set (bit 63 wraps negative)."""
    m = 1 << bit
    if m >= 1 << 63:
        m -= 1 << 64
    return F.lit(m).cast("long")


def simhash(col: C, num_bits: int = 64) -> C:
    """64-bit SimHash over word tokens, pure built-ins.

    Implementation: per token a 64-bit hash; for each bit position the
    signed contribution is summed with ``aggregate``; sign of the sum sets
    the output bit.  Compiled entirely to Catalyst expressions.
    """
    words = F.split(col, r"\s+")
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    bit_exprs = []
    for bit in range(num_bits):
        mask = _mask_lit(bit)
        contrib = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(mask) != 0, F.lit(1)).otherwise(F.lit(-1)),
        )
        bit_exprs.append(
            F.when(contrib > 0, mask).otherwise(F.lit(0).cast("long"))
        )
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out.bitwiseOR(e)
    return out


def simhashes(
    df: DataFrame, id_col: str, text_col: str, *, num_bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """SimHash via explode + groupBy — the scalable formulation
    (codegen'd when/sum aggregates instead of interpreted lambda folds).

    Returns (id_col, simhash: long).  Map-side partial aggregation shuffles
    ``num_bits`` small sums per doc per partition.

    ``portable=True``: md5-prefix 28-bit word hash (oracle-replayable,
    :func:`portable_hash28`) — requires ``num_bits <= 28``.
    """
    if portable and num_bits > 28:
        raise ValueError("portable simhash carries 28 hash bits at most")
    word_hash = portable_hash28 if portable else F.xxhash64
    tokens = _ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("__w"),
    ).select(F.col(id_col), word_hash(F.col("__w")).alias("__h"))
    # branch-free bit sums: sum((h >> b) & 1) per bit plus a row count;
    # bit b is set iff set-count > half (2*ones > n  <=>  sum(+-1) > 0).
    # Generated-SQL build (one parser round trip per aggregate + one for
    # the whole OR-fold instead of ~10 py4j calls per bit, measured
    # 9.8k send_commands per simhash_near_dups build) — integer
    # arithmetic only, identical exact values
    sums = tokens.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.expr(f"sum((shiftrightunsigned(__h, {b}) & 1))")
            .alias(f"__b{b}")
            for b in range(num_bits)
        ]
    )

    def _mask_sql(bit: int) -> str:
        m = 1 << bit
        if m >= 1 << 63:
            # -2^63 cannot be written as one literal (unary minus on an
            # overflowing positive); the folded subtraction is exact
            return "(-9223372036854775807L - 1L)"
        return f"{m}L"

    sh = F.expr(
        " | ".join(
            f"(CASE WHEN __b{b} * 2 > __n THEN {_mask_sql(b)}"
            f" ELSE 0L END)"
            for b in range(num_bits)
        )
    )
    return sums.select(F.col(id_col), sh.alias("simhash"))


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, *, max_hamming: int = 3,
    num_bits: int = 64, portable: bool = False,
    storage_level: str | None = "MEMORY_AND_DISK",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Scale path: block on 4 16-bit chunks (pigeonhole — any pair within
    hamming distance 3 shares at least one exact chunk), join per chunk,
    verify with bit_count.  Avoids all-pairs entirely.

    ``storage_level``: cache policy for the blocked self-join input —
    any ``pyspark.StorageLevel`` name, or ``None`` to recompute lineage
    instead of caching (see :func:`minhash_lsh_candidates`).
    """
    from pandera_spark.operators.similarity import _materialize
    sh = simhashes(
        df, id_col, text_col, num_bits=num_bits, portable=portable
    ).select(
        F.col(id_col).alias("__id"), F.col("simhash").alias("__sh")
    )
    chunks = 4
    width = num_bits // chunks
    mask = (1 << width) - 1
    blocked = sh.select(
        "__id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned("__sh", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("ckey"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("c"),
    ).select("__id", "__sh", "c.chunk", "c.ckey")
    blocked = _materialize(blocked, storage_level)
    a, b = blocked.alias("a"), blocked.alias("b")

    # first-matching-chunk filter replaces distinct(): both simhashes ride
    # the join row already, so dedup of multi-chunk matches is free bit
    # math — no pair-level shuffle
    def ckey(col: C, i: int) -> C:
        return F.shiftrightunsigned(col, i * width).bitwiseAND(F.lit(mask))

    fm = F.lit(-1)
    for i in range(chunks - 1, -1, -1):
        fm = F.when(
            ckey(F.col("a.__sh"), i) == ckey(F.col("b.__sh"), i), F.lit(i)
        ).otherwise(fm)

    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .filter(F.col("a.chunk") == fm)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(
                F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))
            ).alias("hamming"),
        )
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# --- exact substring (repeated k-gram span) dedup ---------------------------


def _token_grams(
    df: DataFrame, id_col: str, text_col: str, k: int, token_pattern: str,
    hash_grams: bool,
) -> tuple[DataFrame, DataFrame]:
    """(positions, base): positions = one row per token ``k``-gram with
    its 1-based start position; base = one row per doc with its token
    count.  The positions frame carries an 8-byte gram hash by default
    (``hash_grams=False`` keeps the gram string — bit-exact replayable
    by a SQL oracle, at the cost of shuffling k-token strings)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(token_pattern), 0
    )
    t = df.select(F.col(id_col).alias("__id"), toks.alias("__w"))
    base = t.select("__id", F.size("__w").alias("__n_tokens"))
    n_grams = F.size("__w") - F.lit(k - 1)
    # sequence(1, n) descends when n < 1 — guard short docs to an empty list
    idx = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    gram_str = lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i, k))  # noqa: E731
    gram = (
        (lambda i: F.xxhash64(gram_str(i))) if hash_grams else gram_str
    )
    pos = t.select(
        "__id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(i.alias("pos"), gram(i).alias("g")),
            )
        ).alias("p"),
    ).select("__id", F.col("p.pos").alias("__pos"), F.col("p.g").alias("__g"))
    return pos, base


def _dup_positions(
    pos: DataFrame, k: int, min_count: int, keep: str
) -> DataFrame:
    """Positions whose k-gram repeats >= min_count times corpus-wide.

    ``keep="none"`` marks EVERY occurrence (report mode: how much of
    each doc is corpus-duplicated text); ``keep="first"`` spares the
    globally first occurrence (lowest (doc, pos)) so one copy of each
    repeated span survives a strip (Lee et al. 2022 exact-substring
    semantics).  Uses a mergeable count+min aggregation and a hash join
    back — NOT a window over the gram key, whose per-key sort would
    straggle on mega-hot grams at 100 TB.
    """
    if keep not in ("none", "first"):
        raise ValueError(f'keep must be "none" or "first", got {keep!r}')
    stats = (
        pos.groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.min(F.struct("__id", "__pos")).alias("__first"),
        )
        .filter(F.col("__cnt") >= min_count)
    )
    dup = pos.join(stats, "__g")
    if keep == "first":
        dup = dup.filter(
            F.struct("__id", "__pos") != F.col("__first")
        )
    return dup.select("__id", "__pos")


def _merge_spans(dup: DataFrame, k: int) -> DataFrame:
    """Merge per-doc duplicated k-gram positions into maximal spans
    (gaps-and-islands): positions p, p' belong to one span when their
    [p, p+k-1] coverage intervals overlap or touch (p' - p <= k).
    Window is per-doc (bounded by doc length) — never global."""
    from pyspark.sql import Window

    wdoc = Window.partitionBy("__id").orderBy("__pos")
    brk = F.when(
        F.col("__pos") - F.lag("__pos").over(wdoc) <= k, F.lit(0)
    ).otherwise(F.lit(1))
    isl = dup.withColumn("__brk", brk).withColumn(
        "__island", F.sum("__brk").over(wdoc)
    )
    return isl.groupBy("__id", "__island").agg(
        F.min("__pos").alias("span_start"),
        (F.max("__pos") + F.lit(k - 1)).alias("span_end"),
    )


def repeated_span_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    min_count: int = 2,
    keep: str = "none",
    token_pattern: str = "[a-z0-9]+",
    hash_grams: bool = True,
) -> DataFrame:
    """Per-doc exact-substring duplication report: how many maximal
    spans of >= ``k`` consecutive tokens also appear elsewhere in the
    corpus (>= ``min_count`` occurrences total), and what fraction of
    the doc's tokens they cover.

    The span-level member of the dedup family (doc-level:
    :func:`exact_dedup_stats`; line-level: ``text.line_dedup``;
    chunk-level: ``chunking.shared_passages``) — the screen behind
    "dedup training data at the substring level" (Lee et al. 2022,
    arXiv:2107.06499; reference has no counterpart).

    Returns ``(id_col, n_tokens, n_spans, dup_tokens, dup_frac)``.

    Design for 100 TB:
    - only ``(doc, pos, gram-hash)`` triples shuffle — text never does;
    - the gram-frequency pass is a map-side-combinable count+min agg
      (hot grams combine per-partition; no per-key window sort);
    - span merging windows per doc, bounded by doc length.
    """
    pos, base = _token_grams(df, id_col, text_col, k, token_pattern,
                             hash_grams)
    dup = _dup_positions(pos, k, min_count, keep)
    spans = _merge_spans(dup, k)
    rep = spans.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias(
            "dup_tokens"
        ),
    )
    out = base.join(rep, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.col("__n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.col("dup_tokens"), F.lit(0))
        .cast("long")
        .alias("dup_tokens"),
        (
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
            / F.greatest(F.col("__n_tokens"), F.lit(1)).cast("double")
        ).alias("dup_frac"),
    )
    return out


def strip_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    min_count: int = 2,
    keep: str = "first",
    token_pattern: str = "[a-z0-9]+",
    hash_grams: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Remove corpus-repeated token spans from each document, keeping
    (by default) the globally first occurrence of every repeated
    substring — exact-substring training-data dedup (Lee et al. 2022).

    Rebuilds ``out_col`` (default: replaces ``text_col``) from the
    tokens NOT covered by any duplicated span.  Tokenization is
    destructive (case/punctuation normalised) — this is a corpus-prep
    operator, not a lossless editor.

    The doc's span list rides a per-doc array (bounded by len/k), so
    the strip itself is a pure projection: no UDF, no extra shuffle
    beyond :func:`repeated_span_report`'s.
    """
    out_col = out_col or text_col
    pos, _ = _token_grams(df, id_col, text_col, k, token_pattern,
                          hash_grams)
    dup = _dup_positions(pos, k, min_count, keep)
    spans = _merge_spans(dup, k)
    per_doc = spans.groupBy("__id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(token_pattern), 0
    )
    covered = lambda p: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda s: (p >= s.span_start) & (p <= s.span_end),
    )
    joined = df.join(
        per_doc, df[id_col] == per_doc["__id"], "left"
    )
    kept = F.when(F.col("__spans").isNull(), toks).otherwise(
        F.transform(
            F.filter(
                F.transform(
                    toks,
                    lambda tok, i: F.struct(
                        tok.alias("tok"), (i + 1).alias("pos")
                    ),
                ),
                lambda p: ~covered(p.pos),
            ),
            lambda p: p.tok,
        )
    )
    return joined.withColumn(out_col, F.concat_ws(" ", kept)).drop(
        "__id", "__spans"
    )


def cross_source_dup_matrix(
    df: DataFrame,
    content_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """WHO duplicates WHOM: for every (unordered) source pair, how many
    distinct contents appear in BOTH — the provenance matrix that tells
    a curation pass whether duplication is mirror-site structure
    (concentrated pairs) or organic (diffuse), and which source to keep
    as canonical.  Includes the diagonal (content duplicated WITHIN a
    source).

    Plan: hash-first digest per (source, content) pair — documents
    never shuffle — then distinct (source, digest), then a digest-keyed
    self-join restricted to ``src_a <= src_b``.  The join key is the
    digest, whose per-key multiplicity is bounded by the SOURCE COUNT
    (each side is distinct per source), so the join cannot quadratic on
    popular content the way a row-grain self-join would.  Output is at
    most |sources|² rows.

    Returns ``(src_a, src_b, shared_contents)``.
    """
    h = F.md5(F.col(content_col))
    sd = (
        df.where(
            F.col(content_col).isNotNull() & F.col(source_col).isNotNull()
        )
        .select(F.col(source_col).alias("s"), h.alias("__h"))
        .distinct()
    )
    a = sd.select(F.col("s").alias("src_a"), "__h")
    b = sd.select(F.col("s").alias("src_b"), "__h")
    pairs = a.join(b, "__h").where(F.col("src_a") <= F.col("src_b"))
    # diagonal semantics: (s, s) counts contents present in s that are
    # duplicated ANYWHERE in s — recompute separately from row counts
    diag = (
        df.where(
            F.col(content_col).isNotNull() & F.col(source_col).isNotNull()
        )
        .groupBy(F.col(source_col).alias("src_a"), h.alias("__h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .groupBy("src_a")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_contents"))
        .select("src_a", F.col("src_a").alias("src_b"), "shared_contents")
    )
    off = (
        pairs.where(F.col("src_a") != F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_contents"))
    )
    return off.unionByName(diag)
