"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All hot-path expressions are Spark built-ins (regexp/length/split — JVM,
whole-stage codegen); nothing here drops to Python per row.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# tiny per-language stopword marker lists for the n-gram heuristic language
# identifier — public common words, 8 per language.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "pour", "que", "une"],
    "es": ["el", "la", "los", "que", "es", "por", "una", "para"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def token_count(col: C) -> C:
    """Whitespace token count (split — JVM-side)."""
    return F.when(
        F.length(F.trim(col)) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(col), r"\s+"))).cast("long")


def bpe_ish_token_count(col: C) -> C:
    """BPE-ish token estimate: count word-piece-like segments
    (letter runs, digit runs, punctuation singletons) via regexp_count."""
    return (
        F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    ).cast("long")


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics: (doc_id, n_chars_computed, n_tokens)."""
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars_computed"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )


def quality_score(col: C) -> C:
    """Heuristic quality score in [0,1] from length/punctuation/stopword
    ratios (the classic pre-training quality gates)."""
    n_chars = F.length(col).cast("double")
    n_tokens = token_count(col).cast("double")
    n_punct = F.regexp_count(col, F.lit(r"[^\w\s]")).cast("double")
    n_stop = F.regexp_count(
        col, F.lit(r"(?i)\b(the|and|of|to|in|is|that|for|a|with)\b")
    ).cast("double")
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(1.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    length_ok = F.when((n_chars >= 20) & (n_chars <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    word_len_ok = F.when(
        (mean_word_len >= 2.0) & (mean_word_len <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_sig = F.least(stop_ratio * 4.0, F.lit(1.0))
    return (
        length_ok * 0.3 + word_len_ok * 0.3 + punct_ok * 0.2 + stop_sig * 0.2
    )


def text_quality(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics."""
    col = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(col).cast("long").alias("n_chars"),
        token_count(col).alias("n_tokens"),
        F.regexp_count(col, F.lit(r"[^\w\s]")).cast("long").alias("n_punct"),
        F.round(quality_score(col), 6).alias("quality"),
    )


def language_scores(col: C) -> dict[str, C]:
    """Marker-word hit count per language (vectorized regexp_count)."""
    out = {}
    for lang, words in _LANG_MARKERS.items():
        if lang == "zh":
            pat = "(" + "|".join(words) + ")"
        else:
            pat = r"(?i)\b(" + "|".join(words) + r")\b"
        out[lang] = F.regexp_count(col, F.lit(pat))
    return out


def detect_language(col: C) -> C:
    """argmax over language marker scores; 'und' when nothing matches."""
    scores = language_scores(col)
    pairs = F.array(
        *[
            F.struct(s.cast("long").alias("score"), F.lit(lang).alias("lang"))
            for lang, s in scores.items()
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document language guess: (doc_id, lang_pred)."""
    return df.select(
        F.col(id_col), detect_language(F.col(text_col)).alias("lang_pred")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    ngram_n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signals per document — the standard
    pre-training quality gate for boilerplate/spam ("Scaling Language
    Models" Rae et al. 2021 §A1.1 uses duplicate-line/-n-gram fractions).

    Returns (id, n_words, dup_word_frac, n_grams, dup_gram_frac,
    top_gram_frac):

    - ``dup_word_frac`` = 1 - distinct/total words (pure array
      expressions, no shuffle).
    - ``dup_gram_frac`` / ``top_gram_frac`` over word ``ngram_n``-grams
      via the scalable explode + two-level groupBy formulation: the
      per-(doc, gram) count shuffles small (id, hash)-keyed rows with
      map-side combine — n-gram strings never shuffle; docs with fewer
      than ``ngram_n`` words report zero grams.
    """
    from .dedup import shingles

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(words)).cast("long").alias("n_words"),
        F.when(
            (F.length(F.trim(F.col(text_col))) == 0) | (F.size(words) == 0),
            F.lit(0.0),
        )
        .otherwise(
            1.0 - F.size(F.array_distinct(words)) / F.size(words)
        )
        .alias("dup_word_frac"),
        shingles(F.col(text_col), ngram_n).alias("__grams"),
    )
    grams = base.select(
        F.col(id_col), F.explode("__grams").alias("__gram")
    ).select(F.col(id_col), F.xxhash64("__gram").alias("__g"))
    per_gram = grams.groupBy(id_col, "__g").agg(
        F.count(F.lit(1)).alias("__c")
    )
    gram_stats = per_gram.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_grams"),
        (1.0 - F.count(F.lit(1)) / F.sum("__c")).alias("dup_gram_frac"),
        (F.max("__c") / F.sum("__c")).alias("top_gram_frac"),
    )
    return base.drop("__grams").join(gram_stats, id_col, "left").select(
        F.col(id_col),
        "n_words",
        F.round("dup_word_frac", 6).alias("dup_word_frac"),
        F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
        F.round(F.coalesce(F.col("dup_gram_frac"), F.lit(0.0)), 6).alias(
            "dup_gram_frac"
        ),
        F.round(F.coalesce(F.col("top_gram_frac"), F.lit(0.0)), 6).alias(
            "top_gram_frac"
        ),
    )


#: PII patterns shared by counting and scrubbing — expressible identically
#: in Java regex (Spark) and RE2 (DuckDB) so oracle replay is exact
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[- ]\d{3}[- ]\d{4}\b",
}


def pii_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII match counts: (id, n_email, n_ipv4, n_phone).
    Pure ``regexp_count`` projections — JVM-side, no shuffle."""
    col = F.col(text_col)
    return df.select(
        F.col(id_col),
        *[
            F.regexp_count(col, F.lit(pat)).cast("long").alias(f"n_{name}")
            for name, pat in PII_PATTERNS.items()
        ],
    )


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    *,
    replacement: str = "[PII]",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Redact PII in-place (chained ``regexp_replace`` — one projection,
    no shuffle, order follows the patterns dict)."""
    col = F.col(text_col)
    for pat in (patterns or PII_PATTERNS).values():
        col = F.regexp_replace(col, pat, replacement)
    return df.withColumn(text_col, col)


def fingerprint(col: C, *, normalize: bool = True) -> C:
    """Deterministic 64-bit document fingerprint.

    Normalization: lowercase, collapse whitespace, strip punctuation — then
    xxhash64.  Rolling-hash shingle fingerprints live in operators.dedup.
    """
    c = col
    if normalize:
        c = F.lower(c)
        c = F.regexp_replace(c, r"[^\w\s]", "")
        c = F.regexp_replace(c, r"\s+", " ")
        c = F.trim(c)
    return F.xxhash64(c)


def document_fingerprints(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint")
    )


def word_ngrams(col: C, n: int = 2, *, sep: str = " ") -> C:
    """Array of word ``n``-grams from a single-space token split.

    The split is a literal single space (not ``\\s+``) so an external
    SQL engine can replay it verbatim (``string_split(text, ' ')``);
    shorter-than-``n`` documents yield an empty array.  Pure
    higher-order-function expression — grams are built JVM-side with
    ``transform``/``slice``, no UDF, no shuffle."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = F.split(col, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(sep, F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_counts(
    df: DataFrame, text_col: str = "text", *, n: int = 2
) -> DataFrame:
    """Corpus-wide n-gram occurrence counts: ``(gram, n_occurrences)``.

    explode -> groupBy: the only shuffle carries one row per distinct
    gram per map task (partial aggregation), never the exploded rows.
    """
    return (
        df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def top_ngrams(
    df: DataFrame, text_col: str = "text", *, n: int = 2, k: int = 20
) -> DataFrame:
    """Top-``k`` most frequent word n-grams with a total deterministic
    order (count desc, gram asc).  ``orderBy().limit(k)`` compiles to
    ``TakeOrderedAndProject`` — each task keeps a k-row heap and the
    driver merges k rows per task, so the global sort never
    materializes (the heavy-hitter plan you want at 100 TB)."""
    return ngram_counts(df, text_col, n=n).orderBy(
        F.col("n_occurrences").desc(), F.col("gram").asc()
    ).limit(k)


def corpus_profile(
    df: DataFrame,
    by: str = "source",
    *,
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus health profile in ONE aggregation pass:
    ``(by, n_docs, sum_chars, sum_tokens, avg_quality, n_langs)``.

    The standard curation dashboard (docs/tokens per source, mean
    quality, language spread) — every metric folds into the same
    groupBy, so a 100 TB corpus is profiled in a single shuffle of
    one row per (task, group)."""
    col = F.col(text_col)
    return df.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.length(col).cast("long")), F.lit(0)).alias(
            "sum_chars"
        ),
        F.coalesce(F.sum(token_count(col)), F.lit(0)).alias("sum_tokens"),
        F.round(F.avg(quality_score(col)), 6).alias("avg_quality"),
        F.countDistinct(detect_language(col)).alias("n_langs"),
    )


def corpus_line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    delimiter: str = "\n",
    max_doc_frequency: int = 2,
    out_col: str | None = None,
) -> DataFrame:
    """C4-style corpus-level line deduplication: drop every line (text
    segment between ``delimiter`` occurrences) that appears in more than
    ``max_doc_frequency`` distinct documents, then reassemble each
    document with its surviving lines in original order.

    The classic boilerplate remover (nav bars, cookie banners, license
    headers recur verbatim across a crawl).  With ``delimiter=' '`` it
    degrades to corpus-frequency token filtering.

    Returns ``(id_col, out_col)`` — documents whose every line was
    removed disappear from the result (their cleaned text would be
    empty).

    Plan: posexplode lines -> groupBy(line) distinct-doc counts (the
    line-frequency shuffle) -> join survivors back -> groupBy(id)
    ordered reassembly (``array_sort`` over (pos, line) structs, JVM
    built-ins).  Two shuffles over line-grain data — the inherent cost
    of corpus-wide line frequency; both aggregate map-side first.
    """
    out_col = out_col or text_col
    # F.split takes a REGEX: escape the literal delimiter so '.', '|'
    # and friends split literally (reassembly below joins the literal)
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(delimiter), -1)
        ).alias("__pos", "__line"),
    )
    freq = lines.groupBy("__line").agg(
        F.countDistinct(id_col).alias("__df")
    )
    kept = lines.join(freq, "__line").filter(
        F.col("__df") <= F.lit(int(max_doc_frequency))
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__line"))
                ),
                lambda s: s["__line"],
            ),
            delimiter,
        ).alias(out_col)
    )


def intra_doc_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    delimiter: str = "\n",
    out_col: str | None = None,
    stats: bool = True,
) -> DataFrame:
    """WITHIN-document segment deduplication: keep only the FIRST
    occurrence of each repeated line/segment inside a document,
    preserving order.

    The Gopher/C4 cleaning step that :func:`corpus_line_dedup` does NOT
    cover: that one removes segments repeated ACROSS documents (two
    shuffles, corpus-wide frequency); this one removes segments a single
    document repeats internally (templated pages re-rendering the same
    block, scraper loops, chat logs echoing the prompt).  With
    ``delimiter=' '`` it scrubs immediate-and-distant repeated tokens.

    Plan: split -> ``filter(toks, (x, i) -> array_position(toks, x) =
    i+1)`` (first-occurrence test, 1-based) -> ``array_join``.  Pure
    higher-order Column expressions: a PROJECTION — zero shuffle, zero
    UDF, zero state, trivially correct at any scale because every row is
    independent.  Per-row cost is O(segments^2) comparisons inside the
    JVM; segments-per-doc is bounded by document size, not corpus size.

    Output: ``id_col``, ``out_col`` (default: replaces ``text_col``),
    plus ``n_segments_before`` / ``n_segments_after`` when ``stats``
    (the attrition counters a curation report wants).
    """
    out_col = out_col or text_col
    # bind to df[...] (expression id), NOT F.col(name): when out_col ==
    # text_col, lateral column alias resolution would otherwise rebind
    # the stats expressions to the freshly-aliased OUTPUT column
    toks = F.split(df[text_col], _re.escape(delimiter), -1)
    kept = F.filter(
        toks, lambda x, i: F.array_position(toks, x) == i + F.lit(1)
    )
    cols = [F.col(id_col), F.array_join(kept, delimiter).alias(out_col)]
    if stats:
        cols += [
            F.size(toks).alias("n_segments_before"),
            F.size(kept).alias("n_segments_after"),
        ]
    return df.select(*cols)


# &amp; is decoded LAST: decoding it first would double-decode nested
# entities ("&amp;lt;" -- the author's escaped literal "&lt;" -- must
# not become "<")
_MARKUP_ENTITIES = {
    "&lt;": "<", "&gt;": ">", "&quot;": '"', "&#39;": "'",
    "&nbsp;": " ", "&amp;": "&",
}


def strip_markup(col: C) -> C:
    """Remove HTML/XML markup from crawled text: drop tags, decode the
    common entities, collapse whitespace.  Pure chained
    ``regexp_replace`` — JVM, codegen, SQL-replayable."""
    c = F.regexp_replace(col, r"<[^>]*>", " ")
    for ent, rep in _MARKUP_ENTITIES.items():
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def top_k_per_group(
    df: DataFrame,
    by: str,
    order_exprs,
    k: int,
) -> DataFrame:
    """Deterministic top-``k`` rows per group (e.g. the k
    highest-quality documents per source) via a ranked window.

    ``order_exprs`` must define a total order (add an id tie-break).
    One shuffle on the group key; each group sorts in its partition —
    for pathologically hot groups pre-filter with an approximate
    per-group threshold first."""
    w = Window.partitionBy(by).orderBy(*order_exprs)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def corpus_card(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    source_col: str = "source",
    psi_edges=(100.0, 150.0, 200.0, 250.0, 300.0, 400.0),
) -> DataFrame:
    """The dataset card: corpus-level health summary as one long-format
    frame ``(metric, value)`` — doc/source/language counts, mean quality
    and token stats, exact-duplicate rate, and the PSI of the text-length
    profile (computed from ``text_col``) between the two id-parity
    halves (self-drift sanity).

    Every count/mean folds into ONE aggregation over the corpus; the
    duplicate rate adds a hash-distinct inside the same agg; the PSI
    half-vs-half screen reuses :func:`~pandera_spark.operators.drift.
    psi` (one tag-union-agg of O(bins) rows).  Three column-pruned
    scans total (the base aggregation plus one per PSI half), whatever
    the corpus size.
    """
    from .drift import psi

    col = F.col(text_col)
    base = df.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.countDistinct(source_col).cast("double").alias("n_sources"),
        F.countDistinct(detect_language(col)).cast("double").alias(
            "n_langs_pred"
        ),
        F.round(F.avg(quality_score(col)), 6).alias("mean_quality"),
        F.round(F.avg(token_count(col)), 6).alias("mean_tokens"),
        (
            (F.count(F.lit(1)) - F.countDistinct(F.md5(col)))
            / F.count(F.lit(1))
        ).alias("exact_dup_rate"),
    )
    metrics = base.selectExpr(
        "stack(6, 'n_docs', n_docs, 'n_sources', n_sources, "
        "'n_langs_pred', n_langs_pred, 'mean_quality', mean_quality, "
        "'mean_tokens', mean_tokens, 'exact_dup_rate', exact_dup_rate) "
        "AS (metric, value)"
    )
    with_len = df.withColumn("__len", F.length(col).cast("long"))
    halves_psi = psi(
        with_len.filter(F.col(id_col) % 2 == 0),
        with_len.filter(F.col(id_col) % 2 == 1),
        "__len",
        list(psi_edges),
    ).select(
        F.lit("psi_halves_length").alias("metric"),
        F.round("psi", 6).alias("value"),
    )
    return metrics.unionByName(halves_psi)


def keyword_search(
    df: DataFrame,
    terms,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """TF-IDF keyword retrieval: score every document against a bag of
    query terms and return the top-``k`` (score desc, id asc).

    ``tf`` = per-document whole-word term counts (``regexp_count``,
    JVM); ``idf = ln((N+1)/(df_t+1)) + 1`` with document frequencies
    from ONE corpus aggregation; ``score = sum tf_t * idf_t``.  The idf
    frame is one row (broadcast); ranking is ``TakeOrderedAndProject``
    — per-task heaps, no global sort.  Two scans of the text column
    total, independent of the number of query terms.
    """
    terms = list(dict.fromkeys(terms))  # dedupe, keep order
    if not terms or any(not t for t in terms):
        raise ValueError("terms must be non-empty strings")
    col = F.col(text_col)

    def pattern(t):
        # anchor with \b only where the term edge is a word character —
        # \b after a non-word char (e.g. "c++") can never match there
        pre = r"\b" if _re.match(r"\w", t[0]) else ""
        post = r"\b" if _re.match(r"\w", t[-1]) else ""
        return pre + _re.escape(t) + post

    def tf(t):
        return F.regexp_count(col, F.lit(pattern(t)))

    dfreq = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            # presence test only: rlike stops at the first match instead
            # of tallying every occurrence like regexp_count would
            F.count(F.when(col.rlike(pattern(t)), 1)).alias(f"__df{i}")
            for i, t in enumerate(terms)
        ],
    )
    scored = df.crossJoin(F.broadcast(dfreq))
    score = None
    for i, t in enumerate(terms):
        idf = (
            F.log(
                (F.col("__n") + 1).cast("double")
                / (F.col(f"__df{i}") + 1)
            )
            + 1
        )
        part = tf(t).cast("double") * idf
        score = part if score is None else score + part
    return (
        scored.select(
            F.col(id_col), F.round(score, 6).alias("score")
        )
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    *,
    n_buckets: int = 1 << 20,
    bias: float = 0.0,
    out_col: str = "model_score",
) -> DataFrame:
    """Model-based quality scoring plumbing: a fasttext-style linear
    classifier over hashed bag-of-words features, evaluated entirely in
    Catalyst higher-order functions (zero UDF, zero shuffle).

    ``score = sigmoid(bias + mean_t w[bucket(t)])`` with
    ``bucket(t) = portable_hash28(t) % n_buckets``.  The per-bucket
    weights here are a DETERMINISTIC hash-derived stand-in
    (``(bucket * 2654435761 mod 1000003) / 1000003 - 0.5``) so the
    whole pipeline — tokenize, feature-hash, score, threshold — is
    reproducible and bit-replayable by an external SQL oracle; swap the
    weight expression for a lookup against trained weights (broadcast
    numpy array inside ``mapInPandas``) to productionize without
    touching the surrounding plan.  All arithmetic bounded < 2^52 —
    ANSI-safe.  Empty/null documents score null.
    """
    from .dedup import portable_hash28

    if n_buckets <= 0 or n_buckets > (1 << 28):
        raise ValueError(f"n_buckets must be in (0, 2^28], got {n_buckets}")
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0
    )

    def weight(t: C) -> C:
        b = F.pmod(portable_hash28(t), F.lit(n_buckets))
        return (
            F.pmod(b * F.lit(2654435761), F.lit(1000003)).cast("double")
            / F.lit(1000003.0)
        ) - F.lit(0.5)

    ws = F.transform(toks, weight)
    n = F.size(ws)
    mean = F.aggregate(ws, F.lit(0.0), lambda a, v: a + v) / n
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(float(bias)) + mean)))
    return df.withColumn(
        out_col,
        F.when(F.col(text_col).isNotNull() & (n > 0), score),
    )


def build_term_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_token_len: int = 2,
) -> DataFrame:
    """Inverted index: one posting row ``(term, id, tf)`` per distinct
    lowercase alphanumeric token per document.

    The scale path for repeated retrieval: :func:`keyword_search`
    rescans every document per query; an index built ONCE turns each
    query into a hash join on the term key (and is incrementally
    maintainable — index new batches and union).  One explode + one
    (term, id) groupBy whose shuffle carries tokens, never documents."""
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .filter(F.length("term") >= min_token_len)
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def bm25_search(
    index: DataFrame,
    n_docs: int,
    terms,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 retrieval from the inverted index: per query term,
    ``idf_t * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))`` with
    the standard non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``;
    top-``k`` by (score desc, id asc).

    The saturation/length-normalized upgrade of :func:`index_search`
    (raw TF-IDF over-rewards long repetitive documents — the exact kind
    a crawl corpus is full of).  Document lengths ``dl`` come from the
    index itself (sum of tf per id) so no corpus rescan: one filtered
    posting read + one broadcast df-counts join + one id-grain length
    join + TakeOrderedAndProject."""
    terms = list(dict.fromkeys(terms))
    if not terms or any(not t for t in terms):
        raise ValueError("terms must be non-empty strings")
    if k1 < 0 or not 0 <= b <= 1:
        raise ValueError(f"need k1 >= 0 and 0 <= b <= 1: {k1}, {b}")
    # document lengths from the index (token-occurrence totals per doc)
    dl = index.groupBy("id").agg(F.sum("tf").cast("double").alias("__dl"))
    avgdl = dl.agg(F.avg("__dl").alias("__avgdl"))
    hits = index.filter(F.col("term").isin(terms))
    dfreq = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    n = float(n_docs)
    idf = F.log(
        1.0 + (F.lit(n) - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf = F.col("tf").cast("double")
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("__dl") / F.col("__avgdl")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(avgdl))
        .groupBy("id")
        .agg(
            F.sum(
                idf * tf * F.lit(float(k1) + 1.0) / (tf + norm)
            ).alias("score")
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)


def term_stats(index: DataFrame, terms) -> DataFrame:
    """Posting-list statistics for chosen terms from an existing index:
    ``(term, n_docs, total_tf)``.  A filter + tiny groupBy on the index
    — the corpus text is never touched."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    return (
        index.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
    )


def index_search(
    index: DataFrame,
    n_docs: int,
    terms,
    *,
    k: int = 10,
) -> DataFrame:
    """TF-IDF retrieval from the inverted index: ``score = sum tf_t *
    (ln((N+1)/(df_t+1)) + 1)`` over the query terms, top-``k`` by
    (score desc, id asc).

    Touches only the query terms' posting lists (filter pushes to the
    index scan); document frequencies come from the same filtered
    postings, broadcast back; ranking is TakeOrderedAndProject."""
    terms = list(dict.fromkeys(terms))
    if not terms or any(not t for t in terms):
        raise ValueError("terms must be non-empty strings")
    hits = index.filter(F.col("term").isin(terms))
    dfreq = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    idf = F.log((F.lit(float(n_docs)) + 1) / (F.col("__df") + 1)) + 1
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .groupBy("id")
        .agg(F.sum(F.col("tf") * idf).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
    )


def two_stage_search(
    df: DataFrame,
    index: DataFrame,
    n_docs: int,
    terms,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: int = 50,
) -> DataFrame:
    """Two-stage retrieval: CHEAP first stage from the inverted index
    (:func:`index_search` top-``k1`` — no corpus scan), then an exact
    whole-word rescoring pass over the CANDIDATE documents only.  Both
    stages share the index's lowercase term normalization (stage 2
    matches against ``lower(text_col)`` with lowercased patterns), so a
    candidate retrieved via a case-folded posting can never rescore to
    a spurious zero.

    This is the scale pattern for any expensive reranker (exact
    matching here; swap the stage-2 expression for a cross-encoder
    `mapInPandas` without touching the plan shape): the heavy scorer
    reads ``k1`` documents, never the corpus.  The candidate id set and
    the per-term document frequencies are tiny broadcasts.

    Returns the final top-``k``: ``(id, score)`` by (score desc, id).
    """
    terms = list(dict.fromkeys(terms))
    if not terms or any(not t for t in terms):
        raise ValueError("terms must be non-empty strings")
    cand = index_search(index, n_docs, terms, k=k1).select("id")
    dfreq = (
        index.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("__df"))
    )
    dfreq_wide = dfreq.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("__df"))),
                F.lit(0.0),
            ).alias(f"__df{i}")
            for i, t in enumerate(terms)
        ]
    )
    sub = df.join(
        F.broadcast(cand.select(F.col("id").alias(id_col))), id_col
    ).crossJoin(F.broadcast(dfreq_wide))

    def pattern(t):
        pre = r"\b" if _re.match(r"\w", t[0]) else ""
        post = r"\b" if _re.match(r"\w", t[-1]) else ""
        # stage-1 postings are lowercase tokens: lowercase the pattern and
        # match against lower(text) so both stages share one normalization
        return pre + _re.escape(t.lower()) + post

    lowered = F.lower(F.col(text_col))
    score = None
    for i, t in enumerate(terms):
        idf = (
            F.log(
                (F.lit(float(n_docs)) + 1) / (F.col(f"__df{i}") + 1)
            )
            + 1
        )
        term_score = (
            F.regexp_count(lowered, F.lit(pattern(t))).cast("double")
            * idf
        )
        score = term_score if score is None else score + term_score
    scored = sub.select(
        F.col(id_col).alias("id"), score.alias("score")
    )
    return scored.orderBy(
        F.col("score").desc(), F.col("id").asc()
    ).limit(k)


def gopher_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_punct_ratio: float = 0.2,
    min_stop_hits: int = 2,
    max_dup_word_frac: float = 0.3,
    max_dup_gram_frac: float = 0.2,
    ngram_n: int = 2,
) -> DataFrame:
    """Composite Gopher-style document gate (Rae et al. 2021 §A1.1
    style): every rule evaluated per document in one pass, returning
    ``(id, keep, failed_rules)`` with the rule names a document fails —
    the corpus analogue of :func:`..backend.runner.annotate_errors`
    ("WHY was this document dropped?", not just a keep bit).

    Rules: word count bounds, mean word length bounds, punctuation
    ratio, minimum stopword hits, duplicate-word fraction, duplicate
    ``ngram_n``-gram fraction.  Everything except the n-gram fractions
    is a pure projection; those come from :func:`repetition_stats`
    (one id-keyed aggregation joined back).  Thresholds compare against
    the ROUNDED (6dp) repetition fractions so verdicts are replayable
    bit-exactly by an external SQL oracle."""
    from .dedup import _ensure_parallelism

    # parallelism floor before the per-document token/regex work (both
    # the projection side and repetition_stats' gram explode inherit
    # it); no-op at real scale, verdicts are partitioning-independent
    df = _ensure_parallelism(df)
    col = F.col(text_col)
    rep = repetition_stats(df, id_col, text_col, ngram_n=ngram_n)
    nc = F.length(col).cast("double")
    nt = F.col("n_words").cast("double")
    np_ = F.regexp_count(col, F.lit(r"[^\w\s]")).cast("double")
    ns = F.regexp_count(
        col, F.lit(r"(?i)\b(the|and|of|to|in|is|that|for|a|with)\b")
    ).cast("double")
    joined = df.select(id_col, text_col).join(rep, id_col)
    rules = [
        (
            "word_count",
            (F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words),
        ),
        (
            # try_divide: ANSI mode raises DIVIDE_BY_ZERO on nt=0 even
            # under a conjunction (no short-circuit in codegen); null
            # comparisons collapse to false via the nt>0 conjunct
            "mean_word_len",
            (nt > 0)
            & (F.try_divide(nc, nt) >= min_mean_word_len)
            & (F.try_divide(nc, nt) <= max_mean_word_len),
        ),
        ("punct_ratio",
         F.when(nc > 0, np_ / nc).otherwise(1.0) <= max_punct_ratio),
        ("stopword_hits", ns >= min_stop_hits),
        ("dup_words", F.col("dup_word_frac") <= max_dup_word_frac),
        ("dup_ngrams", F.col("dup_gram_frac") <= max_dup_gram_frac),
    ]
    failed = F.concat_ws(
        ",", *[F.when(~cond, F.lit(name)) for name, cond in rules]
    )
    return joined.select(
        F.col(id_col),
        (failed == "").alias("keep"),
        failed.alias("failed_rules"),
    )


def unigram_model(
    ref: DataFrame,
    text_col: str = "text",
    *,
    min_token_len: int = 1,
) -> DataFrame:
    """Fit a unigram language model on a reference corpus: one row per
    token ``(term, n)`` (lowercase alphanumeric tokens).  The model
    table is bounded by vocabulary size — persist it once and broadcast
    into every scoring run."""
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    )
    return (
        ref.select(F.explode(toks).alias("term"))
        .filter(F.length("term") >= min_token_len)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def lm_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_token_len: int = 1,
) -> DataFrame:
    """CCNet-style LM quality scoring: per document the mean log
    probability of its tokens under an add-one-smoothed unigram model
    fit on a reference corpus — documents far from the reference
    distribution (boilerplate, wrong language, noise) score low, the
    classic perplexity filter re-expressed without an external LM.

    ``log P(w) = ln((c(w) + 1) / (N + V))`` with ``N`` total reference
    tokens and ``V`` the smoothing vocabulary (reference vocab + 1 for
    unseen).  Plan: corpus explodes to (id, term), hash-joins the
    BROADCAST model (vocab-bounded), one id-grain aggregation.  Returns
    ``(id, n_tokens, avg_logprob)``; empty docs get null."""
    totals = model.agg(
        F.sum("n").cast("double").alias("__N"),
        (F.count(F.lit(1)) + 1).cast("double").alias("__V"),
    )
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    )
    exploded = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.length("term") >= min_token_len)
    )
    scored = (
        exploded.join(F.broadcast(model), "term", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)).cast("double") + 1.0)
                / (F.col("__N") + F.col("__V"))
            ).alias("__lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (F.sum("__lp") / F.count(F.lit(1))).alias("avg_logprob"),
    )
    return df.select(id_col).join(agg, id_col, "left")


def bigram_model(
    ref: DataFrame,
    text_col: str = "text",
    *,
    min_token_len: int = 1,
) -> DataFrame:
    """Fit a bigram language model on a reference corpus: one row per
    adjacent token pair ``(w1, w2, n)`` (lowercase alphanumeric
    tokens, within-document adjacency only).  The model table is
    bounded by the observed bigram vocabulary — persist once, broadcast
    into scoring runs; the conditional denominator (count of ``w1`` as
    a bigram head) is derived inside :func:`bigram_score`, so this
    frame is the whole model."""
    toks = F.expr(
        f"filter(regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0),"
        f" t -> length(t) >= {int(min_token_len)})"
    )
    pairs = F.expr(
        "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)),"
        " (t, i) -> struct(t AS w1, element_at(__toks, i + 2) AS w2))"
    )
    return (
        ref.select(toks.alias("__toks"))
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def bigram_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_token_len: int = 1,
) -> DataFrame:
    """Bigram-LM affinity scoring — the conditional upgrade of the
    unigram :func:`lm_score` (CCNet uses an n-gram LM for exactly this
    reason: "the the" and "of dog" have identical unigram mass but very
    different English likelihoods).  Per document, the mean
    ``ln P(w_i | w_{i-1})`` over its adjacent pairs with add-one
    smoothing: ``P = (c(w1,w2) + 1) / (c(w1,·) + V)`` where ``c(w1,·)``
    is ``w1``'s total as a bigram head in the reference and ``V`` the
    smoothing vocabulary (distinct reference heads + 1).

    Plan: corpus explodes to (id, w1, w2) adjacent pairs; the bigram
    model AND its head-marginal (both vocab-bounded) broadcast; one
    id-grain aggregation.  Returns ``(id, n_bigrams, avg_logprob)``;
    docs with <2 tokens get null score."""
    heads = model.groupBy("w1").agg(
        F.sum("n").cast("double").alias("__h")
    )
    totals = heads.agg(
        (F.count(F.lit(1)) + 1).cast("double").alias("__V")
    )
    toks = F.expr(
        f"filter(regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0),"
        f" t -> length(t) >= {int(min_token_len)})"
    )
    pairs = F.expr(
        "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)),"
        " (t, i) -> struct(t AS w1, element_at(__toks, i + 2) AS w2))"
    )
    exploded = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(F.col(id_col), F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"))
    )
    scored = (
        exploded.join(F.broadcast(model), ["w1", "w2"], "left")
        .join(F.broadcast(heads), "w1", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)).cast("double") + 1.0)
                / (F.coalesce(F.col("__h"), F.lit(0.0)) + F.col("__V"))
            ).alias("__lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        (F.sum("__lp") / F.count(F.lit(1))).alias("avg_logprob"),
    )
    return df.select(id_col).join(agg, id_col, "left")


def nb_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    *,
    num_buckets: int = 1 << 16,
    smoothing: float = 1.0,
) -> DataFrame:
    """Train a hashed multinomial Naive Bayes text classifier as ONE
    aggregation chain — the deterministic, engine-replayable analogue
    of the fastText-style classifiers LLM pipelines use for quality /
    language / domain filtering (trained here on any labeled column,
    e.g. a curated-vs-crawl flag or ``lang``).

    Tokens hash into ``num_buckets`` buckets via the portable md5 hash
    (the hashing trick bounds the model at ``labels × buckets`` rows
    regardless of vocabulary).  Returns one model DataFrame:

    - ``(label, bucket >= 0, loglik)`` — add-``smoothing`` token
      log-likelihood ``ln((c + a) / (total_label + a*B))``;
    - ``(label, bucket = -1, loglik)`` — class prior ``ln(n_l / n)``;
    - ``(label, bucket = -2, loglik)`` — the unseen-token default
      ``ln(a / (total_label + a*B))`` (the c=0 case, factored out so
      scoring's left join has a per-label fallback).

    No driver state, no UDF, no iteration: NB's closed form is why it
    fits the one-pass groupBy shape (reference has no classifier
    surface; published basis: McCallum & Nigam 1998 multinomial NB,
    Weinberger et al. 2009 feature hashing)."""
    from .dedup import portable_hash28

    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2: {num_buckets}")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0: {smoothing}")
    a, B = float(smoothing), num_buckets
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    )
    lab = F.col(label_col).cast("string").alias("label")
    exploded = df.select(lab, F.explode(toks).alias("tok"))
    counts = (
        exploded.withColumn(
            "bucket", F.pmod(portable_hash28(F.col("tok")), F.lit(B))
        )
        .groupBy("label", "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    # totals over ALL labels, not just token-bearing ones: a class whose
    # training docs have zero tokens still needs its tot=0 default row,
    # else scoring falls back to prior-only for that class and it can
    # win spuriously (found by the differential fuzz)
    totals = (
        df.select(lab)
        .distinct()
        .join(
            counts.groupBy("label").agg(F.sum("c").alias("tot")),
            "label",
            "left",
        )
        .withColumn("tot", F.coalesce(F.col("tot"), F.lit(0.0)))
    )
    tok_ll = counts.join(totals, "label").select(
        "label",
        F.col("bucket").cast("long").alias("bucket"),
        F.log((F.col("c") + a) / (F.col("tot") + a * B)).alias("loglik"),
    )
    # corpus size as an in-plan broadcast 1-row aggregate — one driver
    # action fewer, and the training scan is not executed a second time
    # just for the denominator
    ndf = df.agg(F.count(F.lit(1)).cast("double").alias("__nd"))
    priors = (
        df.groupBy(lab)
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .crossJoin(F.broadcast(ndf))
        .select(
            "label",
            F.lit(-1).cast("long").alias("bucket"),
            F.log(F.col("n") / F.col("__nd")).alias("loglik"),
        )
    )
    defaults = totals.select(
        "label",
        F.lit(-2).cast("long").alias("bucket"),
        F.log(F.lit(a) / (F.col("tot") + a * B)).alias("loglik"),
    )
    return tok_ll.unionByName(priors).unionByName(defaults)


def nb_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_buckets: int = 1 << 16,
) -> DataFrame:
    """Score documents under a :func:`nb_train` model: per document and
    label, ``prior + sum(token loglik)`` with the per-label default for
    unseen buckets, then argmax.  ``num_buckets`` must match training.

    Plan shape: corpus explodes to (id, bucket), crosses the tiny label
    list (|labels| rows, broadcast), LEFT-joins the broadcast model with
    the default as fallback, and one id-grain aggregation picks the
    winner via ``max(struct(score, label))`` — a total order, so ties
    resolve identically on any engine.  The model is labels×buckets
    bounded; documents never shuffle, only (id, bucket) pairs do.

    Returns ``(id, predicted, score)`` (score = the winning label's
    joint log-likelihood; empty docs score on priors alone)."""
    from .dedup import portable_hash28

    priors = model.filter(F.col("bucket") == -1).select(
        "label", F.col("loglik").alias("__prior")
    )
    defaults = model.filter(F.col("bucket") == -2).select(
        "label", F.col("loglik").alias("__default")
    )
    tok_model = model.filter(F.col("bucket") >= 0)
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    )
    exploded = df.select(
        F.col(id_col), F.explode(toks).alias("tok")
    ).withColumn(
        "bucket", F.pmod(portable_hash28(F.col("tok")), F.lit(num_buckets))
    ).drop("tok")
    per_label = (
        exploded.crossJoin(F.broadcast(defaults))
        .join(F.broadcast(tok_model), ["label", "bucket"], "left")
        .groupBy(id_col, "label")
        .agg(
            F.sum(
                F.coalesce(F.col("loglik"), F.col("__default"))
            ).alias("__toksum")
        )
    )
    # empty docs have no token rows: rebuild the full (id, label) grid
    # from the corpus x priors so they score on priors alone
    grid = df.select(id_col).crossJoin(F.broadcast(priors))
    scored = grid.join(per_label, [id_col, "label"], "left").select(
        id_col,
        "label",
        (
            F.col("__prior") + F.coalesce(F.col("__toksum"), F.lit(0.0))
        ).alias("__score"),
    )
    top = F.max(F.struct(F.col("__score"), F.col("label")))
    return scored.groupBy(id_col).agg(
        top.getField("label").alias("predicted"),
        top.getField("__score").alias("score"),
    )


def hash_embed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dim: int = 64,
) -> DataFrame:
    """Signed feature-hashing embedding (the "hashing trick",
    Weinberger et al. 2009): every lowercase alphanumeric token adds
    ±1 to ``bucket = portable_hash28(token) % dim`` (sign from an
    independent md5 digit), yielding an EXACT integer vector per
    document — model-free embeddings that feed the similarity/ANN
    operators (cosine over ``array<long>`` casts cleanly) while being
    bit-replayable by any engine with md5.

    Zero shuffle, zero UDF: the vector is a ``transform(sequence(dim))``
    of per-dimension HOF folds over the token array (O(dim × tokens)
    cheap codegen ops per row).  Returns ``(id, embedding array<long>)``;
    null text embeds to the zero vector."""
    from .dedup import _ensure_parallelism

    if not 1 <= dim <= 4096:
        raise ValueError(f"dim must be in [1, 4096], got {dim}")
    # parallelism floor before the fold: the O(tokens x dim) accumulate
    # below is the heaviest per-row compute in the embed chains, and a
    # small-file scan (or a chain inheriting its single partition)
    # would run it all in one task.  No-op at real scale; the output is
    # an exact integer vector, so partitioning cannot change results.
    df = _ensure_parallelism(df)
    # the whole vector expression is generated as ONE SQL string and
    # parsed JVM-side in a single call (the same one-round-trip build
    # as similarity.lsh_signature_sql; the lambda-by-lambda Column
    # construction cost the driver hundreds of py4j round trips per
    # build).  The parsed tree is operation-for-operation the previous
    # Column tree; all arithmetic is integer, so output is exactly
    # unchanged — pinned by a differential test.
    #
    # Shape (unchanged): hash each token ONCE into (bucket, signed ±1),
    # then ONE fold over the precomputed pairs builds the whole vector
    # — `aggregate` evaluates its input array (the md5 hashing) exactly
    # once, then each token costs dim interpreted adds; a separate
    # per-dimension fold would re-inline (and re-hash) the tokens per
    # dimension (CollapseProject), measured 2-16x slower.
    from pandera_spark.checks import _sql_ident

    vec = F.expr(_hash_embed_sql(_sql_ident(text_col), dim))
    return df.select(F.col(id_col), vec.alias("embedding"))


def _hash_embed_sql(text_sql: str, dim: int) -> str:
    """SQL text of the :func:`hash_embed` vector expression over a
    column reference — bucket = first-7-md5-hex-digits mod ``dim``,
    sign from md5 hex digit 9, folded into a ``dim``-long accumulator."""
    toks = (
        f"coalesce(regexp_extract_all(lower({text_sql}), '[a-z0-9]+', 0), "
        "CAST(array() AS array<string>))"
    )
    pre = (
        f"transform({toks}, t -> named_struct("
        f"'b', pmod(CAST(conv(substring(md5(t), 1, 7), 16, 10) AS BIGINT), "
        f"{dim}), "
        f"'s', pmod(CAST(conv(substring(md5(t), 9, 1), 16, 10) AS BIGINT), "
        f"2) * 2 - 1))"
    )
    return (
        f"aggregate({pre}, array_repeat(CAST(0 AS BIGINT), {dim}), "
        f"(acc, p) -> transform(acc, (x, i) -> "
        f"x + (CASE WHEN i = p.b THEN p.s ELSE CAST(0 AS BIGINT) END)))"
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: "str | None" = None,
    form: str = "NFC",
    strip_accents: bool = False,
    collapse_ws: bool = True,
    lowercase: bool = False,
) -> DataFrame:
    """Unicode-normalize a text column: canonical form (``NFC`` default,
    any of NFC/NFD/NFKC/NFKD), optional accent stripping (NFD +
    combining-mark removal), whitespace collapse, lowercasing.

    The web is full of visually-identical strings that differ in bytes
    (precomposed é vs e+combining-acute, ligatures, fullwidth forms) —
    every exact/MinHash dedup and every token count silently treats
    them as distinct until this pass runs.  Spark has no unicode
    normalizer builtin, so the normalization core is an Arrow-batched
    pandas UDF (vectorized transfer; stdlib ``unicodedata``, no model,
    no state — a pure map, so it pipelines with the scan and never
    shuffles).  Whitespace/lowercase stay JVM-side Column expressions.
    DuckDB's ``nfc_normalize``/``strip_accents`` replay NFC and
    accent-strip bit-identically (probed: both utf8proc/CPython follow
    the same Unicode tables), which is what the contract oracle uses.

    ``out_col=None`` normalizes in place.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC/NFD/NFKC/NFKD, got {form!r}")
    from pyspark.sql.functions import pandas_udf

    dest = out_col or text_col

    def _norm_fn(s):
        import unicodedata

        def one(x):
            if x is None:
                return None
            y = unicodedata.normalize(form, x)
            if strip_accents:
                y = "".join(
                    ch
                    for ch in unicodedata.normalize("NFD", y)
                    if not unicodedata.combining(ch)
                )
                # re-canonicalize after mark removal
                y = unicodedata.normalize(form, y)
            return y

        return s.map(one)

    # annotation-free + explicit returnType: `from __future__ import
    # annotations` stringifies hints, which pandas_udf can't infer
    _norm = pandas_udf(_norm_fn, "string")

    out = df.withColumn(dest, _norm(F.col(text_col)))
    col = F.col(dest)
    if lowercase:
        col = F.lower(col)
    if collapse_ws:
        # collapse BEFORE trim: Spark trim strips only U+0020, so a
        # trailing tab/newline must first become a plain space
        col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return out.withColumn(dest, col)


def readability(
    df: DataFrame,
    text_col: str = "text",
    *,
    prefix: str = "",
) -> DataFrame:
    """Flesch readability features per document: ``n_sentences``,
    ``n_words``, ``n_syllables`` (vowel-group approximation — the
    standard dictionary-free estimator), ``flesch_reading_ease`` and
    ``flesch_kincaid_grade``.

    The classic curriculum/quality features (too-hard and too-trivial
    text both correlate with low training value).  All pure Column
    expressions — regexp_count/try_divide, zero UDF, zero shuffle, so
    the pass pipelines with the scan at any scale.  Sentences are
    ``[.!?]+`` runs (min 1 when any word exists); syllables are
    ``[aeiouy]+`` groups in lowercased words.  Null text yields null
    features; wordless text yields 0 counts and null scores.
    """
    col = F.col(text_col)
    words = token_count(col).cast("double")
    sents = F.greatest(
        F.regexp_count(col, F.lit(r"[.!?]+")).cast("double"), F.lit(1.0)
    )
    sylls = F.greatest(
        F.regexp_count(F.lower(col), F.lit(r"[aeiouy]+")).cast("double"),
        words,  # every word has >= 1 syllable
    )
    wps = F.try_divide(words, sents)
    spw = F.try_divide(sylls, words)
    ease = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    grade = (
        F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    )
    has = col.isNotNull()
    nonzero = words > 0
    p = prefix
    return df.withColumns({
        f"{p}n_sentences": F.when(has & nonzero, sents).when(
            has, F.lit(0.0)
        ).cast("long"),
        f"{p}n_words": F.when(has, words).cast("long"),
        f"{p}n_syllables": F.when(has & nonzero, sylls).when(
            has, F.lit(0.0)
        ).cast("long"),
        f"{p}flesch_reading_ease": F.when(has & nonzero, ease),
        f"{p}flesch_kincaid_grade": F.when(has & nonzero, grade),
    })


def vocab_richness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document lexical-diversity features: ``n_tokens``,
    ``n_types`` (distinct words), ``ttr`` (type-token ratio) and
    ``hapax_frac`` (words occurring exactly once / types) — low
    diversity flags boilerplate and template spam; implausibly high
    flags word-salad.  Pure array expressions over the whitespace
    token array (distinct + a frequency fold), zero shuffle.
    """
    col = F.col(text_col)
    words = F.filter(
        F.split(F.trim(F.lower(col)), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    n_tok = F.size(words)
    types = F.array_distinct(words)
    n_typ = F.size(types)
    # hapax count in O(n log n) per doc: sort the tokens, then a token
    # is a singleton iff it differs from BOTH neighbours (the naive
    # per-type recount is O(types × tokens) — quadratic on long docs)
    srt = F.array_sort(words)
    n = F.size(srt)
    idx = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.expr("CAST(array() AS array<int>)")
    )
    flags = F.transform(
        idx,
        lambda i: (
            F.when(i == 1, F.lit(True)).otherwise(
                F.element_at(srt, i) != F.element_at(srt, i - 1)
            )
            & F.when(i == n, F.lit(True)).otherwise(
                F.element_at(srt, i) != F.element_at(srt, i + 1)
            )
        ).cast("int"),
    )
    hapax = F.aggregate(flags, F.lit(0), lambda a, x: a + x)
    has = col.isNotNull()
    return df.select(
        F.col(id_col),
        F.when(has, n_tok).cast("long").alias("n_tokens"),
        F.when(has, n_typ).cast("long").alias("n_types"),
        F.when(has & (n_tok > 0), n_typ / n_tok).alias("ttr"),
        F.when(has & (n_typ > 0), hapax / n_typ).alias("hapax_frac"),
    )


def corpus_vocab_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus-level vocabulary summary in one row: total tokens,
    distinct words (the Heaps-law 'V(N)' that sizes BPE word tables
    and hash-embed collision math), and the hapax count/fraction
    (singleton words — the long tail that dominates V).  One explode →
    word-grain groupBy (map-side collapsed) → one summary agg."""
    wc = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    return wc.agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum((F.col("n") == 1).cast("long")).alias("n_hapax"),
        F.round(
            F.sum((F.col("n") == 1).cast("long")) / F.count("*"), 6
        ).alias("hapax_frac_r"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    *,
    max_rank: "int | None" = None,
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus word table: least-squares
    slope/intercept of ``ln(freq) ~ ln(rank)`` — natural corpora sit
    near slope −1; generated/templated text and heavy boilerplate bend
    the curve (slope drifting toward 0 = suspiciously uniform; « −1 =
    a few tokens dominating).  One row: ``(n_types, slope_r,
    intercept_r, r2_r)``.

    Ranks come from a window over the DISTINCT-WORD grain (the
    vocabulary, Heaps-bounded — never corpus rows; the ks_drift
    pattern), ties broken by word for determinism; the regression is a
    closed-form co-moment aggregate.  ``max_rank`` fits only the head
    (the tail's hapax plateau biases the slope; 10_000 is a common
    cut).
    """
    wc = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    rk = F.row_number().over(
        Window.orderBy(F.desc("n"), F.asc("w"))
    )
    ranked = wc.select(
        F.log(rk.cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    if max_rank is not None:
        ranked = wc.select(
            rk.alias("r"), F.col("n")
        ).where(F.col("r") <= int(max_rank)).select(
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("n").cast("double")).alias("y"),
        )
    agg = ranked.agg(
        F.count("*").cast("long").alias("n_types"),
        F.covar_pop("x", "y").alias("cxy"),
        F.var_pop("x").alias("vx"),
        F.var_pop("y").alias("vy"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
    )
    slope = F.try_divide(F.col("cxy"), F.col("vx"))
    intercept = F.col("my") - slope * F.col("mx")
    r2 = F.try_divide(
        F.col("cxy") * F.col("cxy"), F.col("vx") * F.col("vy")
    )
    return agg.select(
        "n_types",
        F.round(slope, 6).alias("slope_r"),
        F.round(intercept, 6).alias("intercept_r"),
        F.round(r2, 6).alias("r2_r"),
    )


def context_fit(
    df: DataFrame,
    text_col: str = "text",
    *,
    budgets: "Sequence[int]" = (128, 512, 2048, 8192),
    token_counter: "Optional[Callable[[C], C]]" = None,
) -> DataFrame:
    """Context-window fit report: for each token budget, how much of the
    corpus fits, and what truncation to that budget would cost.

    Output, one row per budget: ``budget, n_docs, n_fit, fit_frac,
    tokens_total, tokens_lost, loss_frac`` — ``tokens_lost`` is
    ``sum(max(0, tokens - budget))``, the tokens a hard truncation at
    that budget would discard.  The capacity-planning companion to
    :func:`packing.pack_sequences` (which budget keeps 99% of docs
    whole? how much does an 8k->2k cut really cost?).

    ONE aggregation: every budget's counters are expressions over the
    same per-document token count, so the plan is a single column-
    pruned scan + hash aggregate regardless of how many budgets are
    probed.  ``token_counter`` swaps the tokenizer (default whitespace
    :func:`token_count`; pass :func:`bpe_ish_token_count` or a
    model-specific estimate).
    """
    blist = [int(b) for b in budgets]
    if not blist or any(b <= 0 for b in blist):
        raise ValueError(f"budgets must be positive: {budgets!r}")
    counter = token_counter or token_count
    t = counter(F.col(text_col)).cast("long")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(t).cast("long").alias("tokens_total"),
    ]
    for b in blist:
        aggs.append(
            F.sum((t <= b).cast("long")).cast("long").alias(f"__fit_{b}")
        )
        aggs.append(
            F.sum(F.greatest(t - b, F.lit(0)))
            .cast("long").alias(f"__lost_{b}")
        )
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(b).cast("long").alias("budget"),
            F.col("n_docs"),
            F.col(f"__fit_{b}").alias("n_fit"),
            (F.col(f"__fit_{b}") / F.col("n_docs").cast("double"))
            .alias("fit_frac"),
            F.col("tokens_total"),
            F.col(f"__lost_{b}").alias("tokens_lost"),
            (F.col(f"__lost_{b}") / F.col("tokens_total").cast("double"))
            .alias("loss_frac"),
        )
        for b in blist
    ]
    return wide.select(F.explode(F.array(*rows)).alias("__r")).select("__r.*")


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` word-pair collocations by pointwise mutual
    information — bigrams that co-occur far more than their unigram
    frequencies predict ("new york", "machine learning"), the
    standard phrase-mining signal raw counts miss (raw top bigrams
    are just stopword pairs).

    ``pmi = ln( (c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni)) )`` over the
    same literal single-space token split as :func:`word_ngrams`, so
    an external SQL engine replays it verbatim.  ``min_count`` floors
    the bigram count (PMI explodes for hapax pairs).

    Returns ``(gram, n_ab, n_a, n_b, pmi)`` ordered pmi desc, gram
    asc.  Scale shape: unigram and bigram counting are the two
    explode→partial-agg shuffles of :func:`ngram_counts` (bounded by
    vocab, not corpus); the min_count filter shrinks the bigram side
    BEFORE its two hash joins against the unigram frame; the two
    corpus totals are 1-row broadcast frames; the final top-k is a
    per-task heap (``TakeOrderedAndProject``), never a global sort.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    uni = ngram_counts(df, text_col, n=1).withColumnRenamed(
        "n_occurrences", "n_w"
    )
    bi = ngram_counts(df, text_col, n=2)
    n_uni = uni.agg(
        F.sum("n_w").cast("double").alias("__n_uni")
    )
    n_bi = bi.agg(
        F.sum("n_occurrences").cast("double").alias("__n_bi")
    )
    cand = (
        bi.where(F.col("n_occurrences") >= min_count)
        .select(
            "gram",
            F.col("n_occurrences").alias("n_ab"),
            F.split(F.col("gram"), " ")[0].alias("__w1"),
            F.split(F.col("gram"), " ")[1].alias("__w2"),
        )
    )
    joined = (
        cand.join(
            uni.select(
                F.col("gram").alias("__w1"), F.col("n_w").alias("n_a")
            ),
            on="__w1",
        )
        .join(
            uni.select(
                F.col("gram").alias("__w2"), F.col("n_w").alias("n_b")
            ),
            on="__w2",
        )
        .crossJoin(n_uni)
        .crossJoin(n_bi)
    )
    pmi = F.log(
        (F.col("n_ab") / F.col("__n_bi"))
        / (
            (F.col("n_a") / F.col("__n_uni"))
            * (F.col("n_b") / F.col("__n_uni"))
        )
    )
    return (
        joined.select("gram", "n_ab", "n_a", "n_b", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("gram").asc())
        .limit(k)
    )
