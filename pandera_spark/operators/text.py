"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All hot-path expressions are Spark built-ins (regexp/length/split — JVM,
whole-stage codegen); nothing here drops to Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
