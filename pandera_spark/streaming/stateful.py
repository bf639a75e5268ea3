"""Stateful streaming operators: watermarked dedup and per-key violation
state via ``applyInPandasWithState``.

The reference has no streaming surface (SURVEY.md §2.L); these are the
beyond-reference operators a training-data ingest pipeline needs:

- :func:`streaming_dedup` — drop duplicate records across micro-batches
  with bounded state: a watermark ages the dedup keys out of the state
  store, so state size is O(keys within the watermark window), not
  O(all keys ever).  Uses Spark's native
  ``dropDuplicatesWithinWatermark`` when available (Spark >= 3.5),
  falling back to ``dropDuplicates`` (exact-once per key, unbounded
  state — flagged in the docstring, acceptable for bounded key spaces).
- :func:`stateful_violation_counts` — custom stateful operator: per key,
  a running count of rows and of validation-check violations, maintained
  in the state store via ``applyInPandasWithState`` (Arrow-batched; the
  per-group pandas frame never leaves the executor).  Emits one update
  row per key per micro-batch — the streaming analogue of the engine's
  single-pass violation aggregation.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    from ..container import DataFrameSchema


def streaming_dedup(
    stream_df: DataFrame,
    keys: list[str],
    *,
    watermark_col: Optional[str] = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Cross-batch exact dedup with bounded state.

    With ``watermark_col`` set, the event-time watermark bounds the state
    store: a key older than ``delay`` is evicted, so duplicates arriving
    later than the watermark are NOT suppressed (the standard trade-off).
    Without a watermark, state is unbounded — only safe for bounded key
    domains.
    """
    if watermark_col is not None:
        wm = stream_df.withWatermark(watermark_col, delay)
        if hasattr(wm, "dropDuplicatesWithinWatermark"):
            return wm.dropDuplicatesWithinWatermark(keys)
        return wm.dropDuplicates([*keys, watermark_col])
    return stream_df.dropDuplicates(keys)


def windowed_violation_counts(
    stream_df: DataFrame,
    schema: "DataFrameSchema",
    ts_col: str,
    *,
    window: str = "1 minute",
    slide: Optional[str] = None,
    delay: str = "5 minutes",
) -> DataFrame:
    """Event-time windowed violation counts with a watermark for late data.

    Pure built-ins: ``withWatermark`` bounds state, ``groupBy(window(ts))``
    aggregates the schema's row-resolvable violation flag (compiled once,
    evaluated JVM-side).  Late rows within ``delay`` still update their
    window; older windows are finalized and evicted.  Works on batch
    frames too (the watermark is a no-op there).

    Output: (window_start, window_end, rows, violations).
    """
    from ..backend.runner import row_pass_condition

    transformed, pass_cond = row_pass_condition(schema, stream_df)
    tagged = transformed.select(
        F.col(ts_col).alias("__ts"), (~pass_cond).cast("long").alias("__viol")
    )
    if tagged.isStreaming:
        tagged = tagged.withWatermark("__ts", delay)
    win = F.window("__ts", window, slide) if slide else F.window(
        "__ts", window
    )
    return (
        tagged.groupBy(win.alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("__viol").alias("violations"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "rows",
            "violations",
        )
    )


def stateful_violation_counts(
    stream_df: DataFrame,
    schema: "DataFrameSchema",
    key_col: str,
    *,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Running per-key (rows_seen, violations) across micro-batches.

    Custom stateful operator via ``applyInPandasWithState``: state is two
    longs per key; each micro-batch group arrives as a pandas frame with a
    precomputed ``__viol`` long column (the schema's row-resolvable
    violation predicate, compiled ONCE to a Spark expression and evaluated
    JVM-side before Arrow transfer — Python only sums it).

    Output stream (update mode): (key, rows_seen, violations).
    """
    from pyspark.sql.streaming.state import GroupState

    from ..backend.runner import row_pass_condition

    transformed, pass_cond = row_pass_condition(schema, stream_df)
    tagged = transformed.withColumn(
        "__viol", (~pass_cond).cast("long")
    ).select(F.col(key_col).alias("__key"), "__viol")

    out_type = T.StructType(
        [
            T.StructField("key", tagged.schema["__key"].dataType),
            T.StructField("rows_seen", T.LongType()),
            T.StructField("violations", T.LongType()),
        ]
    )
    state_type = T.StructType(
        [
            T.StructField("rows_seen", T.LongType()),
            T.StructField("violations", T.LongType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        rows = viol = 0
        for pdf in pdfs:
            rows += len(pdf)
            viol += int(pdf["__viol"].sum())
        if state.exists:
            prev_rows, prev_viol = state.get
        else:
            prev_rows = prev_viol = 0
        state.update((prev_rows + rows, prev_viol + viol))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "rows_seen": [prev_rows + rows],
                "violations": [prev_viol + viol],
            }
        )

    return tagged.groupBy("__key").applyInPandasWithState(
        update,
        outputStructType=out_type,
        stateStructType=state_type,
        outputMode="update",
        timeoutConf=timeout,
    )


def streaming_category_drift(
    stream_df: DataFrame,
    baseline_counts: DataFrame,
    cat_col: str,
    *,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-window categorical drift of a stream against a static
    baseline: chi-square homogeneity + Jensen-Shannon divergence,
    emitted once per (window) as late data settles.

    ``baseline_counts`` is a small static batch frame ``(cat_col,
    n_base)`` — the reference mix (e.g. last week's distribution).  It
    is collected ONCE at operator construction (tiny by definition) so
    the window statistic can cover the full category union: categories
    present in the stream but absent from the baseline (the strongest
    drift signal — novel traffic) enter with a zero baseline count, and
    baseline categories missing from a window enter with zero observed.

    The stream is windowed-aggregated per (window, category) — state is
    one count per live (window, category), bounded by the watermark —
    then reduced to one row per window with the shared
    :func:`~pandera_spark.operators.drift.chi2_js_terms` math applied
    over the completed category cells (higher-order functions, no UDF).
    Append mode: a window emits exactly once, when the watermark passes
    its end.
    """
    from ..operators.drift import chi2_js_terms

    base_rows = [
        (str(r[0]), float(r[1]))
        for r in baseline_counts.select(cat_col, "n_base").collect()
    ]
    if not base_rows:
        raise ValueError("baseline_counts must be non-empty")
    tb_total = sum(n for _, n in base_rows)
    base_map = F.map_from_arrays(
        F.array(*[F.lit(c) for c, _ in base_rows]),
        F.array(*[F.lit(n) for _, n in base_rows]),
    )
    base_cells = F.array(
        *[
            F.struct(F.lit(c).alias("cat"), F.lit(n).alias("b"))
            for c, n in base_rows
        ]
    )

    win = F.window(F.col(ts_col), window)
    counts = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("__w"), F.col(cat_col).cast("string").alias("cat"))
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    per_win = counts.groupBy("__w").agg(
        F.collect_list(
            F.struct(F.col("cat"), F.col("n_obs").cast("double").alias("o"))
        ).alias("obs"),
        F.sum("n_obs").cast("double").alias("tot_obs"),
    )
    obs = F.col("obs")
    obs_cells = F.transform(
        obs,
        lambda s: F.struct(
            s["o"].alias("o"),
            F.coalesce(base_map[s["cat"]], F.lit(0.0)).alias("b"),
        ),
    )
    obs_cats = F.transform(obs, lambda s: s["cat"])
    miss_cells = F.transform(
        F.filter(base_cells, lambda p: ~F.array_contains(obs_cats, p["cat"])),
        lambda p: F.struct(F.lit(0.0).alias("o"), p["b"].alias("b")),
    )
    cells = F.concat(obs_cells, miss_cells)
    to, tb = F.col("tot_obs"), F.lit(float(tb_total))

    def chi2_term(s):
        return chi2_js_terms(s["o"], s["b"], to, tb)[0]

    def js_term(s):
        return chi2_js_terms(s["o"], s["b"], to, tb)[1]

    return per_win.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        to.cast("long").alias("n_obs"),
        F.size(cells).alias("n_categories"),
        F.aggregate(
            F.transform(cells, chi2_term), F.lit(0.0), lambda a, v: a + v
        ).alias("chi2_stat"),
        F.aggregate(
            F.transform(cells, js_term), F.lit(0.0), lambda a, v: a + v
        ).alias("js_divergence"),
    )


def streaming_quality_gate(
    stream_df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_punct_ratio: float = 0.2,
    min_stop_hits: int = 0,
    out_col: str = "failed_rules",
) -> DataFrame:
    """Quality gating at INGEST time: the projection-only subset of
    :func:`~pandera_spark.operators.text.gopher_gate` (word count, mean
    word length, punctuation ratio, stopword hits) evaluated on a
    structured stream — stateless, so it runs in ANY output mode with
    no watermark and adds zero state-store pressure.  The
    aggregation-shaped duplicate-fraction rules need per-document
    n-gram counts and stay in the batch gate.

    Adds ``keep`` + the failed-rule list per row (same tag vocabulary
    as the batch gate, so downstream routing is shared).  Works on
    batch frames too."""
    col = F.col(text_col)
    trimmed = F.trim(col)
    nt = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("double")
    nc = F.length(col).cast("double")
    np_ = F.regexp_count(col, F.lit(r"[^\w\s]")).cast("double")
    ns = F.regexp_count(
        col, F.lit(r"(?i)\b(the|and|of|to|in|is|that|for|a|with)\b")
    ).cast("double")
    rules = [
        ("word_count", (nt >= min_words) & (nt <= max_words)),
        (
            "mean_word_len",
            (nt > 0)
            & (F.try_divide(nc, nt) >= min_mean_word_len)
            & (F.try_divide(nc, nt) <= max_mean_word_len),
        ),
        ("punct_ratio",
         F.when(nc > 0, np_ / nc).otherwise(1.0) <= max_punct_ratio),
        ("stopword_hits", ns >= min_stop_hits),
    ]
    failed = F.concat_ws(
        ",", *[F.when(~cond, F.lit(name)) for name, cond in rules]
    )
    return stream_df.withColumn(out_col, failed).withColumn(
        "keep", F.col(out_col) == ""
    )
