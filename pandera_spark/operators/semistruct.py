"""Semi-structured (JSON) column profiling and typed extraction.

Event streams land with a free-form JSON properties column; before a
pipeline can rely on ``props.k`` it needs to know which keys exist, how
often, and what type they carry.  Both operators are expression-only
(``from_json``/``get_json_object`` are JVM-side, codegen'd):

- :func:`json_key_profile` — per-top-level-key presence, type tally
  and numeric summary across the corpus.  The object melts through
  ``from_json(col, map<string,string>)`` + ``explode`` (a projection —
  keys are discovered dynamically, no schema needed), then ONE
  aggregation; the shuffle carries per-key partial aggregates, never
  documents.  Values classify on their string form (null / object /
  array / numeric via try-cast / string), rules any SQL engine
  replays.
- :func:`json_extract_typed` — pull declared paths into typed columns
  with ANSI-safe ``try_cast`` (a bad value becomes null, never a
  query-killing cast error at row 3 billion), plus an optional
  per-row error tally column.

Reference parity: extends the ``json_matches_schema`` check
(``pandera_spark/checks.py``) from validate-against-declared-schema to
discover-what-is-there; no pandera analogue (pandas normalizes JSON
before validation).
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["json_key_profile", "json_extract_typed"]


def json_key_profile(df: DataFrame, json_col: str) -> DataFrame:
    """Per-key profile of a JSON object column.

    Output, one row per distinct top-level key: ``key, n_present,
    n_null_value, n_object, n_array, n_numeric, n_string, n_distinct,
    num_min, num_avg, num_max``.  ``n_present`` counts rows whose
    object carries the key (null/malformed documents contribute
    nothing — ``from_json`` yields null and the explode drops it).
    Numeric stats cover values that try-cast to double (JSON numbers
    AND numeric strings — the string form cannot tell ``7`` from
    ``"7"``, which is exactly the dirty-data case this screen exists
    to surface).
    """
    pairs = df.select(
        F.explode(
            F.from_json(
                F.col(json_col),
                T.MapType(T.StringType(), T.StringType()),
            )
        ).alias("key", "v")
    )
    v = F.col("v")
    num = v.try_cast("double")
    is_obj = v.isNotNull() & v.startswith("{")
    is_arr = v.isNotNull() & v.startswith("[")
    is_num = num.isNotNull() & ~is_obj & ~is_arr
    return pairs.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(v.isNull().cast("long")).cast("long").alias("n_null_value"),
        F.sum(is_obj.cast("long")).cast("long").alias("n_object"),
        F.sum(is_arr.cast("long")).cast("long").alias("n_array"),
        F.sum(is_num.cast("long")).cast("long").alias("n_numeric"),
        F.sum(
            (v.isNotNull() & ~is_obj & ~is_arr & ~is_num).cast("long")
        ).cast("long").alias("n_string"),
        F.countDistinct(v).cast("long").alias("n_distinct"),
        F.min(F.when(is_num, num)).alias("num_min"),
        F.avg(F.when(is_num, num)).alias("num_avg"),
        F.max(F.when(is_num, num)).alias("num_max"),
    )


def json_extract_typed(
    df: DataFrame,
    json_col: str,
    fields: Mapping[str, Tuple[str, str]],
    *,
    error_count_col: Optional[str] = None,
) -> DataFrame:
    """Extract declared JSON paths into typed columns.

    ``fields`` maps output column name -> ``(json_path, spark_type)``,
    e.g. ``{"k": ("$.k", "long")}``.  Extraction is
    ``get_json_object`` + ``try_cast``: a present-but-miscast value
    becomes null instead of failing the job under ANSI mode.  With
    ``error_count_col``, a per-row count of such miscasts (path present
    but cast failed) is appended — route rows with a nonzero count to
    quarantine via the usual sinks.
    """
    if not fields:
        raise ValueError("declare at least one field")
    out_cols = []
    err_terms = []
    for name, (path, dtype) in fields.items():
        raw = F.get_json_object(F.col(json_col), path)
        typed = raw.try_cast(dtype)
        out_cols.append(typed.alias(name))
        err_terms.append(
            (raw.isNotNull() & typed.isNull()).cast("int")
        )
    out = df.select("*", *out_cols)
    if error_count_col is not None:
        total = err_terms[0]
        for t in err_terms[1:]:
            total = total + t
        out = out.withColumn(error_count_col, total)
    return out
