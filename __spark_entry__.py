"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Every query here exercises a component of the pandera_spark engine
(SURVEY.md §2 inventory); the oracle SQL computes the same violation
counts / profiles in ANSI SQL.  Check specs are declared ONCE as
(column, label, spark-check factory, sql-violation-condition) so the
Spark query and the DuckDB oracle can never drift.
"""

from __future__ import annotations

import datetime
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandera_spark import Check, Column, DataFrameSchema


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pandera_spark.sources import read_parquet

    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# shared check specs: (column, label, spark check, SQL violation condition)
# null semantics (ignore_na=True): violation iff col IS NOT NULL AND NOT pred
# ---------------------------------------------------------------------------

_TS98 = datetime.datetime(1998, 12, 31)
_TS95 = datetime.datetime(1995, 1, 1)

LINEITEM_CHECKS: list[tuple[str, str, Check, str]] = [
    ("l_linenumber", "linenumber_in_1_7",
     Check.in_range(1, 7, error="linenumber_in_1_7"),
     "l_linenumber IS NOT NULL AND NOT (l_linenumber BETWEEN 1 AND 7)"),
    ("l_quantity", "quantity_in_1_50",
     Check.in_range(1.0, 50.0, error="quantity_in_1_50"),
     "l_quantity IS NOT NULL AND NOT (l_quantity BETWEEN 1.0 AND 50.0)"),
    ("l_extendedprice", "extendedprice_gt_0",
     Check.gt(0.0, error="extendedprice_gt_0"),
     "l_extendedprice IS NOT NULL AND NOT (l_extendedprice > 0.0)"),
    ("l_discount", "discount_in_0_008",
     Check.in_range(0.0, 0.08, error="discount_in_0_008"),
     "l_discount IS NOT NULL AND NOT (l_discount BETWEEN 0.0 AND 0.08)"),
    ("l_tax", "tax_ge_0",
     Check.ge(0.0, error="tax_ge_0"),
     "l_tax IS NOT NULL AND NOT (l_tax >= 0.0)"),
    ("l_returnflag", "returnflag_isin_ANR",
     Check.isin(["A", "N", "R"], error="returnflag_isin_ANR"),
     "l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R')"),
    ("l_linestatus", "linestatus_isin_OF",
     Check.isin(["O", "F"], error="linestatus_isin_OF"),
     "l_linestatus IS NOT NULL AND l_linestatus NOT IN ('O','F')"),
    ("l_returnflag", "returnflag_len_1",
     Check.str_length(1, error="returnflag_len_1"),
     "l_returnflag IS NOT NULL AND NOT (LENGTH(l_returnflag) = 1)"),
    ("l_returnflag", "returnflag_matches_upper",
     Check.str_matches("[A-Z]$", error="returnflag_matches_upper"),
     "l_returnflag IS NOT NULL AND NOT regexp_matches(l_returnflag, '^[A-Z]$')"),
    ("l_shipdate", "shipdate_in_1995_1998",
     Check.in_range(_TS95, _TS98, error="shipdate_in_1995_1998"),
     "l_shipdate IS NOT NULL AND NOT (l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1998-12-31 00:00:00')"),
    ("l_orderkey", "orderkey_gt_0",
     Check.gt(0, error="orderkey_gt_0"),
     "l_orderkey IS NOT NULL AND NOT (l_orderkey > 0)"),
    ("l_partkey", "partkey_ge_1",
     Check.ge(1, error="partkey_ge_1"),
     "l_partkey IS NOT NULL AND NOT (l_partkey >= 1)"),
    ("l_suppkey", "suppkey_ge_1",
     Check.ge(1, error="suppkey_ge_1"),
     "l_suppkey IS NOT NULL AND NOT (l_suppkey >= 1)"),
    ("l_quantity", "quantity_ne_0",
     Check.ne(0.0, error="quantity_ne_0"),
     "l_quantity IS NOT NULL AND NOT (l_quantity <> 0.0)"),
    ("l_linestatus", "linestatus_len_1",
     Check.str_length(min_value=1, max_value=1, error="linestatus_len_1"),
     "l_linestatus IS NOT NULL AND NOT (LENGTH(l_linestatus) BETWEEN 1 AND 1)"),
]

#: columns declared non-nullable in the lineitem schema
LINEITEM_NOT_NULL = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate",
]

ORDERS_CHECKS: list[tuple[str, str, Check, str]] = [
    ("o_orderkey", "orderkey_gt_0",
     Check.gt(0, error="orderkey_gt_0"),
     "o_orderkey IS NOT NULL AND NOT (o_orderkey > 0)"),
    ("o_custkey", "custkey_ge_1",
     Check.ge(1, error="custkey_ge_1"),
     "o_custkey IS NOT NULL AND NOT (o_custkey >= 1)"),
    ("o_orderstatus", "orderstatus_isin_OFP",
     Check.isin(["O", "F", "P"], error="orderstatus_isin_OFP"),
     "o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P')"),
    ("o_totalprice", "totalprice_gt_0",
     Check.gt(0.0, error="totalprice_gt_0"),
     "o_totalprice IS NOT NULL AND NOT (o_totalprice > 0.0)"),
    ("o_totalprice", "totalprice_le_600k",
     Check.le(600000.0, error="totalprice_le_600k"),
     "o_totalprice IS NOT NULL AND NOT (o_totalprice <= 600000.0)"),
    ("o_orderpriority", "priority_matches_1_5",
     Check.str_matches("[1-5]-", error="priority_matches_1_5"),
     "o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-5]-')"),
    ("o_orderpriority", "priority_len_5_15",
     Check.str_length(5, 15, error="priority_len_5_15"),
     "o_orderpriority IS NOT NULL AND NOT (LENGTH(o_orderpriority) BETWEEN 5 AND 15)"),
    ("o_orderstatus", "orderstatus_notin_XZ",
     Check.notin(["X", "Z"], error="orderstatus_notin_XZ"),
     "o_orderstatus IS NOT NULL AND o_orderstatus IN ('X','Z')"),
]

ORDERS_NOT_NULL = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]

EVENTS_CHECKS: list[tuple[str, str, Check, str]] = [
    ("value", "value_gt_0",
     Check.gt(0.0, error="value_gt_0"),
     "value IS NOT NULL AND NOT (value > 0.0)"),
    ("value", "value_le_100",
     Check.le(100.0, error="value_le_100"),
     "value IS NOT NULL AND NOT (value <= 100.0)"),
    ("event_type", "event_type_isin",
     Check.isin(["click", "view", "purchase", "signup", "error"],
                error="event_type_isin"),
     "event_type IS NOT NULL AND event_type NOT IN ('click','view','purchase','signup','error')"),
    ("event_type", "event_type_startswith",
     Check.str_startswith("c", error="event_type_startswith"),
     "event_type IS NOT NULL AND NOT starts_with(event_type, 'c')"),
    ("props", "props_contains_k",
     Check.str_contains('"k"', error="props_contains_k"),
     "props IS NOT NULL AND NOT regexp_matches(props, '\"k\"')"),
    ("user_id", "user_id_in_range",
     Check.in_range(0, 1000000, error="user_id_in_range"),
     "user_id IS NOT NULL AND NOT (user_id BETWEEN 0 AND 1000000)"),
]

EVENTS_NOT_NULL = ["event_id", "ts", "event_type"]


def _validation_schema(
    checks: list[tuple[str, str, Check, str]],
    not_null: list[str],
    name: str,
    unique: list[str] | None = None,
) -> DataFrameSchema:
    cols: dict[str, Column] = {}
    for colname, _label, check, _sql in checks:
        if colname not in cols:
            cols[colname] = Column(checks=[], nullable=colname not in not_null)
        cols[colname].checks.append(check)
    for colname in not_null:
        if colname not in cols:
            cols[colname] = Column(nullable=False)
    return DataFrameSchema(cols, name=name, unique=unique)


def _report_query(
    table: str,
    checks: list[tuple[str, str, Check, str]],
    not_null: list[str],
    unique: list[str] | None = None,
):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _load(spark, sf_dir, table)
        schema = _validation_schema(checks, not_null, table, unique)
        result = schema.validate_result(df)
        return (
            result.report_df(spark)
            .filter(F.col("category") == "DATA")
            .select(
                F.col("column").alias("col_name"),
                F.col("check").alias("check_name"),
                F.col("violations"),
            )
        )

    return q


def _report_oracle(
    table: str,
    checks: list[tuple[str, str, Check, str]],
    not_null: list[str],
    unique: list[str] | None = None,
) -> str:
    selects = [
        f"SELECT '{col}' AS col_name, '{label}' AS check_name, "
        f"CAST(COALESCE(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END), 0) AS BIGINT)"
        f" AS violations FROM {table}"
        for col, label, _chk, cond in checks
    ]
    selects += [
        f"SELECT '{col}' AS col_name, 'not_nullable' AS check_name, "
        f"CAST(COALESCE(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END), 0) "
        f"AS BIGINT) AS violations FROM {table}"
        for col in not_null
    ]
    if unique:
        cols = ", ".join(unique)
        col_id = ",".join(unique)
        label = f"unique({[c for c in unique]!r})".replace("'", "''")
        selects.append(
            f"SELECT '{col_id}' AS col_name, '{label}' AS check_name, "
            f"CAST(COALESCE((SELECT SUM(c) FROM (SELECT COUNT(*) AS c "
            f"FROM {table} GROUP BY {cols} HAVING COUNT(*) > 1)), 0) "
            f"AS BIGINT) AS violations"
        )
    return " UNION ALL ".join(selects)


# ---------------------------------------------------------------------------
# non-validation queries (profiling, dedup, text, drop_invalid_rows)
# ---------------------------------------------------------------------------

_LINEITEM_NUMERIC = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
]


def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass numeric profile (schema-inference statistics, SURVEY §2.H:
    reference schema_statistics/pyspark.py:12-62 runs one agg per stat — we
    fold every column's null-count/min/max/distinct into one job)."""
    df = _load(spark, sf_dir, "lineitem")
    aggs = []
    for c in _LINEITEM_NUMERIC:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls__{c}"),
            F.min(F.col(c).cast("double")).alias(f"min__{c}"),
            F.max(F.col(c).cast("double")).alias(f"max__{c}"),
            F.countDistinct(F.col(c)).alias(f"distinct__{c}"),
        ]
    row = df.agg(*aggs).first().asDict()
    data = [
        (
            c,
            int(row[f"nulls__{c}"]),
            float(row[f"min__{c}"]),
            float(row[f"max__{c}"]),
            int(row[f"distinct__{c}"]),
        )
        for c in _LINEITEM_NUMERIC
    ]
    schema = T.StructType(
        [
            T.StructField("col_name", T.StringType(), False),
            T.StructField("null_count", T.LongType(), False),
            T.StructField("min_value", T.DoubleType(), False),
            T.StructField("max_value", T.DoubleType(), False),
            T.StructField("distinct_count", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(data, schema)


def _profile_oracle() -> str:
    selects = [
        f"SELECT '{c}' AS col_name, "
        f"CAST(COALESCE(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END),0) AS BIGINT) AS null_count, "
        f"CAST(MIN({c}) AS DOUBLE) AS min_value, "
        f"CAST(MAX({c}) AS DOUBLE) AS max_value, "
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS distinct_count "
        f"FROM lineitem"
        for c in _LINEITEM_NUMERIC
    ]
    return " UNION ALL ".join(selects)


def q_dup_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint-uniqueness statistics on the natural key (SURVEY §2.B joint
    uniqueness; reference backends/pyspark/container.py:485-556)."""
    df = _load(spark, sf_dir, "lineitem")
    return (
        df.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.count(F.lit(1)).alias("dup_groups"),
            F.coalesce(F.sum("c"), F.lit(0)).alias("dup_rows"),
        )
    )


def q_drop_invalid_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_invalid_rows (SURVEY §2.B): keep rows passing every declared
    predicate, return deterministic aggregate fingerprint of the kept set."""
    df = _load(spark, sf_dir, "lineitem")
    schema = _validation_schema(
        LINEITEM_CHECKS, LINEITEM_NOT_NULL, "lineitem"
    )
    schema.drop_invalid_rows = True
    kept = schema.validate(df)
    return kept.agg(
        F.count(F.lit(1)).alias("kept_rows"),
        F.coalesce(
            F.sum(F.col("l_quantity").cast("long")), F.lit(0)
        ).alias("sum_qty"),
        F.coalesce(
            F.sum(F.col("l_linenumber").cast("long")), F.lit(0)
        ).alias("sum_linenumber"),
    )


def _drop_invalid_oracle() -> str:
    conds = []
    for _col, _label, _chk, sql in LINEITEM_CHECKS:
        conds.append(f"NOT ({sql})")
    for col in LINEITEM_NOT_NULL:
        conds.append(f"{col} IS NOT NULL")
    where = " AND ".join(conds)
    return (
        "SELECT CAST(COUNT(*) AS BIGINT) AS kept_rows, "
        "CAST(COALESCE(SUM(CAST(l_quantity AS BIGINT)),0) AS BIGINT) AS sum_qty, "
        "CAST(COALESCE(SUM(CAST(l_linenumber AS BIGINT)),0) AS BIGINT) AS sum_linenumber "
        f"FROM lineitem WHERE {where}"
    )


def q_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup fingerprint over documents (hash-groupBy; beyond-reference
    operator, BASELINE.json north star)."""
    from pandera_spark.operators.dedup import exact_dedup_stats

    return exact_dedup_stats(_load(spark, sf_dir, "documents"), "text")


def q_token_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting per document (text-analysis operator)."""
    from pandera_spark.operators.text import token_stats

    return token_stats(_load(spark, sf_dir, "documents"))


def q_lang_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language aggregate profile of the documents table."""
    df = _load(spark, sf_dir, "documents")
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).alias("sum_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


def q_distinct_returnflags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unique_values_eq support query (SURVEY §2.D; reference
    builtin_checks.py:403-421 distinct-collect -> ours is a distinct)."""
    df = _load(spark, sf_dir, "lineitem")
    return df.select(F.col("l_returnflag").alias("flag")).distinct()


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full single-pass lineitem validation at sf0.001."""
    return _report_query(
        "lineitem", LINEITEM_CHECKS, LINEITEM_NOT_NULL,
        unique=["l_orderkey", "l_linenumber"],
    )(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "validate_lineitem": _report_query(
            "lineitem", LINEITEM_CHECKS, LINEITEM_NOT_NULL,
            unique=["l_orderkey", "l_linenumber"],
        ),
        "validate_orders": _report_query(
            "orders", ORDERS_CHECKS, ORDERS_NOT_NULL
        ),
        "validate_events": _report_query(
            "events", EVENTS_CHECKS, EVENTS_NOT_NULL
        ),
        "profile_lineitem": q_profile_lineitem,
        "dup_stats_lineitem": q_dup_stats_lineitem,
        "drop_invalid_lineitem": q_drop_invalid_lineitem,
        "dedup_exact_documents": q_dedup_exact_documents,
        "token_stats_documents": q_token_stats_documents,
        "lang_profile_documents": q_lang_profile_documents,
        "distinct_returnflags": q_distinct_returnflags,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "validate_lineitem": _report_oracle(
            "lineitem", LINEITEM_CHECKS, LINEITEM_NOT_NULL,
            unique=["l_orderkey", "l_linenumber"],
        ),
        "validate_orders": _report_oracle(
            "orders", ORDERS_CHECKS, ORDERS_NOT_NULL
        ),
        "validate_events": _report_oracle(
            "events", EVENTS_CHECKS, EVENTS_NOT_NULL
        ),
        "profile_lineitem": _profile_oracle(),
        "dup_stats_lineitem": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS dup_groups, "
            "CAST(COALESCE(SUM(c), 0) AS BIGINT) AS dup_rows FROM ("
            "SELECT COUNT(*) AS c FROM lineitem "
            "GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)"
        ),
        "drop_invalid_lineitem": _drop_invalid_oracle(),
        "dedup_exact_documents": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct, "
            "CAST(COALESCE((SELECT SUM(c) FROM (SELECT COUNT(*) AS c "
            "FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1)), 0) "
            "AS BIGINT) AS dup_rows "
            "FROM documents"
        ),
        "token_stats_documents": (
            "SELECT doc_id, "
            "CAST(LENGTH(text) AS BIGINT) AS n_chars_computed, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
            "FROM documents"
        ),
        "lang_profile_documents": (
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars, "
            "CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources "
            "FROM documents GROUP BY lang"
        ),
        "distinct_returnflags": (
            "SELECT DISTINCT l_returnflag AS flag FROM lineitem"
        ),
    }
