"""Check: a value constraint that compiles to a Spark boolean ``Column``.

API surface mirrors the reference ``Check`` namespace
(/root/reference/pandera/api/checks.py:18-223 options; builtin classmethods
:263-754 and aliases :1004-1051).  Execution model is deliberately different
from the reference pyspark backend (one ``filter(~cond).limit(1).count()``
Spark ACTION per check, backends/pyspark/builtin_checks.py:49 et al.): here a
check only *builds an expression*; the container backend folds every check
into ONE aggregation pass (SURVEY.md §4).

Null semantics: with default ``ignore_na=True`` null elements pass
(reference api/checks.py:80-82; polars postprocess backends/polars/checks.py:93-96).
A row is a violation iff ``col IS NOT NULL AND NOT pred`` (ignore_na) or
``NOT coalesce(pred, FALSE)`` otherwise.

Type gating mirrors backends/pyspark/decorators.py:16-28,42-104: applying e.g.
``gt`` to a StringType column is a SCHEMA error, caught at compile time.
"""

from __future__ import annotations

import datetime
from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .engine import (
    BINARY_TYPES,
    BOOLEAN_TYPES,
    DATE_TYPES,
    NUMERIC_TYPES,
    STRING_TYPES,
)
from .errors import UnsupportedDtypeError

_EQ_TYPES = NUMERIC_TYPES + DATE_TYPES + STRING_TYPES + BINARY_TYPES + BOOLEAN_TYPES
_CMP_TYPES = NUMERIC_TYPES + DATE_TYPES
_SET_TYPES = NUMERIC_TYPES + DATE_TYPES + STRING_TYPES + BINARY_TYPES


def _lit(v: Any):
    return F.lit(v)


# --------------------------------------------------------------------------
# generated-SQL compile lane (driver latency, OPTIMIZATION_r11)
#
# Building a check's violation Column through pyspark operators costs
# ~50-100 py4j round trips per check (~0.3 ms each); a schema with a few
# dozen checks pays ~1 s of pure socket latency PER validate call.  For the
# stock builtins the same predicate can be rendered as ONE SQL string and
# parsed with a single F.expr call.  The lane is strictly opt-out-safe:
# any check/value it cannot render EXACTLY returns None and the caller
# falls back to the Column lane.  Semantics equivalence (incl. null
# handling, float literal bits, regex anchoring, string escaping) is
# pinned by tests/test_check_sql_lane.py differential cases.
# --------------------------------------------------------------------------

_SQL_STR_ESCAPES = {
    "\\": "\\\\",
    "'": "\\'",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\0": "\\0",
}


def _sql_lit(v: Any) -> "str | None":
    """Exact SQL literal for ``v``, or None when a textual rendering that
    reproduces ``F.lit(v)`` bit-for-bit is not guaranteed (datetimes,
    decimals, non-finite floats, out-of-long ints...)."""
    if isinstance(v, bool):
        # before int: bool is an int subclass
        return "true" if v else "false"
    if isinstance(v, int):
        # bare integral literal parses as INT when it fits, else BIGINT —
        # the same widths F.lit picks
        if -(2 ** 63) <= v < 2 ** 63:
            return str(v)
        return None
    if isinstance(v, float):
        import math

        if not math.isfinite(v):
            return None
        # string->double cast is an exact round trip for repr output and
        # always yields DOUBLE (a bare decimal literal would be DECIMAL)
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        return "'" + "".join(_SQL_STR_ESCAPES.get(ch, ch) for ch in v) + "'"
    return None


def _sql_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _pyspark_version_tuple() -> tuple:
    import pyspark

    try:
        return tuple(
            int(p) for p in pyspark.__version__.split(".")[:2]
        )
    except (ValueError, AttributeError):  # pragma: no cover
        return (0, 0)


# every SQL function the lane emits exists from 3.5 on (regexp_like is
# 3.2+, the startswith/endswith STRING functions are 3.5+); on older
# runtimes F.expr would PARSE fine and only fail in the analyzer at
# action time — past the runner's fallback — so gate the whole lane
_SQL_LANE_VERSION_OK = _pyspark_version_tuple() >= (3, 5)


def _backslash_escapes_active() -> bool:
    """True when the SQL parser processes backslash escapes in string
    literals (the default).  spark.sql.parser.escapedStringLiterals=true
    (Hive compatibility) disables that processing, which would make the
    lane's escaped literals silently mean something else."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return False
        return (
            str(
                spark.conf.get(
                    "spark.sql.parser.escapedStringLiterals", "false"
                )
            ).lower()
            == "false"
        )
    except Exception:  # pragma: no cover - conf unreadable => be safe
        return False


def _builtin_predicate_sql(check: "Check", q: str) -> "str | None":
    """SQL text of ``check.predicate(col)`` for supported builtins
    (``q`` is the already-quoted column reference), else None."""
    s = check.statistics or {}
    name = check.name
    if name == "equal_to":
        lit = _sql_lit(s.get("value"))
        return None if lit is None else f"({q} = {lit})"
    if name == "not_equal_to":
        lit = _sql_lit(s.get("value"))
        return None if lit is None else f"({q} != {lit})"
    if name == "greater_than":
        lit = _sql_lit(s.get("min_value"))
        return None if lit is None else f"({q} > {lit})"
    if name == "greater_than_or_equal_to":
        lit = _sql_lit(s.get("min_value"))
        return None if lit is None else f"({q} >= {lit})"
    if name == "less_than":
        lit = _sql_lit(s.get("max_value"))
        return None if lit is None else f"({q} < {lit})"
    if name == "less_than_or_equal_to":
        lit = _sql_lit(s.get("max_value"))
        return None if lit is None else f"({q} <= {lit})"
    if name == "in_range":
        lo = _sql_lit(s.get("min_value"))
        hi = _sql_lit(s.get("max_value"))
        if lo is None or hi is None:
            return None
        lo_op = ">=" if s.get("include_min", True) else ">"
        hi_op = "<=" if s.get("include_max", True) else "<"
        return f"(({q} {lo_op} {lo}) AND ({q} {hi_op} {hi}))"
    if name in ("isin", "notin"):
        key = "allowed_values" if name == "isin" else "forbidden_values"
        vals = s.get(key)
        if not vals:
            return None
        lits = [_sql_lit(v) for v in vals]
        if any(lit is None for lit in lits):
            return None
        inlist = f"({q} IN ({', '.join(lits)}))"
        return inlist if name == "isin" else f"(NOT {inlist})"
    if name == "str_matches":
        pat = s.get("pattern")
        if not isinstance(pat, str):
            return None
        pat = pat if pat.startswith("^") else "^" + pat
        lit = _sql_lit(pat)
        return None if lit is None else f"regexp_like({q}, {lit})"
    if name == "str_contains":
        pat = s.get("pattern")
        lit = _sql_lit(pat) if isinstance(pat, str) else None
        return None if lit is None else f"regexp_like({q}, {lit})"
    if name == "str_startswith":
        lit = _sql_lit(s.get("string"))
        return None if lit is None else f"startswith({q}, {lit})"
    if name == "str_endswith":
        lit = _sql_lit(s.get("string"))
        return None if lit is None else f"endswith({q}, {lit})"
    if name == "str_length":
        if "exact_value" in s:
            lit = _sql_lit(s.get("exact_value"))
            return None if lit is None else f"(length({q}) = {lit})"
        lo, hi = s.get("min_value"), s.get("max_value")
        if lo is None and hi is None:
            return None
        if lo is None:
            lit = _sql_lit(hi)
            return None if lit is None else f"(length({q}) <= {lit})"
        if hi is None:
            lit = _sql_lit(lo)
            return None if lit is None else f"(length({q}) >= {lit})"
        llo, lhi = _sql_lit(lo), _sql_lit(hi)
        if llo is None or lhi is None:
            return None
        return f"((length({q}) >= {llo}) AND (length({q}) <= {lhi}))"
    return None


class Check:
    """A reusable value constraint.

    :param check_fn: custom predicate.  Signatures supported:
        ``fn(col: Column) -> Column`` (per-column boolean expression) or, for
        dataframe-level checks, ``fn(df: DataFrame) -> Column``.  This replaces
        the reference's pandas-series lambdas with Spark expressions (the
        narwhals/polars design, SURVEY.md §2.D).
    :param element_wise: accepted for API compatibility; expressions are
        always element-wise on Spark.
    """

    def __init__(
        self,
        check_fn: Callable | None = None,
        *,
        name: str | None = None,
        error: str | None = None,
        title: str | None = None,
        description: str | None = None,
        ignore_na: bool = True,
        raise_warning: bool = False,
        n_failure_cases: int | None = None,
        element_wise: bool = False,
        statistics: dict | None = None,
        accepted_dtypes: tuple | None = None,
        agg_kind: str | None = None,
        groupby: str | list[str] | None = None,
        determined_by_unique: bool = False,
        distributed: bool = False,
        max_collect_rows: int = 500_000,
        **kwargs: Any,
    ):
        self.check_fn = check_fn
        self.name = name or (getattr(check_fn, "__name__", None) or "check")
        if self.name == "<lambda>":
            self.name = "lambda"
        self.error = error or self.name
        self.title = title
        self.description = description
        self.ignore_na = ignore_na
        self.raise_warning = raise_warning
        self.n_failure_cases = n_failure_cases
        self.element_wise = element_wise
        self.statistics = statistics or {}
        self.accepted_dtypes = accepted_dtypes  # None = no gating
        # agg_kind: None = row predicate; "unique_values_eq" = needs collect_set
        self.agg_kind = agg_kind
        self.groupby = groupby
        # distributed=True moves grouped-check / custom-hypothesis
        # evaluation off the driver into executors (applyInPandas); the
        # check fn must then be per-group decomposable (it sees one group
        # per call, combined with AND) — see backend/runner.py
        self.distributed = distributed
        # driver-OOM seatbelt for the grouped-custom-check collect lane
        # (mirrors Hypothesis.max_collect_rows): per-group value lists
        # are sliced to cap+1 INSIDE the aggregate, so an oversized
        # group raises without ever materializing on the driver.
        # 0 disables the guard (explicit opt-out).
        self.max_collect_rows = int(max_collect_rows)
        # API parity with reference api/checks.py:118-123: a dedup-
        # before-check hint.  Accepted as metadata; the Spark engine's
        # single aggregated pass evaluates predicates inline, so a
        # distinct() pre-pass (an extra shuffle) never wins (SURVEY §4).
        self.determined_by_unique = determined_by_unique
        self._kwargs = kwargs

    def __repr__(self) -> str:
        return f"<Check {self.error}>"

    # -- compilation ----------------------------------------------------------

    def gate_dtype(self, dtype: T.DataType) -> None:
        """Raise if this check does not support ``dtype``
        (reference backends/pyspark/decorators.py:42-104)."""
        if self.accepted_dtypes is not None and not isinstance(
            dtype, self.accepted_dtypes
        ):
            raise UnsupportedDtypeError(
                f"check '{self.error}' does not accept Spark dtype "
                f"{dtype.simpleString()}"
            )

    def predicate(self, col: SparkCol) -> SparkCol:
        """Boolean pass/fail expression for one element (null => null/True
        handled by :meth:`violation_condition`)."""
        if self.check_fn is None:
            raise ValueError(f"check {self.name} has no predicate")
        return self.check_fn(col)

    def violation_condition(self, col: SparkCol) -> SparkCol:
        """Expression that is TRUE for rows violating this check."""
        pred = self.predicate(col)
        if self.ignore_na:
            return col.isNotNull() & ~F.coalesce(pred, F.lit(False))
        return ~F.coalesce(pred, F.lit(False))

    def pass_condition(self, col: SparkCol) -> SparkCol:
        """Expression TRUE for rows passing (used by drop_invalid_rows)."""
        return ~self.violation_condition(col)

    def violation_condition_sql(self, colname: str) -> "str | None":
        """SQL text of :meth:`violation_condition` for stock builtins —
        one ``F.expr`` parse instead of dozens of py4j round trips — or
        None when this check (custom fn, subclass, unsupported literal
        type) must go through the Column lane.  Same null semantics:
        ``ignore_na`` wraps the predicate in
        ``col IS NOT NULL AND NOT coalesce(pred, false)``."""
        if (
            type(self) is not Check
            or self.check_fn is None
            or not getattr(self, "_from_builtin", False)
            or not _SQL_LANE_VERSION_OK
        ):
            return None
        q = _sql_ident(colname)
        pred = _builtin_predicate_sql(self, q)
        if pred is None:
            return None
        if "\\" in pred and not _backslash_escapes_active():
            # the rendered literal relies on backslash escape processing;
            # with spark.sql.parser.escapedStringLiterals=true (Hive
            # compat) the parser would read the escapes literally and the
            # predicate would silently diverge — Column lane instead
            return None
        if self.ignore_na:
            return f"(({q} IS NOT NULL) AND (NOT coalesce({pred}, false)))"
        return f"(NOT coalesce({pred}, false))"

    # -- builtin factory ------------------------------------------------------

    @classmethod
    def _builtin(
        cls,
        name: str,
        error: str,
        fn: Callable[[SparkCol], SparkCol],
        statistics: dict,
        accepted: tuple | None,
        kwargs: dict,
        agg_kind: str | None = None,
    ) -> "Check":
        # allow user override of the error label (used as the check's
        # stable identifier in reports), like the reference's ``error=`` kwarg
        error = kwargs.pop("error", None) or error
        chk = cls(
            fn,
            name=name,
            error=error,
            statistics=statistics,
            accepted_dtypes=accepted,
            agg_kind=agg_kind,
            **kwargs,
        )
        # gate for the generated-SQL compile lane: only predicates whose
        # fn provably came from this factory may be rendered from
        # (name, statistics) — a hand-built Check with a builtin name but
        # a different fn must go through the Column lane
        chk._from_builtin = True
        return chk

    # reference api/checks.py:263
    @classmethod
    def equal_to(cls, value: Any, **kwargs) -> "Check":
        return cls._builtin(
            "equal_to", f"equal_to({value!r})",
            lambda c: c == _lit(value), {"value": value}, _EQ_TYPES, kwargs,
        )

    # reference api/checks.py:278
    @classmethod
    def not_equal_to(cls, value: Any, **kwargs) -> "Check":
        return cls._builtin(
            "not_equal_to", f"not_equal_to({value!r})",
            lambda c: c != _lit(value), {"value": value}, _EQ_TYPES, kwargs,
        )

    # reference api/checks.py:292
    @classmethod
    def greater_than(cls, min_value: Any, **kwargs) -> "Check":
        if min_value is None:
            raise ValueError("min_value must not be None")
        return cls._builtin(
            "greater_than", f"greater_than({min_value!r})",
            lambda c: c > _lit(min_value), {"min_value": min_value},
            _CMP_TYPES, kwargs,
        )

    # reference api/checks.py:312
    @classmethod
    def greater_than_or_equal_to(cls, min_value: Any, **kwargs) -> "Check":
        if min_value is None:
            raise ValueError("min_value must not be None")
        return cls._builtin(
            "greater_than_or_equal_to",
            f"greater_than_or_equal_to({min_value!r})",
            lambda c: c >= _lit(min_value), {"min_value": min_value},
            _CMP_TYPES, kwargs,
        )

    # reference api/checks.py:330
    @classmethod
    def less_than(cls, max_value: Any, **kwargs) -> "Check":
        if max_value is None:
            raise ValueError("max_value must not be None")
        return cls._builtin(
            "less_than", f"less_than({max_value!r})",
            lambda c: c < _lit(max_value), {"max_value": max_value},
            _CMP_TYPES, kwargs,
        )

    # reference api/checks.py:348
    @classmethod
    def less_than_or_equal_to(cls, max_value: Any, **kwargs) -> "Check":
        if max_value is None:
            raise ValueError("max_value must not be None")
        return cls._builtin(
            "less_than_or_equal_to", f"less_than_or_equal_to({max_value!r})",
            lambda c: c <= _lit(max_value), {"max_value": max_value},
            _CMP_TYPES, kwargs,
        )

    # reference api/checks.py:366-473 (positional-arg juggling preserved)
    @classmethod
    def in_range(
        cls,
        min_value: Any = None,
        max_value: Any = None,
        include_min: bool = True,
        include_max: bool = True,
        **kwargs,
    ) -> "Check":
        if min_value is None or max_value is None:
            raise ValueError("in_range requires min_value and max_value")
        if max_value < min_value or (
            min_value == max_value and (not include_min or not include_max)
        ):
            raise ValueError(
                f"The combination of min_value = {min_value} and "
                f"max_value = {max_value} defines an empty interval!"
            )

        def fn(c: SparkCol) -> SparkCol:
            lo = (c >= _lit(min_value)) if include_min else (c > _lit(min_value))
            hi = (c <= _lit(max_value)) if include_max else (c < _lit(max_value))
            return lo & hi

        return cls._builtin(
            "in_range", f"in_range({min_value!r}, {max_value!r})", fn,
            {
                "min_value": min_value, "max_value": max_value,
                "include_min": include_min, "include_max": include_max,
            },
            _CMP_TYPES, kwargs,
        )

    # reference api/checks.py:475
    @classmethod
    def isin(cls, allowed_values: Iterable, **kwargs) -> "Check":
        vals = list(allowed_values)
        return cls._builtin(
            "isin", f"isin({vals!r})",
            lambda c: c.isin(vals), {"allowed_values": vals}, _SET_TYPES, kwargs,
        )

    # reference api/checks.py:532
    @classmethod
    def notin(cls, forbidden_values: Iterable, **kwargs) -> "Check":
        vals = list(forbidden_values)
        return cls._builtin(
            "notin", f"notin({vals!r})",
            lambda c: ~c.isin(vals), {"forbidden_values": vals},
            _SET_TYPES, kwargs,
        )

    # reference api/checks.py:588; pyspark impl anchors with '^'
    # (backends/pyspark/builtin_checks.py:280)
    @classmethod
    def str_matches(cls, pattern: str, **kwargs) -> "Check":
        pat = pattern if pattern.startswith("^") else "^" + pattern
        return cls._builtin(
            "str_matches", f"str_matches('{pattern}')",
            lambda c: c.rlike(pat), {"pattern": pattern}, STRING_TYPES, kwargs,
        )

    # reference api/checks.py:610
    @classmethod
    def str_contains(cls, pattern: str, **kwargs) -> "Check":
        return cls._builtin(
            "str_contains", f"str_contains('{pattern}')",
            lambda c: c.rlike(pattern), {"pattern": pattern},
            STRING_TYPES, kwargs,
        )

    # reference api/checks.py:634
    @classmethod
    def str_startswith(cls, string: str, **kwargs) -> "Check":
        return cls._builtin(
            "str_startswith", f"str_startswith('{string}')",
            lambda c: c.startswith(string), {"string": string},
            STRING_TYPES, kwargs,
        )

    # reference api/checks.py:650
    @classmethod
    def str_endswith(cls, string: str, **kwargs) -> "Check":
        return cls._builtin(
            "str_endswith", f"str_endswith('{string}')",
            lambda c: c.endswith(string), {"string": string},
            STRING_TYPES, kwargs,
        )

    # reference api/checks.py:665-727 (exact / min / max / range forms)
    @classmethod
    def str_length(
        cls,
        *args,
        min_value: int | None = None,
        max_value: int | None = None,
        exact_value: int | None = None,
        **kwargs,
    ) -> "Check":
        if len(args) == 1:
            exact_value = args[0]
        elif len(args) == 2:
            min_value, max_value = args
        elif len(args) > 2:
            raise ValueError("str_length accepts at most 2 positional args")
        if exact_value is not None:
            return cls._builtin(
                "str_length", f"str_length({exact_value})",
                lambda c: F.length(c) == exact_value,
                {"exact_value": exact_value}, STRING_TYPES, kwargs,
            )
        if min_value is None and max_value is None:
            raise ValueError(
                "At least a minimum or a maximum need to be specified."
            )

        def fn(c: SparkCol) -> SparkCol:
            ln = F.length(c)
            if min_value is None:
                return ln <= max_value
            if max_value is None:
                return ln >= min_value
            return (ln >= min_value) & (ln <= max_value)

        return cls._builtin(
            "str_length", f"str_length({min_value}, {max_value})", fn,
            {"min_value": min_value, "max_value": max_value},
            STRING_TYPES, kwargs,
        )

    # reference api/checks.py:731; pyspark impl distinct().collect()
    # (backends/pyspark/builtin_checks.py:403-421) — ours folds a
    # collect_set into the shared aggregation pass.
    @classmethod
    def unique_values_eq(cls, values: Iterable, **kwargs) -> "Check":
        vals = frozenset(values)
        return cls._builtin(
            "unique_values_eq", f"unique_values_eq({sorted(vals)!r})",
            None, {"values": vals}, _SET_TYPES, kwargs,
            agg_kind="unique_values_eq",
        )

    # tabular analogue of xarray is_monotonic (SURVEY.md §2.D note): value
    # non-decreasing when ordered by ``order_by``.  Needs a window — kept as
    # an opt-in extra check, executed in the shared pass via a lag expression
    # only when the container compiles it with an order column.
    @classmethod
    def is_monotonic(
        cls, order_by: str, decreasing: bool = False, strict: bool = False,
        distributed: bool = False, **kwargs,
    ) -> "Check":
        """``distributed=True`` evaluates via
        :func:`pandera_spark.operators.ordered.monotonic_violations`
        (range-repartition + per-partition windows) instead of a global
        ``Window.orderBy`` — required at data sizes where one partition
        can't hold the table."""
        chk = cls(
            None,
            name="is_monotonic",
            error=kwargs.pop("error", None)
            or f"is_monotonic(order_by='{order_by}', decreasing={decreasing})",
            statistics={
                "order_by": order_by, "decreasing": decreasing,
                "strict": strict, "distributed": distributed,
            },
            accepted_dtypes=_CMP_TYPES,
            agg_kind="is_monotonic",
            **kwargs,
        )
        return chk

    # -- array-column checks (beyond-reference; the reference has no
    # nested-type value checks — SURVEY §1.2).  All compile to Catalyst
    # higher-order functions (forall/exists) and fold into the shared
    # single-pass aggregation like any scalar check. ----------------------

    @classmethod
    def array_size(
        cls,
        *args,
        min_value: int | None = None,
        max_value: int | None = None,
        exact_value: int | None = None,
        **kwargs,
    ) -> "Check":
        """Array length check: ``array_size(n)`` exact, or
        ``array_size(min_value=, max_value=)`` bounds."""
        if len(args) == 1:
            exact_value = args[0]
        elif len(args) == 2:
            min_value, max_value = args
        elif len(args) > 2:
            raise ValueError("array_size accepts at most 2 positional args")
        if exact_value is not None:
            return cls._builtin(
                "array_size", f"array_size({exact_value})",
                lambda c: F.size(c) == exact_value,
                {"exact_value": exact_value}, (T.ArrayType,), kwargs,
            )
        if min_value is None and max_value is None:
            raise ValueError(
                "At least a minimum or a maximum need to be specified."
            )

        def fn(c: SparkCol) -> SparkCol:
            ln = F.size(c)
            if min_value is None:
                return ln <= max_value
            if max_value is None:
                return ln >= min_value
            return (ln >= min_value) & (ln <= max_value)

        return cls._builtin(
            "array_size", f"array_size({min_value}, {max_value})", fn,
            {"min_value": min_value, "max_value": max_value},
            (T.ArrayType,), kwargs,
        )

    @classmethod
    def array_no_nulls(cls, **kwargs) -> "Check":
        """No null elements inside the array."""
        return cls._builtin(
            "array_no_nulls", "array_no_nulls",
            lambda c: ~F.exists(c, lambda x: x.isNull()),
            {}, (T.ArrayType,), kwargs,
        )

    @classmethod
    def array_forall_in_range(
        cls, min_value, max_value, **kwargs
    ) -> "Check":
        """Every element non-null and within ``[min_value, max_value]``."""
        return cls._builtin(
            "array_forall_in_range",
            f"array_forall_in_range({min_value}, {max_value})",
            lambda c: F.forall(
                c,
                lambda x: x.isNotNull()
                & (x >= F.lit(min_value))
                & (x <= F.lit(max_value)),
            ),
            {"min_value": min_value, "max_value": max_value},
            (T.ArrayType,), kwargs,
        )

    @classmethod
    def array_finite(cls, **kwargs) -> "Check":
        """Every element non-null and finite (no NaN / ±Inf) — the
        embedding-column sanity gate."""
        return cls._builtin(
            "array_finite", "array_finite",
            lambda c: F.forall(
                c,
                lambda x: x.isNotNull()
                & ~F.isnan(x.cast("double"))
                & (F.abs(x.cast("double")) != float("inf")),
            ),
            {}, (T.ArrayType,), kwargs,
        )

    @classmethod
    def map_size(
        cls,
        *args,
        min_value: int | None = None,
        max_value: int | None = None,
        exact_value: int | None = None,
        **kwargs,
    ) -> "Check":
        """Map entry-count check (exact or bounded), mirroring
        :meth:`array_size`."""
        if len(args) == 1:
            exact_value = args[0]
        elif len(args) == 2:
            min_value, max_value = args
        elif len(args) > 2:
            raise ValueError("map_size accepts at most 2 positional args")
        if exact_value is not None:
            return cls._builtin(
                "map_size", f"map_size({exact_value})",
                lambda c: F.size(c) == exact_value,
                {"exact_value": exact_value}, (T.MapType,), kwargs,
            )
        if min_value is None and max_value is None:
            raise ValueError(
                "At least a minimum or a maximum need to be specified."
            )

        def fn(c: SparkCol) -> SparkCol:
            ln = F.size(c)
            if min_value is None:
                return ln <= max_value
            if max_value is None:
                return ln >= min_value
            return (ln >= min_value) & (ln <= max_value)

        return cls._builtin(
            "map_size", f"map_size({min_value}, {max_value})", fn,
            {"min_value": min_value, "max_value": max_value},
            (T.MapType,), kwargs,
        )

    @classmethod
    def map_keys_isin(cls, allowed: Iterable, **kwargs) -> "Check":
        """Every map key drawn from ``allowed`` (schema-on-read guard for
        semi-structured property bags)."""
        vals = sorted(set(allowed), key=repr)
        return cls._builtin(
            "map_keys_isin", f"map_keys_isin({vals!r})",
            lambda c: F.forall(
                F.map_keys(c),
                lambda k: k.isin(*vals) if vals else F.lit(False),
            ),
            {"allowed": frozenset(vals)}, (T.MapType,), kwargs,
        )

    @classmethod
    def json_matches_schema(cls, ddl_schema: str, **kwargs) -> "Check":
        """Semi-structured validation: a string column must parse as
        JSON conforming to the given DDL schema (e.g.
        ``"map<string,bigint>"`` or ``"a INT, b STRING"``) —
        For map/array schemas a malformed document parses to null; for
        STRUCT schemas PERMISSIVE mode yields an all-null struct
        instead, so the check plants a ``_corrupt_record`` column in
        the parse schema and requires it null — both forms evaluate
        JVM-side in the shared agg pass, no UDF.  Nulls pass per
        ``ignore_na``, like every check."""
        struct_schema = None
        try:
            parsed = T.StructType.fromDDL(ddl_schema)
            if isinstance(parsed, T.StructType):
                struct_schema = parsed
        except Exception:
            pass
        if struct_schema is not None and not any(
            f.name == "_corrupt_record" for f in struct_schema.fields
        ):
            aug = T.StructType(
                [*struct_schema.fields,
                 T.StructField("_corrupt_record", T.StringType(), True)]
            )

            def ok(c: SparkCol) -> SparkCol:
                p = F.from_json(
                    c, aug,
                    {"columnNameOfCorruptRecord": "_corrupt_record"},
                )
                return p.isNotNull() & p.getField("_corrupt_record").isNull()

        else:

            def ok(c: SparkCol) -> SparkCol:
                return F.from_json(c, ddl_schema).isNotNull()

        return cls._builtin(
            "json_matches_schema",
            f"json_matches_schema({ddl_schema!r})",
            ok,
            {"ddl_schema": ddl_schema}, STRING_TYPES, kwargs,
        )

    @classmethod
    def str_parses_timestamp(cls, fmt: str, **kwargs) -> "Check":
        """String column must parse as a timestamp under the given
        Spark datetime pattern (e.g. ``"yyyy-MM-dd"``) —
        ``try_to_timestamp`` yields null on failure under BOTH ANSI
        modes, so the violation is a null parse; nulls pass per
        ``ignore_na``.  The ingestion contract for stringly-typed date
        feeds."""
        return cls._builtin(
            "str_parses_timestamp",
            f"str_parses_timestamp({fmt!r})",
            lambda c: F.try_to_timestamp(c, F.lit(fmt)).isNotNull(),
            {"fmt": fmt}, STRING_TYPES, kwargs,
        )

    @classmethod
    def map_values_forall(cls, element_fn, **kwargs) -> "Check":
        """Generic per-value map check: ``element_fn`` maps one value
        Column to a boolean, evaluated with ``forall`` over
        ``map_values`` (JVM higher-order function)."""
        return cls._builtin(
            "map_values_forall", "map_values_forall",
            lambda c: F.forall(F.map_values(c), element_fn),
            {}, (T.MapType,), kwargs,
        )

    @classmethod
    def array_forall(cls, element_fn, **kwargs) -> "Check":
        """Generic element-wise array check: ``element_fn`` maps one
        element Column to a boolean Column, evaluated with ``forall``
        (JVM higher-order function — not a Python UDF).  Label it with
        ``error=``."""
        return cls._builtin(
            "array_forall", "array_forall",
            lambda c: F.forall(c, element_fn),
            {}, (T.ArrayType,), kwargs,
        )

    # -- aliases (reference api/checks.py:1004-1051) --------------------------
    eq = equal_to
    ne = not_equal_to
    gt = greater_than
    ge = greater_than_or_equal_to
    lt = less_than
    le = less_than_or_equal_to
    between = in_range


#: names usable from DataFrameModel Field(...) kwargs — reference
#: api/dataframe/model_components.py:114-284 `_check_dispatch`
BUILTIN_CHECK_NAMES = {
    "eq": Check.equal_to,
    "equal_to": Check.equal_to,
    "ne": Check.not_equal_to,
    "not_equal_to": Check.not_equal_to,
    "gt": Check.greater_than,
    "greater_than": Check.greater_than,
    "ge": Check.greater_than_or_equal_to,
    "greater_than_or_equal_to": Check.greater_than_or_equal_to,
    "lt": Check.less_than,
    "less_than": Check.less_than,
    "le": Check.less_than_or_equal_to,
    "less_than_or_equal_to": Check.less_than_or_equal_to,
    "in_range": Check.in_range,
    "between": Check.in_range,
    "isin": Check.isin,
    "notin": Check.notin,
    "str_matches": Check.str_matches,
    "str_contains": Check.str_contains,
    "str_startswith": Check.str_startswith,
    "str_endswith": Check.str_endswith,
    "str_length": Check.str_length,
    "unique_values_eq": Check.unique_values_eq,
    "array_size": Check.array_size,
    "array_no_nulls": Check.array_no_nulls,
    "array_forall_in_range": Check.array_forall_in_range,
    "array_finite": Check.array_finite,
    "map_size": Check.map_size,
    "json_matches_schema": Check.json_matches_schema,
    "str_parses_timestamp": Check.str_parses_timestamp,
    "map_keys_isin": Check.map_keys_isin,
}
