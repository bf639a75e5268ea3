"""``DataFrameSchema`` — the table-level schema object (the "query").

Reference API: /root/reference/pandera/api/dataframe/container.py:44-180
(kwargs), pandera/api/pyspark/container.py:59-133 (validate entry),
to_structtype/to_ddl :163-195, to_yaml/to_json :197-231.

Spark-native execution: see backend/runner.py — one aggregation pass for all
data checks instead of the reference's job-per-check.
"""

from __future__ import annotations

from typing import Any, Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .accessor import attach_report
from .backend.runner import run_validation
from .checks import Check
from .components import Column
from .engine import dtype_to_ddl, normalize_dtype
from .errors import SchemaErrors, SchemaInitError
from .parsers import Parser
from .report import ValidationResult


def _as_list(x, cls):
    if x is None:
        return []
    if isinstance(x, cls):
        return [x]
    return list(x)


class DataFrameSchema:
    def __init__(
        self,
        columns: Optional[dict[str, Union[Column, Any]]] = None,
        checks: Optional[Union[Check, list[Check]]] = None,
        parsers: Optional[Union[Parser, list[Parser]]] = None,
        *,
        dtype: Any = None,
        coerce: bool = False,
        strict: Union[bool, str] = False,
        ordered: bool = False,
        unique: Optional[Union[str, list[str]]] = None,
        report_duplicates: str = "all",
        unique_column_names: bool = False,
        add_missing_columns: bool = False,
        drop_invalid_rows: bool = False,
        name: Optional[str] = None,
        title: Optional[str] = None,
        description: Optional[str] = None,
        metadata: Optional[dict] = None,
    ):
        if strict not in (True, False, "filter"):
            raise SchemaInitError(
                f"strict must be True, False or 'filter', got {strict!r}"
            )
        if report_duplicates not in ("all", "exclude_first", "exclude_last"):
            # reference dtypes.py:627 UniqueSettings
            raise SchemaInitError(
                f"report_duplicates must be all|exclude_first|exclude_last, "
                f"got {report_duplicates!r}"
            )
        self.columns: dict[str, Column] = {}
        for key, comp in (columns or {}).items():
            if not isinstance(comp, Column):
                # shorthand: {"a": "bigint"} or {"a": T.LongType()} or
                # {"a": Check.gt(0)} / {"a": [checks]}
                if isinstance(comp, Check) or (
                    isinstance(comp, list)
                    and all(isinstance(c, Check) for c in comp)
                ):
                    comp = Column(checks=comp)
                else:
                    comp = Column(comp)
            if comp.name is None:
                comp.set_name(key)
            self.columns[key] = comp
        self.checks = _as_list(checks, Check)
        self.parsers = _as_list(parsers, Parser)
        self.dtype = normalize_dtype(dtype) if dtype is not None else None
        self.coerce = coerce
        self.strict = strict
        self.ordered = ordered
        self.unique = unique
        self.report_duplicates = report_duplicates
        self.unique_column_names = unique_column_names
        self.add_missing_columns = add_missing_columns
        self.drop_invalid_rows = drop_invalid_rows
        self.name = name
        self.title = title
        self.description = description
        self.metadata = metadata

    # -- validation ----------------------------------------------------------

    def validate(
        self,
        df: DataFrame,
        head: Optional[int] = None,
        sample: Optional[float] = None,
        random_state: Optional[int] = None,
        lazy: bool = True,
        inplace: bool = False,
    ) -> DataFrame:
        """Validate ``df``.

        lazy=True (pyspark-reference behavior): collect every failure,
        attach the error report to the returned DataFrame
        (``df.pandera.errors``) and never raise.
        lazy=False: raise :class:`SchemaErrors` when anything fails.
        """
        result = self.validate_result(
            df, head=head, sample=sample, random_state=random_state
        )
        if not lazy and result.errors:
            raise SchemaErrors(
                self.name or "schema", result.errors, result.report
            )
        attach_report(result.df, result.report, result)
        return result.df

    def validate_result(
        self,
        df: DataFrame,
        head: Optional[int] = None,
        sample: Optional[float] = None,
        random_state: Optional[int] = None,
    ) -> ValidationResult:
        """Validate and return the full :class:`ValidationResult` (outcome
        table, counts, report dict, transformed df)."""
        return run_validation(
            self, df, head=head, sample=sample, random_state=random_state
        )

    def groupwise_report(self, df: DataFrame, by: list[str]) -> DataFrame:
        """Per-group violation counts for every row-resolvable check in
        one grouped aggregation — ``(*by, col_name, check, violations,
        n_rows)``.  See :func:`pandera_spark.backend.runner.
        groupwise_report`."""
        from .backend.runner import groupwise_report

        return groupwise_report(self, df, by)

    def annotate(
        self, df: DataFrame, *, out_col: str = "failed_checks"
    ) -> DataFrame:
        """Row-level annotation: input rows plus an ``array<string>`` of
        every row-resolvable check the row fails (empty = clean).  Pure
        projection, no action.  See
        :func:`pandera_spark.backend.runner.annotate_errors`."""
        from .backend.runner import annotate_errors

        return annotate_errors(self, df, out_col=out_col)

    def __call__(self, df: DataFrame, **kwargs) -> DataFrame:
        return self.validate(df, **kwargs)

    # -- schema <-> Spark metadata -------------------------------------------

    def to_structtype(self) -> T.StructType:
        """Emit the Spark StructType (reference
        api/pyspark/container.py:163-184)."""
        return T.StructType(
            [
                T.StructField(
                    comp.name, comp.dtype or T.StringType(), comp.nullable
                )
                for comp in self.columns.values()
                if not comp.regex
            ]
        )

    @classmethod
    def from_structtype(
        cls, st: T.StructType, *, name: Optional[str] = None, **kwargs
    ) -> "DataFrameSchema":
        """Inverse of :meth:`to_structtype`: build a dtype+nullable-only
        schema from a Spark StructType (e.g. a parquet footer read
        driver-side — declare a contract from an existing dataset
        without scanning it), ready for checks via
        :meth:`update_column`."""
        from .components import Column

        return cls(
            {
                f.name: Column(f.dataType, nullable=f.nullable)
                for f in st.fields
            },
            name=name,
            **kwargs,
        )

    def to_ddl(self) -> str:
        """Emit a DDL string (reference api/pyspark/container.py:186-195)."""
        return ", ".join(
            f"{comp.name} {dtype_to_ddl(comp.dtype or T.StringType()).upper()}"
            for comp in self.columns.values()
            if not comp.regex
        )

    # -- data synthesis (reference schema.example / schema.strategy) ---------

    def example(self, spark: SparkSession, size: int = 5, seed: int = 42):
        """Small conforming fixture frame (reference
        api/pandas/components.py:176-220)."""
        from .strategies import example as _example

        return _example(self, spark, size=size, seed=seed)

    def synthesize(self, spark: SparkSession, rows: int, seed: int = 42):
        """Cluster-side conforming data generation at any scale."""
        from .strategies import synthesize as _synthesize

        return _synthesize(self, spark, rows=rows, seed=seed)

    # -- mutation helpers (reference dataframe/container.py transforms) ------

    def add_columns(self, extra: dict) -> "DataFrameSchema":
        import copy

        new = copy.deepcopy(self)
        for k, v in extra.items():
            comp = v if isinstance(v, Column) else Column(v)
            if comp.name is None:
                comp.set_name(k)
            new.columns[k] = comp
        return new

    def remove_columns(self, names: list[str]) -> "DataFrameSchema":
        import copy

        new = copy.deepcopy(self)
        for n in names:
            if n not in new.columns:
                raise SchemaInitError(f"column '{n}' not in schema")
            del new.columns[n]
        return new

    def update_column(self, name: str, **kwargs) -> "DataFrameSchema":
        import copy

        if name not in self.columns:
            raise SchemaInitError(f"column '{name}' not in schema")
        new = copy.deepcopy(self)
        props = new.columns[name].properties
        props.update(kwargs)
        dtype = props.pop("dtype")
        comp = Column(dtype, **{k: v for k, v in props.items() if k != "name"})
        comp.set_name(kwargs.get("name", name))
        new.columns[name] = comp
        return new

    def update_columns(self, update_dict: dict[str, dict]) -> "DataFrameSchema":
        """Batch :meth:`update_column`
        (reference api/dataframe/container.py:636)."""
        new = self
        for name, kwargs in update_dict.items():
            new = new.update_column(name, **kwargs)
        return new

    def rename_columns(self, rename_dict: dict[str, str]) -> "DataFrameSchema":
        """Schema with columns renamed, order preserved
        (reference api/dataframe/container.py:725; unknown keys raise)."""
        import copy

        missing = [k for k in rename_dict if k not in self.columns]
        if missing:
            raise SchemaInitError(f"columns {missing} not in schema")
        new = copy.deepcopy(self)
        renamed = {}
        for k, v in new.columns.items():
            nk = rename_dict.get(k, k)
            v.set_name(nk)
            renamed[nk] = v
        new.columns = renamed
        return new

    def select_columns(self, names: list[str]) -> "DataFrameSchema":
        import copy

        new = copy.deepcopy(self)
        new.columns = {k: v for k, v in new.columns.items() if k in names}
        return new

    @property
    def dtypes(self) -> dict:
        """Column name -> declared Spark dtype for non-regex columns
        (reference api/dataframe/container.py:244-263; regex columns need
        :meth:`get_dtypes` with a concrete dataframe)."""
        import warnings

        regex_cols = [n for n, c in self.columns.items() if c.regex]
        if regex_cols:
            warnings.warn(
                "Schema has regex column names: "
                f"{regex_cols}. Use get_dtypes(df) to resolve their "
                "datatypes.",
                UserWarning,
            )
        return {
            n: c.dtype for n, c in self.columns.items() if not c.regex
        }

    def get_dtypes(self, df: DataFrame) -> dict:
        """Like :attr:`dtypes` but expands regex columns against the
        supplied dataframe (reference api/dataframe/container.py:277-300)."""
        out: dict = {}
        for _, comp in self.columns.items():
            for name in comp.matching_columns(list(df.columns)):
                out[name] = comp.dtype
        return out

    def get_metadata(self) -> Optional[dict]:
        """Column- and schema-level metadata, keyed by schema name
        (reference api/dataframe/container.py:265-275)."""
        res: dict = {"columns": {}}
        for k, comp in self.columns.items():
            res["columns"][k] = comp.metadata
        res["dataframe"] = self.metadata
        return {self.name: res}

    def compare(self, other: "DataFrameSchema") -> dict:
        """Structural diff against another schema — the contract-review
        view of an evolution: ``{added, removed, dtype_changed,
        nullability_changed, checks_changed, settings_changed}``.
        Driver-only (pure metadata); pairs with
        :meth:`from_structtype` to diff a contract against a live
        dataset's footer, or two inferred schemas across versions."""
        mine, theirs = self.columns, other.columns
        added = sorted(set(theirs) - set(mine))
        removed = sorted(set(mine) - set(theirs))
        dtype_changed = {}
        nullability_changed = {}
        checks_changed = {}
        for name in sorted(set(mine) & set(theirs)):
            a, b = mine[name], theirs[name]
            if a.dtype != b.dtype:
                dtype_changed[name] = (
                    a.dtype.simpleString() if a.dtype is not None else None,
                    b.dtype.simpleString() if b.dtype is not None else None,
                )
            if a.nullable != b.nullable:
                nullability_changed[name] = (a.nullable, b.nullable)
            ca = sorted(c.error for c in a.checks)
            cb = sorted(c.error for c in b.checks)
            if ca != cb:
                checks_changed[name] = {
                    "removed": sorted(set(ca) - set(cb)),
                    "added": sorted(set(cb) - set(ca)),
                }
        settings_changed = {}
        for attr in ("strict", "ordered", "unique", "coerce",
                     "unique_column_names"):
            va, vb = getattr(self, attr, None), getattr(other, attr, None)
            if va != vb:
                settings_changed[attr] = (va, vb)
        return {
            "added": added,
            "removed": removed,
            "dtype_changed": dtype_changed,
            "nullability_changed": nullability_changed,
            "checks_changed": checks_changed,
            "settings_changed": settings_changed,
        }

    def __repr__(self) -> str:
        return (
            f"<DataFrameSchema {self.name!r} columns={list(self.columns)} "
            f"checks={len(self.checks)}>"
        )

    def __eq__(self, other) -> bool:
        if not isinstance(other, DataFrameSchema):
            return NotImplemented
        return repr(self) == repr(other) and {
            k: repr(v) for k, v in self.columns.items()
        } == {k: repr(v) for k, v in other.columns.items()}
