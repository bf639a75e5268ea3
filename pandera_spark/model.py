"""``DataFrameModel`` — class/annotation-based schema API.

Reference: /root/reference/pandera/api/dataframe/model.py:256 (subclass
collection :279-303,423-632), Field + check dispatch
api/dataframe/model_components.py:114-284, ``@check``/``@dataframe_check``
:287-313, pyspark variant api/pyspark/model.py:113-150 and
``_build_columns`` :243-303.

Pure metadata layer: ``to_schema()`` builds a cached
:class:`~pandera_spark.container.DataFrameSchema`; validation delegates to the
single-pass backend.
"""

from __future__ import annotations

import inspect
from typing import Any, ClassVar, Optional, get_type_hints

from pyspark.sql import DataFrame

from .checks import BUILTIN_CHECK_NAMES, Check
from .components import Column
from .container import DataFrameSchema
from .errors import SchemaInitError
from .parsers import Parser

# optional pydantic integration (reference api/dataframe/model.py:677-707
# gates the same way on PYDANTIC_V2); the engine never requires pydantic
try:  # pragma: no cover - exercised via tests/test_pydantic.py
    import pydantic as _pydantic

    _PYDANTIC_V2 = int(_pydantic.VERSION.split(".")[0]) >= 2
    _PYDANTIC_V1 = not _PYDANTIC_V2
    if _PYDANTIC_V2:
        from pydantic_core import core_schema as _pyd_core_schema
    else:
        _pyd_core_schema = None
except ImportError:  # pragma: no cover
    _pydantic = None
    _pyd_core_schema = None
    _PYDANTIC_V2 = _PYDANTIC_V1 = False

#: checks taking no statistic — dispatched from Field(...) as flags
_FLAG_CHECKS = {"array_no_nulls", "array_finite"}

_FIELD_KWARGS = {
    "nullable", "unique", "coerce", "required", "regex", "default",
    "alias", "title", "description", "metadata",
}


class FieldInfo:
    """Metadata carrier produced by :func:`Field`
    (reference api/dataframe/model_components.py:60-111).

    Also a descriptor: class-level access on a DataFrameModel resolves
    to the COLUMN NAME string (``Lineitem.l_orderkey == "l_orderkey"``,
    alias-aware) so models double as typo-safe column references in
    expressions — the reference behavior its mypy plugin types as
    ``str`` (reference mypy.py:set_field_type_to_str).  Schema
    construction reads the raw FieldInfo via ``inspect.getattr_static``.
    """

    def __init__(self, *, checks: list[Check], **kwargs: Any):
        self.checks = checks
        self.nullable = kwargs.get("nullable", True)
        self.unique = kwargs.get("unique", False)
        self.coerce = kwargs.get("coerce", False)
        self.required = kwargs.get("required", True)
        self.regex = kwargs.get("regex", False)
        self.default = kwargs.get("default")
        self.alias = kwargs.get("alias")
        self.title = kwargs.get("title")
        self.description = kwargs.get("description")
        self.metadata = kwargs.get("metadata")
        self._field_name: Optional[str] = None

    def __set_name__(self, owner, name: str) -> None:
        self._field_name = name

    def __get__(self, obj, objtype=None):
        if self._field_name is None:
            return self  # unbound (not assigned in a class body)
        return self.alias or self._field_name


def Field(**kwargs: Any) -> FieldInfo:
    """Declare column properties + built-in checks on an annotated field.

    Check kwargs dispatch to ``Check.<name>`` constructors (reference
    ``_check_dispatch``, api/dataframe/model_components.py:114-284), e.g.
    ``Field(gt=5, isin=[1,2,3], nullable=False)``.
    """
    checks: list[Check] = []
    col_kwargs: dict[str, Any] = {}
    for key, value in kwargs.items():
        if key in _FIELD_KWARGS:
            col_kwargs[key] = value
        elif key in BUILTIN_CHECK_NAMES:
            factory = BUILTIN_CHECK_NAMES[key]
            if isinstance(value, dict):
                checks.append(factory(**value))
            elif key in ("in_range", "between") and isinstance(
                value, (tuple, list)
            ):
                checks.append(factory(*value))
            elif value is True and key in _FLAG_CHECKS:
                # statistic-less checks use the flag form, e.g.
                # Field(array_no_nulls=True)
                checks.append(factory())
            else:
                checks.append(factory(value))
        else:
            raise SchemaInitError(
                f"unknown Field argument {key!r} — not a column property or "
                f"registered check"
            )
    return FieldInfo(checks=checks, **col_kwargs)


class _MethodCheck:
    """Marker wrapping an @check / @dataframe_check classmethod."""

    def __init__(self, fn, fields: tuple[str, ...], is_dataframe: bool,
                 **check_kwargs):
        self.fn = fn
        self.fields = fields
        self.is_dataframe = is_dataframe
        self.check_kwargs = check_kwargs


def check(*fields: str, **check_kwargs):
    """Register a model method as a column check
    (reference api/dataframe/model_components.py:287-313).

    The method receives the Spark Column and returns a boolean Column:

        @check("price")
        def price_positive(cls, col): return col > 0
    """

    def deco(fn):
        return _MethodCheck(fn, fields, is_dataframe=False, **check_kwargs)

    return deco


def dataframe_check(fn=None, **check_kwargs):
    """Register a model method as a dataframe-level check; receives the
    DataFrame and returns a boolean Column."""

    def deco(f):
        return _MethodCheck(f, (), is_dataframe=True, **check_kwargs)

    if fn is not None and callable(fn):
        return deco(fn)
    return deco


def parser(*fields: str):
    """Register a model method as a column parser (pre-check transform)."""

    def deco(fn):
        fn.__pandera_parser_fields__ = fields
        return fn

    return deco


def dataframe_parser(fn):
    fn.__pandera_df_parser__ = True
    return fn


class DataFrameModel:
    """Subclass with annotated fields:

        class Lineitem(DataFrameModel):
            l_orderkey: "bigint" = Field(gt=0, nullable=False)
            l_returnflag: str = Field(isin=["A", "N", "R"])

            class Config:
                unique = ["l_orderkey", "l_linenumber"]
                strict = True
    """

    Config: ClassVar[type]
    _schema_cache: ClassVar[Optional[DataFrameSchema]] = None

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        cls._schema_cache = None

    # -- schema construction --------------------------------------------------

    @classmethod
    def to_schema(cls) -> DataFrameSchema:
        """Build (and cache) the DataFrameSchema
        (reference api/dataframe/model.py:345-352)."""
        if cls._schema_cache is not None:
            return cls._schema_cache

        try:
            hints = get_type_hints(cls)
        except Exception:
            # dtype-alias annotations ("bigint") are not resolvable
            # forward refs; collect raw annotations across the MRO
            # (base first, like get_type_hints does)
            hints = {}
            for klass in reversed(cls.__mro__):
                hints.update(getattr(klass, "__annotations__", {}))

        base_annotations = set(getattr(DataFrameModel, "__annotations__", {}))
        columns: dict[str, Column] = {}
        for fname, anno in hints.items():
            if fname.startswith("_") or fname in base_annotations:
                continue
            if "ClassVar" in str(anno):
                continue
            # static lookup: plain getattr would trigger the FieldInfo
            # descriptor and hand back the column-name string
            field_attr = inspect.getattr_static(cls, fname, None)
            field: Optional[FieldInfo] = (
                field_attr if isinstance(field_attr, FieldInfo) else None
            )
            if field_attr is not None and field is None:
                continue  # plain class attr, not a field
            if isinstance(anno, str):
                dtype_spec: Any = anno
            else:
                dtype_spec = anno
            info = field or FieldInfo(checks=[])
            name = info.alias or fname
            columns[name] = Column(
                dtype_spec,
                checks=list(info.checks),
                nullable=info.nullable,
                unique=info.unique,
                coerce=info.coerce,
                required=info.required,
                name=name,
                regex=info.regex,
                default=info.default,
                title=info.title,
                description=info.description,
                metadata=info.metadata,
            )

        df_checks: list[Check] = []
        parsers_by_col: dict[str, list[Parser]] = {}
        df_parsers: list[Parser] = []
        for attr_name in dir(cls):
            attr = inspect.getattr_static(cls, attr_name)
            if isinstance(attr, _MethodCheck):
                fn = attr.fn
                if isinstance(fn, classmethod):
                    fn = fn.__func__
                if attr.is_dataframe:
                    df_checks.append(
                        Check(
                            (lambda f: lambda df: f(cls, df))(fn),
                            name=attr_name,
                            error=attr.check_kwargs.get("error", attr_name),
                            **{
                                k: v
                                for k, v in attr.check_kwargs.items()
                                if k != "error"
                            },
                        )
                    )
                else:
                    for fld in attr.fields:
                        target = None
                        for col in columns.values():
                            if col.name == fld:
                                target = col
                        if target is None:
                            raise SchemaInitError(
                                f"@check refers to unknown field {fld!r}"
                            )
                        target.checks.append(
                            Check(
                                (lambda f: lambda c: f(cls, c))(fn),
                                name=attr_name,
                                error=attr.check_kwargs.get(
                                    "error", attr_name
                                ),
                                **{
                                    k: v
                                    for k, v in attr.check_kwargs.items()
                                    if k != "error"
                                },
                            )
                        )
            else:
                raw = attr.__func__ if isinstance(attr, classmethod) else attr
                if hasattr(raw, "__pandera_parser_fields__"):
                    for fld in raw.__pandera_parser_fields__:
                        parsers_by_col.setdefault(fld, []).append(
                            Parser(
                                (lambda f: lambda c: f(cls, c))(raw),
                                name=attr_name,
                            )
                        )
                elif hasattr(raw, "__pandera_df_parser__"):
                    df_parsers.append(
                        Parser(
                            (lambda f: lambda d: f(cls, d))(raw),
                            name=attr_name,
                        )
                    )

        for fld, ps in parsers_by_col.items():
            for col in columns.values():
                if col.name == fld:
                    col.parsers.extend(ps)

        cfg = getattr(cls, "Config", None)
        cfg_get = lambda k, d=None: getattr(cfg, k, d) if cfg else d

        schema = DataFrameSchema(
            columns,
            checks=df_checks,
            parsers=df_parsers,
            coerce=cfg_get("coerce", False),
            strict=cfg_get("strict", False),
            ordered=cfg_get("ordered", False),
            unique=cfg_get("unique"),
            report_duplicates=cfg_get("report_duplicates", "all"),
            unique_column_names=cfg_get("unique_column_names", False),
            add_missing_columns=cfg_get("add_missing_columns", False),
            drop_invalid_rows=cfg_get("drop_invalid_rows", False),
            name=cfg_get("name", cls.__name__),
            title=cfg_get("title"),
            description=cfg_get("description", cls.__doc__),
        )
        cls._schema_cache = schema
        return schema

    @classmethod
    def get_metadata(cls) -> dict | None:
        """Column- and schema-level metadata keyed by schema name
        (reference api/dataframe/model.py:633-645 shape:
        ``{name: {"columns": {col: metadata}, "dataframe": Config.metadata}}``
        )."""
        schema = cls.to_schema()
        res = {
            "columns": {
                name: col.metadata for name, col in schema.columns.items()
            },
            "dataframe": getattr(
                getattr(cls, "Config", None), "metadata", None
            ),
        }
        return {schema.name: res}

    # -- validation -----------------------------------------------------------

    @classmethod
    def validate(
        cls,
        df: DataFrame,
        head: Optional[int] = None,
        sample: Optional[float] = None,
        random_state: Optional[int] = None,
        lazy: bool = True,
        inplace: bool = False,
    ) -> DataFrame:
        return cls.to_schema().validate(
            df, head=head, sample=sample, random_state=random_state, lazy=lazy
        )

    @classmethod
    def validate_result(cls, df: DataFrame, **kwargs):
        return cls.to_schema().validate_result(df, **kwargs)

    # -- interchange ----------------------------------------------------------

    @classmethod
    def to_structtype(cls):
        """reference api/pyspark/model.py:227-234"""
        return cls.to_schema().to_structtype()

    @classmethod
    def to_ddl(cls) -> str:
        """reference api/pyspark/model.py:236-242"""
        return cls.to_schema().to_ddl()

    @classmethod
    def to_yaml(cls) -> str:
        from .io import schema_to_yaml

        return schema_to_yaml(cls.to_schema())

    @classmethod
    def to_json_schema(cls) -> dict:
        """reference api/dataframe/model.py:669"""
        schema = cls.to_schema()
        props = {}
        for col in schema.columns.values():
            props[col.name] = {
                "type": (
                    col.dtype.simpleString() if col.dtype else "string"
                ),
                "nullable": col.nullable,
            }
        return {
            "title": schema.name,
            "type": "object",
            "properties": props,
            "required": [
                c.name for c in schema.columns.values() if c.required
            ],
        }

    # -- pydantic integration --------------------------------------------------

    @classmethod
    def pydantic_validate(cls, schema_model: Any) -> "type[DataFrameModel]":
        """Verify that the input is a compatible dataframe model
        (reference api/dataframe/model.py:648-666: a ``DataFrameModel``
        subclass is usable as a pydantic FIELD TYPE whose value is the
        model class itself — same error strings, same subclass rule,
        same SchemaInitError -> ValueError fold)."""
        if not inspect.isclass(schema_model):
            raise TypeError(
                f"{schema_model} is not a pandera.DataFrameModel"
            )
        if not issubclass(schema_model, cls):
            raise TypeError(f"{schema_model} does not inherit {cls}.")
        try:
            schema_model.to_schema()
        except SchemaInitError as exc:
            raise ValueError(
                f"Cannot use {cls} as a pydantic type as its "
                "DataFrameModel cannot be converted to a DataFrameSchema.\n"
                f"Please revisit the model to address the following errors:"
                f"\n{exc}"
            ) from exc
        return schema_model

    if _PYDANTIC_V2:

        @classmethod
        def __get_pydantic_core_schema__(
            cls, _source_type: Any, _handler: Any
        ):
            """reference api/dataframe/model.py:681-687 — a plain
            no-info validator around :meth:`pydantic_validate`."""
            return _pyd_core_schema.no_info_plain_validator_function(
                cls.pydantic_validate,
            )

        @classmethod
        def __get_pydantic_json_schema__(cls, _core_schema, _handler):
            """Documented divergence from the reference (api/dataframe/
            model.py:689-696): the reference's pyspark model cannot
            emit a pydantic json-schema at all (its handler raises
            ``PydanticInvalidForJsonSchema`` on the plain-validator
            core schema and its ``to_json_schema`` is
            ``NotImplementedError``).  Ours returns the model's real
            :meth:`to_json_schema` — strictly more informative."""
            return dict(cls.to_json_schema())

    elif _PYDANTIC_V1:

        @classmethod
        def __modify_schema__(cls, field_schema):
            """reference api/dataframe/model.py:700-703 (pydantic v1)"""
            field_schema.update(cls.to_json_schema())

        @classmethod
        def __get_validators__(cls):
            """reference api/dataframe/model.py:705-707 (pydantic v1)"""
            yield cls.pydantic_validate
