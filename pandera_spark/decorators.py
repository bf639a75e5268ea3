"""Pipeline-integration decorators: check_input / check_output / check_io /
check_types.

Reference: /root/reference/pandera/decorators.py:153-290 (check_input),
:293-430 (check_output), :433-524 (check_io), :527 ff. (check_types with
``DataFrame[Model]`` annotations, typing/pyspark_sql.py:57).

All engine-independent: they resolve the target argument, call
``schema.validate``, and pass through.  Async functions are supported for
check_types (the reference handles coroutines; decorators.py:560 ff.).
"""

from __future__ import annotations

import functools
import inspect
import typing
from typing import Any, Callable, Optional, Union

from pyspark.sql import DataFrame

from .container import DataFrameSchema
from .errors import SchemaInitError
from .model import DataFrameModel


def _resolve_schema(s) -> DataFrameSchema:
    if isinstance(s, DataFrameSchema):
        return s
    if inspect.isclass(s) and issubclass(s, DataFrameModel):
        return s.to_schema()
    raise SchemaInitError(f"expected DataFrameSchema or DataFrameModel, got {s!r}")


def _get_arg(obj_getter, args: tuple, kwargs: dict, sig: inspect.Signature):
    """Locate the target argument (reference decorators.py:175-220)."""
    if obj_getter is None:
        if args:
            return ("pos", 0), args[0]
        first = next(iter(sig.parameters))
        return ("kw", first), kwargs[first]
    if isinstance(obj_getter, int):
        return ("pos", obj_getter), args[obj_getter]
    if isinstance(obj_getter, str):
        if obj_getter in kwargs:
            return ("kw", obj_getter), kwargs[obj_getter]
        names = list(sig.parameters)
        idx = names.index(obj_getter)
        return ("pos", idx), args[idx]
    raise SchemaInitError(f"invalid obj_getter {obj_getter!r}")


def check_input(
    schema, obj_getter: Optional[Union[int, str]] = None, **validate_kwargs
) -> Callable:
    """Validate an input argument before the function runs."""
    schema = _resolve_schema(schema)

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            loc, df = _get_arg(obj_getter, args, kwargs, sig)
            validated = schema.validate(df, **validate_kwargs)
            kind, key = loc
            if kind == "pos":
                args2 = list(args)
                args2[key] = validated
                return fn(*args2, **kwargs)
            kwargs[key] = validated
            return fn(*args, **kwargs)

        return wrapper

    return deco


def check_output(schema, obj_getter=None, **validate_kwargs) -> Callable:
    """Validate the return value (``obj_getter``: int index into a tuple
    return, or callable extracting the DF — reference decorators.py:293-430)."""
    schema = _resolve_schema(schema)

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            out = fn(*args, **kwargs)
            if obj_getter is None:
                target = out
            elif isinstance(obj_getter, int):
                target = out[obj_getter]
            elif callable(obj_getter):
                target = obj_getter(out)
            else:
                raise SchemaInitError(f"invalid obj_getter {obj_getter!r}")
            schema.validate(target, **validate_kwargs)
            return out

        return wrapper

    return deco


def check_io(out=None, **input_schemas) -> Callable:
    """Validate multiple inputs and the output
    (reference decorators.py:433-524)."""

    def deco(fn):
        wrapped = fn
        for argname, schema in input_schemas.items():
            wrapped = check_input(schema, argname)(wrapped)
        if out is not None:
            if isinstance(out, (list, tuple)) and not isinstance(
                out, DataFrameSchema
            ):
                for item in out:
                    getter, schema = (
                        item if isinstance(item, tuple) else (None, item)
                    )
                    wrapped = check_output(schema, getter)(wrapped)
            else:
                wrapped = check_output(out)(wrapped)
        return functools.wraps(fn)(wrapped)

    return deco


def check_types(fn=None, **validate_kwargs) -> Callable:
    """Validate from type annotations: parameters / return values annotated
    ``DataFrame[Model]`` (our typing generic) or a DataFrameModel subclass
    are validated automatically (reference decorators.py:527 ff.)."""

    def deco(f):
        sig = inspect.signature(f)
        try:
            hints = typing.get_type_hints(f)
        except Exception:
            hints = dict(getattr(f, "__annotations__", {}))

        param_models: dict[str, type] = {}
        for pname in sig.parameters:
            anno = hints.get(pname)
            model = _extract_model(anno)
            if model is not None:
                param_models[pname] = model
        return_model = _extract_model(hints.get("return"))

        if inspect.iscoroutinefunction(f):

            @functools.wraps(f)
            async def awrapper(*args, **kwargs):
                bound = sig.bind(*args, **kwargs)
                for pname, model in param_models.items():
                    if pname in bound.arguments:
                        bound.arguments[pname] = model.to_schema().validate(
                            _apply_from_format(
                                model, bound.arguments[pname]
                            ),
                            **validate_kwargs,
                        )
                out = await f(*bound.args, **bound.kwargs)
                if return_model is not None:
                    return_model.to_schema().validate(out, **validate_kwargs)
                    out = _apply_to_format(return_model, out)
                return out

            return awrapper

        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            for pname, model in param_models.items():
                if pname in bound.arguments:
                    bound.arguments[pname] = model.to_schema().validate(
                        _apply_from_format(model, bound.arguments[pname]),
                        **validate_kwargs,
                    )
            out = f(*bound.args, **bound.kwargs)
            if return_model is not None:
                return_model.to_schema().validate(out, **validate_kwargs)
                out = _apply_to_format(return_model, out)
            return out

        return wrapper

    if fn is not None and callable(fn):
        return deco(fn)
    return deco


_READ_FORMATS = ("parquet", "csv", "json", "orc")


def _model_cfg(model, attr, default=None):
    cfg = getattr(model, "Config", None)
    return getattr(cfg, attr, default) if cfg is not None else default


def _apply_from_format(model, value):
    """Reference ``BaseModelConfig.from_format`` (model_config.py:43-49),
    re-expressed Spark-first: when a ``DataFrame[Model]`` argument arrives
    as a PATH string and the model declares ``from_format``, read it with
    the model's own StructType (typed scan — no inference pass) before
    validation.  A callable ``from_format`` receives the raw value."""
    fmt = _model_cfg(model, "from_format")
    if fmt is None or isinstance(value, DataFrame):
        return value
    if callable(fmt):
        return fmt(value)
    fmt = str(fmt).lower()
    if fmt == "dict":
        # reference Format.dict (typing/formats.py): literal rows ->
        # frame; Spark-natively a list of dicts/tuples typed by the
        # model's StructType
        if isinstance(value, (list, tuple)):
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise SchemaInitError(
                    "from_format conversion needs an active SparkSession"
                )
            return spark.createDataFrame(
                list(value), model.to_schema().to_structtype()
            )
        return value
    if not isinstance(value, str):
        return value
    if fmt not in _READ_FORMATS:
        raise SchemaInitError(
            f"unsupported from_format {fmt!r}: use one of "
            f"{_READ_FORMATS} or a callable"
        )
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise SchemaInitError(
            "from_format conversion needs an active SparkSession"
        )
    kwargs = dict(_model_cfg(model, "from_format_kwargs") or {})
    from . import sources

    if fmt == "parquet":
        return sources.read_parquet(spark, value, **kwargs)
    if fmt == "csv":
        return sources.read_csv(spark, value, model.to_schema(), **kwargs)
    if fmt == "json":
        return sources.read_json(spark, value, model.to_schema(), **kwargs)
    return sources.read_orc(spark, value, model.to_schema(), **kwargs)


def _apply_to_format(model, df):
    """Reference ``BaseModelConfig.to_format`` (model_config.py:54-64):
    after output validation, materialize the result.  Spark-first
    reading of the contract: write to the ``to_format_buffer`` path in
    the declared format (mode via ``to_format_kwargs['mode']``) and hand
    the DataFrame back to the caller (a distributed result has no
    in-memory serialized form to return).  A callable ``to_format``
    receives the validated frame and its return value is passed
    through."""
    fmt = _model_cfg(model, "to_format")
    if fmt is None:
        return df
    if callable(fmt):
        return fmt(df)
    fmt = str(fmt).lower()
    if fmt not in _READ_FORMATS:
        raise SchemaInitError(
            f"unsupported to_format {fmt!r}: use one of "
            f"{_READ_FORMATS} or a callable"
        )
    buffer = _model_cfg(model, "to_format_buffer")
    if callable(buffer):
        buffer = buffer()
    if not buffer:
        raise SchemaInitError(
            "to_format needs to_format_buffer (the target path)"
        )
    kwargs = dict(_model_cfg(model, "to_format_kwargs") or {})
    mode = kwargs.pop("mode", "error")
    df.write.mode(mode).options(**kwargs).format(fmt).save(buffer)
    return df


def _extract_model(anno) -> Optional[type]:
    """Pull a DataFrameModel out of an annotation: the model class itself or
    ``typing_mod.DataFrame[Model]``."""
    if anno is None:
        return None
    if inspect.isclass(anno) and issubclass(anno, DataFrameModel):
        return anno
    args = typing.get_args(anno)
    for a in args:
        if inspect.isclass(a) and issubclass(a, DataFrameModel):
            return a
    return None
