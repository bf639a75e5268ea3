"""Custom-check registration: ``register_check_method``.

Reference: /root/reference/pandera/api/extensions.py:156-380
(``register_check_method`` with ``statistics`` for serialization and
``check_type`` vectorized/element_wise/groupby), :25-104
(``register_builtin_check`` multiple dispatch).

Spark-native: a registered check function receives the Spark ``Column`` and
the declared statistics, returning a boolean ``Column``.  Registration makes
it available as ``Check.<name>(...)`` AND as a ``Field(<name>=...)`` kwarg.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

from .checks import BUILTIN_CHECK_NAMES, Check
from .errors import SchemaInitError


def register_check_method(
    check_fn: Callable | None = None,
    *,
    name: str | None = None,
    statistics: list[str] | None = None,
    supported_types: tuple | None = None,
    check_type: str = "vectorized",
    error: str | None = None,
):
    """Register a custom check usable as ``Check.<name>`` and
    ``Field(<name>=...)``.

    The function signature is ``fn(col, **statistics) -> Column`` where
    ``col`` is the Spark Column being validated::

        @register_check_method(statistics=["divisor"])
        def divisible_by(col, divisor):
            return (col % divisor) == 0

        Check.divisible_by(3)
        Field(divisible_by=3)
    """

    def deco(fn):
        check_name = name or fn.__name__
        if hasattr(Check, check_name) and check_name in BUILTIN_CHECK_NAMES:
            raise SchemaInitError(
                f"check '{check_name}' is already registered"
            )
        stat_names = statistics or [
            p
            for p in list(inspect.signature(fn).parameters)[1:]
            if p not in ("kwargs",)
        ]

        def factory(cls_or_value=None, *args, **kwargs):
            # support both Check.name(v1, v2) and Field(name=v) paths
            values = []
            if cls_or_value is not None and cls_or_value is not Check:
                values.append(cls_or_value)
            values.extend(args)
            stats = dict(zip(stat_names, values))
            for k in list(kwargs):
                if k in stat_names:
                    stats[k] = kwargs.pop(k)
            missing = [s for s in stat_names if s not in stats]
            if missing:
                raise SchemaInitError(
                    f"check '{check_name}' missing statistics {missing}"
                )
            label = error or (
                f"{check_name}({', '.join(repr(stats[s]) for s in stat_names)})"
            )
            label = kwargs.pop("error", None) or label
            return Check(
                lambda col: fn(col, **stats),
                name=check_name,
                error=label,
                statistics=stats,
                accepted_dtypes=supported_types,
                **kwargs,
            )

        def classmethod_factory(cls, *args, **kwargs):
            return factory(*args, **kwargs)

        setattr(Check, check_name, classmethod(classmethod_factory))
        BUILTIN_CHECK_NAMES[check_name] = factory
        fn.__check_name__ = check_name
        return fn

    if check_fn is not None:
        return deco(check_fn)
    return deco


def unregister_check_method(name: str) -> None:
    """Remove a registered custom check (test hygiene)."""
    if name in BUILTIN_CHECK_NAMES:
        del BUILTIN_CHECK_NAMES[name]
    if hasattr(Check, name):
        delattr(Check, name)
