"""Mypy plugin: static typing for DataFrameModel column references.

Parity surface for the reference plugin (/root/reference/pandera/mypy.py),
re-scoped to this engine's API.  The reference plugin does three jobs:

1. type DataFrameModel field class attributes as ``str``
   (reference mypy.py:205-212, set_field_type_to_str) — at runtime a
   field access like ``Lineitem.l_orderkey`` resolves to the column
   name (alias-aware), so expressions can write
   ``F.col(Lineitem.l_orderkey)`` typo-safely;
2. erase ``Series[...]``/``Index[...]`` generic args so subclasses can
   re-type fields (reference mypy.py:180-203) — N/A here: our fields
   are annotated with dtype specs (strings / pyspark types), not
   generic Series containers, so there is nothing to erase;
3. loosen pandas-stubs signatures (reference mypy.py:70-86) — N/A:
   pyspark ships its own inline annotations.

Only job 1 applies, and this module implements it for
``pandera_spark.model.DataFrameModel`` subclasses.  ``DataFrame[Model]``
(pandera_spark/typing.py) needs no plugin help: it is an ordinary
``Generic[T]`` subclass mypy already understands.

Usage (mypy.ini / pyproject.toml)::

    [mypy]
    plugins = pandera_spark.mypy

This module is imported BY mypy, never by the engine, so the mypy
dependency stays optional (import-guarded test:
tests/test_model_api.py::test_mypy_plugin_types_fields_as_str).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable, Optional

from mypy.nodes import TypeInfo, Var
from mypy.plugin import AttributeContext, Plugin

if TYPE_CHECKING:  # pragma: no cover
    from mypy.types import Instance

DATAFRAMEMODEL_FULLNAMES = {
    "pandera_spark.model.DataFrameModel",
    "pandera_spark.DataFrameModel",
}

#: class-body names that are never column fields
_NON_FIELD_ATTRS = {"Config"}


def plugin(version: str):
    """Mypy plugin entrypoint (the name mypy's loader looks up)."""
    return PanderaSparkPlugin


class PanderaSparkPlugin(Plugin):
    """Types DataFrameModel field attributes as ``str`` (column names),
    matching the runtime FieldInfo descriptor (model.py:FieldInfo.__get__).
    """

    def get_class_attribute_hook(
        self, fullname: str
    ) -> Optional[Callable[[AttributeContext], "Instance"]]:
        if self._is_model_field_attribute(fullname):
            return self._field_attr_callback
        return None

    def get_attribute_hook(
        self, fullname: str
    ) -> Optional[Callable[[AttributeContext], "Instance"]]:
        if self._is_model_field_attribute(fullname):
            return self._field_attr_callback
        return None

    def _is_model_field_attribute(self, fullname: str) -> bool:
        class_fullname, _, attr_name = fullname.rpartition(".")
        if not class_fullname or not attr_name:
            return False
        if attr_name.startswith("_") or attr_name in _NON_FIELD_ATTRS:
            return False
        sym = self.lookup_fully_qualified(class_fullname)
        if not sym or not isinstance(sym.node, TypeInfo):
            return False
        info = sym.node
        if not any(
            base.fullname in DATAFRAMEMODEL_FULLNAMES for base in info.mro
        ):
            return False
        attr_sym = info.names.get(attr_name)
        return bool(attr_sym and isinstance(attr_sym.node, Var))

    @staticmethod
    def _field_attr_callback(ctx: AttributeContext) -> "Instance":
        return ctx.api.named_generic_type("builtins.str", [])
