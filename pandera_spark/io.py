"""Schema serialization: yaml / json / python-script round-trips.

Format-compatible with the reference pyspark IO layer
(/root/reference/pandera/io/pyspark_sql_io.py:106-332 serialize/deserialize;
API api/pyspark/container.py:197-231): a dict with ``schema_type``,
``version``, ``columns`` (each with dtype/nullable/checks/coerce/required/
regex), container ``checks`` and container flags.  Check statistics collapse
to a scalar when there is a single statistic, matching the reference
(``_serialize_check_stats``, pyspark_sql_io.py:27-63).
"""

from __future__ import annotations

import datetime
import json
from typing import Any

from .checks import BUILTIN_CHECK_NAMES, Check
from .components import Column
from .container import DataFrameSchema
from .errors import SchemaDefinitionError

DATETIME_FORMAT = "%Y-%m-%d %H:%M:%S"


def _serialize_stat(v: Any) -> Any:
    if isinstance(v, datetime.datetime):
        return v.strftime(DATETIME_FORMAT)
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, frozenset):
        return sorted(v)
    if isinstance(v, (set, tuple)):
        return list(v)
    return v


def _check_options(check: Check) -> dict:
    """Non-default check options, serialized alongside the statistics in
    the reference's ``options`` sub-dict shape (io/pyspark_sql_io.py:44-59)
    — without these, ignore_na/raise_warning (which change semantics) and
    custom error labels would not survive a round-trip."""
    opts: dict[str, Any] = {}
    if check.error and check.error != check.name:
        opts["error"] = check.error
    if check.ignore_na is not True:
        opts["ignore_na"] = check.ignore_na
    if check.raise_warning:
        opts["raise_warning"] = True
    if check.n_failure_cases is not None:
        opts["n_failure_cases"] = check.n_failure_cases
    if check.title:
        opts["title"] = check.title
    if check.description:
        opts["description"] = check.description
    return opts


def _serialize_check(check: Check) -> tuple[str, Any] | None:
    if check.name not in BUILTIN_CHECK_NAMES:
        return None  # custom lambdas are not serializable (same as reference)
    if not check.statistics:
        # statistic-less builtins (array_no_nulls, array_finite):
        # serialize as an (empty) options dict — NOT a bare scalar,
        # which would collide with single-stat checks whose value is a
        # boolean (e.g. equal_to(True) serializes to bare True)
        options = _check_options(check)
        return check.name, ({"options": options} if options else {})
    stats = {k: _serialize_stat(v) for k, v in check.statistics.items()}
    options = _check_options(check)
    if len(stats) == 1:
        value = next(iter(stats.values()))
        if options:
            return check.name, {"value": value, "options": options}
        return check.name, value
    if options:
        stats["options"] = options
    return check.name, stats


def _serialize_column(col: Column) -> dict:
    checks = {}
    for c in col.checks:
        ser = _serialize_check(c)
        if ser is not None:
            checks[ser[0]] = ser[1]
    return {
        "title": col.title,
        "description": col.description,
        "dtype": col.dtype.simpleString() if col.dtype is not None else None,
        "nullable": col.nullable,
        "checks": checks or None,
        "unique": col.unique,
        "coerce": col.coerce,
        "required": col.required,
        "regex": col.regex,
    }


def serialize_schema(schema: DataFrameSchema) -> dict:
    container_checks = {}
    for c in schema.checks:
        ser = _serialize_check(c)
        if ser is not None:
            container_checks[ser[0]] = ser[1]
    return {
        # the reference pyspark io asserts this exact tag
        # (io/pyspark_sql_io.py:237); our loader accepts any
        "schema_type": "pyspark_sql_dataframe",
        "version": "pandera_spark-0.1",
        "columns": {
            name: _serialize_column(col)
            for name, col in schema.columns.items()
        },
        "checks": container_checks or None,
        "name": schema.name,
        "ordered": schema.ordered,
        "unique": schema.unique,
        "report_duplicates": schema.report_duplicates,
        "unique_column_names": schema.unique_column_names,
        "coerce": schema.coerce,
        "strict": schema.strict,
        "add_missing_columns": schema.add_missing_columns,
        "drop_invalid_rows": schema.drop_invalid_rows,
    }


def _deserialize_checks(checks: dict | None) -> list[Check]:
    out: list[Check] = []
    for name, stats in (checks or {}).items():
        factory = BUILTIN_CHECK_NAMES.get(name)
        if factory is None:
            raise SchemaDefinitionError(f"unknown check in schema file: {name}")
        options: dict = {}
        if isinstance(stats, dict):
            stats = dict(stats)
            options = stats.pop("options", {}) or {}
            options.pop("check_name", None)  # reference lookup key, not ours
            if set(stats) == {"value"}:
                stats = stats["value"]  # single-stat-with-options shape
        if isinstance(stats, dict):
            out.append(factory(**stats, **options))
        elif name in ("in_range", "between") and isinstance(stats, list):
            out.append(factory(*stats, **options))
        else:
            out.append(factory(stats, **options))
    return out


def deserialize_schema(obj: dict) -> DataFrameSchema:
    columns = {}
    for name, cs in (obj.get("columns") or {}).items():
        columns[name] = Column(
            cs.get("dtype"),
            checks=_deserialize_checks(cs.get("checks")),
            nullable=cs.get("nullable", True),
            unique=cs.get("unique", False),
            coerce=cs.get("coerce", False),
            required=cs.get("required", True),
            regex=cs.get("regex", False),
            name=name,
            title=cs.get("title"),
            description=cs.get("description"),
        )
    return DataFrameSchema(
        columns,
        checks=_deserialize_checks(obj.get("checks")) or None,
        name=obj.get("name"),
        ordered=obj.get("ordered", False),
        unique=obj.get("unique"),
        report_duplicates=obj.get("report_duplicates", "all"),
        unique_column_names=obj.get("unique_column_names", False),
        coerce=obj.get("coerce", False),
        strict=obj.get("strict", False),
        add_missing_columns=obj.get("add_missing_columns", False),
        drop_invalid_rows=obj.get("drop_invalid_rows", False),
    )


# -- entry points (reference api/pyspark/container.py:197-231) ---------------


def schema_to_yaml(schema: DataFrameSchema) -> str:
    import yaml

    return yaml.safe_dump(
        serialize_schema(schema), sort_keys=False, default_flow_style=False
    )


def schema_from_yaml(text: str) -> DataFrameSchema:
    import yaml

    return deserialize_schema(yaml.safe_load(text))


def schema_to_json(schema: DataFrameSchema, **kwargs) -> str:
    return json.dumps(serialize_schema(schema), **kwargs)


def schema_from_json(text: str) -> DataFrameSchema:
    return deserialize_schema(json.loads(text))


def schema_to_script(schema: DataFrameSchema) -> str:
    """Emit Python source reconstructing the schema
    (reference io/pandas_io.py:738-869)."""
    lines = [
        "from pyspark.sql import types as T",
        "import pandera_spark as ps",
        "",
        "schema = ps.DataFrameSchema(",
        "    columns={",
    ]
    def render_check(c: Check) -> str | None:
        ser = _serialize_check(c)
        if ser is None:
            return None
        cname, payload = ser
        # normalize the three serialized shapes back to (args, kwargs):
        # scalar | {"value":..., "options":...} | multi-stat dict [+options]
        if isinstance(payload, dict) and set(payload) == {"value", "options"}:
            args, kw = [payload["value"]], dict(payload["options"])
        elif isinstance(payload, dict):
            kw = dict(payload)
            kw.update(kw.pop("options", {}))
            args = []
        else:
            args, kw = [payload], {}
        parts = [f"{a!r}" for a in args] + [
            f"{k}={v!r}" for k, v in kw.items()
        ]
        return f"ps.Check.{cname}(" + ", ".join(parts) + ")"

    for name, col in schema.columns.items():
        checks_src = [s for s in map(render_check, col.checks) if s]
        checks_repr = "[" + ", ".join(checks_src) + "]"
        dtype_repr = (
            f"{col.dtype.simpleString()!r}" if col.dtype is not None else None
        )
        lines.append(
            f"        {name!r}: ps.Column({dtype_repr}, checks={checks_repr}, "
            f"nullable={col.nullable}, unique={col.unique}, "
            f"coerce={col.coerce}, required={col.required}, "
            f"regex={col.regex}),"
        )
    lines += [
        "    },",
        f"    name={schema.name!r},",
        f"    strict={schema.strict!r}," if schema.strict is not True else
        f"    strict=True,",
        f"    unique={schema.unique!r},",
        f"    report_duplicates={schema.report_duplicates!r},",
        f"    unique_column_names={schema.unique_column_names},",
        f"    add_missing_columns={schema.add_missing_columns},",
        f"    drop_invalid_rows={schema.drop_invalid_rows},",
        f"    coerce={schema.coerce},",
        f"    ordered={schema.ordered},",
        ")",
    ]
    return "\n".join(lines)


def from_frictionless_schema(spec: dict) -> DataFrameSchema:
    """Frictionless table-schema dict -> DataFrameSchema
    (reference io/pandas_io.py:871-1148, field subset: name/type/constraints).
    """
    type_map = {
        "integer": "bigint",
        "number": "double",
        "string": "string",
        "boolean": "boolean",
        "date": "date",
        "datetime": "timestamp",
        "year": "int",
    }
    columns: dict[str, Column] = {}
    for field in spec.get("fields", []):
        name = field["name"]
        dtype = type_map.get(field.get("type", "string"), "string")
        cons = field.get("constraints", {}) or {}
        checks: list[Check] = []
        if "minimum" in cons and "maximum" in cons:
            checks.append(Check.in_range(cons["minimum"], cons["maximum"]))
        elif "minimum" in cons:
            checks.append(Check.ge(cons["minimum"]))
        elif "maximum" in cons:
            checks.append(Check.le(cons["maximum"]))
        if "enum" in cons:
            checks.append(Check.isin(cons["enum"]))
        if "pattern" in cons:
            checks.append(Check.str_matches(cons["pattern"]))
        if "minLength" in cons or "maxLength" in cons:
            checks.append(
                Check.str_length(
                    min_value=cons.get("minLength"),
                    max_value=cons.get("maxLength"),
                )
            )
        columns[name] = Column(
            dtype,
            checks=checks,
            nullable=not cons.get("required", False),
            unique=cons.get("unique", False),
            name=name,
            coerce=True,
        )
    pk = spec.get("primaryKey")
    unique = [pk] if isinstance(pk, str) else pk
    return DataFrameSchema(columns, unique=unique, coerce=True)
