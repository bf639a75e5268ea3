"""pandera-spark: a PySpark-native statistical DataFrame validation engine.

Same capabilities as the reference (unionai-oss/pandera, surveyed in
SURVEY.md) re-architected for Spark: schemas compile to Spark Column
expressions and every data check executes in a single aggregation pass
(see backend/runner.py), instead of one Spark action per check.
"""

import os as _os

# pyspark environment hygiene on import, matching the reference
# (pandera/external_config.py:16-19): Arrow's pandas bridge warns/errors
# on tz-naive conversions without PYARROW_IGNORE_TIMEZONE, and a
# hostname that resolves slowly stalls local sessions without
# SPARK_LOCAL_IP; both only set when absent, never overriding the user.
_os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
_os.environ.setdefault("PYARROW_IGNORE_TIMEZONE", "1")

from . import accessor  # noqa: F401  (registers df.pandera)
from . import config, errors  # noqa: F401  (reference-style submodule access)
from .checks import Check
from .components import Column, ColumnSchema
from .dtypes import (
    Binary,
    Bool,
    Category,
    DataType,
    Complex,
    Complex64,
    Complex128,
    Complex256,
    Date,
    DateTime,
    Decimal,
    Float,
    Float16,
    Float32,
    Float64,
    Float128,
    Int,
    Int8,
    Int16,
    Int32,
    Int64,
    String,
    Timedelta,
    Timestamp,
    UInt,
    UInt8,
    UInt16,
    UInt32,
    UInt64,
)
from .config import (
    Config,
    ValidationDepth,
    config_context,
    get_config,
    set_config,
)
from .container import DataFrameSchema
from .errors import (
    ErrorCategory,
    PanderaSparkError,
    PysparkSchemaError,
    SchemaError,
    SchemaErrorReason,
    SchemaErrors,
    SchemaInitError,
    UnsupportedDtypeError,
)
from .decorators import check_input, check_io, check_output, check_types
from .extensions import register_check_method, unregister_check_method
from .hypotheses import Hypothesis
from .inference import infer_schema

#: reference-name alias (pandera/schema_inference/pyspark.py exports both)
infer_dataframe_schema = infer_schema
from .io import (
    from_frictionless_schema,
    schema_from_json,
    schema_from_yaml,
    schema_to_json,
    schema_to_script,
    schema_to_yaml,
)
from .model import (
    DataFrameModel,
    Field,
    check,
    dataframe_check,
    dataframe_parser,
    parser,
)
from .parsers import Parser
from .report import ValidationResult
from . import datasource  # noqa: F401  (format("pandera_synth") source)

__version__ = "0.1.0"

__all__ = [
    # abstract dtypes (reference pandera/pyspark.py __all__ parity)
    "Binary",
    "Bool",
    "Category",
    "Complex",
    "Complex64",
    "Complex128",
    "Complex256",
    "DataType",
    "Date",
    "DateTime",
    "Decimal",
    "Float",
    "Float16",
    "Float32",
    "Float64",
    "Float128",
    "Int",
    "Int8",
    "Int16",
    "Int32",
    "Int64",
    "String",
    "Timedelta",
    "Timestamp",
    "UInt",
    "UInt8",
    "UInt16",
    "UInt32",
    "UInt64",
    # core API
    "Check",
    "Column",
    "ColumnSchema",
    "Config",
    "DataFrameModel",
    "DataFrameSchema",
    "Field",
    "Hypothesis",
    "ErrorCategory",
    "PanderaSparkError",
    "Parser",
    "PysparkSchemaError",
    "SchemaError",
    "SchemaErrorReason",
    "SchemaErrors",
    "SchemaInitError",
    "UnsupportedDtypeError",
    "ValidationDepth",
    "ValidationResult",
    "check",
    "check_input",
    "check_io",
    "check_output",
    "check_types",
    "config_context",
    "dataframe_check",
    "dataframe_parser",
    "from_frictionless_schema",
    "get_config",
    "infer_dataframe_schema",
    "infer_schema",
    "parser",
    "register_check_method",
    "schema_from_json",
    "schema_from_yaml",
    "schema_to_json",
    "schema_to_script",
    "schema_to_yaml",
    "set_config",
    "unregister_check_method",
]
