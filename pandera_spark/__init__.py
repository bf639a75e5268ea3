"""pandera-spark: a PySpark-native statistical DataFrame validation engine.

Same capabilities as the reference (unionai-oss/pandera, surveyed in
SURVEY.md) re-architected for Spark: schemas compile to Spark Column
expressions and every data check executes in a single aggregation pass
(see backend/runner.py), instead of one Spark action per check.
"""

from . import accessor  # noqa: F401  (registers df.pandera)
from .checks import Check
from .components import Column, ColumnSchema
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

__version__ = "0.1.0"

__all__ = [
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
