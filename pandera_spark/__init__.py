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
from .parsers import Parser
from .report import ValidationResult

__version__ = "0.1.0"

__all__ = [
    "Check",
    "Column",
    "ColumnSchema",
    "Config",
    "DataFrameSchema",
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
    "config_context",
    "get_config",
    "set_config",
]
