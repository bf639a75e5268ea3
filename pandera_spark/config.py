"""Runtime configuration, mirroring the reference's env-var knobs.

Reference: /root/reference/pandera/config.py:12-56 — ``PANDERA_VALIDATION_ENABLED``
(kill switch), ``PANDERA_VALIDATION_DEPTH`` (SCHEMA_ONLY / DATA_ONLY /
SCHEMA_AND_DATA), ``PANDERA_CACHE_DATAFRAME`` / ``PANDERA_KEEP_CACHED_DATAFRAME``.
We read the same variable names so existing deployments transfer.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from dataclasses import dataclass, replace
from enum import Enum


class ValidationDepth(Enum):
    SCHEMA_ONLY = "SCHEMA_ONLY"
    DATA_ONLY = "DATA_ONLY"
    SCHEMA_AND_DATA = "SCHEMA_AND_DATA"


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


@dataclass
class Config:
    validation_enabled: bool = True
    validation_depth: ValidationDepth = ValidationDepth.SCHEMA_AND_DATA
    cache_dataframe: bool = False
    keep_cached_dataframe: bool = False

    @classmethod
    def from_env(cls) -> "Config":
        depth = os.environ.get(
            "PANDERA_VALIDATION_DEPTH", ValidationDepth.SCHEMA_AND_DATA.value
        )
        return cls(
            validation_enabled=_env_bool("PANDERA_VALIDATION_ENABLED", True),
            validation_depth=ValidationDepth(depth),
            cache_dataframe=_env_bool("PANDERA_CACHE_DATAFRAME", False),
            keep_cached_dataframe=_env_bool(
                "PANDERA_KEEP_CACHED_DATAFRAME", False
            ),
        )


_config = Config.from_env()


def get_config() -> Config:
    return _config


def set_config(**kwargs) -> Config:
    global _config
    _config = replace(_config, **kwargs)
    return _config


@contextmanager
def config_context(**kwargs):
    """Temporarily override config values (mirrors reference
    ``config_context``, pandera/config.py)."""
    global _config
    old = _config
    _config = replace(_config, **kwargs)
    try:
        yield _config
    finally:
        _config = old
