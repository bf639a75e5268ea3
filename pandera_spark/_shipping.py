"""Ship this package to executor python workers.

Python UDF closures defined in an importable module are cloudpickled BY
REFERENCE, so executors must be able to ``import pandera_spark``.  On a real
cluster that's ``spark-submit --py-files pandera_spark.zip``; this helper
automates the same thing at runtime via ``SparkContext.addPyFile`` so any
entry point (driver harness, notebook, test) works regardless of cwd.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_shipped: set[int] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Zip pandera_spark and addPyFile it once per SparkContext.

    On Spark Connect there is no ``sparkContext``; the session-scoped
    ``addArtifacts(pyfile=True)`` API is the equivalent."""
    try:
        sc = spark.sparkContext
    except Exception:  # Spark Connect
        _ship_via_artifacts(spark)
        return
    key = id(sc)
    if key in _shipped:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"pandera_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "pandera_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    _shipped.add(key)


def _build_zip() -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"pandera_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "pandera_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    return zip_path


def _ship_via_artifacts(spark: SparkSession) -> None:
    key = id(spark)
    if key in _shipped:
        return
    try:
        spark.addArtifacts(_build_zip(), pyfile=True)
        _shipped.add(key)
    except Exception:
        # best-effort: a Connect cluster with the package pre-installed
        # (pip/conda on executors) needs no shipping at all
        pass
