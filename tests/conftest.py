import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

# ANSI lanes: stock Spark 4 defaults spark.sql.ansi.enabled=true, so the
# engine must be correct under BOTH modes.  The whole suite runs twice by
# default (ANSI is a runtime conf — one JVM, flipped per lane).  Restrict
# with SPARK_GRAFT_ANSI=off|on for quick local iteration.
_ANSI_LANES = {
    "both": ("ansi_off", "ansi_on"),
    "off": ("ansi_off",),
    "on": ("ansi_on",),
}[os.environ.get("SPARK_GRAFT_ANSI", "both")]


@pytest.fixture(scope="session")
def _spark_base(tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("spark-warehouse")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("pandera-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.warehouse.dir", str(warehouse))
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session", params=_ANSI_LANES)
def spark(request, _spark_base):
    _spark_base.conf.set(
        "spark.sql.ansi.enabled",
        "true" if request.param == "ansi_on" else "false",
    )
    yield _spark_base
