import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def _vendor_jars() -> str:
    """Comma-joined vendor/jars/*.jar (e.g. the Iceberg runtime fetched
    by tools/fetch_iceberg_jar.sh); empty when none are vendored."""
    import glob
    d = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "vendor", "jars")
    return ",".join(sorted(glob.glob(os.path.join(d, "*.jar"))))


@pytest.fixture(scope="session")
def spark():
    b = (
        SparkSession.builder
        .master("local[4]")
        .appName("xmlschema_spark_tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    jars = _vendor_jars()
    if jars:
        b = b.config("spark.jars", jars)
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
