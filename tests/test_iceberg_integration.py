"""Iceberg integration: snapshot-pinned reads + incremental resume.

The whole module SKIPS when the iceberg-spark runtime jar is not on the
classpath (this sandbox has no network to vendor it; the test is the
executable contract for environments that do). Run it on a real
deployment with:

    spark-submit --packages \
      org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      -m pytest tests/test_iceberg_integration.py
"""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.sources.io import (iceberg_available, read_increment,
                                        read_table, table_snapshots)


@pytest.fixture(scope="module")
def iceberg_spark(spark, tmp_path_factory):
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark runtime jar not on the classpath")
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark.conf.set("spark.sql.catalog.it",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", wh)
    return spark


def test_snapshot_pin_and_incremental_resume(iceberg_spark):
    """Write two snapshots; a pinned read reproduces snapshot 1 exactly
    and the incremental read between the snapshots yields ONLY the
    appended rows — the resume contract for checkpointed validation."""
    spark = iceberg_spark
    t = "it.db.inc_test"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    base = spark.range(100).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("v"))
    base.writeTo(t).create()
    inc = spark.range(100, 150).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("v"))
    inc.writeTo(t).append()

    snaps = table_snapshots(spark, t)
    assert len(snaps) == 2
    s1, s2 = snaps[0][0], snaps[1][0]

    pinned = read_table(spark, t, fmt="iceberg", snapshot_id=s1)
    assert pinned.count() == 100

    delta = read_increment(spark, t, start_snapshot_id=s1,
                           end_snapshot_id=s2)
    assert delta.count() == 50
    assert delta.agg(F.min("id")).collect()[0][0] == 100

    # resume = validate only the increment
    from xmlschema_spark import ColumnSpec, TableSpec, validate
    spec = TableSpec(name="t", key_column="id",
                     columns=[ColumnSpec("v", "string", min_length=32,
                                         max_length=32)])
    res = validate(delta, spec)
    assert res.violations.count() == 0
    res.unpersist()
    spark.sql(f"DROP TABLE IF EXISTS {t}")
