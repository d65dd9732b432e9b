"""Table IO: Iceberg-first with parquet fallback.

Production target (north rule) is Iceberg: snapshot-isolated scans,
partition pruning from the spec's part_key, and incremental reads that
feed the streaming/foreachBatch path. The Iceberg runtime jar is not
present in this environment, so `read_table` probes for the format and
falls back to parquet directories — every operator is format-agnostic
beyond this function.

Iceberg-specific integration points (enabled automatically when the jar
is on the classpath):
  - `read_table(spark, "catalog.db.tbl")` -> spark.read.format("iceberg")
  - snapshot pinning: pass snapshot_id for reproducible validation runs
  - incremental validation: start_snapshot/end_snapshot for resume
    between manifest checkpoints (pairs with checkpoint.run_resumable)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_CHECKED: dict[int, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    key = id(spark)
    if key not in _ICEBERG_CHECKED:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.source.IcebergSource")
            _ICEBERG_CHECKED[key] = True
        except Exception:
            _ICEBERG_CHECKED[key] = False
    return _ICEBERG_CHECKED[key]


def read_table(spark: SparkSession, source: str,
               fmt: str | None = None,
               snapshot_id: int | None = None) -> DataFrame:
    """Read an input table. `source` is an Iceberg table identifier
    (catalog.db.tbl) or a parquet path; fmt forces a reader."""
    use_iceberg = (fmt == "iceberg") or (
        fmt is None and "/" not in source and iceberg_available(spark))
    if use_iceberg:
        r = spark.read.format("iceberg")
        if snapshot_id is not None:
            r = r.option("snapshot-id", str(snapshot_id))
        return r.load(source)
    if snapshot_id is not None:
        raise ValueError("snapshot_id requires the iceberg reader")
    return spark.read.parquet(source)


def table_snapshots(spark: SparkSession, table: str) -> list[tuple]:
    """(snapshot_id, committed_at) history of an Iceberg table, oldest
    first — the resume cursor source for incremental validation
    (reference analog: the reloadable global maps of
    xsd_globals.py:537-578 applied across table versions)."""
    if not iceberg_available(spark):
        raise RuntimeError("iceberg runtime not on the classpath")
    rows = (spark.read.format("iceberg").load(f"{table}.snapshots")
            .select("snapshot_id", "committed_at")
            .orderBy("committed_at").collect())
    return [(r.snapshot_id, r.committed_at) for r in rows]


def read_increment(spark: SparkSession, table: str,
                   start_snapshot_id: int,
                   end_snapshot_id: int | None = None) -> DataFrame:
    """Incremental Iceberg read: rows appended AFTER start_snapshot_id
    (exclusive) up to end_snapshot_id (inclusive; default = current).
    This is the resume path between manifest checkpoints
    (checkpoint.run_resumable): validate only what arrived since the
    last validated snapshot."""
    if not iceberg_available(spark):
        raise RuntimeError("iceberg runtime not on the classpath")
    r = (spark.read.format("iceberg")
         .option("start-snapshot-id", str(start_snapshot_id)))
    if end_snapshot_id is not None:
        r = r.option("end-snapshot-id", str(end_snapshot_id))
    return r.load(table)
