"""Resumable runs: per-partition lineage manifest (north rule).

The reference defers identity checks and merges lazy-mode counters at
scan end (schemas.py:1386-1405); the distributed analog is a manifest
keyed by the DATA-DERIVED partition key recording what was validated,
with what spec, and the per-partition verdict + metrics. Resume =
anti-join the manifest against the input's partition list and validate
only the remainder, then merge.

Layout: <checkpoint_dir>/manifest/  (parquet, appended atomically per
run via Spark's committer), one row per (part_key, spec_hash):
    part_key, n_rows, n_violations, pass, spec_hash, run_id
Violations land in <checkpoint_dir>/violations/ partitioned by part_key.

Determinism: run_id is caller-provided (not wall-clock), so re-running
the same job yields byte-identical manifests.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.compiler import ValidationPlan, compile_plan
from .runner import validate
from .specs import TableSpec

MANIFEST_SCHEMA = ("part_key bigint, n_rows bigint, n_violations bigint, "
                   "pass boolean, spec_hash string, run_id string")


def spec_hash(spec: TableSpec) -> str:
    return hashlib.sha256(spec.to_json().encode()).hexdigest()[:16]


def _manifest_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "manifest")


def read_manifest(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    path = _manifest_path(checkpoint_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def validated_parts(spark: SparkSession, checkpoint_dir: str,
                    spec: TableSpec) -> DataFrame:
    m = read_manifest(spark, checkpoint_dir)
    return m.where(F.col("spec_hash") == spec_hash(spec)) \
        .select("part_key").distinct()


def run_resumable(df: DataFrame, spec: TableSpec, checkpoint_dir: str,
                  refs: dict[str, DataFrame] | None = None,
                  run_id: str = "run-0") -> dict:
    """Validate only partitions absent from the manifest; append their
    verdicts + violations. Returns counters for this increment.

    NOTE identity-constraint scope: uniqueness/keyref are evaluated per
    INCREMENT (like the reference's per-document scope). Cross-increment
    global uniqueness needs a terminal full-table pass — see
    queries/global checks; this mirrors lazy-mode deferred counters."""
    spark = df.sparkSession
    if not spec.part_key:
        raise ValueError("resumable runs need a data-derived part_key")
    sh = spec_hash(spec)

    done = validated_parts(spark, checkpoint_dir, spec)
    todo = df.join(F.broadcast(done), on=spec.part_key, how="left_anti")
    if todo.limit(1).count() == 0:
        return {"validated_parts": 0, "rows": 0, "violations": 0,
                "skipped": True}

    # persist the compiled plan's SOURCE next to the manifest (analog of
    # schema export, reference: exports.py:141-287) so a resume can verify
    # it validates under the same spec revision
    os.makedirs(checkpoint_dir, exist_ok=True)
    spec_file = os.path.join(checkpoint_dir, f"spec-{sh}.json")
    if not os.path.exists(spec_file):
        with open(spec_file, "w") as f:
            f.write(spec.to_json())

    res = validate(todo, spec, refs=refs)
    viols = res.violations
    verd = res.verdicts.withColumn("spec_hash", F.lit(sh)) \
        .withColumn("run_id", F.lit(run_id))

    viol_n = viols.count()
    rows_n = verd.agg(F.sum("n_rows")).collect()[0][0] or 0
    parts_n = verd.count()

    (viols.repartition(1, "part_key")
     .sortWithinPartitions("constraint", "row_key", "reason")
     .write.mode("append")
     .partitionBy("part_key")
     .parquet(os.path.join(checkpoint_dir, "violations")))
    verd.write.mode("append").parquet(_manifest_path(checkpoint_dir))

    return {"validated_parts": parts_n, "rows": int(rows_n),
            "violations": int(viol_n), "skipped": False}
