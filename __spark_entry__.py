"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full constraint-suite validation of a
                 deterministic synthetic image+caption table (the
                 BASELINE.json input_hint shape) + facet suite over the
                 sf0.001 lineitem table; returns the violation summary.
queries()      — one entry per implemented operator (SURVEY.md §2);
                 implementations live in xmlschema_spark/queries.py.
oracle_sql()   — DuckDB-equivalent SQL per query (correctness gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: validate sf0.001 lineitem with the full facet suite and
    a synthetic images table with the full engine (facets + uniqueness +
    payload Arrow stage); returns per-constraint violation counts."""
    from pyspark.sql import functions as F

    from xmlschema_spark.distribute import ensure_distributed
    ensure_distributed(spark)

    from xmlschema_spark import validate
    from xmlschema_spark.queries import facet_summary_lineitem
    from xmlschema_spark.sources.fixtures import images_spec, make_images

    imgs = make_images(spark, 2000, dirty=True)
    res = validate(imgs, images_spec(with_keyref=False, check_phash=True))
    img_counts = res.violations.groupBy("constraint").agg(
        F.count(F.lit(1)).alias("n"))
    li_counts = facet_summary_lineitem(spark, "/root/testdata/sf0.001")
    return img_counts.unionByName(li_counts).orderBy("constraint")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from xmlschema_spark.distribute import ensure_distributed
    from xmlschema_spark.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_distributed(spark)   # UDF closures need the pkg on executors
            return fn(spark, sf_dir)
        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {k: wrap(v) for k, v in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from xmlschema_spark.queries import ORACLES

    return dict(ORACLES)
