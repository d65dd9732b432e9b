"""Round-8 measurement harness (guide §1): per-query noop-sink timing +
.explain("formatted") capture, SAME session config as the frozen
bench.py. NOT part of the driver contract — bench.py stays the
measured artifact; this exists so optimization work can isolate and
re-measure single queries quickly and dump plans into plans/r08/.

Usage:
  python bench_extra.py [--plans DIR] [--trials K] [--images] [query ...]

With no query names, runs every bench.py HEADLINE query. --images adds
the flagship images_full_suite + images_phash_near_dups timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
IMAGES_ROWS = int(os.environ.get("SPARK_GRAFT_IMAGES_ROWS", "120000"))


def main() -> None:
    args = list(sys.argv[1:])
    plans_dir = None
    trials = 2
    with_images = False
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i:i + 2]
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
        del args[i:i + 2]
    if "--images" in args:
        with_images = True
        args.remove("--images")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder
        .master(f"local[{CPUS}]")
        .appName("xmlschema_spark_bench_extra")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from xmlschema_spark.distribute import ensure_distributed
    ensure_distributed(spark)
    from xmlschema_spark.queries import QUERIES

    import bench as benchmod
    names = args or list(benchmod.HEADLINE)

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    timings: dict[str, float] = {}

    if with_images:
        from xmlschema_spark import validate
        from xmlschema_spark.operators.dedup import hamming_near_dups
        from xmlschema_spark.sources.fixtures import images_spec, make_images
        img_path = f"/tmp/xmlschema_spark_bench_images_{IMAGES_ROWS}"
        if not os.path.exists(img_path + "/_SUCCESS"):
            make_images(spark, IMAGES_ROWS, dirty=True,
                        rows_per_partition=max(IMAGES_ROWS // 64, 1)) \
                .repartition(64, "part_key") \
                .write.mode("overwrite").parquet(img_path)
        imgs = spark.read.parquet(img_path)
        best = float("inf")
        for _ in range(trials):
            t0 = time.monotonic()
            res = validate(imgs, images_spec(with_keyref=False,
                                             check_phash=True))
            res.violations.count()
            res.verdicts.count()
            best = min(best, time.monotonic() - t0)
            res.unpersist()
        timings["images_full_suite"] = round(best, 3)
        best = float("inf")
        for _ in range(trials):
            t0 = time.monotonic()
            hamming_near_dups(imgs.select("image_id", "phash"), "phash",
                              "image_id", max_hamming=7) \
                .write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        timings["images_phash_near_dups"] = round(best, 3)
        if plans_dir:
            df = hamming_near_dups(imgs.select("image_id", "phash"),
                                   "phash", "image_id", max_hamming=7)
            with open(os.path.join(plans_dir,
                                   "images_phash_near_dups.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = float("inf")
        for _ in range(trials):
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)
        if plans_dir:
            df = fn(spark, SF_DIR)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": SF_DIR, "trials": trials,
                      "queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
