"""Ship the package to Spark executors (the spark-submit --py-files
pattern, per the north rule; reference analog: the CLI driver packaging
at cli.py:234-278).

Python workers resolve cloudpickled UDF module references via their own
sys.path, not the driver's — so any session whose driver didn't start
inside the repo needs the package registered with addPyFile. Idempotent
per SparkContext."""

from __future__ import annotations

import os
import zipfile

_SENT_ATTR = "_xmlschema_spark_pyfile"


def ensure_distributed(spark) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SENT_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join("/tmp", "xmlschema_spark_pkg.zip")
    # rebuild if any source is newer than the zip (dev loop friendliness)
    srcs = []
    for root, _dirs, files in os.walk(pkg_dir):
        srcs += [os.path.join(root, f) for f in files if f.endswith(".py")]
    if (not os.path.exists(zip_path)
            or os.path.getmtime(zip_path) < max(map(os.path.getmtime, srcs))):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for s in srcs:
                rel = os.path.relpath(s, os.path.dirname(pkg_dir))
                z.write(s, rel)
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    setattr(sc, _SENT_ATTR, True)
