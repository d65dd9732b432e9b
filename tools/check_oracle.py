"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
over the same parquet, compare row-count + schema + order-insensitive
value hash (columns sorted by name).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames) -> tuple[int, str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)
    lines = sorted("|".join(cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(lines), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            sn, sh = canon([tuple(r) for r in srows], scols)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={sn} (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            on, oh = canon(res.fetchall(), ocols)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails.append(name)
            continue
        status = "OK  " if (sn, sh) == (on, oh) and sorted(scols) == sorted(ocols) else "FAIL"
        print(f"{status} {name}: spark rows={sn} hash={sh} | oracle rows={on} hash={oh}"
              + ("" if sorted(scols) == sorted(ocols)
                 else f" | COLS spark={sorted(scols)} oracle={sorted(ocols)}"))
        if status == "FAIL":
            fails.append(name)
    print(f"\n{len(qs) - len(fails)}/{len(qs)} OK")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
