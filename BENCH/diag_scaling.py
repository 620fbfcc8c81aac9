"""Which stage breaks 1->4 scaling? Runs pinned (taskset) variants of
the CDC apply plus generic-Spark controls at each core count and
appends to BENCH/diag_scaling.jsonl:

  apply      — full engine apply (enrich + fused dedup + COW merge)
  noenrich   — same minus the Arrow/pandas enrichment stage
  mor        — same as apply but merge-on-read (no bucket rewrite)
  shuffle    — generic control: read WAL parquet -> repartition(hash)
               -> sortWithinPartitions -> write parquet (same volume,
               no engine code)
  scan       — read WAL parquet -> count (pure scan)

If `shuffle` scales like `apply`, the limit is Spark's local shuffle /
parquet machinery on this host, not the engine. If `noenrich` scales
and `apply` doesn't, the Python stage is the culprit.

Usage: python BENCH/diag_scaling.py [levels-csv] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BENCH", "diag_scaling.jsonl")

N_KEYS = int(os.environ.get("DIAG_N_KEYS", "500000"))
N_EVENTS = int(os.environ.get("DIAG_N_EVENTS", "4000000"))
CONTENT_MAX = int(os.environ.get("DIAG_CONTENT_MAX", "256"))

WORKER = """
import os, sys, json, time, shutil, tempfile
sys.path.insert(0, {root!r})
from w3_data_etl_pipeline_spark.session import get_spark
from bench import bench_cdc
cores = int(sys.argv[1]); variant = sys.argv[2]
extra = {{"spark.local.dir": "/dev/shm/spark-local-diag"}}
spark = get_spark(f"diag{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores, extra_conf=extra)
spark.range(1000000).selectExpr("sum(id)").collect()
ne, nk, cm = {ne}, {nk}, {cm}
if variant in ("apply", "noenrich", "mor"):
    eps = bench_cdc(spark, n_keys=nk, n_events=ne, n_batches=4,
                    mode="mor" if variant == "mor" else "cow",
                    content_max=cm, enrich=variant != "noenrich")
elif variant == "cpu":
    # pure-CPU codegen control on the same runtime: multi-second
    # tasks, no parquet, no shuffle bytes (one long per partition)
    t0 = time.time()
    n = 600_000_000
    spark.range(n, numPartitions=max(2 * cores, 2)).selectExpr(
        "max(xxhash64(id, id + 1, id + 2)) as h"
    ).collect()
    eps = n / (time.time() - t0)
else:
    from w3_data_etl_pipeline_spark import datagen
    from pyspark.sql import functions as F
    work = tempfile.mkdtemp(prefix="diag_", dir="/dev/shm")
    try:
        ev = datagen.change_events(spark, ne, int(nk * 1.2), content_max=cm)
        seg = os.path.join(work, "wal")
        ev.write.mode("overwrite").parquet(seg)
        src = spark.read.parquet(seg)
        t0 = time.time()
        if variant == "scan":
            src.count()
        else:  # shuffle: same volume through exchange+sort+parquet write
            (src.repartition(max(1, 2 * cores), F.pmod(F.xxhash64("repo", "path"), F.lit(64)))
                .sortWithinPartitions("repo", "path")
                .write.mode("overwrite").parquet(os.path.join(work, "out")))
        eps = ne / (time.time() - t0)
    finally:
        shutil.rmtree(work, ignore_errors=True)
print(json.dumps({{"eps": round(eps, 1)}}))
spark.stop()
"""


def main() -> int:
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,4").split(",")]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    variants = os.environ.get("DIAG_VARIANTS", "apply,noenrich,mor,shuffle,scan").split(",")
    env = dict(os.environ, SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    code = WORKER.format(root=ROOT, ne=N_EVENTS, nk=N_KEYS, cm=CONTENT_MAX)
    for rep in range(reps):
        for variant in variants:
            for cores in levels:
                t0 = time.time()
                cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code,
                       str(cores), variant]
                r = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=ROOT)
                lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
                eps = json.loads(lines[-1])["eps"] if lines else None
                rec = {
                    "ts": round(time.time(), 1),
                    "variant": variant,
                    "cores": cores,
                    "eps": eps,
                    "wall_s": round(time.time() - t0, 1),
                    "job": f"{N_EVENTS}ev-{N_KEYS}k-c{CONTENT_MAX}",
                }
                if eps is None:
                    rec["err"] = (r.stderr or "")[-500:]
                with open(OUT, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
