"""Steal-aware scaling measurement: every Spark run is BRACKETED by a
pure-CPU host-capacity probe (8-process md5 burn, M md5/s), so runs
taken in degraded hypervisor windows can be identified and excluded
instead of polluting the best-of estimator. Appends one JSON line per
run to BENCH/scaling_bracketed.jsonl; analysis (BENCH/BASELINE.md)
computes efficiency over capacity-matched healthy runs.

Usage: python BENCH/run_scaling_bracketed.py [repeats] [levels-csv]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BENCH", "scaling_bracketed.jsonl")

N_KEYS = int(os.environ.get("SCALING_N_KEYS", "125000"))
N_EVENTS = int(os.environ.get("SCALING_N_EVENTS", "1000000"))
N_BATCHES = 4
MODE = os.environ.get("SCALING_MODE", "cow")
CONTENT_MAX = int(os.environ.get("SCALING_CONTENT_MAX", "4096"))
# Pin each run's entire process tree (JVM GC/JIT/netty threads
# included) to exactly `cores` CPUs. Without this, a local[1] JVM
# still burns 32-core GC + compiler cycles, inflating low-core
# throughput and making honest scaling unmeasurable on one host.
PIN = os.environ.get("SCALING_PIN", "1") == "1"

WORKER = """
import sys, json
sys.path.insert(0, {root!r})
from w3_data_etl_pipeline_spark.session import get_spark
from bench import bench_cdc
cores = int(sys.argv[1])
extra = {{"spark.local.dir": "/dev/shm/spark-local-br"}}
spark = get_spark(f"br{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores, extra_conf=extra)
spark.range(1000000).selectExpr("sum(id)").collect()
eps = bench_cdc(spark, n_keys={nk}, n_events={ne}, n_batches={nb}, mode={mode!r}, content_max={cm})
print(json.dumps({{"eps": round(eps, 1)}}))
spark.stop()
"""


def _burn(q, secs):
    h = b"x" * 64
    n = 0
    te = time.time() + secs
    while time.time() < te:
        for _ in range(2000):
            h = hashlib.md5(h).digest()
        n += 2000
    q.put(n)


def host_capacity(workers: int = 8, secs: float = 3.0) -> float:
    """Mmd5/s across `workers` processes — a deterministic pure-CPU
    probe of what the hypervisor is actually delivering right now."""
    q = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q, secs)) for _ in range(workers)]
    t0 = time.time()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / (time.time() - t0) / 1e6


def main() -> int:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    levels = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "2,8,32").split(",")]
    env = dict(os.environ, SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    code = WORKER.format(root=ROOT, nk=N_KEYS, ne=N_EVENTS, nb=N_BATCHES, mode=MODE, cm=CONTENT_MAX)
    for rep in range(repeats):
        for cores in levels:
            cap_b = host_capacity()
            t0 = time.time()
            cmd = [sys.executable, "-c", code, str(cores)]
            if PIN:
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            r = subprocess.run(
                cmd,
                capture_output=True, text=True, env=env, cwd=ROOT,
            )
            wall = time.time() - t0
            cap_a = host_capacity()
            lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            eps = json.loads(lines[-1])["eps"] if lines else None
            rec = {
                "ts": round(time.time(), 1),
                "job": f"{N_EVENTS}ev-{N_KEYS}k-{N_BATCHES}b-{MODE}-c{CONTENT_MAX}"
                + ("-pin" if PIN else ""),
                "cores": cores,
                "eps": eps,
                "cap_before_M": round(cap_b, 1),
                "cap_after_M": round(cap_a, 1),
                "wall_s": round(wall, 1),
            }
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
