"""Settle the COW CDC throughput question (r3 artifact 185.9k ev/s ->
r4 artifact 107.8k): a TRUE matched pair — the round-3 engine code
(git worktree at the r3 artifact commit) vs the current tree, the
same bench_cdc config (500k keys / 4M events / 4 batches / enrich),
run INTERLEAVED in alternating order within one host window, each rep
bracketed by the pure-CPU capacity probe. If eps/capacity is flat
across trees, the drop was the host window; if the current tree is
systematically below r3 at equal capacity, the regression is real and
the per-stage timers name it.

    git worktree add /tmp/r3tree <r3-commit>
    python BENCH/profile_cow_settle.py [pairs=3] [mode=cow]

One JSON line per rep + a summary line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

R5 = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3 = "/tmp/r3tree"

WORKER = r"""
import json, os, sys, time
tree = sys.argv[1]; mode = sys.argv[2]
sys.path.insert(0, tree)
os.chdir(tree)
sys.path.insert(0, os.path.join({r5!r}, "BENCH"))
from run_scaling_bracketed import host_capacity
cap0 = host_capacity()
from bench import bench_cdc
from w3_data_etl_pipeline_spark.session import get_spark
spark = get_spark("cow_settle", master="local[32]", shuffle_partitions=32)
t0 = time.time()
eps = bench_cdc(spark, mode=mode)
cap1 = host_capacity()
print("RESULT " + json.dumps({{
    "tree": os.path.basename(tree), "mode": mode, "eps": round(eps, 1),
    "cap_before": round(cap0, 1), "cap_after": round(cap1, 1),
    "eps_per_cap": round(eps / ((cap0 + cap1) / 2), 1),
}}), flush=True)
spark.stop()
"""


def run_one(tree: str, mode: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(r5=R5), tree, mode],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed for {tree}: {out.stderr[-2000:]}")


def main() -> int:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mode = sys.argv[2] if len(sys.argv) > 2 else "cow"
    if not os.path.exists(os.path.join(R3, "bench.py")):
        print("missing /tmp/r3tree — git worktree add /tmp/r3tree <r3-commit>")
        return 2
    reps = []
    for p in range(pairs):
        order = [R5, R3] if p % 2 == 0 else [R3, R5]  # alternate to cancel drift
        for tree in order:
            r = run_one(tree, mode)
            reps.append(r)
            print(json.dumps(r), flush=True)
    by = {}
    for r in reps:
        by.setdefault(r["tree"], []).append(r)
    summary = {"mode": mode, "pairs": pairs}
    for tree, rs in by.items():
        summary[tree] = {
            "median_eps": round(statistics.median(x["eps"] for x in rs), 1),
            "median_eps_per_cap": round(
                statistics.median(x["eps_per_cap"] for x in rs), 1
            ),
            "caps": [x["cap_before"] for x in rs],
        }
    a, b = by.get("repo", []), by.get("r3tree", [])
    if a and b:
        summary["current_vs_r3_eps_per_cap"] = round(
            statistics.median(x["eps_per_cap"] for x in a)
            / statistics.median(x["eps_per_cap"] for x in b),
            3,
        )
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
