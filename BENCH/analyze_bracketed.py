"""Summarize BENCH/scaling_bracketed.jsonl into per-level stats and
N->4N efficiency pairs, split by job tag, with host-capacity-aware
filtering (a run is 'healthy' when both bracket probes saw >= MIN_CAP
Mmd5/s — i.e. the hypervisor was delivering CPU before AND after).

Usage: python BENCH/analyze_bracketed.py [min_cap_M]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(ROOT, "BENCH", "scaling_bracketed.jsonl")
MIN_CAP = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
PAIRS = [(1, 4), (2, 8), (8, 32)]


def main() -> None:
    by_job: dict[str, dict[int, list[dict]]] = defaultdict(lambda: defaultdict(list))
    with open(PATH) as f:
        for line in f:
            r = json.loads(line)
            if r.get("eps"):
                by_job[r["job"]][r["cores"]].append(r)

    for job, levels in sorted(by_job.items()):
        print(f"\n## job {job}  (healthy = both capacity probes >= {MIN_CAP} Mmd5/s)")
        print("| cores | n runs | healthy | best eps (healthy) | median (healthy) | all eps |")
        print("|---|---|---|---|---|---|")
        best: dict[int, float] = {}
        for c in sorted(levels):
            runs = levels[c]
            healthy = [
                r for r in runs
                if min(r["cap_before_M"], r["cap_after_M"]) >= MIN_CAP
            ]
            vals = sorted(r["eps"] for r in healthy)
            allv = [r["eps"] for r in runs]
            if vals:
                best[c] = vals[-1]
                med = vals[len(vals) // 2]
                print(
                    f"| {c} | {len(runs)} | {len(healthy)} | {vals[-1]:,.0f} | {med:,.0f} | "
                    + ", ".join(f"{v:,.0f}" for v in allv) + " |"
                )
            else:
                print(f"| {c} | {len(runs)} | 0 | - | - | "
                      + ", ".join(f"{v:,.0f}" for v in allv) + " |")
        for lo, hi in PAIRS:
            if lo in best and hi in best:
                sp = best[hi] / best[lo]
                print(
                    f"- local[{lo}] -> local[{hi}]: speedup {sp:.2f}x, "
                    f"efficiency {sp / (hi / lo):.2f} (best healthy runs)"
                )
        # matched-window pairs: a lo-run immediately followed (in wall
        # time) by a hi-run shares one host-weather window; per-cycle
        # efficiency is the honest distribution, immune to the
        # small-level-caught-better-weather artifact.
        flat = sorted((r for rs in levels.values() for r in rs), key=lambda r: r["ts"])
        for lo, hi in PAIRS:
            effs = []
            for a, b in zip(flat, flat[1:]):
                if a["cores"] == lo and b["cores"] == hi and b["ts"] - a["ts"] < 900:
                    effs.append((b["eps"] / a["eps"]) / (hi / lo))
            if effs:
                effs.sort()
                med = effs[len(effs) // 2]
                print(
                    f"- matched windows local[{lo}] -> local[{hi}]: n={len(effs)}, "
                    f"median eff {med:.2f}, best {effs[-1]:.2f}, "
                    f"all: " + ", ".join(f"{e:.2f}" for e in effs)
                )


if __name__ == "__main__":
    main()
