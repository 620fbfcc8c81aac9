"""Scale-factor escalation runner: time selected registry entries at
two (or more) scale dirs and report per-entry wall ratios + scaling
exponents (e = log(wall_hi/wall_lo) / log(data_hi/data_lo)). The
round-4 sweeps in BENCH/BASELINE.md were produced with this flow;
synthesize the inputs first with BENCH/make_sfN.py.

Usage:
  python BENCH/run_escalation.py q1,q2,... sf_lo_dir sf_hi_dir [ratio]
  (ratio = data-size multiple between the dirs, default 10)

Prints one JSON line per entry and a trailing summary line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    names = sys.argv[1].split(",")
    lo_dir, hi_dir = sys.argv[2], sys.argv[3]
    ratio = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0

    import __spark_entry__ as entry
    from w3_data_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("escalation", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    qs = entry.queries()
    out = []
    for name in names:
        fn = qs[name]
        walls = {}
        for label, d in (("lo", lo_dir), ("hi", hi_dir)):
            t0 = time.time()
            n = fn(spark, d).count()
            walls[label] = round(time.time() - t0, 2)
            walls[f"rows_{label}"] = n
        e = math.log(max(walls["hi"], 1e-3) / max(walls["lo"], 1e-3)) / math.log(ratio)
        rec = {"query": name, **walls,
               "wall_ratio": round(walls["hi"] / max(walls["lo"], 1e-3), 2),
               "exponent": round(e, 2)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
