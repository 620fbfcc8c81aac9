"""Local mimic of the driver's correctness gate: run every
queries()[name] on Spark and its oracle_sql()[name] on DuckDB over
the same sf dir; compare row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted,
values stringified with float rounding).

Usage: python tools/compare_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from w3_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("compare_oracle", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        ok_count = len(spark_rows) == len(duck_rows)
        h_s = value_hash(spark_rows, spark_cols)
        h_d = value_hash(duck_rows, duck_cols)
        ok_hash = h_s == h_d
        status = "PASS" if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"{status}  {name}: rows {len(spark_rows)}/{len(duck_rows)} cols={ok_cols} "
            f"hash={ok_hash} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols: {sorted(spark_cols)}\n      duck  cols: {sorted(duck_cols)}")
            elif not ok_hash and len(spark_rows) == len(duck_rows):
                order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
                ls = sorted("\x01".join(_norm(r[i]) for i in order_s) for r in spark_rows)
                ld = sorted("\x01".join(_norm(r[i]) for i in order_d) for r in duck_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        print(f"      spark: {a[:200]}\n      duck : {b[:200]}")
                        break
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
