"""Mimic the driver's correctness gate: run each __spark_entry__ queries()
entry and its oracle_sql() twin at sf0.01, compare row multisets
(column-name-sorted, floats rounded) and schemas.  Usage:

    PYTHONPATH=/root/repo python tools/check_contract.py [entry ...]
"""

from __future__ import annotations

import importlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 4)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main() -> int:
    m = importlib.import_module("__spark_entry__")
    qs = m.queries()
    oracles = m.oracle_sql()
    only = set(sys.argv[1:])

    from seismic_spark.session import get_spark

    spark = get_spark("contract-check", cores=16, shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.time()
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows, {t1-t0:.1f}s) — no oracle")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        ok_schema = sorted(scols) == sorted(ocols)
        a, b = norm(srows, scols), norm(orows, ocols)
        ok = ok_schema and a == b
        status = "OK" if ok else "MISMATCH"
        print(f"{name}: {status} spark={len(srows)} duck={len(orows)} ({t1-t0:.1f}s)")
        if not ok:
            failures.append(name)
            if not ok_schema:
                print(f"  schema: spark={sorted(scols)} duck={sorted(ocols)}")
            sa, sb = set(a), set(b)
            for x in list(sa - sb)[:5]:
                print(f"  spark-only: {x}")
            for x in list(sb - sa)[:5]:
                print(f"  duck-only : {x}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
