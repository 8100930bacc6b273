"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB over the
same sf dir; compare row count, column names, and an order-insensitive
value hash. Usage: python scripts/check_oracle.py [sf_dir] [query ...]"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from sparkpdf.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "None"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        osql = oracles.get(name)
        if osql is None:
            print(f"rows-only  {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(osql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error {exc}")
            failures.append(name)
            continue
        ok_count = len(rows) == len(orows)
        ok_cols = sorted(cols) == sorted(ocols)
        ok_hash = value_hash(rows, cols) == value_hash(orows, ocols)
        status = "OK  " if (ok_count and ok_cols and ok_hash) else "FAIL"
        print(
            f"{status}  {name}: rows {len(rows)}/{len(orows)}"
            f" cols={'=' if ok_cols else sorted(cols)!r}"
            f"{'' if ok_cols else sorted(ocols)!r}"
            f" hash={'=' if ok_hash else '!'} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_count and ok_cols:
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                s_lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
                o_lines = sorted("|".join(norm_cell(r[i]) for i in oorder) for r in orows)
                for a, b in zip(s_lines, o_lines):
                    if a != b:
                        print(f"   spark: {a[:200]}")
                        print(f"   duck : {b[:200]}")
                        break
    print("—" * 40)
    print(f"{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
