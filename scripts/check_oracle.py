"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted,
floats via repr of round-tripped values).

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from crusty_core_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {str(ex)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check) "
                  f"[{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"      WARNING {name}: 0 rows")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {str(ex)[:300]}")
            failures.append(name)
            continue
        ok_n = len(srows) == len(orows)
        ok_c = sorted(scols) == sorted(ocols)
        ok_v = ok_c and value_hash(srows, scols) == value_hash(orows, ocols)
        status = "OK  " if (ok_n and ok_c and ok_v) else "FAIL"
        print(f"{status}  {name}: spark={len(srows)} duck={len(orows)} "
              f"cols={'ok' if ok_c else (scols, ocols)} "
              f"values={'ok' if ok_v else 'MISMATCH'} [{time.time()-t0:.1f}s]")
        if status == "FAIL":
            failures.append(name)
            if ok_c and not ok_v:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                s_set = {
                    "\x01".join(norm_cell(r[i]) for i in order) for r in srows
                }
                o_order = sorted(range(len(ocols)), key=lambda i: ocols[i])
                o_set = {
                    "\x01".join(norm_cell(r[i]) for i in o_order) for r in orows
                }
                print("      spark-only:", sorted(s_set - o_set)[:3])
                print("      duck-only: ", sorted(o_set - s_set)[:3])
    print("\n%d failures" % len(failures), sorted(failures) if failures else "")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
