"""Local replica of the driver's correctness gate: run every entry query
on Spark and its DuckDB oracle side-by-side, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return "%.9g" % v
    if isinstance(v, bool):
        return str(v)
    return str(v) if v is not None else "<NULL>"


def df_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for row in rows:
        key = tuple(norm_cell(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from meresco_rdf_spark.entry_queries import ORACLES, QUERIES
    from meresco_rdf_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute("CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet'"
                    % (t, sf_dir, t))

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        dt = time.monotonic() - t0
        if name not in ORACLES:
            print("%-24s rows-only: %d rows, cols=%s [%.1fs]"
                  % (name, len(s_rows), s_cols, dt))
            continue
        try:
            res = con.execute(ORACLES[name])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            print("%-24s ORACLE SQL ERROR: %s" % (name, str(exc).splitlines()[0]))
            continue
        ok = True
        if sorted(s_cols) != sorted(o_cols):
            ok = False
            print("%-24s SCHEMA MISMATCH spark=%s duck=%s" % (name, sorted(s_cols), sorted(o_cols)))
        if len(s_rows) != len(o_rows):
            ok = False
            print("%-24s COUNT MISMATCH spark=%d duck=%d" % (name, len(s_rows), len(o_rows)))
        if ok:
            sm = df_to_multiset(s_cols, s_rows)
            om = df_to_multiset(o_cols, o_rows)
            if sm != om:
                ok = False
                extra_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
                extra_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
                print("%-24s VALUE MISMATCH (%d rows)\n  spark-only: %s\n  duck-only:  %s"
                      % (name, len(s_rows), extra_s, extra_o))
        if ok:
            print("%-24s OK (%d rows) [%.1fs]" % (name, len(s_rows), dt))
        else:
            failures.append(name)

    print("\n%d failures: %s" % (len(failures), failures))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
