"""Local replica of the driver's correctness gate: run every entry query
on Spark and its DuckDB oracle side-by-side, compare row count, column
names, and order-insensitive values.

Round-5 alignment with the driver's fetch semantics (round-4 verdict
directive #3): the round-4 replica fetched the DuckDB side via
``fetchall()``, which renders every integer type — including HUGEINT —
as a Python int, so the two oracles whose uncast ``SUM(...)//x`` columns
bound to HUGEINT passed locally while the driver (whose fetch goes
through a dtype-preserving pandas/Arrow path that upcasts HUGEINT to
float64/Decimal) hash-failed them.  This replica now:

1. binds each oracle and REJECTS any output column whose DuckDB type is
   outside the canonical set {VARCHAR, BOOLEAN, INTEGER, BIGINT, DOUBLE}
   — the only types with one unambiguous Python rendering shared by
   Spark and every DuckDB fetch path (a deliberately HUGEINT-typed
   oracle is therefore red here BEFORE it reaches the driver);
2. fetches through Arrow (``fetch_arrow_table().to_pylist()``) — the
   dtype-preserving AND null-faithful path (pandas would collapse NULL
   doubles into NaN) — instead of trusting ``fetchall()``'s lossy int
   coercion, then normalizes with the same rules as the Spark side
   (``%.9g`` floats, str ints, ``<NULL>`` for None).

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

# The only DuckDB output types whose value rendering is identical across
# fetchall / pandas / Arrow AND matches Spark's: anything else (HUGEINT,
# DECIMAL, UBIGINT, lists, ...) must be CAST in the oracle SQL.
ALLOWED_DUCK_TYPES = {"VARCHAR", "BOOLEAN", "INTEGER", "BIGINT", "DOUBLE"}


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return "%.9g" % v
    if isinstance(v, bool):
        return str(v)
    return str(v) if v is not None else "<NULL>"


def duck_fetch(con, sql):
    """Bind + execute an oracle through the dtype-preserving path.

    Returns ``(cols, norm_rows, type_offenders)`` where ``norm_rows``
    are tuples of normalized strings and ``type_offenders`` lists
    ``(col, duck_type)`` pairs outside ALLOWED_DUCK_TYPES.  Callers
    must treat a non-empty offender list as a failure — the driver's
    hash for such a column is undefined relative to this replica.

    The value fetch goes through Arrow (``to_pylist``): unlike the
    pandas path it is BOTH dtype-preserving (HUGEINT would surface as
    ``Decimal``, not silently as ``int`` — though the binding gate
    rejects it first) and NULL-faithful (a NULL double stays ``None``
    instead of collapsing into NaN, which real NaN values must hash
    differently from — ``events_asof_signup`` has genuinely-NULL
    doubles and exposed exactly that collapse in a pandas-path
    draft of this replica).  Within ALLOWED_DUCK_TYPES, Arrow's
    Python values normalize identically to Spark's collect() values
    under ``norm_cell``.
    """
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    offenders = [(c, t) for c, t in zip(cols, types)
                 if t not in ALLOWED_DUCK_TYPES]
    if offenders:
        return cols, [], offenders
    tbl = rel.fetch_arrow_table()
    rows = [tuple(norm_cell(v) for v in row)
            for row in zip(*(tbl.column(i).to_pylist()
                             for i in range(tbl.num_columns)))] \
        if tbl.num_columns else []
    return cols, rows, offenders


def spark_norm_rows(cols, rows):
    return [tuple(norm_cell(v) for v in row) for row in rows]


def to_multiset(cols, norm_rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for row in norm_rows:
        key = tuple(row[i] for i in order)
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
            o_cols, o_norm, offenders = duck_fetch(con, ORACLES[name])
        except Exception as exc:
            failures.append(name)
            print("%-24s ORACLE SQL ERROR: %s"
                  % (name, str(exc).splitlines()[0]))
            continue
        if offenders:
            failures.append(name)
            print("%-24s ORACLE TYPE ERROR (driver-ambiguous dtypes, "
                  "CAST them): %s" % (name, offenders))
            continue
        ok = True
        if sorted(s_cols) != sorted(o_cols):
            ok = False
            print("%-24s SCHEMA MISMATCH spark=%s duck=%s"
                  % (name, sorted(s_cols), sorted(o_cols)))
        if len(s_rows) != len(o_norm):
            ok = False
            print("%-24s COUNT MISMATCH spark=%d duck=%d"
                  % (name, len(s_rows), len(o_norm)))
        if ok:
            sm = to_multiset(s_cols, spark_norm_rows(s_cols, s_rows))
            om = to_multiset(o_cols, o_norm)
            if sm != om:
                ok = False
                extra_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
                extra_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
                print("%-24s VALUE MISMATCH (%d rows)\n  spark-only: %s\n"
                      "  duck-only:  %s"
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
