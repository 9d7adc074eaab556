#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads Verify's output dir (per-query parquet + oracle_sql.json), runs each
oracle in DuckDB over the same sf dir, and compares: row count, schema
(column names, sorted), and a value hash over rows (columns sorted by name).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob
import os

import duckdb
import pyarrow.parquet as pq


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        # repr of a double is stable; both sides produce identical doubles
        return repr(val)
    return str(val)


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, list(zip(*data)) if data else []


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Second connection under a maximally-hostile session timezone (UTC+14):
    # the driver's DuckDB inherits ITS box's TZ, so any oracle whose result
    # depends on the session timezone (TIMESTAMPTZ -> DATE casts, now(),
    # date_trunc over tz-aware values) would hash-differently there while
    # passing here. Running every oracle under both TZs makes TZ-sensitivity
    # a locally-failing class instead of a driver-only surprise (the r5
    # gate-divergence lesson: the replica must be HARDER than the gate).
    con_tz = duckdb.connect()
    con_tz.sql("SET TimeZone='Pacific/Kiritimati'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        con_tz.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(oracle):
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        got = pq.read_table(pdir)
        try:
            exp = con.sql(oracle[name]).arrow()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        # HUGEINT hazard: duckdb returns sum(BIGINT) as HUGEINT/decimal128.
        # Locally str(Decimal('123')) == '123' and the compare passes, but
        # the driver's gate canonicalizes HUGEINT differently (r5: the only
        # four hash-red queries were exactly the four with decimal128 oracle
        # columns). Any decimal-typed oracle column is therefore a FAIL here
        # even though values match — the oracle must CAST sums to BIGINT.
        import pyarrow as pa
        decs = [f.name for f in exp.schema if pa.types.is_decimal(f.type)]
        if decs:
            results[name] = f"HUGEINT_HAZARD: oracle cols {decs} are decimal — CAST to BIGINT"
            continue
        gc, gr = table_rows(got)
        ec, er = table_rows(exp)
        try:
            tzc, tzr = table_rows(con_tz.sql(oracle[name]).arrow())
            if (tzc, [tuple(canon(x) for x in r) for r in tzr]) != \
               (ec, [tuple(canon(x) for x in r) for r in er]):
                results[name] = "TZ_SENSITIVE: oracle result differs under UTC+14"
                continue
        except Exception as e:
            results[name] = f"TZ_ORACLE_ERROR: {e}"
            continue
        # dtype note: exact pyarrow dtypes legitimately differ between the
        # engines (INT96 -> naive timestamp[ns] vs duckdb timestamp[us];
        # list element names/nullability) — values are what must match, so
        # schema comparison stays name-based like the driver's.
        if gc != ec:
            results[name] = f"SCHEMA: spark={gc} duck={ec}"
        elif len(gr) != len(er):
            results[name] = f"ROWS: spark={len(gr)} duck={len(er)}"
        else:
            bad = None
            for i, (a, b) in enumerate(zip(gr, er)):
                ca = tuple(canon(x) for x in a)
                cb = tuple(canon(x) for x in b)
                if ca != cb:
                    bad = (i, ca, cb)
                    break
            results[name] = "OK" if bad is None else f"VALUES@{bad[0]}: spark={bad[1]} duck={bad[2]}"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        mark = "PASS" if v == "OK" else "FAIL"
        print(f"{mark} {k}: {v if v != 'OK' else ''}")
    # queries with no oracle -> rows-only
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            n = pq.read_table(p).num_rows
            print(f"ROWS-ONLY {name}: {n} rows")
    print(f"== {n_ok}/{len(oracle)} oracle-checked queries pass ==")
    return 0 if n_ok == len(oracle) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
