#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate:
  1. expects `sbt runMain graft.Verify <sfDir> <outDir>` to have been run
  2. loads each <outDir>/<name> parquet result
  3. runs the matching oracle_sql.json entry in DuckDB over the sf tables
  4. canonicalizes both (columns sorted by name, rows sorted) and compares

Usage: check_verify.py <sfDir> <outDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(v)  # normalize numpy
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(
        (x is None, str(type(x)), x) for x in t))
    header = tuple(f"{cols[i]}:{types[i]}" for i in order)
    return [header] + out


def vrepr(x):
    """Representation-sensitive value identity — approximates the driver's
    value hasher, which distinguishes Decimal('1.40') from 1.4 and from
    Decimal('1.4') even though they compare == in Python."""
    return (type(x).__name__, repr(x))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        try:
            got_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [c[0] for c in got_rel.description]
            got_types = [str(c[1]) for c in got_rel.description]
            got = canon(got_rel.fetchall(), got_cols, got_types)
        except Exception as e:
            results[name] = f"LOAD-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(got)-1} rows)" \
                if len(got) > 1 else "rows-only EMPTY(!)"
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_cols = [c[0] for c in exp_rel.description]
            exp_types = [str(c[1]) for c in exp_rel.description]
            exp = canon(exp_rel.fetchall(), exp_cols, exp_types)
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"
            continue
        if got[0] != exp[0]:
            results[name] = f"SCHEMA-MISMATCH got={got[0]} exp={exp[0]}"
        elif len(got) != len(exp):
            results[name] = f"ROWCOUNT-MISMATCH got={len(got)-1} exp={len(exp)-1}"
        else:
            diff = None
            for i, (g, e) in enumerate(zip(got[1:], exp[1:])):
                ok = True
                for gv, ev in zip(g, e):
                    if isinstance(gv, float) and isinstance(ev, float) \
                            and math.isnan(gv) and math.isnan(ev):
                        continue
                    if vrepr(gv) != vrepr(ev):
                        ok = False
                if not ok:
                    diff = (i, g, e)
                    break
            results[name] = "OK" if diff is None else \
                f"VALUE-MISMATCH row{diff[0]} got={diff[1]} exp={diff[2]}"

    width = max(len(n) for n in results)
    n_ok = sum(1 for v in results.values() if v == "OK")
    n_ro = sum(1 for v in results.values() if v.startswith("rows-only ("))
    for name in sorted(results):
        print(f"{name:<{width}}  {results[name]}")
    print(f"\n{n_ok} OK, {n_ro} rows-only, "
          f"{len(results) - n_ok - n_ro} problems / {len(results)} total")
    sys.exit(0 if len(results) - n_ok - n_ro == 0 else 1)


if __name__ == "__main__":
    main()
