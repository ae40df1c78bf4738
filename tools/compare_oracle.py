#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run
the matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables, sort columns by name, and compare: counts/strings exact, floats
with relative tolerance 1e-9.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return ("f", v)
    return ("x", str(v))


def eq(a, b):
    ka, va = norm(a)
    kb, vb = norm(b)
    if ka == "f" or kb == "f":
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return va == vb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got = duckdb.connect().execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns want={wcols} got={gcols}")
            n_fail += 1
            continue
        wrows = [[r[c] for c in wcols] for r in want.to_pylist()]
        grows = [[r[c] for c in wcols] for r in got.to_pylist()]
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rowcount want={len(wrows)} got={len(grows)}")
            n_fail += 1
            continue
        bad = None
        for i, (w, g) in enumerate(zip(wrows, grows)):
            for c, (wv, gv) in zip(wcols, zip(w, g)):
                if not eq(wv, gv):
                    bad = (i, c, wv, gv)
                    break
            if bad:
                break
        if bad:
            i, c, wv, gv = bad
            print(f"FAIL {name}: row {i} col {c}: want={wv!r} got={gv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(wrows)} rows)")
            n_pass += 1
    # queries with no oracle: rows-only
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            n = duckdb.connect().execute(
                f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {name} (rows-only: {n})")
            if n > 0:
                n_pass += 1
            else:
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
