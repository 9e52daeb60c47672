#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: compare Verify's
parquet dumps against the DuckDB oracle on the same tables.

Usage: tools/check.py <sfDir> <outDir> [query ...]
(run tools/run.sh graft.Verify <sfDir> <outDir> first)
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{qdir}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"skip {name}: rows-only ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(got, exp)
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

def compare(got: pd.DataFrame, exp: pd.DataFrame):
    if sorted(got.columns) != sorted(exp.columns):
        return False, f"columns differ: {sorted(got.columns)} vs {sorted(exp.columns)}"
    if len(got) != len(exp):
        return False, f"row count {len(got)} vs {len(exp)}"
    g = got[sorted(got.columns)].reset_index(drop=True)
    e = exp[sorted(exp.columns)].reset_index(drop=True)
    for c in g.columns:
        gv, ev = g[c], e[c]
        # normalize dtypes the way a value-hash would see them
        try:
            if gv.dtype != ev.dtype:
                gv = gv.astype(object)
                ev = ev.astype(object)
        except Exception:
            pass
        neq = []
        for i in range(len(gv)):
            a, b = gv.iloc[i], ev.iloc[i]
            if pd.isna(a) and pd.isna(b):
                continue
            if a != b:
                neq.append((i, a, b))
            if len(neq) >= 3:
                break
        if neq:
            return False, f"col {c} differs at rows {neq}"
    return True, ""

if __name__ == "__main__":
    main()
