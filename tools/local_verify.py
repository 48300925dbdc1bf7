#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each query's
parquet dump from Verify, run the matching oracle SQL in DuckDB over the
same test tables, and compare (columns sorted by name, rows sorted,
values hashed). Usage: local_verify.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb, pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def values_repr(df: pd.DataFrame):
    out = []
    for _, row in df.iterrows():
        r = []
        for v in row:
            if isinstance(v, float) or isinstance(v, np.floating):
                r.append(f"{float(v):.9g}")
            elif isinstance(v, (np.integer,)):
                r.append(str(int(v)))
            elif isinstance(v, (np.bool_, bool)):
                r.append(str(bool(v)))
            else:
                r.append(str(v))
        out.append("|".join(r))
    return out

n_pass = n_fail = n_skip = 0
for qdir in sorted(glob.glob(os.path.join(out_dir, "q_*"))):
    qname = os.path.basename(qdir)
    files = glob.glob(os.path.join(qdir, "*.parquet"))
    if not files:
        print(f"MISSING  {qname}: no parquet written"); n_fail += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if qname not in oracle:
        print(f"NOORACLE {qname}: rows={len(got)}"); n_skip += 1
        if len(got) == 0: print(f"  !! zero rows")
        continue
    try:
        exp = con.execute(oracle[qname]).fetchdf()
    except Exception as e:
        print(f"ORA-ERR  {qname}: {e}"); n_fail += 1; continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"COLS     {qname}: spark={list(g.columns)} duck={list(e.columns)}")
        n_fail += 1; continue
    if len(g) != len(e):
        print(f"ROWS     {qname}: spark={len(g)} duck={len(e)}"); n_fail += 1; continue
    gv, ev = values_repr(g), values_repr(e)
    bad = [i for i, (a, b) in enumerate(zip(gv, ev)) if a != b]
    if bad:
        i = bad[0]
        print(f"VALUES   {qname}: {len(bad)}/{len(gv)} rows differ; first @{i}:")
        print(f"  spark: {gv[i]}")
        print(f"  duck : {ev[i]}")
        n_fail += 1
    else:
        print(f"PASS     {qname} ({len(g)} rows)"); n_pass += 1

print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle ==")
sys.exit(1 if n_fail else 0)
