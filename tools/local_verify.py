#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each query's
parquet dump from Verify, run the matching oracle SQL in DuckDB over the
same test tables, and compare (columns sorted by name, rows sorted,
values hashed).

The driver's hasher is TYPE-SENSITIVE: a DuckDB HUGEINT (sum over
BIGINT), DECIMAL, or UINTEGER output column stringifies differently from
the int64/double Spark emits even when every value is numerically equal.
Round 6 shipped five red queries because this script coerced both sides
through pandas (which silently narrows those types) — so before any value
comparison we now assert every oracle output column's DuckDB type is in
ALLOWED_TYPES and fail naming the offending column. `--typescan` runs
only that static check over an oracle_sql.json (no Verify output needed).

Usage: local_verify.py <sfDir> <verifyOutDir>
       local_verify.py --typescan <sfDir> <oracle_sql.json>"""
import sys, os, json, glob
import duckdb, pandas as pd
import numpy as np

# The only DuckDB result types whose text form matches the driver's
# rendering of the corresponding Spark type (INTEGER = int32 stringifies
# identically to Spark's IntegerType, proven by the green int32 scan
# queries every round). Everything else (HUGEINT, DECIMAL, UINTEGER,
# TIMESTAMP, ...) must be cast in the oracle SQL.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE", "BOOLEAN"}

def type_violations(con, sql):
    """Columns of `sql`'s result whose DuckDB type is outside
    ALLOWED_TYPES, as (column, type) pairs — static, runs LIMIT 0."""
    rel = con.sql(sql)
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t) not in ALLOWED_TYPES]

if sys.argv[1] == "--typescan":
    sf_dir, oracle_path = sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    n_bad = 0
    for qname in sorted(oracle):
        try:
            bad = type_violations(con, oracle[qname])
        except Exception as e:
            print(f"ORA-ERR  {qname}: {e}"); n_bad += 1; continue
        if bad:
            print(f"TYPES    {qname}: {bad}"); n_bad += 1
    print(f"\n== typescan: {n_bad} oracle(s) with disallowed output types "
          f"(allowed: {sorted(ALLOWED_TYPES)}) ==")
    sys.exit(1 if n_bad else 0)

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # a Spark-written table is a DIRECTORY of part files (the ScaleData
    # sf1 layout); a driver-written one is a single file
    src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

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
        bad_types = type_violations(con, oracle[qname])
        if bad_types:
            print(f"TYPES    {qname}: oracle output columns outside "
                  f"{sorted(ALLOWED_TYPES)}: {bad_types}")
            n_fail += 1; continue
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
