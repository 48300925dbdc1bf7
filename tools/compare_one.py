#!/usr/bin/env python3
"""Per-query DuckDB compare at ANY scale factor — the single-query
variant of local_verify.py's gate (same canonicalization and hash
rules: columns sorted by name, rows sorted by all columns, floats at
9 significant digits). Used for the per-round sf1 oracle spot-check
(CORRECTNESS_sf1_sample_r{N}.json):

    # 1. dump engine outputs + oracle_sql.json at the big SF
    java -cp target/scala-2.13/classes:$SPARK_JARS $JOPTS \
        graft.Verify <sfDir> <outDir> <query>
    # 2. run the DuckDB oracle over the same parquet and compare
    python3 tools/compare_one.py <sfDir> <outDir> <query>

Prints one JSON line {query, spark_rows, oracle_rows, rows_match,
schema_match, hash_match}. Heavy oracles (recursive CTEs, O(n^2)
self-joins) can take tens of minutes at sf1 — wrap in `timeout` and
record a reasoned fallback (e.g. hash-match at sf0.1) when the ORACLE,
not the engine, is the bottleneck. The canon/compare helpers are
importable (tools/sf1_graph_sample.py reuses them with a rewritten
edge prelude for the graph-family oracles, whose all-pairs k-NN CTE
out-spills the disk at sf1 when run monolithically per query).
"""
import sys, os, json, glob
import duckdb, pandas as pd
import numpy as np


def connect_views(sf_dir, con=None):
    """DuckDB connection with one view per parquet table in sf_dir
    (file or Spark-written directory). Optional env knobs so several
    compares can run side by side without oversubscribing the box
    (tools/sf1_full_check.py sets both per worker):
    DUCKDB_THREADS, DUCKDB_MEMORY_LIMIT, DUCKDB_TEMP_DIR."""
    con = con or duckdb.connect()
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
    if os.environ.get("DUCKDB_TEMP_DIR"):
        os.makedirs(os.environ["DUCKDB_TEMP_DIR"], exist_ok=True)
        con.execute(f"SET temp_directory='{os.environ['DUCKDB_TEMP_DIR']}'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    return con


def read_spark_dump(out_dir, qname):
    return pd.concat([pd.read_parquet(f) for f in
                      glob.glob(os.path.join(out_dir, qname, "*.parquet"))],
                     ignore_index=True)


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_repr(df):
    out = []
    for _, row in df.iterrows():
        r = []
        for v in row:
            if isinstance(v, (float, np.floating)): r.append(f"{float(v):.9g}")
            elif isinstance(v, np.integer): r.append(str(int(v)))
            elif isinstance(v, (np.bool_, bool)): r.append(str(bool(v)))
            else: r.append(str(v))
        out.append("|".join(r))
    return out


def compare(qname, got, exp):
    g, e = canon(got), canon(exp)
    res = {"query": qname, "spark_rows": len(g), "oracle_rows": len(e),
           "rows_match": len(g) == len(e),
           "schema_match": list(g.columns) == list(e.columns)}
    res["hash_match"] = bool(res["rows_match"] and res["schema_match"]
                             and values_repr(g) == values_repr(e))
    return res


if __name__ == "__main__":
    sf_dir, out_dir, qname = sys.argv[1], sys.argv[2], sys.argv[3]
    con = connect_views(sf_dir)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    got = read_spark_dump(out_dir, qname)
    exp = con.execute(oracle[qname]).fetchdf()
    print(json.dumps(compare(qname, got, exp)))
