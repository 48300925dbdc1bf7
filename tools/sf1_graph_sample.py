#!/usr/bin/env python3
"""sf1 oracle spot-check for the graph family (q_bfs, q_label_prop,
q_hits, q_pagerank, q_triangles, ...): same DuckDB oracle, same
canon/hash rules as compare_one.py, but the shared all-pairs k-NN edge
prelude is materialized ONCE and executed in source-id batches.

Why: every graph oracle opens with the identical CTE rebuilding the
3-NN edge set from embeddings via `emb a JOIN emb b` + a row_number
window. At sf1 that is 20k x 20k = 400M scored pairs; DuckDB's window
sort spills >80 GB of temp per query and dies on disk — five times
over for five queries. The window is PARTITION BY a.vid, so slicing
the build by source id is semantics-preserving (each partition lives
entirely inside one slice); this script proves that identity at sf0.1
(batched vs the verbatim single-shot prelude, row-for-row) before
trusting it at sf1, builds the sf1 edge table once across N parallel
workers, and splices `edges AS (SELECT ... FROM read_parquet(...))`
into each oracle in place of the prelude. Everything downstream of the
prelude runs VERBATIM from oracle_sql.json.

    python3 tools/sf1_graph_sample.py <bigSfDir> <verifyOutDir> q_a,q_b
      (verifyOutDir = graft.Verify's dump dir: <q>/…parquet + oracle_sql.json)

Appends compare_one-format JSON lines to <verifyOutDir>/../sample_results.jsonl.
"""
import sys, os, re, json, glob, time
from multiprocessing import Pool

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare_one import connect_views, read_spark_dump, compare

PRELUDE = re.compile(r"emb AS MATERIALIZED.*?WHERE rk <= 3\),", re.S)

CANONICAL_EDGES = """
WITH emb AS MATERIALIZED (
  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM {emb}),
lhs AS MATERIALIZED (SELECT * FROM emb WHERE vid >= {lo} AND vid < {hi})
SELECT src, dst FROM (
  SELECT a.vid AS src, b.vid AS dst,
    row_number() OVER (PARTITION BY a.vid
      ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
               b.vid) AS rk
  FROM lhs a JOIN emb b ON a.vid <> b.vid) t
WHERE rk <= 3"""


def emb_src(sf_dir):
    p = os.path.join(sf_dir, "embeddings.parquet")
    return f"read_parquet('{os.path.join(p, '*.parquet') if os.path.isdir(p) else p}')"


def build_slice(args):
    sf_dir, out_dir, lo, hi, threads = args
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    con.execute("SET temp_directory='/tmp/ducktmp'")
    q = CANONICAL_EDGES.format(emb=emb_src(sf_dir), lo=lo, hi=hi)
    con.execute(f"COPY ({q}) TO '{out_dir}/edges_{lo}_{hi}.parquet'")
    return (lo, hi)


def build_edges(sf_dir, out_dir, batch=500, workers=8, threads=4):
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs("/tmp/ducktmp", exist_ok=True)
    con = duckdb.connect()
    n = con.execute(f"SELECT max(vec_id) + 1 FROM {emb_src(sf_dir)}").fetchone()[0]
    slices = [(sf_dir, out_dir, lo, min(lo + batch, n), threads)
              for lo in range(0, n, batch)]
    t0 = time.time()
    with Pool(workers) as p:
        for i, _ in enumerate(p.imap_unordered(build_slice, slices)):
            print(f"  edge slice {i + 1}/{len(slices)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return n


def fidelity_check(small_sf_dir):
    """Batched build == the verbatim single-shot prelude at sf0.1,
    row-for-row. The batching is provably safe (the window partitions
    by src), but prove it empirically anyway before using it at sf1."""
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        build_edges(small_sf_dir, tmp, batch=300, workers=4, threads=2)
        con = duckdb.connect()
        single = con.execute(f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM {emb_src(small_sf_dir)}),
edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT a.vid AS src, b.vid AS dst,
      row_number() OVER (PARTITION BY a.vid
        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                 b.vid) AS rk
    FROM emb a JOIN emb b ON a.vid <> b.vid) t
  WHERE rk <= 3)
SELECT src, dst FROM edges ORDER BY src, dst""").fetchall()
        batched = con.execute(
            f"SELECT src, dst FROM read_parquet('{tmp}/*.parquet') "
            "ORDER BY src, dst").fetchall()
        assert single == batched, (
            f"batched edge build diverged at {small_sf_dir}: "
            f"{len(single)} vs {len(batched)} rows")
        print(f"fidelity: batched == single-shot at {small_sf_dir} "
              f"({len(single)} edges)", flush=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3].split(",")
    results_path = os.path.join(os.path.dirname(out_dir.rstrip("/")),
                                "sample_results.jsonl")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    fidelity_check("/root/testdata/sf0.1")

    edges_dir = "/tmp/knn_edges_sf1"
    if not glob.glob(f"{edges_dir}/*.parquet"):
        print("building sf1 k-NN edge table (batched canonical window)...",
              flush=True)
        build_edges(sf_dir, edges_dir)

    con = connect_views(sf_dir)
    con.execute("SET temp_directory='/tmp/ducktmp'")
    replacement = (f"edges AS (SELECT src, dst FROM "
                   f"read_parquet('{edges_dir}/*.parquet')),")
    for q in queries:
        sql, nsub = PRELUDE.subn(replacement, oracle[q])
        assert nsub == 1, f"{q}: prelude not found/unique in oracle SQL"
        t0 = time.time()
        exp = con.execute(sql).fetchdf()
        res = compare(q, read_spark_dump(out_dir, q), exp)
        res["method"] = "prelude-materialized (batched canonical window, " \
                        "fidelity-asserted at sf0.1)"
        print(json.dumps(res), f"[{time.time() - t0:.0f}s]", flush=True)
        with open(results_path, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
