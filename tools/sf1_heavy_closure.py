#!/usr/bin/env python3
"""Stepwise (semantics-preserving) execution of the heavy sf1 oracle
family that the monolithic sweep cannot finish: the five ngram-Jaccard
closure queries (q_dedup_clusters_ngram, q_dedup_keepers_ngram,
q_dedup_keepers_quality, q_dup_inflation, q_split_leakage) and the two
embedding-cosine closure queries (q_dedup_clusters,
q_dedup_clusters_star — one shared oracle TEXT).

Why the monolithic texts fail at sf1: the `sh a JOIN sh b ON
a.doc_id < b.doc_id` prelude evaluates list_intersect over ~1.25e9
document pairs (50k docs) — ~2h per execution at 40GB (r12's retry
needed 7,327s for ONE such text) — and the embeddings all-pairs OOMs
the 16GB sweep workers. Five ngram queries x 2h monolithic does not
fit any round budget.

What this runner does instead (each step an exact-equivalence
argument, PROVEN by --fidelity which byte-compares the decomposed
pipeline against the monolithic oracle at a small SF using the
driver's own canon):

  1. `pairs` via inverted index: unnest the (already list_distinct'd)
     shingle sets and group the shingle-equality self-join by
     (id_a, id_b) — count(*) IS len(list_intersect(a.s, b.s)) for
     distinct lists. Pairs sharing zero shingles cannot pass the
     Jaccard>=0.8 predicate (0/(la+lb) = 0, and the la+lb=0 case is
     NULL in DuckDB, excluded by WHERE), so restricting to candidates
     with inter>=1 is exact. Measured at sf1: candidate mass 12.7M
     pairs, max shingle df 25 — seconds, not hours.
  2. `comp` (connected components, cluster_id = min node id of the
     component over nodes that appear in edges — exactly what the
     oracle's reach/min(r) recursive CTE computes for a symmetric
     edge set) via union-find over the materialized pairs. This also
     sidesteps the reach-CTE blowup: reach materializes |component|^2
     rows, which for the embeddings graph at threshold 0.4 is ~4e8.
  3. Each oracle's FINAL select runs verbatim, with only the
     sh/pairs/edges/reach/closure CTE prelude textually replaced by
     the materialized tables (regex surgery, assert-guarded: every
     anchor must match exactly once).
  4. Embedding pairs: the `embedding::DOUBLE[]` cast is materialized
     once (float32->double is exact, per-pair cast == pre-cast), then
     the a.vec_id < b.vec_id cross join runs in vec_id chunks so each
     batch's intermediate stays in memory; list_cosine_similarity and
     the round(.,6) >= 0.4 predicate are DuckDB's own, unchanged.

Usage:
  # fidelity gate (REQUIRED once per code change; compares decomposed
  # vs monolithic for all 7 queries at the given small SF):
  python3 tools/sf1_heavy_closure.py --fidelity /root/testdata/sf0.01
  python3 tools/sf1_heavy_closure.py --fidelity /root/testdata/sf0.1
  # sf1 run (appends compare_one-format lines to
  # <outDir>/full_results.jsonl; later lines win in sf1_assemble.py):
  python3 tools/sf1_heavy_closure.py --run <bigSfDir> <outDir>
"""
import sys, os, re, json, time
import duckdb
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from compare_one import connect_views, read_spark_dump, compare, canon, values_repr  # noqa: E402

NGRAM_QS = ["q_dedup_clusters_ngram", "q_dedup_keepers_ngram",
            "q_dedup_keepers_quality", "q_dup_inflation", "q_split_leakage"]
EMB_QS = ["q_dedup_clusters", "q_dedup_clusters_star"]

# The shared shingle CTE, extracted verbatim from the oracle texts so
# the decomposition cannot drift from the declared SQL.
SH_RE = re.compile(r"sh AS \((.*?)\),\n(?:pairs|p) AS", re.S)
PAIRS_PRED_RE = re.compile(
    r"len\(list_intersect\(a\.s, b\.s\)\) \* 1\.0 /\n\s*"
    r"\(len\(a\.s\) \+ len\(b\.s\) - len\(list_intersect\(a\.s, b\.s\)\)\)"
    r" >= (0\.8)")


def extract_sh(sql):
    m = SH_RE.search(sql)
    assert m, "sh CTE anchor not found"
    return m.group(1)


def build_ngram_pairs(con, sh_body, threshold):
    """Materialize the Jaccard>=threshold pair set via inverted index.
    count(*) over the shingle-equality join == len(list_intersect)
    because the shingle lists are list_distinct'd in the sh CTE."""
    con.execute(f"""
CREATE OR REPLACE TEMP TABLE ngram_pairs AS
WITH sh AS ({sh_body}),
tok AS (SELECT doc_id, len(s) AS l, unnest(s) AS sg FROM sh),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         any_value(a.l) AS la, any_value(b.l) AS lb,
         count(*) AS inter
  FROM tok a JOIN tok b ON a.sg = b.sg AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT id_a, id_b FROM cand
WHERE inter * 1.0 / (la + lb - inter) >= {threshold}
""")
    return con.execute("SELECT count(*) FROM ngram_pairs").fetchone()[0]


def build_emb_pairs(con, sql, n_chunks=20):
    """Materialize the cosine>=0.4 embedding pair set, chunked on
    a.vec_id so each batch's cross-join intermediate is bounded."""
    assert "round(list_cosine_similarity(a.embedding::DOUBLE[], " \
        "b.embedding::DOUBLE[]), 6) >= 0.4" in sql
    con.execute("CREATE OR REPLACE TEMP TABLE emb_d AS "
                "SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings")
    lo, hi = con.execute("SELECT min(vec_id), max(vec_id) FROM emb_d").fetchone()
    con.execute("CREATE OR REPLACE TEMP TABLE emb_pairs "
                "(id_a BIGINT, id_b BIGINT)")
    step = max(1, (hi - lo + 1) // n_chunks + 1)
    c0 = lo
    while c0 <= hi:
        c1 = c0 + step
        t0 = time.time()
        con.execute(f"""
INSERT INTO emb_pairs
SELECT a.vec_id, b.vec_id
FROM emb_d a JOIN emb_d b ON a.vec_id < b.vec_id
WHERE a.vec_id >= {c0} AND a.vec_id < {c1}
  AND round(list_cosine_similarity(a.e, b.e), 6) >= 0.4
""")
        print(f"  emb chunk [{c0},{c1}) {time.time()-t0:.1f}s", flush=True)
        c0 = c1
    return con.execute("SELECT count(*) FROM emb_pairs").fetchone()[0]


def union_find_min(edges_df):
    """cluster_id = min node id per connected component, over nodes
    appearing in the edge list — the oracle's min(r) over the
    symmetric reach closure."""
    parent = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    a = edges_df["id_a"].to_numpy()
    b = edges_df["id_b"].to_numpy()
    for x, y in zip(a.tolist(), b.tolist()):
        if x not in parent:
            parent[x] = x
        if y not in parent:
            parent[y] = y
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by min so roots stay the component minimum
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    ids = sorted(parent)
    return pd.DataFrame({"id": ids, "cluster_id": [find(i) for i in ids]})


def rewrite_final(qname, sql):
    """Replace the heavy CTE prelude with references to the
    materialized tables; every oracle's FINAL logic runs verbatim."""
    if qname in EMB_QS:
        return "SELECT id, cluster_id FROM comp_t ORDER BY id"
    if qname == "q_dedup_clusters_ngram":
        return "SELECT id, cluster_id FROM comp_t ORDER BY id"
    if qname == "q_split_leakage":
        # p AS (pairs...) has no closure; keep everything from sp AS
        i = sql.index("sp AS (")
        assert sql.count("sp AS (") == 1
        return ("WITH p AS (SELECT id_a, id_b FROM ngram_pairs),\n"
                + sql[i:])
    # keepers_ngram / keepers_quality / dup_inflation: prelude ends at
    # the closure CTE  `comp AS (...)` / `cl AS (...)`
    for alias in ("comp", "cl"):
        anchor = (f"{alias} AS (SELECT id, min(r) AS cluster_id "
                  f"FROM reach GROUP BY id)")
        if anchor + "," in sql:
            tail = sql.split(anchor + ",", 1)[1]
            return (f"WITH {alias} AS "
                    f"(SELECT id, cluster_id FROM comp_t),\n" + tail)
        if anchor + "\n" in sql and alias == "comp":
            tail = sql.split(anchor, 1)[1].lstrip(",\n")
            return (f"WITH comp AS (SELECT id, cluster_id FROM comp_t)\n"
                    + tail)
    raise AssertionError(f"no closure anchor in {qname}")


def run_decomposed(con, oracle, qnames):
    """Returns {qname: DataFrame} for the 7 heavy queries, computed
    stepwise on `con` (tables/views for the SF dir already attached)."""
    out = {}
    ngram = [q for q in qnames if q in NGRAM_QS]
    emb = [q for q in qnames if q in EMB_QS]
    if ngram:
        ref = oracle[ngram[0]]
        sh_body = extract_sh(ref)
        m = PAIRS_PRED_RE.search(ref)
        assert m, "jaccard predicate anchor not found"
        t0 = time.time()
        n = build_ngram_pairs(con, sh_body, float(m.group(1)))
        print(f"  ngram_pairs: {n} rows {time.time()-t0:.1f}s", flush=True)
        for q in ngram:
            assert extract_sh(oracle[q]) == sh_body, f"sh drift in {q}"
        comp = union_find_min(
            con.execute("SELECT id_a, id_b FROM ngram_pairs").fetchdf())
        con.register("comp_t", comp)
        for q in ngram:
            t0 = time.time()
            out[q] = con.execute(rewrite_final(q, oracle[q])).fetchdf()
            print(f"  {q}: {len(out[q])} rows {time.time()-t0:.1f}s",
                  flush=True)
        con.unregister("comp_t")
    if emb:
        assert len({oracle[q] for q in emb}) == 1, "emb texts diverged"
        t0 = time.time()
        n = build_emb_pairs(con, oracle[emb[0]])
        print(f"  emb_pairs: {n} rows {time.time()-t0:.1f}s", flush=True)
        comp = union_find_min(
            con.execute("SELECT id_a, id_b FROM emb_pairs").fetchdf())
        con.register("comp_t", comp)
        for q in emb:
            out[q] = con.execute(rewrite_final(q, oracle[q])).fetchdf()
        con.unregister("comp_t")
    return out


def newest_results(path):
    newest = {}
    if os.path.exists(path):
        for line in open(path):
            try:
                r = json.loads(line)
                newest[r["query"]] = r
            except Exception:
                pass
    return newest


def main():
    if sys.argv[1] == "--fidelity":
        sf_dir = sys.argv[2]
        oracle_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
            "/tmp/graft_sf1full/verify_big", "oracle_sql.json")
        oracle = json.load(open(oracle_path))
        con = duckdb.connect()
        con.execute("SET threads=16")
        con.execute("SET memory_limit='40GB'")
        connect_views(sf_dir, con)
        got = run_decomposed(con, oracle, NGRAM_QS + EMB_QS)
        bad = []
        for q in NGRAM_QS + EMB_QS:
            t0 = time.time()
            exp = con.execute(oracle[q]).fetchdf()
            same = (values_repr(canon(got[q])) == values_repr(canon(exp))
                    and list(canon(got[q]).columns) == list(canon(exp).columns))
            print(f"FIDELITY {q}: {'EXACT' if same else 'DIVERGED'} "
                  f"({len(exp)} rows, monolithic {time.time()-t0:.1f}s)",
                  flush=True)
            if not same:
                bad.append(q)
        if bad:
            print(f"FIDELITY FAILED: {bad}", flush=True)
            sys.exit(1)
        print(f"FIDELITY OK: all {len(NGRAM_QS + EMB_QS)} decomposed "
              f"pipelines byte-exact vs monolithic at {sf_dir}", flush=True)
        return

    assert sys.argv[1] == "--run"
    big, out_dir = sys.argv[2], sys.argv[3]
    results_path = os.path.join(out_dir, "full_results.jsonl")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    newest = newest_results(results_path)
    todo = [q for q in NGRAM_QS + EMB_QS
            if not newest.get(q, {}).get("hash_match")]
    if not todo:
        print("nothing to do: all heavy queries already hash-matched")
        return
    con = duckdb.connect()
    con.execute("SET threads=16")
    con.execute("SET memory_limit='40GB'")
    os.makedirs("/tmp/ducktmp_closure", exist_ok=True)
    con.execute("SET temp_directory='/tmp/ducktmp_closure'")
    connect_views(big, con)
    t0 = time.time()
    got = run_decomposed(con, oracle, todo)
    note = ("stepwise closure runner (tools/sf1_heavy_closure.py): "
            "inverted-index pairs + union-find components + verbatim "
            "final select; decomposition byte-exact vs monolithic "
            "oracle at sf0.01 and sf0.1 (--fidelity)")
    with open(results_path, "a") as f:
        for q in todo:
            rec = compare(q, read_spark_dump(out_dir, q), got[q])
            rec["elapsed_s"] = round(time.time() - t0, 1)
            rec["note"] = note
            f.write(json.dumps(rec) + "\n")
            print(f"[closure] {q}: hash_match={rec['hash_match']}", flush=True)


if __name__ == "__main__":
    main()
