#!/usr/bin/env python3
"""Full-surface sf1 oracle check: hash-compare EVERY oracle-backed
query against DuckDB at the big (tiled) SF — the round's spot-check
generalized from a per-family sample to the whole declared surface.

    # 1. dump every engine output + oracle_sql.json at the big SF
    java -cp target/scala-2.13/classes:$SPARK_JARS $JOPTS -Xmx24g \
        graft.Verify <bigSfDir> <outDir>
    # 2. compare everything (resumable; appends one JSON line each)
    python3 tools/sf1_full_check.py <bigSfDir> <outDir> \
        [--workers=3] [--timeout=1800] [--only=q_a,q_b] [--skip=q_c]
    # 3. big-memory sequential retry of everything still red —
    #    queries sharing one oracle TEXT are grouped so each heavy SQL
    #    runs once (run detached: heavy closures need 30-90+ min each)
    python3 tools/sf1_full_check.py <bigSfDir> <outDir> --retry \
        [--threads=24] [--mem=60GB]

Mechanics:
  - each query runs as its own `compare_one.py` subprocess under a
    wall timeout, so a runaway oracle (recursive-CTE cluster closures,
    O(n^2) prefix self-joins can need 30-45+ min EACH at sf1) is
    killed without taking the sweep down; the line records
    `oracle_timeout` with the elapsed bound instead of a result;
  - graph-family oracles whose shared all-pairs k-NN edge prelude
    out-spills the disk monolithically (the `WHERE rk <= 3` CTE —
    see tools/sf1_graph_sample.py, which batches it
    semantics-preservingly) are detected by the same regex and SKIPPED
    here by default: run sf1_graph_sample.py for those and merge;
  - workers default to 3 subprocesses x 8 DuckDB threads, 16 GB
    memory_limit each (DUCKDB_* env knobs in compare_one.connect_views)
    — sized so three heavy oracles can spill side by side without
    OOMing a 128 GB box that is also running the engine's JVM;
  - resumable: queries already present in <outDir>/full_results.jsonl
    are not re-run, so a second invocation only retries the gaps.

Cheap oracles run first (ordered by oracle SQL length — a good-enough
proxy: the recursive CTEs and batched self-joins are the longest
texts), so the bulk of the surface lands early and the tail of the
wall-clock is spent only on the known-heavy few.
"""
import sys, os, re, glob, json, subprocess, time
from concurrent.futures import ThreadPoolExecutor

HERE = os.path.dirname(os.path.abspath(__file__))
PRELUDE = re.compile(r"emb AS MATERIALIZED.*?WHERE rk <= 3\),", re.S)


def retry_heavy(big, out_dir, results_path, oracle, threads, mem):
    """--retry mode: sequential big-memory pass over every query whose
    newest record is not hash-matched. Queries sharing one oracle TEXT
    are grouped so the heavy SQL (recursive-CTE closures, shingle
    self-joins that need 30-90+ min at sf1) executes ONCE and is
    compared against every member's engine dump. Appends records;
    later lines win in sf1_assemble.py."""
    import duckdb
    from compare_one import read_spark_dump, compare
    newest = {}
    # merge the graph-family sample results too: those queries are
    # verified via the batched edge build (sf1_graph_sample.py) and
    # must not be retried monolithically here (the all-pairs k-NN
    # prelude out-spills the disk at sf1)
    for path in (results_path,
                 os.path.join(os.path.dirname(out_dir.rstrip("/")),
                              "sample_results.jsonl")):
        if os.path.exists(path):
            for line in open(path):
                try:
                    r = json.loads(line)
                    newest[r["query"]] = r
                except Exception:
                    pass
    red = [q for q in oracle
           if os.path.isdir(os.path.join(out_dir, q))
           and not PRELUDE.search(oracle[q])
           and not newest.get(q, {}).get("hash_match")
           and "expected_mismatch" not in newest.get(q, {})]
    groups = {}
    for q in red:
        groups.setdefault(oracle[q], []).append(q)
    # cheapest oracle text first — same proxy as the main sweep
    for sql, qs in sorted(groups.items(), key=lambda kv: len(kv[0])):
        con = duckdb.connect()
        con.execute(f"SET threads={threads}")
        con.execute(f"SET memory_limit='{mem}'")
        os.makedirs("/tmp/ducktmp_retry", exist_ok=True)
        con.execute("SET temp_directory='/tmp/ducktmp_retry'")
        for p in glob.glob(os.path.join(big, "*.parquet")):
            name = os.path.basename(p)[: -len(".parquet")]
            src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
        t0 = time.time()
        print(f"[retry] {qs}: running oracle ...", flush=True)
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            el = round(time.time() - t0, 1)
            print(f"[retry] {qs}: ORACLE FAILED after {el}s: {e}", flush=True)
            with open(results_path, "a") as f:
                for q in qs:
                    f.write(json.dumps({"query": q,
                                        "error": f"retry: {e}"[:400],
                                        "elapsed_s": el}) + "\n")
            con.close()
            continue
        el = round(time.time() - t0, 1)
        with open(results_path, "a") as f:
            for q in qs:
                rec = compare(q, read_spark_dump(out_dir, q), exp)
                rec["elapsed_s"] = el
                rec["note"] = (f"big-memory retry ({mem}/{threads}T), one "
                               f"oracle execution shared by {qs}")
                f.write(json.dumps(rec) + "\n")
                print(f"[retry] {q}: hash_match={rec['hash_match']} ({el}s)",
                      flush=True)
        con.close()
    print("[retry] done", flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) if "=" in a else (a[2:], "1")
                for a in sys.argv[1:] if a.startswith("--"))
    big, out_dir = args[0], args[1]
    workers = int(opts.get("workers", "3"))
    timeout = int(opts.get("timeout", "1800"))
    only = set(opts["only"].split(",")) if "only" in opts else None
    skip = set(opts.get("skip", "").split(",")) - {""}

    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results_path = os.path.join(out_dir, "full_results.jsonl")
    if "retry" in opts:
        sys.path.insert(0, HERE)
        retry_heavy(big, out_dir, results_path, oracle,
                    int(opts.get("threads", "24")),
                    opts.get("mem", "60GB"))
        return
    done = set()
    if os.path.exists(results_path):
        with open(results_path) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["query"])
                except Exception:
                    pass

    graph = sorted(q for q, sql in oracle.items() if PRELUDE.search(sql))
    todo = [q for q in oracle
            if q not in done and q not in skip and q not in graph
            and (only is None or q in only)
            and os.path.isdir(os.path.join(out_dir, q))]
    todo.sort(key=lambda q: len(oracle[q]))
    print(f"{len(oracle)} oracles; {len(done)} already done, "
          f"{len(graph)} graph-prelude (run sf1_graph_sample.py): {graph}; "
          f"{len(todo)} to run", flush=True)

    lock = __import__("threading").Lock()

    def run_one(i_q):
        i, q = i_q
        # per-TASK temp dir: completion order is not round-robin, so
        # an i%workers scheme can hand two live DuckDB subprocesses
        # the same spill directory and collide their block files
        env = dict(os.environ,
                   DUCKDB_THREADS="8", DUCKDB_MEMORY_LIMIT="16GB",
                   DUCKDB_TEMP_DIR=f"/tmp/ducktmp_t{i}")
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(HERE, "compare_one.py"),
                 big, out_dir, q],
                capture_output=True, text=True, timeout=timeout, env=env)
            if p.returncode == 0 and p.stdout.strip():
                rec = json.loads(p.stdout.strip().splitlines()[-1])
            else:
                rec = {"query": q, "error":
                       (p.stderr or "no output").strip()[-500:]}
        except subprocess.TimeoutExpired:
            rec = {"query": q, "error": "oracle_timeout",
                   "timeout_s": timeout}
        rec["elapsed_s"] = round(time.time() - t0, 1)
        with lock:
            with open(results_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            status = ("OK" if rec.get("hash_match") else
                      "TIMEOUT" if rec.get("error") == "oracle_timeout" else
                      "MISMATCH" if "hash_match" in rec else "ERROR")
            print(f"[{rec['elapsed_s']:8.1f}s] {status:8s} {q}", flush=True)
        return rec

    with ThreadPoolExecutor(max_workers=workers) as ex:
        recs = list(ex.map(run_one, enumerate(todo)))

    ok = sum(1 for r in recs if r.get("hash_match"))
    print(f"done: {ok}/{len(recs)} hash-matched this pass "
          f"-> {results_path}", flush=True)


if __name__ == "__main__":
    main()
