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
import sys, os, re, json, subprocess, time
from concurrent.futures import ThreadPoolExecutor

HERE = os.path.dirname(os.path.abspath(__file__))
PRELUDE = re.compile(r"emb AS MATERIALIZED.*?WHERE rk <= 3\),", re.S)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--"))
    big, out_dir = args[0], args[1]
    workers = int(opts.get("workers", "3"))
    timeout = int(opts.get("timeout", "1800"))
    only = set(opts["only"].split(",")) if "only" in opts else None
    skip = set(opts.get("skip", "").split(",")) - {""}

    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results_path = os.path.join(out_dir, "full_results.jsonl")
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
        env = dict(os.environ,
                   DUCKDB_THREADS="8", DUCKDB_MEMORY_LIMIT="16GB",
                   DUCKDB_TEMP_DIR=f"/tmp/ducktmp_w{i % workers}")
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
