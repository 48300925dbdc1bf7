#!/usr/bin/env python3
"""Incremental refresh of the full-surface sf1 sweep for a new round —
the r13 methodology, automated: the DuckDB oracle executions are the
expensive half (some needed 2h monolithically before the closure
runner), but they only need re-running where the ENGINE OUTPUT changed.

    # 1. dump the whole surface at sf1 with the new round's code
    #    (same settings as the recorded sweep: CPUS=32, 4 dump threads)
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_VERIFY_THREADS=4 \
      java -cp target/scala-2.13/classes:'/opt/spark/jars/*' $JOPTS -Xmx24g \
      graft.Verify <bigDir> <newOutDir>
    # 2. refresh: content-compare new dumps vs the previous sweep's,
    #    carry forward compare records for identical queries, re-run
    #    compare_one for changed ones
    python3 tools/sf1_refresh.py <bigDir> <oldOutDir> <newOutDir> \
        [--workers=8] [--timeout=1800]
    # 3. assemble as usual (results land in <newOutDir>/full_results.jsonl;
    #    copy/point sample_results.jsonl as before)
    python3 tools/sf1_assemble.py <round> <workdir>

A carried-forward record keeps its hash_match verdict and gains a
`carried_from` note naming the old dir — legitimate because the compare
is a pure function of (engine dump, oracle SQL, big tables), the big
tiling is deterministic (ScaleData), and the dump content was proven
identical under the driver's own canon (columns sorted by name, rows
sorted, floats at 9 significant digits). Queries whose dump CHANGED or
whose old record is missing/red are re-compared live; heavy closure /
graph-prelude families are routed to their dedicated runners
(sf1_heavy_closure.py / sf1_graph_sample.py) rather than run
monolithically.
"""
import json
import os
import re
import subprocess
import sys
import time
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from compare_one import read_spark_dump, canon, values_repr  # noqa: E402
from sf1_full_check import PRELUDE  # noqa: E402
from sf1_heavy_closure import NGRAM_QS, EMB_QS, newest_results  # noqa: E402


def dump_equal(args):
    old_dir, new_dir, q = args
    try:
        if not os.path.isdir(os.path.join(old_dir, q)):
            return (q, "new")
        a = read_spark_dump(old_dir, q)
        b = read_spark_dump(new_dir, q)
        if sorted(a.columns) != sorted(b.columns) or len(a) != len(b):
            return (q, "changed")
        same = values_repr(canon(a)) == values_repr(canon(b))
        return (q, "same" if same else "changed")
    except Exception as e:
        return (q, f"error: {e}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) if "=" in a else (a[2:], "1")
                for a in sys.argv[1:] if a.startswith("--"))
    big, old_dir, new_dir = args[0], args[1], args[2]
    workers = int(opts.get("workers", "8"))
    timeout = int(opts.get("timeout", "1800"))

    oracle = json.load(open(os.path.join(new_dir, "oracle_sql.json")))
    old_recs = newest_results(os.path.join(old_dir, "full_results.jsonl"))
    # the graph-prelude family's records live in the workdir-level
    # sample_results.jsonl (sf1_graph_sample.py output) — merge them so
    # unchanged graph dumps carry forward too
    old_samples = os.path.join(os.path.dirname(old_dir.rstrip("/")),
                               "sample_results.jsonl")
    for q, r in newest_results(old_samples).items():
        old_recs.setdefault(q, r)
    results_path = os.path.join(new_dir, "full_results.jsonl")

    qs = sorted(q for q in oracle if os.path.isdir(os.path.join(new_dir, q)))
    with ProcessPoolExecutor(workers) as ex:
        states = dict(ex.map(dump_equal, [(old_dir, new_dir, q) for q in qs]))
    n_same = sum(1 for s in states.values() if s == "same")
    print(f"dump compare: {n_same}/{len(qs)} content-identical", flush=True)

    carried, rerun, routed = [], [], []
    with open(results_path, "a") as f:
        for q in qs:
            old = old_recs.get(q)
            if states[q] == "same" and old and (
                    old.get("hash_match") or "expected_mismatch" in old):
                rec = dict(old)
                rec["carried_from"] = os.path.abspath(old_dir)
                rec["carried_note"] = (
                    "engine dump content-identical under the compare canon; "
                    "oracle compare carried forward (pure function of dump + "
                    "oracle SQL + deterministic tiling)")
                f.write(json.dumps(rec) + "\n")
                carried.append(q)
            elif q in NGRAM_QS + EMB_QS:
                routed.append((q, "tools/sf1_heavy_closure.py --run"))
            elif PRELUDE.search(oracle[q]):
                routed.append((q, "tools/sf1_graph_sample.py"))
            else:
                rerun.append(q)
    print(f"carried forward: {len(carried)}; live re-compare: {len(rerun)}; "
          f"routed to dedicated runners: {routed}", flush=True)

    lock = __import__("threading").Lock()

    def run_one(i_q):
        i, q = i_q
        env = dict(os.environ, DUCKDB_THREADS="8",
                   DUCKDB_MEMORY_LIMIT="16GB",
                   DUCKDB_TEMP_DIR=f"/tmp/ducktmp_rf{i}")
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(HERE, "compare_one.py"),
                 big, new_dir, q],
                capture_output=True, text=True, timeout=timeout, env=env)
            if p.returncode == 0 and p.stdout.strip():
                rec = json.loads(p.stdout.strip().splitlines()[-1])
            else:
                rec = {"query": q,
                       "error": (p.stderr or "no output").strip()[-500:]}
        except subprocess.TimeoutExpired:
            rec = {"query": q, "error": "oracle_timeout", "timeout_s": timeout}
        rec["elapsed_s"] = round(time.time() - t0, 1)
        with lock:
            with open(results_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"[{rec['elapsed_s']:8.1f}s] "
                  f"{'OK' if rec.get('hash_match') else 'CHECK'} {q}",
                  flush=True)

    rerun.sort(key=lambda q: len(oracle[q]))
    with ThreadPoolExecutor(max_workers=3) as ex:
        list(ex.map(run_one, enumerate(rerun)))
    print("refresh done; run the routed runners (if any), then "
          "sf1_assemble.py", flush=True)


if __name__ == "__main__":
    main()
