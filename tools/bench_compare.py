#!/usr/bin/env python3
"""Compare two Bench JSON outputs per query (totals are cross-JVM noisy;
per-query deltas are the signal). Usage:

    python3 tools/bench_compare.py BENCH_r01.json current.json [threshold]

Prints queries slower by more than `threshold` ratio (default 1.3),
new/removed queries, and both totals."""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    # driver BENCH_r*.json wraps the bench line (escaped) in a "tail" field
    try:
        outer = json.loads(txt)
        if isinstance(outer, dict) and "metric" in outer:
            return outer
        if isinstance(outer, dict) and "tail" in outer:
            txt = outer["tail"]
    except json.JSONDecodeError:
        pass
    # tolerate sbt "[info] " prefixes / surrounding log lines
    i = txt.find('{"metric"')
    if i >= 0:
        return json.JSONDecoder().raw_decode(txt[i:])[0]
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old["queries"], new["queries"]
    print(f"old total {old['value']:.1f}s ({len(oq)} queries)  "
          f"new total {new['value']:.1f}s ({len(nq)} queries)")
    if new.get("failed"):
        print(f"FAILED in new run: {new['failed']}")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("added:  " + ", ".join(f"{q} ({nq[q]:.2f}s)" for q in added))
    if removed:
        print("removed: " + ", ".join(removed))
    slower = [(nq[q] / oq[q], q) for q in oq.keys() & nq.keys()
              if oq[q] > 0 and nq[q] / oq[q] > thr and nq[q] - oq[q] > 0.3]
    for ratio, q in sorted(slower, reverse=True):
        print(f"SLOWER {q}: {oq[q]:.2f}s -> {nq[q]:.2f}s ({ratio:.2f}x)")
    if not slower:
        print(f"no query regressed beyond {thr}x (+0.3s absolute)")


if __name__ == "__main__":
    main()
