#!/usr/bin/env python3
"""Compare two Bench JSON outputs per query (totals are cross-JVM noisy;
per-query deltas are the signal). Usage:

    python3 tools/bench_compare.py OLD.json NEW.json [threshold] [--fail]

Accepts both formats:
  - the driver/stdout compact line ({"metric":"total",...,"queries":{...}})
    — NOTE this is per-query TRUNCATED past ~40 queries ("qtrunc"), so
    sub-0.6 s regressions are invisible in it;
  - the full detail file Bench writes to target/bench-detail.json
    ({"reps":N,"agg":"min","queries_min":{...}}) — committed per round as
    BENCHDETAIL_r{N}.json, this covers EVERY query.

Prints queries slower by more than `threshold` ratio (default 1.3),
new/removed queries, and both totals. With --fail, exits 1 if any query
regressed — the round-over-round guard."""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    # driver BENCH_r*.json wraps the bench line (escaped) in a "tail" field
    try:
        outer = json.loads(txt)
        if isinstance(outer, dict) and ("metric" in outer or "queries_min" in outer):
            return normalize(outer)
        if isinstance(outer, dict) and "tail" in outer:
            txt = outer["tail"]
    except json.JSONDecodeError:
        pass
    # tolerate sbt "[info] " prefixes / surrounding log lines; prefer the
    # full-detail line when both appear in a raw log
    for marker in ('{"reps"', '{"metric"'):
        i = txt.find(marker)
        if i >= 0:
            return normalize(json.JSONDecoder().raw_decode(txt[i:])[0])
    raise SystemExit(f"no bench JSON line in {path}")


def normalize(obj):
    """Map the bench-detail format onto the compact-line shape."""
    if "queries_min" in obj:
        q = obj["queries_min"]
        return {"value": sum(q.values()), "queries": q,
                "failed": obj.get("failed", [])}
    return obj


def main():
    args = [a for a in sys.argv[1:] if a != "--fail"]
    fail_on_regression = "--fail" in sys.argv[1:]
    old, new = load(args[0]), load(args[1])
    thr = float(args[2]) if len(args) > 2 else 1.3
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
    elif fail_on_regression:
        sys.exit(1)
    if fail_on_regression and new.get("failed"):
        sys.exit(1)


if __name__ == "__main__":
    main()
