#!/usr/bin/env python3
"""Merge per-query minima across bench-detail runs — the cross-order
minimum the noise methodology prescribes (see docs/THROUGHPUT.md: the
r9 audit found multi-second POSITIONAL machine transients that inflate
runs of consecutive queries in BOTH reps of a single-order run; minima
across one ascending and one descending fresh JVM put every query far
from the transient in at least one run).

    python3 tools/merge_details.py <out.json> <detail1.json> <detail2.json> ...

The merged file is what ships as BENCHDETAIL_r{N}.json and feeds
tools/bench_scale.py.
"""
import json
import sys

out = {}
reps = None
canary_runs = []
canary_str_runs = []
for p in sys.argv[2:]:
    d = json.load(open(p))
    reps = d.get("reps")
    # raw detail carries canary_start/end; an already-merged artifact
    # (re-merging across same-code sessions) carries canary_runs — both
    # feed the session-min anchors
    if "canary_start" in d:
        canary_runs.append([d["canary_start"], d.get("canary_end")])
    canary_runs.extend(d.get("canary_runs", []))
    if "canary_str_start" in d:
        canary_str_runs.append([d["canary_str_start"], d.get("canary_str_end")])
    canary_str_runs.extend(d.get("canary_str_runs", []))
    for k, v in d["queries_min"].items():
        out[k] = min(out.get(k, 1e9), v)
note = ("per-query min across one ascending and one descending fresh-JVM "
        "2-pass run (Bench runs reps as whole-surface passes in "
        "alternating order inside each JVM, so each query carries four "
        "time-separated samples per SF)")
merged = {"reps": reps, "agg": "min", "note": note, "queries_min": out}
if canary_runs:
    # the machine-era anchors ride the merged artifact too: per-run
    # [start, end] readings plus the session min (floors divide by it);
    # the string/expansion canary (r12+) travels beside the hash/shuffle
    # one so bench_compare can normalize per workload class
    merged["canary_runs"] = canary_runs
    merged["canary_min"] = min(c for run in canary_runs
                               for c in run if c is not None)
if canary_str_runs:
    merged["canary_str_runs"] = canary_str_runs
    merged["canary_str_min"] = min(c for run in canary_str_runs
                                   for c in run if c is not None)
json.dump(merged, open(sys.argv[1], "w"), indent=1)
print(f"wrote {sys.argv[1]}: {len(out)} queries, sum {sum(out.values()):.1f}s")
