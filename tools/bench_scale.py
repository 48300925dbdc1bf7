#!/usr/bin/env python3
"""Build BENCHSCALE_r{N}.json from two bench-detail runs of graft.Bench
(same code, same machine, idle) at two scale factors — the measured
scaling curve behind every "designed for 100 TB" claim.

    bench_scale.py <round> <small.detail.json> <big.detail.json> \
        [--factor 10] [--small sf0.1] [--big sf1]

Per query: warm-min seconds at both SFs and the time ratio. A query is
flagged when ratio > factor * SLACK (default slack 1.3 — "scaling worse
than ~1.3x linear"); sub-linear ratios are expected for queries bound by
fixed dimensions or constant anchors. Queries that failed at the big SF
(by-design require() caps on exactness anchors) are listed separately —
a cap firing at scale is the designed behavior, not a regression, but it
must be named, never silent.
"""
import json
import sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = dict(a.split("=", 1) if "=" in a else (a, True)
            for a in sys.argv[1:] if a.startswith("--"))
rnd = int(args[0])
small = json.load(open(args[1]))["queries_min"]
big = json.load(open(args[2]))["queries_min"]
factor = float(str(opts.get("--factor", 10)))
slack = 1.3
sf_small = str(opts.get("--small", "sf0.1"))
sf_big = str(opts.get("--big", "sf1"))

rows = {}
for q in sorted(small):
    if q in big:
        ratio = big[q] / small[q] if small[q] > 0 else None
        rows[q] = {"t_small": small[q], "t_big": big[q],
                   "ratio": round(ratio, 2) if ratio else None}
failed_big = sorted(set(small) - set(big))
flagged = sorted((q for q, r in rows.items()
                  if r["ratio"] and r["ratio"] > factor * slack),
                 key=lambda q: -rows[q]["ratio"])
sub_linear = sum(1 for r in rows.values() if r["ratio"] and r["ratio"] <= factor)

# --notes=<file.json>: {"query": "annotation"} merged into the per-query
# rows — the place measured output-growth justifications live for
# flagged-but-output-bound queries (a pair query whose OUTPUT grows
# super-linearly is allowed to cost super-linearly; the note must
# quantify it, never assert it). An entry may also be an object
# {"note": str, "char_bound": true}: char-bound queries get a computed
# char_norm_ratio = time_ratio / char_ratio, so the "linear in input
# bytes, not rows" claim is ARITHMETIC in the artifact, not prose.
#
# The char ratio itself is MEASURED here, not asserted: --small-dir/
# --big-dir point at the two sf dirs and duckdb sums
# length(documents.text) in each (the tiling's token remap grows chars
# faster than rows, so rows×10 != chars×10).
char_ratio = chars = None
small_dir = opts.get("--small-dir")
big_dir = opts.get("--big-dir")
if small_dir and small_dir is not True and big_dir and big_dir is not True:
    import duckdb, os
    def total_chars(d):
        p = os.path.join(d, "documents.parquet")
        if os.path.isdir(p):  # Spark-written table = directory of parts
            p = os.path.join(p, "*.parquet")
        return duckdb.sql(
            f"SELECT sum(length(text)) FROM read_parquet('{p}')"
        ).fetchone()[0]
    chars = {"small": total_chars(small_dir), "big": total_chars(big_dir)}
    char_ratio = round(chars["big"] / chars["small"], 2)

notes_path = opts.get("--notes")
if notes_path and notes_path is not True:
    for q, note in json.load(open(notes_path)).items():
        if q not in rows:
            continue
        if isinstance(note, dict):
            rows[q]["note"] = note["note"]
            if note.get("char_bound"):
                if char_ratio is None:
                    sys.exit(f"{q} is marked char_bound but no --small-dir/"
                             "--big-dir given to measure the char ratio")
                rows[q]["char_norm_ratio"] = round(
                    rows[q]["ratio"] / char_ratio, 2)
        else:
            rows[q]["note"] = note

out = {
    "round": rnd,
    "sf_small": sf_small,
    "sf_big": sf_big,
    "row_factor": factor,
    **({"documents_chars_small": chars["small"],
        "documents_chars_big": chars["big"],
        "char_ratio": char_ratio} if char_ratio is not None else {}),
    "flag_threshold_ratio": round(factor * slack, 2),
    "n_compared": len(rows),
    "n_sub_linear": sub_linear,
    "flagged_super_linear": flagged,
    "failed_at_big_sf": failed_big,
    "sum_small_sec": round(sum(r["t_small"] for r in rows.values()), 2),
    "sum_big_sec": round(sum(r["t_big"] for r in rows.values()), 2),
    "queries": rows,
}
path = f"BENCHSCALE_r{rnd:02d}.json"
json.dump(out, open(path, "w"), indent=1)
print(f"wrote {path}: {len(rows)} compared, {sub_linear} at-or-under "
      f"linear ({factor}x), {len(flagged)} flagged over "
      f"{out['flag_threshold_ratio']}x, {len(failed_big)} failed at {sf_big}")
for q in flagged:
    r = rows[q]
    print(f"  FLAG {q}: {r['t_small']}s -> {r['t_big']}s ({r['ratio']}x)")
for q in failed_big:
    print(f"  FAILED@{sf_big} {q}")
