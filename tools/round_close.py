#!/usr/bin/env python3
"""Round-close checklist gate. Run before the round ends:

    python3 tools/round_close.py <round> [sfDir]

Checks, in order:
  1. BENCHDETAIL_r{N}.json exists and its queries_min keys cover EVERY
     query declared in SparkEntry.scala (r6 shipped a stale mid-round
     detail file covering 153/230 — this is the gate against that).
  2. Oracle output types are in the driver-safe set (local_verify.py
     --typescan): a HUGEINT/DECIMAL/UINTEGER oracle column hash-fails
     at the driver even when values match.
  3. The newest committed BENCHSCALE_r*.json postdates every commit
     touching operator/kernel/query sources (r8 shipped a pre-fix scale
     curve as the round's evidence — this is the gate against that).
  4. docs/QUERIES.md is regenerated (stale index = wrong judge picture).

Exit 0 only when all gates pass. The typescan needs an oracle_sql.json;
pass sfDir (default /root/testdata/sf0.01) and the script dumps one via
`graft.Verify <sfDir> <tmp> none` (the no-match filter skips queries).
"""
import json
import os
import re
import subprocess
import sys
import tempfile

rnd = int(sys.argv[1])
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
failures = []

# -- 1. bench-detail coverage ------------------------------------------
# declarations live in the per-family objects under graft/entry/
import glob as _glob
declared = set()
for p in _glob.glob(os.path.join(repo, "src/main/scala/graft/entry/*Queries.scala")):
    declared |= set(re.findall(r'"(q_[a-z_0-9]+)" -> \(\(s', open(p).read()))
detail_path = os.path.join(repo, f"BENCHDETAIL_r{rnd:02d}.json")
if not os.path.exists(detail_path):
    failures.append(f"missing {detail_path} — run Bench at sf0.1 and copy "
                    "target/bench-detail.json there")
else:
    detail = json.load(open(detail_path))
    have = set(detail.get("queries_min", {}))
    missing = sorted(declared - have)
    extra = sorted(have - declared)
    if missing:
        failures.append(f"BENCHDETAIL_r{rnd:02d} misses {len(missing)}/"
                        f"{len(declared)} declared queries: {missing[:8]}...")
    if extra:
        failures.append(f"BENCHDETAIL_r{rnd:02d} has undeclared keys: {extra[:8]}")
    print(f"bench-detail: {len(have)}/{len(declared)} declared queries covered")

# -- 2. oracle output types --------------------------------------------
with tempfile.TemporaryDirectory() as tmp:
    jars = ":".join(
        os.path.join("/opt/spark/jars", j)
        for j in os.listdir("/opt/spark/jars") if j.endswith(".jar"))
    cp = os.path.join(repo, "target/scala-2.13/classes") + ":" + jars
    dump = subprocess.run(
        ["java", "-cp", cp, "-Xmx4g",
         "--add-opens=java.base/java.lang=ALL-UNNAMED",
         "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
         "--add-opens=java.base/java.io=ALL-UNNAMED",
         "--add-opens=java.base/java.net=ALL-UNNAMED",
         "--add-opens=java.base/java.nio=ALL-UNNAMED",
         "--add-opens=java.base/java.util=ALL-UNNAMED",
         "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
         "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
         "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
         "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
         "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
         "graft.Verify", sf_dir, tmp, "none"],
        capture_output=True, text=True)
    oracle_json = os.path.join(tmp, "oracle_sql.json")
    if not os.path.exists(oracle_json):
        failures.append(f"oracle_sql.json dump failed: {dump.stderr[-400:]}")
    else:
        scan = subprocess.run(
            [sys.executable, os.path.join(repo, "tools/local_verify.py"),
             "--typescan", sf_dir, oracle_json],
            capture_output=True, text=True)
        print(scan.stdout.strip().splitlines()[-1])
        if scan.returncode != 0:
            failures.append("oracle typescan failed:\n" + scan.stdout)

# -- 3. bench-artifact freshness (BENCHSCALE and BENCHDETAIL) ----------
# The r8 postmortem: a scale curve was committed, the flagged operators
# were then fixed, and the STALE pre-fix measurements shipped as the
# round's evidence. Gate: the newest committed bench artifact must have
# no operator/kernel/query commits AFTER it in COMMIT ANCESTRY — the r9
# wall-clock-timestamp compare could be fooled by rebases/cherry-picks
# with preserved dates; `git rev-list <artifact-commit>..HEAD -- <dirs>`
# is exact under both. BENCHDETAIL gets the same gate (r9 carried it for
# BENCHSCALE only — a stale warm-min detail, the evidence the driver-
# overhead ratio is judged against, could still ship).
# Every dir whose code a BENCHED query executes. sources/ (Tables,
# Layout — q_zorder_scan, q_bucket_join), multimodal/ (q_image_decode,
# q_audio_decode) and the graft/*.scala roots (SparkEntry wires the
# declarations; Bench IS the measurement harness) are hot: a commit to
# any of them after the artifacts ships a stale curve through a green
# gate — exactly the r8 postmortem. streaming/ and geonames/ stay out,
# documented: no declared bench query executes code from either (the
# stream twins are spec-only, the geonames path is unit/golden-tested).
HOT_DIRS = ["src/main/scala/graft/operators",
            "src/main/scala/graft/functions",
            "src/main/scala/graft/entry",
            "src/main/scala/graft/sources",
            "src/main/scala/graft/multimodal",
            "src/main/scala/graft/SparkEntry.scala",
            "src/main/scala/graft/Bench.scala",
            "src/main/scala/graft/Verify.scala",
            "src/main/scala/graft/GraftExtensions.scala"]


def last_commit_of(path):
    r = subprocess.run(["git", "log", "-1", "--format=%H", "--", path],
                       cwd=repo, capture_output=True, text=True)
    return r.stdout.strip() or None


def commits_after(commit, paths):
    """Hot-dir commits strictly after `commit` in ancestry (exact under
    rebases and amended dates, unlike wall-clock %ct compares)."""
    r = subprocess.run(["git", "rev-list", f"{commit}..HEAD", "--"] + paths,
                       cwd=repo, capture_output=True, text=True)
    return [c for c in r.stdout.split() if c]


def freshness_gate(pattern, rerun_hint):
    files = sorted(f for f in os.listdir(repo) if re.fullmatch(pattern, f))
    if not files:
        failures.append(f"no {pattern} committed — {rerun_hint}")
        return
    latest = files[-1]
    commit = last_commit_of(latest)
    if commit is None:
        failures.append(f"{latest} exists but is not committed")
        return
    stale_vs = commits_after(commit, HOT_DIRS)
    if stale_vs:
        failures.append(
            f"{latest} predates {len(stale_vs)} later commit(s) touching "
            f"operator/kernel/query sources (e.g. {stale_vs[0][:12]}) — "
            f"the artifact no longer measures HEAD; {rerun_hint}")
    else:
        print(f"freshness: {latest} postdates all operator sources (ancestry)")


freshness_gate(r"BENCHSCALE_r\d+\.json",
               "re-run tools/bench_scale.py over fresh sf0.1/sf1 details "
               "and commit the refreshed curve")
freshness_gate(r"BENCHDETAIL_r\d+\.json",
               "re-run graft.Bench at sf0.1 and commit the refreshed "
               "target/bench-detail.json")

# -- 4. query index ----------------------------------------------------
subprocess.run([sys.executable, os.path.join(repo, "tools/gen_query_index.py")],
               check=True, cwd=repo)
if subprocess.run(["git", "diff", "--quiet", "docs/QUERIES.md"],
                  cwd=repo).returncode != 0:
    failures.append("docs/QUERIES.md was stale — regenerated, commit it")

if failures:
    print("\nROUND-CLOSE GATES FAILED:")
    for f in failures:
        print(" -", f)
    sys.exit(1)
print("\nround-close gates: all green")
