#!/usr/bin/env python3
"""FULL-DUMP real-reference parity (VERDICT r13 directive 1): run the
ACTUAL /root/reference/geonames.js transform — verbatim module code over
the tools/refparity shims, sandboxed as `nobody` — across a complete
8,000,000-row GeoBench-shaped staging, and byte-compare every emitted
record against the engine's output (LC_ALL=C sorted). This retires
tools/reference_proxy.js as the last builder-written link in the
fidelity chain: the r12/r13 full-width equivalence (3,346,671 records,
zero diffs) rested on the proxy; this run rests on the reference's own
code.

Two scenarios:
  fulldump_complete — admin2 dimension covers B0..B99 so every 3-truthy
      row resolves: the verbatim reference survives the whole dump and
      both sides must be byte-equal (8M rows -> 4,000,000 records:
      3,000,000 pits + 1,000,000 liesIn relations).
  fulldump_crash    — GeoBench's EXACT original staging (partial admin2
      cover): the reference's own `parentObj.geonameid`
      (geonames.js:107) throws TypeError on the FIRST unresolvable key,
      so full-dump byte-parity on that staging is impossible BY THE
      REFERENCE'S OWN BEHAVIOR — the dump-scale form of the documented
      SURVEY §1.4 drop deviation. The engine processes the same staging
      to the pinned 3,346,671 records.

Usage: python3 tools/refparity/fulldump.py [outJson] [rows=8000000]
Writes REFPARITY_FULLDUMP_r{N}.json (pass outJson) and exits non-zero
unless both scenarios hold.
"""
import glob
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
WORK = "/tmp/refparity_fulldump"
sys.path.insert(0, HERE)
import refparity as rp  # sandbox staging + sandboxed run_reference


def sh(cmd, **kw):
    p = subprocess.run(cmd, capture_output=True, text=True, **kw)
    if p.returncode != 0:
        sys.exit(f"command failed ({cmd[:3]}...):\n{p.stderr[-2000:]}")
    return p.stdout


def run_engine_dump(rows, mode, work):
    jars = ":".join(os.path.join("/opt/spark/jars", j)
                    for j in os.listdir("/opt/spark/jars") if j.endswith(".jar"))
    cp = os.path.join(REPO, "target/scala-2.13/classes") + ":" + jars
    opens = ["--add-opens=java.base/" + m + "=ALL-UNNAMED" for m in
             ["java.lang", "java.lang.invoke", "java.io", "java.net",
              "java.nio", "java.util", "java.util.concurrent",
              "sun.nio.ch", "sun.nio.cs", "sun.security.action",
              "sun.util.calendar"]]
    out = sh(["java", "-cp", cp, "-Xmx16g"] + opens +
             ["graft.tools.RefParityDump", str(rows), work, mode],
             env=dict(os.environ, SPARK_GRAFT_CPUS="32"))
    return json.loads(out.strip().splitlines()[-1])


def stage_node_fixture(work):
    """The reference reads ONE allCountries.txt file; the engine staging
    is a parts dir. Concatenate (order is irrelevant under the sorted
    compare) and make everything readable by the sandbox uid.
    """
    fixture = os.path.join(work, "fixture")
    os.makedirs(fixture, exist_ok=True)
    parts = sorted(glob.glob(os.path.join(work, "stage/ac/part-*")))
    assert parts, f"no staging parts under {work}/stage/ac"
    with open(os.path.join(fixture, "allCountries.txt"), "wb") as dst:
        for p in parts:
            with open(p, "rb") as src:
                while True:
                    chunk = src.read(1 << 22)
                    if not chunk:
                        break
                    dst.write(chunk)
    for f in ("admin1CodesASCII.txt", "admin2Codes.txt"):
        with open(os.path.join(work, "stage", f), "rb") as src, \
                open(os.path.join(fixture, f), "wb") as dst:
            dst.write(src.read())
    for f in os.listdir(fixture):
        os.chmod(os.path.join(fixture, f), 0o644)
    os.chmod(fixture, 0o755)
    os.chmod(work, 0o755)
    return fixture


def sorted_file(src_glob_or_file, dst):
    srcs = sorted(glob.glob(src_glob_or_file)) \
        if "*" in src_glob_or_file else [src_glob_or_file]
    assert srcs, f"nothing matches {src_glob_or_file}"
    # argv list + env, not a concatenated bash string: paths with spaces
    # or glob metacharacters must not re-parse (r14 ADVICE find)
    sh(["sort", "-S", "2G", "-o", dst] + srcs,
       env={**os.environ, "LC_ALL": "C"})
    return dst


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "REFPARITY_FULLDUMP_r14.json")
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8000000
    os.makedirs(WORK, exist_ok=True)
    os.chmod(WORK, 0o755)
    rp.WORK = WORK  # sandbox tree lives under the fulldump workdir
    rp.SANDBOX, rp.REF_SHA, rp.PRIVDROP = rp.stage_sandbox()
    results = {}

    # --- scenario 1: complete-admin2 staging, full byte parity ---------
    w1 = os.path.join(WORK, "complete")
    eng1 = run_engine_dump(rows, "complete", w1)
    fixture1 = stage_node_fixture(w1)
    t0 = time.time()
    rc1, st1 = rp.run_reference(fixture1, os.path.join(w1, "ref.ndjson"),
                                "geobench")
    ref_sec1 = time.time() - t0
    eng_sorted = sorted_file(os.path.join(w1, "out/part-*"),
                             os.path.join(w1, "eng_sorted.ndjson"))
    ref_sorted = sorted_file(os.path.join(w1, "ref.ndjson"),
                             os.path.join(w1, "ref_sorted.ndjson"))
    cmp_rc = subprocess.run(["cmp", "-s", eng_sorted, ref_sorted]).returncode
    results["fulldump_complete"] = {
        "input_rows": rows,
        "engine_lines": eng1["engine_lines"],
        "engine_sec": round(eng1["sec"], 1),
        "reference_exit": rc1,
        "reference_status": st1,
        "reference_sec": round(ref_sec1, 1),
        "byte_equal_sorted": cmp_rc == 0,
        "sorted_sha256": {"engine": rp.sha256(eng_sorted),
                          "reference": rp.sha256(ref_sorted)},
    }

    # --- scenario 2: ORIGINAL GeoBench staging — the reference crashes -
    w2 = os.path.join(WORK, "original")
    eng2 = run_engine_dump(rows, "original", w2)
    fixture2 = stage_node_fixture(w2)
    rc2, st2 = rp.run_reference(fixture2, os.path.join(w2, "ref.ndjson"),
                                "geobench")
    stack2 = " | ".join(st2.get("stack", []))
    results["fulldump_crash"] = {
        "input_rows": rows,
        "engine_lines": eng2["engine_lines"],
        "engine_sec": round(eng2["sec"], 1),
        "reference_exit": rc2,
        "reference_status": st2,
        "is_type_error": st2.get("name") == "TypeError",
        "thrown_in_reference_file": "geonames.js" in stack2,
        "note": ("the verbatim reference cannot process GeoBench's exact "
                 "staging: ~2/3 of 3-truthy rows have no admin2 key and "
                 "geonames.js:107 throws on the first one; the engine's "
                 "documented SURVEY §1.4 deviation (drop the relation, "
                 "keep the pit) processes all of it to the pinned "
                 "record count — so dump-scale byte parity is defined on "
                 "the complete-admin2 staging above, where the "
                 "reference's own semantics are total"),
    }

    ok = (results["fulldump_complete"]["byte_equal_sorted"]
          and results["fulldump_complete"]["reference_exit"] == 0
          and results["fulldump_complete"]["engine_lines"]
          == results["fulldump_complete"]["reference_status"].get("lines")
          and results["fulldump_crash"]["is_type_error"]
          and results["fulldump_crash"]["thrown_in_reference_file"])
    doc = {
        "what": ("FULL-DUMP true-reference parity: the ACTUAL "
                 "geonames.js transform (sha256-pinned verbatim module, "
                 "sandboxed as nobody, streaming highland/ramda shims) "
                 "vs graft GeoNames on an 8M-row GeoBench-shaped "
                 "staging; every emitted record byte-compared after an "
                 "LC_ALL=C sort. Retires tools/reference_proxy.js as "
                 "fidelity evidence."),
        "sandbox": {"privdrop_active": rp.PRIVDROP is not None,
                    "geonames_js_sha256": rp.REF_SHA},
        "all_ok": ok,
        "results": results,
    }
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: (v if k != "results" else "...")
                      for k, v in doc.items()}))
    for case, r in results.items():
        print(case, json.dumps(r)[:400])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
