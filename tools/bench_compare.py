#!/usr/bin/env python3
"""Compare two Bench JSON outputs per query (totals are cross-JVM noisy;
per-query deltas are the signal). Usage:

    python3 tools/bench_compare.py OLD.json NEW.json [threshold] [--fail] [--raw]

Accepts both formats:
  - the driver/stdout compact line ({"metric":"total",...,"queries":{...},
    "canary":S}) — NOTE this is per-query TRUNCATED past ~40 queries
    ("qtrunc"), so sub-0.6 s regressions are invisible in it;
  - the full detail file Bench writes to target/bench-detail.json
    ({"reps":N,"agg":"min","canary_start":S,"canary_end":S,
    "queries_min":{...}}) — committed per round as BENCHDETAIL_r{N}.json,
    this covers EVERY query.

CANARY NORMALIZATION (the r11→r12 methodology change): when BOTH inputs
carry a machine-era canary (Bench.canaryRun — a fixed, code-independent
calibration workload whose wall time moves only when the machine era
moves), every per-query time is divided by its run's canary before
comparing, so a box running 5% slow this era does not read as 258 small
regressions. Floors are printed in CANARY UNITS (time/canary) and the
regression gate fires on the NORMALIZED ratio (default threshold 1.25).
When either side lacks a canary (pre-r11 artifacts), the compare falls
back to raw seconds at the legacy 1.3 threshold — state which mode ran.
--raw forces the legacy raw-seconds compare even when canaries exist.

Prints queries slower by more than `threshold` (normalized ratio, plus a
0.3 canary-unit absolute floor so micro-queries don't flag on noise),
new/removed queries, and both totals. With --fail, exits 1 if any query
regressed — the round-over-round guard round_close.py runs."""
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
    """Map either format onto {value, queries, failed, canary|None,
    canary_str|None}. Each canary is the MIN of its bracketing runs
    (same estimator as the per-query warm minima — the floor is the
    era, the spread is drift). canary_str (r12+) is the
    string/expansion-class anchor riding beside the hash/shuffle one."""
    if "queries_min" in obj:
        q = obj["queries_min"]
        # raw bench-detail carries canary_start/canary_end; the merged
        # cross-JVM artifact (merge_details.py) carries canary_min (+
        # canary_runs for the spread)
        canaries = [obj[k] for k in ("canary_start", "canary_end", "canary_min")
                    if k in obj]
        strs = [obj[k] for k in ("canary_str_start", "canary_str_end",
                                 "canary_str_min") if k in obj]
        return {"value": sum(q.values()), "queries": q,
                "failed": obj.get("failed", []),
                "canary": min(canaries) if canaries else None,
                "canary_str": min(strs) if strs else None}
    return {"value": obj.get("value", sum(obj.get("queries", {}).values())),
            "queries": obj.get("queries", {}),
            "failed": obj.get("failed", []),
            "canary": obj.get("canary"),
            "canary_str": obj.get("canary_str")}


def main():
    args = [a for a in sys.argv[1:]
            if a not in ("--fail", "--raw", "--families")
            and not a.startswith("--adjudicated=")]
    fail_on_regression = "--fail" in sys.argv[1:]
    force_raw = "--raw" in sys.argv[1:]
    # --adjudicated=BENCH_ADJUDICATION_r{N}.json: queries whose flags were
    # adjudicated-not-regressions per the noise methodology (isolated
    # rerun + no-code-change proof, committed in the file). They still
    # PRINT — adjudication is loud, never silent — but don't fail the
    # gate.
    adjudicated = {}
    for a in sys.argv[1:]:
        if a.startswith("--adjudicated="):
            adj = json.load(open(a.split("=", 1)[1]))
            adjudicated = adj.get("flagged", {})
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    normalized = (not force_raw and old["canary"] is not None
                  and new["canary"] is not None)
    if normalized:
        thr = float(args[2]) if len(args) > 2 else 1.25
        oc, nc = old["canary"], new["canary"]
        era = nc / oc
        # dual-flavor normalization (r12 adjudication finding: workload
        # classes ride era changes by different factors — the hash/shuffle
        # canary moved 23% in an era where string/expansion queries held
        # flat). When BOTH sides carry the string canary, each query is
        # normalized by the flavor that incriminates it LEAST: a flag
        # means "regressed under EVERY era anchor we have".
        flavors = [(oc, nc)]
        if old.get("canary_str") and new.get("canary_str"):
            flavors.append((old["canary_str"], new["canary_str"]))
        print(f"mode: CANARY-NORMALIZED (old canary {oc:.3f}s, new canary "
              f"{nc:.3f}s, era ratio {era:.3f}x; floors in canary units, "
              f"gate at {thr}x normalized)")
        if len(flavors) > 1:
            ocs, ncs = flavors[1]
            print(f"      dual-flavor: string canary {ocs:.3f}s -> "
                  f"{ncs:.3f}s (era {ncs/ocs:.3f}x); per-query gate takes "
                  "the least-incriminating flavor")
        print(f"old total {old['value']:.1f}s = {old['value']/oc:.1f}cu "
              f"({len(oq)} queries)  new total {new['value']:.1f}s = "
              f"{new['value']/nc:.1f}cu ({len(nq)} queries)  "
              f"normalized total ratio {(new['value']/nc)/(old['value']/oc):.3f}x")
        # r14 verdict item 5 (anchor divergence): the per-query gate takes
        # the least-incriminating flavor, so a broad drift that every
        # query shares can hide when the two anchors disagree at the
        # TOTAL level. Report the normalized total under EVERY anchor
        # side by side, and flag (fail under --fail) only when the total
        # regressed past 1.15x under ALL of them — i.e. no era anchor
        # explains the move.
        total_ratios = [(new["value"] / nf) / (old["value"] / of)
                        for of, nf in flavors]
        names = ["hash-anchor", "string-anchor"][:len(flavors)]
        print("total-drift: " + "  ".join(
            f"{n} total ratio {r:.3f}x" for n, r in zip(names, total_ratios)))
    else:
        thr = float(args[2]) if len(args) > 2 else 1.3
        oc = nc = 1.0
        why = "--raw" if force_raw else "canary missing on one side (pre-r11 artifact)"
        print(f"mode: RAW SECONDS ({why}; legacy gate at {thr}x)")
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
    unit = "cu" if normalized else "s"
    if not normalized:
        flavors = [(oc, nc)]

    def verdict(q):
        """(ratio, old_anchor, new_anchor) under the least-incriminating
        flavor — a query only flags if it regressed under EVERY anchor."""
        return min((((nq[q] / nf) / (oq[q] / of), of, nf)
                    for of, nf in flavors), key=lambda t: t[0])

    if "--families" in sys.argv[1:] and normalized and len(flavors) > 1:
        # r14 verdict watch item: when the era anchors disagree at the
        # total level, report which anchor each query FAMILY follows
        # (the family = the token after q_), instead of silently taking
        # the most forgiving anchor per comparison. A family "follows"
        # the anchor under which its median normalized ratio sits
        # closest to 1.0 — i.e. that anchor's era move explains the
        # family's raw move.
        fams = {}
        for q in sorted(oq.keys() & nq.keys()):
            if oq[q] <= 0:
                continue
            fam = q.split("_")[1] if "_" in q else q
            rr = [(nq[q] / nf) / (oq[q] / of) for of, nf in flavors]
            fams.setdefault(fam, []).append(rr)
        print("family-anchor report (median normalized ratio per anchor; "
              "* = the anchor this family follows):")
        names2 = ["hash", "string"]
        for fam in sorted(fams, key=lambda f: -len(fams[f])):
            rows = fams[fam]
            if len(rows) < 3:
                continue
            med = [sorted(r[i] for r in rows)[len(rows) // 2]
                   for i in range(len(flavors))]
            best = min(range(len(med)), key=lambda i: abs(med[i] - 1.0))
            cells = "  ".join(
                f"{names2[i]} {med[i]:.3f}x" + ("*" if i == best else "")
                for i in range(len(med)))
            print(f"  {fam:<14} n={len(rows):<3} {cells}")
    elif "--families" in sys.argv[1:]:
        # loud, not silent: an empty report must read as "mode
        # unavailable", not "nothing to adjudicate"
        print("family-anchor report unavailable: needs canary-normalized "
              "mode with both era anchors on both sides (not --raw, "
              "canary_str present in old AND new)")

    slower = [(verdict(q), q) for q in oq.keys() & nq.keys() if oq[q] > 0]
    slower = [(v, q) for v, q in slower
              if v[0] > thr and nq[q] / v[2] - oq[q] / v[1] > 0.3]
    unadjudicated = []
    for (ratio, of, nf), q in sorted(slower, reverse=True):
        tag = " [ADJUDICATED not-a-regression]" if q in adjudicated else ""
        if not tag:
            unadjudicated.append(q)
        print(f"SLOWER {q}: {oq[q]/of:.2f}{unit} -> {nq[q]/nf:.2f}{unit} "
              f"({ratio:.2f}x{' normalized' if normalized else ''}){tag}")
    if not slower:
        print(f"no query regressed beyond {thr}x (+0.3{unit} absolute)"
              + (" after canary normalization" if normalized else ""))
    elif not unadjudicated:
        print(f"all {len(slower)} flag(s) adjudicated — see the "
              "adjudication artifact for the isolated reruns and "
              "no-code-change proofs")
    # the total-drift verdict prints BEFORE any exit: a broad shared
    # slowdown also flags individual queries, and the run where the gate
    # fails is exactly the run where the all-anchor total matters most
    total_drift = normalized and all(r > 1.15 for r in total_ratios)
    if total_drift:
        print("TOTAL-DRIFT FLAG: normalized total regressed >1.15x under "
              "EVERY era anchor — a broad shared slowdown no anchor "
              "explains; adjudicate before shipping")
    if fail_on_regression and (unadjudicated or total_drift
                               or new.get("failed")):
        sys.exit(1)


if __name__ == "__main__":
    main()
