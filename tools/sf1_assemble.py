#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf1_full_r{N}.json from a full-surface sf1
sweep: tools/sf1_full_check.py's full_results.jsonl (every non-graph
oracle-backed query) merged with tools/sf1_graph_sample.py's
sample_results.jsonl (the graph-prelude family, batched edge build).

    python3 tools/sf1_assemble.py <round> <workdir> [out.json]

<workdir> is the dir holding verify_big/full_results.jsonl and
sample_results.jsonl. Later lines win per query (a retry pass with a
longer timeout overrides an earlier oracle_timeout record).
"""
import sys, os, json


def load_jsonl(path):
    recs = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                r = json.loads(line)
                recs[r["query"]] = r  # later lines win (retry passes)
    return recs


def main():
    rnd, wd = int(sys.argv[1]), sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else f"CORRECTNESS_sf1_full_r{rnd}.json"
    recs = load_jsonl(os.path.join(wd, "verify_big", "full_results.jsonl"))
    recs.update(load_jsonl(os.path.join(wd, "sample_results.jsonl")))
    queries = {q: {k: v for k, v in r.items() if k != "query"}
               for q, r in sorted(recs.items())}
    matched = [q for q, r in queries.items() if r.get("hash_match")]
    timeouts = [q for q, r in queries.items()
                if r.get("error") == "oracle_timeout"]
    errors = [q for q, r in queries.items()
              if "error" in r and r["error"] != "oracle_timeout"]
    reasoned = [q for q, r in queries.items()
                if "hash_match" in r and not r["hash_match"]
                and "expected_mismatch" in r]
    mismatch = [q for q, r in queries.items()
                if "hash_match" in r and not r["hash_match"]
                and "expected_mismatch" not in r]
    doc = {
        "round": rnd,
        "sf": "sf1 (tiled sf0.1 x 10, graft.tools.ScaleData)",
        "method": ("full-surface sweep: graft.Verify dumped EVERY declared "
                   "query at sf1; each oracle-backed query hash-compared "
                   "against its DuckDB oracle (canon rules of the driver's "
                   "local_verify: columns sorted by name, rows sorted by all "
                   "columns, floats at 9 significant digits). Graph-prelude "
                   "oracles ran with the batched edge table "
                   "(tools/sf1_graph_sample.py, fidelity-asserted at sf0.1); "
                   "the heavy ngram/embedding closure family ran through the "
                   "stepwise runner (tools/sf1_heavy_closure.py: "
                   "inverted-index pairs + union-find components + verbatim "
                   "final selects, byte-exact vs the monolithic oracle texts "
                   "at sf0.01 and sf0.1); everything else ran verbatim from "
                   "oracle_sql.json under per-query subprocess timeouts "
                   "(tools/sf1_full_check.py)."),
        "n_queries": len(queries),
        "n_hash_matched": len(matched),
        "n_oracle_timeout": len(timeouts),
        "n_error": len(errors),
        "n_mismatch": len(mismatch),
        "n_reasoned_mismatch": len(reasoned),
        "oracle_timeouts": timeouts,
        "errors": errors,
        "mismatches": mismatch,
        "reasoned_mismatches": reasoned,
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{out}: {len(matched)}/{len(queries)} hash-matched, "
          f"{len(timeouts)} oracle timeouts, {len(mismatch)} mismatches "
          f"({len(reasoned)} reasoned), {len(errors)} errors")


if __name__ == "__main__":
    main()
