#!/usr/bin/env python3
"""Regenerate docs/QUERIES.md from the per-family declaration objects
(src/main/scala/graft/entry/*Queries.scala): every declared query with
its verification mode (oracle hash-match vs pinned rows-only)."""
import glob
import re
decls, oracles = [], set()
for p in sorted(glob.glob('src/main/scala/graft/entry/*Queries.scala')):
    src = open(p).read()
    decls += re.findall(r'"(q_[a-z_0-9]+)" -> \(\(s', src)
    oracle_section = src[src.index('val oracles'):]
    oracles |= set(re.findall(r'"(q_[a-z_0-9]+)" ->', oracle_section))
rows = [(q, 'DuckDB hash-match' if q in oracles
         else 'rows-only (pinned count in EntrySpec)') for q in sorted(set(decls))]
with open('docs/QUERIES.md', 'w') as f:
    f.write("# Declared query index\n\n")
    f.write(f"{len(rows)} queries: {sum(1 for _, m in rows if m.startswith('DuckDB'))} "
            f"DuckDB-hash-matched, {sum(1 for _, m in rows if not m.startswith('DuckDB'))} rows-only "
            "(not SQL-expressible; exact sf0.001 row counts pinned in EntrySpec).\n"
            "Generated from graft/entry/*Queries.scala — regenerate with tools/gen_query_index.py.\n\n")
    f.write("| query | verification |\n|---|---|\n")
    for q, m in rows:
        f.write(f"| {q} | {m} |\n")
print(f"wrote docs/QUERIES.md ({len(rows)} queries)")
