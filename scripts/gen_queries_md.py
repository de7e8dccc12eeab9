#!/usr/bin/env python
"""Regenerate QUERIES.md from the declared catalog registry."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bigdata_retailrocket_recsys_spark.plans import QUERIES

lines = [
    "# Query catalog index",
    "",
    "Auto-generated from `bigdata_retailrocket_recsys_spark/plans/` "
    "(regenerate: `python scripts/gen_queries_md.py`). One row per "
    "declared driver-contract query: ✓ = DuckDB-oracled (row count + "
    "schema + order-insensitive value hash at sf0.01), rows-only = "
    "genuinely non-SQL-expressible (each carries an invariant unit test "
    "instead). ★ = headline bench entry (sf0.1, BENCH_r{N}.json).",
    "",
    "| Query | Oracle | Summary |",
    "|---|---|---|",
]
for name in sorted(QUERIES):
    q = QUERIES[name]
    first = (q.doc or "").strip().split("\n\n")[0].replace("\n", " ")
    first = " ".join(first.split())
    if len(first) > 170:
        first = first[:167] + "..."
    mark = "✓" if q.oracle else "rows-only"
    star = " ★" if q.headline else ""
    lines.append(f"| `{name}`{star} | {mark} | {first} |")
lines.append("")
lines.append(f"Total: {len(QUERIES)} queries, "
             f"{sum(1 for q in QUERIES.values() if q.oracle)} oracled, "
             f"{sum(1 for q in QUERIES.values() if not q.oracle)} rows-only, "
             f"{sum(1 for q in QUERIES.values() if q.headline)} headline.")
open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md"), "w").write("\n".join(lines) + "\n")
print(f"QUERIES.md: {len(QUERIES)} entries")
