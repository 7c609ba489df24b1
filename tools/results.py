#!/usr/bin/env python3
"""Generate bench/RESULTS.md per BASELINE.md §2.5: query | duckdb | spark |
ratio | pass/fail. Inputs: spark bench JSON line + duckdb timings JSON.

Usage: tools/results.py [spark_json] [duckdb_json] [out_md]
"""
import json, sys

spark_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sf01.json"
duck_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/duckdb_bench.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "bench/RESULTS.md"

raw = open(spark_path).read()
spark = json.loads(raw[raw.index("{"):])
duck = json.load(open(duck_path))

rows = []
for name in sorted(spark["queries"]):
    s = spark["queries"][name]
    d = duck.get(name)
    if d is None or d <= 0:
        rows.append((name, None, s, None, "⊘ no oracle"))
        continue
    budget = max(2 * d, 2.0)
    ok = 0 <= s <= budget
    rows.append((name, d, s, s / d if d else None,
                 "PASS" if ok else f"FAIL (budget {budget:.2f}s)"))

n_pass = sum(1 for r in rows if r[4] == "PASS")
n_fail = sum(1 for r in rows if r[4].startswith("FAIL"))
with open(out_path, "w") as f:
    f.write("# Bench results — sf0.1 (BASELINE.md §2 protocol)\n\n")
    f.write(f"Spark: median of 3 timed runs after 1 warm-up, noop sink, "
            f"`local[32]`, AQE on. DuckDB: same queries, same parquet, "
            f"median of 3 (known-slow oracles timed once — see duckbench.py "
            f"ONCE; xd9's unbounded-DP levenshtein dominates the duckdb "
            f"total). Pass: spark <= max(2x duckdb, 2.0s).\n\n")
    budgeted_s = sum(r[2] for r in rows if not r[4].startswith("⊘"))
    budgeted_d = sum(r[1] for r in rows if r[1] is not None)
    unbudgeted_s = sum(r[2] for r in rows if r[4].startswith("⊘"))
    f.write(f"**{n_pass} pass, {n_fail} fail** "
            f"(+{sum(1 for r in rows if r[4].startswith('⊘'))} no-oracle "
            f"sketch queries, timed but unbudgeted). "
            f"Spark total {spark['value']:.1f}s = {budgeted_s:.1f}s budgeted "
            f"(duckdb {budgeted_d:.1f}s) + {unbudgeted_s:.1f}s unbudgeted "
            f"sketch/ANN paths DuckDB has no counterpart for.\n\n")
    f.write("| query | duckdb s | spark s | ratio | verdict |\n")
    f.write("|---|---|---|---|---|\n")
    for name, d, s, r, v in rows:
        f.write(f"| {name} | {d if d is not None else '—'} | {s:.3f} | "
                f"{f'{r:.2f}x' if r else '—'} | {v} |\n")
print(f"wrote {out_path}: {n_pass} pass, {n_fail} fail")
