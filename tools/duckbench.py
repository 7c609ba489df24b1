#!/usr/bin/env python3
"""Time the DuckDB oracle side of BASELINE.md §2: per oracle query,
one warm-up then median of 3, over the same sf parquet tables.

Usage: tools/duckbench.py [sf_dir] [oracle_sql.json] [out_json]
"""
import json, statistics, sys, time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/duckdb_bench.json"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

# Oracles that are correct but intractable for DuckDB at bench scale
# (no cancellation support in duckdb 1.0, so they can't even be timed
# out): xd5's recursive-CTE transitive closure is quadratic in
# component size and this corpus has a ~3500-doc component at sf0.1.
# They remain fully checked at the sf0.01 correctness gate.
SKIP = {"xd5_dedup_clusters"}

def skipped(name):
    # xr* recall/tolerance certifications: the oracle is a constant
    # assertion row (hash-checked at the correctness gate), so a DuckDB
    # timing of it is meaningless as a budget baseline — the Spark side
    # deliberately runs BOTH the sketch and its exact counterpart.
    # Prefix-matched so a new cert row can't silently get budgeted
    # against a 1 ms constant-row oracle (xr12 did exactly that).
    return name in SKIP or name.startswith("xr")

# Known-slow oracles timed ONCE instead of warm-up + median-of-3:
# xd9's 518k banded pairs each run DuckDB's full O(len^2) levenshtein
# DP (no threshold cutoff exists there) — measured ~220 s/run at sf0.1
# vs Spark's 1 s banded-DP plan, so the median protocol would cost 15
# extra minutes to confirm a 200x pass margin.
# xd1b computes 64 minhash permutations PER DOCUMENT in DuckDB (no
# distinct-token-set compression there) — measured ~42 s/run at sf0.1
# vs Spark's 3.5 s group-level plan.
ONCE = {"xd9_edit_distance", "xd1b_minhash_md5", "xt15b_bpe_encode256"}

oracle = json.load(open(ORACLE))
out = {}
for name in sorted(oracle):
    if skipped(name):
        continue
    sql = oracle[name]
    try:
        if name in ONCE:
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            out[name] = round(time.perf_counter() - t0, 3)
            continue
        con.execute(sql).fetchall()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 3)
    except Exception as e:
        print(f"[duckbench] {name} failed: {e}", file=sys.stderr)
        out[name] = -1.0
json.dump(out, open(OUT, "w"), indent=0, sort_keys=True)
print(f"wrote {OUT}: total {sum(v for v in out.values() if v > 0):.1f}s")
