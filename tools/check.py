#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py [sf_dir] [verify_out]

Assumes `sbt "runMain graft.Verify <sf_dir> <out>"` already ran (or run with
--run to invoke it). For each query dir in <out>: load Spark's parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sort columns by name, canonicalize values, and compare
row-by-row. Reports PASS/FAIL plus max float deviation for debugging.
"""
import json, math, os, subprocess, sys

import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--run" in sys.argv:
    subprocess.run(["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
                   check=True)

import duckdb  # noqa: E402
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(os.path.join(OUT, "oracle_sql.json")))

def canon_cell(v):
    # numpy scalars -> python scalars so repr/str is stable across versions
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()
    if v is None or v is pd.NaT:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def fetch_df(rel):
    """Fetch a duckdb relation the way the driver does: through pandas.

    This is load-bearing for type fidelity — DuckDB types bare integer SUM
    as HUGEINT, which .df() converts to float64 ("0.0"), while a BIGINT
    column stays int64 ("0").  fetchall() would hand back Python ints on
    both and mask exactly that class of hash mismatch (it hid all five
    round-1 failures).
    """
    df = rel.df()
    cols = list(df.columns)
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    return cols, rows

def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], out

n_pass = n_fail = 0
fails = []
# CHECK_SKIP: oracles intractable for DuckDB beyond the sf0.01 gate
# (e.g. xd5's recursive closure at sf0.1) — comma-separated query names
skip = set(filter(None, os.environ.get("CHECK_SKIP", "").split(",")))
names = sorted(d for d in os.listdir(OUT)
               if os.path.isdir(os.path.join(OUT, d)) and d not in skip)
for name in names:
    pq = os.path.join(OUT, name)
    try:
        scols, srows = fetch_df(
            con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')"))
    except Exception as e:
        print(f"FAIL {name}: cannot read spark result: {e}")
        n_fail += 1; fails.append(name); continue
    if name not in oracle:
        print(f"SKIP {name}: rows-only ({len(srows)} rows)")
        continue
    try:
        ocols, orows = fetch_df(con.execute(oracle[name]))
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        n_fail += 1; fails.append(name); continue
    sc, sr = canon_rows(scols, srows)
    oc, orr = canon_rows(ocols, orows)
    if sc != oc:
        print(f"FAIL {name}: column mismatch spark={sc} oracle={oc}")
        n_fail += 1; fails.append(name); continue
    if len(sr) != len(orr):
        print(f"FAIL {name}: row count spark={len(sr)} oracle={len(orr)}")
        n_fail += 1; fails.append(name); continue
    if sr == orr:
        print(f"PASS {name} ({len(sr)} rows)")
        n_pass += 1
        continue
    # diagnose first diff + max float dev
    ndiff = 0; first = None; maxdev = 0.0
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    for i, (a, b) in enumerate(zip(sr, orr)):
        if a != b:
            ndiff += 1
            if first is None:
                first = (i, a, b)
            for x, y, cname in zip(a, b, sc):
                if x != y:
                    try:
                        maxdev = max(maxdev, abs(float(x) - float(y)))
                    except (ValueError, TypeError):
                        maxdev = float("inf")
    print(f"FAIL {name}: {ndiff}/{len(sr)} rows differ, maxdev={maxdev}")
    if first:
        print(f"  row {first[0]} cols {sc}\n  spark : {first[1]}\n  oracle: {first[2]}")
    n_fail += 1; fails.append(name)

print(f"\n== {n_pass} pass, {n_fail} fail, "
      f"{len(names) - n_pass - n_fail} rows-only ==")
if fails:
    print("failed:", " ".join(fails))
    sys.exit(1)
