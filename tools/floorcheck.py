#!/usr/bin/env python3
"""Floor re-measure protocol (bench/RESULTS.md addendum rule, codified):
a warm-board FAIL on a query whose binding budget is the 2.0s FLOOR
(2x duckdb < 2.0s) is re-measured focused — median of 5 in a fresh JVM
(SPARK_GRAFT_ONLY + SPARK_GRAFT_RUNS=5) — and the re-measure is written
to /tmp/bench_floor.json for results.py to fold into the verdict
column. Floor queries sit at 1.2-2.5s where shared-host weather flips
verdicts; the focused median is the disjoint-sweep evidence the r13/r14
addenda collected by hand.

Usage: tools/floorcheck.py [spark_json] [duckdb_json] [floor_out] [sf_dir]
Exit 0 with no re-run when no floor FAIL exists.
"""
import json, os, subprocess, sys

spark_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sf01.json"
duck_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/duckdb_bench.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bench_floor.json"
sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"


def load_line(path):
    for line in open(path):
        if '"metric"' in line:
            return json.loads(line[line.index("{"):])
    raw = open(path).read()
    return json.loads(raw[raw.index("{"):])


spark = load_line(spark_path)
duck = json.load(open(duck_path))

floor_fails = []
for name, s in sorted(spark["queries"].items()):
    d = duck.get(name)
    if d is None or d <= 0:
        continue
    budget = max(2 * d, 2.0)
    if s > budget and budget == 2.0:
        floor_fails.append(name)

if not floor_fails:
    print("floorcheck: no floor-budget FAILs — nothing to re-measure")
    sys.exit(0)

print(f"floorcheck: re-measuring {len(floor_fails)} floor FAILs "
      f"(median of 5, fresh JVM): {', '.join(floor_fails)}")
env = dict(os.environ)
env["SPARK_GRAFT_SF_DIR"] = sf_dir
env["SPARK_GRAFT_ONLY"] = ",".join(floor_fails)
env["SPARK_GRAFT_RUNS"] = "5"
out = subprocess.run(
    ["sbt", "-batch", "runMain graft.Bench"],
    env=env, capture_output=True, text=True, cwd=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
line = next((l for l in out.stdout.splitlines() if '"metric"' in l), None)
if line is None:
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:] + "\n")
    sys.exit("floorcheck: focused Bench produced no metric line")
doc = json.loads(line[line.index("{"):])
# Bench's stdout line always SHORTENS query names (q61_sql_tpch1 ->
# q61); results.py matches full names, so map back via the focus list
by_short = {n.split("_")[0]: n for n in floor_fails}
queries = {by_short.get(k, k): v for k, v in doc["queries"].items()}
record = {"protocol": "median-of-5 focused re-measure (fresh JVM)",
          "queries": queries}
with open(out_path, "w") as f:
    json.dump(record, f, indent=1)
for n, v in sorted(doc["queries"].items()):
    print(f"  {n}: {v:.3f}s ({'PASS' if 0 <= v <= 2.0 else 'still FAIL'})")
print(f"wrote {out_path} — re-run tools/results.py to fold into the board")
