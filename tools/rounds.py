#!/usr/bin/env python3
"""Regenerate bench/rounds.json — the round-over-round bench trend.

One entry per driver artifact (BENCH_r*.json) plus, when present, the
builder's own fresh-JVM warm board (bench/RESULTS.md is human-format;
the machine source is the artifact). Missing driver rounds (e.g. r02,
r11) simply have no entry — the file makes the gap explicit instead of
breaking a trend audit.

Usage: python3 tools/rounds.py   (from the repo root; rewrites
bench/rounds.json deterministically from what's on disk)
"""
import glob
import json
import os
import re

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

rounds = []
for f in sorted(glob.glob("BENCH_r*.json")):
    m = re.match(r"BENCH_r(\d+)\.json", os.path.basename(f))
    if not m:
        continue
    with open(f) as fh:
        d = json.load(fh)
    # the driver wraps graft.Bench's stdout: `parsed` when it parsed the
    # metric line itself, else the line is embedded in `tail`
    metric = d if "queries" in d else d.get("parsed")
    if metric is None:
        mm = re.search(r'\{"metric":.*?"sf":"[^"]*"\}', d.get("tail", ""))
        if mm:
            metric = json.loads(mm.group(0))
    if metric is None:
        continue
    queries = metric.get("queries", {})
    rounds.append({
        "round": int(m.group(1)),
        "source": os.path.basename(f),
        "total_sec": metric.get("value"),
        "n_queries": len(queries),
        "telem": metric.get("telem"),
        "queries": queries,
    })

out = {"note": "regenerate with tools/rounds.py; one entry per driver "
               "BENCH_r*.json on disk — absent rounds are driver gaps, "
               "not data loss",
       "rounds": rounds}
with open("bench/rounds.json", "w") as fh:
    json.dump(out, fh, indent=1, sort_keys=False)
    fh.write("\n")

per_round = {r["round"]: r for r in rounds}
print(f"wrote bench/rounds.json with {len(rounds)} rounds:")
for r in rounds:
    # a BENCH_r*.json whose metric lacks 'value' leaves total_sec None;
    # rounds.json is already written, so report n/a instead of crashing
    total = f"{r['total_sec']:.1f}s" if r["total_sec"] is not None else "n/a"
    print(f"  r{r['round']:02d}: total {total} over "
          f"{r['n_queries']} queries")
# round-over-round deltas on the common query set
ks = sorted(per_round)
for a, b in zip(ks, ks[1:]):
    qa, qb = per_round[a]["queries"], per_round[b]["queries"]
    common = set(qa) & set(qb)
    if not common:
        continue
    ta = sum(qa[q] for q in common)
    tb = sum(qb[q] for q in common)
    print(f"  r{a:02d}->r{b:02d}: {ta:.1f}s -> {tb:.1f}s over "
          f"{len(common)} common queries")
