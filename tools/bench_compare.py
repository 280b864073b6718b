#!/usr/bin/env python3
"""Compare bench JSON lines: per-query deltas over the common query tail.

Usage: bench_compare.py A.json B.json [more.json...]
Prints each run's common-tail total, then the queries whose max/min
ratio across runs exceeds 1.5x, largest spread first.
"""
import sys, json

runs = []
for p in sys.argv[1:]:
    with open(p) as f:
        d = json.loads(f.read().strip().splitlines()[-1])
    runs.append((p, d["queries"]))

common = set(runs[0][1])
for _, q in runs[1:]:
    common &= set(q)
common = sorted(common)

print(f"common queries: {len(common)}")
for p, q in runs:
    tot = sum(q[k] for k in common)
    print(f"  {p}: common-tail total {tot:.1f} s (full {sum(q.values()):.1f} s over {len(q)})")

rows = []
for k in common:
    vals = [q[k] for _, q in runs]
    rows.append((max(vals) / min(vals), k, vals))
rows.sort(reverse=True)
print("\nquery spreads (max/min > 1.5x):")
for r, k, vals in rows:
    if r > 1.5:
        print(f"  {k}: {' '.join(f'{v:.2f}' for v in vals)}  ({r:.2f}x)")
print("\nslowest in last run:")
last = runs[-1][1]
for k in sorted(common, key=lambda k: -last[k])[:10]:
    print(f"  {k}: {' '.join(f'{q[k]:.2f}' for _, q in runs)}")
