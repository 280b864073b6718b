#!/usr/bin/env python3
"""Compare bench JSON lines: per-query deltas over the common query tail.

Usage: bench_compare.py A.json B.json [more.json...]

Each input may be (a) a raw `graft.Bench` stdout line / log whose last
line is the bench JSON, or (b) a driver round artifact (BENCH_r{N}.json:
{"n","rc","tail","parsed",...}) — the driver keeps only the LAST ~2000
chars of output, so older rounds' full-name lines arrive head-truncated;
for those, every complete `"name":float` pair still present in the tail
is recovered.

Since round 9 the bench line uses SHORT query keys (gate prefix before
the first underscore; collisions keep the full name). Keys from every
source are normalized to that scheme so cross-round comparison works.
"""
import sys, json, re


def shorten(keys):
    """Full gate names -> round-9 short-key scheme."""
    by_prefix = {}
    for k in sorted(keys):
        by_prefix.setdefault(k.split("_")[0], []).append(k)
    out = {}
    for p, ks in by_prefix.items():
        for i, k in enumerate(ks):
            out[k] = p if (len(ks) == 1 or i == 0) else k
    return out


def normalize(queries):
    # shorten whenever ANY key carries an underscore: a heavily
    # head-truncated full-name tail can recover <5 pairs, and skipping
    # normalization there silently intersects to ~zero common queries
    # against a short-key run
    if not queries:
        return {}
    if all("_" not in k for k in queries):
        return dict(queries)  # already short keys
    m = shorten(queries.keys())
    return {m[k]: v for k, v in queries.items()}


def load(path):
    with open(path) as f:
        text = f.read()
    # driver wrapper?
    try:
        d = json.loads(text)
        if isinstance(d, dict) and ("tail" in d or "parsed" in d):
            if d.get("parsed") and d["parsed"].get("queries"):
                return normalize(d["parsed"]["queries"]), False
            # head-truncated tail: recover the complete pairs
            pairs = re.findall(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)',
                               d.get("tail") or "")
            q = {k: float(v) for k, v in pairs
                 if k not in ("value",)}
            return normalize(q), True
    except (json.JSONDecodeError, AttributeError):
        pass
    # raw bench output: last parseable {..} line wins
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        i = line.find("{")
        if i < 0:
            continue
        try:
            d = json.loads(line[i:])
            if "queries" in d:
                return normalize(d["queries"]), False
        except json.JSONDecodeError:
            continue
    raise SystemExit(f"{path}: no bench JSON found")


runs = []
for p in sys.argv[1:]:
    q, partial = load(p)
    runs.append((p + (" [partial-tail]" if partial else ""), q))

common = set(runs[0][1])
for _, q in runs[1:]:
    common &= set(q)
common = sorted(common)

if not common:
    print("WARNING: no common queries between the inputs — check that "
          "each input actually parsed (key sets: "
          + "; ".join(f"{p}: {len(q)}" for p, q in runs) + ")",
          file=sys.stderr)
print(f"common queries: {len(common)}")
for p, q in runs:
    tot = sum(q[k] for k in common)
    print(f"  {p}: common-tail total {tot:.1f} s "
          f"(full {sum(q.values()):.1f} s over {len(q)})")

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
