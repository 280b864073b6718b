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

Since round 12 the bench line carries a code-frozen ambient CANARY
([start, mid, end] seconds of a graft-independent workload). When every
input has one, per-query values are ALSO compared canary-adjusted: each
run's times divide by its canary ratio against the first run, so a
box-wide 1.2x ambient slowdown stops reading as 131 per-query
regressions. Raw ratios stay printed beside the adjusted ones — the
canary settles ambient, it must not hide a real regression (a genuine
slowdown moves the adjusted ratio too; only box drift moves raw while
adjusted stays ~1.0).
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


def canary_of(d, tail=None):
    """Median of the 3-sample canary — the middle sample rejects one
    outlier position without averaging in a load spike."""
    c = None
    if isinstance(d, dict):
        c = d.get("canary")
    if c is None and tail:
        m = re.search(r'"canary":\[([0-9.]+),([0-9.]+),([0-9.]+)\]', tail)
        if m:
            c = [float(g) for g in m.groups()]
    if not c:
        return None
    return sorted(float(x) for x in c)[len(c) // 2]


def serving_of(d, tail=None):
    """The round-16 "serving" section: a named dict of per-operation
    latencies on a persisted index. Recovered from the parsed line or,
    for head-truncated driver tails, by regex (it sits at the line's
    END, so the tail window keeps it)."""
    if isinstance(d, dict) and isinstance(d.get("serving"), dict):
        return {k: float(v) for k, v in d["serving"].items()}
    if tail:
        m = re.search(r'"serving":\{([^}]*)\}', tail)
        if m:
            pairs = re.findall(r'"([a-z_]+)":([0-9.]+)', m.group(1))
            if pairs:
                return {k: float(v) for k, v in pairs}
    return None


def load(path):
    with open(path) as f:
        text = f.read()
    # driver wrapper?
    try:
        d = json.loads(text)
        if isinstance(d, dict) and ("tail" in d or "parsed" in d):
            tail = d.get("tail") or ""
            if d.get("parsed") and d["parsed"].get("queries"):
                return (normalize(d["parsed"]["queries"]), False,
                        canary_of(d["parsed"], tail),
                        serving_of(d["parsed"], tail))
            # head-truncated tail: recover the complete pairs (the
            # serving section's keys are excluded from the query dict —
            # they are latencies of a different kind)
            srv = serving_of(None, tail)
            qtail = re.sub(r'"serving":\{[^}]*\}', "", tail)
            pairs = re.findall(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', qtail)
            q = {k: float(v) for k, v in pairs
                 if k not in ("value",)}
            return normalize(q), True, canary_of(None, tail), srv
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
                return (normalize(d["queries"]), False, canary_of(d),
                        serving_of(d))
        except json.JSONDecodeError:
            continue
    raise SystemExit(f"{path}: no bench JSON found")


runs = []
servings = []
for p in sys.argv[1:]:
    q, partial, canary, srv = load(p)
    runs.append((p + (" [partial-tail]" if partial else ""), q, canary))
    servings.append(srv)

common = set(runs[0][1])
for _, q, _ in runs[1:]:
    common &= set(q)
common = sorted(common)

if not common:
    print("WARNING: no common queries between the inputs — check that "
          "each input actually parsed (key sets: "
          + "; ".join(f"{p}: {len(q)}" for p, q, _ in runs) + ")",
          file=sys.stderr)
print(f"common queries: {len(common)}")
# ambient scale per run: canary ratio vs the FIRST run (1.0 when any
# run lacks a canary — pre-round-12 artifacts compare raw-only)
base_canary = runs[0][2]
scales = []
for p, q, c in runs:
    tot = sum(q[k] for k in common)
    scale = (c / base_canary) if (c and base_canary) else None
    scales.append(scale if scale else 1.0)
    ctxt = (f" canary {c:.3f}s (ambient x{scale:.2f})"
            if scale else (f" canary {c:.3f}s" if c else ""))
    print(f"  {p}: common-tail total {tot:.1f} s "
          f"(full {sum(q.values()):.1f} s over {len(q)}){ctxt}")
adjusted = all(s is not None for s in scales) and base_canary is not None

rows = []
for k in common:
    vals = [q[k] for _, q, _ in runs]
    adj = [v / s for v, s in zip(vals, scales)]
    raw_r = max(vals) / min(vals)
    adj_r = max(adj) / min(adj)
    rows.append(((adj_r if adjusted else raw_r), raw_r, k, vals, adj))
rows.sort(reverse=True)
hdr = ("query spreads (canary-ADJUSTED max/min > 1.5x; raw beside)"
       if adjusted else "query spreads (max/min > 1.5x; no canary)")
print(f"\n{hdr}:")
for flag_r, raw_r, k, vals, adj in rows:
    if flag_r > 1.5:
        txt = " ".join(f"{v:.2f}" for v in vals)
        if adjusted:
            atxt = " ".join(f"{v:.2f}" for v in adj)
            print(f"  {k}: raw {txt} ({raw_r:.2f}x) "
                  f"adj {atxt} ({flag_r:.2f}x)")
        else:
            print(f"  {k}: {txt}  ({raw_r:.2f}x)")
print("\nslowest in last run:")
last = runs[-1][1]
for k in sorted(common, key=lambda k: -last[k])[:10]:
    print(f"  {k}: {' '.join(f'{q[k]:.2f}' for _, q, _ in runs)}")

# serving diff (round 16): when at least two runs carry the named
# section, show each op side by side with its spread
withsrv = [(p, s) for (p, _, _), s in zip(runs, servings) if s]
if len(withsrv) >= 2:
    keys = sorted(set.intersection(*(set(s) for _, s in withsrv)))
    print("\nserving (per-op latency, s):")
    for k in keys:
        vals = [s[k] for _, s in withsrv]
        r = max(vals) / min(vals) if min(vals) > 0 else float("inf")
        flag = "  <-- spread" if r > 1.5 else ""
        print(f"  {k}: {' '.join(f'{v:.3f}' for v in vals)} "
              f"({r:.2f}x){flag}")
elif len(withsrv) == 1:
    print("\nserving present in only one input — no diff")
