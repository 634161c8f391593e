#!/usr/bin/env python3
"""Compare two graft.Bench logs: per-query seconds, ratio, totals."""
import json, re, sys

def load(path):
    txt = open(path).read()
    m = None
    for line in txt.splitlines():
        i = line.find('{"metric"')
        if i >= 0:
            m = json.loads(line[i:])
    if m is None:
        raise SystemExit(f"no metric line in {path}")
    return m

a = load(sys.argv[1])
b = load(sys.argv[2])
qa, qb = a["queries"], b["queries"]
rows = []
for k in sorted(set(qa) | set(qb)):
    va = qa.get(k) if isinstance(qa.get(k), (int, float)) else None
    vb = qb.get(k) if isinstance(qb.get(k), (int, float)) else None
    ratio = (vb / va) if va and vb else None
    rows.append((k, va, vb, ratio))
rows.sort(key=lambda r: -(r[1] or 0))
print(f"{'query':32s} {'before':>8s} {'after':>8s} {'ratio':>6s}")
for k, va, vb, r in rows:
    print(f"{k:32s} {va if va is not None else float('nan'):8.3f} "
          f"{vb if vb is not None else float('nan'):8.3f} "
          f"{r if r is not None else float('nan'):6.2f}")
print(f"\nTOTAL before={a['value']:.1f}s after={b['value']:.1f}s "
      f"ratio={b['value']/a['value']:.3f}")
ca, cb = a.get("cdcApply", {}), b.get("cdcApply", {})
if ca and cb:
    print(f"cdcApply before={ca['eventsPerSec']} after={cb['eventsPerSec']} ev/s "
          f"(draws {ca.get('draws')} -> {cb.get('draws')})")
