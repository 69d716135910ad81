#!/usr/bin/env python3
"""Render the sf10 heavy-query column as a BASELINE-ready markdown
table: sf10 medians/mins from the latest testdata-sf10 entry in
BENCH_HISTORY.jsonl, ratios against the latest full-suite sf1 entry
(the r14 closing column protocol)."""
import json
import sys

rows = [json.loads(l) for l in open("BENCH_HISTORY.jsonl")]
sf10 = [r for r in rows if "sf10" in str(r.get("sf"))][-1]
sf1 = [r for r in rows if str(r.get("sf")).endswith("testdata-sf1")
       and len(r.get("queries", {})) >= 136][-1]
q10, q10min = sf10["queries"], sf10.get("queries_min", {})
q1 = sf1["queries"]
tot10 = tot1 = 0.0
print("| query | sf1 med (s) | sf10 med (s) | sf10 min (s) | vs sf1 |")
print("| --- | --- | --- | --- | --- |")
for k in sorted(q10, key=lambda k: -q10[k]):
    v10, v1 = q10[k], q1.get(k)
    tot10 += v10
    if v1:
        tot1 += v1
    ratio = f"{v10 / v1:.1f}×" if v1 else "—"
    print(f"| {k} | {v1:.2f} | {v10:.2f} | {q10min.get(k, v10):.2f} "
          f"| {ratio} |" if v1 else
          f"| {k} | — | {v10:.2f} | {q10min.get(k, v10):.2f} | — |")
print(f"\ntotals: sf10 {tot10:.1f}s vs sf1 {tot1:.1f}s "
      f"= {tot10 / tot1:.1f}× on 10× rows")
if sf10.get("failed"):
    print("FAILED at sf10:", ", ".join(sf10["failed"]))
