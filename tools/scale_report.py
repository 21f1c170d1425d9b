#!/usr/bin/env python3
"""Dev-only: render the sf1 scale tables for SCALING.md from the bench
and proxy-sweep JSONs.

Usage: python3 tools/scale_report.py <bench_sf01.json> <bench_sf1.json> <proxy_sf1.json>
"""
import json
import sys

b01 = json.load(open(sys.argv[1]))["queries"]
b1j = json.load(open(sys.argv[2]))
b1 = b1j["queries"]
pj = json.load(open(sys.argv[3]))
p1 = pj["queries"]
tmo = set(pj.get("timeouts", []))

streaming = {k for k in b1 if k.startswith("q_stream_")}
feas = [k for k in b1 if k in p1]
feas_ns = [k for k in feas if k not in streaming]
print(f"graft sf1 total: {sum(b1.values()):.1f} s over {len(b1)} queries "
      f"(sf0.1 same session: {sum(b01.values()):.1f} s)")
print(f"duckdb feasible set ({len(feas)}): duck {sum(p1[k] for k in feas):.1f} s "
      f"vs graft {sum(b1[k] for k in feas):.1f} s "
      f"= {sum(b1[k] for k in feas)/sum(p1[k] for k in feas):.2f}x")
print(f"non-streaming feasible ({len(feas_ns)}): duck {sum(p1[k] for k in feas_ns):.1f} "
      f"vs graft {sum(b1[k] for k in feas_ns):.1f} "
      f"= {sum(b1[k] for k in feas_ns)/sum(p1[k] for k in feas_ns):.2f}x")
wins = sorted(k for k in feas if b1[k] < p1[k])
print(f"graft faster on {len(wins)}/{len(feas)}: {', '.join(wins)}")
print(f"duckdb timeouts (>{pj.get('timeout_s')}s): {', '.join(sorted(tmo))}")
print()

HEAD = ["q1_agg", "q3_join", "q5_multijoin", "q_window_topn", "q_topk_agg",
        "q_skew_agg"]
print("| query | sf0.1 (s) | sf1 (s) | x for 10x data | duck sf1 (s) | vs duck |")
print("| --- | --- | --- | --- | --- | --- |")
heavy = sorted(b1, key=lambda k: -b1[k])[:14]
for k in HEAD + [h for h in heavy if h not in HEAD]:
    d = p1.get(k)
    ds = f"{d:.2f}" if d is not None else (f">{pj.get('timeout_s')}" if k in tmo else "—")
    rs = (f"{b1[k]/d:.2f}x" if d else "—") if d is not None \
        else ("**runs where oracle can't**" if k in tmo else "—")
    g01 = b01.get(k)
    gs = f"{b1[k]/g01:.1f}x" if g01 else "—"
    g01s = f"{g01:.2f}" if g01 is not None else "—"
    print(f"| {k} | {g01s} | {b1[k]:.2f} | {gs} | {ds} | {rs} |")
