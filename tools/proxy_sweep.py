#!/usr/bin/env python3
"""Dev-only: run tools/proxy.py one query at a time under an external
timeout and merge the results. Some oracle SQL is deliberately
all-pairs (exactness checks whose cost DuckDB pays quadratically, e.g.
full-recall MinHash banding at 50k docs); at sf1 those must time out
rather than wedge the sweep.

Usage: python3 tools/proxy_sweep.py [sfdir] [reps] [timeout_s] [--only=a,b]
Prints one JSON line: {"queries": {...}, "timeouts": [...], "errors": {...}}
"""
import json
import subprocess
import sys

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.1"
REPS = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "3"
TMO = int(sys.argv[3]) if len(sys.argv) > 3 and not sys.argv[3].startswith("--") else 180
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        ONLY = [q for q in a.split("=", 1)[1].split(",") if q]

oracle = json.load(open("/tmp/graft_verify/oracle_sql.json"))
names = ONLY if ONLY else sorted(oracle)
out, timeouts, errors = {}, [], {}
for q in names:
    if q not in oracle:
        continue
    try:
        r = subprocess.run(
            [sys.executable, "tools/proxy.py", SF, REPS, f"--only={q}"],
            capture_output=True, text=True, timeout=TMO)
    except subprocess.TimeoutExpired:
        timeouts.append(q)
        print(f"[sweep] {q}: TIMEOUT {TMO}s", file=sys.stderr)
        continue
    if r.returncode != 0:
        errors[q] = (r.stderr.strip().splitlines() or ["?"])[-1][:200]
        print(f"[sweep] {q}: ERROR", file=sys.stderr)
        continue
    try:
        d = json.loads(r.stdout.strip().splitlines()[-1])
        out.update(d.get("queries", {}))
        print(f"[sweep] {q}: {d['queries'].get(q)}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        errors[q] = f"parse: {e}"
print(json.dumps({"metric": "duckdb_proxy_sweep", "unit": "sec", "sf": SF,
                  "reps": int(REPS), "stat": "min", "timeout_s": TMO,
                  "queries": out, "timeouts": timeouts, "errors": errors}))
