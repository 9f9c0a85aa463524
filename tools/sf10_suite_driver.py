"""SF10 22-query suite driver: grouped long-lived processes + watchdog.

Each GROUP of queries runs in one subprocess (amortizing the ~5-minute
SF10 table upload across its queries, NOTES round-5 plan); a wedged or
crashed group costs its timeout only and the remaining groups still run
in fresh processes (the tunnel wedge is per-connection, see agent notes).
Appends one JSON line per query to the artifact.

Usage: python tools/sf10_suite_driver.py [out.jsonl]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sys.argv[1] if len(sys.argv) > 1 else \
    os.path.join(REPO, "docs", "BENCH_SUITE_sf10_tpu.jsonl")

# grouped by table overlap so uploads amortize; heavy groups get more time
GROUPS = [
    ("1,6,4,12,14", 3600),
    ("3,5,7,8,9", 4800),
    ("10,13,17,19", 4200),
    ("2,11,15,16,20", 4200),
    ("22,21,18", 5400),  # q18 last: a worker crash must not cost q21/q22
]

results = {}
for queries, budget in GROUPS:
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench_suite.py"), "10",
             "--runs", "2", "--prewarm", "1", "--path", "fused",
             "--queries", queries],
            capture_output=True, text=True, timeout=budget, cwd=REPO)
        for line in r.stdout.splitlines():
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            q = d.get("query")
            if q and q.startswith("q"):
                results[q] = d
                print(json.dumps(d), flush=True)
        if r.returncode != 0:
            print(f"# group {queries} exited {r.returncode}: "
                  f"{(r.stderr or '')[-300:]}", flush=True)
    except subprocess.TimeoutExpired:
        print(f"# group {queries} watchdog timeout {budget}s "
              f"(wall {round(time.time() - t0)}s)", flush=True)

with open(OUT, "w") as f:
    for q in sorted(results):
        f.write(json.dumps(results[q]) + "\n")
print(f"# wrote {len(results)} rows to {OUT}", flush=True)
