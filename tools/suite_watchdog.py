"""Per-query watchdog driver for bench_suite on the axon tunnel.

The tunnel wedges per-connection (a stuck readback blocks that process
forever while NEW processes work fine), so each query runs in its own
subprocess under a timeout; one wedged query costs its timeout, not the
suite.  Appends one JSON line per query to the artifact.
"""
import json
import subprocess
import sys
import time

sf = sys.argv[1] if len(sys.argv) > 1 else "1"
queries = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 \
    else list(range(1, 23))
out_path = sys.argv[3] if len(sys.argv) > 3 else None
per_query_timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 900

for q in queries:
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "bench_suite.py", sf, "--runs", "3",
             "--prewarm", "1", "--path", "fused", "--queries", str(q)],
            capture_output=True, text=True, timeout=per_query_timeout)
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        rec = None
        for l in lines:
            d = json.loads(l)
            if d.get("query") == f"q{q:02d}":
                rec = d
        if rec is None:
            rec = {"query": f"q{q:02d}",
                   "error": (r.stderr or r.stdout)[-200:]}
    except subprocess.TimeoutExpired:
        rec = {"query": f"q{q:02d}",
               "error": f"watchdog timeout {per_query_timeout}s "
                        "(tunnel wedge)"}
    rec["driver_wall_s"] = round(time.time() - t0, 1)
    line = json.dumps(rec)
    print(line, flush=True)
    if out_path:
        with open(out_path, "a") as f:
            f.write(line + "\n")
