"""Dedupe/order the 22-query suite artifact: keep each query's LAST
success line (watchdog retries append), order q01..q22, list gaps."""

import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "docs/BENCH_SUITE_sf1_tpu.jsonl"
best = {}
with open(path) as f:
    for line in f:
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        q = d.get("query")
        if q is None:
            continue
        if "wall_s" in d or q not in best:
            best[q] = d

rows = [best[q] for q in sorted(best)]
with open(path, "w") as f:
    for d in rows:
        f.write(json.dumps(d) + "\n")

ok = [d for d in rows if "wall_s" in d]
bad = [d["query"] for d in rows if "wall_s" not in d]
total = sum(d["wall_s"] for d in ok)
print(f"{len(ok)}/22 measured, total {total:.2f}s; missing: {bad}")
