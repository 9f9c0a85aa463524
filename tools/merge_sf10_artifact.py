"""Merge SF10 suite rows from a driver log into the committed artifact.

Rows measured this session (from the driver's streamed log) win; queries
not yet re-measured keep their prior-round row, explicitly marked
``"carried": true`` so the artifact never silently mixes measurement
vintages.  Usage: python tools/merge_sf10_artifact.py [log] [artifact]
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_run.log"
OUT = sys.argv[2] if len(sys.argv) > 2 else \
    os.path.join(REPO, "docs", "BENCH_SUITE_sf10_tpu.jsonl")

fresh = {}
for line in open(LOG):
    line = line.strip()
    if not line.startswith("{"):
        continue
    d = json.loads(line)
    q = d.get("query")
    if q and "wall_s" in d:
        fresh[q] = d

old = {}
if os.path.exists(OUT):
    for line in open(OUT):
        d = json.loads(line)
        old[d["query"]] = d

merged = dict(old)
for q, d in fresh.items():
    merged[q] = d
for q, d in merged.items():
    if q not in fresh and not d.get("carried"):
        d["carried"] = True  # prior-round measurement, not re-run here

with open(OUT, "w") as f:
    for q in sorted(merged):
        f.write(json.dumps(merged[q]) + "\n")
print(f"{len(fresh)} fresh + {len(merged) - len(fresh)} carried "
      f"-> {OUT}")
