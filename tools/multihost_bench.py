"""Multi-host scaling-efficiency harness (1 → 2 → 4 processes).

Spawns the N-process DCN simulation (``tools/multihost_worker.py``) at
each cluster size, keeping TOTAL device count constant where possible so
the measured delta is the cost of crossing process boundaries (DCN), and
also in weak-scaling mode (devices per process fixed).  Prints one JSON
line per configuration plus a final efficiency table.

Reference role: ``testing/trino-benchto-benchmarks`` cluster benchmarks +
the BASELINE 'SF100 on N>=2 hosts, >=80% scaling efficiency' target.

Usage: python tools/multihost_bench.py [--sf 0.1] [--queries 1,3,6]
       [--configs 1x8,2x4,4x2] [--runs 3]
"""

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_config(nproc: int, local_devices: int, sf: float, queries: str,
               runs: int, timeout: int = 3600):
    port = _free_port()
    out_path = f"/tmp/mh_bench_{nproc}x{local_devices}.json"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = []
    for pid in range(nproc):
        cmd = [sys.executable, WORKER, "--pid", str(pid),
               "--nproc", str(nproc), "--port", str(port),
               "--local-devices", str(local_devices),
               "--queries", queries, "--sf", str(sf),
               "--runs", str(runs)]
        if pid == 0:
            cmd += ["--out", out_path]
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        logs.append(out)
    if any(p.returncode != 0 for p in procs):
        sys.stderr.write("\n".join(l[-2000:] for l in logs))
        return None
    with open(out_path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--queries", default="1,3,6")
    ap.add_argument("--configs", default="1x8,2x4,4x2")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    rows = []
    for cfg in args.configs.split(","):
        nproc, ldev = (int(x) for x in cfg.split("x"))
        data = run_config(nproc, ldev, args.sf, args.queries, args.runs)
        if data is None:
            print(json.dumps({"config": cfg, "error": "failed"}),
                  flush=True)
            continue
        total = sum(r["wall_s"] for r in data["results"])
        rec = {"config": cfg, "nproc": nproc, "devices": nproc * ldev,
               "total_wall_s": round(total, 4),
               "per_query": {r["query"]: r["wall_s"]
                             for r in data["results"]}}
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    if rows:
        base = rows[0]
        table = []
        for r in rows:
            # same total devices ⇒ ideal is equal wall time; efficiency =
            # single-process time / multi-process time
            eff = base["total_wall_s"] / r["total_wall_s"] \
                if r["total_wall_s"] else 0.0
            table.append({"config": r["config"],
                          "total_wall_s": r["total_wall_s"],
                          "efficiency_vs_1proc": round(eff, 3)})
        print(json.dumps({"metric": f"multihost scaling SF{args.sf:g} "
                                    f"q[{args.queries}]",
                          "table": table}, indent=None), flush=True)


if __name__ == "__main__":
    main()
