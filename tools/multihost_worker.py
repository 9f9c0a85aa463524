"""One controller process of the N-process DCN simulation.

The multi-process twin of the reference's in-JVM multi-node harness
(``testing/trino-testing/.../DistributedQueryRunner.java:72``): every
process runs the same SPMD driver; rank 0 writes results (rows + timings)
as JSON for the spawning test/bench to diff against the local oracle.

Usage (spawned N times by tests/test_multihost.py or tools/multihost_bench.py):
    python tools/multihost_worker.py --pid K --nproc N --port P \
        --local-devices 2 --sf 0.01 --queries 1,3,6 --out results.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", type=int, default=9955)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--queries", default="1,3,6")
    ap.add_argument("--sql", action="append", default=[],
                    help="extra raw SQL statements to run after the "
                         "numbered TPC-H queries")
    ap.add_argument("--runs", type=int, default=1,
                    help="timed repeats per query (first run is the "
                         "compile+ingest prewarm)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from presto_tpu.parallel.multihost import init_multihost, make_global_mesh
    init_multihost(args.pid, args.nproc,
                   coordinator=f"localhost:{args.port}",
                   local_devices=args.local_devices)
    import jax
    jax.config.update("jax_enable_x64", True)

    from presto_tpu.parallel.distributed import DistributedRunner
    from presto_tpu.tpch.queries import QUERIES

    mesh = make_global_mesh()
    runner = DistributedRunner(mesh, args.sf)

    jobs = [(f"q{int(q):02d}", QUERIES[int(q)])
            for q in args.queries.split(",") if q] + \
           [(f"sql{i}", s) for i, s in enumerate(args.sql)]
    results = []
    for name, sql in jobs:
        t0 = time.perf_counter()
        out = runner.run_sql(sql)           # prewarm: ingest + compile
        prewarm_s = time.perf_counter() - t0
        times = []
        for _ in range(max(args.runs - 1, 0)):
            t0 = time.perf_counter()
            out = runner.run_sql(sql)
            times.append(time.perf_counter() - t0)
        rec = {
            "query": name,
            "rows": out.row_count,
            "prewarm_s": round(prewarm_s, 4),
            "wall_s": round(min(times) if times else prewarm_s, 4),
            "data": [[None if v is None else
                      (v if isinstance(v, (int, float, str)) else str(v))
                      for v in row]
                     for row in zip(*[out.to_pydict()[n]
                                      for n in out.names])]
            if out.row_count <= 10000 else None,
            "columns": list(out.names),
        }
        results.append(rec)
        print(f"[{args.pid}] {name}: {out.row_count} rows "
              f"prewarm {prewarm_s:.2f}s", flush=True)

    if args.pid == 0 and args.out:
        with open(args.out, "w") as f:
            json.dump({"nproc": args.nproc,
                       "local_devices": args.local_devices,
                       "n_devices": args.nproc * args.local_devices,
                       "sf": args.sf, "results": results}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
