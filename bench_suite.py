"""TPC-H 22-query wall-clock suite (benchto-style harness.

Reference: ``testing/trino-benchto-benchmarks/.../tpch.yaml`` — prewarm +
measured runs per query).  Prints one JSON line per query plus a summary.

Usage: python bench_suite.py [SF] [--runs N] [--paths fused,ops,dist]
"""

import argparse
import hashlib
import json
import time

import jax


def result_checksum(table) -> str:
    """Order-insensitive content checksum of a result Table: floats
    rounded to 2 decimals (spec tolerance), rows sorted canonically,
    md5 over the CSV — makes every suite artifact row self-verifying
    (two runs/paths/hosts agreeing on (rows, checksum) agree on the
    actual result, reference: QueryAssertions result diffing)."""
    df = table.to_pandas()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(2)
    df = df.astype(str)
    rows = sorted(",".join(r) for r in df.itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf", nargs="?", type=float, default=1.0)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--prewarm", type=int, default=1)
    ap.add_argument("--path", default="fused", choices=["fused", "ops", "dist"])
    ap.add_argument("--queries", default=None,
                    help="comma-separated query ids (default all)")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (the ambient env forces "
                         "the axon tunnel; JAX_PLATFORMS is ignored here)")
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    from presto_tpu.tpch.queries import queries_for_sf
    QUERIES = queries_for_sf(args.sf)  # spec-scaled substitution params

    if args.path == "dist":
        from presto_tpu.parallel import distributed as D
        mesh = D.make_mesh()
        runner = D.DistributedRunner(mesh, args.sf)

        def run(q):
            return runner.run_sql(QUERIES[q])
    else:
        from presto_tpu.exec.runner import LocalRunner
        runner = LocalRunner(scale_factor=args.sf)
        fused = args.path == "fused"

        def run(q):
            return runner.run_sql(QUERIES[q], fused=None if fused else False)

    qids = ([int(x) for x in args.queries.split(",")]
            if args.queries else sorted(QUERIES))
    total = 0.0
    results = []
    for qid in qids:
        try:
            for _ in range(args.prewarm):
                run(qid)
            times = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                out = run(qid)
                times.append(time.perf_counter() - t0)
            best = min(times)
            total += best
            rec = {"query": f"q{qid:02d}", "wall_s": round(best, 4),
                   "rows": out.row_count,
                   "checksum": result_checksum(out)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"query": f"q{qid:02d}",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
    print(json.dumps({
        "metric": f"TPC-H {len(results)}-query suite SF{args.sf:g} "
                  f"({args.path})",
        "value": round(total, 3), "unit": "s",
        "per_query_geomean_s": round(
            float(__import__('numpy').exp(__import__('numpy').mean(
                [__import__('numpy').log(max(r['wall_s'], 1e-4))
                 for r in results]))), 4) if results else None,
    }), flush=True)


if __name__ == "__main__":
    main()
