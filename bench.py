"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: TPC-H Q1+Q6 SF1 lineitem throughput (rows/s per chip) through the
fused single-program pipelines (scan arrays resident in HBM, one XLA
program per query — the engine's hot path).  Both queries are verified
bit-exact against the oracle by tests/; this measures the same kernels.

vs_baseline: the reference (Trino v359) publishes no absolute numbers
(BASELINE.md); we normalize against 50M rows/s — a generous estimate of a
32-core Trino v359 node on Q1/Q6-class scans derived from public TPC-H
benchmark reports, so vs_baseline = per-chip speedup over a full reference
node (not a single core).
"""

import json
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from presto_tpu.exec.pipeline import (  # noqa: E402
    q1_stage, q6_stage, q1_example_args)

BASELINE_ROWS_PER_S = 50e6
SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
RUNS = 20


def _force(out):
    """Host readback of (tiny) outputs: completion fences can be optimistic
    through device tunnels, so timing must include a data dependency."""
    return jax.tree_util.tree_map(np.asarray, out)


def median_time(fn, *args):
    _force(fn(*args))  # warmup (compile)
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    args = q1_example_args(sf=SF)
    n = int(args[0].shape[0])
    f1 = jax.jit(q1_stage)
    f6 = jax.jit(q6_stage)
    q6args = (args[0], args[3], args[4], args[5], args[7])

    t1 = median_time(f1, *args)
    t6 = median_time(f6, *q6args)
    rows_per_s = 2 * n / (t1 + t6)

    print(json.dumps({
        "metric": f"TPC-H Q1+Q6 SF{SF:g} fused-pipeline throughput per chip",
        "value": round(rows_per_s / 1e6, 1),
        "unit": "Mrows/s",
        "vs_baseline": round(rows_per_s / BASELINE_ROWS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
