"""Key-width experiment: int32 vs int64 sort/gather/hash on the TPU.

Decides whether int32 key compression (round-4 roadmap: the engine is
int64-everywhere) pays on v5e before the engine grows the plumbing.
Device-generated data, scalar-readback fences, HBM sanity bound.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6_002_590)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    n = args.rows
    dev = str(jax.devices()[0])
    records = []

    probe = jax.jit(lambda: jnp.zeros((), jnp.int32))()
    jax.block_until_ready(probe)
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        int(np.asarray(probe))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    def bench(name, fn, *a):
        fn(*a)  # compile
        np.asarray(jax.tree_util.tree_leaves(fn(*a))[0])
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(fn(*a))[0])
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        dev_ms = max((med - rtt) * 1e3, 1e-6)
        rec = {"stage": name, "device_ms": round(dev_ms, 3),
               "rows_per_s_M": round(n / (dev_ms / 1e3) / 1e6, 1)}
        records.append(rec)
        print(json.dumps(rec), flush=True)
        return dev_ms

    @jax.jit
    def mk():
        i = jnp.arange(n, dtype=jnp.uint32)
        h = (i * jnp.uint32(2654435761)) ^ (i >> 13)
        k32 = (h % jnp.uint32(1_500_000)).astype(jnp.int32)
        return k32, k32.astype(jnp.int64)

    k32, k64 = jax.block_until_ready(mk())
    idx32 = jnp.argsort(k32)[: n // 4]

    r = {}
    r["sort64"] = bench("argsort int64",
                        jax.jit(lambda k: jnp.sum(jnp.argsort(k))), k64)
    r["sort32"] = bench("argsort int32",
                        jax.jit(lambda k: jnp.sum(jnp.argsort(k))), k32)
    r["gather64"] = bench("gather int64 (n/4 idx)",
                          jax.jit(lambda k, i: jnp.sum(k[i])), k64, idx32)
    r["gather32"] = bench("gather int32 (n/4 idx)",
                          jax.jit(lambda k, i: jnp.sum(k[i])), k32, idx32)

    @jax.jit
    def sort2_64(k):
        return jnp.sum(jax.lax.sort((k, k + 1), num_keys=2)[0])

    @jax.jit
    def sort2_32(k):
        return jnp.sum(jax.lax.sort((k, k + 1), num_keys=2)[0])

    r["sort2_64"] = bench("2-key lax.sort int64", sort2_64, k64)
    r["sort2_32"] = bench("2-key lax.sort int32", sort2_32, k32)

    summary = {"metric": "int32 vs int64 key width", "device": dev,
               "rows": n,
               "sort_speedup_32": round(r["sort64"] / r["sort32"], 2),
               "gather_speedup_32": round(r["gather64"] / r["gather32"], 2),
               "sort2_speedup_32": round(r["sort2_64"] / r["sort2_32"], 2)}
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"records": records, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
