"""Per-operator + per-query perf dossier (VERDICT r2 item 1).

Produces the reference-style per-operator rows/s table
(``testing/trino-benchmark/.../HandTpchQuery1.java``/``HandTpchQuery6.java``
hand-pipeline model) plus a timing BREAKDOWN for the fused Q1/Q6 pipelines
that separates generation, compile, device compute, and host readback —
the artifact that reconciles tunnel-dominated wall-clock with device
throughput.

Writes one JSON line per measurement and a summary to stdout; use
``--out docs/PERF_<platform>.json`` to record.

Usage: python tools/perf_dossier.py [--sf 1.0] [--runs 10] [--out f.json]
       [--platform cpu|axon] [--pallas]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--pallas", action="store_true",
                    help="enable the Pallas kernel tier (hardware only)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    dev = str(jax.devices()[0])
    records = []

    def rec(**kv):
        kv["device"] = dev
        records.append(kv)
        print(json.dumps(kv), flush=True)

    def timed(fn, *fargs, runs=args.runs, readback=True):
        """(median wall seconds, first-call seconds incl. compile)."""
        t0 = time.perf_counter()
        out = fn(*fargs)
        if readback:
            jax.tree_util.tree_map(np.asarray, out)
        else:
            jax.block_until_ready(out)
        first = time.perf_counter() - t0
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            out = fn(*fargs)
            if readback:
                jax.tree_util.tree_map(np.asarray, out)
            else:
                jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), first

    # ---------------------------------------------------------------- data
    from presto_tpu.tpch import generator
    t0 = time.perf_counter()
    t = generator.generate(
        "lineitem", args.sf,
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate", "l_orderkey",
                 "l_partkey"])
    gen_s = time.perf_counter() - t0
    n = t.row_count
    rec(stage="generate lineitem", sf=args.sf, rows=n,
        wall_s=round(gen_s, 3), rows_per_s=round(n / gen_s / 1e6, 1),
        unit="Mrows/s")

    from presto_tpu.exec.columns import from_host
    t0 = time.perf_counter()
    cols = {name: from_host(c) for name, c in t.columns.items()}
    jax.block_until_ready([c.values for c in cols.values()])
    h2d_s = time.perf_counter() - t0
    nbytes = sum(int(c.values.nbytes) for c in cols.values())
    rec(stage="host->device ingest", rows=n, wall_s=round(h2d_s, 3),
        gb_per_s=round(nbytes / h2d_s / 1e9, 2), unit="GB/s")

    qty = cols["l_quantity"].values
    price = cols["l_extendedprice"].values
    disc = cols["l_discount"].values
    ship = cols["l_shipdate"].values
    rflag = cols["l_returnflag"].values
    lstat = cols["l_linestatus"].values
    okey = cols["l_orderkey"].values

    # ------------------------------------------------- operator microbench
    # filter: Q6 predicate (date range + discount band + quantity)
    @jax.jit
    def op_filter(ship, disc, qty):
        m = (ship >= 8766) & (ship < 9131) & (disc >= 5) & (disc <= 7) \
            & (qty < 2400)
        return jnp.sum(m)

    med, first = timed(op_filter, ship, disc, qty)
    rec(stage="filter (Q6 predicate, 5 cols)", rows=n,
        wall_ms=round(med * 1e3, 3), compile_s=round(first, 2),
        rows_per_s=round(n / med / 1e6, 1), unit="Mrows/s")

    # project: Q6 revenue expression
    @jax.jit
    def op_project(price, disc):
        return jnp.sum(price * disc)

    med, _ = timed(op_project, price, disc)
    rec(stage="project+reduce (price*disc)", rows=n,
        wall_ms=round(med * 1e3, 3),
        rows_per_s=round(n / med / 1e6, 1), unit="Mrows/s")

    # hash aggregation: Q1 shape (4 groups, 7 aggregates)
    from presto_tpu.ops import agg as A

    @jax.jit
    def op_hashagg(rflag, lstat, qty, price, disc):
        slot = (rflag * 2 + lstat).astype(jnp.int32)  # 4-group direct index
        mask = jnp.ones(qty.shape, jnp.bool_)
        out = []
        for v in (qty, price, disc):
            out.append(A.seg_sum(v, slot, mask, 8, jnp.int64))
        out.append(A.seg_count(slot, mask, 8))
        return out

    med, _ = timed(op_hashagg, rflag, lstat, qty, price, disc)
    rec(stage="hash aggregate (Q1: 4 groups, 4 states)", rows=n,
        wall_ms=round(med * 1e3, 3),
        rows_per_s=round(n / med / 1e6, 1), unit="Mrows/s")

    # group-by hash insert: high-cardinality (l_partkey, ~SF*200k ndv)
    from presto_tpu.ops import hashtable as HT
    pk = cols["l_partkey"].values
    cap = HT.capacity_for(int(2e5 * args.sf) + 10)

    @jax.jit
    def op_insert(pk):
        return HT.insert([pk], jnp.ones(pk.shape, jnp.bool_), cap)[0]

    med, first = timed(op_insert, pk)
    rec(stage=f"group-by hash insert (ndv~{int(2e5 * args.sf)}, cap {cap})",
        rows=n, wall_ms=round(med * 1e3, 3), compile_s=round(first, 2),
        rows_per_s=round(n / med / 1e6, 1), unit="Mrows/s")

    # join build+probe: orders PK → lineitem FK (Q3/Q4 shape)
    orders = generator.generate("orders", args.sf, columns=["o_orderkey"])
    ok = from_host(orders.columns["o_orderkey"]).values
    bcap = HT.capacity_for(ok.shape[0])

    def build_table(ok):
        from presto_tpu.ops.hashing import hash_keys
        owner, slot, _ = HT.insert([ok], jnp.ones(ok.shape, jnp.bool_), bcap)
        return owner

    jbuild = jax.jit(build_table)
    med, first = timed(jbuild, ok)
    rec(stage=f"join build (orders PK, {ok.shape[0]} rows)",
        rows=int(ok.shape[0]), wall_ms=round(med * 1e3, 3),
        compile_s=round(first, 2),
        rows_per_s=round(ok.shape[0] / med / 1e6, 1), unit="Mrows/s")

    owner = jbuild(ok)

    @jax.jit
    def op_probe(owner, okey, ok):
        from presto_tpu.ops.hashing import hash_keys
        h = (hash_keys([okey]) & jnp.uint32(bcap - 1)).astype(jnp.int32)
        # linear probe against owner table (unique build keys)
        def body(state):
            it, slot, done = state
            cand = owner[slot]
            hit = (cand >= 0) & (ok[jnp.maximum(cand, 0)] == okey)
            miss = cand < 0
            done2 = done | hit | miss
            slot2 = jnp.where(done2, slot, (slot + 1) & (bcap - 1))
            return it + 1, slot2, done2

        it, slot, done = jax.lax.while_loop(
            lambda s: ~jnp.all(s[2]) & (s[0] < 64), body,
            (jnp.int32(0), h, jnp.zeros(okey.shape, jnp.bool_)))
        return jnp.sum(slot)

    med, first = timed(op_probe, owner, okey, ok)
    rec(stage="join probe (lineitem→orders, unique)", rows=n,
        wall_ms=round(med * 1e3, 3), compile_s=round(first, 2),
        rows_per_s=round(n / med / 1e6, 1), unit="Mrows/s")

    # sort: single int64 key argsort (order-by engine core)
    @jax.jit
    def op_sort(okey):
        return jnp.argsort(okey)

    med, _ = timed(op_sort, okey)
    rec(stage="sort permutation (1 int64 key)", rows=n,
        wall_ms=round(med * 1e3, 3),
        rows_per_s=round(n / med / 1e6, 1), unit="Mrows/s")

    # ------------------------------------------- fused Q1/Q6 + breakdown
    from presto_tpu.exec.pipeline import q1_stage, q6_stage, q1_example_args
    qargs = q1_example_args(sf=args.sf)
    f1 = jax.jit(q1_stage)
    q6args = (qargs[0], qargs[3], qargs[4], qargs[5], qargs[7])
    f6 = jax.jit(q6_stage)

    for name, fn, a in (("Q1", f1, qargs), ("Q6", f6, q6args)):
        med_rb, first = timed(fn, *a, readback=True)
        med_dev, _ = timed(fn, *a, readback=False)
        rec(stage=f"fused {name} device compute", rows=n,
            wall_ms=round(med_dev * 1e3, 3), compile_s=round(first, 2),
            rows_per_s=round(n / med_dev / 1e6, 1), unit="Mrows/s")
        rec(stage=f"fused {name} incl. host readback", rows=n,
            wall_ms=round(med_rb * 1e3, 3),
            readback_overhead_ms=round((med_rb - med_dev) * 1e3, 3),
            rows_per_s=round(n / med_rb / 1e6, 1), unit="Mrows/s")

    if args.pallas:
        from presto_tpu.ops import pallas_kernels as PK
        mask = jnp.ones(qty.shape, jnp.bool_)
        f_x = jax.jit(lambda v, m: jnp.sum(jnp.where(m, v, 0)))
        med_x, _ = timed(f_x, qty, mask)
        f_p = jax.jit(lambda v, m: PK.masked_sum(v, m))
        med_p, _ = timed(f_p, qty, mask)
        rec(stage="masked global sum: XLA vs Pallas", rows=n,
            xla_ms=round(med_x * 1e3, 3), pallas_ms=round(med_p * 1e3, 3),
            speedup=round(med_x / med_p, 2))

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf": args.sf, "device": dev,
                       "records": records}, f, indent=1)


if __name__ == "__main__":
    main()
