"""Skew-aware FIXED_HASH exchange: heavy probe keys split round-robin,
their build rows replicated (broadcast-skew join).

Reference gap this covers: the PagePartitioner routes every row of one key
to one node (``operator/PartitionedOutputOperator.java:411``) — a heavy key
(one customer owning half of lineitem) overflows that node regardless of
capacity.  Here the exchange detects heavy hashes from a gathered sample
and splits them (SURVEY §7 north-star; VERDICT r1 item 6)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from presto_tpu.data import types as T
from presto_tpu.data.column import PLAIN
from presto_tpu.exec import physical as PH
from presto_tpu.exec.columns import Chunk, DCol
from presto_tpu.parallel import distributed as D
from presto_tpu.sql import ir

ND = 8
N = 8192            # probe rows (global)
NDV = 1000          # distinct keys
HEAVY_KEY = 7       # one key owns half of all probe rows


def _sharded(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("d")))


@pytest.fixture(scope="module")
def mesh():
    return D.make_mesh(ND)


@pytest.fixture(scope="module")
def data(mesh):
    rng = np.random.default_rng(42)
    keys = rng.integers(0, NDV, size=N).astype(np.int64)
    heavy_rows = rng.random(N) < 0.5
    keys[heavy_rows] = HEAVY_KEY
    pay = np.arange(N, dtype=np.int64)
    bkeys = np.arange(NDV, dtype=np.int64)
    bpay = bkeys * 10
    # build rows interleaved across devices (row-range shards)
    bk_pad = np.zeros(N, np.int64)
    bp_pad = np.zeros(N, np.int64)
    bm = np.zeros(N, bool)
    idx = np.arange(NDV) * (N // NDV)
    bk_pad[idx], bp_pad[idx], bm[idx] = bkeys, bpay, True
    return {
        "pk": _sharded(mesh, keys), "pv": _sharded(mesh, pay),
        "bk": _sharded(mesh, bk_pad),
        "bp": _sharded(mesh, bp_pad),
        "bm": _sharded(mesh, bm),
        "keys_np": keys, "pay_np": pay, "bpay_np": bpay,
    }


def _plan(dist="partitioned"):
    kref = ir.ColumnRef("k", T.BIGINT)
    return PH.PhysHashJoin(
        probe=None, build=None,
        probe_keys=(kref,), build_keys=(kref,),
        kind="inner", unique_build=True,
        build_payload=(("p", "p"),), build_est=float(NDV),
        probe_est=float(N), dist_type=dist)


def _run_exchange(mesh, data, skew: bool):
    """Run the partitioned-join exchange inside shard_map; returns
    (overflow flags, per-device received probe rows, joined (v, p) pairs)."""
    plan = _plan()
    shard_map, no_check = D._get_shard_map()

    def stage(pk, pv, bk, bp, bm):
        probe = Chunk({"k": DCol(T.BIGINT, PLAIN, pk),
                       "v": DCol(T.BIGINT, PLAIN, pv)},
                      jnp.ones(pk.shape, jnp.bool_))
        build = Chunk({"k": DCol(T.BIGINT, PLAIN, bk),
                       "p": DCol(T.BIGINT, PLAIN, bp)}, bm)
        ctx = D.TraceCtx({}, {}, 1.0, overflow=[], overflow_keys=[])
        if not skew:  # plain FIXED_HASH on both sides (round-1 behavior)
            pkeys = PH._key_arrays(probe, plan.probe_keys)
            probe2, p_ovf = D.repartition(probe, pkeys, slack=2,
                                          est_total_rows=2 * N)
            bkeys = PH._key_arrays(build, plan.build_keys)
            build2, b_ovf = D.repartition(build, bkeys, slack=2,
                                          est_total_rows=2 * NDV)
            ctx.overflow += [p_ovf, b_ovf]
        else:
            probe2, build2, _ = D._exchange_join_inputs(
                plan, probe, False, build, False, ctx)
        cap = D.HT.capacity_for(build2.n_rows)
        table = PH._build_kernel(build2, plan.build_keys, cap)
        out = PH._join_unique_kernel(table, probe2, build2,
                                     plan.probe_keys, plan.build_payload,
                                     "inner")
        got = jnp.sum(probe2.mask.astype(jnp.int32))[None]
        ovf = jnp.stack(ctx.overflow)
        vs = jax.lax.all_gather(jnp.where(out.mask, out.cols["v"].values,
                                          -1), "d", tiled=True)
        ps = jax.lax.all_gather(jnp.where(out.mask, out.cols["p"].values,
                                          -1), "d", tiled=True)
        return ovf, got, vs, ps

    fn = jax.jit(shard_map(stage, mesh=mesh,
                           in_specs=(P("d"),) * 5,
                           out_specs=(P("d"), P("d"), P(), P()),
                           **no_check))
    ovf, got, vs, ps = fn(data["pk"], data["pv"], data["bk"],
                          data["bp"], data["bm"])
    return np.asarray(ovf), np.asarray(got), np.asarray(vs), np.asarray(ps)


def test_plain_repartition_overflows_on_skew(mesh, data):
    """Round-1 behavior: hash routing sends 50% of rows to one device;
    the destination bucket (cap ≈ fair share × slack) must overflow."""
    ovf, _, _, _ = _run_exchange(mesh, data, skew=False)
    assert ovf.any(), "expected plain FIXED_HASH to overflow on 50% skew"


def test_skew_exchange_balances_and_joins_correctly(mesh, data):
    ovf, got, vs, ps = _run_exchange(mesh, data, skew=True)
    assert not ovf.any(), "skew-aware exchange must not overflow"
    # per-device received probe rows balanced within 2x of fair share
    fair = N / ND
    assert got.max() <= 2 * fair, f"unbalanced: {got}"
    assert got.min() >= fair / 2, f"unbalanced: {got}"
    assert got.sum() == N
    # join output = every probe row matched with payload key*10
    sel = vs >= 0
    exp = {(int(v), int(k) * 10)
           for v, k in zip(data["pay_np"], data["keys_np"])}
    gotpairs = {(int(v), int(p)) for v, p in zip(vs[sel], ps[sel])}
    assert gotpairs == exp
    assert sel.sum() == N  # no duplicated or lost probe rows


def test_heavy_detection_identifies_hot_hash(mesh, data):
    """detect_heavy_hashes flags the heavy key's hash and nothing near the
    uniform keys' share."""
    from presto_tpu.ops.hashing import hash_keys
    shard_map, no_check = D._get_shard_map()

    def stage(pk):
        h = hash_keys([pk])
        heavy = D.detect_heavy_hashes(h, jnp.ones(pk.shape, jnp.bool_))
        return heavy[None]

    fn = jax.jit(shard_map(stage, mesh=mesh, in_specs=(P("d"),),
                           out_specs=P("d"), **no_check))
    heavy = np.asarray(fn(data["pk"]))
    # identical on every device
    assert (heavy == heavy[0]).all()
    hk = np.asarray(hash_keys([jnp.asarray([HEAVY_KEY], jnp.int64)]))[0]
    assert hk in heavy[0], "heavy key hash not detected"
    n_real = (heavy[0] != D.HASH_SENTINEL).sum()
    assert n_real <= 2, f"false heavy positives: {heavy[0]}"


FANOUT = 3  # build rows per key in the expanding-join fixture


@pytest.fixture(scope="module")
def expand_data(mesh):
    """Non-unique build: FANOUT rows per key (expanding join fixture)."""
    rng = np.random.default_rng(43)
    keys = rng.integers(0, NDV, size=N).astype(np.int64)
    keys[rng.random(N) < 0.5] = HEAVY_KEY
    pay = np.arange(N, dtype=np.int64)
    nb = NDV * FANOUT
    bk = np.repeat(np.arange(NDV, dtype=np.int64), FANOUT)
    bp = np.arange(nb, dtype=np.int64)
    bk_pad = np.zeros(N, np.int64)
    bp_pad = np.zeros(N, np.int64)
    bm = np.zeros(N, bool)
    idx = np.arange(nb) * (N // nb)
    bk_pad[idx], bp_pad[idx], bm[idx] = bk, bp, True
    return {"pk": _sharded(mesh, keys), "pv": _sharded(mesh, pay),
            "bk": _sharded(mesh, bk_pad), "bp": _sharded(mesh, bp_pad),
            "bm": _sharded(mesh, bm),
            "keys_np": keys, "pay_np": pay, "bk_np": bk, "bp_np": bp}


def test_skew_expanding_join_balances_and_expands_correctly(
        mesh, expand_data):
    """Heavy-key splitting must also cover EXPANDING joins (non-unique
    build): heavy build rows replicate, split probe rows each meet every
    build row of their key exactly once (VERDICT r2 item 7 — plain hashing
    fails this shape, see test_plain_repartition_overflows_on_skew)."""
    data = expand_data
    kref = ir.ColumnRef("k", T.BIGINT)
    plan = PH.PhysHashJoin(
        probe=None, build=None, probe_keys=(kref,), build_keys=(kref,),
        kind="inner", unique_build=False,
        build_payload=(("p", "p"),), build_est=float(NDV * FANOUT),
        probe_est=float(N), dist_type="partitioned")
    shard_map, no_check = D._get_shard_map()

    def stage(pk, pv, bk, bp, bm):
        probe = Chunk({"k": DCol(T.BIGINT, PLAIN, pk),
                       "v": DCol(T.BIGINT, PLAIN, pv)},
                      jnp.ones(pk.shape, jnp.bool_))
        build = Chunk({"k": DCol(T.BIGINT, PLAIN, bk),
                       "p": DCol(T.BIGINT, PLAIN, bp)}, bm)
        ctx = D.TraceCtx({}, {}, 1.0, overflow=[], overflow_keys=[])
        probe2, build2, _ = D._exchange_join_inputs(
            plan, probe, False, build, False, ctx)
        cap = D.HT.capacity_for(build2.n_rows)
        table = PH._build_kernel(build2, plan.build_keys, cap)
        slot, cnt = PH._probe_counts_kernel(table, probe2, plan.probe_keys)
        out_size = D.HT.next_pow2(probe2.n_rows) * 4
        out, e_ovf = PH._join_expand_pairs(plan, probe2, build2, table,
                                           slot, cnt, out_size)
        ctx.overflow.append(e_ovf)
        got = jnp.sum(probe2.mask.astype(jnp.int32))[None]
        ovf = jnp.stack(ctx.overflow)
        vs = jax.lax.all_gather(jnp.where(out.mask, out.cols["v"].values,
                                          -1), "d", tiled=True)
        ps = jax.lax.all_gather(jnp.where(out.mask, out.cols["p"].values,
                                          -1), "d", tiled=True)
        return ovf, got, vs, ps

    fn = jax.jit(shard_map(stage, mesh=mesh, in_specs=(P("d"),) * 5,
                           out_specs=(P("d"), P("d"), P(), P()),
                           **no_check))
    ovf, got, vs, ps = (np.asarray(x) for x in fn(
        data["pk"], data["pv"], data["bk"], data["bp"], data["bm"]))
    assert not ovf.any(), "skew-aware exchange must not overflow"
    fair = N / ND
    assert got.max() <= 2 * fair, f"unbalanced: {got}"  # post-exchange
    assert got.sum() == N
    # expansion output: every (probe row, build row of its key) pair once
    from collections import Counter
    exp = Counter()
    bp_by_key = {}
    for k, p in zip(data["bk_np"], data["bp_np"]):
        bp_by_key.setdefault(int(k), []).append(int(p))
    for v, k in zip(data["pay_np"], data["keys_np"]):
        for p in bp_by_key[int(k)]:
            exp[(int(v), p)] += 1
    sel = vs >= 0
    gotpairs = Counter(zip(vs[sel].tolist(), ps[sel].tolist()))
    assert gotpairs == exp


def test_uniform_keys_detect_nothing(mesh, data):
    from presto_tpu.ops.hashing import hash_keys
    shard_map, no_check = D._get_shard_map()
    rng = np.random.default_rng(7)
    uni = _sharded(mesh, rng.integers(0, NDV, size=N).astype(np.int64))

    def stage(pk):
        h = hash_keys([pk])
        return D.detect_heavy_hashes(h, jnp.ones(pk.shape, jnp.bool_))[None]

    fn = jax.jit(shard_map(stage, mesh=mesh, in_specs=(P("d"),),
                           out_specs=P("d"), **no_check))
    heavy = np.asarray(fn(uni))
    assert (heavy == D.HASH_SENTINEL).all()
