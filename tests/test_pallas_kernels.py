"""Pallas kernel tests (interpreter mode on CPU; hardware runs via bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from presto_tpu.ops import pallas_kernels as PK
from presto_tpu.ops import hashtable as HT
from presto_tpu.ops.hashing import hash_keys


def test_masked_sum():
    rng = np.random.default_rng(0)
    v = rng.integers(-10**9, 10**9, size=20000).astype(np.int64)
    m = rng.random(20000) < 0.4
    got = int(PK.masked_sum(jnp.asarray(v), jnp.asarray(m), interpret=True))
    assert got == int(v[m].sum())


def test_hash_probe_matches_xla_path():
    rng = np.random.default_rng(1)
    build = rng.choice(10**6, size=500, replace=False).astype(np.int64)
    probe = np.concatenate([
        rng.choice(build, 300), rng.integers(10**6, 2 * 10**6, 200)
    ]).astype(np.int64)
    cap = HT.capacity_for(len(build))  # power of two ≥ 2×rows
    owner, slot_of_row, _ = HT.insert([jnp.asarray(build)],
                                      jnp.ones(len(build), bool), cap)
    # per-slot key array for the VMEM kernel
    owner_np = np.asarray(owner)
    slot_keys = np.zeros(cap, np.int64)
    filled = owner_np != (2**31 - 1)
    slot_keys[filled] = build[owner_np[filled]]
    h = (np.asarray(hash_keys([jnp.asarray(probe)])) & (cap - 1)).astype(np.int32)
    got = np.asarray(PK.hash_probe(
        owner, jnp.asarray(slot_keys), jnp.asarray(probe), jnp.asarray(h),
        interpret=True))
    build_pos = {int(k): i for i, k in enumerate(build)}
    for p, g in zip(probe, got):
        if int(p) in build_pos:
            assert g == build_pos[int(p)], (p, g)
        else:
            assert g == -1
