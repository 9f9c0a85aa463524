"""Pallas TPU kernels for the hottest inner loops (experimental tier).

The XLA-traced kernels in ``hashtable.py``/``agg.py`` are already fused and
HBM-bandwidth-bound for scan-shaped work; these Pallas versions exist for
the paths where explicit VMEM control wins:

- ``masked_sum``:     streaming blocked reduction (filter+sum fusion with
                      explicit [block, 128]-tiled accumulation — the Q6
                      inner loop shape)
- ``hash_probe``:     linear-probe lookup with the table resident in VMEM
                      (int64 keys carried as int32 lo/hi pairs, since the
                      VPU is natively 32-bit — the same reasoning as the
                      reference's byte-prefix filter in PagesHash.java:50)

The engine dispatches to them from ``ops/hashtable.lookup`` and
``ops/agg.g_sum`` when the tier is enabled — via
``EngineConfig.pallas_kernels`` (client API), ``configure()`` directly, or
the ``PRESTO_TPU_PALLAS`` env var (``on`` requires a TPU backend;
``interpret`` exercises the same dispatch on CPU for tests).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK = 8 * 1024  # rows per grid step

# VMEM is ~16 MB/core: cap resident probe tables well below it
# (owner + klo + khi = 12 B/slot plus blocked probe buffers).
MAX_VMEM_TABLE_SLOTS = 1 << 19

_MODE = os.environ.get("PRESTO_TPU_PALLAS", "off").lower()


def configure(mode) -> None:
    """'off' | 'on' (TPU hardware) | 'interpret' (CPU, for tests).
    Booleans map to on/off."""
    global _MODE
    if isinstance(mode, bool):
        mode = "on" if mode else "off"
    if mode not in ("off", "on", "interpret"):
        raise ValueError(f"pallas mode {mode!r}")
    _MODE = mode


def enabled() -> bool:
    if _MODE == "interpret":
        return True
    return _MODE == "on" and jax.default_backend() == "tpu"


def _interpret() -> bool:
    return _MODE == "interpret"


def _pad_to(x, n, fill=0):
    if x.shape[0] == n:
        return x
    return jnp.pad(x, (0, n - x.shape[0]), constant_values=fill)


# ---------------------------------------------------------------- masked sum

def _masked_sum_kernel(lo_ref, hi_ref, mask_ref, olo_ref, ohi_ref):
    m = mask_ref[:]
    olo_ref[:] = jnp.sum(jnp.where(m, lo_ref[:], 0), axis=0, keepdims=True)
    ohi_ref[:] = jnp.sum(jnp.where(m, hi_ref[:], 0), axis=0, keepdims=True)


_SPLIT = 18  # low bits per int32 word


def masked_sum(values: jnp.ndarray, mask: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """sum(values where mask) via a blocked streaming Pallas reduction.

    TPU Pallas has no int64 reductions, so the int64 addends split into
    (hi<<18)+lo int32 words; each grid step emits per-lane int32 partial
    sums (64 rows/step keeps both words overflow-free for |v| < 2^43) and
    XLA recombines in int64.  Correct for |values| < 2^43 — the caller's
    addend domain (unscaled decimals of TPC-H magnitude)."""
    n = values.shape[0]
    padded = pl.cdiv(max(n, 1), BLOCK) * BLOCK
    v64 = _pad_to(values.astype(jnp.int64), padded)
    vlo = (v64 & ((1 << _SPLIT) - 1)).astype(jnp.int32).reshape(-1, LANES)
    vhi = (v64 >> _SPLIT).astype(jnp.int32).reshape(-1, LANES)
    m = _pad_to(mask, padded, False).reshape(-1, LANES)
    rows = BLOCK // LANES
    grid = vlo.shape[0] // rows
    olo, ohi = pl.pallas_call(
        _masked_sum_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(vlo, vhi, m)
    return (jnp.sum(olo.astype(jnp.int64))
            + (jnp.sum(ohi.astype(jnp.int64)) << _SPLIT))


# ---------------------------------------------------------------- hash probe

def _probe_kernel(owner_ref, klo_ref, khi_ref, plo_ref, phi_ref,
                  hash_ref, out_ref):
    """Linear probe with table arrays fully VMEM-resident.

    For each probe lane: slot = hash; loop: EMPTY→miss, key-equal→hit,
    else slot+1 — all lanes advance in lockstep with per-lane done flags
    (the vectorized form of PagesHash.getAddressIndex:158)."""
    cap = owner_ref.shape[0] * owner_ref.shape[1]
    shape = hash_ref.shape
    slot = hash_ref[:]
    result = jnp.full(shape, -1, jnp.int32)
    pending = jnp.ones(shape, jnp.bool_)

    def gather(ref, idx):
        flat_rows = idx // LANES
        flat_cols = idx % LANES
        return ref[flat_rows, flat_cols]

    def body(state):
        slot, result, pending, rounds = state
        occ = gather(owner_ref, slot)
        empty = occ == jnp.int32(2**31 - 1)
        eq = (gather(klo_ref, slot) == plo_ref[:]) & \
             (gather(khi_ref, slot) == phi_ref[:])
        found = pending & ~empty & eq
        result = jnp.where(found, slot, result)
        pending = pending & ~found & ~empty
        slot = jnp.where(pending, (slot + 1) % cap, slot)
        return slot, result, pending, rounds + 1

    def cond(state):
        _, _, pending, rounds = state
        return jnp.any(pending) & (rounds < cap)

    _, result, _, _ = jax.lax.while_loop(
        cond, body, (slot, result, pending, jnp.int32(0)))
    out_ref[:] = result


def hash_probe(owner: jnp.ndarray, build_keys: jnp.ndarray,
               probe_keys: jnp.ndarray, probe_hash: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """VMEM-resident-table probe.

    owner: int32 [capacity] (EMPTY = 2^31-1); build_keys: int64 [capacity]
    holding each slot's key (EMPTY slots arbitrary); probe_hash: int32 [N]
    precomputed start slot of each probe key.  Returns int32 [N]: the SLOT
    holding the key, or -1 (same contract as ``hashtable.lookup``).
    """
    cap = owner.shape[0]
    n = probe_keys.shape[0]
    pn = pl.cdiv(max(n, 1), BLOCK) * BLOCK

    def lohi(x):
        x = x.astype(jnp.int64)
        return ((x & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32),
                ((x >> 32) & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
                .astype(jnp.int32))

    klo, khi = lohi(build_keys)
    plo, phi = lohi(probe_keys)
    rows = BLOCK // LANES
    grid = pn // BLOCK
    out = pl.pallas_call(
        _probe_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((cap // LANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap // LANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap // LANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pn // LANES, LANES), jnp.int32),
        interpret=interpret,
    )(owner.reshape(-1, LANES),
      klo.reshape(-1, LANES), khi.reshape(-1, LANES),
      _pad_to(plo, pn).reshape(-1, LANES),
      _pad_to(phi, pn).reshape(-1, LANES),
      _pad_to(probe_hash.astype(jnp.int32), pn).reshape(-1, LANES))
    return out.reshape(-1)[:n]
